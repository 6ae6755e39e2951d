package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeMerges}
import graft.pipeline.TextOps

/** Greedy BPE semantics against hand-computed encodings, the construction
  * invariant, and the Spark column path.
  */
class BpeSpec extends SparkSpec {

  test("greedy encode merges lowest-rank pairs, all occurrences at once") {
    val v = BpeMerges(Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    assert(v.encode("lower") == Seq("low", "er"))
    assert(v.encode("lolo") == Seq("lo", "lo"))
    assert(v.encode("xyz") == Seq("x", "y", "z"))
    assert(v.encode("") == Seq())
    assert(v.encode("l") == Seq("l"))
  }

  test("rank order beats position: earlier rule merges first") {
    // (b,c) outranks (a,b): "abc" must become [a, bc], never [ab, c]
    val v = BpeMerges(Seq(("b", "c"), ("a", "b")))
    assert(v.encode("abc") == Seq("a", "bc"))
  }

  test("demo vocabulary encodes common fragments") {
    val v = Bpe.demoEnglish
    assert(v.encode("the") == Seq("the"))
    assert(v.encode("anding") == Seq("and", "ing"))
    assert(v.encode("tion") == Seq("tion"))
    assert(v.countTokens(Seq("the", "", "cat")) == 1 + 3)
  }

  test("construction rejects rules violating the greedy==rank invariant") {
    // 'th' used before any rule forms it
    intercept[IllegalArgumentException](BpeMerges(Seq(("th", "e"))))
    // duplicate output
    intercept[IllegalArgumentException](
      BpeMerges(Seq(("a", "b"), ("a", "b"))))
  }

  test("column path counts BPE tokens over the documents fixture") {
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val counted = docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("ws"),
        Bpe.tokenCount(Bpe.demoEnglish)(TextOps.tokens(col("text")))
          .cast("long").as("bpe"))
      .collect()
    assert(counted.nonEmpty)
    counted.foreach { r =>
      // every word is >= 1 BPE token and <= its codepoint count, so the
      // doc total is bounded below by the word count
      assert(r.getLong(2) >= r.getLong(1) || r.getLong(1) == 1,
        s"doc ${r.get(0)}: bpe ${r.getLong(2)} < words ${r.getLong(1)}")
    }
  }
}
