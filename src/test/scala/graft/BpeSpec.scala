package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeMerges}
import graft.pipeline.TextOps

/** Independent reference for BPE training: per-OCCURRENCE (no type
  * table), straight from the textbook loop — shares no code with
  * [[graft.functions.BpeTrainer]]. Used by [[BpeSpec]] (fixture-corpus
  * parity) and [[PropertySpec]] (random-corpus parity).
  */
private[graft] object BpeReference {
  def train(pieces: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var words: Array[Array[String]] = pieces.filter(_.nonEmpty)
      .map(_.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))))
      .toArray
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 0 until k if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (w <- words; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) =
          counts.getOrElse((w(i), w(i + 1)), 0L) + 1
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) =
          counts.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((a, b, c))
        words = words.map { w =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
              buf += a + b; i += 2
            } else { buf += w(i); i += 1 }
          }
          buf.toArray
        }
      }
    }
    out.result()
  }
}

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

  test("fromLines parses the merges-file layout with Ġ space decoding") {
    val v = BpeMerges.fromLines(Bpe.demoGpt2Lines.iterator, gpt2Spaces = true)
    // header/comment skipped, rank = line order, Ġ decoded on both sides
    assert(v.rules.take(3) == Seq((" ", "t"), (" t", "h"), (" th", "e")))
    assert(v.rules.drop(6) == Bpe.demoEnglish.rules)
    // blank lines and surrounding whitespace are tolerated
    val v2 = BpeMerges.fromLines(Seq("# h", "", "  a b  ").iterator)
    assert(v2.rules == Seq(("a", "b")))
    intercept[IllegalArgumentException](
      BpeMerges.fromLines(Seq("a b c").iterator))
    // a truncated file that breaks the invariant fails at load
    intercept[IllegalArgumentException](
      BpeMerges.fromLines(Seq("th e").iterator))
  }

  test("toLines renders the merges-file layout and round-trips " +
      "fromLines, including Ġ space encoding and a trained vocabulary") {
    val v = Bpe.demoEnglish
    assert(BpeMerges.fromLines(v.toLines()).rules == v.rules)
    // space-carrying rules need the Ġ convention — and get it back
    val g = Bpe.demoGpt2
    assert(BpeMerges.fromLines(g.toLines(gpt2Spaces = true),
      gpt2Spaces = true).rules == g.rules)
    // without it, a space rule would write a file that re-loads
    // differently — rejected at write time
    intercept[IllegalArgumentException](g.toLines())
    // a left side starting with '#' would write a line the reader
    // skips as a comment, silently dropping the rule — also rejected
    intercept[IllegalArgumentException](
      BpeMerges(Seq(("#", "#"))).toLines())
    // a freshly-trained vocabulary persists through the same format
    import graft.functions.BpeTrainer
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val trained = BpeTrainer.toMerges(
      BpeTrainer.train(docs, piecesCol, 6))
    val back = BpeMerges.fromLines(trained.toLines(gpt2Spaces = true),
      gpt2Spaces = true)
    assert(back.rules == trained.rules)
    assert(back.encode("the anding") == trained.encode("the anding"))
  }

  test("fromLines loads a realistic-size merges file fast") {
    // a real release's merges.txt carries tens of thousands of rules; the
    // load-time invariant check must stay linear. Synthesize ~1.6k valid
    // rules: per letter, a chain of progressively longer merges (every
    // side is a single codepoint or an earlier output — the invariant a
    // trained vocabulary satisfies by construction).
    val lines = Seq("#version: synthetic") ++
      ('a' to 'z').flatMap { c =>
        (1 to 60).map(n => (c.toString * n) + " " + c)
      }
    val t0 = System.nanoTime()
    val v = BpeMerges.fromLines(lines.iterator)
    val loadSec = (System.nanoTime() - t0) / 1e9
    assert(v.rules.length == 26 * 60)
    // generous bound: guards against an accidental O(rules²) validator
    // (which took minutes at this size) without flaking on a loaded CI
    // host or a cold JIT
    assert(loadSec < 10.0, s"load took $loadSec s for ${v.rules.length} rules")
    // the big vocabulary still encodes correctly: (a,a) merges all
    // leftmost pairs first, then (aa,a) absorbs a trailing singleton;
    // no cross-letter rule exists
    assert(v.encode("aaa") == Seq("aaa"))
    assert(v.encode("aaaa") == Seq("aa", "aa"))
    assert(v.encode("ab" * 3) == Seq("a", "b", "a", "b", "a", "b"))
  }

  test("GPT-2-scale vocabulary (50k merges): load and corpus " +
      "tokenization stay in budget") {
    // a real release ships ~50k merges; synthesize a VALID 50k-rule
    // vocabulary shaped like a trained one: left-heavy chains over
    // a–z — all 676 2-grams, all 17,576 3-grams, and the first 31,748
    // 4-grams in rank order. Every side is a single codepoint or an
    // earlier output; outputs are distinct; outputs stay ≤ 4 chars
    // (unlike the per-letter chain generator above, whose strings grow
    // to the rule count and would make the 50k file itself ~100 MB).
    val alpha = 'a' to 'z'
    val len2 = for (a <- alpha; b <- alpha) yield s"$a $b"
    val len3 = for (a <- alpha; b <- alpha; c <- alpha) yield s"$a$b $c"
    val n4 = 50000 - len2.length - len3.length
    val len4 = alpha.iterator.flatMap(a => alpha.iterator.flatMap(b =>
      alpha.iterator.flatMap(c => alpha.iterator.map(d => s"$a$b$c $d"))))
      .take(n4)
    val t0 = System.nanoTime()
    val v = BpeMerges.fromLines(
      Iterator("#version: synthetic-50k") ++ len2.iterator ++
        len3.iterator ++ len4)
    val loadSec = (System.nanoTime() - t0) / 1e9
    assert(v.rules.length == 50000)
    assert(loadSec < 10.0,
      f"50k-rule load took $loadSec%.2f s — validator must stay linear")
    // greedy semantics under the full table: lowest PRESENT rank wins
    assert(v.encode("abcd") == Seq("ab", "cd"))
    assert(v.encode("the") == Seq("t", "he"))
    // q_bpe-shaped tokenization over the documents fixture with the
    // 50k-rule closure broadcast to every task
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val t1 = System.nanoTime()
    val Seq(nDocs, bpeTokens, codepoints) = docs
      .select(count(lit(1)),
        sum(Bpe.tokenCount(v)(TextOps.tokens(col("text"))).cast("long")),
        sum(length(TextOps.normalize(col("text"))).cast("long")))
      .head.toSeq.map(_.asInstanceOf[Long])
    val tokSec = (System.nanoTime() - t1) / 1e9
    info(f"50k-rule vocab: load $loadSec%.2f s; " +
      f"tokenized $nDocs docs in $tokSec%.2f s ($bpeTokens tokens)")
    // budget: the per-token merge loop must not degrade with table size
    // (rank lookups are O(1)); generous wall bound for a loaded host
    assert(tokSec < 30.0, f"tokenization took $tokSec%.2f s")
    // and the merges actually fire: well below one token per codepoint
    assert(bpeTokens < codepoints / 2,
      s"only $bpeTokens tokens over $codepoints codepoints — merges inert")
  }

  test("preTokenize splits like a byte-level BPE: contractions, spaced words") {
    val df = spark.range(1).select(
      Bpe.preTokenize(lit("it's the 3rd test, isn't it?")).as("p"))
    assert(df.head.getSeq[String](0) == Seq(
      "it", "'s", " the", " 3", "rd", " test", ",", " isn", "'t",
      " it", "?"))
  }

  test("space-prefixed merges fire on pre-token pieces") {
    val v = Bpe.demoGpt2
    assert(v.encode(" the") == Seq(" the"))
    assert(v.encode(" and") == Seq(" and"))
    assert(v.encode("the") == Seq("the"))
    assert(v.encode(" theory") == Seq(" the", "or", "y"))
    assert(v.encode(" standing") == Seq(" ", "st", "and", "ing"))
    assert(v.countTokens(Seq("it", "'s", " the")) == 2 + 2 + 1)
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

  test("vocab numbers alphabet then merge outputs, unknowns to unkId") {
    import graft.functions.BpeVocab
    val v = BpeVocab(Bpe.demoEnglish, BpeVocab.asciiPrintable)
    assert(v.size == 95 + Bpe.demoEnglish.rules.size)
    // alphabet ids are positional: 'a' is codepoint 97, alphabet starts at 32
    assert(v.idOf("a") == 97 - 32)
    // merge outputs number from |alphabet| in rank order: rule 1 is ("th","e")
    assert(v.idOf("the") == 95 + 1)
    // ids come from the SAME greedy pass as the strings
    assert(v.encodeIds("anding") ==
      Seq(v.idOf("and"), v.idOf("ing")))
    // a codepoint outside printable ASCII maps to unkId, not a crash
    assert(v.encodeIds("naïve").contains(-1))
    // construction validates the alphabet
    intercept[IllegalArgumentException](
      BpeVocab(Bpe.demoEnglish, Seq("a", "a")))
    intercept[IllegalArgumentException](
      BpeVocab(Bpe.demoEnglish, Seq("ab")))
  }

  test("column path emits the (token, id) sequence and the id array") {
    import graft.functions.BpeVocab
    val s = spark
    import s.implicits._
    val v = BpeVocab(Bpe.demoEnglish, BpeVocab.asciiPrintable)
    val df = Seq((1L, "the cat anding")).toDF("doc_id", "text")
    val words = TextOps.tokens(col("text"))
    val row = df.select(
        Bpe.encodeWithIds(v)(words).as("tt"),
        Bpe.tokenIds(v)(words).as("ids"),
        Bpe.tokenCount(Bpe.demoEnglish)(words).as("n"))
      .collect().head
    val toks = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getInt(1)))
    assert(toks.map(_._1) == Seq("the", "c", "a", "t", "and", "ing"))
    // ids agree between the struct form and the flat form, and with size
    assert(row.getSeq[Int](1) == toks.map(_._2))
    assert(row.getInt(2) == toks.length)
    assert(toks.forall { case (t, id) => v.idOf(t) == id })
  }

  test("decodeIds inverts encodeIds; unknowns render as the unk marker") {
    import graft.functions.BpeVocab
    val v = BpeVocab(Bpe.demoGpt2, BpeVocab.asciiPrintable)
    // tokenOf is the exact inverse of idOf (bijection both ways)
    assert(v.tokenOf.size == v.idOf.size)
    assert(v.idOf.forall { case (t, i) => v.tokenOf(i) == t })
    // round trip: gpt2-style pieces carry their leading spaces, so the
    // decoded concat IS the original normalized text
    val text = "the cat, and the 3rd dog's hat"
    val pieces = Seq("the", " cat", ",", " and", " the", " 3", "rd",
      " dog", "'s", " hat")
    assert(v.decodeIds(pieces.flatMap(v.encodeIds)) == text)
    // an unknown codepoint's id (-1) decodes as the marker, in place
    val ids = v.encodeIds("naïve")
    assert(v.decodeIds(ids).contains("�"))
    assert(v.decodeIds(ids, unkAs = "?") == "na?ve")
    // garbage ids never throw
    assert(v.decodeIds(Seq(-7, Int.MaxValue), unkAs = "!") == "!!")
  }

  test("vocab persists: vocabDf -> parquet -> fromVocabDf round-trips; " +
      "mismatched or truncated stores are rejected") {
    import graft.functions.BpeVocab
    import java.nio.file.Files
    val v = BpeVocab(Bpe.demoGpt2, BpeVocab.asciiPrintable)
    val dir = Files.createTempDirectory("graft_bpevocab").toString
    v.vocabDf(spark).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val back = BpeVocab.fromVocabDf(stored, Bpe.demoGpt2)
    assert(back.idOf == v.idOf)
    assert(back.alphabet == v.alphabet)
    assert(back.encodeIds(" the cat") == v.encodeIds(" the cat"))
    // a vocabulary stored against the WRONG merges table fails loudly
    intercept[IllegalArgumentException](
      BpeVocab.fromVocabDf(stored, Bpe.demoEnglish))
    // a truncated store (lost rows) fails the 0..n-1 id check
    intercept[IllegalArgumentException](
      BpeVocab.fromVocabDf(stored.filter(col("id") =!= 3), Bpe.demoGpt2))
    // the alphabet prefix is authoritative from the file — a permuted
    // prefix is undetectable from the merges table alone, so a caller
    // holding the expected order passes it to close the hole
    val swapped = stored.withColumn("token",
      when(col("id") === 0, v.alphabet(1))
        .when(col("id") === 1, v.alphabet(0))
        .otherwise(col("token")))
    // silently renumbers without the expectation…
    assert(BpeVocab.fromVocabDf(swapped, Bpe.demoGpt2)
      .alphabet.take(2) == Seq(v.alphabet(1), v.alphabet(0)))
    // …and fails loudly with it
    intercept[IllegalArgumentException](BpeVocab.fromVocabDf(
      swapped, Bpe.demoGpt2,
      expectedAlphabet = Some(BpeVocab.asciiPrintable)))
    assert(BpeVocab.fromVocabDf(stored, Bpe.demoGpt2,
      expectedAlphabet = Some(BpeVocab.asciiPrintable)).idOf == v.idOf)
  }

  test("decodeIds column path: ids decode back to the document text") {
    import graft.functions.BpeVocab
    val s = spark
    import s.implicits._
    val v = BpeVocab(Bpe.demoGpt2, BpeVocab.asciiPrintable)
    val df = Seq((1L, "The cat AND the   dog"), (2L, "")).toDF("doc_id", "text")
    val pieces = Bpe.preTokenize(TextOps.normalize(col("text")))
    val got = df.select(col("doc_id"),
        Bpe.decodeIds(v)(Bpe.tokenIds(v)(pieces)).as("d"),
        TextOps.normalize(col("text")).as("n"))
      .orderBy("doc_id").collect()
    assert(got.forall(r => r.getString(1) == r.getString(2)))
    assert(got(1).getString(1) == "")
  }

  // ------------------------------------------------------------- training

  test("trainLocal: hand-computed merges, counts, and tie-breaks") {
    import graft.functions.BpeTrainer
    import graft.functions.BpeTrainer.LearnedMerge
    // (a,a): 2 adjacencies in "aaab" × cnt 2 = 4; (a,b): 2 + 3 = 5
    val learned = BpeTrainer.trainLocal(Seq(("aaab", 2L), ("ab", 3L)), 3)
    assert(learned(0) == LearnedMerge(0, "a", "b", 5))
    // "aaab" → [a, a, ab]: (a,a)=2 vs (a,ab)=2 — tie falls to the
    // lexicographically smaller right side
    assert(learned(1) == LearnedMerge(1, "a", "a", 2))
    assert(learned(2) == LearnedMerge(2, "aa", "ab", 2))
  }

  test("overlapping adjacencies count; merging is leftmost " +
      "non-overlapping") {
    import graft.functions.BpeTrainer
    import graft.functions.BpeTrainer.LearnedMerge
    // "aaa" holds TWO (a,a) adjacencies but only one merge fires
    val learned = BpeTrainer.trainLocal(Seq(("aaa", 1L)), 2)
    assert(learned == Seq(LearnedMerge(0, "a", "a", 2),
      LearnedMerge(1, "aa", "a", 1)))
    // even run: both non-overlapping positions merge in one pass
    val even = BpeTrainer.trainLocal(Seq(("aaaa", 1L)), 2)
    assert(even == Seq(LearnedMerge(0, "a", "a", 3),
      LearnedMerge(1, "aa", "aa", 1)))
  }

  test("training stops early when no adjacent pair remains") {
    import graft.functions.BpeTrainer
    assert(BpeTrainer.trainLocal(Seq(("a", 5L), ("b", 2L)), 3).isEmpty)
    // "ab" exhausts after one merge
    assert(BpeTrainer.trainLocal(Seq(("ab", 1L)), 5).length == 1)
  }

  test("codepointCompare matches binary UTF-8 order where UTF-16 " +
      "differs") {
    import graft.functions.BpeTrainer.codepointCompare
    val priv = "" // BMP private-use, UTF-16 unit 0xE000
    val supp = new String(Character.toChars(0x10000)) // surrogate pair
    assert(priv.compareTo(supp) > 0, "UTF-16 order (the trap)")
    assert(codepointCompare(priv, supp) < 0, "codepoint = UTF-8 order")
    assert(codepointCompare("a", "ab") < 0 && codepointCompare("", "a") < 0)
    assert(codepointCompare("ab", "ab") == 0)
  }

  test("distributed trainer == independent per-occurrence reference " +
      "on the fixture corpus") {
    import graft.functions.BpeTrainer
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val learned = BpeTrainer.train(docs, piecesCol, 8)
    val local = docs.select(explode(piecesCol).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(learned.map(m => (m.left, m.right, m.pairCount)) ==
      BpeReference.train(local, 8))
    // the learned table is a VALID vocabulary: construction re-checks
    // the greedy==rank-order invariant, and encoding with it actually
    // compresses the corpus it was trained on
    val v = BpeTrainer.toMerges(learned)
    val sample = local.filter(_.length > 3).take(50)
    assert(sample.forall(p => v.encode(p).length <= p.length))
    assert(sample.exists(p => v.encode(p).length < p.length),
      "trained merges never fired on their own training corpus")
  }

  test("maxPieceTypes caps the collected type table without breaking " +
      "the loop") {
    import graft.functions.BpeTrainer
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val capped = BpeTrainer.train(docs, piecesCol, 4,
      maxPieceTypes = Some(100))
    assert(capped.length == 4)
    assert(capped.map(_.rank) == Seq(0, 1, 2, 3))
  }
}
