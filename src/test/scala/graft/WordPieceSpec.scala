package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, WordPieceTrainer}
import graft.functions.WordPieceTrainer.{LearnedJoin, Vocab}
import graft.pipeline.TextOps

/** Independent reference for WordPiece training: per-OCCURRENCE (no
  * type table), straight from the published algorithm — shares no code
  * with [[graft.functions.WordPieceTrainer]]. Each step: count every
  * symbol index and every adjacent pair, pick the pair maximising
  * `count(ab) / (count(a)·count(b))` (ties to the codepoint-smallest
  * (left, right)), join leftmost-non-overlapping with `##` stripped
  * from the right side.
  */
private[graft] object WordPieceReference {
  private def mark(w: String): Array[String] = {
    val cps = w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    cps.zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }
  }
  private def strip(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  def train(pieces: Seq[String], k: Int)
      : Seq[(String, String, Long, Long, Long)] = {
    var words: Array[Array[String]] =
      pieces.filter(_.nonEmpty).map(mark).toArray
    val out = Seq.newBuilder[(String, String, Long, Long, Long)]
    var done = false
    for (_ <- 0 until k if !done) {
      val sym = scala.collection.mutable.Map.empty[String, Long]
      val pair = scala.collection.mutable.Map.empty[(String, String), Long]
      for (w <- words; i <- w.indices) {
        sym(w(i)) = sym.getOrElse(w(i), 0L) + 1
        if (i < w.length - 1)
          pair((w(i), w(i + 1))) =
            pair.getOrElse((w(i), w(i + 1)), 0L) + 1
      }
      if (pair.isEmpty) done = true
      else {
        // sort by (score DESC, left, right) under codepoint order; the
        // UTF-8-binary tiebreak matters only for keys sharing a score
        import graft.functions.BpeTrainer.codepointCompare
        val ranked = pair.toSeq.sortWith { case (((a1, b1), c1), ((a2, b2), c2)) =>
          val s1 = c1.toDouble / (sym(a1).toDouble * sym(b1).toDouble)
          val s2 = c2.toDouble / (sym(a2).toDouble * sym(b2).toDouble)
          if (s1 != s2) s1 > s2
          else {
            val ca = codepointCompare(a1, a2)
            if (ca != 0) ca < 0 else codepointCompare(b1, b2) < 0
          }
        }
        val ((a, b), c) = ranked.head
        out += ((a, b, c, sym(a), sym(b)))
        val joined = a + strip(b)
        words = words.map { w =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
              buf += joined; i += 2
            } else { buf += w(i); i += 1 }
          }
          buf.toArray
        }
      }
    }
    out.result()
  }
}

/** WordPiece training (likelihood-ratio selection, `##` propagation,
  * tie-breaks), the greedy longest-match encoder — including the
  * literal-`##` edge cases where deriving the advance from the hit
  * string instead of the consumed length breaks — and the Spark
  * train→vocab→encode path.
  */
class WordPieceSpec extends SparkSpec {

  test("trainLocal: likelihood ratio beats raw frequency and ## " +
      "propagates through joins") {
    // types: "aab"×2 → [a,##a,##b], "ab"×3 → [a,##b]
    // symbols a:5 ##a:2 ##b:5; pairs (a,##a):2 (##a,##b):2 (a,##b):3
    // scores: 2/(5·2)=0.2, 2/(2·5)=0.2, 3/(5·5)=0.12 — the most
    // FREQUENT pair (a,##b) loses; the 0.2 tie resolves to the
    // codepoint-smaller left '##a' < 'a'
    val learned =
      WordPieceTrainer.trainLocal(Seq(("aab", 2L), ("ab", 3L)), 2)
    assert(learned.head == LearnedJoin(0, "##a", "##b", 2, 2, 5))
    assert(learned.head.joined == "##ab") // right side stripped
    assert(learned.head.score == 0.2)
    // rank 1: segs now [a,##ab]×2, [a,##b]×3; symbols a:5 ##ab:2 ##b:3
    // scores (a,##ab)=2/10=0.2 ties (a,##b)=3/15=0.2; right tiebreak
    // '##ab' < '##b' (third codepoint 'a' < 'b')
    assert(learned(1) == LearnedJoin(1, "a", "##ab", 2, 5, 2))
    assert(learned(1).joined == "aab")
  }

  test("trainLocal: exhaustion stops early; single-codepoint types " +
      "yield no joins") {
    assert(WordPieceTrainer.trainLocal(Seq(("a", 5L), ("b", 2L)), 3).isEmpty)
    val one = WordPieceTrainer.trainLocal(Seq(("ab", 1L)), 5)
    assert(one.length == 1 &&
      one.head == LearnedJoin(0, "a", "##b", 1, 1, 1))
  }

  test("trainLocal: joins rewrite leftmost-non-overlapping") {
    // "aaa" → [a,##a,##a]: symbols a:1 ##a:2; (a,##a)=1/(1·2)=0.5
    // beats (##a,##a)=1/(2·2)=0.25; join consumes positions 0–1,
    // leaving [aa, ##a]
    val learned = WordPieceTrainer.trainLocal(Seq(("aaa", 1L)), 1)
    assert(learned.head == LearnedJoin(0, "a", "##a", 1, 1, 2))
    // "aaaa" → [a,##a,##a,##a]: rank 0 (a,##a) 1/(1·3) beats
    // (##a,##a) 2/(3·3); rewrite touches only the leftmost pair →
    // [aa,##a,##a]; rank 1 then (aa,##a) 1/(1·2) beats (##a,##a) 1/(2·2)
    val l2 = WordPieceTrainer.trainLocal(Seq(("aaaa", 1L)), 2)
    assert(l2 == Seq(LearnedJoin(0, "a", "##a", 1, 1, 3),
      LearnedJoin(1, "aa", "##a", 1, 1, 2)))
  }

  test("distributed trainer == independent per-occurrence reference " +
      "on the fixture corpus") {
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val learned = WordPieceTrainer.train(docs, piecesCol, 8)
    val local = docs.select(explode(piecesCol).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(learned.map(j =>
        (j.left, j.right, j.pairCount, j.leftCount, j.rightCount)) ==
      WordPieceReference.train(local, 8))
  }

  test("encodeWord: greedy longest-match, continuation prefix, [UNK]") {
    val v = Vocab(Set("a", "ab", "##b", "##c", "##bc"))
    assert(WordPieceTrainer.encodeWord("abc", v).toSeq ==
      Seq("ab", "##c"))
    assert(WordPieceTrainer.encodeWord("abbc", v).toSeq ==
      Seq("ab", "##bc"))
    assert(WordPieceTrainer.encodeWord("a", v).toSeq == Seq("a"))
    // no match at position 1 → whole word collapses
    assert(WordPieceTrainer.encodeWord("ax", v).toSeq == Seq("[UNK]"))
    assert(WordPieceTrainer.encodeWord("x", v).toSeq == Seq("[UNK]"))
    assert(WordPieceTrainer.encodeWord("", v).isEmpty)
  }

  test("encodeWord: a bare '##' vocab piece must advance by consumed " +
      "length, not by its stripped text (infinite-loop regression)") {
    // '##' is reachable as a join output (e.g. '#'+'###'); a word that
    // IS '##' matches it bare at position 0 — stripping the hit to
    // derive the advance would step 0 codepoints and hang
    val v = Vocab(Set("#", "##"))
    assert(WordPieceTrainer.encodeWord("##", v).toSeq == Seq("##"))
    assert(WordPieceTrainer.encodeWord("#", v).toSeq == Seq("#"))
  }

  test("encodeWord: bare pieces whose literal text starts with '##' " +
      "match at word start and advance by full length") {
    // probe bound must count '##a' as 3 codepoints (stripping would
    // cap probes at 1 and make the piece unmatchable)
    val v1 = Vocab(Set("##a"))
    assert(v1.maxMatchCps == 3)
    assert(WordPieceTrainer.encodeWord("##a", v1).toSeq == Seq("##a"))
    // and the advance must be the 3 matched codepoints: with '##b'
    // also present, '##ab' = bare '##a' (3 cps) + continuation '##b'
    val v2 = Vocab(Set("##a", "##b", "b"))
    assert(WordPieceTrainer.encodeWord("##ab", v2).toSeq ==
      Seq("##a", "##b"))
    // the same string '##a' used as a CONTINUATION matches one 'a'
    val v3 = Vocab(Set("x", "##a"))
    assert(WordPieceTrainer.encodeWord("xa", v3).toSeq ==
      Seq("x", "##a"))
  }

  test("encodeWord: astral-plane codepoints slice and advance by " +
      "codepoint, not UTF-16 unit") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞
    val v = Vocab(Set(clef, "##a", clef + "a"))
    assert(WordPieceTrainer.encodeWord(clef + "a", v).toSeq ==
      Seq(clef + "a"))
    assert(WordPieceTrainer.encodeWord(clef, v).toSeq == Seq(clef))
  }

  test("encodeWord round-trip: stripped tokens concatenate back to " +
      "the word whenever no [UNK] was emitted") {
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val learned = WordPieceTrainer.train(docs, piecesCol, 8)
    val v = WordPieceTrainer.toVocab(docs, piecesCol, learned)
    val words = docs.select(explode(piecesCol).as("p"))
      .filter(col("p") =!= "").distinct().limit(200)
      .collect().map(_.getString(0))
    words.foreach { w =>
      val toks = WordPieceTrainer.encodeWord(w, v)
      if (!toks.sameElements(Array(v.unkToken))) {
        val back = toks.zipWithIndex.map { case (t, i) =>
          if (i == 0) t else WordPieceTrainer.stripCont(t)
        }.mkString
        assert(back == w, s"round-trip broke on '$w': ${toks.toSeq}")
      }
    }
  }

  test("decodeTokens/decodeUdf: strip-##-and-concatenate inverts the " +
      "flat encode stream; [UNK] stays literal") {
    // local rule: every ##-prefixed token loses the prefix, everything
    // else (including [UNK]) passes through, plain concat
    assert(WordPieceTrainer.decodeTokens(
      Seq("he", "##llo", " ", "##wo", "##rld")) == "hello world")
    assert(WordPieceTrainer.decodeTokens(Seq("[UNK]", "##x")) == "[UNK]x")
    assert(WordPieceTrainer.decodeTokens(Nil) == "")
    // column path: decode(encode(pieces)) == the normalized text on
    // every fixture document with no [UNK] collapse (pieces carry
    // their own leading spaces, so concat IS reconstruction)
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val learned = WordPieceTrainer.train(docs, piecesCol, 8)
    val v = WordPieceTrainer.toVocab(docs, piecesCol, learned)
    val enc = WordPieceTrainer.encodeUdf(spark, v)
    val dec = WordPieceTrainer.decodeUdf()
    val rows = docs.select(
        dec(enc(piecesCol)).as("d"),
        TextOps.normalize(col("text")).as("n"),
        array_contains(enc(piecesCol), v.unkToken).as("unk"))
      .collect()
    assert(rows.nonEmpty)
    rows.filter(!_.getBoolean(2)).foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"decode broke on '${r.getString(1).take(60)}…'")
    }
  }

  test("toVocab: distributed alphabet == local derivation; cap " +
      "restricts to the capped type table; vocab ends bounded") {
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val learned = WordPieceTrainer.train(docs, piecesCol, 4)
    val v = WordPieceTrainer.toVocab(docs, piecesCol, learned)
    val localAlpha = docs.select(explode(piecesCol).as("p"))
      .filter(col("p") =!= "").distinct()
      .collect().map(_.getString(0))
      .flatMap(WordPieceTrainer.markedCps).toSet
    assert(v.pieces == localAlpha ++ learned.map(_.joined))
    // capped: alphabet only from the 5 most frequent piece types
    val capped = WordPieceTrainer.toVocab(docs, piecesCol, Nil,
      maxPieceTypes = Some(5))
    assert(capped.pieces.subsetOf(localAlpha))
    assert(capped.pieces.size < localAlpha.size)
  }

  test("vocab persists: vocabDf -> parquet -> loadVocab round-trips; " +
      "encodeIdsUdf numbers by canonical codepoint rank, [UNK] last") {
    import SparkSpec.spark.implicits._
    val v = Vocab(Set("a", "ab", "##c", "b"))
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab").toString
    WordPieceTrainer.vocabDf(spark, v).write.mode("overwrite").parquet(dir)
    assert(WordPieceTrainer.loadVocab(spark.read.parquet(dir)) == v)
    // an unk token colliding with a vocabulary piece would make ids
    // ambiguous — rejected at construction
    intercept[IllegalArgumentException](Vocab(Set("a", "[UNK]")))
    // custom unk token survives the round trip
    val v2 = Vocab(Set("x"), "<unk>")
    WordPieceTrainer.vocabDf(spark, v2).write.mode("overwrite").parquet(dir)
    assert(WordPieceTrainer.loadVocab(spark.read.parquet(dir)) == v2)
    // canonical ids: '##c'(0) < 'a'(1) < 'ab'(2) < 'b'(3), [UNK]=4;
    // "abc" -> [ab, ##c], "zz" -> [UNK]
    val ids = WordPieceTrainer.encodeIdsUdf(spark, v)
    val out = Seq(Seq("abc", "b", "zz")).toDF("pieces")
      .select(ids(col("pieces")).as("ids")).as[Seq[Int]].collect().head
    assert(out == Seq(2, 0, 3, 4))
  }

  test("plan shape: encode is zero-shuffle narrow; the type-table " +
      "reduction is exactly ONE exchange") {
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    val pieces = Bpe.preTokenize(TextOps.normalize(col("text")))
    val enc = WordPieceTrainer.encodeUdf(spark,
      Vocab(Set("a", "b", "##a", "##b")))
    val encPlan = docs.select(col("doc_id"), enc(pieces).as("toks"))
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"),
      s"wordpiece encode must run at scan speed on 100 TB:\n$encPlan")
    val typesPlan = graft.functions.BpeTrainer
      .pieceTypeCounts(docs, pieces)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(typesPlan).length -
      "BroadcastExchange".r.findAllIn(typesPlan).length
    assert(shuffles == 1,
      s"type reduction must be ONE hash agg, has $shuffles:\n$typesPlan")
  }

  test("encodeUdf is streaming-safe: a file-stream encode lands the " +
      "same tokens as the batch path") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("wp_stream").toString
    val docs = spark.read.parquet(s"$fixtures/documents.parquet")
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val schema = spark.read.parquet(s"$dir/docs").schema
    val pieces = Bpe.preTokenize(TextOps.normalize(col("text")))
    val learned = WordPieceTrainer.train(docs, pieces, 4)
    val vocab = WordPieceTrainer.toVocab(docs, pieces, learned)
    val enc = WordPieceTrainer.encodeUdf(spark, vocab)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), enc(pieces).as("toks"))
    val q = toks(spark.readStream.schema(schema).parquet(s"$dir/docs"))
      .writeStream.format("memory").queryName("wp_stream_toks")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getSeq[String](1)))
    assert(rows(spark.table("wp_stream_toks")).toSeq ==
      rows(toks(spark.read.parquet(s"$dir/docs"))).toSeq)
  }

  test("encodeUdf/tokenCountUdf: broadcast vocab over the pieces " +
      "column, null-safe") {
    import SparkSpec.spark.implicits._
    val learnedV = Vocab(Set("a", "ab", "##c", "b"))
    val df = Seq(Seq("abc", "b"), null)
      .toDF("pieces")
    val enc = WordPieceTrainer.encodeUdf(spark, learnedV)
    val cnt = WordPieceTrainer.tokenCountUdf(spark, learnedV)
    val rows = df.select(enc(col("pieces")).as("t"),
      cnt(col("pieces")).as("n")).collect()
    assert(rows(0).getSeq[String](0) == Seq("ab", "##c", "b"))
    assert(rows(0).getLong(1) == 3L)
    assert(rows(1).isNullAt(0) && rows(1).getLong(1) == 0L)
  }
}
