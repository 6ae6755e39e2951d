package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, UnigramTrainer}
import graft.pipeline.TextOps

/** Unigram-LM trainer checks: the forward marginal and the Viterbi
  * segmentation are each pinned against an INDEPENDENT brute-force
  * enumerator (all segmentations, scores folded right-to-left exactly
  * like the DP so equality is exact, not approximate), EM is pinned to
  * its defining property (the corpus log-likelihood never decreases),
  * and the end-to-end Spark path round-trips the fixture corpus.
  */
class UnigramSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$fixtures/documents.parquet")

  private def toCps(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Every segmentation of `s` into vocab pieces (unknown single
    * codepoints at `unk` when finite), with its score folded
    * RIGHT-TO-LEFT — the reference the DP must match bit-for-bit.
    */
  private def enumerate(s: String, logp: Map[String, Double],
      maxLen: Int, unk: Double): Seq[(List[String], Double)] = {
    val cps = toCps(s)
    def go(i: Int): Seq[(List[String], Double)] =
      if (i == cps.length) Seq((Nil, 0.0))
      else (1 to math.min(maxLen, cps.length - i)).flatMap { l =>
        val piece = cps.slice(i, i + l).mkString
        val lp = logp.getOrElse(piece,
          if (l == 1) unk else Double.NegativeInfinity)
        if (lp == Double.NegativeInfinity) Seq.empty
        else go(i + l).map { case (rest, sc) => (piece :: rest, lp + sc) }
      }
    go(0)
  }

  private val handVocab = Map(
    "a" -> math.log(0.3), "b" -> math.log(0.2), "c" -> math.log(0.1),
    "ab" -> math.log(0.25), "bc" -> math.log(0.1),
    "abc" -> math.log(0.05))

  test("forward marginal equals brute-force enumeration over all " +
      "segmentations") {
    val probs = handVocab.map { case (k, v) => k -> math.exp(v) }
    for (s <- Seq("abcab", "aaab", "cabab", "abcabcab", "b")) {
      val dp = UnigramTrainer.logMarginal(s, probs, 3)
      val brute = math.log(
        enumerate(s, handVocab, 3, Double.NegativeInfinity)
          .map { case (_, sc) => math.exp(sc) }.sum)
      assert(math.abs(dp - brute) < 1e-9, s"$s: dp=$dp brute=$brute")
    }
  }

  test("viterbi equals the enumerator's argmax (exact score parity, " +
      "fewer-pieces-then-longest-first ties)") {
    val unk = handVocab.values.min - 10.0
    for (s <- Seq("abcab", "aaab", "cabab", "abcabcab", "abxc", "x")) {
      val got = UnigramTrainer.viterbi(s, handVocab, 3, unk).toList
      assert(got.mkString == s, s"$s: reconstruction broke: $got")
      val all = enumerate(s, handVocab, 3, unk)
      assert(all.nonEmpty)
      // the DP's score is the same right-to-left fold the enumerator
      // uses, so max-score equality is EXACT double equality
      val gotScore = got.foldRight(0.0) { (p, acc) =>
        handVocab.getOrElse(p, unk) + acc
      }
      val best = all.map(_._2).max
      assert(gotScore == best, s"$s: $gotScore != $best")
      val coOptimal = all.filter(_._2 == best)
      val minPieces = coOptimal.map(_._1.length).min
      assert(got.length == minPieces,
        s"$s: ${got.length} pieces, enumerator found $minPieces")
      val tied = coOptimal.filter(_._1.length == minPieces)
      if (tied.length == 1)
        assert(got == tied.head._1, s"$s: unique optimum mismatch")
      else
        assert(tied.map(_._1).contains(got),
          s"$s: DP result not among co-optimal segmentations")
    }
  }

  test("EM never decreases the corpus log-likelihood") {
    val types = Seq(("abab", 4L), ("abc", 3L), ("bca", 2L), ("aa", 5L))
    // deliberately bad start: uniform over singles + a few multis
    val keys = Seq("a", "b", "c", "ab", "bc", "ca", "abc")
    var probs = keys.map(_ -> 1.0 / keys.size).toMap
    var ll = UnigramTrainer.logLikelihood(types, probs, 3)
    for (i <- 1 to 6) {
      probs = UnigramTrainer.emStep(types, probs, 3)
      val next = UnigramTrainer.logLikelihood(types, probs, 3)
      assert(next >= ll - 1e-9, s"iter $i: $next < $ll")
      ll = next
    }
    assert(math.abs(probs.values.sum - 1.0) < 1e-9)
  }

  test("trainLocal: singles survive pruning, target respected, " +
      "deterministic, probabilities normalized") {
    val types = Seq(("the", 50L), ("then", 20L), ("thin", 10L),
      ("rethink", 5L), ("ink", 8L), ("he", 12L))
    val v1 = UnigramTrainer.trainLocal(types, vocabSize = 10,
      maxPieceLen = 4, seedSize = 50, emIters = 2, pruneFrac = 0.25)
    val v2 = UnigramTrainer.trainLocal(types, vocabSize = 10,
      maxPieceLen = 4, seedSize = 50, emIters = 2, pruneFrac = 0.25)
    assert(v1 == v2, "training must be deterministic")
    val singles = Set("t", "h", "e", "n", "i", "r", "k")
    assert(singles.subsetOf(v1.map(_.piece).toSet),
      s"every codepoint of the corpus must survive: ${v1.map(_.piece)}")
    assert(v1.size == 10, s"target vocab size: got ${v1.size}")
    assert(math.abs(v1.map(e => math.exp(e.logProb)).sum - 1.0) < 1e-9)
    // the dominant substring should have been kept as a piece
    assert(v1.map(_.piece).contains("the"),
      s"expected 'the' in ${v1.map(_.piece)}")
  }

  test("trainLocal: vocab never shrinks below the codepoint inventory") {
    val types = Seq(("abcdefgh", 1L))
    val v = UnigramTrainer.trainLocal(types, vocabSize = 3,
      maxPieceLen = 3, seedSize = 10, emIters = 1, pruneFrac = 0.5)
    assert(v.count(e => e.piece.codePointCount(0, e.piece.length) == 1)
      == 8)
    assert(v.size == 8, s"singles only: ${v.map(_.piece)}")
  }

  test("vocab persists: vocabDf -> parquet -> loadVocab round-trips " +
      "and the loaded vocab segments identically") {
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val vocab = UnigramTrainer.train(docs.limit(40), piecesCol,
      vocabSize = 120, maxPieceLen = 5, seedSize = 300, emIters = 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_unigram_vocab").toString
    UnigramTrainer.vocabDf(spark, vocab)
      .write.mode("overwrite").parquet(dir)
    val loaded = UnigramTrainer.loadVocab(spark.read.parquet(dir))
    assert(loaded == vocab, "stored vocabulary must round-trip exactly")
    val a = docs.limit(20)
      .select(UnigramTrainer.segmentUdf(spark, vocab, 5)(piecesCol))
      .collect().map(_.getSeq[String](0)).toSeq
    val b = docs.limit(20)
      .select(UnigramTrainer.segmentUdf(spark, loaded, 5)(piecesCol))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(a == b)
  }

  test("train -> encode-to-ids -> striding token windows closes for " +
      "the unigram family") {
    import graft.pipeline.Packing
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val vocab = UnigramTrainer.train(docs.limit(60), piecesCol,
      vocabSize = 200, maxPieceLen = 5, seedSize = 400, emIters = 1)
    val enc = UnigramTrainer.encodeIdsUdf(spark, vocab, 5)
    val ids = docs.limit(60)
      .select(col("doc_id"), enc(piecesCol).as("ids"))
    // id -> piece decode restores the segment stream (unknowns = -1
    // never appear here: training covered every corpus codepoint)
    val pieceOf = vocab.map(_.piece).toArray
    val decoded = ids.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1).map(i => pieceOf(i)).mkString)
      .toMap
    val pre = docs.limit(60)
      .select(col("doc_id"), concat_ws("", piecesCol).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decoded == pre, "id decode must rebuild the pre-token stream")
    // windows over the unigram ids: every window row's token_id matches
    // the doc's id array at position win_no*stride + pos - 1
    val win = Packing.tokenWindows(ids, "doc_id", "ids", 16, 8)
    val bad = win.join(ids, "doc_id")
      .filter(col("token_id") =!=
        element_at(col("ids"), col("win_no") * 8 + col("pos")))
      .count()
    assert(bad == 0, s"$bad window rows disagree with the id arrays")
    assert(win.count() > 0)
  }

  test("decodeIdsUdf inverts encodeIdsUdf: canonical-rank lookup, " +
      "unknown and out-of-range ids render as the unk marker") {
    val s = spark
    import s.implicits._
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val vocab = UnigramTrainer.train(docs.limit(60), piecesCol,
      vocabSize = 200, maxPieceLen = 5, seedSize = 400, emIters = 1)
    val enc = UnigramTrainer.encodeIdsUdf(spark, vocab, 5)
    val dec = UnigramTrainer.decodeIdsUdf(spark, vocab)
    // decode(encode(text)) == the pre-token stream concat on a corpus
    // whose training covered every codepoint (no -1s)
    val rows = docs.limit(60)
      .select(dec(enc(piecesCol)).as("d"),
        concat_ws("", piecesCol).as("t"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    // -1 (unknown) and garbage ids render as the marker, in place
    val odd = Seq(Seq(0, -1, vocab.size, 1)).toDF("ids")
    val got = odd.select(dec(col("ids"))).collect().head.getString(0)
    assert(got == vocab(0).piece + "��" + vocab(1).piece)
  }

  test("end-to-end on the fixture corpus: train, segment, round-trip") {
    val piecesCol = Bpe.preTokenize(TextOps.normalize(col("text")))
    val vocab = UnigramTrainer.train(docs.limit(100), piecesCol,
      vocabSize = 300, maxPieceLen = 6, seedSize = 600, emIters = 1)
    assert(vocab.size >= 300, s"got ${vocab.size}")
    assert(vocab.exists(e =>
        e.piece.codePointCount(0, e.piece.length) > 1),
      "must learn multi-codepoint pieces")
    val seg = UnigramTrainer.segmentUdf(spark, vocab, maxPieceLen = 6)
    // round-trip: concatenating each pre-token's segments rebuilds the
    // pre-token stream exactly, over the WHOLE corpus (unknown
    // codepoints fall back to singles, so nothing is ever dropped)
    val broken = docs
      .select(piecesCol.as("pre"), seg(piecesCol).as("segs"))
      .select(concat_ws("", col("pre")).as("a"),
        concat_ws("", col("segs")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(broken == 0, s"$broken docs failed the round-trip")
    // and segmentation compresses vs single codepoints somewhere
    val counts = docs.limit(100)
      .select(size(flatten(transform(piecesCol, p => split(p, ""))))
          .as("n_cp"),
        size(seg(piecesCol)).as("n_seg"))
      .agg(sum("n_cp").as("cp"), sum("n_seg").as("sg")).head()
    assert(counts.getLong(1) < counts.getLong(0),
      s"segmentation should beat char-level: $counts")
  }
}
