package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training — the SentencePiece
  * unigram model (Kudo 2018, "Subword Regularization", arXiv:1804.10959
  * — public), the second tokenizer family next to [[BpeTrainer]] and
  * deliberately the SAME scale shape:
  *
  *  - the DISTRIBUTED stage is the piece-type reduction
  *    ([[BpeTrainer.pieceTypeCounts]], shared): the corpus collapses to
  *    a vocabulary-bounded `(piece, count)` table in ONE hash
  *    aggregation — nothing else of the corpus ever reaches the driver;
  *  - seeding, EM, and pruning then run driver-side over that bounded
  *    table, exactly how production unigram trainers work (distributed
  *    word counting, local lattice EM).
  *
  * Algorithm (per the paper, simplified where noted): seed the
  * candidate vocabulary with every single codepoint of the type table
  * (mandatory — they guarantee segmentability and are never pruned)
  * plus the `seedSize` most frequent multi-codepoint substrings of
  * length ≤ `maxPieceLen`; iterate { `emIters` × EM over the
  * forward-backward lattice of every piece type; prune the
  * lowest-expected-count multi-codepoint pieces down to
  * `max(target, (1 − pruneFrac) · current)` } until the vocabulary fits
  * `vocabSize`; finish with one more EM polish. The prune criterion is
  * expected count (ties broken by codepoint order, larger piece
  * dropped first) — a deterministic simplification of the paper's
  * likelihood-drop ranking, documented as such.
  *
  * Determinism contract (what the specs pin): types are processed in
  * type-table order, lattice edges in (position, length) order,
  * normalization sums and rankings over codepoint-sorted keys — two
  * runs over the same type table produce bit-identical vocabularies.
  * Floating-point scores accumulate right-to-left (suffix folds), and
  * [[viterbi]] ties resolve to (fewer pieces, then longest first
  * piece); the spec's independent reference enumerates segmentations
  * with the same fold direction so argmax parity is exact, not
  * approximate.
  */
object UnigramTrainer {

  /** One vocabulary entry; `logProb` is the natural-log unigram
    * probability (probabilities over the final vocabulary sum to 1).
    */
  final case class VocabEntry(piece: String, logProb: Double)

  private val NegInf = Double.NegativeInfinity

  private def toCps(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a == NegInf) b
    else if (b == NegInf) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  private implicit val cpOrdering: Ordering[String] =
    (a: String, b: String) => BpeTrainer.codepointCompare(a, b)

  /** Learn a unigram vocabulary from `corpus`. `pieces` is the
    * pre-token column (e.g. `Bpe.preTokenize(TextOps.normalize(
    * col("text")))`) — the lattice runs INSIDE piece boundaries, like
    * the BPE trainer and encoder. `maxPieceTypes` caps the collected
    * type table exactly as in [[BpeTrainer.train]] (same collect
    * contract, same cap semantics). The returned vocabulary holds every
    * single codepoint of the (capped) type table plus the surviving
    * multi-codepoint pieces — `vocabSize` is therefore a target the
    * result can exceed when the codepoint inventory alone exceeds it.
    */
  def train(corpus: DataFrame, pieces: Column, vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 4000, emIters: Int = 2,
      pruneFrac: Double = 0.25,
      maxPieceTypes: Option[Int] = None): Seq[VocabEntry] = {
    val types = BpeTrainer.cappedTypeCounts(corpus, pieces, maxPieceTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    trainLocal(types, vocabSize, maxPieceLen, seedSize, emIters,
      pruneFrac)
  }

  /** The EM + prune loop over an in-memory `(piece, count)` type
    * table — driver-side by design; package-visible so specs can drive
    * it on hand-built fixtures.
    */
  private[graft] def trainLocal(types: Seq[(String, Long)],
      vocabSize: Int, maxPieceLen: Int = 8, seedSize: Int = 4000,
      emIters: Int = 2, pruneFrac: Double = 0.25): Seq[VocabEntry] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(pruneFrac > 0 && pruneFrac < 1,
      s"pruneFrac must be in (0,1), got $pruneFrac")
    val typeCps = types.map(t => toCps(t._1)).toArray
    val typeCnt = types.map(_._2.toDouble).toArray

    // ---- seed: raw substring counts, singles mandatory
    val subCounts = scala.collection.mutable.HashMap.empty[String, Double]
    var w = 0
    while (w < typeCps.length) {
      val cps = typeCps(w)
      val c = typeCnt(w)
      var i = 0
      while (i < cps.length) {
        var l = 1
        val maxL = math.min(maxPieceLen, cps.length - i)
        val sb = new java.lang.StringBuilder
        while (l <= maxL) {
          sb.append(cps(i + l - 1))
          val sub = sb.toString
          subCounts.update(sub, subCounts.getOrElse(sub, 0.0) + c)
          l += 1
        }
        i += 1
      }
      w += 1
    }
    val singles = subCounts.keysIterator.filter(cpLen(_) == 1).toSeq.sorted
    val multiSeed = subCounts.iterator.filter(kv => cpLen(kv._1) > 1)
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize).map(_._1)
    var probs: Map[String, Double] = {
      val keys = (singles ++ multiSeed).sorted
      val total = keys.iterator.map(subCounts).sum
      keys.iterator.map(k => k -> subCounts(k) / total).toMap
    }

    def renormalize(p: Map[String, Double]): Map[String, Double] = {
      val keys = p.keysIterator.toSeq.sorted
      val total = keys.iterator.map(p).sum
      keys.iterator.map(k => k -> p(k) / total).toMap
    }

    // EM output IS the normalized expected-count table, so the prune
    // ranks on post-EM probabilities — the same order as expected
    // counts (monotone transform), with no second lattice pass
    val targetMultis = math.max(0, vocabSize - singles.size)
    var multis = probs.size - singles.size
    var rounds = 0
    while (multis > targetMultis && rounds < 100) {
      var it = 0
      while (it < emIters) {
        probs = emStep(types, probs, maxPieceLen)
        it += 1
      }
      val keep = math.max(targetMultis,
        (multis * (1 - pruneFrac)).floor.toInt)
      val nDrop = math.max(1, multis - keep)
      val dropped = probs.keysIterator.filter(cpLen(_) > 1).toSeq
        .sortBy(p => (probs(p), p))(
          Ordering.Tuple2(Ordering.Double.TotalOrdering,
            cpOrdering.reverse))
        .take(nDrop).toSet
      probs = renormalize(probs.view.filterKeys(!dropped(_)).toMap)
      multis = probs.size - singles.size
      rounds += 1
    }
    var it = 0
    while (it < emIters) {
      probs = emStep(types, probs, maxPieceLen)
      it += 1
    }
    // tie-break explicitly in CODEPOINT order (not UTF-16 code-unit
    // order): the canonical-id oracle replays this sort under Spark /
    // DuckDB binary collation, which compares codepoints — the two
    // orders diverge between [U+E000, U+FFFF] and astral pieces.
    // Sort by the STORED key (log prob), not the raw probability: log
    // loses ~2 bits in the typical 1e-3..1e-5 range, so distinct
    // probabilities can collapse to equal log doubles — ranking by the
    // raw value here would then disagree with every downstream
    // re-derivation of the canonical (log_prob desc, piece) order
    // (vocabDf consumers, the q_unigram_ids gate)
    probs.toSeq.map { case (p, pr) => (p, math.log(pr)) }
      .sortBy { case (p, lp) => (-lp, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, cpOrdering))
      .map { case (p, lp) => VocabEntry(p, lp) }
  }

  /** Corpus log-likelihood of a type table under a vocabulary — the EM
    * objective, exposed for the monotonicity spec (EM must never
    * decrease it).
    */
  private[graft] def logLikelihood(types: Seq[(String, Long)],
      probs: Map[String, Double], maxPieceLen: Int): Double =
    types.iterator.map { case (s, c) =>
      c * logMarginal(s, probs, maxPieceLen)
    }.sum

  /** Forward pass over one piece's segmentation lattice: `alpha(i)` =
    * log total probability of all segmentations of the first `i`
    * codepoints. Shared by [[logMarginal]] and [[emStep]].
    */
  private def forwardAlpha(cps: Array[String],
      probs: Map[String, Double], maxPieceLen: Int): Array[Double] = {
    val n = cps.length
    val alpha = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    var i = 0
    while (i < n) {
      if (alpha(i) != NegInf) {
        val maxL = math.min(maxPieceLen, n - i)
        val sb = new java.lang.StringBuilder
        var l = 1
        while (l <= maxL) {
          sb.append(cps(i + l - 1))
          probs.get(sb.toString).foreach { pp =>
            alpha(i + l) = logAdd(alpha(i + l), alpha(i) + math.log(pp))
          }
          l += 1
        }
      }
      i += 1
    }
    alpha
  }

  /** Log of the total probability of `s` summed over ALL segmentations
    * into vocabulary pieces (the forward pass alone) — the quantity the
    * spec pins against brute-force enumeration.
    */
  private[graft] def logMarginal(s: String, probs: Map[String, Double],
      maxPieceLen: Int): Double = {
    val cps = toCps(s)
    forwardAlpha(cps, probs, maxPieceLen)(cps.length)
  }

  /** Probability floor applied at every re-estimation: EM drives
    * unused pieces' mass geometrically toward zero, and an EXACT zero
    * is fatal — log(0) = −∞ makes lattice positions unreachable and
    * silently drops vocabulary keys (including mandatory singles). The
    * floor is far below any mass EM distinguishes (it never changes a
    * ranking) but keeps every piece finitely scored; pruning, not
    * underflow, is what removes pieces.
    */
  private val MinProb = 1e-100

  /** One EM step exposed for the spec: re-estimated probabilities from
    * the expected counts under `probs`, over exactly `probs`' key set
    * (floored — see [[MinProb]]).
    */
  private[graft] def emStep(types: Seq[(String, Long)],
      probs: Map[String, Double], maxPieceLen: Int)
      : Map[String, Double] = {
    val exp = scala.collection.mutable.HashMap.empty[String, Double]
    types.foreach { case (s, c) =>
      val cps = toCps(s)
      val n = cps.length
      val alpha = forwardAlpha(cps, probs, maxPieceLen)
      val beta = Array.fill(n + 1)(NegInf)
      beta(n) = 0.0
      var i = n - 1
      while (i >= 0) {
        val maxL = math.min(maxPieceLen, n - i)
        val sb = new java.lang.StringBuilder
        var l = 1
        while (l <= maxL) {
          sb.append(cps(i + l - 1))
          probs.get(sb.toString).foreach { pp =>
            if (beta(i + l) != NegInf)
              beta(i) = logAdd(beta(i), math.log(pp) + beta(i + l))
          }
          l += 1
        }
        i -= 1
      }
      val z = alpha(n)
      i = 0
      while (i < n) {
        if (alpha(i) != NegInf) {
          val maxL = math.min(maxPieceLen, n - i)
          val sb = new java.lang.StringBuilder
          var l = 1
          while (l <= maxL) {
            sb.append(cps(i + l - 1))
            val piece = sb.toString
            probs.get(piece).foreach { pp =>
              if (beta(i + l) != NegInf) {
                val post =
                  math.exp(alpha(i) + math.log(pp) + beta(i + l) - z)
                exp.update(piece, exp.getOrElse(piece, 0.0) + c * post)
              }
            }
            l += 1
          }
        }
        i += 1
      }
    }
    val keys = probs.keysIterator.toSeq.sorted
    val floored = keys.map(k =>
      k -> math.max(exp.getOrElse(k, 0.0), MinProb))
    val total = floored.iterator.map(_._2).sum
    floored.iterator.map { case (k, v) => k -> v / total }.toMap
  }

  /** Viterbi segmentation of one pre-token piece: the max-probability
    * split into vocabulary pieces, DP over codepoint positions from the
    * RIGHT (suffix fold — scores accumulate `logp + dp(i+l)`, the exact
    * arithmetic the spec's enumerator mirrors). Ties resolve to fewer
    * pieces, then the longest first piece. Codepoints absent from the
    * vocabulary segment as single-codepoint pieces at `unkLogProb`.
    */
  private[graft] def viterbi(s: String, logp: Map[String, Double],
      maxPieceLen: Int, unkLogProb: Double): Array[String] = {
    val cps = toCps(s)
    val n = cps.length
    if (n == 0) return Array.empty
    val score = Array.fill(n + 1)(NegInf)
    val nPieces = new Array[Int](n + 1)
    val firstLen = new Array[Int](n + 1)
    score(n) = 0.0
    var i = n - 1
    while (i >= 0) {
      val maxL = math.min(maxPieceLen, n - i)
      val sb = new java.lang.StringBuilder
      var l = 1
      while (l <= maxL) {
        sb.append(cps(i + l - 1))
        val lp = logp.get(sb.toString) match {
          case Some(p) => p
          case None => if (l == 1) unkLogProb else NegInf
        }
        if (lp != NegInf && score(i + l) != NegInf) {
          val cand = lp + score(i + l)
          val candN = 1 + nPieces(i + l)
          val better = cand > score(i) ||
            (cand == score(i) &&
              (candN < nPieces(i) ||
                (candN == nPieces(i) && l > firstLen(i))))
          if (better) {
            score(i) = cand; nPieces(i) = candN; firstLen(i) = l
          }
        }
        l += 1
      }
      i -= 1
    }
    val out = Array.newBuilder[String]
    var p = 0
    while (p < n) {
      val l = firstLen(p)
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < l) { sb.append(cps(p + k)); k += 1 }
      out += sb.toString
      p += l
    }
    out.result()
  }

  /** The learned vocabulary as a `(id, piece, log_prob)` DataFrame —
    * the persistable artifact a training run publishes next to its
    * corpus (ids are the canonical (logProb desc, piece) rank, so a
    * stored vocabulary round-trips bit-identically through
    * [[loadVocab]]).
    */
  def vocabDf(spark: SparkSession, vocab: Seq[VocabEntry]): DataFrame = {
    import spark.implicits._
    vocab.zipWithIndex
      .map { case (e, i) => (i, e.piece, e.logProb) }
      .toDF("id", "piece", "log_prob")
  }

  /** Rebuild the vocabulary from a stored [[vocabDf]] frame, in stored
    * id order.
    */
  def loadVocab(df: DataFrame): Seq[VocabEntry] =
    df.select(col("id"), col("piece"), col("log_prob"))
      .collect().sortBy(_.getInt(0))
      .map(r => VocabEntry(r.getString(1), r.getDouble(2))).toSeq

  /** [[viterbi]] as a UDF over the pre-token pieces array — vocab
    * broadcast once, narrow, stateless, streaming-safe (the serving
    * twin of [[train]], same pattern as
    * [[graft.pipeline.Dedup.removeBenchmarkSpansNarrow]]). Unknown
    * codepoints score strictly below every vocabulary piece.
    */
  def segmentUdf(spark: SparkSession, vocab: Seq[VocabEntry],
      maxPieceLen: Int = 8): UserDefinedFunction = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val logp = vocab.map(e => e.piece -> e.logProb).toMap
    val unk = vocab.iterator.map(_.logProb).min - 10.0
    val bc = spark.sparkContext.broadcast((logp, unk))
    val mpl = maxPieceLen
    udf((pieces: Seq[String]) =>
      if (pieces == null) null
      else pieces.flatMap(p => viterbi(p, bc.value._1, mpl, bc.value._2)))
  }

  /** [[segmentUdf]] straight to vocabulary IDS ([[vocabDf]]'s canonical
    * rank; pieces outside the vocabulary — unknown-codepoint fallbacks —
    * encode as −1), the array [[graft.pipeline.Packing.tokenWindows]]
    * and the bin packers consume: train → encode → pack closes for the
    * unigram family exactly as it does for BPE.
    */
  def encodeIdsUdf(spark: SparkSession, vocab: Seq[VocabEntry],
      maxPieceLen: Int = 8): UserDefinedFunction = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val logp = vocab.map(e => e.piece -> e.logProb).toMap
    val ids = vocab.iterator.map(_.piece).zipWithIndex.toMap
    val unk = vocab.iterator.map(_.logProb).min - 10.0
    val bc = spark.sparkContext.broadcast((logp, ids, unk))
    val mpl = maxPieceLen
    udf((pieces: Seq[String]) =>
      if (pieces == null) null
      else pieces.flatMap(p =>
        viterbi(p, bc.value._1, mpl, bc.value._3)
          .map(bc.value._2.getOrElse(_, -1))))
  }

  /** Decode an id sequence back to text — the inverse of
    * [[encodeIdsUdf]]: each id indexes [[vocabDf]]'s canonical rank
    * order and the pieces concatenate (Viterbi segmentations tile the
    * word, so decode(encode(text)) is the identity wherever every
    * piece landed in-vocabulary). `-1` — the unknown-codepoint fallback
    * — and any out-of-range id render as `unkAs` rather than failing.
    * Vocabulary broadcast once, narrow, stateless, streaming-safe.
    */
  def decodeIdsUdf(spark: SparkSession, vocab: Seq[VocabEntry],
      unkAs: String = "�"): UserDefinedFunction = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val pieces = vocab.iterator.map(_.piece).toArray
    val bc = spark.sparkContext.broadcast(pieces)
    udf((ids: Seq[Int]) =>
      if (ids == null) null
      else {
        val arr = bc.value
        val sb = new java.lang.StringBuilder
        ids.foreach(i =>
          sb.append(if (i >= 0 && i < arr.length) arr(i) else unkAs))
        sb.toString
      })
  }
}
