package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE *training* — learns a merge table from a corpus, the
  * missing first stage of the train → encode ([[Bpe.encodeWithIds]]) →
  * pack ([[graft.pipeline.Packing]]) flow. The algorithm is the
  * standard corpus BPE (count adjacent symbol pairs, merge the most
  * frequent, repeat — Sennrich et al. 2016, public):
  *
  *  - the DISTRIBUTED stage is the piece-type reduction: the corpus
  *    collapses to `(piece, count)` via one hash aggregation — at 100 TB
  *    the distinct pre-token pieces of natural-language text number in
  *    the low millions (bounded by the language's vocabulary, not the
  *    corpus), so this is the same "heavy scan reduces to a bounded
  *    table" shape as [[graft.pipeline.TextOps.vocabulary]];
  *  - the merge LOOP then runs driver-side over the bounded type table
  *    (exactly how production tokenizer trainers work: distributed word
  *    counting, local merge selection) — O(merges · total symbols)
  *    with in-place re-segmentation, no per-iteration Spark job.
  *
  * Determinism contract (what the DuckDB oracle re-derives step by
  * step): pair counts weight EVERY adjacent index (overlapping
  * occurrences included, so "aaa" holds two (a,a) adjacencies), the
  * winning pair maximises (count, then lexicographically smallest left,
  * then right — compared by CODEPOINT so the order matches a binary
  * UTF-8 collation), and applying a merge rewrites each piece
  * leftmost-non-overlapping, matching [[BpeMerges]]' encode exactly.
  */
object BpeTrainer {

  /** One learned rule with its selection-time evidence — `pairCount` is
    * the adjacency count that made `(left, right)` the argmax at
    * `rank`, the value the cross-engine oracle re-derives.
    */
  final case class LearnedMerge(rank: Int, left: String, right: String,
      pairCount: Long)

  /** Codepoint-order string comparison (== binary UTF-8 order, the
    * DuckDB default collation). Java's `String.compareTo` is UTF-16
    * code-unit order, which sorts supplementary characters BEFORE
    * U+E000..U+FFFF — the one range where the two orders disagree.
    */
  private[graft] def codepointCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** The distributed stage: corpus → distinct `(piece, cnt)` types.
    * One explode + hash aggregation; empty pieces dropped. Exposed so
    * callers can persist / inspect the type table independently.
    */
  def pieceTypeCounts(corpus: DataFrame, pieces: Column): DataFrame =
    corpus.select(explode(pieces).as("piece"))
      .filter(length(col("piece")) > 0)
      .groupBy("piece").agg(count(lit(1)).as("cnt"))

  /** [[pieceTypeCounts]] under the shared `maxPieceTypes` contract —
    * top-N by (count DESC, piece), the deterministic codepoint
    * tie-break; `None` keeps every type. THE single definition of the
    * cap all three trainer families (and [[WordPieceTrainer.toVocab]])
    * use, so the documented "identical contract" cannot drift.
    */
  def cappedTypeCounts(corpus: DataFrame, pieces: Column,
      maxPieceTypes: Option[Int]): DataFrame = {
    val base = pieceTypeCounts(corpus, pieces)
    maxPieceTypes match {
      case Some(n) => base.orderBy(col("cnt").desc, col("piece")).limit(n)
      case None => base
    }
  }

  /** Learn `numMerges` rules from `corpus`. `pieces` is the pre-token
    * column (e.g. `Bpe.preTokenize(TextOps.normalize(col("text")))`) —
    * training runs INSIDE piece boundaries, like the encoder.
    *
    * `maxPieceTypes` caps the collected type table (kept by highest
    * count, ties by codepoint order) for corpora whose type table
    * outgrows the driver; `None` collects every type. The cap changes
    * learned merges only through the dropped tail's counts — at real
    * corpus scale the tail is hapax noise, but the default is uncapped
    * so the oracle sees the identical computation.
    *
    * Stops early (fewer than `numMerges` rules) if no adjacent pair
    * remains.
    */
  def train(corpus: DataFrame, pieces: Column, numMerges: Int,
      maxPieceTypes: Option[Int] = None): Seq[LearnedMerge] = {
    // bounded driver state: the piece-TYPE table (see object doc), the
    // same O(vocabulary) collect contract as TextOps.vocabulary
    val types = cappedTypeCounts(corpus, pieces, maxPieceTypes).collect()
      .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    trainLocal(types, numMerges)
  }

  /** The merge loop over an in-memory `(piece, count)` type table —
    * driver-side by design; package-visible so specs can drive it on
    * hand-built fixtures.
    */
  private[graft] def trainLocal(types: Seq[(String, Long)],
      numMerges: Int): Seq[LearnedMerge] = {
    // mutable segmentations, one per piece type
    val segs: Array[Array[String]] = types.map { case (p, _) =>
      val out = Array.newBuilder[String]
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }.toArray
    val cnts: Array[Long] = types.map(_._2).toArray

    val learned = Seq.newBuilder[LearnedMerge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // count every adjacent index, weighted by the type's count
      val pairs = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      var w = 0
      while (w < segs.length) {
        val s = segs(w)
        val c = cnts(w)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          pairs.update(k, pairs.getOrElse(k, 0L) + c)
          i += 1
        }
        w += 1
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val ((a, b), c) = pairs.minBy { case ((x, y), n) =>
          (-n, new CodepointKey(x), new CodepointKey(y))
        }
        learned += LearnedMerge(rank, a, b, c)
        w = 0
        while (w < segs.length) {
          val s = segs(w)
          // leftmost non-overlapping, same pass as BpeMerges.encode
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            has = s(i) == a && s(i + 1) == b; i += 1
          }
          if (has) {
            val out = Array.newBuilder[String]
            i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                out += a + b; i += 2
              } else { out += s(i); i += 1 }
            }
            segs(w) = out.result()
          }
          w += 1
        }
        rank += 1
      }
    }
    learned.result()
  }

  /** Ordering adapter for [[codepointCompare]] (minBy needs an
    * Ordered key).
    */
  private final class CodepointKey(val s: String)
      extends Comparable[CodepointKey] {
    override def compareTo(o: CodepointKey): Int = codepointCompare(s, o.s)
  }
  private implicit val codepointKeyOrdering: Ordering[CodepointKey] =
    (a: CodepointKey, b: CodepointKey) => a.compareTo(b)

  /** Package a training run as a validated [[BpeMerges]] — construction
    * re-checks the greedy==rank-order invariant (trained rules satisfy
    * it by construction: every side is a codepoint or an earlier
    * output; a duplicate-output collision — two rule applications
    * forming the same string — fails loudly there rather than encoding
    * differently than it trained).
    */
  def toMerges(learned: Seq[LearnedMerge]): BpeMerges =
    BpeMerges(learned.map(m => (m.left, m.right)))
}
