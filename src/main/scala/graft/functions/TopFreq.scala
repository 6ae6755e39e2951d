package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch: the bounded-state approximate
  * answer to "which tokens dominate this corpus" — the frequency
  * analog of the GK quantile sketch ([[graft.pipeline.Percentiles]])
  * and the HLL distinct count. An exact `q_vocab`-style hash aggregate
  * keys the shuffle by TOKEN, so at 100 TB a Zipfian head token
  * concentrates its updates into one reducer; the sketch instead keeps
  * ≤ `k` counters per PARTITION and merges them — state and shuffle are
  * O(k) no matter how skewed or large the corpus.
  *
  * Guarantees (standard Misra-Gries, preserved under the mergeable-
  * summaries combine of Agarwal et al., PODS'12):
  *  - every reported count UNDERestimates its true count by at most
  *    n/(k+1) over n total observations;
  *  - any item with true count > n/(k+1) is guaranteed present.
  * Items and counts are exact when a group has ≤ k distinct tokens.
  *
  * The reported ITEM SET may vary with partitioning for items near the
  * error floor (like any mergeable sketch); the bounds above always
  * hold, and the spec pins them against exact counts. Output is sorted
  * (estimate desc, token asc) for deterministic presentation.
  */
final class TopFreq(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  /** Classic Misra-Gries step: count if tracked, adopt if a slot is
    * free, otherwise decrement every counter (dropping zeros) — each
    * decrement "spends" k+1 occurrences, which is where the n/(k+1)
    * bound comes from.
    */
  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) buf
    else buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1)
      case None if buf.size < k => buf.updated(v, 1L)
      case None =>
        buf.flatMap { case (t, c) =>
          if (c > 1) Some(t -> (c - 1)) else None
        }
    }

  /** Mergeable-summaries combine: add counts, then if more than k
    * survive, subtract the (k+1)-th largest count from every counter
    * and drop the non-positive — the same spend argument bounds the
    * total undercount by n/(k+1) across any merge tree.
    */
  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) =>
        if (c > cut) Some(t -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
