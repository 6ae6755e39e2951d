package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator keeping the k smallest DISTINCT strings per group —
  * the bounded-state engine behind bottom-k sketches
  * ([[graft.pipeline.TextOps.fingerprint]]).
  *
  * A `collect_set`+sort+slice formulation materialises every distinct
  * value of a group before truncating — unbounded per-group state at
  * corpus scale. This Aggregator's buffer never exceeds k elements, and
  * Spark runs it with map-side partial aggregation: each input partition
  * reduces to ≤k values per group before the shuffle, so per-group memory
  * and shuffle volume are O(k) regardless of group size.
  */
final class BottomK(k: Int)
    extends Aggregator[String, Seq[String], Seq[String]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[String] = Vector.empty

  private def insert(buf: Seq[String], v: String): Seq[String] =
    if (v == null || buf.contains(v)) buf
    else if (buf.size < k) (buf :+ v).sorted
    else if (v < buf.last) (buf.init :+ v).sorted
    else buf

  override def reduce(buf: Seq[String], v: String): Seq[String] =
    insert(buf, v)
  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[String]): Seq[String] = buf

  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
