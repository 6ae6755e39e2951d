package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped quantiles at two fidelities.
  *
  * - [[exactQuantiles]] — sort-based interpolated percentiles. Spark's
  *   `percentile` buffers every value of a group in the aggregation state,
  *   so memory is O(group size): correct and fine up to groups of a few
  *   hundred million values, an executor OOM beyond that. This is the
  *   oracle/correctness path.
  * - [[approxQuantiles]] — `approx_percentile` (Greenwald–Khanna sketch,
  *   SIGMOD '01): state is O(accuracy · log n) per group regardless of
  *   group size, with rank error ≤ n/accuracy. This is the 100 TB
  *   production path — see SCALING.md §Percentiles.
  *
  * Both compute ALL requested probabilities in ONE aggregation buffer
  * (`percentile(col, array(p…))`), then project `element_at` into scalar
  * columns — n probabilities cost one sort/sketch, not n.
  */
object Percentiles {

  /** GK sketch accuracy giving ≤0.01% rank error — ~40 KB state per group,
    * independent of group size.
    */
  val DefaultAccuracy: Int = 10000

  /** Default column names: 0.25 → "p25", 0.999 → "p99_9". */
  def defaultNames(probs: Seq[Double]): Seq[String] =
    probs.map { p =>
      val pct = p * 100
      if (pct == math.floor(pct)) s"p${pct.toInt}"
      else s"p${pct}".replace('.', '_')
    }

  private def project(df: DataFrame, groupCols: Seq[String],
      quantileAgg: Column, names: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(quantileAgg.as("__qs"))
      .select(groupCols.map(col) ++ names.zipWithIndex.map {
        case (n, i) => element_at(col("__qs"), i + 1).as(n)
      }: _*)

  /** Exact interpolated quantiles per group, one buffer for all probs.
    * Memory is O(group size) — use [[approxQuantiles]] when groups can
    * exceed executor memory.
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], names: Seq[String] = Nil): DataFrame =
    project(df, groupCols,
      percentile(col(valueCol), array(probs.map(lit): _*)),
      if (names.nonEmpty) names else defaultNames(probs))

  /** Approximate quantiles per group (GK sketch): bounded state, the
    * production path for 100 TB group sizes. Rank error ≤ n/accuracy.
    */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], accuracy: Int = DefaultAccuracy,
      names: Seq[String] = Nil): DataFrame =
    project(df, groupCols,
      percentile_approx(col(valueCol), array(probs.map(lit): _*),
        lit(accuracy)),
      if (names.nonEmpty) names else defaultNames(probs))
}
