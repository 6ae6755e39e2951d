package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for anonymized output (SURVEY §2 north-star:
  * the reference masks rows — `Anonymizer.php` rewrites values — but never
  * measures whether the result is safe to release; these operators close that
  * loop on the published definitions).
  *
  * - k-anonymity (Sweeney 2002): every quasi-identifier (QI) combination must
  *   be shared by at least `k` rows, else those rows are linkable.
  * - l-diversity (Machanavajjhala et al. 2007): each QI group must contain at
  *   least `l` distinct sensitive values, else group membership alone leaks
  *   the sensitive attribute even at high k.
  *
  * Scale shape: both are ONE hash aggregation on the QI columns — map-side
  * partial counts, a single shuffle keyed by the QI tuple, no joins, no
  * windows. At 100 TB the reducer state is bounded by the number of DISTINCT
  * QI combinations (by construction small — that is what "quasi-identifier"
  * means; a high-cardinality QI set is itself the privacy failure the audit
  * reports as group_size 1). `countDistinct` on the sensitive column is
  * Spark's two-phase distinct aggregate (partials per (QI, sensitive), then
  * per-QI merge) — no all-values-to-one-reducer stage.
  */
object Privacy {

  /** Per-QI-group audit: group size, sensitive-value diversity, and the two
    * risk flags. One row per distinct QI combination.
    */
  def audit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1 (got k=$k, l=$l)")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("k_at_risk", col("group_size") < k)
      .withColumn("l_at_risk", col("distinct_sensitive") < l)
  }

  /** One-row release gate: the k actually achieved (min group size), the l
    * actually achieved (min per-group diversity), and how many rows sit in
    * at-risk groups under the requested thresholds. The thresholds-in,
    * achieved-out shape is what a pipeline asserts on before publishing a
    * masked table.
    */
  def card(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame =
    audit(df, qiCols, sensitiveCol, k, l).agg(
      sum(col("group_size")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("group_size")).as("k_achieved"),
      min(col("distinct_sensitive")).as("l_achieved"),
      sum(when(col("k_at_risk"), col("group_size")).otherwise(lit(0L)))
        .as("rows_k_at_risk"),
      sum(when(col("l_at_risk"), col("group_size")).otherwise(lit(0L)))
        .as("rows_l_at_risk"))
}
