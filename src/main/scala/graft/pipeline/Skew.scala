package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins (SURVEY §2.7; the 100 TB plan
  * requirement "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles most cases by splitting oversized partitions at
  * runtime, but it only applies to sort-merge joins and after-the-fact; a
  * salted join pre-spreads a pathological key across `salts` reducers
  * deterministically, which also covers aggregations and stream-static
  * joins where AQE can't re-plan.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join `left ⋈ right` on `leftKey == rightKey` where `left` has
    * skewed key frequencies: every left row gets a salt in `[0, salts)`,
    * the (small-per-key) right side is replicated `salts` times, and the
    * join key becomes (key, salt) — a hot key now lands on `salts`
    * reducers instead of one. Join type must be inner or left_outer (right
    * rows are replicated, so right-preserving joins would duplicate).
    *
    * The salt is assigned round-robin within each partition
    * (`monotonically_increasing_id % salts`): it spreads even byte-identical
    * duplicate rows of a hot key (a whole-row hash would collapse those
    * onto one reducer again). Salt placement never affects the join
    * RESULT — only which reducer a row lands on — so task retries
    * re-assigning salts are harmless.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer" ||
      joinType == "left", s"right-preserving join '$joinType' would " +
      "duplicate replicated right rows")
    val saltedLeft = left.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft(SaltCol) === replicatedRight(SaltCol), joinType)
      .drop(SaltCol)
  }

  /** Two-phase (partial → final) aggregation for skewed group keys: count
    * per (key, salt) first, then merge the partials per key. Spark's
    * hash-aggregate already does map-side partials, so this explicit form
    * matters when the per-key state is large (e.g. `collect_set`s) and a
    * hot key would overflow one reducer.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn(SaltCol,
        pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
      .groupBy(col(key), col(SaltCol))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))
}
