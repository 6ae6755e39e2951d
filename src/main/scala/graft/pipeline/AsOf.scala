package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with the
  * greatest time ≤ the left time within the same key (the standard
  * event↔dimension-history / trade↔quote alignment operator; Spark has no
  * native ASOF JOIN).
  *
  * Implementation is the union+window composition rather than a range
  * join: tag both sides, sort per key by (time, side, tiebreak) and carry
  * the latest right payload forward with an ignore-nulls `last`. One hash
  * shuffle on the key + a per-key sort — processed volume is |L|+|R|,
  * never the |L|×|R| of an inequality join, so the plan survives a 100×
  * scale-up. Skewed keys can be pre-split with [[Skew]].
  *
  * Tie rules (explicit, so results are deterministic and an external
  * oracle can reproduce them): a right row at exactly the left time DOES
  * match (≤), and among right rows sharing a timestamp the one with the
  * greatest `rightTiebreak` wins. Left rows with no earlier right row get
  * null payload columns (left-join semantics).
  */
object AsOf {

  /** Range-window count without a range join: for every left row, the
    * number of right rows of the same key with time in
    * `(leftTime − lookback, leftTime]`.
    *
    * Each left row contributes two probes (at t and t−lookback) into the
    * same union+window as [[asofJoin]]; a cumulative count of right rows
    * evaluated at both probes subtracts to the interval count. Work is
    * 2·|L|+|R| behind one key shuffle — a 100 TB-safe substitute for the
    * `BETWEEN` theta-join that would explode row pairs. Duplicate left
    * rows are preserved (a per-row tag is the probe-pair identity).
    */
  def rangeCount(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lookback: Long, outCol: String = "n_in_range"): DataFrame = {
    val leftCols = left.columns.toSeq
    checkNames(leftCols, Seq(outCol))
    // a per-row tag keeps duplicate left rows distinct through the final
    // group-by: without it, identical rows would collapse into one output
    // row carrying the summed (wrong) count
    val tagged = left.withColumn("__uid", monotonically_increasing_id())
    def probe(sign: Int, at: Column) = tagged.select(
      Seq(col(leftKey).as("__key"), at.as("__t"), lit(1).as("__side"),
        lit(0L).as("__isr"), lit(sign).as("__sign")) ++
        (leftCols :+ "__uid").map(col): _*)
    // SQL equality semantics: a NULL right key matches nothing — filtered
    // here so null-key left rows (grouped into the null window partition)
    // see no right rows and count zero
    val rightSide = right.filter(col(rightKey).isNotNull).select(
      Seq(col(rightKey).as("__key"), col(rightTime).as("__t"),
        lit(0).as("__side"), lit(1L).as("__isr"), lit(0).as("__sign")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(null).cast("bigint").as("__uid"): _*)
    val w = Window.partitionBy("__key")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe(1, col(leftTime))
      .union(probe(-1, col(leftTime) - lit(lookback)))
      .union(rightSide)
      .withColumn("__cum", sum(col("__isr")).over(w))
      .filter(col("__side") === 1)
      .groupBy((leftCols :+ "__uid").map(col): _*)
      .agg(sum(col("__sign") * col("__cum")).as(outCol))
      .drop("__uid")
  }

  private val internalCols =
    Seq("__key", "__t", "__side", "__tb", "__payload", "__match", "__isr",
      "__sign", "__cum", "__uid")

  private def checkNames(leftCols: Seq[String], payloadCols: Seq[String]): Unit = {
    val clash = leftCols.intersect(internalCols)
    require(clash.isEmpty, s"left columns collide with internal names: " +
      clash.mkString(", "))
    val dup = payloadCols.intersect(leftCols)
    require(dup.isEmpty, "payload columns would shadow left columns " +
      s"in the output: ${dup.mkString(", ")} — alias them on the right first")
  }

  /** `rightTiebreak` should be unique per (key, time) — equal (time,
    * tiebreak) right rows make the matched payload an arbitrary pick among
    * them.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    checkNames(leftCols, payloadCols)
    val tbType = right.schema(rightTiebreak).dataType
    val payload = struct(payloadCols.map(right(_)): _*)
    val payloadType = right.select(payload.as("__p")).schema.head.dataType

    // identical column layout on both sides; right rows carry the payload,
    // left rows carry typed nulls (explicit casts — no union coercion).
    // NULL right keys are filtered: SQL equality semantics — a null-key
    // left row must get a null payload, not match the null partition
    val rightSide = right.filter(col(rightKey).isNotNull).select(
      Seq(col(rightKey).as("__key"), col(rightTime).as("__t"),
        lit(0).as("__side"), col(rightTiebreak).as("__tb"),
        payload.as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      Seq(col(leftKey).as("__key"), col(leftTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(tbType).as("__tb"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy("__key")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftSide.union(rightSide)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(s"__match.$p").as(p)): _*)
  }
}
