package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * `df.sample()` draws from a per-partition RNG: the kept set changes with
  * partitioning, task retries, and engine version — unacceptable when a
  * data mix must be reproducible and auditable. Hash-based sampling keys
  * the keep decision on the ROW (a 16-bit bucket of the stable key's md5),
  * so the same row makes the same decision on any engine, any partition
  * layout, any retry — and a row kept at rate r is also kept at every
  * rate ≥ r (nested samples for scaling-law runs come free).
  *
  * Everything is a pure Column filter over the scan: narrow, codegen'd,
  * zero shuffle; the stratified variant adds one broadcast join against a
  * rates table of |strata| rows.
  */
object Sampling {

  /** 16-bit deterministic bucket of a key: the first four hex nibbles of
    * md5 of the key's string form — portable to any engine with md5.
    * Production swap: `pmod(xxhash64(key), 65536)` (cheaper, not
    * oracle-portable).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  private def threshold(rate: Double): Int = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.round(rate * 65536).toInt
  }

  /** Deterministic Bernoulli sample: keep iff bucket(key) < rate·65536. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashBucket(key) < lit(threshold(rate)))

  /** Stratified deterministic sample — the training-mix knob: each
    * stratum (source, language, quality band …) keeps its own rate;
    * strata absent from `rates` fall back to `defaultRate`. The rates
    * ride in as a broadcast |strata|-row table, so the plan stays a
    * narrow filtered scan.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val th = rates.toSeq.map { case (s, r) => (s, threshold(r)) }
      .toDF("__stratum", "__thr")
    df.withColumn("__stratum", stratum)
      .join(broadcast(th), Seq("__stratum"), "left")
      .filter(hashBucket(key) <
        coalesce(col("__thr"), lit(threshold(defaultRate))))
      .drop("__stratum", "__thr")
  }
}
