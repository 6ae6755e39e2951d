package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * standard lakehouse answer to "range queries on MORE than the leading
  * sort key" (Delta/Iceberg `OPTIMIZE ZORDER BY`, public technique). A
  * table laid out by a single-column sort prunes row groups only on
  * that column; laid out by the bit-interleave of d columns, every
  * file/row-group covers a small HYPERCUBE of the key space, so min/max
  * stats prune on ANY of the d dimensions.
  *
  * Scale shape: computing the Z-value is a pure narrow Column
  * expression (bit shifts and ORs — codegen, no UDF); the layout write
  * is one range repartition on that value (the same single shuffle a
  * plain sorted write pays) followed by a within-partition sort. At
  * 100 TB this is the write-side investment that turns full-corpus
  * scans into `O(files overlapping the query box)` reads — the
  * read-side win is asserted in the locality spec, which checks every
  * written file's per-dimension spread is a small fraction of the
  * domain for BOTH dimensions (a linear sort gets one).
  */
object Layout {

  /** The Z-value: interleave the low `bits` bits of each column,
    * column 0 in the least-significant lane. Inputs must already be
    * bucketed into `[0, 2^bits)` — out-of-range values would silently
    * alias distant keys to nearby Z-values and quietly destroy
    * locality, so they raise instead (same loud-guard convention as
    * [[Packing]]'s budget check).
    */
  def zorder(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits >= 1, s"bits must be >= 1, got $bits")
    val d = cols.size
    require(bits * d <= 63, s"$d cols x $bits bits exceeds a long's 63")
    val lim = 1L << bits
    val guarded = cols.zipWithIndex.map { case (c, j) =>
      val cl = c.cast("long")
      when(cl.isNull.or(cl < 0).or(cl >= lim),
        raise_error(concat(lit(s"zorder: column $j value "),
          coalesce(cl.cast("string"), lit("null")),
          lit(s" outside [0, $lim)"))))
        .otherwise(cl)
    }
    val terms = for {
      (c, j) <- guarded.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)),
      i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear-bin a numeric column into `[0, 2^bits)` so it can feed
    * [[zorder]]: values at `lo` map to bucket 0, values at `hi` to the
    * top bucket, out-of-range values CLAMP to the edge buckets (a
    * boundary cell absorbs outliers — harmless for locality, unlike the
    * silent bit aliasing [[zorder]] guards against). Equal-width bins
    * keep the transform order-preserving, which is what file-level
    * min/max pruning needs; heavily skewed dimensions deserve a
    * quantile bucketing upstream instead.
    */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val n = (1L << bits).toDouble
    val cd = c.cast("double")
    val raw = floor((cd - lit(lo)) / lit(hi - lo) * lit(n))
    // nulls raise, mirroring zorder's guard: greatest/least SKIP nulls
    // (they don't propagate), so without this a null key would be
    // silently laundered into bucket 0 and pollute the corner cell
    when(cd.isNull.or(isnan(cd)),
        raise_error(lit("bucketize: null or NaN input value")))
      .otherwise(least(greatest(raw, lit(0.0)), lit(n - 1)))
      .cast("long")
  }

  /** Write `df` clustered by `zcol` into `numFiles` range partitions,
    * each internally sorted — every output file then covers one compact
    * Z-range, i.e. one small box of the interleaved key space. One
    * shuffle (the range exchange), zero driver-side data.
    */
  def writeZOrdered(df: DataFrame, zcol: Column, numFiles: Int,
      path: String): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zcol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
