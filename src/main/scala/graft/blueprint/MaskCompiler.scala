package graft.blueprint

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Gen

/** Compiles a [[Blueprint]] into a DataFrame transformation.
  *
  * Semantics reproduced from the reference's SET-builder
  * (reference: src/Anonymizer.php:345–371):
  *  - columns are processed in declaration order; each rule sees the values
  *    produced by earlier rules (row-map mutation at src/Anonymizer.php:352,356)
  *    → enforced here by a sequential `withColumn` chain;
  *  - the per-column `where` compiles to `CASE WHEN pred THEN new ELSE old END`
  *    (src/Anonymizer.php:359–367) → `when(pred, new).otherwise(old)`;
  *  - the table-level `globalWhere` limits which rows are *masked* — rows
  *    failing it flow through byte-identical, they are NOT dropped
  *    (src/Anonymizer.php:312–314 with the full-rewrite sink of S3)
  *    → folded into the same `when()` guard;
  *  - undeclared columns are never modified (README.md:75–76).
  *
  * The whole compiled plan is narrow (no shuffle; masking is embarrassingly
  * parallel) except when `#row#` numbering in [[RowNumberMode.Ordered]] mode
  * forces a global window — see [[RowNumbers]] for the scale paths.
  */
object MaskCompiler {

  private val RowToken = "#row#"
  val RowNumCol = "__graft_rownum"
  def oldValueCol(c: String): String = s"__graft_old_$c"

  def apply(df: DataFrame, bp: Blueprint): DataFrame =
    apply(df, bp, Set.empty)

  /** Compile; additionally stash the pre-mask value of each column in
    * `stashOld` as `__graft_old_<c>` (used by FK propagation to pair old↔new
    * per row even when the masked column is the primary key itself).
    */
  def apply(df: DataFrame, bp: Blueprint, stashOld: Set[String]): DataFrame = {
    val needsRowNum = bp.columns.exists {
      case ColumnRule(_, _, Rule.Template(v)) => v.contains(RowToken)
      case _ => false
    }
    // The reference pushes globalWhere into the scan (src/Anonymizer.php:312–
    // 314), so its row counter only sees rows matching the predicate. In
    // Ordered mode we reproduce that by partitioning the numbering window on
    // the predicate flag (matching rows number 0..n-1 contiguously).
    val rnPartition = bp.globalWhere.map(g =>
      when(coalesce(expr(g), lit(false)), lit(1)).otherwise(lit(0)))
    val withRn =
      if (needsRowNum)
        RowNumbers.attach(df, bp.primary, bp.rowNumberMode, RowNumCol, rnPartition)
      else df
    val stashed = stashOld.foldLeft(withRn)(
      (acc, c) => acc.withColumn(oldValueCol(c), col(c)))

    val masked = bp.columns.foldLeft(stashed) { (acc, cr) =>
      val colRef: String => Column = acc.col _
      val newValue = compileRule(cr.rule, bp, colRef)
      val guard = (bp.globalWhere.map(expr), cr.where.map(expr)) match {
        case (Some(g), Some(w)) => Some(g && w)
        case (Some(g), None) => Some(g)
        case (None, Some(w)) => Some(w)
        case (None, None) => None
      }
      val v = guard match {
        case Some(cond) => when(cond, newValue).otherwise(col(cr.name))
        case None => newValue
      }
      acc.withColumn(cr.name, v)
    }
    if (needsRowNum) masked.drop(RowNumCol) else masked
  }

  private def compileRule(rule: Rule, bp: Blueprint,
      colRef: String => Column): Column = rule match {
    case Rule.Template(v) if v.contains(RowToken) =>
      // split on the token and interleave the row-number column — a tiny
      // template compiler down to native concat (R2, src/Anonymizer.php:236–243)
      val parts = v.split(java.util.regex.Pattern.quote(RowToken), -1)
      val pieces = parts.zipWithIndex.flatMap { case (p, i) =>
        val l = if (p.isEmpty) Seq.empty else Seq(lit(p))
        if (i < parts.length - 1) l :+ col(RowNumCol).cast("string") else l
      }
      if (pieces.length == 1) pieces.head else concat(pieces.toIndexedSeq: _*)
    case Rule.Template(v) => lit(v)
    case Rule.Expr(build) => build(colRef)
    case Rule.Generator(fmt, unique) =>
      val s = Gen.seed(bp.primary.map(colRef): _*)
      if (unique) {
        val pk = concat_ws("-", bp.primary.map(c => colRef(c).cast("string")): _*)
        Gen.uniqueFormatter(fmt)(s, pk)
      } else Gen.formatter(fmt)(s)
    case Rule.RowClosure(fn, dt) =>
      // R5: whole-row UDF over struct("*") — blocks column pruning exactly
      // like the reference's SELECT * fallback (src/Anonymizer.php:300–305)
      val f = udf((r: Row) => fn(r), dt)
      f(struct(col("*")))
  }
}

/** Deterministic row numbering at three scale points (see [[RowNumberMode]]). */
object RowNumbers {

  def attach(df: DataFrame, orderCols: Seq[String], mode: RowNumberMode,
      outCol: String, partitionFlag: Option[Column] = None): DataFrame =
    mode match {
    case RowNumberMode.Ordered =>
      // exact 0-based counter; global window = single-partition sort — fine
      // for oracle-scale, documented bottleneck at 100 TB
      val base = Window.orderBy(orderCols.map(col): _*)
      val w = partitionFlag.fold(base)(f => Window.partitionBy(f)
        .orderBy(orderCols.map(col): _*))
      df.withColumn(outCol, row_number().over(w) - 1)
    case RowNumberMode.Unique =>
      // the reference's actual guarantee (its scan order is nondeterministic,
      // src/Anonymizer.php:310): unique, non-contiguous, fully parallel
      df.withColumn(outCol, monotonically_increasing_id())
    case RowNumberMode.Scalable =>
      scalable(df, orderCols, outCol)
  }

  /** Deterministic AND distributed 0-based numbering: range-partition by the
    * order key, sort within partitions, then fix up per-partition offsets
    * computed from partition row counts. Two narrow passes; no global
    * single-partition sort — this is the 100 TB path.
    */
  def scalable(df: DataFrame, orderCols: Seq[String], outCol: String): DataFrame = {
    val cols = orderCols.map(col)
    val ranged = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
    val spark = df.sparkSession
    val schema = ranged.schema.add(outCol, LongType, nullable = false)
    val counts = ranged.rdd
      .mapPartitionsWithIndex { case (pid, it) => Iterator((pid, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val rdd = ranged.rdd.mapPartitionsWithIndex { case (pid, it) =>
      val base = bc.value(pid)
      it.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (base + i))
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
