package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blueprint.{Blueprint, BlueprintBuilder, MaskCompiler}

/** Table source/sink abstraction. The reference is MySQL-only
  * (reference: composer.json:13, amphp/mysql); this engine reads/writes any
  * Spark source — parquet fixtures for tests, JDBC for MySQL parity.
  */
trait TableIO {
  def read(table: String): DataFrame
  def write(table: String, df: DataFrame): Unit
}

/** Parquet-directory-backed IO: `dir/<table>.parquet`. */
final class ParquetIO(spark: SparkSession, dir: String) extends TableIO {
  def read(table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
  def write(table: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$table.parquet")
}

/** JDBC-backed IO — the direct analog of the reference's MySQL target
  * (reference: src/Anonymizer.php:298–317 scan, 274–288 point-update sink).
  * Spark replaces the per-row async UPDATE stream with a partition-parallel
  * scan (`partitionColumn`/`numPartitions` ≈ the reference's
  * NB_MAX_MYSQL_CLIENT connection pool, src/Anonymizer.php:51) and a bulk
  * rewrite (`batchsize` ≈ NB_MAX_PROMISE_IN_LOOP batching,
  * src/Anonymizer.php:177–186).
  */
final class JdbcIO(spark: SparkSession, url: String,
    options: Map[String, String] = Map.empty) extends TableIO {
  def read(table: String): DataFrame =
    spark.read.format("jdbc").options(options)
      .option("url", url).option("dbtable", table).load()
  def write(table: String, df: DataFrame): Unit =
    df.write.format("jdbc").options(options)
      .option("url", url).option("dbtable", table)
      .option("truncate", "true").mode("overwrite").save()
}

/** The engine's session — analog of the reference's `Anonymizer` class
  * (reference: src/Anonymizer.php:46–61 ctor, 205–210 `table`, 152–195 `run`).
  *
  * Usage mirrors the reference's fluent style (example.php:6–51):
  * {{{
  *   val anon = new Anonymizer(spark, new ParquetIO(spark, dir))
  *   anon.table("customer") { t =>
  *     t.primary("c_custkey")
  *     t.column("c_name").replaceWith("cust_#row#")
  *     t.column("c_mktsegment").where("c_acctbal > 0").replaceWith("MASKED")
  *   }
  *   val masked: Map[String, DataFrame] = anon.plan()   // lazy DataFrames
  *   anon.run()                                         // ... or write via io
  * }}}
  */
final class Anonymizer(val spark: SparkSession, io: TableIO) {

  // insertion-ordered, keyed by table (reference: src/Anonymizer.php:39,209)
  private val blueprints = mutable.LinkedHashMap.empty[String, Blueprint]

  def table(name: String)(f: BlueprintBuilder => Unit): this.type = {
    blueprints += name -> Blueprint(name)(f); this
  }
  def table(bp: Blueprint): this.type = { blueprints += bp.table -> bp; this }

  /** Build the masked DataFrame for every declared table plus every
    * FK-propagation target, without writing. Tables are processed in
    * declaration order (reference: src/Anonymizer.php:158).
    *
    * FK propagation replaces the reference's MySQL `AFTER UPDATE` triggers
    * (src/Anonymizer.php:403–424): for each synchronized column we materialise
    * the old→new value mapping and left-join it into each target, replacing
    * matching values. The reference cascade is **value-matching**
    * (`WHERE t.f = OLD.c`), so colliding old values over-propagate; the join
    * reproduces that, deduplicating the mapping on the old value (min new)
    * so target row counts are preserved.
    */
  def plan(): Map[String, DataFrame] = {
    val out = mutable.LinkedHashMap.empty[String, DataFrame]
    blueprints.foreach { case (name, bp) =>
      val src = io.read(name)
      // pre-mask values of synchronized columns are stashed alongside the
      // masked values, so the old→new pairing is per-row by construction —
      // correct even when the masked column IS the primary key
      val maskedWithOld = MaskCompiler(src, bp, bp.sync.keySet)
      val masked = bp.sync.keySet.foldLeft(maskedWithOld)(
        (acc, c) => acc.drop(MaskCompiler.oldValueCol(c)))
      out += name -> masked
      bp.sync.foreach { case (c, targets) =>
        val mapping = maskedWithOld
          .select(col(MaskCompiler.oldValueCol(c)).as("__graft_oldv"),
            col(c).as("__graft_newv"))
          .groupBy("__graft_oldv").agg(min("__graft_newv").as("__graft_newv"))
        targets.foreach { t =>
          val base = out.getOrElse(t.table, io.read(t.table))
          out += t.table -> applyMapping(base, mapping, t.field)
        }
      }
    }
    out.toMap
  }

  /** Execute and write every planned table (reference run loop,
    * src/Anonymizer.php:152–195).
    */
  def run(): Unit = plan().foreach { case (t, df) => io.write(t, df) }

  private def applyMapping(target: DataFrame, mapping: DataFrame,
      field: String): DataFrame = {
    // mapping is 2 columns × source-table cardinality — broadcast when small;
    // Catalyst auto-broadcasts under the threshold, and AQE converts at
    // runtime otherwise. The left join is the only shuffle masking ever adds.
    target.join(broadcast(mapping),
        target(field) === mapping("__graft_oldv"), "left")
      .withColumn(field, coalesce(col("__graft_newv"), col(field)))
      .drop("__graft_oldv", "__graft_newv")
  }
}
