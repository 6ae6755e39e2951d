package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the whole suite run (one JVM-wide session —
  * per-suite sessions would pay context startup repeatedly and can collide
  * on the driver port).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val fixtures = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  protected def spark: SparkSession = SparkSpec.spark
  protected def fixtures: String = SparkSpec.fixtures
}
