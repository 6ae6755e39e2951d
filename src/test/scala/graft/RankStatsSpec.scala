package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.RankStats

/** RankStats must be value-identical (bit-identical doubles) to Spark's
  * window ntile/percent_rank/cume_dist — while never building the
  * low-cardinality window partition that motivates it.
  */
class RankStatsSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$fixtures/orders.parquet")

  private def windowRef(df: DataFrame, part: Seq[String], ord: Seq[String],
      k: Int): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*).orderBy(ord.map(col): _*)
    df.withColumn("tile", ntile(k).over(w).cast("bigint"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("total-order mode == window on orders (5-value partition key)") {
    val base = orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = RankStats.withRankStats(base, Seq("o_orderpriority"),
      Seq("o_totalprice", "o_orderkey"), 4, assumeTotalOrder = true)
      .withColumn("tile", col("tile").cast("bigint"))
    val want = windowRef(base, Seq("o_orderpriority"),
      Seq("o_totalprice", "o_orderkey"), 4)
    assertSame(got, want)
  }

  test("tie-aware mode == window when the order key has heavy ties") {
    // order by quantity only (~50 distinct values): huge tie runs inside each group; rank-based
    // percent_rank and tie-inclusive cume_dist must still match the window.
    // (ntile depends on arbitrary intra-tie order, so compare the
    // tie-invariant columns.)
    val li = spark.read.parquet(s"$fixtures/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val got = RankStats.withRankStats(li, Seq("l_returnflag"),
      Seq("l_quantity"), 4)
      .drop("tile")
    val want = windowRef(li, Seq("l_returnflag"), Seq("l_quantity"), 4)
      .drop("tile")
    assertSame(got, want)
  }

  test("null group values are kept and ranked as their own group") {
    import SparkSpec.spark.implicits._
    val df = Seq((Some("a"), 1), (Some("a"), 2), (None, 3), (None, 4),
      (None, 5)).toDF("g", "v")
    val got = RankStats.withRankStats(df, Seq("g"), Seq("v"), 2,
      assumeTotalOrder = true)
    assert(got.count() === 5)
    val nulls = got.filter(col("g").isNull).orderBy("v")
      .select("tile", "pct_rank", "cume_dist").collect()
    assert(nulls.map(_.getLong(0)).toSeq === Seq(1L, 1L, 2L))
    assert(nulls.map(_.getDouble(1)).toSeq === Seq(0.0, 0.5, 1.0))
  }

  test("groups smaller than nTiles: each row its own tile; n==1 rank 0") {
    import SparkSpec.spark.implicits._
    val df = Seq(("a", 10), ("a", 20), ("b", 7)).toDF("g", "v")
    val got = RankStats.withRankStats(df, Seq("g"), Seq("v"), 4,
      assumeTotalOrder = true)
    val want = windowRef(df, Seq("g"), Seq("v"), 4)
    assertSame(got.withColumn("tile", col("tile").cast("bigint")), want)
    val lone = got.filter(col("g") === "b").head()
    assert(lone.getAs[Double]("pct_rank") === 0.0)
    assert(lone.getAs[Double]("cume_dist") === 1.0)
  }

  test("ntile arithmetic matches window ntile across bucket counts") {
    val base = orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .limit(503) // prime-ish row count: uneven bucket padding per group
    for (k <- Seq(1, 2, 3, 7, 32)) {
      val got = RankStats.withRankStats(base, Seq("o_orderpriority"),
        Seq("o_totalprice", "o_orderkey"), k, assumeTotalOrder = true)
        .withColumn("tile", col("tile").cast("bigint"))
      val want = windowRef(base, Seq("o_orderpriority"),
        Seq("o_totalprice", "o_orderkey"), k)
      assertSame(got, want)
    }
  }

  test("driver-stats guard turns high-cardinality misuse into a clear error") {
    val base = orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .limit(100)
    // o_orderkey is unique: every row is its own group, so the stat rows
    // blow past a tiny maxDriverStats — the misuse regime in miniature
    val e = intercept[IllegalArgumentException] {
      RankStats.withRankStats(base, Seq("o_orderkey"), Seq("o_totalprice"),
        4, maxDriverStats = 10)
    }
    assert(e.getMessage.contains("Window.partitionBy"), e.getMessage)
  }

  test("plan has no window sort over the low-cardinality partition key") {
    val base = orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
    val plan = RankStats.withRankStats(base, Seq("o_orderpriority"),
      Seq("o_totalprice", "o_orderkey"), 4, assumeTotalOrder = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window node in:\n$plan")
  }
}
