package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale-design check: bucketed tables co-locate their join keys, so the
  * join runs shuffle-free — the pre-partitioning strategy a 100 TB
  * deployment uses for its recurring fact⋈fact joins (SURVEY §2.7 joins;
  * the "bucketing for co-located joins" plan requirement).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables adds no shuffle exchange") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the exchange question is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.read.parquet(s"$fixtures/orders.parquet")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").mode("overwrite")
        .saveAsTable("orders_b")
      spark.read.parquet(s"$fixtures/customer.parquet")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").mode("overwrite")
        .saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        s"orders side shuffled despite bucketing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
        s"customer side shuffled despite bucketing:\n$plan")
      assert(joined.count() > 0)

      // contrast: the same join on unbucketed reads DOES shuffle both sides
      val unbucketed = spark.read.parquet(s"$fixtures/orders.parquet")
        .join(spark.read.parquet(s"$fixtures/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
      val uPlan = unbucketed.queryExecution.executedPlan.toString
      assert(uPlan.contains("Exchange hashpartitioning"),
        s"control join unexpectedly shuffle-free:\n$uPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
