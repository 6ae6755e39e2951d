package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (or a
  * north-star extension) exercised end-to-end through the library; entries in
  * [[oracleSql]] are DuckDB-equivalent ANSI SQL on the same parquet tables.
  * Column names are aliased identically on both sides; both sides ORDER BY a
  * total order so row order matches byte-for-byte.
  *
  * Float discipline for oracle parity: double aggregations are computed over
  * DECIMAL(12,2) casts (exact, order-independent) and cast back to DOUBLE at
  * the end, so Spark's nondeterministic partial-agg order can never flip a
  * bit vs DuckDB.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("mask_blueprint_full")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- masking
  private def anon(spark: SparkSession, dir: String) =
    new Anonymizer(spark, new ParquetIO(spark, dir))

  /** R1 static replacement (SURVEY §2.3 R1). */
  private def maskStatic(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_mktsegment").replaceWith("MASKED")
    }.plan()("customer").orderBy("c_custkey")

  /** R2 `#row#` template (SURVEY §2.3 R2). */
  private def maskRownum(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_name").replaceWith("cust_#row#")
    }.plan()("customer").orderBy("c_custkey")

  /** R3-style deterministic scalar expression (hash-derived email). */
  private def maskHash(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_name").replaceWithExpr(r =>
        concat(substring(md5(r("c_custkey").cast("string")), 1, 12),
          lit("@example.com")))
    }.plan()("customer").orderBy("c_custkey")

  /** P2 per-column where → CASE WHEN (SURVEY §2.2 P2). */
  private def maskWhere(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_mktsegment").where("c_acctbal > 0").replaceWith("MASKED")
    }.plan()("customer").orderBy("c_custkey")

  /** P1 globalWhere: non-matching rows byte-identical (SURVEY §2.2 P1). */
  private def maskGlobalWhere(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.globalWhere("c_acctbal > 0 AND c_nationkey <> 10")
      b.column("c_name").replaceWith("X-#row#")
    }.plan()("customer").orderBy("c_custkey")

  /** R4 construct-uniqueness (SURVEY §2.3 R4, §7.4.2). */
  private def maskUnique(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_name").replaceWithExpr(r =>
        concat(lit("user"), r("c_custkey").cast("string"),
          lit("@example.com")))
    }.plan()("customer").orderBy("c_custkey")

  /** R5 position-sensitivity: the second rule sees the first rule's output
    * (SURVEY §2.3 R5; reference src/Anonymizer.php:350–357).
    */
  private def maskFields(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_name").replaceWithExpr(r =>
        concat(lit("N"), r("c_custkey").cast("string")))
      b.column("c_mktsegment").replaceWithExpr(r =>
        concat(r("c_name"), lit("-SEG")))   // new value of c_name
    }.plan()("customer").orderBy("c_custkey")

  /** F1/F2 referential-integrity propagation: masked customer pk cascades
    * into orders.o_custkey by value-matching join (SURVEY §2.5).
    */
  private def fkSync(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_custkey")
        .replaceWithExpr(r => r("c_custkey") + lit(1000000L))
        .synchronizeColumn("orders" -> "o_custkey")
    }.plan()("orders").orderBy("o_orderkey")

  /** The reference's example.php scenario shape, all rule kinds at once:
    * used as the flagship `entry`.
    */
  private def maskBlueprintFull(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.globalWhere("c_acctbal > -9999999")
      b.column("c_name").replaceWith("cust_#row#")
      b.column("c_mktsegment").where("c_acctbal > 0").replaceWith("MASKED")
    }.plan()("customer").orderBy("c_custkey")

  /** R3/R4 true generator registry (xxhash64-seeded — not SQL-expressible,
    * rows-only check): name/email/uuid/phone/city formatters.
    */
  private def maskGenerators(s: SparkSession, dir: String): DataFrame =
    anon(s, dir).table("customer") { b =>
      b.primary("c_custkey")
      b.column("c_name").replaceWithGenerator("name")
      b.column("c_mktsegment").replaceWithGenerator("email", unique = true)
    }.plan()("customer").orderBy("c_custkey")

  // ------------------------------------------------------------- relational
  /** TPC-H Q1-shaped aggregation (SURVEY §2.7 aggregations). */
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Broadcast-hash join: per-nation revenue. The dimension side (customer ⋈
    * nation, small) is explicitly broadcast so the 100 TB fact scan never
    * shuffles (SURVEY §2.7 joins).
    */
  private def qJoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    o.join(broadcast(c.join(broadcast(n),
        c("c_nationkey") === n("n_nationkey"))),
        o("o_custkey") === c("c_custkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  /** TPC-H Q5-shaped 6-way join (region→nation→customer→orders→lineitem→
    * supplier with the local-supplier condition), dims broadcast.
    */
  private def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey") &&
        c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** Window top-k per group: 3 highest-value orders per customer. */
  private def qWindowTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }

  /** Window running/offset functions: running revenue, lag, rank per
    * customer over a total order (exact decimal running sum).
    */
  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("running_spend",
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_order", lag(col("o_orderkey"), 1).over(w))
      .withColumn("rk", rank().over(w).cast("bigint"))
      .select("o_custkey", "o_orderkey", "running_spend", "prev_order", "rk")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global sort + limit (top-k). */
  private def qSortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

  /** Set operations: UNION DISTINCT ∪, then EXCEPT. */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val nation0 = c.filter(col("c_nationkey") === 0).select("c_custkey")
    building.union(rich).distinct().except(nation0).orderBy("c_custkey")
  }

  /** ROLLUP hierarchy aggregate over region→nation. Declared through
    * `spark.sql` over temp views: a projection rename does not break the
    * join lineage for Spark's ambiguity check, a view boundary does.
    */
  private def qRollup(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("g_nation")
    t(s, dir, "region").createOrReplaceTempView("g_region")
    t(s, dir, "customer").createOrReplaceTempView("g_customer")
    s.sql(
      """SELECT COALESCE(r_name, 'ALL') AS r_name,
        |       COALESCE(n_name, 'ALL') AS n_name,
        |       COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM g_customer
        |JOIN g_nation ON c_nationkey = n_nationkey
        |JOIN g_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name, n_name""".stripMargin)
  }

  /** CUBE aggregate (all grouping sets) over returnflag × linestatus. */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  /** INTERSECT set op: customers that are both BUILDING-segment and
    * positive-balance.
    */
  private def qIntersect(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .intersect(c.filter(col("c_acctbal") > 0).select("c_custkey"))
      .orderBy("c_custkey")
  }

  /** Exact + grouped distinct aggregation. */
  private def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Left-semi join (EXISTS): customers having at least one high-value order. */
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no order above 150k. */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** GROUP BY + HAVING. */
  private def qHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("spend"))
      .filter(col("n_orders") >= 15)
      .orderBy("o_custkey")

  /** Scalar subquery: customers above the global mean balance (exact
    * decimal mean → deterministic threshold).
    */
  private def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val thr = c.agg((sum(dec(col("c_acctbal"))).cast("double") /
      count(lit(1))).as("thr"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Semi-structured JSON: extract props.k from events, aggregate. */
  private def qJson(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy("k_mod")

  /** Batch analog of the streaming tumbling window: hourly event counts
    * (the streaming variant lives in graft.streaming.StreamMask, checked for
    * batch-equivalence by StreamingMaskSpec; SURVEY §2.10).
    */
  private def qTimeBucket(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; the session reads it as raw nanos (legacy flag set in
    * Verify/Bench) and we truncate to micros — exactly DuckDB's own
    * nanos→micros truncation. The result is kept timezone-naive
    * (TIMESTAMP_NTZ) to match DuckDB's naive TIMESTAMP: a zoned Spark
    * timestamp would write isAdjustedToUTC=true parquet and fail the strict
    * schema compare.
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").withColumn("ts",
      timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))

  // ---------------------------------------------------------------- registry
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mask_static" -> (maskStatic _),
    "mask_rownum" -> (maskRownum _),
    "mask_hash" -> (maskHash _),
    "mask_where" -> (maskWhere _),
    "mask_global_where" -> (maskGlobalWhere _),
    "mask_unique" -> (maskUnique _),
    "mask_fields" -> (maskFields _),
    "mask_blueprint_full" -> (maskBlueprintFull _),
    "mask_generators" -> (maskGenerators _),
    "fk_sync" -> (fkSync _),
    "q1_agg" -> (q1Agg _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q5_multijoin" -> (q5MultiJoin _),
    "q_window_topk" -> (qWindowTopk _),
    "q_window_running" -> (qWindowRunning _),
    "q_sort_limit" -> (qSortLimit _),
    "q_setops" -> (qSetOps _),
    "q_intersect" -> (qIntersect _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_having" -> (qHaving _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_json" -> (qJson _),
    "q_time_bucket" -> (qTimeBucket _),
  )

  def oracleSql: Map[String, String] = Map(
    "mask_static" ->
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         |'MASKED' AS c_mktsegment FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_rownum" ->
      s"""SELECT c_custkey,
         |concat('cust_', CAST(row_number() OVER (ORDER BY c_custkey) - 1 AS VARCHAR)) AS c_name,
         |c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_hash" ->
      s"""SELECT c_custkey,
         |concat(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12), '@example.com') AS c_name,
         |c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_where" ->
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         |CASE WHEN c_acctbal > 0 THEN 'MASKED' ELSE c_mktsegment END AS c_mktsegment
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_global_where" ->
      s"""SELECT c_custkey,
         |CASE WHEN c_acctbal > 0 AND c_nationkey <> 10
         |  THEN concat('X-', CAST(rn AS VARCHAR)) ELSE c_name END AS c_name,
         |c_nationkey, c_acctbal, c_mktsegment
         |FROM (SELECT *, row_number() OVER (
         |  PARTITION BY CASE WHEN c_acctbal > 0 AND c_nationkey <> 10 THEN 1 ELSE 0 END
         |  ORDER BY c_custkey) - 1 AS rn FROM customer)
         |ORDER BY c_custkey""".stripMargin,
    "mask_unique" ->
      s"""SELECT c_custkey,
         |concat('user', CAST(c_custkey AS VARCHAR), '@example.com') AS c_name,
         |c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_fields" ->
      s"""SELECT c_custkey,
         |concat('N', CAST(c_custkey AS VARCHAR)) AS c_name, c_nationkey, c_acctbal,
         |concat(concat('N', CAST(c_custkey AS VARCHAR)), '-SEG') AS c_mktsegment
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_blueprint_full" ->
      s"""SELECT c_custkey,
         |concat('cust_', CAST(row_number() OVER (ORDER BY c_custkey) - 1 AS VARCHAR)) AS c_name,
         |c_nationkey, c_acctbal,
         |CASE WHEN c_acctbal > 0 THEN 'MASKED' ELSE c_mktsegment END AS c_mktsegment
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "fk_sync" ->
      s"""SELECT o.o_orderkey,
         |COALESCE(m.newv, o.o_custkey) AS o_custkey,
         |o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
         |FROM orders o LEFT JOIN
         |(SELECT c_custkey AS oldv, c_custkey + 1000000 AS newv FROM customer) m
         |ON o.o_custkey = m.oldv ORDER BY o_orderkey""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
         |  (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
         |COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      s"""SELECT n_name,
         |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q5_multijoin" ->
      s"""SELECT n_name,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
         |  (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window_topk" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
         |SELECT o_custkey, o_orderkey, o_totalprice,
         |row_number() OVER (PARTITION BY o_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey) AS rk
         |FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_window_running" ->
      s"""SELECT o_custkey, o_orderkey,
         |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
         |lag(o_orderkey, 1) OVER (
         |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
         |rank() OVER (
         |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rk
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_limit" ->
      s"""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         |LIMIT 100""".stripMargin,
    "q_setops" ->
      s"""SELECT * FROM (
         |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         |UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         |EXCEPT SELECT c_custkey FROM customer WHERE c_nationkey = 0
         |) ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      s"""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         |INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 0
         |ORDER BY c_custkey""".stripMargin,
    "q_cube" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
         |COALESCE(l_linestatus, 'ALL') AS l_linestatus,
         |COUNT(*) AS n_rows,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rollup" ->
      s"""SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
         |COUNT(*) AS n_cust,
         |CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name, n_name""".stripMargin,
    "q_distinct_agg" ->
      s"""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
         |COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_semi_join" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE EXISTS (SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
         |ORDER BY c_custkey""".stripMargin,
    "q_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
         |ORDER BY o_custkey""".stripMargin,
    "q_scalar_subquery" ->
      s"""SELECT c_custkey, c_name, c_acctbal FROM customer
         |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         |  FROM customer)
         |ORDER BY c_custkey""".stripMargin,
    "q_json" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INTEGER) % 10 AS k_mod,
         |COUNT(*) AS n,
         |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_time_bucket" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
         |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
