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
  )
}
