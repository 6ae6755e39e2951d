package graft

import org.apache.spark.sql.functions._

/** End-to-end JDBC integration on embedded Derby (the only RDBMS in the
  * sandbox — jars ship with Spark): exercises the S5 partition-parallel
  * scan, the staging write, and the TRUNCATE+INSERT commit that preserves
  * target DDL, plus the configurable session-init statement (the F4
  * FK-check-disable hook; Derby has no FOREIGN_KEY_CHECKS, so the test
  * passes a Derby-valid statement through the same code path).
  */
class JdbcIOSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def conn() = java.sql.DriverManager.getConnection(url)

  // Spark's Derby dialect maps StringType to CLOB, which Derby won't
  // implicitly assign back into the VARCHAR target in INSERT..SELECT —
  // pin the staging DDL to the target's types (write-side only option)
  private val opts = Map(
    "createTableColumnTypes" -> "C_NAME VARCHAR(50), C_SEG VARCHAR(20)")

  private def freshTable(): Unit = {
    System.setProperty("derby.system.home", "/tmp")
    val c = conn()
    try {
      val st = c.createStatement()
      Seq("DROP TABLE CUSTOMER__GRAFT_STAGING", "DROP TABLE CUSTOMER")
        .foreach(s => try st.execute(s)
          catch { case _: java.sql.SQLException => () })
      st.execute("CREATE TABLE CUSTOMER (C_ID INT PRIMARY KEY, " +
        "C_NAME VARCHAR(50), C_SEG VARCHAR(20))")
      val ps = c.prepareStatement("INSERT INTO CUSTOMER VALUES (?, ?, ?)")
      (0 until 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"name_$i")
        ps.setString(3, if (i % 2 == 0) "EVEN" else "ODD"); ps.addBatch()
      }
      ps.executeBatch(); ps.close(); st.close()
    } finally c.close()
  }

  test("S5: partition-parallel JDBC scan reads correct data in N partitions") {
    freshTable()
    val io = new JdbcIO(spark, url, opts,
      partition = Some(JdbcPartitioning("C_ID", 0, 100, 4)),
      sessionInit = None)
    val df = io.read("CUSTOMER")
    assert(df.rdd.getNumPartitions == 4, "expected 4 range partitions")
    assert(df.count() == 100)
    assert(df.agg(sum("C_ID")).head.getLong(0) == 99L * 100 / 2)
  }

  test("S3/F4: stage + TRUNCATE/INSERT commit masks data, keeps DDL, runs init") {
    freshTable()
    // a Derby-valid statement through the F4 session-init path (the MySQL
    // default is SET FOREIGN_KEY_CHECKS=0, which Derby doesn't parse)
    val io = new JdbcIO(spark, url, opts,
      partition = Some(JdbcPartitioning("C_ID", 0, 100, 4)),
      sessionInit = Some("SET SCHEMA APP"))
    val anon = new Anonymizer(spark, io)
    anon.table("CUSTOMER") { b =>
      b.primary("C_ID")
      b.column("C_NAME").replaceWith("masked_#row#")
      b.column("C_SEG").where("C_SEG = 'EVEN'").replaceWith("X")
    }
    anon.run()

    val c = conn()
    try {
      val st = c.createStatement()
      val rs = st.executeQuery(
        "SELECT C_ID, C_NAME, C_SEG FROM CUSTOMER ORDER BY C_ID")
      var n = 0
      while (rs.next()) {
        val id = rs.getInt(1)
        assert(rs.getString(2) == s"masked_$id",
          s"row $id: ${rs.getString(2)}")
        assert(rs.getString(3) == (if (id % 2 == 0) "X" else "ODD"))
        n += 1
      }
      assert(n == 100)
      // staging table dropped after commit
      val meta = c.getMetaData.getTables(null, "APP", "CUSTOMER%", null)
      var tables = List.empty[String]
      while (meta.next()) tables ::= meta.getString("TABLE_NAME")
      assert(tables == List("CUSTOMER"), s"leftover tables: $tables")
      // TRUNCATE+INSERT (not a rename swap) keeps the target's DDL: the
      // primary key must still reject duplicates
      intercept[java.sql.SQLException] {
        st.execute("INSERT INTO CUSTOMER VALUES (0, 'dup', 'dup')")
      }
      st.close()
    } finally c.close()
  }

  test("RenameSwap commit publishes staged rows through a DDL-clone swap") {
    freshTable()
    // Derby dialect for the swap hooks: no CREATE TABLE LIKE and no
    // atomic multi-rename — same orchestration, engine-specific SQL
    val swap = JdbcCommitMode.RenameSwap(
      cloneDdl = (clone, target) =>
        s"CREATE TABLE $clone AS SELECT * FROM $target WITH NO DATA",
      renames = (target, clone, retired) => Seq(
        s"RENAME TABLE $target TO $retired",
        s"RENAME TABLE $clone TO $target"))
    val io = new JdbcIO(spark, url, opts,
      partition = Some(JdbcPartitioning("C_ID", 0, 100, 4)),
      sessionInit = Some("SET SCHEMA APP"), commitMode = swap)
    val anon = new Anonymizer(spark, io)
    anon.table("CUSTOMER") { b =>
      b.primary("C_ID")
      b.column("C_NAME").replaceWith("swapped_#row#")
    }
    anon.run()

    val c = conn()
    try {
      val st = c.createStatement()
      val rs = st.executeQuery(
        "SELECT C_ID, C_NAME FROM CUSTOMER ORDER BY C_ID")
      var n = 0
      while (rs.next()) {
        assert(rs.getString(2) == s"swapped_${rs.getInt(1)}")
        n += 1
      }
      assert(n == 100)
      // every working table (staging, clone, retired) cleaned up
      val meta = c.getMetaData.getTables(null, "APP", "CUSTOMER%", null)
      var tables = List.empty[String]
      while (meta.next()) tables ::= meta.getString("TABLE_NAME")
      assert(tables == List("CUSTOMER"), s"leftover tables: $tables")
      st.close()
    } finally c.close()
  }
}
