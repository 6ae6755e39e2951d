package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.blueprint.Blueprint

/** Executable-spec port of the reference's only end-to-end example
  * (/root/reference/example.php:9–51): a `users` table exercising every
  * rule kind at once — R1 static, R2 `#row#` template, R3 generator,
  * P2 per-column where + R4 unique generator, R5 position-sensitive
  * whole-row closure, P1 globalWhere, F1/F2 synchronizeColumn into
  * `class.user_id`.
  */
class ExampleSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def usersDf = {
    val schema = "id INT, email1 STRING, email2 STRING, email3 STRING, " +
      "email4 STRING, email5 STRING"
    // id=7: email4 == email5 → excluded by globalWhere (example.php:16)
    // id=10: excluded by globalWhere's id != 10
    // id=1: email4 kept by the per-column where (example.php:33)
    val rows = (1 to 12).map { i =>
      val e4 = s"four_$i@orig.test"
      val e5 = if (i == 7) e4 else s"five_$i@orig.test"
      Row(i, s"one_$i@orig.test", s"two_$i@orig.test", s"three_$i@orig.test",
        e4, e5)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  private def classDf = {
    val schema = "class_id INT, user_id INT"
    val rows = (1 to 24).map(c => Row(c, (c % 12) + 1))
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  private def runScenario(): (Seq[Row], Seq[Row]) = {
    val io = new MapIO(Map("users" -> usersDf, "class" -> classDf))
    val anon = new Anonymizer(spark, io)
    anon.table("users") { t =>
      t.primary("id")
      t.globalWhere("email4 != email5 AND id != 10")
      t.column("email1").replaceWith("john@example.com")
      t.column("email2").replaceWith("email_#row#@example.com")
      t.column("email3").replaceWithGenerator("email")
      t.column("email4").where("id != 1")
        .replaceWithGenerator("email", unique = true)
      t.column("email5").replaceByFields(StringType)(r =>
        r.getAs[String]("email4"))
      t.column("id").replaceWithGenerator("uuid", unique = true)
        .synchronizeColumn("class" -> "user_id")
    }
    val out = anon.plan()
    (out("users").collect().toSeq, out("class").collect().toSeq)
  }

  test("example.php scenario: all rule kinds end-to-end") {
    val (users, classRows) = runScenario()
    val orig = usersDf.collect().sortBy(_.getInt(0))

    // the masked id is a uuid string; recover original identity via email4/5
    // original ordering: rows come back in some order — match on email2/email1
    assert(users.size == 12)

    // excluded rows (id=7 email4==email5; id=10) are byte-identical
    val untouched = users.filter(r =>
      r.getAs[String]("email1") != "john@example.com")
    assert(untouched.size == 2)
    val untouchedOrig = orig.filter(r => r.getInt(0) == 7 || r.getInt(0) == 10)
    assert(untouched.map(_.toSeq.map(_.toString).toList).toSet ==
      untouchedOrig.map(_.toSeq.map(_.toString).toList).toSet)

    // R1: static replacement on all matching rows
    val masked = users.filter(_.getAs[String]("email1") == "john@example.com")
    assert(masked.size == 10)

    // R2: #row# counts matching rows 0..9 contiguously
    val rowNums = masked.map(_.getAs[String]("email2"))
      .map(e => e.stripPrefix("email_").stripSuffix("@example.com").toInt)
      .sorted
    assert(rowNums == (0 to 9).toList)

    // R3: generator email shape
    masked.foreach(r => assert(
      r.getAs[String]("email3").matches("[a-z]+\\.[a-z]+\\d+@[a-z.]+")))

    // P2 + R4: email4 unique-masked except id=1 (per-column where)
    val id1 = masked.find(_.getAs[String]("email5") == "four_1@orig.test")
    assert(id1.isDefined, "id=1: email5 closure must copy the KEPT email4")
    assert(id1.get.getAs[String]("email4") == "four_1@orig.test")
    val uniques = masked.filterNot(_ eq id1.get).map(_.getAs[String]("email4"))
    assert(uniques.distinct.size == uniques.size)
    uniques.foreach(e => assert(e.endsWith("@example.com")))

    // R5 position-sensitivity: email5 equals the CURRENT (masked) email4
    masked.foreach(r =>
      assert(r.getAs[String]("email5") == r.getAs[String]("email4")))

    // F1/F2: class.user_id follows the masked users.id (value-matching)
    val newIds = masked.map(_.getAs[String]("id")).toSet
    newIds.foreach(id => assert(
      id.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}"),
      s"masked id not a v4-shaped uuid: $id"))
    val classIds = classRows.map(_.getAs[String]("user_id")).toSet
    // every class row referencing a masked user now holds the new uuid;
    // rows referencing untouched users (7, 10) keep the original int value
    assert(classIds.intersect(newIds).size == 10)
    assert(classIds.contains("7") && classIds.contains("10"))
  }

  test("composite primary key defaults to Seq(id)") {
    val bp = Blueprint("t") { b => b.column("x").replaceWith("v") }
    assert(bp.primary == Seq("id"))
  }
}

/** In-memory TableIO for tests. */
final class MapIO(tables: Map[String, org.apache.spark.sql.DataFrame])
    extends TableIO {
  val written = scala.collection.mutable.Map.empty[
    String, org.apache.spark.sql.DataFrame]
  def read(table: String): org.apache.spark.sql.DataFrame = tables(table)
  def write(table: String, df: org.apache.spark.sql.DataFrame): Unit =
    written += table -> df
}
