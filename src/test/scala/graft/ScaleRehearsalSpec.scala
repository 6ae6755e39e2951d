package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the scale-rehearsal INFLATION's distinctness guarantees — the
  * claims SCALING.md's measured table rests on. The rehearsal run
  * exercises this code end-to-end, but only a spec catches a marking
  * regression before it silently re-measures clone mode under the
  * distinct label.
  */
class ScaleRehearsalSpec extends SparkSpec {

  private def words(s: String): Set[String] =
    s.split("\\s+").filter(_.nonEmpty).toSet

  test("distinct-mode inflation: copies share no letter or numeric " +
      "tokens with the original or each other; clone mode is verbatim") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_rehearse_spec").toString
    val src = s"$dir/src"
    Seq((0L, "the year 2020 saw 31 releases of widget 7"),
        (1L, "plain words only here"))
      .toDF("doc_id", "text").write.parquet(src)

    ScaleRehearsal.inflate(spark, src, s"$dir/distinct", "doc_id",
      factor = 3, cpus = 2, distinctCopies = true)
    val out = spark.read.parquet(s"$dir/distinct")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == 6)
    // copy index recovered from the re-keyed id range
    val byCopy = out.groupBy(_._1 / 2)
      .view.mapValues(_.flatMap(t => words(t._2)).toSet).toMap
    // copy 0 is the original payload
    assert(byCopy(0L).contains("2020") && byCopy(0L).contains("the"))
    // marked copies share NOTHING with the original or each other —
    // letter tokens carry the Cyrillic marker, digit runs are
    // translated to a per-copy block
    for (i <- 1L to 2L) {
      assert(byCopy(i).intersect(byCopy(0L)).isEmpty,
        s"copy $i shares tokens with the original: " +
          byCopy(i).intersect(byCopy(0L)))
      assert(!byCopy(i).exists(_.exists(c => c >= '0' && c <= '9')),
        s"copy $i kept ASCII digits: ${byCopy(i)}")
    }
    assert(byCopy(1L).intersect(byCopy(2L)).isEmpty,
      "marked copies share tokens with each other")
    // every copy still tokenizes to the same SHAPE (same token count
    // per doc) — marking must not merge or split tokens
    val n0 = out.filter(_._1 < 2).map(t => words(t._2).size).sorted
    val n1 = out.filter(t => t._1 >= 2 && t._1 < 4)
      .map(t => words(t._2).size).sorted
    assert(n0.sameElements(n1))

    // clone mode: verbatim copies, only ids re-keyed
    ScaleRehearsal.inflate(spark, src, s"$dir/clone", "doc_id",
      factor = 3, cpus = 2, distinctCopies = false)
    val clone = spark.read.parquet(s"$dir/clone")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(clone.length == 6 &&
      clone.map(_._2).distinct.sorted.sameElements(
        out.filter(_._1 < 2).map(_._2).distinct.sorted))

    // factor 1 is the clean passthrough (the empty-block edge)
    ScaleRehearsal.inflate(spark, src, s"$dir/one", "doc_id",
      factor = 1, cpus = 2, distinctCopies = true)
    assert(spark.read.parquet(s"$dir/one").count() == 2)

    // preconditions fail loudly: Cyrillic text, non-ASCII digits the
    // translation cannot remap (Arabic-Indic here), oversized factor
    def rejects(text: String, needle: String): Unit = {
      val bad = s"$dir/bad_${math.abs(text.hashCode)}"
      Seq((0L, text)).toDF("doc_id", "text").write
        .mode("overwrite").parquet(bad)
      val ex = intercept[IllegalArgumentException] {
        ScaleRehearsal.inflate(spark, bad, s"$bad.out", "doc_id",
          factor = 2, cpus = 2, distinctCopies = true)
      }
      assert(ex.getMessage.contains(needle), ex.getMessage)
    }
    rejects("уже занято", "Cyrillic")
    rejects("year ١٢٣ era", "non-ASCII decimal digits")
    val exFactor = intercept[IllegalArgumentException] {
      ScaleRehearsal.inflate(spark, src, s"$dir/big", "doc_id",
        factor = 99, cpus = 2, distinctCopies = true)
    }
    assert(exFactor.getMessage.contains("digit blocks"))
  }
}
