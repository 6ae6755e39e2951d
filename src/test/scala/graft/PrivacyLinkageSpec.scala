package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Linkage, Privacy}

/** Behavior checks for the privacy-risk audits (k-anonymity / l-diversity)
  * and the deletion-neighborhood fuzzy join beyond their SQL oracles:
  * hand-computed groups, blocking completeness vs brute force, and the
  * no-all-pairs plan shape.
  */
class PrivacyLinkageSpec extends SparkSpec {

  test("Privacy.audit computes group size, diversity and both risk flags") {
    val s = spark
    import s.implicits._
    // (zip, segment) QIs; salary sensitive
    val df = Seq(
      ("94110", "A", 100), ("94110", "A", 100), ("94110", "A", 200),
      ("94110", "B", 300),
      ("10001", "A", 400), ("10001", "A", 500)
    ).toDF("zip", "seg", "salary")
    val out = Privacy.audit(df, Seq("zip", "seg"), "salary", k = 2, l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(out(("94110", "A")) == ((3L, 2L, false, false)))
    // singleton group: k-at-risk AND l-at-risk (1 distinct value)
    assert(out(("94110", "B")) == ((1L, 1L, true, true)))
    // k ok but every member shares... no: 400,500 distinct -> l ok
    assert(out(("10001", "A")) == ((2L, 2L, false, false)))
  }

  test("Privacy.card aggregates achieved k/l and at-risk row counts") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 2),   // group a: gs=3, ds=2
      ("b", 5),                       // group b: gs=1, ds=1
      ("c", 6), ("c", 6), ("c", 6)    // group c: gs=3, ds=1 -> l-at-risk
    ).toDF("qi", "sens")
    val r = Privacy.card(df, Seq("qi"), "sens", k = 2, l = 2).collect()(0)
    assert(r.getAs[Long]("n_rows") == 7L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("k_achieved") == 1L)
    assert(r.getAs[Long]("l_achieved") == 1L)
    assert(r.getAs[Long]("rows_k_at_risk") == 1L)   // group b
    assert(r.getAs[Long]("rows_l_at_risk") == 4L)   // groups b + c
  }

  test("deletionVariants: neighborhood contents and size") {
    assert(Linkage.deletionVariants("abc", 0).toSet == Set("abc"))
    assert(Linkage.deletionVariants("abc", 1).toSet ==
      Set("abc", "bc", "ac", "ab"))
    // depth 2 includes all single chars; "" only at depth 3
    val d2 = Linkage.deletionVariants("abc", 2).toSet
    assert(d2 == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(Linkage.deletionVariants("", 1).toSet == Set(""))
  }

  test("selfPairs matches brute-force Levenshtein pairs (completeness)") {
    val s = spark
    import s.implicits._
    val names = Seq("kitten", "sitten", "sittin", "kittens", "mitten",
      "banana", "banan", "bananas", "xyz")
    val df = names.toDF("name")
    val got = Linkage.selfPairs(df, "name", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    // brute force on the driver
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val want = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= 1
    } yield (a, b, d)).toSet
    assert(got == want, s"got $got want $want")
    assert(want.contains(("banan", "banana", 1)))  // sanity: non-empty
  }

  test("selfPairs at maxDist=2 still complete (depth-2 neighborhoods)") {
    val s = spark
    import s.implicits._
    val names = Seq("abcd", "abce", "abef", "abcdxy", "zzzz")
    val got = Linkage.selfPairs(names.toDF("n"), "n", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // abcd~abce d=1; abcd~abef d=2; abce~abef d=2; abcd~abcdxy d=2
    // (abce~abcdxy is d=3 — blocked as a candidate but cut by verify)
    assert(got == Set(("abcd", "abce"), ("abcd", "abef"),
      ("abce", "abef"), ("abcd", "abcdxy")))
  }

  test("fuzzyJoin links across sources and dedups duplicate rows") {
    val s = spark
    import s.implicits._
    val left = Seq("Alice Smith", "Bob Jones", "Carol King",
      "Alice Smith").toDF("name")         // duplicate row on purpose
    val right = Seq("Alice Smyth", "Bob Jones", "Karol King").toDF("name")
    val got = Linkage.fuzzyJoin(left, "name", right, "name", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got == Set(
      ("Alice Smith", "Alice Smyth", 1),
      ("Bob Jones", "Bob Jones", 0),
      ("Carol King", "Karol King", 1)))
  }

  test("selfPairs plan has no cartesian product and no all-pairs join") {
    val df = spark.read.parquet(s"$fixtures/customer.parquet")
    val plan = Linkage.selfPairs(df, "c_name", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
