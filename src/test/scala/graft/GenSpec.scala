package graft

import org.apache.spark.sql.functions._

import graft.functions.Gen

/** Value-level checks on the deterministic generator library: shape,
  * determinism across independent evaluations, construct-uniqueness —
  * the properties the reference's nondeterministic Faker cannot give and
  * that VERDICT r1 flagged as unverified for the registry path.
  */
class GenSpec extends SparkSpec {

  private def customer = spark.read.parquet(s"$fixtures/customer.parquet")

  private def gen(formatter: String) =
    customer.select(col("c_custkey"),
      Gen.formatter(formatter)(Gen.seed(col("c_custkey"))).as("v"))

  test("formatters are deterministic across independent plans") {
    for (f <- Seq("name", "email", "uuid", "phoneNumber", "address",
        "ipv4", "creditCardNumber")) {
      val a = gen(f).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val b = gen(f).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(a == b, s"formatter $f not deterministic")
    }
  }

  test("value shapes") {
    val shapes = Map(
      "email" -> "[a-z]+\\.[a-z]+\\d+@[a-z.]+",
      "uuid" -> "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}",
      "phoneNumber" -> "\\+1-\\d{3}-\\d{3}-\\d{4}",
      "ipv4" -> "(\\d{1,3}\\.){3}\\d{1,3}",
      "creditCardNumber" -> "4\\d{15}",
      "name" -> "[A-Za-z]+ [A-Za-z]+")
    for ((f, re) <- shapes) {
      gen(f).collect().foreach(r =>
        assert(r.getString(1).matches(re), s"$f: ${r.getString(1)}"))
    }
  }

  test("unique formatters are injective over the primary key") {
    val n = customer.count()
    for (f <- Seq("email", "uuid", "name")) {
      val u = customer.select(
        Gen.uniqueFormatter(f)(Gen.seed(col("c_custkey")),
          col("c_custkey").cast("string")).as("v"))
      assert(u.distinct().count() == n, s"uniqueFormatter($f) collided")
    }
  }

  test("generator values are drawn from the documented pools") {
    val names = gen("firstName").collect().map(_.getString(1)).toSet
    assert(names.subsetOf(Gen.firstNamePool.toSet))
    // portable path too
    val p = customer.select(Gen.portableFirstName(
      Gen.seedPortable(col("c_custkey"))).as("v"))
      .collect().map(_.getString(0)).toSet
    assert(p.subsetOf(Gen.firstNamePool.toSet))
  }

  test("widened vocabulary: shape + determinism per formatter (SURVEY §2.4)") {
    // string-valued formatters with a shape
    val shapes = Map(
      "word" -> "[a-z]+",
      "sentence" -> "([a-z]+ ){5}[a-z]+\\.",
      "text" -> "([a-z]+ )*[a-z]+\\.( ([a-z]+ )*[a-z]+\\.)*",
      "portableName" -> "[A-Za-z]+ [A-Za-z]+",
      "portableEmail" -> "[a-z]+\\.[a-z]+@example\\.com")
    for ((f, re) <- shapes) {
      val vals = gen(f).collect().map(r => r.getLong(0) -> r.getString(1))
      vals.foreach { case (_, v) => assert(v.matches(re), s"$f: '$v'") }
      val again = gen(f).collect().map(r => r.getLong(0) -> r.getString(1))
      assert(vals.toMap == again.toMap, s"$f not deterministic")
    }
    // numeric / temporal formatters: range checks
    val digits = customer.select(Gen.randomDigit(Gen.seed(col("c_custkey"))))
      .collect().map(_.getInt(0))
    assert(digits.forall(d => d >= 0 && d <= 9))
    assert(digits.toSet.size > 3, "randomDigit degenerate")
    val nn = customer.select(Gen.randomDigitNotNull(Gen.seed(col("c_custkey"))))
      .collect().map(_.getInt(0))
    assert(nn.forall(d => d >= 1 && d <= 9))
    val rn = customer.select(Gen.randomNumber(Gen.seed(col("c_custkey")), 5))
      .collect().map(_.getLong(0))
    assert(rn.forall(v => v >= 10000L && v <= 99999L))
    val dates = customer.select(Gen.dateBetween(Gen.seed(col("c_custkey")),
        "2000-01-01", "2000-12-31").cast("string"))
      .collect().map(_.getString(0))
    assert(dates.forall(_.startsWith("2000-")))
    val ts = customer.select(Gen.dateTimeBetween(Gen.seed(col("c_custkey")),
        "2000-01-01 00:00:00", "2001-01-01 00:00:00").cast("string"))
      .collect().map(_.getString(0))
    assert(ts.forall(_.startsWith("2000-")))
    // registry exposes the documented committed list
    for (f <- Seq("word", "text", "date", "dateTimeBetween", "randomDigit",
        "randomDigitNotNull", "randomNumber", "numberBetween", "randomFloat",
        "portableName", "portableEmail", "portableLastName"))
      Gen.formatter(f) // throws if missing
  }

  test("de_DE locale draws from the German pools") {
    Gen.setLocale("de_DE")
    try {
      val de = gen("firstName").collect().map(_.getString(1)).toSet
      assert(de.subsetOf(Gen.firstNamePool.toSet))
      assert(de.intersect(Set("Hans", "Anna", "Klaus", "Ursula")).nonEmpty)
    } finally Gen.setLocale("en_US")
  }

  test("portable unique email embeds the pk (oracle-derivable)") {
    val n = customer.count()
    val u = customer.select(
      Gen.uniqueFormatter("portableEmail")(
        Gen.seedPortable(col("c_custkey")),
        col("c_custkey").cast("string")).as("v"))
    assert(u.distinct().count() == n)
    u.collect().map(_.getString(0)).foreach(v =>
      assert(v.matches("[a-z]+\\.\\d+@example\\.com"), v))
  }

  test("provider registration extends the registry (reference C4)") {
    Gen.register("testUpperCity", s => upper(Gen.city(s)))
    val v = gen("testUpperCity").collect().map(_.getString(1))
    assert(v.forall(c => c == c.toUpperCase))
  }

  test("unknown formatter fails fast with the known list") {
    val e = intercept[IllegalArgumentException](Gen.formatter("nope"))
    assert(e.getMessage.contains("unknown generator formatter"))
  }

  test("locale switches pools, stays deterministic, rejects unknowns (C4)") {
    val en = gen("firstName").collect().map(_.getString(1)).toSet
    Gen.setLocale("fr_FR")
    try {
      val fr = gen("firstName").collect().map(_.getString(1)).toSet
      assert(fr.nonEmpty && fr.intersect(Set("Jean", "Marie", "Pierre",
        "Sophie", "Luc", "Camille")).nonEmpty)
      assert(fr.subsetOf(Gen.firstNamePool.toSet), "values outside fr pool")
      assert(fr != en, "locale switch did not change the draw")
      val fr2 = gen("firstName").collect().map(_.getString(1)).toSet
      assert(fr == fr2)
    } finally Gen.setLocale("en_US")
    intercept[IllegalArgumentException](Gen.setLocale("xx_XX"))
  }

  test("typed config validates like the reference loader (C3)") {
    val ok = GraftConfig(user = "u", database = "d")
    assert(ok.jdbcUrl == "jdbc:mysql://127.0.0.1:3306/d")
    assert(ok.jdbcOptions("numPartitions") == "20")
    intercept[IllegalArgumentException](GraftConfig(user = "", database = "d"))
    intercept[IllegalArgumentException](GraftConfig(user = "u", database = ""))
    intercept[IllegalArgumentException](
      GraftConfig(user = "u", database = "d", numPartitions = 0))
    intercept[IllegalArgumentException](
      GraftConfig(user = "u", database = "d", generatorLocale = "xx"))
  }

  test("portableFormatPreserving: class-preserving, value-keyed, " +
      "deterministic, null-safe, loud on oversize") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "Customer#000000012"),
      (2L, "Customer#000000012"), // equal input on another row
      (3L, "abcXYZ-409 8"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val out = df.select(col("id"), col("v"),
        graft.functions.Gen.portableFormatPreserving(col("v"), "sec")
          .as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    val orig = df.collect().map(r =>
      r.getLong(0) -> Option(r.getString(1))).toMap
    // null in, null out
    assert(out(4L).isEmpty)
    // value-keyed: equal inputs mask equal across rows
    assert(out(1L) == out(2L) && out(1L).nonEmpty)
    // masked != original, same length, every char keeps its class
    for (id <- Seq(1L, 3L)) {
      val v = orig(id).get; val m = out(id).get
      assert(m != v, s"row $id unmasked")
      assert(m.length == v.length)
      v.zip(m).foreach { case (c, d) =>
        if (c.isDigit) assert(d.isDigit, s"$c -> $d")
        else if (c >= 'a' && c <= 'z') assert(d >= 'a' && d <= 'z')
        else if (c >= 'A' && c <= 'Z') assert(d >= 'A' && d <= 'Z')
        else assert(d == c, s"separator $c changed to $d")
      }
    }
    // deterministic across evaluations
    val again = df.select(col("id"),
        graft.functions.Gen.portableFormatPreserving(col("v"), "sec")
          .as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(again == out)
    // a different secret gives a different masking
    val other = df.filter(col("id") === 1)
      .select(graft.functions.Gen.portableFormatPreserving(col("v"),
        "sec2")).head().getString(0)
    assert(Option(other) != out(1L))
    // oversize values fail loudly (keys, not blobs)
    val e = intercept[org.apache.spark.SparkException] {
      Seq("x" * 300).toDF("v")
        .select(graft.functions.Gen.portableFormatPreserving(col("v"),
          "sec")).collect()
    }
    assert(e.getMessage.contains("maxLen"))
  }

  test("portableFormatPreserving: positions are CODEPOINT indices " +
      "(astral passthrough does not desync the shift stream)") {
    val s = spark
    import s.implicits._
    // U+1D11E (musical G clef) is non-BMP: two UTF-16 units, ONE
    // codepoint — under UTF-16 indexing 'b' would hash as position 4
    // and '9' as 5; the SQL oracle's substr counts codepoints (3, 4)
    val v = "a𝄞b9"
    val got = Seq(v).toDF("v")
      .select(graft.functions.Gen.portableFormatPreserving(col("v"),
        "sec").as("m")).head().getString(0)
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seed = md5hex("sec|" + v)
    def shift(pos: Int): Int =
      Integer.parseInt(md5hex(seed + "#" + pos).substring(0, 2), 16)
    val want = new StringBuilder()
      .append(('a' + ('a' - 'a' + shift(1)) % 26).toChar)
      .append("𝄞")
      .append(('a' + ('b' - 'a' + shift(3)) % 26).toChar)
      .append(('0' + ('9' - '0' + shift(4)) % 10).toChar)
      .toString
    assert(got == want,
      s"codepoint-position mirror mismatch: got $got want $want")
    // the astral codepoint itself passes through intact
    assert(got.codePointAt(1) == 0x1D11E)
  }

  test("portableDateShift: per-key constant offset preserves " +
      "intervals, bounded, deterministic, null-safe") {
    val s = spark
    import s.implicits._
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val df = Seq(
      (10L, ts("2020-01-01 00:00:00")),
      (10L, ts("2020-01-31 12:34:56")), // same key, 30.524d later
      (20L, ts("2020-01-01 00:00:00")),
      (30L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("k", "t")
    val out = df.select(col("k"), col("t"),
        graft.functions.Gen.portableDateShift(col("t"), col("k"),
          "sec", maxDays = 30).as("m"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2))))
    // null in, null out
    assert(out.find(_._1 == 30L).get._3.isEmpty)
    // per-key constant offset: the two key-10 rows shift by the SAME
    // whole-day delta, so their interval is preserved exactly
    val k10 = out.filter(_._1 == 10L)
      .map(r => r._3.get.getTime - r._2.get.getTime)
    assert(k10.distinct.length == 1, k10.mkString(","))
    val dayMs = 86400000L
    assert(k10.head % dayMs == 0, "offset must be whole days")
    assert(math.abs(k10.head / dayMs) <= 30, "offset out of bounds")
    // different keys shift independently (these two happen to differ)
    val k20 = out.filter(_._1 == 20L)
      .map(r => r._3.get.getTime - r._2.get.getTime).head
    assert(k20 % dayMs == 0 && math.abs(k20 / dayMs) <= 30)
    // deterministic across evaluations
    val again = df.select(
        graft.functions.Gen.portableDateShift(col("t"), col("k"),
          "sec", maxDays = 30)).collect().map(r =>
      Option(r.getTimestamp(0)))
    assert(again.toSeq == out.toSeq.map(_._3))
    intercept[IllegalArgumentException] {
      graft.functions.Gen.portableDateShift(col("t"), col("k"),
        "sec", maxDays = 0)
    }
  }
}
