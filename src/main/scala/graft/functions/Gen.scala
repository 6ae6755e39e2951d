package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, codegen-native generator ("faker") library.
  *
  * The reference delegates value synthesis to fzaninotto/faker
  * (reference: composer.json:14, src/Anonymizer.php:53–55) whose formatters
  * are nondeterministic per call. Spark re-executes tasks on retry/speculation,
  * so nondeterministic generation would yield inconsistent rows across a
  * 1000-executor run. Every formatter here is instead a **pure Catalyst
  * Column expression** seeded from a hash of the primary key:
  *
  *  - reproducible (same input row → same masked value, across retries/runs)
  *  - whole-stage-codegen friendly (no UDF boxing at 100 TB)
  *  - embarrassingly parallel (no state, no shuffle)
  *
  * Formatter vocabulary covers the reference's documented usage (`email`,
  * `unique()->email`, `unique()->uuid` — reference example.php:28,34,47) plus
  * the standard masking set (SURVEY.md §2.4).
  */
object Gen {

  /** Derive a non-negative 64-bit seed column from key columns. */
  def seed(cols: Column*): Column = abs(xxhash64(cols: _*))

  /** Portable seed: md5 hex of the pipe-joined key columns. Slower than
    * [[seed]] but re-derivable by any engine with an md5 function — use
    * with the `portable*` formatters when masked values must be verifiable
    * by an external SQL oracle.
    */
  def seedPortable(cols: Column*): Column =
    md5(concat_ws("|", cols.map(_.cast("string")): _*))

  /** Decorrelate a seed per formatter so e.g. firstName/lastName of the same
    * row don't co-vary.
    */
  private def salt(s: Column, tag: String): Column = abs(xxhash64(s, lit(tag)))

  /** Pick a pool element by seed (1-based element_at). */
  private def pick(pool: Seq[String], s: Column): Column =
    element_at(lit(pool.toArray), (pmod(s, lit(pool.size)) + 1).cast("int"))

  // ---- pools (public-domain sample data, small on purpose: they are lit()
  // arrays inlined into the generated code). Locale-keyed, mirroring the
  // reference's DEFAULT_GENERATOR_LOCALE Faker construction
  // (src/Anonymizer.php:53–55, config-sample.php:8).
  private case class Pools(
      firstNames: Seq[String], lastNames: Seq[String], cities: Seq[String],
      countries: Seq[String], streets: Seq[String],
      companySuffix: Seq[String])

  private val poolsByLocale: Map[String, Pools] = Map(
    "en_US" -> Pools(
      firstNames = Seq(
        "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
        "Linda", "David", "Elizabeth", "William", "Barbara", "Richard",
        "Susan", "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen",
        "Wei", "Ana", "Yuki", "Omar", "Ivan", "Lucia", "Noah", "Emma",
        "Liam", "Olivia"),
      lastNames = Seq(
        "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
        "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
        "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson",
        "Martin", "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez",
        "Clark", "Ramirez", "Lewis", "Robinson"),
      cities = Seq(
        "Springfield", "Riverton", "Fairview", "Kingsport", "Maplewood",
        "Cedarville", "Lakeside", "Brookfield", "Ashford", "Milltown"),
      countries = Seq(
        "USA", "Canada", "Brazil", "Germany", "France", "Japan", "India",
        "Australia", "Kenya", "Mexico"),
      streets = Seq(
        "Main St", "Oak Ave", "Maple Dr", "Cedar Ln", "Park Rd", "Lake View",
        "Hill St", "River Rd", "Elm St", "Sunset Blvd"),
      companySuffix = Seq("Inc", "LLC", "Group", "Labs", "Corp")),
    "fr_FR" -> Pools(
      firstNames = Seq(
        "Jean", "Marie", "Pierre", "Sophie", "Luc", "Camille", "Louis",
        "Claire", "Paul", "Julie", "Hugo", "Emma", "Theo", "Lea", "Nicolas",
        "Manon", "Antoine", "Chloe", "Julien", "Alice"),
      lastNames = Seq(
        "Martin", "Bernard", "Dubois", "Thomas", "Robert", "Richard",
        "Petit", "Durand", "Leroy", "Moreau", "Simon", "Laurent", "Lefevre",
        "Michel", "Garcia", "David", "Bertrand", "Roux", "Vincent", "Fournier"),
      cities = Seq(
        "Villeneuve", "Beaumont", "Montclair", "Rivesaltes", "Clairvaux",
        "Fontenay", "Valmont", "Belleville", "Rochefort", "Saint-Loup"),
      countries = Seq(
        "France", "Belgique", "Suisse", "Canada", "Maroc", "Senegal",
        "Espagne", "Italie", "Allemagne", "Portugal"),
      streets = Seq(
        "Rue de la Paix", "Avenue Victor Hugo", "Boulevard Voltaire",
        "Rue des Lilas", "Place du Marche", "Chemin Vert", "Rue Pasteur",
        "Allee des Tilleuls", "Quai des Brumes", "Impasse du Moulin"),
      companySuffix = Seq("SARL", "SA", "SAS", "Groupe", "et Fils")),
    "de_DE" -> Pools(
      firstNames = Seq(
        "Hans", "Anna", "Peter", "Maria", "Klaus", "Ursula", "Wolfgang",
        "Monika", "Jurgen", "Petra", "Stefan", "Sabine", "Thomas", "Karin",
        "Michael", "Brigitte", "Andreas", "Heike", "Markus", "Claudia"),
      lastNames = Seq(
        "Muller", "Schmidt", "Schneider", "Fischer", "Weber", "Meyer",
        "Wagner", "Becker", "Schulz", "Hoffmann", "Koch", "Bauer",
        "Richter", "Klein", "Wolf", "Schroder", "Neumann", "Schwarz",
        "Zimmermann", "Braun"),
      cities = Seq(
        "Neustadt", "Altdorf", "Grunberg", "Lindenfeld", "Steinbach",
        "Rosenheim", "Waldburg", "Birkenau", "Falkensee", "Eichwalde"),
      countries = Seq(
        "Deutschland", "Osterreich", "Schweiz", "Frankreich", "Polen",
        "Niederlande", "Belgien", "Danemark", "Tschechien", "Italien"),
      streets = Seq(
        "Hauptstrasse", "Bahnhofstrasse", "Gartenweg", "Lindenallee",
        "Schulstrasse", "Bergweg", "Am Markt", "Kirchplatz", "Waldweg",
        "Muhlenweg"),
      companySuffix = Seq("GmbH", "AG", "KG", "OHG", "und Sohne")))

  /** Known generator locales (reference DEFAULT_GENERATOR_LOCALE). */
  def locales: Seq[String] = poolsByLocale.keys.toSeq.sorted

  @volatile private var currentLocale: String = "en_US"

  /** Set the session-wide generator locale (default en_US). Affects which
    * name/address pools the formatters draw from; seeding and therefore
    * determinism are locale-independent.
    */
  def setLocale(locale: String): Unit = {
    require(poolsByLocale.contains(locale),
      s"unknown locale '$locale'; known: ${locales.mkString(", ")}")
    currentLocale = locale
  }
  def locale: String = currentLocale

  private def pools: Pools = poolsByLocale(currentLocale)
  private def firstNames = pools.firstNames
  private def lastNames = pools.lastNames
  private def cities = pools.cities
  private def countries = pools.countries
  private def streets = pools.streets
  private def companySuffix = pools.companySuffix
  private val domains = Seq(
    "example.com", "example.org", "example.net", "mail.test", "post.test")
  private val words = Seq(
    "lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing", "elit",
    "tempor", "incididunt", "labore", "magna", "aliqua", "veniam", "nostrud",
    "ullamco", "laboris")

  // ---- formatters (all: Column seed → Column value) ----
  def firstName(s: Column): Column = pick(firstNames, salt(s, "fn"))
  def lastName(s: Column): Column = pick(lastNames, salt(s, "ln"))
  def name(s: Column): Column =
    concat_ws(" ", firstName(s), lastName(s))
  def userName(s: Column): Column = concat(
    lower(firstName(s)), lit("."), lower(lastName(s)),
    pmod(salt(s, "un"), lit(100)).cast("string"))
  def email(s: Column): Column =
    concat(userName(s), lit("@"), pick(domains, salt(s, "dom")))
  def safeEmail(s: Column): Column =
    concat(userName(s), lit("@example.com"))
  def company(s: Column): Column = concat_ws(" ",
    lastName(salt(s, "co")), pick(companySuffix, salt(s, "cos")))
  def city(s: Column): Column = pick(cities, salt(s, "city"))
  def country(s: Column): Column = pick(countries, salt(s, "ctr"))
  def streetAddress(s: Column): Column = concat_ws(" ",
    (pmod(salt(s, "num"), lit(9899)) + 100).cast("string"),
    pick(streets, salt(s, "st")))
  def address(s: Column): Column =
    concat_ws(", ", streetAddress(s), city(s), country(s))
  def phoneNumber(s: Column): Column = concat(
    lit("+1-"), lpad(pmod(salt(s, "p1"), lit(800)).plus(200).cast("string"), 3, "0"),
    lit("-"), lpad(pmod(salt(s, "p2"), lit(1000)).cast("string"), 3, "0"),
    lit("-"), lpad(pmod(salt(s, "p3"), lit(10000)).cast("string"), 4, "0"))
  def ipv4(s: Column): Column = concat_ws(".",
    (pmod(salt(s, "i1"), lit(254)) + 1).cast("string"),
    pmod(salt(s, "i2"), lit(256)).cast("string"),
    pmod(salt(s, "i3"), lit(256)).cast("string"),
    (pmod(salt(s, "i4"), lit(254)) + 1).cast("string"))

  /** RFC-4122-shaped deterministic UUID (version nibble forced to 4) derived
    * from the md5 of the seed — the deterministic analog of the reference's
    * `unique()->uuid` (example.php:47).
    */
  def uuid(s: Column): Column = {
    val h = md5(s.cast("string"))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4),
      concat(lit("4"), substring(h, 14, 3)),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  def numberBetween(s: Column, lo: Long, hi: Long): Column =
    (pmod(salt(s, "nb"), lit(hi - lo + 1)) + lo).cast("long")
  def randomFloat(s: Column, lo: Double, hi: Double, decimals: Int = 2): Column =
    round(pmod(salt(s, "rf"), lit(1000000L)).cast("double")
      .divide(lit(1000000.0)).multiply(lit(hi - lo)).plus(lit(lo)), decimals)
  def randomElement(pool: Seq[String], s: Column): Column =
    pick(pool, salt(s, "re"))
  def dateBetween(s: Column, startIso: String, endIso: String): Column = {
    val span = datediff(lit(endIso).cast("date"), lit(startIso).cast("date"))
    date_add(lit(startIso).cast("date"),
      pmod(salt(s, "dt"), span + 1).cast("int"))
  }

  /** Faker `dateTimeBetween` analog: a timestamp uniform (by seed) in
    * [startIso, endIso) at second granularity.
    */
  def dateTimeBetween(s: Column, startIso: String, endIso: String): Column = {
    val lo = unix_timestamp(lit(startIso).cast("timestamp"))
    val hi = unix_timestamp(lit(endIso).cast("timestamp"))
    timestamp_seconds(lo + pmod(salt(s, "dts"), hi - lo))
  }

  def word(s: Column): Column = pick(words, salt(s, "wd"))
  def sentence(s: Column, nWords: Int = 6): Column = {
    val parts = (0 until nWords).map(i => pick(words, salt(s, s"w$i")))
    concat(concat_ws(" ", parts: _*), lit("."))
  }
  /** Faker `text` analog: `nSentences` seeded sentences. */
  def text(s: Column, nSentences: Int = 3): Column =
    concat_ws(" ", (0 until nSentences)
      .map(i => sentence(salt(s, s"sent$i"))): _*)

  /** Faker numeric family: `randomDigit` 0–9, `randomDigitNotNull` 1–9,
    * `randomNumber(d)` a d-digit number.
    */
  def randomDigit(s: Column): Column =
    pmod(salt(s, "rd"), lit(10)).cast("int")
  def randomDigitNotNull(s: Column): Column =
    (pmod(salt(s, "rdn"), lit(9)) + 1).cast("int")
  def randomNumber(s: Column, digits: Int = 5): Column = {
    require(digits >= 1 && digits <= 18, s"digits out of range: $digits")
    val lo = math.pow(10, digits - 1).toLong
    val hi = math.pow(10, digits).toLong - 1
    numberBetween(s, lo, hi)
  }
  def creditCardNumber(s: Column): Column = concat(
    lit("4"), lpad(pmod(salt(s, "cc1"), lit(1000000000L)).cast("string"), 9, "0"),
    lpad(pmod(salt(s, "cc2"), lit(1000000L)).cast("string"), 6, "0"))
  def md5Hex(c: Column): Column = md5(c.cast("string"))
  def sha256Hex(c: Column): Column = sha2(c.cast("string"), 256)

  /** Portable pool pick: index from two hex nibbles (1-based position
    * `at`) of an md5-string seed ([[seedPortable]]) — `conv` here,
    * `(strpos(hex,c)-1)` arithmetic in an external oracle, same value.
    * Distinct nibble positions decorrelate formatters the way [[salt]]
    * does for the xxhash64 family.
    */
  private def pickPortable(pool: Seq[String], s: Column, at: Int = 1): Column =
    element_at(lit(pool.toArray),
      pmod(conv(substring(s, at, 2), 16, 10).cast("int"), lit(pool.size)) + 1)

  def portableFirstName(s: Column): Column = pickPortable(firstNames, s)
  def portableLastName(s: Column): Column = pickPortable(lastNames, s, 3)
  def portableName(s: Column): Column =
    concat_ws(" ", portableFirstName(s), portableLastName(s))
  def portableEmail(s: Column): Column =
    concat(lower(portableFirstName(s)), lit("."),
      lower(portableLastName(s)), lit("@example.com"))

  /** Public pool views (for external oracles / tests). */
  def firstNamePool: Seq[String] = firstNames
  def lastNamePool: Seq[String] = lastNames

  /** Construct-unique email: the primary-key rendering is embedded in the
    * local part, so uniqueness holds by construction across any cluster size
    * (replaces Faker's retry-until-unseen `unique()` — see
    * [[graft.blueprint.Rule.Generator]]).
    */
  def uniqueEmail(s: Column, pk: Column): Column =
    concat(lower(firstName(s)), lit("."), pk.cast("string"),
      lit("@example.com"))

  /** Named-formatter registry for `replaceWithGenerator(name)`
    * (reference: src/Blueprint.php:163–176 `$generator->{$type}`). Providers
    * register extra formatters via [[register]] — the analog of Faker
    * provider drop-ins (reference: src/Anonymizer.php:111–121).
    */
  @volatile private var registry: Map[String, Column => Column] = Map(
    "firstName" -> firstName _, "lastName" -> lastName _, "name" -> name _,
    "userName" -> userName _, "email" -> email _, "safeEmail" -> safeEmail _,
    "company" -> company _, "city" -> city _, "country" -> country _,
    "address" -> address _, "streetAddress" -> streetAddress _,
    "phoneNumber" -> phoneNumber _, "ipv4" -> ipv4 _, "uuid" -> uuid _,
    "word" -> word _,
    "sentence" -> ((s: Column) => sentence(s)),
    "text" -> ((s: Column) => text(s)),
    // no-argument registry forms of the parameterized formatters; the
    // parameterized Scala functions remain the precise API
    "date" -> ((s: Column) => dateBetween(s, "1970-01-01", "2038-01-19")),
    "dateTime" -> ((s: Column) =>
      dateTimeBetween(s, "1970-01-01 00:00:00", "2038-01-19 00:00:00")),
    "dateTimeBetween" -> ((s: Column) =>
      dateTimeBetween(s, "1970-01-01 00:00:00", "2038-01-19 00:00:00")),
    "randomDigit" -> randomDigit _,
    "randomDigitNotNull" -> randomDigitNotNull _,
    "randomNumber" -> ((s: Column) => randomNumber(s)),
    "numberBetween" -> ((s: Column) => numberBetween(s, 0L, 2147483647L)),
    "randomFloat" -> ((s: Column) => randomFloat(s, 0.0, 1.0, 6)),
    "creditCardNumber" -> creditCardNumber _,
    "md5" -> md5Hex _, "sha256" -> sha256Hex _,
    "portableFirstName" -> portableFirstName _,
    "portableLastName" -> portableLastName _,
    "portableName" -> portableName _,
    "portableEmail" -> portableEmail _)

  /** Format-preserving pseudonymization (portable): every digit maps
    * to a digit, every ASCII letter to a letter of the same case, and
    * every other character passes through — the masked value keeps the
    * original's length, separators and character classes (a phone
    * still parses as a phone, a plate as a plate), the classic
    * anonymizer ask the plain pool formatters cannot serve.
    *
    * Deterministic and VALUE-KEYED: the row seed is
    * `md5(secret || '|' || value)`, so equal source values mask to
    * equal outputs across rows and tables (join keys keep joining —
    * the `synchronizeColumn` property, for free); the per-position
    * shift is the first hex-nibble PAIR of `md5(seed || '#' || i)`
    * (1-based i), so an external SQL oracle re-derives every character
    * (the [[pickPortable]] discipline, per position). Positions are
    * CODEPOINT indices (the SQL oracle's `substr`/`length` semantics),
    * so parity holds on astral-plane text too — non-BMP codepoints are
    * never ASCII-alphanumeric and pass through, but they must not
    * desynchronize the position counter. One linear closure pass —
    * per-position `substr` would be O(len²) in Spark's codepoint
    * substr, and an inline-literal per-char expression tree would
    * de-JIT the stage. ONE MessageDigest per call, reused across
    * positions with a preallocated output/position scratch (a
    * per-character `getInstance` made wall time GC-topology-sensitive
    * — the `selfPairs` Scratch lesson, on the masking hot path).
    * Values longer than `maxLen` codepoints fail loudly:
    * format-preserving masking is for KEYS; per-char md5 over a blob
    * is a cost cliff that should be a deliberate choice.
    */
  def portableFormatPreserving(value: Column, secret: String,
      maxLen: Int = 256): Column = {
    val u = udf((v: String, s: String) => {
      if (v == null) null
      else {
        val nCp = v.codePointCount(0, v.length)
        require(nCp <= maxLen,
          s"portableFormatPreserving: value length $nCp codepoints > " +
            s"maxLen $maxLen — masking is for keys, not blobs")
        val md = java.security.MessageDigest.getInstance("MD5")
        val seedBytes =
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val digestOut = new Array[Byte](16)
        val posBuf = new Array[Byte](10)
        val sb = new java.lang.StringBuilder(v.length)
        var ci = 0 // UTF-16 index into v
        var pos = 0 // codepoint position (0-based; 1-based when hashed)
        while (ci < v.length) {
          val cp = v.codePointAt(ci)
          val c = v.charAt(ci) // surrogates are never ASCII-alnum
          val isDigit = c >= '0' && c <= '9'
          val isLower = c >= 'a' && c <= 'z'
          val isUpper = c >= 'A' && c <= 'Z'
          if (isDigit || isLower || isUpper) {
            md.update(seedBytes)
            md.update('#'.toByte)
            var n = pos + 1
            var p = posBuf.length
            while (n > 0) {
              p -= 1; posBuf(p) = ('0' + n % 10).toByte; n /= 10
            }
            md.update(posBuf, p, posBuf.length - p)
            md.digest(digestOut, 0, 16) // completes AND resets md
            val shift = digestOut(0) & 0xFF // == nibble(1)*16 + nibble(2)
            val out =
              if (isDigit) ('0' + (c - '0' + shift) % 10).toChar
              else if (isLower) ('a' + (c - 'a' + shift) % 26).toChar
              else ('A' + (c - 'A' + shift) % 26).toChar
            sb.append(out)
          } else sb.appendCodePoint(cp)
          ci += Character.charCount(cp)
          pos += 1
        }
        sb.toString
      }
    })
    u(value.cast("string"),
      md5(concat(lit(secret), lit("|"), value.cast("string"))))
  }

  /** Consistent date shifting (portable): every timestamp of the same
    * `key` entity moves by the SAME whole-day offset, drawn uniformly
    * from [−maxDays, +maxDays] by the 48-bit md5 coin of
    * `secret || '|' || key` — so within-entity intervals (order
    * cadence, ship latencies, session gaps) are preserved EXACTLY
    * while absolute dates are anonymized; different entities shift
    * independently, so cross-entity timelines decorrelate. The classic
    * longitudinal-data anonymizer rule (HIPAA-style date shifting),
    * and the temporal analog of [[portableFormatPreserving]]'s
    * value-keyed consistency. Deterministic, retry-safe, and every
    * offset re-derivable by an external SQL oracle through the same
    * nibble arithmetic as the randomized-response coin. NULL keys
    * coalesce to the U+0001 sentinel (concat_ws would silently skip
    * them — a seed-only coin the SQL oracle's `||`, which yields NULL,
    * cannot replay); the oracle mirrors with
    * `COALESCE(CAST(key AS VARCHAR), chr(1))`.
    */
  def portableDateShift(ts: Column, key: Column, secret: String,
      maxDays: Int): Column = {
    require(maxDays >= 1, s"maxDays must be >= 1 (got $maxDays)")
    val b = graft.pipeline.Sampling.hashBucket48(
      concat_ws("|", lit(secret),
        coalesce(key.cast("string"), lit("\u0001"))))
    val off = (pmod(b, lit(2L * maxDays + 1)) - lit(maxDays.toLong))
      .cast("int")
    // day-time interval addition (UTC session: exact 24h days, no DST
    // fold — the same day arithmetic the SQL oracle's INTERVAL does)
    ts + call_function("make_dt_interval", off)
  }

  def register(formatterName: String, f: Column => Column): Unit =
    synchronized { registry += formatterName -> f }
  def formatter(formatterName: String): Column => Column =
    registry.getOrElse(formatterName, throw new IllegalArgumentException(
      s"unknown generator formatter '$formatterName'; known: ${registry.keys.toSeq.sorted.mkString(", ")}"))
  /** Unique variant: embed the pk rendering into the value. */
  def uniqueFormatter(formatterName: String): (Column, Column) => Column =
    formatterName match {
      case "email" | "safeEmail" => (s, pk) => uniqueEmail(s, pk)
      case "uuid" => (s, pk) => uuid(xxhash64(s, pk))
      // portable construct-unique email: every piece (nibble pick + pk) is
      // re-derivable by an external SQL oracle
      case "portableEmail" => (s, pk) =>
        concat(lower(portableFirstName(s)), lit("."), pk.cast("string"),
          lit("@example.com"))
      case other =>
        (s, pk) => concat(formatter(other)(s), lit("-"), pk.cast("string"))
    }
}
