package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`), north-star
  * extension (the reference has no vector surface).
  *
  * All vector math is built from Spark's higher-order array functions
  * (`zip_with` + `aggregate`) — codegen-native, no UDF boxing, and the fold
  * order is the array order, so any oracle that sums in element order
  * reproduces the doubles bit-for-bit.
  *
  * Scale design:
  *  - single-query top-k = narrow map (cosine against a literal vector) +
  *    `TakeOrderedAndProject` — no shuffle of the corpus;
  *  - [[signBandTopK]] = random-hyperplane-style LSH on the coordinate sign
  *    pattern: the candidate filter is again narrow (band signatures are
  *    compared against the query's literal signatures), cutting the exact
  *    cosine work to the matching buckets;
  *  - batch ANN (query *set*) = [[signBands]] on both sides + a bucket
  *    equi-join on (band, sig) — same banded shape as MinHash LSH, never a
  *    cross join.
  */
object Similarity {

  /** Elementwise-fold dot product in double precision (array-order fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in ONE array pass: the fold accumulates
    * (dot, ‖a‖², ‖b‖²) in a struct — higher-order functions evaluate
    * interpreted, so fusing the three folds cuts the per-pair cost 3×
    * while producing bit-identical sums (same element order, same ops).
    * Portable baseline; [[cosine]] auto-upgrades to the codegen'd
    * [[graft.plans.CosineSimilarity]] when the session registered
    * [[graft.plans.GraftExtensions]].
    */
  def cosineFold(a: Column, b: Column): Column = {
    val zipped = zip_with(a, b, (x, y) =>
      struct(x.cast("double").as("x"), y.cast("double").as("y")))
    val acc = aggregate(zipped,
      struct(lit(0.0).as("dp"), lit(0.0).as("na"), lit(0.0).as("nb")),
      (s, p) => struct(
        (s("dp") + p("x") * p("y")).as("dp"),
        (s("na") + p("x") * p("x")).as("na"),
        (s("nb") + p("y") * p("y")).as("nb")))
    acc("dp") / (sqrt(acc("na")) * sqrt(acc("nb")))
  }

  /** Cosine similarity; native codegen'd expression when available
    * (bit-identical to [[cosineFold]] — same accumulation order).
    */
  def cosine(a: Column, b: Column): Column =
    if (graft.plans.GraftExtensions.hasNative("cosine_sim"))
      call_function("cosine_sim", a, b)
    else cosineFold(a, b)

  /** Literal column for a query vector (broadcast as part of the plan). */
  def vecLit(v: Seq[Float]): Column = array(v.map(x => lit(x)): _*)

  /** Per-vector symmetric int8 scale: max|x|/127 (1.0 for the all-zero
    * vector so quantization stays total). Kept alongside the codes; the
    * per-element dequantization error is bounded by scale/2.
    */
  def int8Scale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
  }

  /** Int8 codes for an embedding under `scale` — the standard 4× cut in
    * storage and shuffle width for a large embedding store (ship
    * `(scale, codes)` instead of float32s; cosine is scale-invariant, so
    * ranking by the dequantized vectors equals ranking by the codes).
    * Round-half-away-from-zero in double, exact in any ANSI engine.
    */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") / scale).cast("tinyint"))

  /** Dequantized view of int8 codes: `code * scale`, double precision. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Exact brute-force cosine top-k against one query vector: narrow scan +
    * TakeOrdered — the correctness baseline every ANN variant is judged
    * against.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame =
    df.withColumn("cosine", cosine(col(vecCol), vecLit(query)))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Sign-pattern band signatures: `nBands` bands of `bitsPerBand`
    * coordinates each; a band's signature is the '1'/'0' sign pattern of its
    * coordinates. Equal-signature bands ⇒ the vectors lie on the same side
    * of those coordinate hyperplanes — the axis-aligned special case of
    * random-hyperplane (SimHash) LSH for cosine similarity.
    */
  def signBands(vec: Column, nBands: Int, bitsPerBand: Int): Seq[Column] =
    (0 until nBands).map { b =>
      concat((1 to bitsPerBand).map(i =>
        when(element_at(vec, b * bitsPerBand + i) > 0f, lit("1"))
          .otherwise(lit("0"))): _*)
    }

  /** Fail fast when the embedding dimension can't fill the requested
    * bands: out-of-range `element_at` would throw mid-job under ANSI mode
    * (or, with ANSI off, silently give every vector identical padding
    * bands — collapsing the LSH into an all-pairs join).
    */
  private def requireDim(df: DataFrame, vecCol: String, needed: Int): Unit =
    df.select(size(col(vecCol)).as("d")).head(1).foreach { r =>
      require(r.getInt(0) >= needed,
        s"embedding dim ${r.getInt(0)} < nBands*bitsPerBand = $needed")
    }

  /** LSH-filtered cosine top-k: only rows sharing ≥1 sign-band with the
    * query are scored. The band filter is a narrow predicate against
    * literal signatures — zero shuffle added over the scan.
    */
  def signBandTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nBands: Int = 16,
      bitsPerBand: Int = 4): DataFrame = {
    require(query.length >= nBands * bitsPerBand,
      s"query dim ${query.length} < nBands*bitsPerBand = ${nBands * bitsPerBand}")
    val qBands = signBands(vecLit(query), nBands, bitsPerBand)
    val rowBands = signBands(col(vecCol), nBands, bitsPerBand)
    val anyShared = rowBands.zip(qBands)
      .map { case (r, q) => r === q }
      .reduce(_ || _)
    df.filter(anyShared)
      .withColumn("cosine", cosine(col(vecCol), vecLit(query)))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Banded candidate pairs between two vector sets (self-join when
    * `right eq left`): explode each side to (band, sig) and equi-join — the
    * bucketed many-query ANN path. Returns distinct (id_a, id_b), id_a <
    * id_b on self-joins.
    */
  /** @param maxBucket optional skew guard: band buckets larger than this
    *   are dropped from candidate generation (an oversized bucket means a
    *   dense region where "near-duplicate" loses meaning and the pair count
    *   explodes quadratically; standard LSH practice is to skip or re-band
    *   them). `None` disables the extra aggregate.
    */
  def signBandCandidates(df: DataFrame, idCol: String, vecCol: String,
      nBands: Int = 8, bitsPerBand: Int = 8,
      maxBucket: Option[Int] = None): DataFrame = {
    // both sides of the self-join read the banded frame — persisting it
    // lets the self-join reuse one materialisation of the signatures. The
    // cache must not outlive the call (a long-lived session looping over
    // corpora would accumulate dead entries), so the thin (id_a, id_b)
    // result is materialised eagerly via localCheckpoint and the bands
    // cache released in finally. The checkpointed blocks are
    // MEMORY_AND_DISK and freed by the context cleaner once the frame is
    // unreachable.
    val bands = bandedSignatures(df, idCol, vecCol, nBands, bitsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try candidatePairPlan(bands, idCol, maxBucket).localCheckpoint()
    finally bands.unpersist()
  }

  /** The banded (id, band, sig) frame behind [[signBandCandidates]]. */
  private[graft] def bandedSignatures(df: DataFrame, idCol: String,
      vecCol: String, nBands: Int, bitsPerBand: Int): DataFrame = {
    requireDim(df, vecCol, nBands * bitsPerBand)
    df.select(col(idCol), posexplode(
        array(signBands(col(vecCol), nBands, bitsPerBand): _*))
      .as(Seq("band", "sig")))
  }

  /** Lazy candidate-pair plan over a banded frame — split out so tests can
    * assert the join shape (equi-join, never cartesian) on the plan that
    * actually generates candidates, which [[signBandCandidates]]'s
    * checkpoint would otherwise hide.
    */
  private[graft] def candidatePairPlan(bands: DataFrame, idCol: String,
      maxBucket: Option[Int]): DataFrame = {
    val kept = maxBucket.fold(bands) { m =>
      val small = bands.groupBy("band", "sig")
        .agg(count(lit(1)).as("__n")).filter(col("__n") <= m)
        .select("band", "sig")
      bands.join(small, Seq("band", "sig"))
    }
    val a = kept.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = kept.select(col(idCol).as("id_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the `nCentroids`
    * lowest-id vectors act as centroids) assigns every vector to its
    * highest-cosine cell in one narrow pass; a query then probes only its
    * `nProbe` nearest cells before exact scoring. The inverted-file analog
    * of [[signBandTopK]]: recall is governed by nProbe instead of band
    * width, and the assignment column can be precomputed/partitioned-by so
    * repeated queries touch only matching cells' files at scale.
    */
  /** A built IVF index: coarse centroids + the corpus with its cell
    * assignment materialised in a `__cell` column. Build once, query
    * many — the serving pattern: the full-corpus assignment scan happens
    * at build time, and each query then touches only its `nProbe` cells.
    * At 100 TB, persist with [[writeIvfIndex]] (PARTITIONED BY `__cell`)
    * so a query prunes cell files at the source instead of filtering a
    * full scan — demonstrated by the PartitionFilters plan assertion in
    * PipelineSpec.
    */
  /** The grouping sidecar of a TWO-LEVEL index
    * ([[buildIvfIndexTwoLevel]]): the level-1 centroids and, for each
    * level-2 cell, the level-1 group it belongs to. Persisted with the
    * index so every against-index operation (append, incremental
    * semantic dedup, streaming ingest) re-derives the SAME
    * group-restricted assignment the landed corpus was built with —
    * without it a probe would global-argmax into cells the landed rows
    * were never assigned by.
    */
  final case class TwoLevelMeta(l1: Array[Seq[Float]],
      cellGroup: Array[Int])

  final case class IvfIndex(centroids: Array[Seq[Float]],
      assigned: DataFrame, idCol: String, vecCol: String,
      twoLevel: Option[TwoLevelMeta] = None)

  private def cosScalar(a: Seq[Float], b: Seq[Float]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The full centroid scan as ONE jitted closure over the centroid
    * matrix — (argmax cell, its cosine) as a struct. This was
    * previously an `array_max` over nCentroids inline vector LITERALS;
    * that generates code linear in nCentroids·dim, and at 16 centroids
    * × 64 dims the fused whole-stage method already blows past
    * HotSpot's JIT bytecode limit, silently running the whole stage in
    * the bytecode INTERPRETER — measured 46 s vs 1.7 s on the 10×
    * rehearsal corpus when the assignment fused with a join loop — and
    * a production quantizer has thousands of centroids, where the
    * literal form is not even compilable. The closure loop is small,
    * JITs, and breaks the over-fused stage at a narrow boundary.
    *
    * Arithmetic is bit-identical to the literal form's
    * `cosine_sim`/fold (same element order, same single-rounded ops —
    * the ANN value oracles pin this); ties break toward the HIGHER
    * cell (`>=` under ascending scan), and a NaN cosine (zero vector)
    * outranks everything — exactly the struct-max ordering. A null
    * vector assigns null; a dimension MISMATCH raises (a truncated dot
    * product would land the row in a plausible wrong cell silently —
    * the [[requireDim]] fail-fast posture).
    */
  private def centroidScan(vecCol: String,
      centroids: Array[Seq[Float]]): Column = {
    val cents: Array[Array[Float]] = centroids.map(_.toArray)
    val f = udf { (v: Seq[Float]) =>
      if (v == null) None
      else {
        // fail FAST on a dimension mismatch (the requireDim posture):
        // a truncated dot product would assign a plausible-looking
        // wrong cell with a real-looking score and no error anywhere
        require(cents.isEmpty || v.length == cents(0).length,
          s"vector dim ${v.length} != centroid dim " +
            s"${cents(0).length} — mismatched embedding landed in the " +
            "assignment scan")
        var best = -1
        var bestKey = Double.NegativeInfinity
        var bestCos = Double.NaN
        var c = 0
        while (c < cents.length) {
          val ce = cents(c)
          var dp = 0.0; var nv = 0.0; var nc = 0.0
          var i = 0
          while (i < ce.length) {
            val x = v(i).toDouble; val y = ce(i).toDouble
            dp += x * y; nv += x * x; nc += y * y
            i += 1
          }
          val cos = dp / (math.sqrt(nv) * math.sqrt(nc))
          val key = if (cos.isNaN) Double.PositiveInfinity else cos
          if (best < 0 || key >= bestKey) {
            bestKey = key; bestCos = cos; best = c
          }
          c += 1
        }
        Some((best, bestCos))
      }
    }
    f(col(vecCol))
  }

  /** Argmax-cosine cell assignment column; ties break toward the
    * higher cell index — deterministic and pinned for both build and
    * k-means passes. See [[centroidScan]] for why this is a closure
    * UDF rather than inline centroid literals.
    */
  private def cellOf(vecCol: String, centroids: Array[Seq[Float]]): Column =
    centroidScan(vecCol, centroids)("_1")

  /** Each vector's cosine to its OWN (argmax-assigned) centroid — the
    * prototypicality score SemDeDup's survivor rule ranks on, from the
    * same single centroid scan as [[cellOf]].
    */
  private[pipeline] def maxCentroidCos(vecCol: String,
      centroids: Array[Seq[Float]]): Column =
    centroidScan(vecCol, centroids)("_2")

  /** Build the IVF index: coarse quantizer seeded from the `nCentroids`
    * lowest-id vectors, optionally refined by `kmeansIters` rounds of
    * spherical k-means, then one narrow pass assigning every vector to
    * its argmax-cosine cell. Driver work is O(nCentroids · dim) per
    * round; the per-round job is one explode + hash aggregate.
    *
    * `kmeansIters = 0` (default) keeps the raw seeds: fully reproducible
    * bit-for-bit, the oracle path. Trained centroids give better cell
    * balance and recall on skewed corpora; init, iteration count, and
    * the argmax tie rule are all pinned, so the only residual
    * nondeterminism is floating-point summation order inside the cell
    * means — it can flip the assignment of a vector near-equidistant
    * between cells, never the algorithm's structure.
    */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, kmeansIters: Int = 0): IvfIndex = {
    var centroids: Array[Seq[Float]] = df.orderBy(col(idCol))
      .limit(nCentroids).select(vecCol).collect()
      .map(_.getSeq[Float](0))
    for (_ <- 1 to kmeansIters) {
      // spherical k-means step: cell centroid = mean of its members'
      // DIRECTIONS (unit vectors) — cosine is norm-invariant, so letting
      // high-norm members dominate a plain mean would bias the cell.
      // collect is O(nCentroids · dim) rows, the heavy work is one
      // explode + partial-aggregated groupBy.
      val nrm = norm(col(vecCol))
      val means = df.filter(nrm > 0.0)
        .select(cellOf(vecCol, centroids).as("__cell"),
          posexplode(transform(col(vecCol), x => x.cast("double") / nrm))
            .as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos").agg(avg("__x").as("__m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
        }
      // empty cells keep their previous centroid
      centroids = centroids.zipWithIndex.map { case (c, i) =>
        means.getOrElse(i, c)
      }
    }
    IvfIndex(centroids, df.withColumn("__cell", cellOf(vecCol, centroids)),
      idCol, vecCol)
  }

  /** TWO-LEVEL coarse quantizer build — the assignment shape that
    * survives auto-sized cell counts. The flat [[buildIvfIndex]] scan
    * is O(n · nCells · dim) per corpus pass; under the "nCells grows
    * with the corpus" contract (nCells = n/targetCell) that is
    * QUADRATIC in n — the 10× rehearsal measured the auto-sized flat
    * transform at 14.8× (assignment-bound), vs ~2–3× for every linear
    * family. The published fix (IMI / hierarchical coarse quantizers)
    * is to route assignment through a first level of ~√nCells
    * centroids: level-1 seeds are the ⌈√nCells⌉ lowest-id vectors;
    * each vector takes its argmax level-1 group (the [[cellOf]] rule —
    * ties high, NaN outranks, null stays null, dim mismatch raises);
    * each level-1 group contributes its ⌈nCells/c1⌉ lowest-id MEMBERS
    * as level-2 seeds (globally numbered in (group, id) order — these
    * are the index's `centroids`); and the final cell is the argmax
    * level-2 seed WITHIN the vector's own group (ties toward the
    * higher global cell). Per-row work is O((√nCells + nCells/√nCells)
    * · dim) ≈ 2√nCells·dim — linear-in-n total at any auto-sized cell
    * count.
    *
    * The trade vs flat: assignment is approximate (a vector near a
    * group boundary may sit closer to another group's seed), which for
    * the SemDeDup consumer means a near-boundary pair can be missed —
    * the same recall trade `nProbe` makes on the query side, and the
    * reason the flat build remains the default at hand-sized cell
    * counts. Deterministic end to end (every rule pinned above), so
    * `q_semdedup_2l` replays the full two-level chain in DuckDB.
    * Returned as an [[IvfIndex]] carrying its [[TwoLevelMeta]]
    * (centroids = the level-2 seeds): [[writeIvfIndex]] persists the
    * grouping (a `grp` column in the centroid sidecar + an `l1`
    * sidecar), [[assignCells]] and [[appendToIvfIndex]] re-derive the
    * SAME group-restricted assignment from it, and the SemDeDup
    * machinery composes unchanged — probed cells always match landed
    * cells, exactly the flat layout's contract ([[reclusterIvfIndex]]
    * re-sizes either form; its `twoLevel` flag picks the target). The
    * landed centroid count is Σ min(|groupᵢ|, ⌈nCells/c1⌉) — it can
    * land UNDER `nCells` (small groups contribute fewer seeds) or
    * OVER it (c1·⌈nCells/c1⌉ ≥ nCells; e.g. nCells = 5 → c1 = 3,
    * m = 2 → up to 6 cells): size downstream state from
    * `centroids.length`, not the request.
    */
  def buildIvfIndexTwoLevel(df: DataFrame, idCol: String,
      vecCol: String, nCells: Int): IvfIndex = {
    import org.apache.spark.sql.expressions.Window
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    val c1 = math.ceil(math.sqrt(nCells.toDouble)).toInt
    val m = math.ceil(nCells.toDouble / c1).toInt
    val l1: Array[Seq[Float]] = df.orderBy(col(idCol)).limit(c1)
      .select(vecCol).collect().map(_.getSeq[Float](0))
    val withL1 = df.withColumn("__l1", cellOf(vecCol, l1))
    val w = Window.partitionBy("__l1").orderBy(col(idCol))
    // the level-2 seed table: O(nCells) rows to the driver — the same
    // driver-state bound as the flat build's centroid collect
    val seeds = withL1.filter(col("__l1").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m)
      .select(col("__l1"), col(idCol), col(vecCol))
      .orderBy("__l1", idCol)
      .collect()
    val centroids: Array[Seq[Float]] = seeds.map(_.getSeq[Float](2))
    val meta = TwoLevelMeta(l1, seeds.map(_.getInt(0)))
    // assignment through the SAME closure every against-index probe
    // uses (one definition of both levels' scans — build and probe
    // cannot drift); the extra level-1 re-scan inside it is O(√nCells)
    IvfIndex(centroids,
      withL1.drop("__l1")
        .withColumn("__cell", twoLevelCellOf(vecCol, meta, centroids)),
      idCol, vecCol, Some(meta))
  }

  /** The composed two-level assignment as ONE jitted closure — the
    * probe/build rule of a [[buildIvfIndexTwoLevel]] index: level-1
    * argmax group over `meta.l1` (the [[centroidScan]] contract —
    * ties toward the higher group, NaN outranks, null stays null, dim
    * mismatch raises), then argmax over the cells OF THAT GROUP (ties
    * toward the higher global cell). Defensively, a vector whose
    * level-1 group holds no cells falls back to the global argmax —
    * under the pinned tie rules every group is anchored by its own
    * seed (a seed's self-cosine is maximal), so the branch is
    * unreachable for any corpus-built index, but a total rule beats a
    * null cell on the append path. Shared by the build, [[assignCells]]
    * and [[appendToIvfIndex]], so landed cells and probed cells can
    * never disagree.
    */
  private def twoLevelCellOf(vecCol: String, meta: TwoLevelMeta,
      centroids: Array[Seq[Float]]): Column = {
    val l1a: Array[Array[Float]] = meta.l1.map(_.toArray)
    val cents: Array[Array[Float]] = centroids.map(_.toArray)
    val byGroup: Map[Int, Array[Int]] = cents.indices
      .groupBy(meta.cellGroup).map { case (g, xs) => g -> xs.toArray }
    val f = udf { (v: Seq[Float]) =>
      if (v == null) None
      else {
        require(l1a.isEmpty || v.length == l1a(0).length,
          s"vector dim ${v.length} != centroid dim ${l1a(0).length} " +
            "— mismatched embedding landed in the assignment scan")
        def cosKey(ce: Array[Float]): Double = {
          var dp = 0.0; var nv = 0.0; var nc = 0.0
          var i = 0
          while (i < ce.length) {
            val x = v(i).toDouble; val y = ce(i).toDouble
            dp += x * y; nv += x * x; nc += y * y
            i += 1
          }
          val cos = dp / (math.sqrt(nv) * math.sqrt(nc))
          if (cos.isNaN) Double.PositiveInfinity else cos
        }
        var g = -1
        var gk = Double.NegativeInfinity
        var c = 0
        while (c < l1a.length) {
          val k = cosKey(l1a(c))
          if (g < 0 || k >= gk) { gk = k; g = c }
          c += 1
        }
        val pool: Array[Int] =
          byGroup.getOrElse(g, cents.indices.toArray)
        var best = -1
        var bk = Double.NegativeInfinity
        pool.foreach { cell =>
          val k = cosKey(cents(cell))
          if (best < 0 || k >= bk) { bk = k; best = cell }
        }
        Some(best)
      }
    }
    f(col(vecCol))
  }

  /** Each row's cosine to the centroid of its ASSIGNED cell — the
    * own-centroid prototypicality score for indexes whose assignment
    * is NOT a global argmax (the two-level build), where
    * [[maxCentroidCos]] would score against a cell the row doesn't
    * live in. Same fold arithmetic as [[centroidScan]].
    */
  private[pipeline] def centroidCosAt(vecCol: String, cellCol: String,
      centroids: Array[Seq[Float]]): Column = {
    val cents: Array[Array[Float]] = centroids.map(_.toArray)
    val f = udf { (v: Seq[Float], cell: java.lang.Integer) =>
      if (v == null || cell == null) None
      else {
        val ce = cents(cell.intValue())
        var dp = 0.0; var nv = 0.0; var nc = 0.0
        var i = 0
        while (i < ce.length) {
          val x = v(i).toDouble; val y = ce(i).toDouble
          dp += x * y; nv += x * x; nc += y * y
          i += 1
        }
        Some(dp / (math.sqrt(nv) * math.sqrt(nc)))
      }
    }
    f(col(vecCol), col(cellCol))
  }

  /** The query's `nProbe` highest-cosine cells over a centroid table
    * (O(nCentroids · dim)); ties toward the lower cell id via the
    * stable sort — THE probe rule, shared verbatim by the driver-side
    * single-query path and the per-row batch expression so the two can
    * never drift.
    */
  private def probeCellsOf(centroids: Array[Seq[Float]],
      query: Seq[Float], nProbe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => i -> cosScalar(query, c) }
      .sortBy(-_._2).take(nProbe).map(_._1).toSeq

  private def probeCells(idx: IvfIndex, query: Seq[Float],
      nProbe: Int): Seq[Int] = probeCellsOf(idx.centroids, query, nProbe)

  /** The SINGLE-query probe predicate: a literal `IN` over the
    * driver-ranked probe cells. Deliberately NOT the [[probedCellScan]]
    * semi-join the batch/against-index paths use: here the list is
    * bounded by the caller's `nProbe` (a per-query constant — the
    * corpus-proportional nCells never reaches this site outside an
    * explicit full-probe parity call, which is a deliberate full scan),
    * a planning-time literal gives STATIC partition pruning with no
    * runtime subquery, and past the optimizer's In→InSet threshold the
    * executed form is one set probe — never generated code linear in
    * the list.
    */
  private def probeFilter(probes: Seq[Int]): Column =
    col("__cell").isInCollection(probes)

  /** Query a built index: rank the query's `nProbe` nearest cells on the
    * driver (O(nCentroids) work), scan only those cells, exact cosine +
    * TakeOrdered inside them.
    */
  def queryIvf(idx: IvfIndex, query: Seq[Float], k: Int,
      nProbe: Int = 2): DataFrame = {
    val probes = probeCells(idx, query, nProbe)
    idx.assigned
      .filter(probeFilter(probes))
      .withColumn("cosine", cosine(col(idx.vecCol), vecLit(query)))
      .orderBy(col("cosine").desc, col(idx.idCol))
      .limit(k)
      .drop("__cell")
  }

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nCentroids: Int = 16,
      nProbe: Int = 2): DataFrame =
    queryIvf(buildIvfIndex(df, idCol, vecCol, nCentroids), query, k, nProbe)

  /** Batch ANN: a whole DataFrame of queries resolved through the index
    * in ONE distributed plan — the many-query serving shape, where a
    * per-query [[queryIvf]] driver loop would serialize. Each query's
    * `nProbe` nearest cells come from the broadcast centroid literals (a
    * narrow projection), explode to (query, probe cell), equi-join the
    * cell column of the assigned corpus — at scale the corpus is
    * partitioned by `__cell`, so the join prunes to probed cells — and
    * the exact-cosine top-k cut is a window over the HIGH-cardinality
    * query id (every window partition is one query's ≤ nProbe cells of
    * candidates, never a giant partition).
    *
    * Tie rules match [[queryIvf]] exactly: probe ties toward the lower
    * cell id, result ties toward the lower corpus id.
    *
    * NOTE: the call itself runs a small eager job (it checkpoints the
    * thin query projection) — the returned frame is lazy, the corpus
    * pruning happens inside it ([[probedCellScan]]: one broadcast of
    * the distinct probed cells, partition-pruned at runtime). The query
    * frame may be non-deterministic; it is materialised exactly once.
    *
    * Output: query id (as `qIdCol`), all corpus columns, `cosine`.
    */
  def queryIvfBatch(idx: IvfIndex, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, nProbe: Int = 2): DataFrame =
    ivfBatchPlan(idx, queries, qIdCol, qVecCol, k, nProbe,
      cosine(col(idx.vecCol), col("__qv")), dropCols = Seq("__cell"))

  /** Recall@k audit — the evaluation operator every approximate index
    * needs before serving: per query, how much of the EXACT top-k the
    * approximate path recovered. `exact` and `approx` are any two
    * (query id, result id, …) frames (e.g. [[queryIvfBatch]] at full
    * probe vs a small `nProbe`; brute force vs [[signBandTopK]]).
    * Output per query id: `n_hit` (intersection size), `n_exact`, and
    * `recall` = n_hit / n_exact. Shape: two thin |queries|·k frames
    * through one equi-join and two aggregates — evaluation cost scales
    * with the query sample, never the corpus.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, qIdCol: String,
      idCol: String): DataFrame = {
    // distinct: duplicate (query, id) rows in either frame (a multi-cell
    // union, say) must count as one hit, or recall can exceed 1.0
    val e = exact.select(col(qIdCol), col(idCol)).distinct()
    val a = approx.select(col(qIdCol), col(idCol)).distinct()
    val hit = e.join(a, Seq(qIdCol, idCol))
      .groupBy(qIdCol).agg(count(lit(1)).as("n_hit"))
    e.groupBy(qIdCol).agg(count(lit(1)).as("n_exact"))
      .join(hit, Seq(qIdCol), "left")
      .select(col(qIdCol),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("n_exact"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** Batch ANN through an int8 index ([[int8Index]]/[[writeIvfInt8Index]]):
    * [[queryIvfBatch]]'s one-plan query-set shape with the scoring
    * swapped to the dequantized codes — each probed cell is read once
    * per touching query as d bytes of codes, scored by codegen'd cosine
    * (the native expression takes the double/float mix), no float fetch
    * anywhere. Tie rules match [[queryIvfInt8]].
    */
  def queryIvfInt8Batch(idx: IvfIndex, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, nProbe: Int = 2): DataFrame =
    ivfBatchPlan(idx, queries, qIdCol, qVecCol, k, nProbe,
      cosine(dequantize(col(Int8CodesCol), col(Int8ScaleCol)), col("__qv")),
      dropCols = Seq("__cell", Int8ScaleCol, Int8CodesCol))

  /** The shared one-plan batch shape behind [[queryIvfBatch]] and
    * [[queryIvfInt8Batch]]: per-query probes from broadcast centroid
    * literals, cell equi-join, `score` per candidate, per-query top-k
    * window (ties toward the lower corpus id).
    */
  /** The per-row probe-cell array for a `__qv` query-vector column —
    * LITERALLY [[probeCellsOf]] as a closure UDF over the centroid
    * matrix (only the centroids are captured; the index's frames are
    * not serializable and not needed), so the batch paths and the
    * driver-side single-query path share one definition that cannot
    * drift. Previously this was a sort_array over nCentroids inline
    * struct literals — the same JIT-cliff shape [[centroidScan]]
    * replaced: code linear in nCentroids·dim that de-JITs the fused
    * stage and caps the quantizer size.
    */
  private def probeCellsExpr(idx: IvfIndex, nProbe: Int): Column = {
    val cents = idx.centroids
    val dim = cents.headOption.map(_.length).getOrElse(0)
    val f = udf { (v: Seq[Float]) =>
      // fail LOUDLY: a None here would be exploded away and the query
      // row silently vanish from every batch/serving result — breaking
      // the 'every query served exactly once' contract — and a
      // mismatched dim would probe a prefix-cosine's wrong cells
      require(v != null, "ANN query with a null vector — every query " +
        "must carry an embedding")
      require(v.length == dim,
        s"ANN query dim ${v.length} != index dim $dim")
      probeCellsOf(cents, v, nProbe)
    }
    f(col("__qv"))
  }

  /** Restrict a `__cell`-carrying corpus to the cells of `cells` (any
    * thin one-column frame of cell ids) by a BROADCAST left-semi join —
    * THE probed-cell prefilter of every against-index plan (batch ANN,
    * incremental semantic dedup). Joining the corpus on `__cell` alone
    * cannot prune partitions at the source (a filter can't cross a join
    * without runtime pruning), and the previous form — collect the cell
    * set, filter with an inline-literal `IN` — re-created the
    * JIT-cliff / giant-analysis-tree shape under the "nCells grows with
    * the corpus" contract: a worst-case batch probes millions of cells
    * and the literal list becomes the plan. The semi-join broadcasts
    * the distinct cell ids (ints — a few MB even at millions of cells,
    * never the query vectors) and keeps the file skip through DYNAMIC
    * partition pruning: on a [[writeIvfIndex]]-family layout Spark
    * derives the `__cell` partition filter from the reused broadcast at
    * runtime (`dynamicpruningexpression` in the scan, spec-asserted),
    * so a probe still reads exactly the probed cells' files — the
    * difference between `|probed cells|` and the whole corpus per
    * batch — with no driver round-trip and no literal tree.
    *
    * The `>= 0` guard is load-bearing, not defensive: cell ids are
    * centroid indices (non-negative by construction), and the
    * comparison predicate is what marks the broadcast side "selective"
    * to the optimizer's partition-pruning rule — a bare distinct
    * projection would not qualify and the scan would read every cell.
    *
    * Callers MUST pass cells derived from an already-materialised query
    * frame (see [[pinnedQueryFrame]]): the semi-join build and the
    * downstream candidate plan read the frame independently, and if a
    * non-deterministic source re-evaluated between the two, a query
    * could probe a cell the prefilter excluded — silently dropping its
    * candidates.
    */
  private[pipeline] def probedCellScan(corpus: DataFrame,
      cells: DataFrame): DataFrame = {
    val c = cells
      .select(col(cells.columns.head).cast("int").as("__probe_cell"))
      .filter(col("__probe_cell") >= 0)
      .distinct()
    corpus.join(broadcast(c), col("__cell") === col("__probe_cell"),
      "left_semi")
  }

  /** The internal (`__qid`, `__qv`) query projection, pinned with an
    * eager localCheckpoint so every consumer — the probed-cell
    * semi-join's build, the candidate explode, the rerank join — reads the SAME
    * materialised rows. The checkpoint is what makes the batch paths
    * safe on non-deterministic query frames; it is thin (id + vector)
    * and batch-sized by construction, so the eager job is cheap.
    *
    * Lifetime: the checkpointed blocks live until [[releaseQueryPins]]
    * (or GC of the RDD). And because a localCheckpoint truncates
    * lineage, its blocks are unrecoverable on executor loss — a lost
    * executor mid-action fails the returned lazy frame rather than
    * recomputing. Acceptable for batch serving (re-run the batch);
    * long-lived drivers should call [[releaseQueryPins]] after each
    * batch's results are consumed.
    */
  private def pinnedQueryFrame(queries: DataFrame, qIdCol: String,
      qVecCol: String): DataFrame =
    pinnedFrame(queries
      .select(col(qIdCol).as("__qid"), col(qVecCol).as("__qv")))

  /** Eagerly materialise `df` via localCheckpoint and REGISTER the
    * blocks in the query-pin machinery (the active thread scope when
    * inside [[withQueryPinScope]], else the global weak registry) —
    * the registration half of the batch-probe checkpoint, shared with
    * the other against-index probes (incremental semantic dedup), so
    * one drain discipline covers every probe family.
    */
  private[pipeline] def pinnedFrame(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val scope = pinScope.get()
        if (scope != null) scope.add(lr.rdd)
        else queryPins.add(new java.lang.ref.WeakReference(lr.rdd))
      case _ => ()
    }
    cp
  }

  private val pinScope =
    new ThreadLocal[java.util.ArrayList[org.apache.spark.rdd.RDD[_]]]()

  /** Run `body` under its OWN query-pin scope: batch-ANN calls issued
    * inside `body` ON THIS THREAD pin into the scope instead of the
    * global registry, and the scope unpersists exactly those pins when
    * `body` returns — the per-batch drain a long-running consumer
    * (e.g. a serving stream's foreachBatch) needs WITHOUT touching
    * other concurrent consumers' pins, which a global
    * [[releaseQueryPins]] would tear out from under them mid-write.
    * `body`'s results must be fully consumed before it returns (the
    * pinned frames are lineage-truncated — same contract as
    * [[releaseQueryPins]]); threads spawned inside `body` pin globally
    * as usual.
    */
  def withQueryPinScope[A](body: => A): A = {
    val outer = pinScope.get()
    val scope = new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]()
    pinScope.set(scope)
    try body
    finally {
      if (outer != null) pinScope.set(outer) else pinScope.remove()
      scope.forEach(r => r.unpersist(blocking = false))
    }
  }

  // pins outstanding since the last releaseQueryPins drain — bounded by
  // the number of batch-ANN calls between drains, each entry one thin
  // (id, vector) RDD handle. Weak references: a caller that never
  // drains still gets the ContextCleaner's GC-driven unpersist once it
  // drops the result frame (the registry must not be what keeps the
  // blocks alive); releaseQueryPins is the EAGER path on top.
  private val queryPins =
    new java.util.concurrent.ConcurrentLinkedQueue[
      java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]

  /** Drop the materialised query-frame blocks pinned by every
    * [[queryIvfBatch]]/[[queryIvfInt8Batch]]/[[queryIvfPqBatch]] call
    * since the last drain (mirrors
    * [[Dedup.NearDupIndex.unpersistShingles]]). Call ONLY after the
    * batch results have been fully consumed: the pinned frames are
    * lineage-truncated, so a released frame cannot be recomputed and
    * any still-lazy result reading it will fail. Returns the number of
    * pins released (GC-collected entries drain silently).
    */
  def releaseQueryPins(): Int = {
    var n = 0
    var ref = queryPins.poll()
    while (ref != null) {
      val r = ref.get()
      if (r != null) { r.unpersist(blocking = false); n += 1 }
      ref = queryPins.poll()
    }
    n
  }

  private def ivfBatchPlan(idx: IvfIndex, queries: DataFrame,
      qIdCol: String, qVecCol: String, k: Int, nProbe: Int,
      score: Column, dropCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // internal names so query columns can never collide with corpus ones
    val q = pinnedQueryFrame(queries, qIdCol, qVecCol)
    val cellsDf = q.select(explode(probeCellsExpr(idx, nProbe)).as("__probe"))
    val candidates = q
      .withColumn("__probe", explode(probeCellsExpr(idx, nProbe)))
      .join(probedCellScan(idx.assigned, cellsDf),
        col("__probe") === col("__cell"))
      .withColumn("cosine", score)
    val w = Window.partitionBy("__qid")
      .orderBy(col("cosine").desc, col(idx.idCol))
    candidates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select((col("__qid").as(qIdCol) +:
        idx.assigned.columns.filterNot(dropCols.contains).map(col) :+
        col("cosine")).toIndexedSeq: _*)
  }

  /** Persist a built IVF index as the partition-pruned serving layout:
    * the assigned corpus written PARTITIONED BY `__cell`, so a query's
    * `nProbe` cell filter becomes a PARTITION filter at the parquet
    * source — only the probed cells' files are ever opened, instead of
    * filtering a full-corpus scan. This is the 100 TB shape: cell count
    * is chosen so one cell ≈ a few GB of files, and a top-k query then
    * reads `nProbe` cells regardless of corpus size. The centroids (tiny
    * — nCentroids · dim floats) ride along as a sidecar table with the
    * id/vector column names, so the index round-trips without external
    * metadata.
    */
  def writeIvfIndex(idx: IvfIndex, path: String): Unit = {
    // id-sorted within each cell's files: id-range row-group stats then
    // prune point fetches by id (the queryIvfPq rerank stage) to the few
    // groups holding the requested ids
    idx.assigned.sortWithinPartitions(col("__cell"), col(idx.idCol))
      .write.mode("overwrite")
      .partitionBy("__cell").parquet(s"$path/corpus")
    writeSidecars(idx, s"$path/centroids", s"$path/l1")
  }

  /** The centroid sidecar write — shared by [[writeIvfIndex]] and the
    * [[reclusterIvfIndex]] staging path so both persist the same
    * (flat vs two-level) geometry. A two-level index records each
    * cell's level-1 group in a `grp` column and the level-1 centroids
    * as a second sidecar at `l1Path` — an against-index probe must
    * re-derive the GROUP-RESTRICTED assignment the landed rows were
    * built with, which the plain sidecar cannot express.
    */
  private def writeSidecars(idx: IvfIndex, centPath: String,
      l1Path: String): Unit = {
    val spark = idx.assigned.sparkSession
    import spark.implicits._
    idx.twoLevel match {
      case None =>
        idx.centroids.zipWithIndex
          .map { case (c, i) => (i, c, idx.idCol, idx.vecCol) }.toSeq
          .toDF("cell", "centroid", "id_col", "vec_col")
          .coalesce(1)
          .write.mode("overwrite").parquet(centPath)
      case Some(tl) =>
        idx.centroids.zipWithIndex
          .map { case (c, i) =>
            (i, c, idx.idCol, idx.vecCol, tl.cellGroup(i))
          }.toSeq
          .toDF("cell", "centroid", "id_col", "vec_col", "grp")
          .coalesce(1)
          .write.mode("overwrite").parquet(centPath)
        tl.l1.zipWithIndex.map { case (c, g) => (g, c) }.toSeq
          .toDF("g", "centroid")
          .coalesce(1)
          .write.mode("overwrite").parquet(l1Path)
    }
  }

  /** Load an index written by [[writeIvfIndex]]. The returned index's
    * `assigned` frame is the cell-partitioned parquet table, so
    * [[queryIvf]]/[[queryIvfBatch]] cell predicates prune partitions at
    * the source (asserted on `PartitionFilters` in PipelineSpec).
    */
  def loadIvfIndex(spark: SparkSession, path: String): IvfIndex =
    loadIvfIndex(spark, path, spark.read.parquet(s"$path/corpus"))

  /** [[loadIvfIndex]] with the corpus frame already in hand — pairs
    * with `detectIvfLayout(fields)` so a caller that sniffed the layout
    * from the corpus schema (the streaming servers) pays ONE footer
    * read, not a second for the load.
    */
  def loadIvfIndex(spark: SparkSession, path: String,
      corpus: DataFrame): IvfIndex = {
    val (centroids, idCol, vecCol, tl) = loadCentroidMeta(spark, path)
    IvfIndex(centroids, corpus, idCol, vecCol, tl)
  }

  /** The centroid sidecar(s) of a persisted index — shared by
    * [[loadIvfIndex]] and [[appendToIvfIndex]] so both see the same
    * (flat vs two-level) assignment geometry. A `grp` column in the
    * sidecar marks a [[buildIvfIndexTwoLevel]] layout, whose level-1
    * centroids are read from the `l1` sidecar.
    */
  private def loadCentroidMeta(spark: SparkSession, path: String)
      : (Array[Seq[Float]], String, String, Option[TwoLevelMeta]) = {
    val df = spark.read.parquet(s"$path/centroids")
    val meta = df.orderBy("cell").collect()
    require(meta.nonEmpty, s"no centroids found under $path/centroids")
    val centroids = meta.map(_.getSeq[Float](1))
    val tl =
      if (!df.schema.fieldNames.contains("grp")) None
      else {
        val grpIdx = df.schema.fieldIndex("grp")
        val l1 = spark.read.parquet(s"$path/l1").orderBy("g").collect()
          .map(_.getSeq[Float](1))
        require(l1.nonEmpty, s"two-level index at $path has no l1 " +
          "sidecar — the centroid table carries a grp column")
        Some(TwoLevelMeta(l1, meta.map(_.getInt(grpIdx))))
      }
    (centroids, meta.head.getString(2), meta.head.getString(3), tl)
  }

  /** Fold newly-ingested vectors INTO a persisted IVF-family index at
    * `path` WITHOUT re-clustering — the vector side of the incremental
    * ingest loop: each new vector takes its argmax-cosine cell under the
    * EXISTING centroid sidecar (which is never rewritten, so cell
    * geometry is stable and every previously-persisted row keeps its
    * cell) and lands as new files in the cell-partitioned corpus, in
    * whichever row shape the layout was written with — detected from
    * the persisted corpus schema and sidecars:
    *   - plain [[writeIvfIndex]]: the row + `__cell`;
    *   - [[writeIvfPqIndex]]: the pq sidecar's codebooks encode the new
    *     rows' `__codes` (codebooks are NOT retrained — same trade as
    *     the centroids);
    *   - [[writeIvfInt8Index]]: per-row symmetric scale + int8 codes,
    *     floats dropped.
    *
    * The trade every IVF deployment makes: appended vectors get the
    * best cell under the OLD centroids, which drift from the grown
    * corpus's optimum over many appends — recall decays gracefully, and
    * the fix is a periodic rebuild (re-clustering in place would move
    * EXISTING rows between cells, i.e. a full rewrite anyway). Appended
    * files keep the id-sorted-within-cell property for their own rows,
    * so row-group id stats still prune rerank point fetches. Duplicate
    * ids are not checked: an ANN index tolerates them (the id would
    * surface twice in results) — pre-dedup batches upstream.
    */
  /** Assign `df`'s `vecCol` vectors to their argmax-cosine cell under
    * this index's (frozen) centroids, appending `__cell` — the
    * batch-side half of every against-index operation (append, serving,
    * incremental semantic dedup), exposed so they all share ONE
    * assignment rule (ties toward the higher cell, as the build).
    * Narrow: the centroids ride as plan literals, no shuffle.
    */
  def assignCells(idx: IvfIndex, df: DataFrame, vecCol: String): DataFrame =
    idx.twoLevel match {
      case None => df.withColumn("__cell", cellOf(vecCol, idx.centroids))
      case Some(tl) =>
        df.withColumn("__cell", twoLevelCellOf(vecCol, tl, idx.centroids))
    }

  def appendToIvfIndex(spark: SparkSession, path: String,
      newVectors: DataFrame, idCol: String, vecCol: String): Unit = {
    val (centroids, metaIdCol, metaVecCol, tl) =
      loadCentroidMeta(spark, path)
    require(metaIdCol == idCol && metaVecCol == vecCol,
      s"index at $path keys on ($metaIdCol, $metaVecCol), " +
        s"not ($idCol, $vecCol)")
    val corpusFields =
      spark.read.parquet(s"$path/corpus").schema.fieldNames
    val assigned = newVectors.withColumn("__cell", tl match {
      case None => cellOf(vecCol, centroids)
      case Some(m) => twoLevelCellOf(vecCol, m, centroids)
    })
    val shaped = detectIvfLayout(corpusFields.toSeq) match {
      case IvfLayout.Pq =>
        // sidecar-only load: the append needs the encoder, not a second
        // read of the corpus footers it already sniffed
        val cb = loadPqCodebooks(spark, path)
        assigned.withColumn(PqCodesCol, Pq.encode(cb)(col(vecCol)))
      case IvfLayout.Int8 =>
        assigned
          .withColumn(Int8ScaleCol, int8Scale(col(vecCol)))
          .withColumn(Int8CodesCol,
            int8Codes(col(vecCol), col(Int8ScaleCol)))
          .drop(vecCol)
      case IvfLayout.Float => assigned
    }
    require(shaped.columns.sorted.sameElements(corpusFields.sorted),
      s"batch columns [${shaped.columns.sorted.mkString(", ")}] do not " +
        s"match the persisted corpus [${corpusFields.sorted.mkString(", ")}]")
    shaped.select(corpusFields.map(col).toSeq: _*)
      .sortWithinPartitions(col("__cell"), col(idCol))
      .write.mode("append").partitionBy("__cell").parquet(s"$path/corpus")
  }

  /** Fold an append-grown cell layout back into consolidated, id-sorted
    * per-cell files — [[appendToIvfIndex]]'s maintenance-window
    * companion, working on any of the three persisted layouts (it
    * rewrites rows as-is; codes and sidecars are untouched). Restores
    * the full id-sort within each cell, so row-group id stats prune
    * rerank point fetches like a fresh [[writeIvfIndex]] again.
    * `filesPerCell` sizes the output (raise it when single cells exceed
    * a few GB). MUST NOT run concurrently with readers or appends;
    * crash-safe at any interruption point via [[IndexMaintenance]]
    * (stage → mark → swap; an interrupted swap heals on the next call,
    * before anything is read).
    */
  def compactIvfIndex(spark: SparkSession, path: String,
      filesPerCell: Int = 1): Unit = {
    require(filesPerCell >= 1, "filesPerCell must be >= 1")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(root, "corpus")
    IndexMaintenance.recoverOrSweep(fs, live)
    val idx = loadIvfIndex(spark, path)
    // RANGE-partition on (cell, id): partitions align with the cell
    // dirs (hash on the pair would spread every cell across every
    // partition and multiply files) and the id sort is already the
    // range order
    idx.assigned
      .repartitionByRange(idx.centroids.length * filesPerCell,
        col("__cell"), col(idx.idCol))
      .sortWithinPartitions(col("__cell"), col(idx.idCol))
      .write.partitionBy("__cell")
      .parquet(IndexMaintenance.stagingOf(live).toString)
    IndexMaintenance.swap(fs, live)
  }

  /** Re-derive the coarse quantizer of a persisted IVF-family index at
    * a NEW cell count and re-assign every row — THE remedy the
    * hot-cell guards prescribe ("re-cluster the index with more
    * cells"): appends land under FROZEN centroids, so corpus growth
    * eventually leaves cells oversized or drifted, and neither
    * compaction (same cells, fewer files) nor append (sidecar never
    * rewritten) can fix that. `nCells` typically comes from
    * [[Dedup.semDeDupAutoCells]] over the grown corpus (nCells =
    * ⌈n/targetCell⌉); `kmeansIters` defaults > 0 — a re-cluster run
    * exists to fix BALANCE, which trained centroids serve better than
    * raw lowest-id seeds (pass 0 for the bit-reproducible oracle
    * path, which `q_ivf_recluster` gates).
    *
    * Float and PQ layouts re-cluster in place (PQ codes are per-vector
    * and cell-independent — ADC scoring never reads the cell id, so
    * the codebook sidecar and every row's codes ride along verbatim);
    * `twoLevel` picks the TARGET form independently of the source
    * form: `false` (default) rebuilds the flat exact-assignment
    * quantizer, `true` rebuilds through [[buildIvfIndexTwoLevel]] —
    * the linear-assignment shape for corpus-proportional `nCells`,
    * which is exactly the regime a re-cluster run is sizing into. The
    * whole-root swap replaces ALL sidecars (grouped or plain), so
    * probes and the landed corpus stay consistent either side of the
    * swap in every source→target combination;
    * the int8 layout is REJECTED loudly: it dropped the float vectors
    * at write time, and re-clustering from dequantized codes would
    * silently move near-boundary vectors between cells under
    * quantization error — rebuild from the source corpus instead.
    *
    * Crash-safe via the [[IndexMaintenance]] pending-marker swap over
    * the whole index ROOT: corpus and sidecars publish TOGETHER —
    * swapping only the corpus directory would open a window where rows
    * sit in cells the old centroid sidecar does not describe, which
    * every probe would silently mis-prune. MUST NOT run concurrently
    * with readers or appends (the compaction contract).
    */
  def reclusterIvfIndex(spark: SparkSession, path: String, nCells: Int,
      kmeansIters: Int = 2, filesPerCell: Int = 1,
      twoLevel: Boolean = false): Unit = {
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    require(filesPerCell >= 1, "filesPerCell must be >= 1")
    // the flat rebuild's assignment is O(n · nCells) — at the
    // corpus-proportional cell counts this operator exists for (the
    // hot-cell remedy re-sizes with semDeDupAutoCells), that is
    // QUADRATIC, the very shape the 10× rehearsal flagged at 4.7–17×.
    // twoLevel = true rebuilds through buildIvfIndexTwoLevel instead:
    // linear assignment, grouped sidecars staged and swapped like the
    // flat ones. The two-level build has no k-means refinement (its
    // balance comes from corpus-proportional sizing), so the caller
    // must pin kmeansIters = 0 rather than have a default silently
    // ignored.
    require(!twoLevel || kmeansIters == 0,
      "twoLevel reclustering has no k-means refinement — pass " +
        "kmeansIters = 0")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexMaintenance.recoverOrSweep(fs, root)
    // also heal a corpus-level compaction interrupted before this call
    IndexMaintenance.recoverOrSweep(fs,
      new org.apache.hadoop.fs.Path(root, "corpus"))
    val corpus = spark.read.parquet(s"$path/corpus")
    val layout = detectIvfLayout(corpus.schema.fieldNames.toSeq)
    require(layout != IvfLayout.Int8,
      "reclusterIvfIndex needs the float vectors; the int8 layout " +
        "dropped them at write time, and re-clustering from " +
        "dequantized codes would silently move near-boundary vectors " +
        "between cells — rebuild the index from the source corpus " +
        "instead")
    val old = loadIvfIndex(spark, path, corpus)
    // every eager step (seed collect, k-means rounds, the staged
    // writes) reads the LIVE layout; nothing touches it until the swap
    val idx =
      if (twoLevel)
        buildIvfIndexTwoLevel(corpus.drop("__cell"), old.idCol,
          old.vecCol, nCells)
      else buildIvfIndex(corpus.drop("__cell"), old.idCol,
        old.vecCol, nCells, kmeansIters)
    val stg = IndexMaintenance.stagingOf(root)
    idx.assigned
      .repartitionByRange(nCells * filesPerCell, col("__cell"),
        col(old.idCol))
      .sortWithinPartitions(col("__cell"), col(old.idCol))
      .write.partitionBy("__cell")
      .parquet(new org.apache.hadoop.fs.Path(stg, "corpus").toString)
    writeSidecars(idx,
      new org.apache.hadoop.fs.Path(stg, "centroids").toString,
      new org.apache.hadoop.fs.Path(stg, "l1").toString)
    if (layout == IvfLayout.Pq)
      spark.read.parquet(s"$path/pq").coalesce(1).write
        .parquet(new org.apache.hadoop.fs.Path(stg, "pq").toString)
    IndexMaintenance.swap(fs, root)
  }

  /** The three persisted IVF corpus layouts ([[writeIvfIndex]] float,
    * [[writeIvfInt8Index]], [[writeIvfPqIndex]]) as a closed type, so
    * every consumer that must pick a code path per layout dispatches on
    * ONE definition instead of re-sniffing columns.
    */
  sealed trait IvfLayout
  object IvfLayout {
    case object Float extends IvfLayout
    case object Int8 extends IvfLayout
    case object Pq extends IvfLayout
  }

  /** Which layout lives at `path` — THE single column-sniff
    * ([[appendToIvfIndex]] and the streaming server both dispatch on
    * it): PQ codes beat int8 codes beat plain floats, mirroring what
    * the writers can actually produce.
    */
  def detectIvfLayout(spark: SparkSession, path: String): IvfLayout =
    detectIvfLayout(
      spark.read.parquet(s"$path/corpus").schema.fieldNames.toSeq)

  /** [[detectIvfLayout]] from already-read corpus field names — no
    * second footer/listing round trip when the caller has the schema
    * in hand (an object-store append pays real latency per read).
    */
  def detectIvfLayout(fields: Seq[String]): IvfLayout =
    if (fields.contains(PqCodesCol)) IvfLayout.Pq
    else if (fields.contains(Int8CodesCol)) IvfLayout.Int8
    else IvfLayout.Float

  /** PQ codes column name in a composed IVF×PQ index. */
  val PqCodesCol = "__codes"

  /** Persist an IVF index whose corpus rows ALSO carry their `m`-byte PQ
    * codes — the composed 100 TB serving layout. A query then peels three
    * layers of I/O off the corpus scan: (1) the probe predicate prunes to
    * `nProbe` cells' FILES (partition filter, as [[writeIvfIndex]]);
    * (2) inside those files the ADC stage reads only the id + codes
    * columns — m bytes per row instead of 4·d for the floats (32× at
    * d=64, m=8); (3) only the top-`rerank` ADC survivors' float vectors
    * are ever materialised, for exact rescoring. The codebooks (m·k
    * subvectors, KBs) join the centroids as a second sidecar so the
    * composed index round-trips without external metadata.
    */
  def writeIvfPqIndex(idx: IvfIndex, cb: Pq.PqCodebooks,
      path: String): Unit = {
    val coded = idx.assigned
      .withColumn(PqCodesCol, Pq.encode(cb)(col(idx.vecCol)))
    writeIvfIndex(idx.copy(assigned = coded), path)
    val spark = idx.assigned.sparkSession
    import spark.implicits._
    cb.codebooks.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, code) => (j, code, c) }
    }.toSeq.toDF("j", "code", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/pq")
  }

  /** Load a composed index written by [[writeIvfPqIndex]]: the
    * cell-partitioned corpus (with its `__codes` column) plus the
    * reconstructed codebooks.
    */
  def loadIvfPqIndex(spark: SparkSession,
      path: String): (IvfIndex, Pq.PqCodebooks) =
    (loadIvfIndex(spark, path), loadPqCodebooks(spark, path))

  /** [[loadIvfPqIndex]] with the corpus frame already in hand — see
    * the [[loadIvfIndex]] overload.
    */
  def loadIvfPqIndex(spark: SparkSession, path: String,
      corpus: DataFrame): (IvfIndex, Pq.PqCodebooks) =
    (loadIvfIndex(spark, path, corpus), loadPqCodebooks(spark, path))

  /** Just the PQ codebook sidecar of a [[writeIvfPqIndex]] layout —
    * for callers that need the encoder but not the corpus (the append
    * path), sparing the corpus footer read [[loadIvfPqIndex]] pays.
    */
  def loadPqCodebooks(spark: SparkSession,
      path: String): Pq.PqCodebooks = {
    val rows = spark.read.parquet(s"$path/pq").orderBy("j", "code")
      .collect()
    require(rows.nonEmpty, s"no PQ codebooks found under $path/pq")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * k, s"codebook table has ${rows.length} " +
      s"rows, expected $m x $k")
    val byJc = rows.map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    val cbs = Array.tabulate(m)(j => Array.tabulate(k)(c => byJc((j, c))))
    Pq.PqCodebooks(cbs.head.head.length, cbs)
  }

  /** ANN through a composed IVF×PQ index: prune to the `nProbe` probed
    * cells, rank their rows by the ADC approximate dot, keep the top
    * `rerank` candidates, exact-cosine rescore ONLY those, return the
    * top `k`.
    *
    * Two stages so the float column is never scanned wholesale: the ADC
    * stage projects only (id, codes) — parquet column pruning leaves the
    * float vectors on disk, so the probed-cell scan reads m bytes of
    * codes per row instead of 4·d of floats — and runs EAGERLY (one
    * job) to collect the `rerank` surviving ids. The rerank stage then
    * point-fetches those ids: the `In(id)` predicate is pushed to the
    * parquet source, and [[writeIvfIndex]] lays each cell file out
    * id-sorted, so row-group stats prune the fetch to the few groups
    * holding survivors. (A single lazy plan would be simpler but reads
    * the float column for every probed row — the cost PQ exists to
    * avoid.)
    *
    * Result ties follow [[queryIvf]] (cosine desc, id asc), so with
    * `rerank` ≥ the probed cells' row count the answer EQUALS
    * [[queryIvf]]'s — shrinking `rerank` trades recall for float I/O.
    */
  def queryIvfPq(idx: IvfIndex, cb: Pq.PqCodebooks, query: Seq[Float],
      k: Int, nProbe: Int = 2, rerank: Int = 100): DataFrame = {
    val probes = probeCells(idx, query, nProbe)
    val cells = idx.assigned.filter(probeFilter(probes))
    val surviving = cells
      .select(col(idx.idCol),
        Pq.approxDot(cb, query)(col(PqCodesCol)).as("pq_score"))
      .orderBy(col("pq_score").desc, col(idx.idCol))
      .limit(rerank)
      .select(idx.idCol).collect().map(_.get(0)).toSeq
    cells
      .filter(col(idx.idCol).isInCollection(surviving))
      .withColumn("cosine", cosine(col(idx.vecCol), vecLit(query)))
      .orderBy(col("cosine").desc, col(idx.idCol))
      .limit(k)
      .drop("__cell", PqCodesCol)
  }

  /** Column names of the int8 cell layout ([[writeIvfInt8Index]]). */
  val Int8ScaleCol = "__scale"
  val Int8CodesCol = "__q"

  /** The corpus of `idx` re-expressed in int8 storage: per-row
    * symmetric scale + one signed byte per coordinate, float vectors
    * DROPPED — the 4× cheaper cousin of PQ for mid-accuracy tiers
    * (PQ stores m bytes/vector but needs the floats kept for rerank;
    * int8 stores d bytes + 8 and serves straight from the codes,
    * since dequantize-on-read reconstructs the vector to within
    * scale/2 per coordinate). Cell assignment is computed from the
    * full-precision vectors at build time, so quantization never moves
    * a vector between cells.
    */
  def int8Index(idx: IvfIndex): IvfIndex = {
    val coded = idx.assigned
      .withColumn(Int8ScaleCol, int8Scale(col(idx.vecCol)))
      .withColumn(Int8CodesCol,
        int8Codes(col(idx.vecCol), col(Int8ScaleCol)))
      .drop(idx.vecCol)
    idx.copy(assigned = coded)
  }

  /** Persist an IVF index in the int8 serving layout: the
    * [[int8Index]] corpus PARTITIONED BY `__cell` (same pruning story
    * as [[writeIvfIndex]]) with the centroid sidecar — a probed top-k
    * query reads `nProbe` cells of d-byte codes instead of 4·d floats,
    * and nothing else: there is no second float fetch, because scoring
    * dequantizes in the scan. Load with [[loadIvfIndex]]; query with
    * [[queryIvfInt8]].
    */
  def writeIvfInt8Index(idx: IvfIndex, path: String): Unit =
    writeIvfIndex(int8Index(idx), path)

  /** Top-k through an int8 index: probe `nProbe` cells, score the
    * DEQUANTIZED vectors (`code · scale`, double) by exact cosine in
    * one narrow pass — cosine is scale-invariant, so the only deviation
    * from full-precision scores is the bounded per-coordinate
    * quantization error (≤ scale/2, i.e. ≤ max|x|/254). Ties follow
    * [[queryIvf]] (cosine desc, id asc).
    */
  def queryIvfInt8(idx: IvfIndex, query: Seq[Float], k: Int,
      nProbe: Int = 2): DataFrame = {
    val probes = probeCells(idx, query, nProbe)
    // cosine() handles the mixed shape natively: the dequantized side is
    // array<double>, the query literal array<float> — the codegen'd
    // cosine_sim widens per element exactly like the portable fold
    idx.assigned
      .filter(probeFilter(probes))
      .withColumn("cosine",
        cosine(dequantize(col(Int8CodesCol), col(Int8ScaleCol)),
          vecLit(query)))
      .orderBy(col("cosine").desc, col(idx.idCol))
      .limit(k)
      .drop("__cell", Int8ScaleCol, Int8CodesCol)
  }

  /** Batch ANN through a composed IVF×PQ index: a whole DataFrame of
    * queries resolved against the coded corpus in ONE distributed plan —
    * the actual 100 TB serving shape, where [[queryIvfPq]]'s per-query
    * driver collect would serialize the query set.
    *
    * Stages, all in a single lazy plan:
    *  1. each query row computes its `nProbe` probe cells from the
    *     broadcast centroid literals AND its m×k ADC lookup table (the
    *     per-subspace query·centroid dots, O(m·k·subDim) per QUERY row,
    *     once — never per candidate), then explodes to (query, probe);
    *  2. the probe equi-joins the corpus's `__cell` column projected to
    *     (id, cell, codes) ONLY — on a [[writeIvfPqIndex]] layout the
    *     cell predicate prunes partitions and column pruning leaves the
    *     float vectors on disk, so the candidate scan reads m bytes of
    *     codes per row; ADC per candidate is m `element_at` lookups +
    *     adds into the query's LUT;
    *  3. a window over the HIGH-cardinality query id keeps the top
    *     `rerank` ADC candidates per query (each partition is one
    *     query's ≤ nProbe cells, never a giant partition);
    *  4. survivors re-join the query vectors (thin — `rerank` rows per
    *     query) and the corpus floats on (`__cell`, id), so only
    *     survivors' float vectors materialise and the join still prunes
    *     to probed cells; exact cosine + a top-`k` window finish.
    *
    * Tie rules match [[queryIvfPq]] / [[queryIvfBatch]] exactly (probe
    * ties toward the lower cell, ADC cut and result ties toward the
    * lower corpus id), and the LUT fold is element-order double math —
    * so on a single query this EQUALS [[queryIvfPq]], and with `rerank`
    * ≥ the probed cells' row count it equals [[queryIvfBatch]].
    *
    * NOTE: like [[queryIvfBatch]], the call runs a small eager job (the
    * query-projection checkpoint) before returning the lazy result
    * frame; corpus pruning rides inside it via [[probedCellScan]].
    *
    * Output: query id (as `qIdCol`), all corpus columns except the
    * internals (`__cell`, codes), `pq_score` of the survivor, `cosine`.
    */
  def queryIvfPqBatch(idx: IvfIndex, cb: Pq.PqCodebooks,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      nProbe: Int = 2, rerank: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = pinnedQueryFrame(queries, qIdCol, qVecCol)
    // probe selection shared with ivfBatchPlan — ONE definition of the
    // probe tie rule, so the 'equals queryIvfBatch at full rerank'
    // invariant cannot silently drift
    val probes = probeCellsExpr(idx, nProbe)
    // the query's ADC lookup table: lut[j][c] = ⟨query_j, centroid_{j,c}⟩
    // as ONE jitted closure over the codebook matrix — bit-identical to
    // Pq.approxDot's driver-side LUT (same ops, same left-to-right
    // order from 0.0) so single-query results match queryIvfPq. This
    // was m·k inline HOF folds with literal centroids — the same
    // JIT-cliff shape centroidScan/probeCellsExpr replaced: generated
    // code linear in m·k·subDim that de-JITs whatever stage it fuses
    // into and caps the codebook size.
    val lut = {
      val m = cb.m; val subDim = cb.subDim
      val books: Array[Array[Array[Float]]] =
        cb.codebooks.map(_.map(_.toArray).toArray)
      val f = udf { (v: Seq[Float]) =>
        if (v == null) None
        else {
          // fail-fast on a codebook/query dim mismatch, matching
          // Pq.approxDot's require — a silent min() truncation here
          // would rank candidates by prefix/zero dots and return
          // plausible-looking wrong neighbors
          require(v.length == m * subDim,
            s"query dim ${v.length} != codebook dim ${m * subDim} " +
              s"(m=$m x subDim=$subDim)")
          Some((0 until m).map { j =>
            books(j).toIndexedSeq.map { c =>
              var dp = 0.0
              var i = 0
              while (i < c.length) {
                dp += v(j * subDim + i).toDouble * c(i).toDouble
                i += 1
              }
              dp
            }
          })
        }
      }
      f(col("__qv"))
    }
    val probed = q
      .withColumn("__lut", lut)
      .withColumn("__probe", explode(probes))
      .select("__qid", "__lut", "__probe")
    // the probed-cell semi-join prunes BOTH corpus scans at the source
    // (one broadcast of the distinct cell ids, reused by the exchange
    // reuse rule and by dynamic partition pruning) — see probedCellScan
    val cellsDf = q.select(explode(probes).as("__probe"))
    // candidate scan: (id, cell, codes) only — floats stay on disk
    val candidates = probed.join(
      probedCellScan(idx.assigned, cellsDf)
        .select(col(idx.idCol), col("__cell"), col(PqCodesCol)),
      col("__probe") === col("__cell"))
    val adc = (0 until cb.m).map { j =>
      element_at(element_at(col("__lut"), j + 1),
        element_at(col(PqCodesCol), j + 1).cast("int") + 1)
    }.reduce(_ + _)
    val wAdc = Window.partitionBy("__qid")
      .orderBy(col("pq_score").desc, col(idx.idCol))
    val survivors = candidates
      .withColumn("pq_score", adc)
      .withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= rerank)
      .select(col("__qid"), col("__cell"), col(idx.idCol),
        col("pq_score"))
    // rerank: only survivors' floats are read; the (__cell, id) join key
    // keeps partition pruning AND row-group id-stat pruning on the
    // id-sorted cell layout
    val wK = Window.partitionBy("__qid")
      .orderBy(col("cosine").desc, col(idx.idCol))
    survivors
      .join(q, "__qid")
      .join(probedCellScan(idx.assigned, cellsDf)
        .drop(PqCodesCol), Seq("__cell", idx.idCol))
      .withColumn("cosine", cosine(col(idx.vecCol), col("__qv")))
      .withColumn("__rnk", row_number().over(wK))
      .filter(col("__rnk") <= k)
      .select((col("__qid").as(qIdCol) +:
        idx.assigned.columns
          .filterNot(c => c == "__cell" || c == PqCodesCol).map(col) :+
        col("pq_score") :+ col("cosine")).toIndexedSeq: _*)
  }

  /** Embedding near-duplicate pairs: banded candidates + exact cosine ≥
    * threshold. No stage is quadratic in the corpus: with `bitsPerBand`
    * = 8 a band has 256 buckets, so expected bucket size — and with it the
    * candidate volume — stays linear in the corpus for sign-uniform data;
    * wider bands trade recall for an even tighter candidate bound.
    */
  def nearDuplicateVectors(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBands: Int = 8, bitsPerBand: Int = 8): DataFrame = {
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    signBandCandidates(df, idCol, vecCol, nBands, bitsPerBand)
      .join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
