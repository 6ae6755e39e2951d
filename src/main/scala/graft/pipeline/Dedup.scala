package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (content-hash
  * groupBy), MinHash+LSH near-dup (banded bucket join — never an all-pairs
  * cross join), and n-gram Jaccard verification.
  *
  * Scale shape, designed for ~100 TB corpora on 1000 executors:
  *  - exact dedup = one hash-partitioned aggregate on a 32-char digest;
  *  - near dedup = explode to (doc, shingle) [narrow] → per-doc signature
  *    aggregate [1 shuffle on doc id] → band explode [narrow] → self-join on
  *    (band, signature) [1 shuffle on band sig; bucket sizes are bounded
  *    because equal signatures are rare for non-duplicates] → exact Jaccard
  *    verify restricted to the candidate pairs [joins against the shingle
  *    table, proportional to candidates, not to n²].
  *
  * Hashes are md5 strings so that an ANSI-SQL oracle can re-derive every
  * intermediate value; `xxhash64` is the drop-in for ~10× cheaper
  * production runs (see [[TextOps.simHash64]] for the pattern).
  */
object Dedup {

  /** Per-thread MD5 instance for hot per-row closures: MessageDigest
    * is not thread-safe and `getInstance` per row is the scratch-
    * allocation pattern that makes wall time GC-topology-sensitive
    * (the `Linkage.Scratch` lesson); `digest()` resets the instance,
    * so each row starts clean. Lives on the object, so each executor
    * JVM materializes it lazily — nothing is serialized.
    */
  private val md5Holder: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** What an against-index probe does when a probed cell's LANDED
    * population exceeds `maxCell` (the quadratic-cell guard of the
    * SemDeDup family).
    *
    *  - [[HotCellPolicy.Fail]] — throw. The batch posture: a job stops,
    *    the operator re-runs after the index is re-clustered; nothing
    *    lands under-deduplicated.
    *  - [[HotCellPolicy.Skip]] — skip the dedup CHECK for rows probing
    *    a hot cell: they pass through unfiltered and the skipped cells
    *    are logged loudly with their populations. The STREAMING
    *    posture (mirroring `ivfServeStream`'s `dropMalformed`): a
    *    throw inside `foreachBatch` replays the same micro-batch from
    *    the checkpoint and throws again, forever, and the remedy —
    *    re-clustering the index — cannot be performed from inside a
    *    wedged stream. Under-dedup of a few rows, surfaced and
    *    repairable by the next batch re-cluster, beats wedged ingest.
    */
  sealed trait HotCellPolicy
  object HotCellPolicy {
    /** Throw on a hot probed cell (the batch default). */
    case object Fail extends HotCellPolicy
    /** Pass rows probing a hot cell through unchecked, log the cells
      * (the streaming default — see [[graft.streaming.StreamMask
      * .semDeDupStream]]).
      */
    case object Skip extends HotCellPolicy
  }

  /** Content hash of the normalized document text. */
  def contentHash(text: Column): Column = md5(TextOps.normalize(text))

  /** Exact-duplicate groups: one row per distinct content, with the number
    * of copies and the survivor id (min). The full dedup decision table —
    * join survivors back or anti-join the rest to materialise the deduped
    * corpus.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), contentHash(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** The deduplicated corpus: keeps exactly the survivor row of every
    * exact-duplicate group (no global window — groupBy + semi join; the
    * final distinct collapses literal row copies that share the survivor
    * id, and only runs over the already-thinned survivors).
    */
  def dropExactDuplicates(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol)
      .select(col("content_hash"), col("keep_id"))
    df.withColumn("__graft_h", contentHash(col(textCol)))
      .join(keep, col("__graft_h") === keep("content_hash") &&
        df(idCol) === keep("keep_id"), "left_semi")
      .drop("__graft_h")
      .distinct()
  }

  /** [[dropExactDuplicates]] with the QUALITY-aware survivor policy —
    * [[dropNearDuplicatesKeepBest]]'s rule for EXACT groups: each
    * content-hash group keeps its highest-`score` member, ties to the
    * lower id. Exact copies share identical normalized text, so a
    * text-DERIVED quality score always ties (degenerating to min-id);
    * the score that makes this operator meaningful is an EXTERNAL
    * signal — source priority, crawl recency, license class ("keep
    * the canonical mirror's copy"). Null scores never win; a group
    * whose EVERY score is null falls back to the min-id survivor
    * (vanishing would silently delete unique content on a scoring
    * outage). Shape: two thin hash-group aggregates + one semi join —
    * no global window, nothing corpus-bounded on the driver.
    */
  def dropExactDuplicatesKeepBest(df: DataFrame, idCol: String,
      textCol: String, score: Column): DataFrame = {
    val scored = df.select(col(idCol).as("id"),
      contentHash(col(textCol)).as("__h"), score.cast("double").as("__s"))
    val best = scored.groupBy("__h").agg(max("__s").as("__m"))
    val keepBest = scored.join(best, "__h")
      .filter(col("__s") === col("__m"))
      .groupBy("__h").agg(min("id").as("__kb"))
    val keep = scored.groupBy("__h").agg(min("id").as("__fallback"))
      .join(keepBest, Seq("__h"), "left")
      .select(col("__h"),
        coalesce(col("__kb"), col("__fallback")).as("keep_id"))
    df.withColumn("__graft_h", contentHash(col(textCol)))
      .join(keep, col("__graft_h") === keep("__h") &&
        df(idCol) === keep("keep_id"), "left_semi")
      .drop("__graft_h")
      .distinct()
  }

  /** Distinct (id, shingle) pairs — delegates to the shared builder
    * ([[TextOps.explodedShingles]]) so the fingerprint sketch and the
    * dedup pipeline can never drift apart on shingle semantics.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    TextOps.explodedShingles(df, idCol, textCol, shingleK)

  /** Per-document MinHash signature: `numHashes` columns `h0..h{n-1}`,
    * h_i = min over shingles of md5("<i>|" + shingle). One shuffle
    * (groupBy id with map-side partial min).
    */
  def minHashSignatures(sh: DataFrame, idCol: String,
      numHashes: Int): DataFrame =
    sh.groupBy(col(idCol))
      .agg(
        min(md5(concat(lit("0|"), col("shingle")))).as("h0"),
        (1 until numHashes).map(i =>
          min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"h$i")): _*)

  /** Production MinHash signatures: `xxhash64(i, shingle)` instead of the
    * md5-string derivation — same shape (one map-side-combined min
    * aggregate), ~10× less hash CPU and 8-byte signature members instead
    * of 32-char strings, at the cost of oracle portability (the ANSI
    * oracle can't re-derive xxhash64). Same banding/verify downstream:
    * [[lshCandidates]] is hash-family-agnostic since the band signature
    * is structural.
    */
  def minHashSignatures64(sh: DataFrame, idCol: String,
      numHashes: Int): DataFrame =
    sh.groupBy(col(idCol))
      .agg(
        min(xxhash64(lit(0), col("shingle"))).as("h0"),
        (1 until numHashes).map(i =>
          min(xxhash64(lit(i), col("shingle"))).as(s"h$i")): _*)

  /** [[nearDuplicatePairs]] on the xxhash64 production signatures — the
    * path to run at 100 TB; the md5 variant exists to stay oracle-exact.
    */
  def nearDuplicatePairs64(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 8, rowsPerBand: Int = 2,
      shingleK: Int = 3, maxBucket: Option[Int] = None): DataFrame =
    nearPairsFromSets(
      shingleSetsWithSigs(df, idCol, textCol, shingleK, numHashes,
        hash64 = true),
      idCol, threshold, numHashes, rowsPerBand, maxBucket)

  /** Banded LSH candidate pairs from signatures: concatenate `rowsPerBand`
    * consecutive hashes into a band signature, explode to (band, sig), and
    * self-join on equality — the bucket join that replaces the n² scan.
    * Returns distinct (id_a, id_b) with id_a < id_b.
    *
    * @param maxBucket optional skew guard (mirrors
    *   [[Similarity.signBandCandidates]]): band buckets larger than this
    *   are dropped before the self-join. A boilerplate-heavy corpus (empty
    *   docs, licence headers) concentrates one band signature, and that
    *   bucket's pair count is quadratic in its size — the one way this
    *   plan degenerates at scale. Standard LSH practice is to skip such
    *   buckets: their members are caught by their other bands or are
    *   degenerate duplicates better handled by exact dedup. `None`
    *   (default) keeps the historical exact-recall behavior.
    */
  /** (id, band, sig) rows of a signature frame — the banded form behind
    * [[lshCandidates]] and the incremental-index family. The band
    * signature is a STRUCT of the band's hash columns: equality on the
    * struct is equality on every member, works for md5 strings and
    * xxhash64 longs alike, and skips a string concat per band.
    */
  private[graft] def bandedSigs(sigs: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val nBands = numHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        struct((0 until rowsPerBand)
          .map(r => col(s"h${b * rowsPerBand + r}").as(s"m$r")): _*).as("sig"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def lshCandidates(sigs: DataFrame, idCol: String, numHashes: Int,
      rowsPerBand: Int, maxBucket: Option[Int] = None): DataFrame = {
    val bands = bandedSigs(sigs, idCol, numHashes, rowsPerBand)
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
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact n-gram Jaccard for a set of candidate pairs: joins each side of
    * the pair against the shingle table, counts the intersection, and
    * derives |A ∪ B| = |A| + |B| − |A ∩ B|. Cost ∝ candidates, not n².
    */
  def jaccardVerify(pairs: DataFrame, sh: DataFrame,
      idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val shA = sh.select(col(idCol).as("id_a"), col("shingle"))
    val shB = sh.select(col(idCol).as("id_b"), col("shingle"))
    val inter = pairs
      .join(shA, "id_a")
      .join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_inter")))
  }

  /** Per-doc shingle SET + MinHash signature in ONE aggregate — the
    * shared frame behind [[nearDuplicatePairs]]/[[nearDuplicatePairs64]].
    * The former pipeline consumed the exploded (id, shingle) table FOUR
    * times (signature aggregate, both sides of the intersection join,
    * the size aggregate), which meant four full-table exchanges and —
    * where exchange reuse missed — four executions of the upstream
    * scan/quality/PII/tokenize subtree. Collecting each doc's distinct
    * shingles alongside the h0..h{n-1} mins folds all of it into one
    * exchange: signatures and |set| are columns of this frame, and the
    * Jaccard verify is `size(array_intersect(...))` over two thin
    * id-keyed joins. Values are unchanged — min is associative (the
    * map-side partial min over raw multiplicity rows equals the min
    * over the distinct set) and `collect_set` IS the distinct shingle
    * set. Per-row state is bounded by the doc's own shingle count, so
    * the shape holds at 100 TB.
    */
  private def shingleSetsWithSigs(df: DataFrame, idCol: String,
      textCol: String, shingleK: Int, numHashes: Int,
      hash64: Boolean): DataFrame = {
    def h(i: Int): Column =
      if (hash64) xxhash64(lit(i), col("shingle"))
      else md5(concat(lit(s"$i|"), col("shingle")))
    TextOps.explodedShinglesRaw(df, idCol, textCol, shingleK)
      .groupBy(col(idCol))
      .agg(collect_set(col("shingle")).as("__shs"),
        (0 until numHashes).map(i => min(h(i)).as(s"h$i")): _*)
  }

  /** The banded-LSH candidate → exact-Jaccard tail shared by the two
    * near-dup entry points, over a [[shingleSetsWithSigs]] frame.
    */
  private def nearPairsFromSets(sets: DataFrame, idCol: String,
      threshold: Double, numHashes: Int, rowsPerBand: Int,
      maxBucket: Option[Int]): DataFrame = {
    val sigs = sets.select(col(idCol) +:
      (0 until numHashes).map(i => col(s"h$i")): _*)
    val cands = lshCandidates(sigs, idCol, numHashes, rowsPerBand,
      maxBucket)
    cands
      .join(sets.select(col(idCol).as("id_a"), col("__shs").as("__sa"),
        size(col("__shs")).cast("long").as("sz_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__shs").as("__sb"),
        size(col("__shs")).cast("long").as("sz_b")), "id_b")
      .withColumn("n_inter",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_inter", "jaccard")
  }

  /** End-to-end near-duplicate pairs: shingle → MinHash → banded LSH →
    * exact-Jaccard verify ≥ `threshold`. The returned plan contains no
    * cartesian product at any stage, and the corpus-sized shingle data
    * crosses exactly ONE exchange ([[shingleSetsWithSigs]]).
    */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 8, rowsPerBand: Int = 2,
      shingleK: Int = 3, maxBucket: Option[Int] = None): DataFrame =
    nearPairsFromSets(
      shingleSetsWithSigs(df, idCol, textCol, shingleK, numHashes,
        hash64 = false),
      idCol, threshold, numHashes, rowsPerBand, maxBucket)

  /** The near-deduplicated corpus in one call: near-dup pairs →
    * connected components → keep each cluster's min-id row, drop every
    * other cluster member. Documents in no near-dup pair pass through
    * untouched (left-anti against the drop set — the drop set is tiny
    * relative to the corpus, so the anti join's build side is the thin
    * one). The composition [[nearDuplicatePairs]] ∘
    * [[connectedComponents]] is what a curation run actually executes.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 8, rowsPerBand: Int = 2,
      shingleK: Int = 3, maxBucket: Option[Int] = None): DataFrame = {
    val pairs = nearDuplicatePairs(df, idCol, textCol, threshold,
      numHashes, rowsPerBand, shingleK, maxBucket).select("id_a", "id_b")
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** [[dropNearDuplicates]] with a QUALITY-aware survivor policy: each
    * near-dup cluster keeps its highest-`scoreCol` member (ties toward
    * the lower id) instead of blindly the min-id one — the production
    * dedup knob when a quality signal exists (keep the cleanest copy of
    * a template, not the first-crawled one). Shape: the cluster frame
    * joins back only the (id, score) projection, a per-cluster `max_by`
    * struct aggregate picks the survivor, and the corpus anti-joins the
    * loser set — the extra cost over min-id survivors is one thin
    * aggregate over cluster members (tiny relative to the corpus).
    */
  def dropNearDuplicatesKeepBest(df: DataFrame, idCol: String,
      textCol: String, scoreCol: String, threshold: Double = 0.8,
      numHashes: Int = 8, rowsPerBand: Int = 2, shingleK: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    val pairs = nearDuplicatePairs(df, idCol, textCol, threshold,
      numHashes, rowsPerBand, shingleK, maxBucket).select("id_a", "id_b")
    val members = connectedComponents(pairs)
      .join(df.select(col(idCol).as("id"), col(scoreCol).as("__s")), "id")
    // two thin aggregates instead of a struct-max with a negated id:
    // the tie-break must stay type-generic (string/uuid ids negate to
    // null and would silently drop whole clusters), so take the max
    // score per cluster, then the MIN id among the members achieving it
    val top = members.groupBy("cluster_id").agg(max("__s").as("__m"))
    val keep = members.join(top, "cluster_id")
      .filter(col("__s") === col("__m"))
      .groupBy("cluster_id").agg(min("id").as("id"))
      .select("id")
    val drop = members.select("id")
      .join(keep, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC near-dup
    * pairs over an embedding column — duplicates by MEANING (template
    * variants, paraphrases, re-renderings) that can share no n-grams at
    * all and therefore slip every text-hash family above. The published
    * recipe: cluster the embeddings into cells, compare pairs only
    * WITHIN a cell, and flag pairs whose cosine clears `threshold`.
    *
    * The cell pass reuses [[Similarity.buildIvfIndex]]'s coarse
    * quantizer (deterministic lowest-id seeds; `kmeansIters` rounds of
    * spherical k-means when cell balance matters more than
    * bit-reproducibility), so the SAME quantizer serves ANN queries and
    * semantic dedup. Returns (`cell`, `id_a`, `id_b`, `cosine`),
    * id_a < id_b, each pair once (cells partition the corpus, so a
    * pair can only meet in one cell).
    *
    * Scale shape: ONE equi-join on the cell id — pair work is
    * Σ(cellᵢ²)/2, and the paper's operating regime (nCells grown with
    * the corpus so cells stay ~constant-sized) keeps that LINEAR in
    * corpus size; never an all-pairs join. `maxCell` fails LOUDLY when
    * a cell exceeds the bound: silently skipping an oversized cell (the
    * LSH `maxBucket` convention) would under-dedup the densest region,
    * which is exactly where semantic duplicates concentrate — the fix
    * is more cells or more k-means rounds, and the error says so.
    */
  def semDeDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, kmeansIters: Int = 0,
      maxCell: Option[Int] = None): DataFrame =
    semPairsFromIndex(Similarity.buildIvfIndex(
      df.select(col(idCol), col(vecCol)), idCol, vecCol, nCells,
      kmeansIters), threshold, maxCell)

  private def semPairsFromIndex(idx: Similarity.IvfIndex,
      threshold: Double, maxCell: Option[Int]): DataFrame = {
    maxCell.foreach { m =>
      idx.assigned.groupBy("__cell").agg(count(lit(1)).as("n"))
        .filter(col("n") > m).orderBy(col("n").desc).head(1)
        .foreach(r => throw new IllegalArgumentException(
          s"semDeDup cell ${r.getInt(0)} holds ${r.getLong(1)} vectors " +
            s"(> maxCell = $m) — the within-cell pair work would " +
            "explode quadratically there; raise nCells (or kmeansIters) " +
            "until cells are bounded"))
    }
    val a = idx.assigned.select(col("__cell").as("cell"),
      col(idx.idCol).as("id_a"), col(idx.vecCol).as("__va"))
    val b = idx.assigned.select(col("__cell").as("cell"),
      col(idx.idCol).as("id_b"), col(idx.vecCol).as("__vb"))
    a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("cell", "id_a", "id_b", "cosine")
  }

  /** Production sizing for the SemDeDup quantizer — the helper that
    * closes the "nCells grows with the corpus" scale contract (the
    * pair work is Σcellᵢ²/2, linear only while cells stay
    * ~constant-sized): nCells = ⌈n / targetCell⌉ from ONE count
    * aggregate over `df`. A plain `count()` rather than an approximate
    * sketch on purpose: on a raw parquet scan Spark answers it from
    * footer metadata, on a derived frame it is one narrow pass — and
    * the result is DETERMINISTIC, so a sized run (and its oracle) is
    * reproducible, which a sampled estimate would break; any nCells
    * within a small factor of the target keeps the pair work linear,
    * so there is nothing for an approximation to buy.
    */
  def semDeDupAutoCells(df: DataFrame, targetCell: Int = 4096): Int = {
    require(targetCell > 0, s"targetCell must be > 0, got $targetCell")
    val n = df.count()
    math.max(1, ((n + targetCell - 1) / targetCell).toInt)
  }

  /** [[semDeDup]] with the quantizer SIZED from the corpus
    * ([[semDeDupAutoCells]]) instead of a hand-picked nCells: at 100×
    * the corpus the cell count grows 100×, per-cell pair work stays
    * ~flat, and `kmeansIters` defaults > 0 because at auto-sized cell
    * counts cell BALANCE (what bounds the worst cell, and with it
    * `maxCell` headroom) matters more than the bit-reproducibility of
    * the raw lowest-id seeds — pass 0 to pin the oracle path. Pairs
    * naturally with a `maxCell` of a small multiple of `targetCell`:
    * under auto-sizing an over-target cell is genuine skew, not
    * mis-sizing.
    *
    * SCALE CAVEAT (the 10× rehearsal's find): this form keeps the
    * FLAT argmax assignment, O(n · nCells · dim) — with nCells ∝ n
    * that is quadratic in the corpus (measured 14.8× at 10×). It is
    * the exact-assignment choice for corpora where nCells stays in
    * the hundreds; at genuinely corpus-proportional cell counts use
    * [[semDeDupTwoLevel]], whose grouped assignment is linear
    * (measured 1.7× at the same 10×).
    */
  def semDeDupAuto(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, targetCell: Int = 4096, kmeansIters: Int = 2,
      maxCell: Option[Int] = None): DataFrame =
    semDeDup(df, idCol, vecCol, threshold,
      nCells = semDeDupAutoCells(df, targetCell), kmeansIters = kmeansIters,
      maxCell = maxCell)

  /** [[semDeDup]] over the TWO-LEVEL quantizer
    * ([[Similarity.buildIvfIndexTwoLevel]]) — the assignment shape that
    * keeps the AUTO-SIZED transform linear. [[semDeDupAuto]]'s flat
    * assignment is O(n · nCells · dim); with nCells ∝ n that is
    * QUADRATIC — the 10× rehearsal measured the flat auto row at
    * 14.8×, assignment-bound, while every linear family held 2–3×.
    * Routing assignment through ⌈√nCells⌉ level-1 groups cuts per-row
    * work to O(√nCells · dim), restoring linear total work at any
    * corpus-proportional cell count.
    *
    * The trade (the reason BOTH entry points exist): two-level
    * assignment is approximate near group boundaries, so a
    * near-boundary duplicate pair can land in different cells and be
    * missed — acceptable for dedup (SemDeDup is itself a
    * recall/cost trade via nCells) and QUANTIFIED by the
    * `q_ann_recall_2l` audit (grouped vs flat at the same cell count
    * and probe budget against one brute-force exact side; ~0–0.2
    * recall@5 delta per query on the fixtures); [[semDeDupAuto]]
    * remains the exact-assignment form for hand-sized cell counts. Survivors rank on the cosine to the
    * ASSIGNED cell's centroid ([[Similarity.centroidCosAt]]) — under
    * group-restricted assignment the global [[Similarity
    * .maxCentroidCos]] could score a cell the row doesn't live in.
    * Deterministic end to end (seed cuts and tie rules pinned), so
    * `q_semdedup_2l` replays the whole chain in DuckDB.
    */
  def semDeDupTwoLevel(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, targetCell: Int = 4096,
      maxCell: Option[Int] = None): DataFrame = {
    val idx = Similarity.buildIvfIndexTwoLevel(
      df.select(col(idCol), col(vecCol)), idCol, vecCol,
      semDeDupAutoCells(df, targetCell))
    semSurvivors(df, idCol,
      semPairsFromIndex(idx, threshold, maxCell),
      idx.assigned.select(col(idx.idCol).as("id"),
        col(idx.vecCol), col("__cell")),
      Similarity.centroidCosAt(idx.vecCol, "__cell", idx.centroids))
  }

  /** The SemDeDup SURVIVOR rule over a pair graph — ONE definition
    * shared by [[semDeDup]] and [[semDeDupTwoLevel]] (which differ
    * only in the quantizer and the prototypicality `score`), and the
    * single Scala mirror of the oracle's `semSurvivorCtes`: connected
    * components over the pairs, each component keeping its
    * LOWEST-score member (ties to the lower id — the
    * least-prototypical copy carries the most information), everyone
    * else anti-joined out of `df`. `memberSrc` must expose `id` plus
    * whatever columns `score` reads; components join it THIN (duplicate
    * candidates only), so the scoring scan runs over member rows, not
    * the corpus a second time.
    */
  private def semSurvivors(df: DataFrame, idCol: String,
      pairGraph: DataFrame, memberSrc: DataFrame, score: Column,
      keepHighest: Boolean = false): DataFrame = {
    val members = connectedComponents(pairGraph.select("id_a", "id_b"))
      .join(memberSrc, "id")
      .withColumn("__c", score)
      .select("id", "cluster_id", "__c")
    val goal = members.groupBy("cluster_id")
      .agg((if (keepHighest) max("__c") else min("__c")).as("__m"))
    val keep = members.join(goal, "cluster_id")
      .filter(col("__c") === col("__m"))
      .groupBy("cluster_id").agg(min("id").as("id"))
      .select("id")
    val drop = members.select("id").join(keep, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** [[semDeDup]] with the QUALITY-aware survivor policy — the
    * [[dropNearDuplicatesKeepBest]] analog for SEMANTIC clusters: each
    * component keeps its highest-`scoreCol` member (ties toward the
    * lower id) instead of the paper's least-prototypical one. The
    * paper's rule optimises for DIVERSITY of the retained set; when a
    * quality signal exists, production dedup usually wants the
    * CLEANEST copy of each meaning instead (keep the well-formatted
    * original, drop the boilerplate-wrapped re-render) — same pair
    * graph, same component machinery, opposite survivor goal. As in
    * [[dropNearDuplicatesKeepBest]], a null score never wins (the max
    * ignores it); documents in no pair pass through untouched. Cost
    * over [[semDeDup]]: nothing — the prototypicality scan is replaced
    * by a thin (id, score) projection of `df` itself.
    */
  def semDeDupKeepBest(df: DataFrame, idCol: String, vecCol: String,
      scoreCol: String, threshold: Double, nCells: Int = 16,
      kmeansIters: Int = 0, maxCell: Option[Int] = None): DataFrame = {
    val idx = Similarity.buildIvfIndex(
      df.select(col(idCol), col(vecCol)), idCol, vecCol, nCells,
      kmeansIters)
    semSurvivors(df, idCol,
      semPairsFromIndex(idx, threshold, maxCell),
      df.select(col(idCol).as("id"), col(scoreCol)),
      col(scoreCol), keepHighest = true)
  }

  /** Incremental SemDeDup — [[semDeDupPairs]]'s AGAINST-INDEX form, the
    * ingest-time question "is this new document semantically a
    * duplicate of anything already landed?" answered without
    * recomputing the corpus (the [[nearDupPairsAgainstIndex]] pattern
    * for embeddings): batch vectors take argmax cells under the
    * index's FROZEN centroids ([[Similarity.assignCells]], the same
    * rule `appendToIvfIndex` lands rows with, so probe cells always
    * match landed cells), and each batch vector scores only against
    * the corpus rows of its own cell. Returns (`cell`, `id_a` corpus,
    * `id_b` batch, `cosine`), cosine ≥ `threshold`.
    *
    * Scale shape: the batch side collapses to its distinct probed
    * cells (≤ nCentroids, collected once from the checkpointed thin
    * batch projection — the batch frame may be non-deterministic and
    * is materialised exactly once) and the corpus scan FILTERS on
    * those cells first — on a [[Similarity.loadIvfIndex]] layout that
    * is parquet partition pruning, so an ingest probe reads only the
    * cells its batch touches regardless of corpus size. The join is
    * the cell equi-join again, never corpus-wide. `maxCell` bounds the
    * CORPUS side of the probed cells, as [[semDeDupPairs]]' guard does
    * — a batch probing a runaway-hot landed cell fails loudly by
    * default (the remedy is re-clustering / compaction with more
    * cells) instead of silently stalling every ingest trigger on a
    * quadratic cell; `onHotCell` picks the posture ([[HotCellPolicy]])
    * when failing is worse than under-checking, i.e. inside a stream.
    */
  def semDeDupPairsAgainstIndex(idx: Similarity.IvfIndex,
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxCell: Option[Int] = None,
      onHotCell: HotCellPolicy = HotCellPolicy.Fail): DataFrame = {
    // pinned (not a bare localCheckpoint): the blocks register in the
    // shared query-pin machinery, so a long-running consumer drains
    // each batch's pins via Similarity.withQueryPinScope exactly as the
    // batch-ANN probes do
    // null-embedding batch rows assign a null cell (centroidScan's
    // contract): they can be semantic duplicates of nothing, so they
    // drop out of the pair probe here — and survive semDeDupFilterBatch
    // untouched, matching the self-join form's tolerance — instead of
    // NPE-ing the cell scan (which would kill a long-running
    // semDeDupStream on one malformed row)
    val b = Similarity.pinnedFrame(Similarity.assignCells(idx,
        batch.select(col(idCol), col(vecCol)), vecCol)
      .filter(col("__cell").isNotNull)
      .select(col("__cell").as("cell"), col(idCol).as("id_b"),
        col(vecCol).as("__vb")))
    // the corpus restricted to the batch's probed cells — a broadcast
    // semi-join on the pinned batch's distinct cells, partition-pruned
    // at runtime on a loadIvfIndex layout (probedCellScan), replacing
    // the collected inline-literal IN whose tree grew with the probed
    // set under the "nCells ∝ corpus" contract
    val probedCorpus =
      Similarity.probedCellScan(idx.assigned, b.select("cell"))
    // hot-cell guard (opt-in): the probed cells whose LANDED population
    // exceeds maxCell — each would make every batch probing it pay a
    // quadratic cell. Eager and bounded: only over-threshold cells (a
    // pathology, not a population) come back to the driver.
    val hot: Array[(Int, Long)] = maxCell match {
      case Some(m) =>
        probedCorpus.groupBy("__cell").agg(count(lit(1)).as("n"))
          .filter(col("n") > m).orderBy(col("n").desc)
          .collect().map(r => (r.getInt(0), r.getLong(1)))
      case None => Array.empty
    }
    if (hot.nonEmpty) onHotCell match {
      case HotCellPolicy.Fail =>
        val (c, n) = hot.head
        throw new IllegalArgumentException(
          s"semDeDup probed cell $c holds $n landed vectors " +
            s"(> maxCell = ${maxCell.get}) — every ingest batch " +
            "probing it would pay a quadratic cell; re-cluster the " +
            "index with more cells (Similarity.reclusterIvfIndex, " +
            "nCells from Dedup.semDeDupAutoCells)")
      case HotCellPolicy.Skip =>
        log.warn("semDeDup: SKIPPING the dedup check for {} hot " +
          "cell(s) over maxCell = {} — {}; batch rows probing them " +
          "pass through UNCHECKED (possible under-dedup) until the " +
          "index is re-clustered with more cells " +
          "(Similarity.reclusterIvfIndex)",
          hot.length, maxCell.get,
          hot.map { case (c, n) => s"cell $c: $n landed" }
            .mkString(", "))
    }
    val checked =
      if (hot.isEmpty) probedCorpus
      // hot set: a handful of pathological cells, never a population —
      // the literal stays bounded
      else probedCorpus
        .filter(!col("__cell").isInCollection(hot.map(_._1).toSeq))
    val a = checked
      .select(col("__cell").as("cell"), col(idx.idCol).as("id_a"),
        col(idx.vecCol).as("__va"))
    a.join(b, "cell")
      .withColumn("cosine", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("cell", "id_a", "id_b", "cosine")
  }

  /** The ingest DECISION over [[semDeDupPairsAgainstIndex]]: the batch
    * with every semantic duplicate of the landed corpus REMOVED — the
    * keep-the-corpus policy (the landed copy always wins; ingest
    * filtering must not destabilise what previous runs already
    * published, mirroring the text-side incremental dedup contract).
    * Survivors are then safe to [[Similarity.appendToIvfIndex]].
    *
    * The batch is pinned ONCE up front ([[Similarity.pinnedFrame]],
    * full rows — the survivors carry every column) and both the pair
    * probe and the anti-join read that snapshot: a non-deterministic
    * batch frame (sample(), rand(), an unstable view) scores and
    * filters the SAME rows, and the batch source is read once, not
    * twice. The probe's internal thin pin re-reads the snapshot's
    * blocks, not the source.
    */
  def semDeDupFilterBatch(idx: Similarity.IvfIndex, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      maxCell: Option[Int] = None,
      onHotCell: HotCellPolicy = HotCellPolicy.Fail): DataFrame = {
    val pinned = Similarity.pinnedFrame(batch)
    // under HotCellPolicy.Skip, rows probing a hot cell form no pairs
    // (their cell is excluded from the corpus side), so they survive
    // this anti-join untouched — pass-through-and-log, never a wedge
    val dup = semDeDupPairsAgainstIndex(idx, pinned, idCol, vecCol,
        threshold, maxCell, onHotCell)
      .select(col("id_b").as(idCol)).distinct()
    pinned.join(dup, Seq(idCol), "left_anti")
  }

  /** The SemDeDup TRANSFORM: [[semDeDupPairs]] → connected components →
    * per component keep the member with the LOWEST cosine to its own
    * cell centroid (the paper's diversity-preserving survivor: the
    * LEAST prototypical copy carries the most information the cluster
    * doesn't already have; ties toward the lower id), every other
    * member dropped. Returns the kept rows of `df` unchanged.
    *
    * A member's cosine to its own (argmax-assigned) centroid is the
    * MAXIMUM of its cosines over all centroids — recomputed by the
    * same one-pass centroid scan the assignment uses
    * ([[Similarity.maxCentroidCos]]), rather than threading a score
    * column through the index. Components never span cells (pairs are
    * within-cell), so the survivor rule needs no cross-cell tie story.
    * Cost over the pair scan: [[connectedComponents]] on the (thin)
    * pair set + two aggregates over component members — corpus-scale
    * work stays the one cell equi-join.
    */
  def semDeDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, kmeansIters: Int = 0,
      maxCell: Option[Int] = None): DataFrame = {
    val idx = Similarity.buildIvfIndex(
      df.select(col(idCol), col(vecCol)), idCol, vecCol, nCells,
      kmeansIters)
    semSurvivors(df, idCol,
      semPairsFromIndex(idx, threshold, maxCell),
      idx.assigned
        .select(col(idx.idCol).as("id"), col(idx.vecCol)),
      Similarity.maxCentroidCos(idx.vecCol, idx.centroids))
  }

  /** SimHash-based near-dup candidate groups: documents sharing an exact
    * 64-bit SimHash (Hamming distance 0). For distance ≤ k see
    * [[simHashNearPairs]].
    *
    * Hashes come from the per-row [[TextOps.simHash64Expr]] (bit-identical
    * to the aggregate-shaped [[TextOps.simHash64]], property-tested):
    * the hash is one narrow projection, so the ONLY shuffle is the group
    * aggregate itself — the aggregate form pays a 64×-row bit explode
    * plus an extra keyed exchange first.
    */
  def simHashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        TextOps.simHash64Expr(col(textCol)).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** Cross-corpus contamination scan — the train/test decontamination pass
    * of a training-data pipeline: for every (corpus doc, benchmark doc)
    * pair sharing at least `minShared` distinct word-`shingleK`-grams,
    * return the pair with its shared-shingle count. Shape: both sides
    * explode to distinct (id, shingle) [narrow], equi-join on the shingle
    * [one shuffle each side], then a pair-keyed count — work is
    * proportional to actually-shared shingles, never |corpus|×|bench|.
    *
    * @param maxShingleDf optional stop-shingle guard: shingles occurring in
    *   more than this many BENCHMARK docs are dropped before the join.
    *   Ubiquitous shingles ("in terms of the") are hot join keys that
    *   contribute joins ∝ corpusDf·benchDf while carrying no contamination
    *   signal; capping them is the standard mitigation. `None` keeps exact
    *   counts. Production note: join on `xxhash64(shingle)` to shrink
    *   shuffle width ~3× when oracle-exact string equality isn't required.
    */
  def crossCorpusOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3, minShared: Int = 1,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val shC = TextOps.explodedShingles(corpus, idCol, textCol, shingleK)
      .select(col(idCol).as("id_a"), col("shingle"))
    val shB0 = TextOps.explodedShingles(bench, idCol, textCol, shingleK)
      .select(col(idCol).as("id_b"), col("shingle"))
    val shB = maxShingleDf.fold(shB0) { m =>
      val keep = shB0.groupBy("shingle").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= m).select("shingle")
      shB0.join(keep, Seq("shingle"))
    }
    shC.join(shB, Seq("shingle"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Build a Bloom filter over the benchmark's distinct shingles —
    * shared by [[bloomContaminationHits]] and [[bloomDecontaminate]].
    * The filter is sized by an exact distinct count (one aggregation
    * over the SMALL side) and explicitly broadcast so the executors
    * fetch it once per node, not once per task closure.
    */
  private def benchShingleBloom(bench: DataFrame, idCol: String,
      textCol: String, shingleK: Int, fpp: Double)
      : org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter] = {
    val shingles = TextOps.explodedShingles(bench, idCol, textCol, shingleK)
      .select("shingle").distinct()
    val n = math.max(shingles.count(), 1L)
    val bf = shingles.stat.bloomFilter("shingle", n, fpp)
    trackBench(bench.sparkSession.sparkContext.broadcast(bf))
  }

  /** Per-corpus-doc count of distinct shingles that HIT the benchmark
    * Bloom filter — the zero-shuffle contamination prescreen. The whole
    * corpus side is one narrow map (tokens → shingles → membership
    * test inside a single per-row call); nothing of the corpus is ever
    * exploded, shuffled, or joined, which is the shape that matters
    * when the corpus is 100 TB and the benchmark suite is megabytes.
    *
    * Bloom semantics: NO false negatives — a doc sharing k distinct
    * shingles with the benchmark reports `bloom_hits >= k` — and false
    * positives inflate counts at rate `fpp` per distinct non-member
    * shingle, so `bloom_hits` is an upper bound usable as an exact-set
    * prefilter ([[bloomDecontaminate]]) or on its own as a cheap triage
    * score.
    */
  def bloomContaminationHits(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3,
      fpp: Double = 0.01): DataFrame = {
    val bc = benchShingleBloom(bench, idCol, textCol, shingleK, fpp)
    val k = shingleK
    // shingles are assembled INSIDE the udf from the codegen'd tokens
    // array (imperative loop + one membership probe per window) — the
    // Column-level alternative, a `transform` lambda over window
    // indices, evaluates interpreted and measured ~30× slower than the
    // whole exact join it is meant to prescreen
    val hits = udf((toks: Seq[String]) =>
      if (toks == null) 0
      else {
        val arr = toks.toArray
        val seen = new java.util.HashSet[String]()
        var n = 0
        var i = 0
        while (i + k <= arr.length) {
          val sb = new java.lang.StringBuilder(arr(i))
          var j = 1
          while (j < k) { sb.append(' ').append(arr(i + j)); j += 1 }
          val sh = sb.toString
          if (seen.add(sh) && bc.value.mightContainString(sh)) n += 1
          i += 1
        }
        n
      })
    corpus.withColumn("bloom_hits", hits(TextOps.tokens(col(textCol))))
  }

  /** [[crossCorpusOverlap]] accelerated by a benchmark Bloom prefilter:
    * identical results (the oracle gate runs both paths against one
    * SQL), different 100 TB cost. The exact path explodes and shuffles
    * EVERY corpus doc's shingles into the equi-join; this path first
    * drops every corpus doc whose distinct-shingle hit count against
    * the benchmark filter stays below `minShared` — a narrow scan with
    * no shuffle — and only the surviving candidates pay the exact join.
    * No false negatives (see [[bloomContaminationHits]]): a pair with
    * `n_shared >= minShared` implies its corpus doc's hit count is at
    * least that, so the prefilter keeps a superset and the exact verify
    * restores equality; false positives only cost a candidate's worth
    * of join work, tuned by `fpp`.
    */
  def bloomDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3,
      minShared: Int = 1, fpp: Double = 0.01,
      maxShingleDf: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val candidates = bloomContaminationHits(corpus, bench, idCol, textCol,
        shingleK, fpp)
      .filter(col("bloom_hits") >= minShared)
      .drop("bloom_hits")
    crossCorpusOverlap(candidates, bench, idCol, textCol, shingleK,
      minShared, maxShingleDf)
  }

  /** Connected components over an undirected pair frame — the clustering
    * step that turns near-duplicate PAIRS into dedup CLUSTERS (keep the
    * min-id member per cluster, drop the rest). A pair list alone
    * under-deduplicates: A≈B and B≈C put A,B,C in one cluster even when
    * (A,C) never surfaced as a pair.
    *
    * Algorithm: iterative min-label propagation on the label-contracted
    * graph with per-round path compression (pointer jumping) — each round
    * (1) every label adopts the minimum of its adjacent labels, (2) labels
    * are compressed one hop (`lbl := lbl(lbl)`), (3) edges are rewritten
    * into the new label space and self-loops dropped. The compression
    * step makes chain-shaped components contract geometrically, so rounds
    * scale with log(diameter), not diameter (the star-contraction family
    * of MapReduce CC algorithms). Each round is a bounded number of hash
    * joins + one aggregate; every frame is hash-partitioned on its key and
    * the only driver-side action is an `isEmpty` convergence probe — no
    * data ever collects to the driver, so the shape holds at 100 TB.
    *
    * Deterministic: labels only ever decrease toward the component's
    * minimum id. Returns (id, cluster_id) for every id appearing in
    * `pairs`; ids with no pair are trivially their own singleton cluster
    * and are not emitted.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25): DataFrame = {
    // eager localCheckpoint: an iterative DataFrame algorithm MUST
    // truncate lineage, or round r's logical plan embeds rounds 0..r-1
    // and planning itself blows up exponentially (persist alone keeps the
    // full plan). On a real cluster with unreliable executors, swap for
    // reliable `checkpoint` on a DFS checkpoint dir. Checkpointing the
    // symmetric frame FIRST matters when `pairs` is itself an expensive
    // pipeline (MinHash LSH): the node and edge inits below then read the
    // materialised blocks instead of re-running that pipeline per action.
    val sym = pairs.select(col(idA).as("la"), col(idB).as("lb"))
      .union(pairs.select(col(idB).as("la"), col(idA).as("lb")))
      .localCheckpoint()
    var lab = sym.select(col("la").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    val edges = sym.filter(col("la") =!= col("lb")).distinct()
      .select(col("la").as("u"), col("lb").as("v"))
      .localCheckpoint()
    // label-space edge view, always RE-DERIVED from the original edges
    // through the current labeling (never remapped incrementally — a
    // label id's own label can move away from its members' mapping, so
    // incremental remapping silently drops live edges). NOT checkpointed:
    // its plan is two joins over the checkpointed edges/lab frames, so
    // depth stays bounded without a per-round materialisation — the
    // former per-round le checkpoint (with its distinct exchange) was
    // one third of the loop's jobs for frames this derivation rebuilds
    // inside the shrink aggregate anyway.
    def labelEdges(l: DataFrame): DataFrame = edges
      .join(l.select(col("id").as("u"), col("lbl").as("la")), Seq("u"))
      .join(l.select(col("id").as("v"), col("lbl").as("lb")), Seq("v"))
      .select("la", "lb")
      .filter(col("la") =!= col("lb")).distinct()
    var iter = 0
    var converged = false
    while (!converged) {
      // (1) min adjacent label, only where it actually shrinks. The
      // CONVERGENCE PROBE rides this tiny frame: a symmetric non-empty
      // label-edge set always has some la > lb (the larger endpoint of
      // any cross-label edge shrinks), so m.isEmpty <=> le.isEmpty —
      // probing m instead of a materialised le drops a full edge-view
      // checkpoint per round, and the probe reads the just-checkpointed
      // one-row-per-shrinking-label blocks.
      val m = labelEdges(lab)
        .groupBy(col("la")).agg(min(col("lb")).as("mn"))
        .filter(col("mn") < col("la"))
        .localCheckpoint()
      if (m.isEmpty) converged = true
      else {
        require(iter < maxIter,
          s"connectedComponents did not converge in $maxIter rounds")
        val labA = lab.join(m, lab("lbl") === m("la"), "left")
          .select(lab("id"), coalesce(m("mn"), lab("lbl")).as("lbl"))
        // (2) TWO-hop path compression (pointer jumping): every label
        // value is itself a node id of the pair graph, so the self-join
        // is total; labels are monotone non-increasing, so composing
        // hops still lands inside the component, chains contract
        // geometrically, and the second hop rides the same job for one
        // more thin self-join — fewer rounds, each round fewer jobs.
        def jump(l: DataFrame): DataFrame = {
          val parent = l.select(col("id").as("pid"), col("lbl").as("plbl"))
          l.join(parent, l("lbl") === parent("pid"))
            .select(l("id"), col("plbl").as("lbl"))
        }
        lab = jump(jump(labA)).localCheckpoint()
        iter += 1
      }
    }
    lab.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Hamming-distance-≤k SimHash pairs over a precomputed hash frame
    * (`[[TextOps.simHash64]]` output, or the 16-bit portable
    * `[[TextOps.simHash16]]`): band the `bits`-bit hash into `blocks`
    * blocks and bucket-join on every (blocks−k)-block combination — by
    * pigeonhole, ≤ k differing bits touch ≤ k blocks, so two hashes
    * within distance k agree EXACTLY on at least one such combination —
    * then verify `bit_count(a XOR b) <= k`. The banding is a complete
    * filter, so the result is exactly the distance-≤k pair set, through
    * the same banded-bucket-join shape as MinHash LSH (never
    * all-pairs).
    *
    * `blocks` defaults to k+1 — single-block keys of width
    * bits/(k+1), e.g. 64-bit k=3 → 16-bit chunks → 65 536 buckets per
    * chunk. That saturates at corpus scale: expected collision
    * candidates are C(n,2)·(k+1)/2^(bits/(k+1)), quadratic in n once
    * n ≫ bucket count (measured: the k=4 audio-fingerprint corpus at
    * 10×sf0.1 — 10⁵ uniform hashes into 2^12.8 buckets — spends more
    * wall in candidate verification than in decode). Raising `blocks`
    * is Manku/Jain/Das Sarma's multi-block scheme (WWW 2007, §3): keys
    * widen to (blocks−k)·bits/blocks bits — exponentially fewer
    * collisions — at the cost of C(blocks, blocks−k) probe rows per
    * hash, the classic LSH rows-per-band trade. k=4, blocks=6 turns
    * ~13-bit keys into ~21-bit keys for 15 probe rows instead of 5;
    * the result set is bit-identical (spec-pinned property).
    *
    * Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤ k.
    */
  def simHashNearPairs(hashes: DataFrame, idCol: String,
      hashCol: String = "simhash", k: Int = 3, bits: Int = 64,
      blocks: Int = 0): DataFrame = {
    val chunks = hammingBandChunks(hashes, idCol, hashCol, k, bits, blocks)
    val a = chunks.select(col(idCol).as("id_a"), col(hashCol).as("__ha"),
      col("chunk"), col("sig"))
    val b = chunks.select(col(idCol).as("id_b"), col(hashCol).as("__hb"),
      col("chunk"), col("sig"))
    a.join(b, Seq("chunk", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("bigint")
          .as("hamming"))
      .filter(col("hamming") <= k)
      .distinct()
  }

  /** The banding pass shared by [[simHashNearPairs]] and
    * [[hammingPairsAgainstIndex]]: one row per (hash,
    * (blocks−k)-block-combination), the combination's bits concatenated
    * into `sig` (a subset of the blocks, whose widths sum to
    * bits ≤ 64 — always one Long exactly). `blocks == k+1` degenerates
    * to single-block chunking.
    */
  private def hammingBandChunks(hashes: DataFrame, idCol: String,
      hashCol: String, k: Int, bits: Int, blocks: Int): DataFrame = {
    require(k >= 0 && k < bits, s"need 0 <= k < bits, got k=$k bits=$bits")
    val nBlocks = if (blocks == 0) k + 1 else blocks
    require(nBlocks > k && nBlocks <= bits,
      s"need k < blocks <= bits, got blocks=$nBlocks k=$k bits=$bits")
    // spread the bits as evenly as possible over the blocks
    val sizes = (0 until nBlocks).map(c =>
      bits / nBlocks + (if (c < bits % nBlocks) 1 else 0))
    val offsets = sizes.scanLeft(0)(_ + _)
    def blockCol(b: Int): Column = {
      val w = sizes(b)
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftright(col(hashCol), offsets(b)).bitwiseAND(lit(mask))
    }
    val combos = (0 until nBlocks).combinations(nBlocks - k).toSeq
    val chunkCols = combos.zipWithIndex.map { case (combo, ci) =>
      val sig = combo.tail.foldLeft(blockCol(combo.head)) { (acc, b) =>
        shiftleft(acc, sizes(b)).bitwiseOR(blockCol(b))
      }
      struct(lit(ci).as("chunk"), sig.as("sig"))
    }
    hashes.select(col(idCol), col(hashCol),
        explode(array(chunkCols: _*)).as("cs"))
      .select(col(idCol), col(hashCol),
        col("cs.chunk").as("chunk"), col("cs.sig").as("sig"))
  }

  /** Hamming-distance-≤k pairs of a PROBE batch against an INDEXED
    * hash frame — the incremental/serving form of [[simHashNearPairs]]
    * (the media-fingerprint analog of [[nearDupPairsAgainstIndex]]):
    * both sides band identically (same k/bits/blocks — REQUIRED for
    * the pigeonhole completeness argument to span the two frames), the
    * bucket join is index×probe ONLY (index never self-pairs, probe
    * never self-pairs), so per-batch work scales with the BATCH and
    * the matched buckets, never with the landed corpus. The index side
    * is typically a persisted thin (id, hash) parquet — hashes are 8
    * bytes per item, so even a 10¹⁰-item corpus indexes in ~80 GB,
    * partition-pruned by the band join's shuffle.
    *
    * Output: (id_index, id_probe, hamming), hamming ≤ k.
    */
  def hammingPairsAgainstIndex(index: DataFrame, probe: DataFrame,
      idCol: String, hashCol: String = "simhash", k: Int = 3,
      bits: Int = 64, blocks: Int = 0): DataFrame = {
    val a = hammingBandChunks(index, idCol, hashCol, k, bits, blocks)
      .select(col(idCol).as("id_index"), col(hashCol).as("__ha"),
        col("chunk"), col("sig"))
    val b = hammingBandChunks(probe, idCol, hashCol, k, bits, blocks)
      .select(col(idCol).as("id_probe"), col(hashCol).as("__hb"),
        col("chunk"), col("sig"))
    a.join(b, Seq("chunk", "sig"))
      .select(col("id_index"), col("id_probe"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("bigint")
          .as("hamming"))
      .filter(col("hamming") <= k)
      .distinct()
  }

  /** A built near-dup index over an already-landed corpus: the banded
    * MinHash signatures, the distinct (id, shingle) rows, and per-doc
    * shingle counts — everything an INCREMENTAL ingest batch needs to
    * dedup against the corpus without recomputing it. Build once per
    * corpus ([[buildNearDupIndex]]), persist with
    * [[writeNearDupIndex]], probe per batch with
    * [[nearDupPairsAgainstIndex]].
    */
  final case class NearDupIndex(bands: DataFrame, shingles: DataFrame,
      sizes: DataFrame, idCol: String, numHashes: Int, rowsPerBand: Int,
      shingleK: Int, production64: Boolean) {
    /** Release the cached shingle frame a [[buildNearDupIndex]] build
      * holds (no-op on a [[loadNearDupIndex]]-loaded index, whose frames
      * are plain parquet reads). Call once the index is written or
      * probing is done.
      */
    def unpersistShingles(): Unit = { shingles.unpersist(); () }
  }

  /** Build the incremental-dedup index frames for `df`. With
    * `production64` the signatures use xxhash64 (the ~10× cheaper
    * family); the shingle table is hash-family independent either way.
    *
    * The shingle frame feeds all three index tables (signatures, the
    * shingle table itself, per-doc sizes), so by default it is
    * persisted — the CPU-heavy explode + distinct runs once per build,
    * not once per consumer (a [[writeNearDupIndex]] of an unshared
    * frame would re-shingle the corpus per output ACTION).
    * MEMORY_AND_DISK because shingle rows are corpus-scale: spill beats
    * recompute, and the deterministic lineage keeps eviction safe.
    * Release with [[NearDupIndex.unpersistShingles]] when done — or
    * pass `persistShingles = false` when the index feeds exactly ONE
    * action (e.g. an immediate [[nearDupPairsAgainstIndex]] probe),
    * where in-plan reuse already computes the shingles once and a cache
    * entry would outlive the call for nothing.
    */
  def buildNearDupIndex(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, rowsPerBand: Int = 2, shingleK: Int = 3,
      production64: Boolean = false,
      persistShingles: Boolean = true): NearDupIndex = {
    val sh0 = shingles(df, idCol, textCol, shingleK)
    val sh =
      if (persistShingles)
        sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sh0
    val sigs =
      if (production64) minHashSignatures64(sh, idCol, numHashes)
      else minHashSignatures(sh, idCol, numHashes)
    NearDupIndex(
      bandedSigs(sigs, idCol, numHashes, rowsPerBand),
      sh,
      sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz")),
      idCol, numHashes, rowsPerBand, shingleK, production64)
  }

  /** Near-duplicate pairs of an incoming batch AGAINST the indexed
    * corpus: the incremental-ingest shape, where re-running the full
    * self-join dedup per batch would re-shingle and re-shuffle the
    * whole corpus. Returns (id_old, id_new, n_inter, jaccard) for
    * every (corpus doc, batch doc) pair clearing `threshold` — pairs
    * WITHIN the batch are deliberately out of scope (run the batch
    * through [[nearDuplicatePairs]] for those; they're a batch-local
    * cost).
    *
    * Scale shape: the batch side is small by construction, so its
    * banded signatures broadcast into the candidate join — the index
    * tables stream through WITHOUT a shuffle; the Jaccard verify joins
    * the index shingle table only on candidate ids. Per batch the work
    * is one corpus-band scan + candidate-proportional verification,
    * never a corpus self-join.
    *
    * `broadcastBatch` forces the broadcast hint (the default). The
    * broadcast side is the batch's banded signature rows — numHashes /
    * rowsPerBand rows per batch doc, assembled ON THE DRIVER and capped
    * by Spark's hard 8 GB broadcast-table limit well before that by
    * driver/executor memory; as a rule of thumb keep batches under a
    * few million docs. For a jumbo backfill batch pass
    * `broadcastBatch = false` to degrade to a shuffle join on (band,
    * sig) instead of OOMing.
    */
  def nearDupPairsAgainstIndex(idx: NearDupIndex, newDocs: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.8, broadcastBatch: Boolean = true): DataFrame = {
    val shNew = shingles(newDocs, idCol, textCol, idx.shingleK)
    val sigNew =
      if (idx.production64) minHashSignatures64(shNew, idCol, idx.numHashes)
      else minHashSignatures(shNew, idCol, idx.numHashes)
    val bNew0 = bandedSigs(sigNew, idCol, idx.numHashes, idx.rowsPerBand)
      .select(col(idCol).as("id_new"), col("band"), col("sig"))
    val bNew = if (broadcastBatch) broadcast(bNew0) else bNew0
    val cands = idx.bands
      .select(col(idx.idCol).as("id_old"), col("band"), col("sig"))
      .join(bNew, Seq("band", "sig"))
      .select("id_old", "id_new").distinct()
    val inter = cands
      .join(idx.shingles.select(col(idx.idCol).as("id_old"),
        col("shingle")), "id_old")
      .join(shNew.select(col(idCol).as("id_new"), col("shingle")),
        Seq("id_new", "shingle"))
      .groupBy("id_old", "id_new")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(idx.sizes.select(col(idx.idCol).as("id_old"),
        col("sz").as("sz_old")), "id_old")
      .join(shNew.groupBy(col(idCol)).agg(count(lit(1)).as("sz_new"))
        .select(col(idCol).as("id_new"), col("sz_new")), "id_new")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("sz_old") + col("sz_new") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_old", "id_new", "n_inter", "jaccard")
  }

  /** Persist a [[NearDupIndex]]: bands PARTITIONED BY `band` (a probe
    * touches every band, but band files sort by signature so row-group
    * stats narrow the scan), shingles and sizes as plain tables, and a
    * one-row meta sidecar so the index round-trips without external
    * configuration.
    */
  def writeNearDupIndex(idx: NearDupIndex, path: String): Unit = {
    // the three table writes are INDEPENDENT actions over the shared
    // (persisted) shingle frame — submit them from driver threads so
    // each write's tasks back-fill executors freed by the others' stage
    // tails (guide §2.6); the block manager's per-block loading locks
    // keep the first cache materialisation computed once
    awaitAll(Seq(
      () => idx.bands.sortWithinPartitions("band", "sig")
        .write.mode("overwrite").partitionBy("band")
        .parquet(s"$path/bands"),
      () => idx.shingles.write.mode("overwrite")
        .parquet(s"$path/shingles"),
      () => idx.sizes.write.mode("overwrite").parquet(s"$path/sizes")))
    val spark = idx.bands.sparkSession
    import spark.implicits._
    Seq((idx.idCol, idx.numHashes, idx.rowsPerBand, idx.shingleK,
        idx.production64))
      .toDF("id_col", "num_hashes", "rows_per_band", "shingle_k",
        "production64")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Run independent driver actions concurrently and join ALL of them
    * before propagating the first failure (no orphaned sibling jobs).
    */
  private def awaitAll(actions: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = actions.map(a => Future(a()))
    fs.foreach(f => Await.ready(f, Duration.Inf))
    fs.foreach(f => Await.result(f, Duration.Inf))
  }

  /** Load an index written by [[writeNearDupIndex]]. */
  def loadNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): NearDupIndex = {
    val m = spark.read.parquet(s"$path/meta").head()
    NearDupIndex(
      spark.read.parquet(s"$path/bands"),
      spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/sizes"),
      m.getString(0), m.getInt(1), m.getInt(2), m.getInt(3),
      m.getBoolean(4))
  }

  /** Fold an ingested batch INTO the persisted index at `path` — the
    * missing half of the incremental-ingest loop: probe with
    * [[nearDupPairsAgainstIndex]], keep the survivors, then append THEM
    * here so the next batch dedups against corpus ∪ batch without a
    * full [[buildNearDupIndex]] rebuild. After the append,
    * [[loadNearDupIndex]] sees exactly the index a fresh build over the
    * combined corpus would produce (same rows; file layout differs).
    *
    * The banding family and parameters come FROM the meta sidecar —
    * never from the caller — so an append can not silently mix hash
    * families or shingle widths; a missing/unreadable sidecar fails
    * loudly before any write. `newDocs`' id column is renamed to the
    * index's `idCol` on write.
    *
    * `checkDisjoint` (default true) verifies no batch id already exists
    * in the index — an overlapping id would double its size/shingle
    * rows and corrupt every later Jaccard against it. The check is one
    * thin scan of the sizes table against the (broadcast-sized) batch
    * ids; opt out only when disjointness is guaranteed upstream.
    *
    * Scale shape: appended work ∝ batch (shingle + sign the batch only);
    * the three appends land new files without rewriting existing ones
    * (bands keep the `band=` partition dirs). The three table appends
    * are NOT atomic as a group — a crash mid-append can leave a partial
    * batch; re-ingest under NEW ids or rebuild to recover.
    */
  def appendToNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newDocs: DataFrame, idCol: String, textCol: String,
      checkDisjoint: Boolean = true): Unit = {
    val idx = loadNearDupIndex(spark, path)
    val renamed = newDocs.select(col(idCol).as(idx.idCol), col(textCol))
    if (checkDisjoint) {
      val overlap = idx.sizes
        .join(broadcast(renamed.select(idx.idCol).distinct()), idx.idCol)
        .limit(1).count()
      require(overlap == 0L,
        s"appendToNearDupIndex: batch ids overlap the index at $path — " +
          "appending would double-count their shingles/sizes")
    }
    val batch = buildNearDupIndex(renamed, idx.idCol, textCol,
      idx.numHashes, idx.rowsPerBand, idx.shingleK, idx.production64)
    // same concurrent-submit shape as writeNearDupIndex: the appends
    // are independent per-table actions (the group was never atomic —
    // see the crash note above)
    try awaitAll(Seq(
      () => batch.bands.sortWithinPartitions("band", "sig")
        .write.mode("append").partitionBy("band").parquet(s"$path/bands"),
      () => batch.shingles.write.mode("append")
        .parquet(s"$path/shingles"),
      () => batch.sizes.write.mode("append").parquet(s"$path/sizes")))
    finally batch.unpersistShingles()
  }

  /** Fold the small files an append-heavy lifecycle accumulates back
    * into consolidated, sig-sorted per-band files (and `targetPartitions`
    * files each for shingles/sizes) — the maintenance-window companion
    * of [[appendToNearDupIndex]]: reads are unchanged semantically, but
    * a probe stops paying per-file open cost for every past ingest
    * cycle. `filesPerBand` sizes the band output (1 is right up to a
    * few GB per band; raise it so individual files stay row-group
    * friendly at corpus scale).
    *
    * MUST NOT run concurrently with readers or appends (same documented
    * publish window as `ExactlyOnceSink.compact`). Crash-safe at any
    * interruption point via [[IndexMaintenance]]: each table is staged
    * fully, marked, then swapped; an interrupted swap heals on the next
    * call (which also sweeps pre-commit orphans) — and healing runs
    * BEFORE anything is read, so a crashed compaction never feeds a
    * half-swapped table into the next one. The meta sidecar is never
    * touched.
    */
  def compactNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, filesPerBand: Int = 1,
      targetPartitions: Int = 1): Unit = {
    require(filesPerBand >= 1 && targetPartitions >= 1,
      "filesPerBand and targetPartitions must be >= 1")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = Seq("bands", "shingles", "sizes")
      .map(t => t -> new org.apache.hadoop.fs.Path(root, t)).toMap
    tables.values.foreach(IndexMaintenance.recoverOrSweep(fs, _))
    val idx = loadNearDupIndex(spark, path)
    val nBands = idx.numHashes / idx.rowsPerBand
    // bands: RANGE-partition on (band, sig) so partitions align with
    // the band dirs (a hash repartition on the pair would spread every
    // band across every partition and MULTIPLY files); the sig sort
    // keeps row-group stats narrowing probe scans
    idx.bands
      .repartitionByRange(nBands * filesPerBand, col("band"), col("sig"))
      .sortWithinPartitions("band", "sig")
      .write.partitionBy("band")
      .parquet(IndexMaintenance.stagingOf(tables("bands")).toString)
    IndexMaintenance.swap(fs, tables("bands"))
    idx.shingles.repartition(targetPartitions)
      .write.parquet(IndexMaintenance.stagingOf(tables("shingles")).toString)
    IndexMaintenance.swap(fs, tables("shingles"))
    idx.sizes.repartition(targetPartitions)
      .write.parquet(IndexMaintenance.stagingOf(tables("sizes")).toString)
    IndexMaintenance.swap(fs, tables("sizes"))
  }

  /** Merged character-span removal intervals for EXACT SUBSTRING
    * deduplication (the corpus-level operator of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): every length-`gramLen` character gram occurring
    * at more than one (doc, position) across the WHOLE corpus — other
    * docs or elsewhere in the same doc — keeps only its canonical
    * occurrence (smallest (doc id, position)); every other occurrence
    * contributes a removal span `[pos, pos+gramLen)`, and overlapping
    * or adjacent spans merge per doc. Output: one row per merged
    * interval — (`idCol`, `s`, `e`), 1-based, end-exclusive.
    *
    * Scale shape (the suffix-array equivalent, relationally): the
    * occurrence table is O(total chars) thin rows — (doc, pos, md5) —
    * exactly a suffix array's footprint; duplicate marking is a
    * per-gram AGGREGATE — `groupBy(gram).agg(count,
    * min(struct(doc, pos)))` — joined back to the occurrence stream,
    * deliberately NOT a window over the gram hash. The difference is
    * what survives skew: a real corpus has hot boilerplate grams
    * (licence headers, whitespace runs) that can own a large fraction
    * of all positions, and a window `partition by gram` sends every
    * one of those occurrences to a single reducer's sort, while the
    * aggregate absorbs them in map-side partials (one row per gram per
    * input partition reaches the shuffle) and the join-back is a plain
    * equi-join AQE can skew-split. Interval merging then shuffles only
    * the REMOVAL occurrences (the small output side) by doc. No
    * self-join on positions, no driver state. md5 keeps the oracle
    * cross-engine; xxhash64(gram) is the production drop-in (same
    * pattern as [[minHashSignatures64]]). Collisions: a 128-bit hash
    * equating two distinct grams is ~2^-64-scale — documented, not
    * guarded.
    */
  def substringRemovalIntervals(df: DataFrame, idCol: String,
      textCol: String, gramLen: Int): DataFrame =
    substringRemovalIntervalsBy(df, idCol, textCol, gramLen, md5(_))

  /** [[substringRemovalIntervals]] on xxhash64 grams — the production
    * hash at ~10× less CPU per position (the md5 form exists to stay
    * oracle-exact; same family pattern as [[minHashSignatures64]]).
    * Interval sets are identical barring a hash collision equating two
    * distinct grams (spec pins family agreement on the fixture corpus).
    */
  def substringRemovalIntervals64(df: DataFrame, idCol: String,
      textCol: String, gramLen: Int): DataFrame =
    substringRemovalIntervalsBy(df, idCol, textCol, gramLen,
      xxhash64(lit(0), _))

  private def substringRemovalIntervalsBy(df: DataFrame, idCol: String,
      textCol: String, gramLen: Int,
      gramHash: Column => Column): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    import org.apache.spark.sql.expressions.Window
    // grams slide LINEARLY per doc (TextOps.charNgrams) and positions
    // come from the posexplode — the old explode-positions-then-substr
    // shape walked the string from the start per position (O(len²) per
    // doc), and dragged the full text through the explode besides
    val occ = df
      .select(col(idCol).as("__doc"), col(textCol).as("__t"))
      .select(col("__doc"),
        posexplode(TextOps.charNgrams(col("__t"), gramLen))
          .as(Seq("__p0", "__gram")))
      .select(col("__doc"), (col("__p0") + 1).as("pos"),
        gramHash(col("__gram")).as("__g"))
    // duplicate marking WITHOUT a window on the gram hash: per-gram
    // aggregate (map-side partials absorb hot boilerplate grams) +
    // join-back (AQE-skew-splittable), keeping only non-canonical
    // occurrences — see the scaladoc for why this survives skew that
    // a `partition by __g` window would not
    val dupCanon = occ
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("__doc"), col("pos"))).as("__canon"))
      .filter(col("__c") > 1)
      .select(col("__g"), col("__canon"))
    val rem = occ.join(dupCanon, Seq("__g"))
      .filter(col("__canon.__doc") =!= col("__doc") ||
        col("__canon.pos") =!= col("pos"))
      .select(col("__doc"), col("pos"),
        (col("pos") + gramLen).as("__e"))
    val byDoc = Window.partitionBy("__doc").orderBy("pos")
    val runMaxEnd = max(col("__e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    rem
      .withColumn("__ni",
        when(col("pos") > coalesce(runMaxEnd, lit(0)), 1).otherwise(0))
      .withColumn("__isl", sum("__ni").over(byDoc))
      .groupBy(col("__doc"), col("__isl"))
      .agg(min("pos").as("s"), max("__e").as("e"))
      .select(col("__doc").as(idCol), col("s"), col("e"))
  }

  /** Per-line document frequency — the counting half of CCNet-style
    * LINE-LEVEL dedup: each line (split on `delim`), normalized
    * ([[TextOps.normalize]]) and md5-keyed, with the number of DISTINCT
    * docs containing it. Lines normalizing to the empty string are
    * structure, not content — excluded here and always kept by
    * [[dropDuplicateLines]]. Two-stage shape: distinct (key, doc)
    * partial-aggregates map-side, so a boilerplate line present in
    * every doc costs one row per (doc, partition), never a hot-key
    * shuffle of every occurrence.
    */
  def lineDocFrequencies(df: DataFrame, idCol: String, textCol: String,
      delim: String = "\n"): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(split(col(textCol),
          java.util.regex.Pattern.quote(delim))).as("__line"))
      .select(col("__doc"), TextOps.normalize(col("__line")).as("__n"))
      .filter(col("__n") =!= "")
      .groupBy(md5(col("__n")).as("line_key"))
      .agg(countDistinct(col("__doc")).as("doc_freq"))

  /** CCNet-style line-level deduplication: drop EVERY occurrence of any
    * line whose normalized form appears in more than `maxDocFreq`
    * distinct docs (the boilerplate filter — nav bars, cookie banners,
    * licence footers), keep the rest in order. Output: (`idCol`,
    * `clean_text`, `n_dropped_lines`). Contrast
    * [[dropDuplicateSubstrings]], which keeps a canonical occurrence —
    * above-threshold boilerplate has no canonical worth keeping.
    *
    * Scale shape: the over-threshold key set is TINY (boilerplate by
    * definition concentrates), so the drop is a left-anti join of the
    * line table against it — AQE turns it into a broadcast anti-join;
    * reassembly is one groupBy on the doc id folding the sorted
    * (line_no, line) structs. A doc losing every line cleans to the
    * empty string, never a dropped row.
    */
  def dropDuplicateLines(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Int, delim: String = "\n"): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val pat = java.util.regex.Pattern.quote(delim)
    val frequent = lineDocFrequencies(df, idCol, textCol, delim)
      .filter(col("doc_freq") > maxDocFreq).select("line_key")
    val lines = df.select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), pat)).as(Seq("__ln", "__line")))
      .withColumn("line_key", md5(TextOps.normalize(col("__line"))))
    val rebuilt = lines.join(frequent, Seq("line_key"), "left_anti")
      .groupBy(col("__doc").as(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        array_join(
          transform(array_sort(collect_list(
              struct(col("__ln"), col("__line")))),
            x => x.getField("__line")),
          delim).as("clean_text"))
    // null text splits to a null array: coalesce its size to 0 so the
    // row reports ('', 0) — consistent accounting, never a null count
    df.select(col(idCol),
        coalesce(size(split(col(textCol), pat)), lit(0))
          .as("__n_total"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("__n_total") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_dropped_lines"))
  }

  /** The corpus with every non-canonical duplicated substring CUT OUT:
    * [[substringRemovalIntervals]]' merged spans are complemented per
    * doc and the kept segments reassembled in order. Output: (`idCol`,
    * `clean_text`, `n_removed_chars`). A doc whose every position is
    * covered cleans to the empty string (not a dropped row — span
    * dedup is a TRANSFORM, the row-level dedups are the filters).
    *
    * Reassembly is one shuffle (intervals join + groupBy on the doc
    * id): per doc, the sorted interval array folds left with
    * `aggregate` — cursor starts at 1, each interval appends
    * `text[cursor, s)` and advances the cursor to `e`, the finish
    * lambda appends the tail. The fold is per-row over an array
    * bounded by the doc's interval count — no second explode, no
    * window over segments.
    */
  def dropDuplicateSubstrings(df: DataFrame, idCol: String,
      textCol: String, gramLen: Int): DataFrame =
    cutIntervals(df, idCol, textCol,
      substringRemovalIntervals(df, idCol, textCol, gramLen))

  /** Cut a set of merged `(idCol, s, e)` character intervals out of
    * each doc's text — the shared reassembly half of
    * [[dropDuplicateSubstrings]] and [[removeBenchmarkSpans]].
    *
    * PRECONDITION: `idCol` is unique in `df`. A duplicated id emits one
    * output row per input row, each with the id's full interval set
    * applied (the left join fans out; nothing collapses the corpus side,
    * by design — collapsing would drag the text column through a
    * shuffle).
    *
    * The intervals aggregate to a per-doc sorted array BEFORE touching
    * the corpus, so the only rows that shuffle are the (small) interval
    * rows; the text column then meets that array in a single left join
    * AQE is free to broadcast — on an interval side proportional to the
    * REMOVALS, not the corpus — and the cut itself is narrow. (The
    * previous join-then-groupBy order re-aggregated with the full text
    * along for the ride.) Docs with no intervals pass through verbatim
    * via the null guard.
    */
  private def cutIntervals(df: DataFrame, idCol: String,
      textCol: String, iv: DataFrame): DataFrame = {
    val zero = struct(lit(1).as("cur"), lit("").as("acc"))
    val clean = aggregate(
      col("__ivs"),
      zero,
      (acc, x) => struct(
        x.getField("e").as("cur"),
        concat(acc.getField("acc"),
          col("__t").substr(acc.getField("cur"),
            x.getField("s") - acc.getField("cur"))).as("acc")),
      acc => concat(acc.getField("acc"),
        col("__t").substr(acc.getField("cur"),
          length(col("__t")) - acc.getField("cur") + 1)))
    val ivAgg = iv.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("__ivs"))
    df.select(col(idCol), col(textCol).as("__t"))
      .join(ivAgg, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__ivs").isNull, col("__t")).otherwise(clean)
          .as("clean_text"),
        when(col("__ivs").isNull, lit(0))
          .otherwise(length(col("__t")) - length(clean))
          .as("n_removed_chars"))
  }

  // benchmark-side broadcasts outstanding since the last
  // [[releaseBenchBroadcasts]] drain — one entry per
  // [[bloomContaminationHits]]/[[bloomDecontaminate]] filter and per
  // [[removeBenchmarkSpansNarrow]] gram set. Weak references: a caller
  // that never drains still gets the ContextCleaner's GC-driven cleanup
  // once the frames built on them are dropped (the registry must not be
  // what keeps the blocks alive); the drain is the EAGER path on top,
  // mirroring [[Similarity.releaseQueryPins]].
  private val benchBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[
      java.lang.ref.WeakReference[org.apache.spark.broadcast.Broadcast[_]]]

  private def trackBench[T](b: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] = {
    benchBroadcasts.add(
      new java.lang.ref.WeakReference[
        org.apache.spark.broadcast.Broadcast[_]](b))
    b
  }

  /** Eagerly destroy every benchmark-side broadcast (Bloom filters,
    * narrow-path gram sets) registered since the last drain — the
    * explicit release for long-lived drivers that decontaminate many
    * corpora, so broadcast blocks don't accumulate until GC. Call ONLY
    * after every frame built from them has been fully consumed: a
    * destroyed broadcast fails any still-lazy frame reading it.
    * Returns the number destroyed (GC-collected entries drain
    * silently).
    */
  def releaseBenchBroadcasts(): Int = {
    var n = 0
    var ref = benchBroadcasts.poll()
    while (ref != null) {
      val b = ref.get()
      if (b != null) { b.destroy(); n += 1 }
      ref = benchBroadcasts.poll()
    }
    n
  }

  /** [[removeBenchmarkSpans]] as ONE narrow per-row map — the serving /
    * streaming shape: the benchmark's distinct gram hashes are
    * collected once (benchmark suites are MBs; the set is
    * broadcast-sized) and shipped to the executors as a SORTED primitive
    * long array — the first 8 md5 bytes per gram, probed by binary
    * search with no per-gram hex formatting and ~8 driver bytes per
    * benchmark gram. Each corpus row marks, merges, and cuts its own
    * spans inside a single UDF call — no occurrence explode, no
    * shuffle, no window; attaches to a streaming corpus unchanged (same
    * pattern as [[bloomContaminationHits]], but exact). Positions are
    * CODEPOINT indices, matching the relational path's `substr`
    * semantics on astral-plane text, and value equality with
    * [[removeBenchmarkSpans]] is spec-pinned (including an astral
    * fixture). Truncating md5 to 64 bits can in principle equate two
    * distinct grams (~2^-64-scale per pair) — same documented
    * non-guard as the 128-bit relational form.
    */
  def removeBenchmarkSpansNarrow(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, gramLen: Int): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    // Spark-side hashing stays md5-hex (shared with the oracle path);
    // only the 64-bit prefix crosses to the driver as a primitive long
    val benchGrams: Array[Long] = bench
      .select(explode(TextOps.charNgrams(col(textCol), gramLen))
        .as("__gram"))
      .select(md5(col("__gram")).as("g"))
      .distinct().collect()
      .map(r => java.lang.Long.parseUnsignedLong(
        r.getString(0).substring(0, 16), 16))
      .distinct.sorted
    val bc = trackBench(
      corpus.sparkSession.sparkContext.broadcast(benchGrams))
    val cut = udf { (text: String) =>
      if (text == null) null
      else {
        val grams = bc.value
        val md = md5Holder.get()
        // char offset of each codepoint start (off(nCp) = text.length),
        // so gram slicing and span cutting both count CODEPOINTS —
        // byte-identical to the relational path on astral text
        val nChars = text.length
        val off = new Array[Int](nChars + 1)
        var nCp = 0
        var ci = 0
        while (ci < nChars) {
          off(nCp) = ci
          ci += Character.charCount(text.codePointAt(ci))
          nCp += 1
        }
        off(nCp) = nChars
        var spans = List.empty[(Int, Int)] // reversed merged, cp indices
        var p = 0
        while (p + gramLen <= nCp) {
          val d = md.digest(text.substring(off(p), off(p + gramLen))
            .getBytes("UTF-8"))
          val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          if (java.util.Arrays.binarySearch(grams, h) >= 0) {
            spans = spans match {
              case (s0, e0) :: tail if p <= e0 => (s0, p + gramLen) :: tail
              case _ => (p, p + gramLen) :: spans
            }
          }
          p += 1
        }
        val sb = new java.lang.StringBuilder
        var cur = 0
        spans.reverse.foreach { case (s0, e0) =>
          sb.append(text, off(cur), off(s0)); cur = e0
        }
        sb.append(text, off(cur), nChars)
        sb.toString
      }
    }
    corpus.select(col(idCol), col(textCol).as("__t"))
      .withColumn("clean_text", cut(col("__t")))
      .select(col(idCol), col("clean_text"),
        (length(col("__t")) - length(col("clean_text")))
          .as("n_removed_chars"))
  }

  /** TOKEN-LEVEL (span) decontamination: every corpus span that appears
    * VERBATIM in the benchmark — any `gramLen`-char gram of the corpus
    * equal to any gram of the benchmark — becomes a removal interval;
    * overlapping/adjacent spans merge and are cut out
    * ([[cutIntervals]]). The surgical alternative to doc-level
    * [[crossCorpusOverlap]]/[[bloomDecontaminate]]: a long document
    * quoting one benchmark answer loses the QUOTE, not the document.
    * Output: (`idCol`, `clean_text`, `n_removed_chars`).
    *
    * Scale shape: the benchmark side collapses to its DISTINCT gram
    * hashes (benchmark suites are MBs — broadcast-sized next to a
    * 100 TB corpus); the corpus occurrence explode is the same
    * O(total chars) thin stream as [[substringRemovalIntervals]], but
    * the duplicate marking is a semi-join against the small gram set
    * instead of a corpus-wide window — no corpus self-shuffle at all.
    * Compose with [[bloomContaminationHits]] as a prescreen to skip
    * exploding obviously-clean docs.
    */
  def removeBenchmarkSpans(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, gramLen: Int): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    import org.apache.spark.sql.expressions.Window
    // linear gram slide + posexplode — see substringRemovalIntervalsBy
    def occ(df: DataFrame) = df
      .select(col(idCol).as("__doc"), col(textCol).as("__t"))
      .select(col("__doc"),
        posexplode(TextOps.charNgrams(col("__t"), gramLen))
          .as(Seq("__p0", "__gram")))
      .select(col("__doc"), (col("__p0") + 1).as("pos"),
        md5(col("__gram")).as("__g"))
    val benchGrams = occ(bench).select("__g").distinct()
    val rem = occ(corpus)
      .join(benchGrams, Seq("__g"), "left_semi")
      .select(col("__doc"), col("pos"), (col("pos") + gramLen).as("__e"))
    val byDoc = Window.partitionBy("__doc").orderBy("pos")
    val runMaxEnd = max(col("__e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val iv = rem
      .withColumn("__ni",
        when(col("pos") > coalesce(runMaxEnd, lit(0)), 1).otherwise(0))
      .withColumn("__isl", sum("__ni").over(byDoc))
      .groupBy(col("__doc"), col("__isl"))
      .agg(min("pos").as("s"), max("__e").as("e"))
      .select(col("__doc").as(idCol), col("s"), col("e"))
    cutIntervals(corpus, idCol, textCol, iv)
  }
}
