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

  /** Banded LSH candidate pairs from signatures: concatenate `rowsPerBand`
    * consecutive hashes into a band signature, explode to (band, sig), and
    * self-join on equality — the bucket join that replaces the n² scan.
    * Returns distinct (id_a, id_b) with id_a < id_b.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val nBands = numHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat((0 until rowsPerBand)
          .map(r => col(s"h${b * rowsPerBand + r}")): _*).as("sig"))
    }
    val bands = sigs.select(col(idCol),
        explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("sig"))
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

  /** End-to-end near-duplicate pairs: shingle → MinHash → banded LSH →
    * exact-Jaccard verify ≥ `threshold`. The returned plan contains no
    * cartesian product at any stage.
    */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 8, rowsPerBand: Int = 2,
      shingleK: Int = 3): DataFrame = {
    // the shingle table feeds the signature aggregate, both sides of the
    // intersection join, and the size aggregate. It is deliberately NOT
    // persisted: the explode+distinct recomputes through whole-stage
    // codegen faster than a cache materializes (measured 2× at sf0.1), and
    // a 100 TB run would rather re-scan pruned parquet than spill a
    // shingle table bigger than the corpus — callers with expensive cold
    // sources can persist the input df upstream
    val sh = shingles(df, idCol, textCol, shingleK)
    val sigs = minHashSignatures(sh, idCol, numHashes)
    val cands = lshCandidates(sigs, idCol, numHashes, rowsPerBand)
    jaccardVerify(cands, sh, idCol)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_inter", "jaccard")
  }

  /** SimHash-based near-dup candidate groups: documents sharing an exact
    * 64-bit SimHash (Hamming distance 0). For distance ≤ k, band the hash
    * into k+1 chunks and bucket-join per chunk (same LSH shape as MinHash).
    */
  def simHashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextOps.simHash64(df, idCol, textCol)
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)
}
