package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Literal column for a query vector (broadcast as part of the plan). */
  def vecLit(v: Seq[Float]): Column = array(v.map(x => lit(x)): _*)

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

  /** LSH-filtered cosine top-k: only rows sharing ≥1 sign-band with the
    * query are scored. The band filter is a narrow predicate against
    * literal signatures — zero shuffle added over the scan.
    */
  def signBandTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nBands: Int = 16,
      bitsPerBand: Int = 4): DataFrame = {
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
  def signBandCandidates(df: DataFrame, idCol: String, vecCol: String,
      nBands: Int = 16, bitsPerBand: Int = 4): DataFrame = {
    val bands = df.select(col(idCol), posexplode(
        array(signBands(col(vecCol), nBands, bitsPerBand): _*))
      .as(Seq("band", "sig")))
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Embedding near-duplicate pairs: banded candidates + exact cosine ≥
    * threshold. No stage is quadratic in the corpus.
    */
  def nearDuplicateVectors(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBands: Int = 16, bitsPerBand: Int = 4): DataFrame = {
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    signBandCandidates(df, idCol, vecCol, nBands, bitsPerBand)
      .join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
