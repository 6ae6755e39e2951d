package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the lexical tier ([[Bm25]]) and the vector tier
  * (cosine / the IVF serving layouts) fused by Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009): `rrf(d) = Σ_lists
  * 1/(c + rank_list(d))`, the standard no-tuning fusion that
  * consistently beats either list alone and needs nothing but the
  * ranks — no score calibration across tiers (BM25 sums and cosines
  * are not comparable; ranks are).
  *
  * Scale shape: fusion consumes only the two |queries|·k rank frames
  * (never the corpus), joins them FULL OUTER on (query, doc) and cuts
  * per query with a window partitioned by query — work is bounded by
  * the batch's result rows. The rrf doubles derive from INTEGER ranks
  * by one divide and one add each, so — unlike the tier scores
  * themselves — any engine reproduces the fused scores bit-for-bit,
  * and `q_hybrid_rrf` value-gates them directly (no margin argument
  * needed at the fusion level).
  */
object Hybrid {

  /** Exact brute-force cosine top-k for a FRAME of queries — the
    * batch form of [[Similarity.cosineTopK]] and the vector side of
    * the hybrid gate: corpus × broadcast(queries) scored with the
    * shared codegen'd cosine, per-query cut a row_number window
    * (cosine DESC, id ASC — the recall audit's tie rules). Output:
    * (`qidCol`, `idCol`, `cosine`, `rank`). The correctness baseline;
    * swap in `queryIvfBatch` for the ANN path at corpus scale.
    */
  def cosineTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qVecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col(idCol))
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"),
        col(qVecCol).as("__qv"))))
      .withColumn("cosine", Similarity.cosine(col(vecCol), col("__qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as(qidCol), col(idCol), col("cosine"),
        col("rank").cast("int").as("rank"))
  }

  /** Reciprocal Rank Fusion of two ranked lists: both inputs carry
    * (`qidCol`, `idCol`, `rank`), the output the fused
    * (`qidCol`, `idCol`, `rrf`, `rank`) top-`k` per query. A document
    * absent from one list simply contributes nothing for it
    * (coalesce 0 — the published convention); ties in `rrf` (e.g. two
    * docs sharing the same single-list rank pattern) cut to the lower
    * id. `c` defaults to the paper's 60.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, qidCol: String, idCol: String,
      k: Int, c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(c >= 0, s"c must be >= 0, got $c")
    def side(df: DataFrame, as: String): DataFrame =
      df.select(col(qidCol), col(idCol), col("rank").as(as))
    def term(rank: Column): Column =
      coalesce(lit(1.0) / (lit(c) + rank).cast("double"), lit(0.0))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("rrf").desc, col(idCol))
    side(a, "__ra")
      .join(side(b, "__rb"), Seq(qidCol, idCol), "full_outer")
      .withColumn("rrf", term(col("__ra")) + term(col("__rb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("rrf"),
        col("rank").cast("int").as("rank"))
  }
}
