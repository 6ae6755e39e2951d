package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): pick the raw-corpus documents whose hashed n-gram
  * distribution looks most like a small high-quality TARGET corpus.
  * The published recipe, re-expressed Spark-first:
  *
  *   1. FEATURIZE every document into hashed n-gram buckets (unigrams
  *      + adjacent word bigrams, md5-48bit mod `buckets` — the
  *      [[Classify.bigramFeatures]] hash, so any engine replays every
  *      bucket with the same nibble arithmetic).
  *   2. FIT two bag-of-hashed-ngrams unigram models — bucket count
  *      distributions over the target and the raw corpus. Each
  *      distributed pass is ONE explode + hash aggregation collapsing
  *      the corpus to at most `buckets` rows ([[bucketCounts]] — the
  *      tokenizer trainers' type-table shape); only that bounded table
  *      reaches the driver, so the fit scales to any corpus.
  *   3. SCORE each raw document with its log importance weight
  *      `log w = Σ_features (ln p̂_target[b] − ln p̂_raw[b])` — a
  *      narrow broadcast-model closure over the feature stream,
  *      stateless and streaming-safe like every serving UDF here.
  *   4. SELECT: either the deterministic top-k by weight (the paper's
  *      "top-k heuristic" baseline, [[selectTopK]] — a
  *      TakeOrderedAndProject, per-partition heaps, never a global
  *      sort) or importance RESAMPLING without replacement
  *      ([[resample]] — Gumbel-top-k in log space, the paper's main
  *      method, equivalent to Efraimidis–Spirakis with w = e^{log w}
  *      but immune to exp overflow on long documents).
  *
  * Probabilities are Laplace-smoothed with the SAME pinned op order as
  * [[Classify]] (`math.log((cnt + α) / (tot + α·buckets))` over
  * int→double divides), so the whole model is reproducible from the
  * two integer count tables — `q_dsir_model` value-checks those
  * integers cross-engine, `q_dsir_score` pins the production closure
  * against an independent in-query fold over the model's STORED
  * doubles, and `q_dsir_select` has DuckDB re-derive the entire chain
  * (counts → ln ratios → per-document sums → top-k) and demand the
  * same kept set.
  */
object Dsir {

  /** The hashed feature stream both fitting and scoring share: bucket
    * indices of the non-empty whitespace tokens in document order,
    * followed by one bucket per ADJACENT token pair (hash of
    * `"<a> <b>"` — the [[Classify.bigramFeatures]] construction, same
    * 48-bit md5 nibble hash [[Sampling.hashBucket48]], mod `buckets`).
    * Unigrams and bigrams deliberately SHARE the bucket space — hashed
    * feature collision is part of the published design (Xie et al.
    * §3.1), not an accident to engineer away; the bucket count bounds
    * model size regardless of corpus vocabulary. Null text stays null
    * (the serving UDFs' degrade-never-throw posture).
    */
  def featureBuckets(text: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val ft = filter(TextOps.tokens(text), t => length(t) > 0)
    val n = size(ft)
    def b(c: Column): Column =
      (Sampling.hashBucket48(c) % buckets).cast("int")
    val uni = transform(ft, t => b(t))
    val bg = zip_with(slice(ft, lit(1), n - 1), slice(ft, lit(2), n - 1),
      (x, y) => b(concat(x, lit(" "), y)))
    when(text.isNull, lit(null).cast("array<int>"))
      .otherwise(concat(uni,
        when(n <= 1, array().cast("array<int>")).otherwise(bg)))
  }

  /** The distributed half of fitting: bucket occurrence counts over a
    * corpus — one explode + hash aggregation to at most `buckets`
    * rows. Exposed as THE single definition the `q_dsir_model` gate
    * also renders.
    */
  def bucketCounts(df: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    df.select(explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** A fitted DSIR model: `logRatio(b)` = ln p̂_target[b] − ln
    * p̂_raw[b] for every bucket, Laplace-smoothed — driver/executor
    * state is exactly `buckets` doubles, never corpus-bounded.
    */
  final case class DsirModel(buckets: Int, logRatio: IndexedSeq[Double]) {
    require(logRatio.length == buckets,
      s"logRatio must have $buckets entries, got ${logRatio.length}")

    /** Position-ordered log importance weight of a featurized document
      * — THE scoring definition (seed 0.0, one add per bucket in
      * feature order), exposed so the parity gate's independent fold
      * provably replays the same sequence of IEEE adds.
      */
    def score(bucketSeq: Seq[Int]): Double = {
      var s = 0.0
      bucketSeq.foreach(b => s += logRatio(b))
      s
    }
  }

  /** Fit from the two corpora: collect both bounded [[bucketCounts]]
    * tables and assemble the `buckets` doubles driver-side. Op order
    * pinned to [[Classify.buildModel]]'s: each side's probability is
    * `math.log((cnt + α) / (tot + α·buckets))`, the ratio ONE
    * subtraction of the two logs — so the model is bit-reproducible
    * from the integer counts on any JVM.
    */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int, alpha: Double = 1.0): DsirModel = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    def counts(df: DataFrame): (Map[Int, Long], Long) = {
      val m = bucketCounts(df, textCol, buckets).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      (m, m.valuesIterator.sum)
    }
    val (tc, tTot) = counts(target)
    val (rc, rTot) = counts(raw)
    require(tTot > 0, "Dsir.fit: target corpus has no features — " +
      "every log ratio would be the smoothing floor and selection " +
      "would silently rank on document length alone")
    require(rTot > 0, "Dsir.fit: raw corpus has no features")
    def lp(cnt: Long, tot: Long): Double =
      math.log((cnt + alpha) / (tot + alpha * buckets))
    DsirModel(buckets, (0 until buckets).map(b =>
      lp(tc.getOrElse(b, 0L), tTot) - lp(rc.getOrElse(b, 0L), rTot)))
  }

  /** The model's stored per-bucket doubles as a frame — (`bucket`,
    * `log_ratio`) — so an INDEPENDENT query path can re-score
    * documents by joining these very values (no re-derivation of the
    * transcendentals) and folding them in position order. The
    * [[Classify.likDf]] pattern.
    */
  def logRatioDf(spark: SparkSession, model: DsirModel): DataFrame = {
    import spark.implicits._
    model.logRatio.zipWithIndex.map { case (v, b) => (b, v) }
      .toDF("bucket", "log_ratio")
  }

  /** The log importance weight as a narrow broadcast-model closure
    * over the featurized bucket array (null array → null weight) —
    * a model-sized ARRAY lookup inside a closure, never an inline
    * literal expression (the JIT-cliff shape), so the scan stays one
    * fused codegen stage at any bucket count.
    */
  def scoreUdf(model: DsirModel): Column => Column = {
    val f = udf { (bs: Seq[Int]) =>
      if (bs == null) None else Some(model.score(bs))
    }
    c => f(c)
  }

  /** Append `log_w` — each document's log importance weight under
    * `model` — to `df`. One narrow projected scan; featurization (the
    * md5 hashing) runs once per document.
    */
  def score(df: DataFrame, textCol: String, model: DsirModel): DataFrame =
    df.withColumn("log_w",
      scoreUdf(model)(featureBuckets(col(textCol), model.buckets)))

  /** The deterministic selection: the `k` documents with the largest
    * log importance weights (ties to the smaller `idCol` — a total
    * order, so the kept set is a pure function of the corpus). Plan
    * shape: narrow score projection + `TakeOrderedAndProject` —
    * per-partition top-k heaps then one k-row merge, never a global
    * sort shuffle. Output: `df`'s columns plus `log_w`.
    */
  def selectTopK(df: DataFrame, idCol: String, textCol: String,
      model: DsirModel, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    score(df, textCol, model)
      .orderBy(col("log_w").desc, col(idCol))
      .limit(k)
  }

  /** Persist a fitted model as one parquet sidecar (`$path/ratio`) —
    * the tokenizer/classifier families' persistence pattern: fit once,
    * serve from the artifact later. The stored doubles ARE the model
    * (no refit on load), so [[loadModel]] round-trips bit-exactly —
    * spec-pinned. The artifact is `buckets` rows, bounded by
    * construction.
    */
  def writeModel(spark: SparkSession, model: DsirModel,
      path: String): Unit =
    logRatioDf(spark, model).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/ratio")

  /** Load a model written by [[writeModel]]. The sidecar is
    * buckets-bounded — the collect contract every model load in this
    * package shares. A gap in the bucket sequence means a truncated
    * artifact; fail loudly rather than serve a floor of zeros.
    */
  def loadModel(spark: SparkSession, path: String): DsirModel = {
    val rows = spark.read.parquet(s"$path/ratio").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    require(rows.nonEmpty, s"no model found under $path/ratio")
    require(rows.map(_._1).toSeq == (0 until rows.length),
      s"truncated/corrupt DSIR artifact under $path/ratio: bucket ids " +
        s"are not 0..${rows.length - 1}")
    DsirModel(rows.length, rows.map(_._2).toIndexedSeq)
  }

  /** Importance RESAMPLING without replacement — the paper's main
    * selection rule: `k` documents drawn with probability ∝ their
    * importance weight, as deterministic Gumbel-top-k in log space via
    * [[Sampling.logWeightedReservoir]] (priority `ln(−ln u) − log w`
    * ascending — the Efraimidis–Spirakis exponential key with
    * w = e^{log w}, computed without ever exponentiating, so a long
    * document's weight cannot overflow). Same reproducibility contract
    * as [[Sampling.weightedReservoir]]: deterministic in the key
    * within Spark; cross-engine bit parity of the transcendental
    * priorities is documented non-contractual.
    */
  def resample(df: DataFrame, key: Column, textCol: String,
      model: DsirModel, k: Int): DataFrame =
    Sampling.logWeightedReservoir(score(df, textCol, model), key,
      col("log_w"), k)
}
