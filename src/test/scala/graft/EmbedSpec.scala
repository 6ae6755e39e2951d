package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Embed

/** Behavior checks for the embedding Gram statistics and the
  * driver-side PCA/whitening beyond the q_embed_cov oracle: exact
  * quantized sums on a hand fixture, eigensolver correctness and
  * determinism, basis orthonormality, variance recovery and whitening.
  */
class EmbedSpec extends SparkSpec {

  test("gramStats: exact quantized sums on a hand fixture") {
    val s = spark
    import s.implicits._
    // quantized at 2^20: 0.5 -> 524288, -0.25 -> -262144, 1.0 -> 2^20
    val df = Seq(Seq(0.5f, -0.25f), Seq(1.0f, 0.5f))
      .toDF("embedding")
    // read by NAME — the join chain reorders the key columns
    val byName = Embed.gramStats(df, "embedding").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r).toMap
    val q = 1048576L
    val x = Array(Array(q / 2, -q / 4), Array(q, q / 2))
    def m(i: Int, j: Int) = BigDecimal(x(0)(i)) * x(0)(j) +
      BigDecimal(x(1)(i)) * x(1)(j)
    Seq((0, 0), (0, 1), (1, 1)).foreach { case (i, j) =>
      val r = byName((i, j))
      assert(r.getAs[Long]("n") == 2L)
      assert(BigDecimal(r.getAs[java.math.BigDecimal]("m")) == m(i, j),
        s"m($i,$j)")
      assert(BigDecimal(r.getAs[java.math.BigDecimal]("s_i")) ==
        BigDecimal(x(0)(i)) + x(1)(i))
    }
    assert(byName.size == 3)
  }

  test("jacobiEigen: known spectrum, orthonormal, deterministic") {
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (vals, vecs) = Embed.jacobiEigen(a)
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall {
      case (g, w) => math.abs(g - w) < 1e-12 })
    // columns orthonormal
    val dot = (0 until 2).map(i =>
      vecs(i)(0) * vecs(i)(1)).sum
    assert(math.abs(dot) < 1e-12)
    // A v = lambda v for each column
    for (c <- 0 until 2) {
      for (r <- 0 until 2) {
        val av = (0 until 2).map(k => a(r)(k) * vecs(k)(c)).sum
        assert(math.abs(av - vals(c) * vecs(r)(c)) < 1e-10)
      }
    }
    val (vals2, vecs2) = Embed.jacobiEigen(a)
    assert(vals.sameElements(vals2) &&
      vecs.flatMap(_.toSeq).sameElements(vecs2.flatMap(_.toSeq)), "deterministic")
  }

  test("fitPca finds the correlated direction; projection variance " +
      "matches eigenvalues; whitening normalizes") {
    val s = spark
    import s.implicits._
    // strongly correlated 2-d cloud along (1, 1): deterministic points
    val pts = (0 until 400).map { i =>
      val t = (i % 100) / 50.0 - 1.0           // main direction
      val w = ((i * 7919) % 11 - 5) / 100.0    // small orthogonal noise
      Seq((t + w).toFloat, (t - w).toFloat)
    }
    val df = pts.toDF("embedding")
    val model = Embed.fitPca(df, "embedding", 2)
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1),
      model.eigenvalues.mkString(","))
    // first component ~ (1,1)/sqrt(2), sign-fixed positive
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 0.05 &&
      c0(0) > 0 && c0(1) > 0, c0.mkString(","))
    // population variance of each projected coordinate == eigenvalue
    val proj = Embed.project(df, "embedding", model).collect()
      .map(_.getSeq[Double](1))
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    for (c <- 0 until 2) {
      val v = variance(proj.map(_(c)).toSeq)
      assert(math.abs(v - model.eigenvalues(c)) <
        1e-6 + 0.01 * model.eigenvalues(c), s"component $c: $v")
    }
    // whitening: every kept direction has ~unit variance
    val white = Embed.project(df, "embedding", model, whiten = true)
      .collect().map(_.getSeq[Double](1))
    for (c <- 0 until 2) {
      val v = variance(white.map(_(c)).toSeq)
      assert(math.abs(v - 1.0) < 0.05, s"whitened component $c: $v")
    }
    // determinism across refits
    val model2 = Embed.fitPca(df, "embedding", 2)
    assert(model.components.flatMap(_.toSeq)
      .sameElements(model2.components.flatMap(_.toSeq)))
  }

  test("pcaStream: streamed projections equal the batch operator") {
    import graft.streaming.StreamMask
    val base = java.nio.file.Files
      .createTempDirectory("graft_pca_stream").toString
    val emb = spark.read.parquet(s"$fixtures/embeddings.parquet")
    val model = Embed.fitPca(emb, "embedding", 4)
    emb.write.parquet(s"$base/in")
    val schema = emb.schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val q = StreamMask.pcaStream(stream, "embedding", model,
        whiten = true)
      .select("vec_id", "pca")
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val streamed = key(spark.read.parquet(s"$base/out"))
    val batch = key(Embed.project(emb, "embedding", model,
      whiten = true).select("vec_id", "pca"))
    assert(streamed.nonEmpty && streamed == batch,
      "streamed PCA projections diverged from the batch operator")
  }

  test("gramStatsStream: folded landed per-batch stats equal the " +
      "full-corpus stats bit-for-bit") {
    import graft.streaming.{ExactlyOnceSink, StreamMask}
    val base = java.nio.file.Files
      .createTempDirectory("graft_gram_stream").toString
    val emb = spark.read.parquet(s"$fixtures/embeddings.parquet")
    // two files -> two micro-batches
    emb.filter(col("vec_id") % 2 === 0).write.parquet(s"$base/in/f0")
    emb.filter(col("vec_id") % 2 =!= 0).write.parquet(s"$base/in/f1")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(s"$base/in")
    val q = StreamMask.gramStatsStream(stream, "embedding",
      s"$base/out", s"$base/ckpt")
    q.awaitTermination(120000)
    val landed = spark.read.parquet(s"$base/out")
    assert(landed.select(ExactlyOnceSink.BatchIdCol).distinct().count()
      > 1, "expected more than one landed micro-batch")
    def key(x: org.apache.spark.sql.DataFrame) = x.collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("n"),
          BigDecimal(r.getAs[java.math.BigDecimal]("s_i")),
          BigDecimal(r.getAs[java.math.BigDecimal]("s_j")),
          BigDecimal(r.getAs[java.math.BigDecimal]("m")))))
      .toMap
    assert(key(Embed.foldGramStats(landed)) ==
      key(Embed.gramStats(emb, "embedding")),
      "folded streaming stats diverged from the full-corpus stats")
  }

  test("gramStatsStream survives poison vectors: null/NaN/wrong-dim " +
      "dropped per batch, folded stats equal the clean subset") {
    import graft.streaming.{ExactlyOnceSink, StreamMask}
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_gram_poison").toString
    val emb = spark.read.parquet(s"$fixtures/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") < 40)
    val d = emb.head().getAs[Seq[Float]]("embedding").length
    // clean file + a poison file: a null vector, a NaN element, a
    // wrong-dimension vector — each would throw in batch gramStats
    // and, inside foreachBatch, checkpoint-replay-wedge the stream
    emb.write.parquet(s"$base/in/f0")
    Seq(
      (90001L, null.asInstanceOf[Seq[Float]]),
      (90002L, Seq.fill(d)(Float.NaN)),
      (90003L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
      .unionByName(emb.filter(col("vec_id") < 3))
      .write.parquet(s"$base/in/f1")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(s"$base/in")
    val q = StreamMask.gramStatsStream(stream, "embedding",
      s"$base/out", s"$base/ckpt", expectDim = Some(d))
    q.awaitTermination(120000)
    val landed = spark.read.parquet(s"$base/out")
    assert(landed.select(ExactlyOnceSink.BatchIdCol).distinct().count()
      > 1, "expected both micro-batches to land (no wedge)")
    def key(x: org.apache.spark.sql.DataFrame) = x.collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("n"),
          BigDecimal(r.getAs[java.math.BigDecimal]("m")))))
      .toMap
    // clean subset = f0's 40 vectors + the 3 clean riders in f1
    // (keyed riders, not limit(3): limit picks plan-dependent rows)
    val clean = emb.unionByName(emb.filter(col("vec_id") < 3))
    assert(key(Embed.foldGramStats(landed)) ==
      key(Embed.gramStats(clean, "embedding")),
      "stats with poison dropped diverged from the clean subset's")
  }

  test("pcaStream drops null/wrong-dim vectors; project is null-safe " +
      "in batch but loud on dimension mismatch") {
    import graft.streaming.StreamMask
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$fixtures/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") < 10)
    val model = Embed.fitPca(
      spark.read.parquet(s"$fixtures/embeddings.parquet"),
      "embedding", 2)
    val poisoned = Seq(
      (90001L, null.asInstanceOf[Seq[Float]]),
      (90002L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding").unionByName(emb)
    // the streaming posture: malformed rows dropped, survivors equal
    // the batch operator on the clean subset (pcaStream is the shared
    // definition, so a plain batch call exercises the same filter)
    val served = StreamMask.pcaStream(poisoned, "embedding", model)
      .select("vec_id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val batch = Embed.project(emb, "embedding", model)
      .select("vec_id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(served == batch, "survivors diverged from batch projection")
    // batch contract: null in, null out; wrong dim fails loudly
    val nullOut = Embed.project(
      Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"),
      "embedding", model).select("pca").head()
    assert(nullOut.isNullAt(0), "null vector must project to null")
    val e = intercept[org.apache.spark.SparkException] {
      Embed.project(Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding"),
        "embedding", model).collect()
    }
    assert(e.getMessage.contains("dimension"), e.getMessage)
  }

  test("whitened embeddings compose with SemDeDup end-to-end") {
    import graft.pipeline.Dedup
    val emb = spark.read.parquet(s"$fixtures/embeddings.parquet")
    val model = Embed.fitPca(emb, "embedding", 8)
    val white = Embed.project(emb, "embedding", model, outCol = "w",
        whiten = true)
      .select(col("vec_id"), col("w").cast("array<float>").as("w"))
    val kept = Dedup.semDeDup(white, "vec_id", "w",
      threshold = 0.999, nCells = 4)
    val n = kept.count()
    assert(n > 0 && n <= emb.count(),
      s"whitened SemDeDup should keep a sane survivor set (got $n)")
    assert(kept.columns.contains("vec_id"))
  }

  test("mergeGramStats: incremental stats equal the full-corpus stats " +
      "exactly") {
    val df = spark.read.parquet(s"$fixtures/embeddings.parquet")
    val a = df.filter(col("vec_id") % 2 === 0)
    val b = df.filter(col("vec_id") % 2 =!= 0)
    def key(x: org.apache.spark.sql.DataFrame) = x.collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("n"),
          BigDecimal(r.getAs[java.math.BigDecimal]("s_i")),
          BigDecimal(r.getAs[java.math.BigDecimal]("s_j")),
          BigDecimal(r.getAs[java.math.BigDecimal]("m")))))
      .toMap
    val merged = key(Embed.mergeGramStats(
      Embed.gramStats(a, "embedding"), Embed.gramStats(b, "embedding")))
    val full = key(Embed.gramStats(df, "embedding"))
    assert(merged == full, "integer sums must merge exactly")
  }

  test("fitPca on the embeddings fixture: orthonormal basis, " +
      "descending eigenvalues") {
    val df = spark.read.parquet(s"$fixtures/embeddings.parquet")
    val model = Embed.fitPca(df, "embedding", 8)
    assert(model.d == 64 && model.k == 8)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1)),
      "eigenvalues must be descending")
    for (a <- 0 until 8; b <- a until 8) {
      val dot = (0 until 64)
        .map(i => model.components(a)(i) * model.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<$a,$b> = $dot")
    }
  }

  test("gramStats fails loudly on NaN/Inf/out-of-range elements") {
    val s = spark
    import s.implicits._
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, 5000.0f)) {
      val df = Seq(Seq(0.5f, bad)).toDF("embedding")
      val e = intercept[org.apache.spark.SparkException] {
        Embed.gramStats(df, "embedding").collect()
      }
      assert(e.getMessage.contains("gramStats"), s"bad=$bad")
    }
  }

  test("gramStats stays exact for large-magnitude elements (the " +
      "adaptive flush: one more row at max |x_q| would overflow a Long)") {
    val s = spark
    import s.implicits._
    // |x| near MaxAbs: maxq ~ 2^31, so Long partials overflow after
    // just 2 rows — only the magnitude-aware early flush keeps the
    // sums exact. 9 rows through one partition exercises it hard.
    val rows = (1 to 9).map(r =>
      Seq(2000.0f + r, -1999.5f - r, 0.25f))
    val df = rows.toDF("embedding").coalesce(1)
    val got = Embed.gramStats(df, "embedding").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r).toMap
    val xq = rows.map(_.map(x =>
      BigInt(math.floor(x.toDouble * Embed.Q).toLong)))
    for (i <- 0 until 3; j <- i until 3) {
      val wantM = xq.map(v => v(i) * v(j)).sum
      val r = got((i, j))
      assert(BigInt(r.getAs[java.math.BigDecimal]("m")
        .toBigInteger) == wantM, s"m($i,$j)")
      assert(BigInt(r.getAs[java.math.BigDecimal]("s_i")
        .toBigInteger) == xq.map(_(i)).sum, s"s_i($i,$j)")
      assert(r.getAs[Long]("n") == 9L)
    }
  }

  test("jacobiEigen: infinite theta (huge diagonal gap over a tiny " +
      "pivot) still annihilates instead of rotating 45 degrees") {
    // theta = (a11 - a00) / (2 a01) = -1e310 -> -Infinity
    val a = Array(Array(1e300, 1e-10), Array(1e-10, -1e300))
    val (vals, vecs) = Embed.jacobiEigen(a)
    assert(vals.sorted.zip(Seq(-1e300, 1e300)).forall {
      case (g, w) => math.abs(g - w) <= math.abs(w) * 1e-12 },
      vals.mkString(","))
    // eigenvectors stay ~axis-aligned: a 45-degree rotation would put
    // ~0.707 everywhere
    assert(vecs.flatten.forall(v =>
      math.abs(v) > 0.999 || math.abs(v) < 1e-3), vecs.flatten.mkString(","))
  }
}
