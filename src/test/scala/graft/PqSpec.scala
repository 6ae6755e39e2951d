package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Pq, Similarity}

/** Product quantization: code shape/compression, ADC scoring parity with
  * a driver-side reference, and candidate recall against brute force.
  */
class PqSpec extends SparkSpec {

  private def embeddings = spark.read.parquet(s"$fixtures/embeddings.parquet")

  // unit-normalized corpus (PQ approximates cosine on unit vectors);
  // double-precision arrays
  private def unitCorpus = embeddings
    .select(col("vec_id"), Pq.unit(col("embedding")).as("u"))

  test("codes are m signed bytes in [0, k) — 32x smaller than float32 at d=64") {
    val cb = Pq.train(unitCorpus, "vec_id", "u", m = 8, k = 16, iters = 0)
    assert(cb.m == 8 && cb.k == 16 && cb.subDim == 8)
    val coded = unitCorpus.select(col("vec_id"),
      Pq.encode(cb)(col("u")).as("codes"))
    assert(coded.schema("codes").dataType.simpleString == "array<tinyint>")
    val rows = coded.limit(50).collect()
    rows.foreach { r =>
      val cs = r.getSeq[Byte](1)
      assert(cs.length == 8)
      cs.foreach(c => assert(c >= 0 && c < 16))
    }
  }

  test("ADC column score equals the driver-side lookup-table sum") {
    val cb = Pq.train(unitCorpus, "vec_id", "u", m = 8, k = 16, iters = 1)
    val q = embeddings.filter(col("vec_id") === 7)
      .select("embedding").head.getSeq[Float](0)
    val got = unitCorpus.select(col("vec_id"),
        Pq.encode(cb)(col("u")).as("codes"))
      .withColumn("s", Pq.approxDot(cb, q)(col("codes")))
      .limit(100).collect()
    got.foreach { r =>
      val codes = r.getSeq[Byte](1)
      val want = (0 until cb.m).map { j =>
        val qj = q.slice(j * cb.subDim, (j + 1) * cb.subDim)
        qj.zip(cb.codebooks(j)(codes(j).toInt))
          .map { case (a, b) => a.toDouble * b.toDouble }.sum
      }.sum
      assert(math.abs(r.getDouble(2) - want) < 1e-9,
        s"vec ${r.get(0)}: adc ${r.getDouble(2)} vs ref $want")
    }
  }

  test("training is deterministic and reduces quantization error") {
    val a = Pq.train(unitCorpus, "vec_id", "u", m = 8, k = 16, iters = 0)
    val b = Pq.train(unitCorpus, "vec_id", "u", m = 8, k = 16, iters = 0)
    assert(a.codebooks.flatten.toSeq == b.codebooks.flatten.toSeq)
    // trained codebooks must reconstruct better than raw seeds: compare
    // mean squared reconstruction error via self-ADC (⟨x̂, x⟩ proxy is
    // monotone; use the exact MSE instead)
    def mse(cb: Pq.PqCodebooks): Double = {
      val rows = unitCorpus
        .select(col("u"), Pq.encode(cb)(col("u")).as("codes"))
        .collect()
      rows.map { r =>
        val x = r.getSeq[Double](0)
        val codes = r.getSeq[Byte](1)
        (0 until cb.m).flatMap { j =>
          val c = cb.codebooks(j)(codes(j).toInt)
          x.slice(j * cb.subDim, (j + 1) * cb.subDim).zip(c)
            .map { case (xi, ci) => (xi - ci) * (xi - ci) }
        }.sum
      }.sum / rows.length
    }
    val seeded = mse(a)
    val trained = mse(Pq.train(unitCorpus, "vec_id", "u", 8, 16, iters = 2))
    info(f"PQ MSE: seeds $seeded%.5f -> trained $trained%.5f")
    assert(trained < seeded,
      f"training should cut reconstruction MSE: $trained%.5f vs $seeded%.5f")
  }

  test("native pq_encode is codegen'd and bit-identical to the portable fold") {
    assert(spark.catalog.functionExists("pq_encode"),
      "GraftExtensions not registered in the test session")
    // double vectors (the unit-normalized training shape)
    val cb = Pq.train(unitCorpus, "vec_id", "u", m = 8, k = 16, iters = 1)
    val nat = unitCorpus.select(col("vec_id"),
      Pq.encode(cb)(col("u")).as("codes"))
    assert(nat.queryExecution.analyzed.toString.contains("pq_encode"),
      "Pq.encode did not pick the native expression")
    val fold = unitCorpus.select(col("vec_id"),
      Pq.encodeFold(cb)(col("u")).as("codes"))
    def codes(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Byte](1).toList)).toSeq
    assert(codes(nat) == codes(fold))
    // float vectors (the raw stored-embedding shape, q_pq's path)
    val cbF = Pq.train(embeddings, "vec_id", "embedding", m = 8, k = 16,
      iters = 0)
    val natF = embeddings.select(col("vec_id"),
      Pq.encode(cbF)(col("embedding")).as("codes"))
    val foldF = embeddings.select(col("vec_id"),
      Pq.encodeFold(cbF)(col("embedding")).as("codes"))
    assert(codes(natF) == codes(foldF))
  }

  test("native and fold encode both reject a mis-dimensioned vector") {
    import SparkSpec.spark.implicits._
    val cb = Pq.train(unitCorpus, "vec_id", "u", m = 8, k = 16, iters = 0)
    // 63 elements where the codebooks expect 64
    val bad = Seq((1L, (0 until 63).map(_.toFloat))).toDF("id", "v")
    def failure(c: org.apache.spark.sql.Column): String = {
      val e = intercept[Exception] {
        bad.select(c.as("codes")).collect()
      }
      // unwrap to the root message (Spark wraps executor exceptions)
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq.mkString("\n")
    }
    val nativeMsg = failure(Pq.encode(cb)(col("v")))
    val foldMsg = failure(Pq.encodeFold(cb)(col("v")))
    // both paths name the same contract violation — a pipeline cannot
    // change failure behavior by (de)registering GraftExtensions
    Seq(nativeMsg, foldMsg).foreach(m =>
      assert(m.contains("vector has 63 elements, codebooks expect 64"),
        s"unexpected failure message:\n$m"))
    // and a null vector passes through as null on both paths
    val nul = Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("id", "v")
    Seq(Pq.encode(cb)(col("v")), Pq.encodeFold(cb)(col("v"))).foreach { c =>
      assert(nul.select(c).head.isNullAt(0))
    }
  }

  test("ADC candidates recall the exact cosine top-k for reranking") {
    val cb = Pq.train(unitCorpus, "vec_id", "u", m = 8, k = 16, iters = 2)
    val coded = unitCorpus.select(col("vec_id"),
      Pq.encode(cb)(col("u")).as("codes"))
    val queries = Seq(3L, 17L, 42L).map { id =>
      embeddings.filter(col("vec_id") === id)
        .select("embedding").head.getSeq[Float](0)
    }
    val recalls = queries.map { q =>
      val truth = Similarity
        .cosineTopK(embeddings, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val cand = Pq.pqTopK(coded, "vec_id", "codes", cb, q, 50)
        .collect().map(_.getLong(0)).toSet
      truth.intersect(cand).size / 10.0
    }
    info(s"PQ recall@10-in-50: $recalls")
    recalls.foreach(r => assert(r >= 0.5,
      s"PQ candidate recall too low: $recalls"))
  }
}
