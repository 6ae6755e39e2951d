package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-matrix statistics and PCA/whitening — the standard
  * preprocessing in front of embedding dedup and ANN (SemDeDup — Abbas
  * et al. 2023 — clusters normalized embeddings; whitening decorrelates
  * dimensions so cosine thresholds mean the same thing in every
  * direction).
  *
  * Exactness contract (what makes the Gram gate oracle-able): every
  * element is quantized ONCE as `floor(x · 2^20)` — a power-of-two
  * multiply is EXACT in IEEE doubles, so the quantized value is a pure
  * function of the stored float bits and any engine reproduces it —
  * and every downstream statistic is an INTEGER sum of those integers
  * (decimal-38 aggregation, order-independent, overflow-free). The
  * covariance the eigensolver sees is the exact rational
  * (n·m_ij − s_i·s_j)/(n²·Q²) of those integers: deterministic across
  * runs, clusters and engines; the quantization error it carries is
  * ≤ ~2⁻²⁰ per element — noise far below any embedding model's own.
  *
  * Scale shape: [[gramStats]] folds a per-task d(d+1)/2 Long Gram
  * accumulator over each partition (`mapPartitions`, flushed every 2¹⁸
  * rows — or earlier, whenever the observed max |x_q| means one more
  * row could overflow a Long partial, so exactness holds for any
  * input inside the loudly-enforced |x| ≤ [[MaxAbs]] bound) and shuffles ONE
  * partial matrix per flush — O(partitions · d²) rows through the final
  * aggregate, never O(rows · d²). PCA itself is a driver-side d×d
  * Jacobi eigensolve (d ≤ ~4k is trivial); projection is a narrow
  * closure UDF (a model-sized literal expression would de-JIT the fused
  * stage).
  */
object Embed {

  /** Quantization scale: 2^20 (exact power-of-two multiply). */
  val Q: Double = 1048576.0

  /** Per-element magnitude bound: |x| ≤ 2^11 keeps every single
    * quantized product at (MaxAbs·Q)² = 2^62 < Long.Max — together
    * with the chunk-flush guard below, NO in-range input can overflow
    * a partial. Real embedding models emit |x| ≪ this; anything
    * larger (or NaN/Inf) is a data bug and fails loudly.
    */
  val MaxAbs: Double = 2048.0

  private val FlushEvery = 1 << 18

  /** Integer second-moment statistics of the quantized embedding
    * matrix: one row per dimension pair `(i, j)`, `0 ≤ i ≤ j < d`, with
    * `n` (rows), `s_i`, `s_j` (quantized column sums) and `m`
    * (Σ x_qi·x_qj) — everything an exact consumer needs for the mean,
    * Gram or covariance matrix. All decimals are exact integer sums.
    */
  def gramStats(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // (i, j, partial): j >= 0 pair product sums; (i, -1) column sums;
    // (-1, -1) row count — one tuple stream, chunk-flushed
    val partials = df.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { it =>
        var d = -1
        var sums: Array[Long] = null
        var prods: Array[Long] = null
        var cnt = 0L
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, Long)]
        def flush(): Unit = if (d >= 0 && cnt > 0) {
          var i = 0
          var p = 0
          while (i < d) {
            out += ((i, -1, sums(i)))
            var j = i
            while (j < d) {
              out += ((i, j, prods(p)))
              p += 1; j += 1
            }
            i += 1
          }
          out += ((-1, -1, cnt))
          java.util.Arrays.fill(sums, 0L)
          java.util.Arrays.fill(prods, 0L)
          cnt = 0L
        }
        val x = new Array[Long](0)
        var xq: Array[Long] = x
        // largest |quantized element| in the open chunk: a partial sum
        // of cnt products each bounded by maxq² stays overflow-free
        // while cnt < Long.Max / maxq², so we flush before that line —
        // the "exact, overflow-free" contract holds for ANY in-range
        // input, not just unit-scale embeddings
        var maxq = 0L
        def flushAndReset(): Unit = { flush(); maxq = 0L }
        it.foreach { v =>
          if (d < 0) {
            d = v.length
            sums = new Array[Long](d)
            prods = new Array[Long](d * (d + 1) / 2)
            xq = new Array[Long](d)
          }
          require(v.length == d,
            s"gramStats: ragged embedding (${v.length} vs $d)")
          var i = 0
          var rowMax = 0L
          while (i < d) {
            val e = v(i).toDouble
            // NaN would quantize silently to 0 and Infinity would
            // saturate; MaxAbs keeps every single product (MaxAbs·Q)²
            // inside a Long — fail loudly instead of corrupting stats
            require(java.lang.Double.isFinite(e) && math.abs(e) <= MaxAbs,
              s"gramStats: non-finite or out-of-range element $e " +
                s"(require finite, |x| <= $MaxAbs — normalize or clip " +
                "embeddings first)")
            xq(i) = math.floor(e * Q).toLong
            val a = math.abs(xq(i))
            if (a > rowMax) rowMax = a
            i += 1
          }
          // flush BEFORE accumulating if, with this row's magnitudes
          // included, any partial could pass Long.Max — checked against
          // the post-accumulate count, so (cnt+1)·maxq² < Long.Max is a
          // hard invariant (a fresh chunk always fits one row: a single
          // product is at most (MaxAbs·Q)² < Long.Max/2)
          if (rowMax > maxq) maxq = rowMax
          if (cnt > 0 && maxq > 1L &&
              cnt + 1 >= Long.MaxValue / (maxq * maxq)) {
            flushAndReset()
            maxq = rowMax
          }
          i = 0
          while (i < d) { sums(i) += xq(i); i += 1 }
          var p = 0
          i = 0
          while (i < d) {
            var j = i
            val xi = xq(i)
            while (j < d) { prods(p) += xi * xq(j); p += 1; j += 1 }
            i += 1
          }
          cnt += 1
          if (cnt >= FlushEvery) flushAndReset()
        }
        flushAndReset()
        out.iterator
      }
      .toDF("i", "j", "v")
    val agg = partials.groupBy(col("i"), col("j"))
      .agg(sum(col("v").cast(DecimalType(38, 0))).as("v"))
    val n = agg.filter(col("i") === -1 && col("j") === -1)
      .select(col("v").cast("long").as("n"))
    val colSums = agg.filter(col("i") >= 0 && col("j") === -1)
      .select(col("i").as("__d"), col("v").as("__s"))
    agg.filter(col("j") >= 0)
      .select(col("i"), col("j"), col("v").as("m"))
      .join(broadcast(colSums.withColumnRenamed("__d", "i")
        .withColumnRenamed("__s", "s_i")), Seq("i"))
      .join(broadcast(colSums.withColumnRenamed("__d", "j")
        .withColumnRenamed("__s", "s_j")), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), col("n"), col("s_i"), col("s_j"),
        col("m"))
  }

  /** Merge two [[gramStats]] frames — the statistics are pure integer
    * sums, so incremental maintenance is EXACT addition: keep the
    * corpus stats landed, fold each ingest batch's stats in, refit PCA
    * from the merged frame without rescanning the corpus (the same
    * append-don't-rebuild contract the IVF/BM25 index families have).
    */
  def mergeGramStats(a: DataFrame, b: DataFrame): DataFrame =
    foldGramStats(a.unionByName(b))

  /** Fold any number of [[gramStats]] partials (e.g. the exactly-once
    * landed per-micro-batch stats of a streaming ingest — extra columns
    * like the sink's `__batch_id` are ignored) back into one exact
    * stats frame: the statistics are integer sums, so the fold is
    * bit-exact regardless of how the corpus was sliced.
    */
  def foldGramStats(parts: DataFrame): DataFrame =
    parts
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("s_i")).as("s_i"),
        sum(col("s_j")).as("s_j"), sum(col("m")).as("m"))
      .select(col("i"), col("j"), col("n").cast("long").as("n"),
        col("s_i").cast(DecimalType(38, 0)).as("s_i"),
        col("s_j").cast(DecimalType(38, 0)).as("s_j"),
        col("m").cast(DecimalType(38, 0)).as("m"))

  /** A fitted PCA basis: per-dimension means (of the quantized values,
    * divided back by Q), components as rows (each length d, unit norm,
    * eigenvalue-descending), and the eigenvalues (covariance variances
    * along each component).
    */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** Fit a PCA basis from [[gramStats]]: exact integer stats → the
    * quantized covariance → cyclic Jacobi eigensolve on the driver
    * (deterministic: fixed sweep order, eigenvalue-descending with
    * index tie-break, sign fixed so each component's
    * largest-magnitude coordinate is positive).
    */
  def fitPca(df: DataFrame, vecCol: String, k: Int): PcaModel =
    fitPcaFromStats(gramStats(df, vecCol).collect(), k)

  /** The quantized covariance (with n and the per-dimension integer
    * sums) a collected [[gramStats]] frame encodes — the exact-integer
    * → one-rounded-double arithmetic [[fitPca]] eigensolves. Exposed
    * package-private so an auditor (`q_pca_trace_parity`) can derive
    * the covariance INDEPENDENTLY of the Jacobi output and check
    * trace/Rayleigh identities against the fitted model. The sums ride
    * along so [[fitPcaFromStats]] (which needs them for the mean) does
    * not rebuild them from the rows. Fresh arrays per call —
    * [[jacobiEigen]] copies, but callers may mutate.
    */
  private[graft] def covFromStats(rows: Array[org.apache.spark.sql.Row])
      : (Long, Array[Array[Double]], Array[BigDecimal]) = {
    require(rows.nonEmpty, "covFromStats: empty input")
    val n = rows.head.getAs[Long]("n")
    require(n >= 2, s"covFromStats: need at least 2 rows (got $n)")
    val d = rows.map(_.getAs[Int]("j")).max + 1
    val s = new Array[BigDecimal](d)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      s(r.getAs[Int]("i")) = BigDecimal(r.getAs[java.math.BigDecimal]("s_i"))
    }
    val nB = BigDecimal(n)
    val den = (nB * nB * BigDecimal(Q) * BigDecimal(Q)).toDouble
    rows.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
      val m = BigDecimal(r.getAs[java.math.BigDecimal]("m"))
      val c = ((nB * m - s(i) * s(j)).toDouble) / den
      cov(i)(j) = c; cov(j)(i) = c
    }
    (n, cov, s)
  }

  /** [[fitPca]] from an already-collected [[gramStats]] frame — lets a
    * caller that needs BOTH the stats and the model pay the stats
    * aggregation once.
    */
  private[graft] def fitPcaFromStats(rows: Array[org.apache.spark.sql.Row],
      k: Int): PcaModel = {
    val (n, cov, s) = covFromStats(rows)
    val d = cov.length
    require(k >= 1 && k <= d, s"fitPca: k must be in [1, $d] (got $k)")
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(d)(r => vecs(r)(c))
      // deterministic sign: largest-|coordinate| made positive
      val mx = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(mx) < 0) v.map(-_) else v
    }.toArray
    PcaModel(s.map(x => x.toDouble / (n * Q)), comps,
      order.map(vals).toArray)
  }

  /** Project embeddings onto a fitted basis: center, dot with each
    * component, optionally divide by √eigenvalue (whitening — unit
    * variance along every kept direction). Narrow closure UDF.
    *
    * A null vector projects to null (standard column semantics); a
    * WRONG-DIMENSION vector fails loudly — the batch fail-fast
    * contract (a silent truncated dot product would be a wrong answer;
    * [[graft.streaming.StreamMask.pcaStream]] adds the drop-malformed
    * posture a checkpointed stream needs instead).
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val mean = model.mean
    val comps = model.components
    val d = model.d
    val scale =
      if (whiten) model.eigenvalues.map(e => 1.0 / math.sqrt(math.max(e,
        java.lang.Double.MIN_NORMAL)))
      else Array.fill(comps.length)(1.0)
    val u = udf((v: Seq[Float]) => {
      if (v == null) null.asInstanceOf[Seq[Double]]
      else {
        require(v.length == d,
          s"project: embedding dimension ${v.length} != model d $d")
        val a = new Array[Double](comps.length)
        var c = 0
        while (c < comps.length) {
          var acc = 0.0
          var i = 0
          val w = comps(c)
          while (i < w.length) { acc += (v(i) - mean(i)) * w(i); i += 1 }
          a(c) = acc * scale(c)
          c += 1
        }
        a.toSeq
      }
    })
    df.withColumn(outCol, u(col(vecCol)))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvector columns). Deterministic: fixed (p, q)
    * sweep order, fixed convergence threshold, bounded sweeps.
    */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // tan φ by case (NR §11.1): θ = 0 → 45°; |θ| huge (θ² or θ
            // itself overflows) → t = 1/(2θ), computed as a_pq/Δdiag so
            // θ = ±Inf still yields the tiny annihilating rotation
            // instead of falling into the 45° arm via ±0.0
            val t =
              if (theta == 0.0) 1.0
              else if (math.abs(theta) > 1e150)
                a(p)(q) / (a(q)(q) - a(p)(p))
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
