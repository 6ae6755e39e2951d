package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, and
  * decode/feature-extraction runs as a *partition-batched* transformation —
  * the executor-side loop a real codec would plug into.
  *
  * The actual byte decoding is STUBBED (this environment has no image/audio
  * codecs): [[StubCodec]] derives deterministic fake dimensions/features
  * from the bytes. Everything around it — the schema contract, the
  * mapPartitions batch shape, the narrow no-shuffle plan — is the real
  * production plumbing; swapping [[StubCodec]] for a JNI/javacpp codec
  * changes no query shape.
  */
object Multimodal {

  /** Typed media metadata carried next to the opaque payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** DETERMINISTIC STUB of a media decoder: "dimensions" are md5-nibble
    * functions of the payload, "features" a byte-histogram projection.
    * Stable across executors/retries, which is exactly the property a real
    * codec must also have.
    */
  object StubCodec {
    def meta(bytes: Array[Byte]): (String, Int, Int, Int) = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      def nib(i: Int): Int = (h(i / 2) >> (4 * (1 - i % 2))) & 0xf
      ("application/x-graft-stub",
        64 + nib(0) * 16 + nib(1), 64 + nib(2) * 16 + nib(3), 1 + nib(4))
    }
    /** Fake feature vector: dim-bucketed byte histogram, L1-normalised. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val counts = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { counts((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val total = math.max(bytes.length, 1).toFloat
      var j = 0
      while (j < dim) { counts(j) /= total; j += 1 }
      counts
    }
  }

  /** Stand-in payload column: the UTF-8 bytes of a text column (fixtures
    * carry no real media; the binary-column plumbing is what's exercised).
    */
  def payloadOf(text: Column): Column = text.cast("binary")

  /** Pure-Column metadata derivation (oracle-portable md5-nibble formulas —
    * mirrors [[StubCodec.meta]] for UTF-8 payloads).
    */
  def metaColumns(payload: Column): Seq[Column] = {
    def nib(i: Int): Column =
      conv(substring(md5(payload), i, 1), 16, 10).cast("int")
    Seq(octet_length(payload).as("n_bytes"),
      (nib(1) * 16 + nib(2) + 64).as("width"),
      (nib(3) * 16 + nib(4) + 64).as("height"),
      (nib(5) + 1).as("n_frames"))
  }

  /** Deterministic frame-sample stub: `n` byte offsets spread evenly
    * through the payload (a video codec would decode the frames at these
    * offsets). Pure Column arithmetic — the sampling plan is real, only
    * the frame decode behind it is stubbed.
    */
  def frameSampleOffsets(payload: Column, n: Int): Column = {
    // 64-bit arithmetic: octet_length is 32-bit and len*i overflows ANSI
    // int math for multi-GB payloads (the actual video use case)
    val len = octet_length(payload).cast("bigint")
    array((0 until n).map(i =>
      floor(len * lit(i.toLong) / lit(n.toLong)).cast("bigint")): _*)
  }

  /** "Resize" stub: re-derives the stub features at a different resolution
    * (bucket count). Mirrors how a real pipeline recomputes features after
    * a resize — same batched executor loop, different codec parameters.
    */
  def resizeFeatures(df: DataFrame, payloadCol: String,
      newDim: Int): DataFrame = decodePartitioned(df, payloadCol, newDim)

  /** Partition-batched decode: the executor-side loop that amortises codec
    * init across a whole partition (the `mapPartitions` analog of a
    * batch-iterating Pandas UDF). Narrow — no shuffle; output schema is
    * input + meta struct + `features array<float>`.
    */
  def decodePartitioned(df: DataFrame, payloadCol: String,
      featureDim: Int = 16): DataFrame = {
    val schema = df.schema
      .add("meta", mediaMetaType, nullable = false)
      .add("features", ArrayType(FloatType, containsNull = false),
        nullable = false)
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      // per-partition codec init would go here (once, not per row)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (mime, w, h, f) = StubCodec.meta(bytes)
        Row.fromSeq(r.toSeq :+ Row(mime, w, h, f) :+
          StubCodec.features(bytes, featureDim).toSeq)
      }
    }(enc)
  }
}
