package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines (north-star extension;
  * the reference has no text surface): assign documents to fixed
  * token-budget bins — the batch-assembly step between a curated corpus
  * and an LLM training run, where short documents are concatenated up to
  * the context length so no sequence slot is wasted.
  *
  * The packing rule is OFFSET packing, the concat-and-chunk scheme the
  * big public training pipelines use: lay the documents out in a pinned
  * total order, cut the concatenated token stream every `budget` tokens,
  * and assign each document to the bin where it STARTS
  * (`bin = floor(tokens_before / budget)`). Unlike first-fit bin
  * packing — whose bin boundary depends on every previous assignment and
  * therefore serializes — offset packing is one window cumulative sum:
  * embarrassingly parallel, deterministic under retries, and
  * re-derivable by any ANSI engine (the `q_pack` value oracle). A bin
  * can overshoot `budget` by at most its last document's tokens (the
  * straddling doc belongs to the bin where it starts); real packers
  * split that document across the boundary, which is a row-local
  * `posexplode` of the token array downstream of this assignment.
  *
  * Scale shape: packing is per SHARD (`shardCol` — a date, a source, a
  * mixture component): the window partitions by shard and orders by
  * `orderCol` within it, so the sort is a shard-local shuffle, never a
  * global single-partition order. At 100 TB pick shards of a few GB
  * (the natural mixture/date granularity); a global pack order across
  * shards is meaningless for training anyway — batches sample across
  * bins.
  */
object Packing {

  /** Bin assignment: every row of `df` with its shard, running token
    * offset, and bin id. `tokens` is any Column (e.g.
    * [[TextOps.tokenCount]] for budget accounting, or a real
    * [[graft.functions.Bpe]] count).
    *
    * Output columns: all input columns + `tokens`, `offset` (tokens
    * before this doc within its shard), `bin` (0-based per shard).
    */
  def packByOffset(df: DataFrame, shardCol: String, orderCol: String,
      tokens: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 (got $budget)")
    // fail fast instead of silently overwriting caller data: the output
    // contract is "all input columns PLUS tokens/offset/bin"
    val clash = df.columns.toSet.intersect(Set("tokens", "offset", "bin"))
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename " +
        "them before packing (the packing output claims those names)")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens", tokens.cast("long"))
      .withColumn("offset",
        coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("offset") / budget).cast("long"))
  }

  /** Per-bin packing report over a [[packByOffset]] assignment: documents
    * per bin, token fill, and fill ratio against the budget — the
    * packing-efficiency audit (mean fill ratio ≈ 1 means no wasted
    * context slots; the last bin of a shard is naturally partial).
    */
  def binStats(packed: DataFrame, shardCol: String,
      budget: Int): DataFrame =
    packed.groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum("tokens").as("bin_tokens"))
      .withColumn("fill_ratio", col("bin_tokens") / lit(budget.toDouble))

  /** The boundary-splitting step real packers add on top of
    * [[packByOffset]]: each document's token range
    * `[offset, offset + tokens)` is cut at every bin boundary it
    * crosses, yielding one row per (document, bin) piece — `doc_from`
    * (0-based token index within the document where the piece starts)
    * and `piece_tokens` (its length). Downstream, a sequence builder
    * groups pieces by bin in offset order and slices each document's
    * token array accordingly; by construction every bin then holds
    * exactly `budget` tokens (except each shard's last).
    *
    * Pure row-local arithmetic on the packed frame — an `explode` over
    * the ≤ ⌈tokens/budget⌉ + 1 bins a document overlaps, no extra
    * shuffle; zero-token documents contribute no pieces.
    */
  def chunkSpans(packed: DataFrame, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 (got $budget)")
    val end = col("offset") + col("tokens") // exclusive
    // the budget is re-supplied rather than carried by the frame; a
    // value mismatched with the packByOffset call would silently emit
    // pieces inconsistent with the `bin` assignment — re-derive the
    // first bin and fail loudly if it disagrees
    val firstBin = when(
      floor(col("offset") / budget).cast("long") === col("bin"),
      col("bin")).otherwise(raise_error(concat(
        lit(s"chunkSpans: budget $budget disagrees with the packed " +
          "frame's bin assignment (packed with a different budget?) "),
        lit("at offset "), col("offset").cast("string"))))
    val lastBin = floor((end - 1) / budget).cast("long")
    packed
      .filter(col("tokens") > 0)
      .withColumn("piece_bin", explode(sequence(firstBin, lastBin)))
      .withColumn("piece_from",
        greatest(col("offset"), col("piece_bin") * budget))
      .withColumn("doc_from", (col("piece_from") - col("offset")))
      .withColumn("piece_tokens",
        least(end, (col("piece_bin") + 1) * budget) - col("piece_from"))
      .drop("piece_from")
  }

  /** The LAST step of the sequence-builder flow: group [[chunkSpans]]
    * pieces by (shard, bin) and emit each bin's concatenated token-id
    * sequence — the training-batch artifact itself. `idsCol` is each
    * document's full token-id array (e.g.
    * [[graft.functions.Bpe.tokenIds]]; its length MUST equal the
    * `tokens` count the frame was packed with, or slices misalign);
    * each piece contributes `ids[doc_from, doc_from + piece_tokens)`,
    * pieces concatenate in offset order, and by [[chunkSpans]]'
    * construction every bin except each shard's last assembles to
    * exactly `budget` tokens.
    *
    * Output: `shardCol`, `bin`, `n_pieces`, `bin_tokens` (= the
    * assembled length), `first_piece` / `last_piece` (`orderCol` of the
    * bin's first/last piece — `orderCol` ordering is offset ordering
    * within a shard, so plain min/max), `token_ids`.
    *
    * Scale shape: one shuffle on (shard, bin); per-group state is the
    * bin's own ≤ budget + last-doc-overshoot tokens — bounded by the
    * CONTEXT LENGTH, not the corpus — so group skew cannot exist by
    * construction. The in-bin ordering does not rely on collect_list's
    * arrival order (nondeterministic after a shuffle): pieces sort by
    * their in-shard offset inside the aggregate.
    */
  def assembleBins(pieces: DataFrame, shardCol: String,
      orderCol: String, idsCol: String): DataFrame =
    pieces
      // an ids array shorter/longer than the `tokens` the frame was
      // packed with would silently mis-slice every downstream bin —
      // fail loudly instead (the chunkSpans budget guard's sibling)
      .withColumn("__piece_ids",
        when(size(col(idsCol)).cast("long") === col("tokens"),
          slice(col(idsCol), (col("doc_from") + 1).cast("int"),
            col("piece_tokens").cast("int")))
          .otherwise(raise_error(concat(
            lit("assembleBins: doc "), col(orderCol).cast("string"),
            lit(" carries "), size(col(idsCol)).cast("string"),
            lit(" ids but was packed with tokens="),
            col("tokens").cast("string")))))
      .groupBy(col(shardCol), col("piece_bin").as("bin"))
      .agg(
        count(lit(1)).as("n_pieces"),
        sum("piece_tokens").as("bin_tokens"),
        min(orderCol).as("first_piece"),
        max(orderCol).as("last_piece"),
        flatten(transform(
          array_sort(collect_list(struct(
            // offset + doc_from orders SPLIT pieces of one doc too:
            // they share the doc's offset but cut at increasing doc_from
            (col("offset") + col("doc_from")).as("__at"),
            col("__piece_ids").as("__ids")))),
          s => s("__ids"))).as("token_ids"))

  /** The per-bin DOCUMENT-BOUNDARY table of a packed corpus — the
    * attention-mask artifact a trainer consumes next to
    * [[assembleBins]]' token payload: one row per (shard, bin, piece)
    * with the piece's start position INSIDE the assembled bin
    * (`bin_from`, 0-based) alongside its document id, in-document start
    * and length, in the same offset order the ids concatenated in. A
    * training consumer resets position ids and masks cross-document
    * attention exactly at these boundaries without re-deriving the cut;
    * by [[chunkSpans]]' construction consecutive pieces abut
    * (`bin_from` + `piece_tokens` = the next piece's `bin_from`) and
    * each bin's first piece starts at 0.
    *
    * Scale shape: one window per (shard, bin) partition — per-group
    * state is the bin's own piece list, bounded by the CONTEXT LENGTH
    * worth of documents, never the corpus; same shuffle key as
    * [[assembleBins]], so the two artifacts co-partition when derived
    * in one job.
    *
    * Output: `shardCol`, `bin`, `orderCol` (the document), `doc_from`,
    * `piece_tokens`, `bin_from`.
    */
  def binBoundaries(pieces: DataFrame, shardCol: String,
      orderCol: String): DataFrame = {
    // offset + doc_from orders split pieces of one doc too (they share
    // the doc's offset but cut at increasing doc_from) — the SAME
    // in-bin order assembleBins concatenates by, so boundaries and
    // payload can never disagree
    val w = Window.partitionBy(col(shardCol), col("piece_bin"))
      .orderBy(col("offset") + col("doc_from"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pieces
      .withColumn("bin_from",
        coalesce(sum(col("piece_tokens")).over(w), lit(0L)))
      .select(col(shardCol), col("piece_bin").as("bin"), col(orderCol),
        col("doc_from"), col("piece_tokens"), col("bin_from"))
  }

  /** The seeded epoch-ordering key of a (shard, bin) pair — the md5
    * 48-bit hash fraction ([[Sampling.hashBucket48]], so any engine
    * replays it bit-for-bit) over the `seed:epoch:shard:bin` composite.
    * Exposed separately from [[epochShuffle]] so a writer can
    * `repartitionByRange` on it directly.
    */
  def epochKey(shard: Column, bin: Column, seed: Long,
      epoch: Int): Column =
    Sampling.hashBucket48(concat_ws(":", lit(seed), lit(epoch),
      shard.cast("string"), bin.cast("string")))

  /** Deterministic EPOCH SHUFFLE over assembled training bins: each
    * training epoch visits the bins in a fresh pseudo-random order, and
    * that order is a pure function of (seed, epoch, shard, bin) — no
    * RNG state, so retries, re-runs and any engine reproduce the same
    * permutation ([[Sampling.hashSample]]'s determinism discipline
    * applied to ordering instead of inclusion). Appends `epoch_key` and
    * returns the frame globally ordered by (key, shard, bin — the
    * tie-break making the order total even on hash collisions).
    *
    * Scale shape: ONE range-partitioned distributed sort — the
    * standard epoch shuffle — never a single-partition window; there
    * is deliberately no materialised global position column, because
    * computing one (`row_number` over everything) would serialize.
    * Downstream a writer lands the sorted frame and readers consume
    * files in order; a per-partition position is `monotonically
    * _increasing_id` on the sorted result if needed.
    */
  def epochShuffle(bins: DataFrame, shardCol: String, binCol: String,
      seed: Long, epoch: Int): DataFrame = {
    require(!bins.columns.contains("epoch_key"),
      "input already has an epoch_key column — rename it before " +
        "shuffling (the output claims that name)")
    bins.withColumn("epoch_key",
        epochKey(col(shardCol), col(binCol), seed, epoch))
      .orderBy(col("epoch_key"), col(shardCol), col(binCol))
  }

  /** Overlapping STRIDING windows over a per-doc token-id array — the
    * long-document counterpart to bin packing (tokenizer "overflow
    * with stride": window `j` covers ids `[j·stride, j·stride+window)`,
    * so consecutive windows share `window − stride` tokens of context).
    * Windows are emitted while they add new tokens:
    * `n = 1 + ceil((len − window)/stride)` for `len > window`, else
    * one window; empty arrays yield no rows. Output: one row per
    * (doc, window, position) — (`idCol`, `win_no` 0-based, `pos`
    * 1-based within the window, `token_id`) — row-local `slice` +
    * two generators, zero shuffles, trivially parallel at any corpus
    * size.
    */
  def tokenWindows(df: DataFrame, idCol: String, idsCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val len = size(col("__ids"))
    val nWin = when(len <= window, lit(1)).otherwise(
      lit(1) + ceil((len - window).cast("double") / stride).cast("int"))
    df.select(col(idCol), col(idsCol).as("__ids"))
      .filter(size(col("__ids")) > 0)
      .select(col(idCol), col("__ids"),
        explode(sequence(lit(0), nWin - 1)).as("win_no"))
      .select(col(idCol), col("win_no"),
        posexplode(slice(col("__ids"), col("win_no") * stride + 1,
          lit(window))).as(Seq("__p", "token_id")))
      .select(col(idCol), col("win_no"), (col("__p") + 1).as("pos"),
        col("token_id"))
  }

  /** The next power of two ≥ `n` (`n` ≥ 0; 0 → 0, 1 → 1) by EXACT
    * integer arithmetic: the bit length of `n − 1` via the `bin()`
    * string (both Spark and DuckDB render a bigint's binary digits
    * without leading zeros) drives a left shift — no `log2`/`pow`, so
    * no library-specific transcendental rounding anywhere.
    */
  def pow2Cap(n: Column): Column = {
    val nl = n.cast("bigint")
    when(nl <= 1L, nl)
      .otherwise(call_function("shiftleft", lit(1L),
        length(bin(nl - 1)).cast("int")))
  }

  /** PADDING-WASTE audit for length-bucketed batching — the standard
    * serving/training batch-shaper (bucket sequences by length so a
    * batch pads to its bucket cap, not the global max): assign every
    * document to its power-of-two token-length bucket and report, per
    * bucket cap, the document count, the real token mass, the padded
    * mass (`n_docs · cap`) and the waste fraction — the number that
    * decides whether a bucketing (or a packing) stage pays for itself
    * at the next training run. All integers except the one final
    * divide. Output: (`cap`, `n_docs`, `sum_tokens`, `padded_tokens`,
    * `waste_frac`), one row per occupied bucket.
    *
    * Scale shape: one narrow projection + ONE map-side-partial hash
    * aggregate to ~log₂(max dl) rows — nothing scales with the corpus
    * beyond the scan.
    */
  def lengthBuckets(df: DataFrame, tokens: Column): DataFrame = {
    val t = tokens.cast("bigint")
    df.select(pow2Cap(t).as("cap"), t.as("__n"))
      .groupBy("cap")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("sum_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("cap"))
      .withColumn("waste_frac",
        when(col("padded_tokens") === 0L, lit(0.0)).otherwise(
          (col("padded_tokens") - col("sum_tokens")).cast("double") /
            col("padded_tokens").cast("double")))
  }
}
