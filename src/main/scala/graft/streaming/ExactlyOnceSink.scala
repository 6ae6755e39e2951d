package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once landing of a streaming frame into a parquet lake via
  * `foreachBatch`.
  *
  * Structured Streaming's contract is exactly-once STATE but
  * at-least-once SINK side effects: after a crash between "sink wrote"
  * and "checkpoint committed", the next run REPLAYS the last micro-batch
  * with the same `batchId`. A plain `.format("parquet")` append would
  * duplicate those rows. The standard transactionless-lake fix, used
  * here: make the write idempotent on `batchId` — every batch lands in
  * its own `__batch_id=` partition with dynamic partition overwrite, so
  * a replay REPLACES its own partition instead of appending next to it.
  * Readers see at most one copy of every batch; the partition column
  * doubles as write provenance.
  *
  * Scale notes: one partition directory per micro-batch is the natural
  * layout for a streaming lake (compaction can fold them later); the
  * overwrite touches ONLY the replayed batch's partition (dynamic mode),
  * never the table. For a transactional table format the same
  * `foreachBatch` hook is where a MERGE keyed on (batchId, key) would
  * go — the parquet variant keeps the sandbox dependency-free.
  */
object ExactlyOnceSink {

  val BatchIdCol = "__batch_id"

  /** The idempotent per-batch writer: exposed separately so a driver
    * replay (same `batchId`, same data) can be exercised directly —
    * calling it twice must leave the target byte-identical.
    */
  def writeBatch(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn(BatchIdCol, lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(BatchIdCol)
      .parquet(path)

  /** Start `stream` → `path` with exactly-once delivery under replays.
    * `checkpoint` carries the batch ledger: a restart with the same
    * checkpoint re-runs at most the one uncommitted batch, whose write
    * is idempotent by construction.
    */
  def start(stream: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch(writeBatch(path) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
