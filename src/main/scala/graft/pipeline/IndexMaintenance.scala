package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe in-place table swap shared by the index compactors
  * ([[Dedup.compactNearDupIndex]], [[Similarity.compactIvfIndex]]) —
  * the same pending-marker discipline as
  * [[graft.streaming.ExactlyOnceSink.compact]], reduced to one whole
  * table: stage the rewritten table next to the live directory, write a
  * marker (the commit point — staging is complete from here on), delete
  * the live directory, rename staging into place, drop the marker.
  *
  * Interruption windows and their recovery, per table:
  *   - crash before the marker: the staging directory is an orphan (its
  *     rows still live in the real table) — [[recoverOrSweep]] deletes
  *     it;
  *   - crash after the marker (live possibly deleted, rename possibly
  *     not done): the marker proves staging was complete —
  *     [[recoverOrSweep]] finishes the delete + rename and drops the
  *     marker.
  * Callers run [[recoverOrSweep]] for every table BEFORE reading index
  * state, so a compaction interrupted at any point heals on the next
  * maintenance call. The dotted names are hidden from Spark's readers.
  *
  * FILESYSTEM REQUIREMENT (same as
  * [[graft.streaming.ExactlyOnceSink]]): the swap's correctness rests
  * on `fs.rename` of a directory being atomic, which holds on HDFS and
  * local filesystems. On object stores whose Hadoop connectors emulate
  * rename as a per-file copy loop (e.g. S3A), a crash mid-rename can
  * leave rows split between live and staging — and recovery would then
  * delete live (the already-moved half) before renaming the rest,
  * losing part of the compacted table. Run index compaction against an
  * atomic-rename filesystem, or front the object store with a
  * rename-atomic committer layer.
  */
private[pipeline] object IndexMaintenance {

  def stagingOf(live: Path): Path =
    new Path(live.getParent, s".__graft_idxcompact_${live.getName}")

  def markerOf(live: Path): Path =
    new Path(live.getParent, s".__graft_idxcompact_${live.getName}.pending")

  /** Heal an interrupted swap of `live` (see object doc). */
  def recoverOrSweep(fs: FileSystem, live: Path): Unit = {
    val stg = stagingOf(live)
    val mk = markerOf(live)
    if (fs.exists(mk)) {
      if (fs.exists(stg)) {
        if (fs.exists(live)) fs.delete(live, true)
        if (!fs.rename(stg, live))
          throw new java.io.IOException(
            s"index compaction recovery: rename $stg -> $live failed")
      }
      fs.delete(mk, false)
    } else if (fs.exists(stg)) fs.delete(stg, true)
    ()
  }

  /** Commit a FULLY-WRITTEN staging directory over `live`. */
  def swap(fs: FileSystem, live: Path): Unit = {
    val stg = stagingOf(live)
    val mk = markerOf(live)
    fs.create(mk, true).close()
    fs.delete(live, true)
    if (!fs.rename(stg, live))
      throw new java.io.IOException(
        s"index compaction: rename $stg -> $live failed")
    fs.delete(mk, false)
    ()
  }
}
