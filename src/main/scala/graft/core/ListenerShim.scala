// Lives in an org.apache.spark subpackage solely to reach the
// private[spark] listener-bus drain used for metric attribution. No Spark
// internals are modified.
package org.apache.spark.graftshim

import org.apache.spark.SparkContext

object ListenerShim {
  /** Blocks until queued listener events are delivered (or timeout), so
    * per-query metric deltas read AFTER a query include its stages. */
  def drain(sc: SparkContext, timeoutMs: Long = 5000): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}

/** Block-manager disk + broadcast telemetry and the cleanup lever a long
  * board needs: shuffle files and broadcast blocks are reclaimed by
  * ContextCleaner, whose work queue only fills when WEAK REFERENCES are
  * enqueued — i.e. on garbage collection. A 128 GiB-heap board can run
  * whole minutes between collections while finished queries' shuffle
  * files pile up under the local dirs, polluting the page cache and
  * competing with live spill/shuffle I/O — the round-9 "board-context
  * inflation" suspect (q33/q130/q120 read ~2× their subset walls with
  * byte-identical shuffle). These helpers measure that accumulation and
  * drain it deterministically instead of waiting for heap pressure. */
object EnvShim {
  import org.apache.spark.SparkEnv

  private def dirSize(f: java.io.File): Long = {
    val kids = f.listFiles()
    if (kids == null) f.length()
    else kids.foldLeft(0L)((s, k) => s + (if (k.isDirectory) dirSize(k) else k.length()))
  }

  /** Bytes currently on disk under the block manager's local dirs —
    * finished shuffle files, disk-cached blocks, spill residue. */
  def localDirBytes(sc: SparkContext): Long =
    try SparkEnv.get.blockManager.diskBlockManager.localDirs.map(dirSize).sum
    catch { case _: Throwable => -1L }

  /** Broadcast blocks still registered with the block manager master. */
  def broadcastBlocks(sc: SparkContext): Int =
    try SparkEnv.get.blockManager.master
      .getMatchingBlockIds(_.isBroadcast, askStorageEndpoints = true).size
    catch { case _: Throwable => -1 }

  /** Nudges the cleaner: one System.gc() enqueues every dead shuffle /
    * broadcast / RDD weak reference, then ContextCleaner deletes their
    * files asynchronously — poll the local dirs while they shrink (100 ms
    * ticks, bounded by `waitMs`). Returns bytes remaining. */
  def drainDisk(sc: SparkContext, waitMs: Long = 3000): Long =
    drainPoll(() => localDirBytes(sc), () => System.gc(), waitMs)

  /** The [[drainDisk]] poll loop with its measurement, gc trigger, and
    * tick injectable — the spec hook that lets a scripted SLOW cleaner
    * (RPC-paced delete bursts with multi-tick pauses) prove the loop
    * rides out stalls instead of breaking early. The cleaner deletes in
    * bursts, so one static tick can read "done" mid-burst — require three
    * non-shrinking ticks, and spend one more gc if a pass stops shrinking
    * early (finalizer-promoted references often need the second
    * collection). */
  def drainPoll(
      measure: () => Long, gc: () => Unit, waitMs: Long,
      tickMs: Long = 100): Long = {
    gc()
    val deadline = System.currentTimeMillis() + waitMs
    var last = measure()
    var stale = 0
    var gcs = 1
    while (stale < 3 && System.currentTimeMillis() < deadline) {
      Thread.sleep(tickMs)
      val now = measure()
      if (now < last) stale = 0
      else {
        stale += 1
        if (stale == 2 && gcs < 2) { gc(); gcs += 1; stale = 0 }
      }
      last = now
    }
    last
  }
}
