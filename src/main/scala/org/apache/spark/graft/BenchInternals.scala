package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.BroadcastBlockId

/**
 * Bench-only access to `private[spark]` block-manager surface. Lives in
 * an `org.apache.spark` subpackage because the APIs it needs are not
 * public; nothing here is used by any operator — only
 * [[graft.Bench]]'s between-measurement isolation and telemetry.
 *
 * Why it exists: `Bench.isolate()` unpersists leftover RDDs
 * synchronously, but BROADCAST blocks (every broadcast-hash-join's
 * build side, every lookup dim) are ContextCleaner-managed — they free
 * only when the driver GC collects the `Broadcast` object AND the async
 * cleaner queue drains. Across a 109-query suite that lag accumulates
 * storage pressure the isolated single-query runs never see (round 6's
 * artifact: q26 at 20.6 s in-suite vs 4.7 s isolated), so the bench
 * drops them deterministically instead of hoping the cleaner keeps up.
 */
object BenchInternals {

  /** Synchronously drop every broadcast's blocks (driver + executors —
   *  one JVM in local mode, but the call is cluster-correct). Safe
   *  between bench measurements: each measurement builds its plan
   *  fresh, so no live plan can re-read a dropped broadcast; a later
   *  ContextCleaner removal of the same id is a no-op. Returns the
   *  number of distinct broadcasts dropped. */
  def dropBroadcasts(sc: SparkContext): Int = {
    val master = sc.env.blockManager.master
    val ids = master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId], askStorageEndpoints = true)
      .collect { case b: BroadcastBlockId => b.broadcastId }.toSet
    ids.foreach(master.removeBroadcast(_, removeFromMaster = true, blocking = true))
    ids.size
  }

  /** Used storage memory across all block managers, MB — the
   *  "what did the previous queries leave behind" telemetry probe. */
  def storageUsedMB(sc: SparkContext): Double =
    sc.env.blockManager.master.getMemoryStatus.values
      .map { case (max, remaining) => (max - remaining) / (1024.0 * 1024.0) }.sum

  /** Block until the async listener bus has delivered every queued
   *  event — the determinism shim for asserting on
   *  QueryExecutionListener-driven state (PlanLint.install's report)
   *  right after an action: the bus is asynchronous, so without a
   *  drain a gate would race its own listener. Test/gate-only, like
   *  everything in this object. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
