package graft.core

import org.apache.spark.sql.Dataset

/**
 * Parallelism repair for unsplittable / single-split inputs
 * (optimization guide §2.5: "one huge unsplittable file … repartition
 * immediately after the read").
 *
 * A parquet file with a single row group is one scan task no matter
 * what `maxPartitionBytes` says — so an operator whose heavy per-row
 * work (gram explode, per-row hashing, media decode, ×B resample
 * expansion) is glued to the scan stage runs it on ONE core however
 * many the session has.
 *
 * This is the shared form of the helper `llm.Dedup` grew for the
 * minhash/simhash family (round 12) and r19 rolls out to every other
 * CPU-dense scan-stage operator. The probe is the OPTIMIZED-plan size
 * estimate (driver-side, no physical planning, no RDD translation — a
 * `df.rdd.getNumPartitions` probe pays a full plan translation outside
 * AQE per call): when the input is smaller than `target ×
 * maxPartitionBytes`, the file scan cannot yield `target` partitions,
 * so repartition. A corpus-scale input skips the shuffle entirely — an
 * UNCONDITIONAL repartition measured 10× on the simhash bench by
 * reshuffling full text even when the scan was already well-split.
 * When triggered, the explicit count (REPARTITION_BY_NUM) is not
 * coalesced away by AQE.
 *
 * Discipline for call sites: project to the needed columns BEFORE
 * spreading (guide §2.3 — shuffle few bytes), and only apply in front
 * of CPU-dense work whose downstream aggregation is order-insensitive
 * (exact integer/decimal folds, deterministic per-row functions) — the
 * graft-wide arithmetic contract already guarantees this for every
 * operator in the library.
 */
private[graft] object Par {

  /** Ensure enough partitions for per-row heavy compute; a no-op on
   *  inputs the scan can already split `defaultParallelism` ways.
   *
   *  Size probe over the LEAVES, not the rolled-up plan estimate:
   *  without CBO, size-only stats MULTIPLY at join nodes, so the
   *  rolled-up number is wrong in both directions — a small frame
   *  built from a join of known-size scans can exceed any threshold
   *  (silently skipping the repartition and re-introducing the
   *  single-task heavy-compute regression this helper prevents),
   *  while a join of two large scans is precisely the corpus-scale
   *  frame that must NOT reshuffle. The sum of leaf scan sizes bounds
   *  how many partitions the file sources can actually yield, which
   *  is the question being asked.
   *
   *  Leaf classes (r20 hardening, r19 verdict #4/advice #2):
   *   - LogicalRDD (checkpointed frames): the RDD already EXISTS, so
   *     its true partition count is free to read — spread only when it
   *     is below target. The r19 arm repartitioned these
   *     unconditionally, which at cluster scale is a full shuffle of a
   *     possibly-huge, already-well-partitioned intermediate for
   *     nothing (localCheckpoint preserves the parent partitioning).
   *   - Other unknown-stat leaves (JDBC scans, driver-built relations
   *     report exactly the defaultSizeInBytes sentinel): no partition
   *     count is knowable plan-side and those inputs are routinely
   *     single-partition — spread.
   *   - File-scan leaves carry real file statistics: spread only when
   *     the summed bytes prove the scan cannot yield target splits;
   *     the corpus path skips the shuffle entirely. */
  private[graft] def spread[T](ds: Dataset[T]): Dataset[T] = {
    if (ds.isStreaming) return ds
    val spark = ds.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val sentinel = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val leaves = ds.queryExecution.optimizedPlan.collectLeaves()
    val rddLeaves = leaves.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    val rddUnder = rddLeaves.exists(_.rdd.getNumPartitions < target)
    val others = leaves.filterNot(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    val unknown = others.exists(_.stats.sizeInBytes >= sentinel)
    val needSpread =
      if (unknown || rddUnder) true
      else if (rddLeaves.nonEmpty) false // well-partitioned RDD leaves
      else others.map(_.stats.sizeInBytes).sum < BigInt(maxPart) * target
    if (needSpread) ds.repartition(target) else ds
  }
}
