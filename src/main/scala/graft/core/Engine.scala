package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session factory for the graft engine.
 *
 * Capability analogue of the reference's `Pipeline`/engine bootstrap
 * (goetl `pipeline/pipeline.go:68-159`), re-expressed as a configured
 * [[SparkSession]]: laziness + Catalyst replace the reference's pull loop.
 *
 * Scale posture: AQE on (runtime re-plan, skew-join handling, partition
 * coalescing), shuffle partitions sized for the deployment (32 for the
 * local[32] test rig; a real cluster overrides via `--conf`).
 */
object Engine {

  /** Scratch-column name that cannot collide with the frame's columns:
   *  `base`, then `base1`, `base2`, … — the shared helper behind every
   *  operator that adds temporary columns to caller-supplied frames
   *  (the caller may legitimately own a column named `__anything`). */
  private[graft] def freshColumn(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(nm => !df.columns.contains(nm)).get

  /** Apply graft's defaults to an arbitrary builder (cluster or local). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // Join strategy (optimization guide §3.1): let the planner pick a
    // shuffled hash join over sort-merge when its size conditions hold —
    // both sides still shuffle, but neither pays a sort, and the graft
    // operator suite is dominated by equi-self-joins over intermediate
    // relations (graph wedges, fuzzy-join blocks, binned intervals) whose
    // sorts are pure overhead. The AQE threshold converts SMJ→SHJ at
    // runtime from MEASURED partition sizes (initial-plan stats over
    // checkpointed intermediates are unknown, so the static preference
    // alone rarely fires): a ≤64 MB per-partition build fits comfortably
    // in any executor that can run Spark at all, and AQE skew-join
    // splitting (on, above) keeps a skewed partition from blowing past
    // it. Measured on the r19 baseline (sf0.1, local[32]): the ten
    // join-heavy gates dropped 60.8 s → 45.0 s (−26%) with every member
    // flat or faster; results hash-identical (join strategy is
    // result-invariant).
    //
    // Memory assumption (r20, documenting the r19 advice): SHJ build
    // relations do NOT spill, and a 64 MB shuffle partition inflates
    // several-fold as an in-memory HashedRelation (~3-4×), so with C
    // concurrent tasks per executor the worst case pins ~C × 256 MB of
    // execution memory. The threshold therefore assumes executors with
    // ≥ ~1 GB of memory PER CORE (e.g. 4 cores / 8 GB heap — the small
    // end of any realistic deployment; this repo's 128 GB / 32-thread
    // rig has 4× that). Deployments below that should lower the
    // threshold proportionally via --conf; AQE skew-join splitting
    // (on, above) caps the tail a skewed key would otherwise add.
    .config("spark.sql.join.preferSortMergeJoin", "false")
    .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
      (64L * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    // The test `events` table carries TIMESTAMP(NANOS), which Spark's
    // parquet reader rejects; read as long and convert (Tables below).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // One-shot verification streams (runBatchAsStream) use temporary
    // checkpoint dirs; delete them on stop so repeated gate/bench
    // invocations don't accumulate /tmp litter.
    .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")

  /** Local session for tests / bench (single JVM, `cores` threads).
   *  `maxPartitionBytes` is sized down for the small local test files
   *  (at 128 MB default every test table is one scan task); cluster
   *  deployments keep the Spark default via [[configure]]. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft",
            shufflePartitions: Int = 32,
            maxPartitionBytes: String = "4m"): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.warehouse.dir",
          s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Loader for the test star schema (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table of a scale-factor directory as a temp view,
   *  enabling `spark.sql("SELECT ... FROM lineitem")` over the test
   *  star schema. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      if (new java.io.File(s"$dir/$n.parquet").exists())
        apply(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Read one table from a scale-factor directory, with the events
   *  `ts` column normalized to session-zone TimestampType (see
   *  [[normalizeTs]] for the physical representations handled). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize a `ts` column to session-zone TimestampType across the
   *  physical representations the generated events table has shipped
   *  with: epoch-NANOS INT64 (TIMESTAMP(NANOS) under `nanosAsLong` —
   *  exact integer division to micros), TIMESTAMP_NTZ (micros,
   *  isAdjustedToUTC=false — cast reinterprets the wall-clock in the
   *  session zone, which is pinned to UTC, matching how DuckDB reads
   *  the same naive values), or already-zoned TimestampType
   *  (passthrough). Works on batch AND streaming frames — streaming
   *  gates read the PHYSICAL schema ([[rawSchema]]) and apply this
   *  inside the stream transform. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** A table's PHYSICAL parquet schema (nano timestamps as INT64 under
   *  `nanosAsLong`) — what `readStream` must be given, since the
   *  file-stream source reads exactly what is in the files. Config
   *  handling lives here with the rest of the table-loading policy,
   *  not in query code. */
  def rawSchema(spark: SparkSession, dir: String, name: String): org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet").schema
  }
}
