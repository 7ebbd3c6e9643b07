package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/**
 * Change stream → materialized table. The reference's only unbounded
 * source is the Mongo change stream (goetl `readers/mongo.go:703-730`),
 * which tails insert/update/delete events into the same record loop;
 * the connector jar is absent in this environment, so the CAPABILITY is
 * expressed generically: a FILE-BACKED change feed (each record = full
 * row image + operation + version) applied through Structured Streaming
 * into a continuously-maintained snapshot table. Any CDC source that
 * can land records in files (Debezium dumps, Mongo change-stream
 * exports, WAL shippers) feeds this unchanged.
 *
 * Feed contract: every record carries the full row image, `opCol` ∈
 * {"I","U","D"} (insert / update / delete), and a `versionCol` that is
 * monotonically comparable PER KEY (event timestamp, LSN, oplog ts) and
 * unique per key — two changes to one key must not share a version, or
 * which wins is undefined.
 *
 * Application is ORDER-INDEPENDENT and IDEMPOTENT by construction: a
 * change is applied only when its version exceeds the materialized
 * row's. Micro-batch boundaries, file listing order, and at-least-once
 * replays all converge to the same table — the property that lets the
 * feed be re-chunked or re-delivered freely at 100 TB. DELETEs are kept
 * as TOMBSTONES inside the maintained state (a late-arriving earlier
 * UPDATE must not resurrect a deleted row) and filtered from the
 * returned snapshot.
 *
 * Scale posture: each micro-batch does one window (latest-per-key
 * within the batch, shuffled on the keys) and one key-shuffled
 * merge-join against the snapshot, then rewrites the snapshot — the
 * MERGE INTO shape. The full-rewrite-per-batch is the no-dependency
 * stand-in for a table format with file-level pruning (Delta/Iceberg
 * merge rewrites only matched files); the join itself is the same.
 * Nothing ever collects to the driver.
 */
object ChangeFeed {

  /**
   * Apply the change feed at `feedPath` (parquet, schema `schema`) into
   * a parquet-materialized snapshot under `workDir`, returning the
   * final snapshot (tombstones filtered, full row images + `opCol` /
   * `versionCol` dropped). One-shot `Trigger.AvailableNow` — process
   * everything currently in the feed, then return; a long-running
   * deployment would use the same sink function under a continuous
   * trigger. RE-ENTRANT on the same `workDir`: the checkpoint skips
   * already-applied feed files and the snapshot recovers from the
   * last `_SUCCESS`-committed generation, so calling again after new
   * feed files land applies just the delta — the incremental-CDC
   * cadence. LIFETIME caveat: each call's returned frame lazily reads
   * the CURRENT snapshot generation, and the next re-entrant call on
   * the same `workDir` deletes superseded generations — consume (or
   * copy out) the previous result before re-entering.
   */
  def materialize(spark: SparkSession, feedPath: String, schema: StructType,
                  keys: Seq[String], opCol: String, versionCol: String,
                  workDir: String,
                  statePartitions: Option[Int] = None,
                  sourceOptions: Map[String, String] = Map.empty): DataFrame = {
    require(keys.nonEmpty, "ChangeFeed needs at least one key column")
    val hconf = spark.sparkContext.hadoopConfiguration
    // generation-versioned snapshot dirs: parquet cannot be rewritten
    // in place while being read, so each batch writes snap_{n+1} from
    // snap_n, then snap_n is deleted.
    // RE-ENTRY with the same workDir is the incremental-CDC usage this
    // operator exists for (apply today's feed files onto yesterday's
    // snapshot): the checkpoint makes the file source skip
    // already-processed feed files, so the snapshot pointer must
    // RECOVER from disk — otherwise a second call would silently merge
    // new changes into nothing and return an empty table.
    val workPath = new org.apache.hadoop.fs.Path(workDir)
    val fs = workPath.getFileSystem(hconf)
    val recovered: (Option[String], Int) =
      if (!fs.exists(workPath)) (None, 0)
      else {
        // only _SUCCESS-marked generations are committed: a crash
        // mid-write leaves a torn snap_{n+1} (no marker) whose source
        // micro-batch the checkpoint will REPLAY — recovery must base
        // that replay on the last committed generation, not the torn
        // one (mode=overwrite then rewrites the torn dir harmlessly).
        // Foreign snap_-prefixed names (manual backups) are skipped,
        // not crashed on.
        val all = fs.listStatus(workPath).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith("snap_"))
        val snaps = all
          .flatMap(n => n.stripPrefix("snap_").toIntOption)
          .filter(g => fs.exists(
            new org.apache.hadoop.fs.Path(s"$workDir/snap_$g/_SUCCESS")))
        // snapshot dirs present but NONE committed means the commit
        // markers are unreadable (e.g. marksuccessfuljobs=false):
        // proceeding would silently merge new deltas into NOTHING and
        // drop all previously materialized history — fail loudly
        require(all.isEmpty || snaps.nonEmpty,
          s"ChangeFeed: $workDir holds snapshot dirs (${all.mkString(", ")}) " +
            "but no _SUCCESS-committed generation — refusing to discard " +
            "history (is mapreduce.fileoutputcommitter.marksuccessfuljobs off?)")
        if (snaps.isEmpty) (None, 0)
        else {
          // prune older committed generations orphaned by a crash
          // between snapshot write and predecessor delete — each is a
          // full table copy that no later run would otherwise remove
          snaps.filter(_ < snaps.max).foreach { g =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$workDir/snap_$g"), true)
          }
          (Some(s"$workDir/snap_${snaps.max}"), snaps.max)
        }
      }
    var current: Option[String] = recovered._1
    var gen: Int = recovered._2

    val applyBatch: (DataFrame, Long) => Unit = { (batch, _) =>
      if (!batch.isEmpty) {
        val sp = batch.sparkSession
        // latest change per key WITHIN the batch; version uniqueness is
        // the contract, the op tie-break only pins pathological feeds
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(versionCol).desc, col(opCol).desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val merged = current match {
          case None => latest
          case Some(p) =>
            // higher version wins; the EXISTING row wins version ties,
            // which makes at-least-once redelivery a no-op
            val prev = sp.read.schema(schema).parquet(p)
            prev.withColumn("__pri", lit(0))
              .unionByName(latest.withColumn("__pri", lit(1)))
              .withColumn("__rn", row_number().over(
                Window.partitionBy(keys.map(col): _*)
                  .orderBy(col(versionCol).desc, col("__pri").asc)))
              .filter(col("__rn") === 1).drop("__rn", "__pri")
        }
        val next = s"$workDir/snap_${gen + 1}"
        merged.write.mode("overwrite").parquet(next)
        // the write above materialized `merged`; only now is the
        // previous generation dead
        current.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          path.getFileSystem(hconf).delete(path, true)
        }
        current = Some(next)
        gen += 1
      }
    }

    Streaming.withConf(spark, "spark.sql.shuffle.partitions",
        statePartitions.map(_.toString)) {
      spark.readStream.schema(schema).options(sourceOptions).parquet(feedPath)
        .writeStream
        .option("checkpointLocation", s"$workDir/chk")
        .foreachBatch(applyBatch)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }

    val payload = schema.fieldNames.filterNot(n => n == opCol || n == versionCol)
    current match {
      case Some(p) =>
        spark.read.schema(schema).parquet(p)
          .filter(col(opCol) =!= "D")
          .select(payload.map(col).toIndexedSeq: _*)
      case None =>
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(schema.filter(f => payload.contains(f.name))))
    }
  }
}
