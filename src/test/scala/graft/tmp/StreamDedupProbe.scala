package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Scale probe for the q110 streaming-dedup family (VERDICT r7 #6):
 *  does watermark state eviction hold state (and per-batch wall) FLAT
 *  batch-over-batch as the feed scales in keys-per-hour?
 *
 *  Shape mirrors the q110 gate: one parquet file per hour of events,
 *  mtimes stamped chronologically (FileStreamSource lists by mtime),
 *  `maxFilesPerTrigger=1` so each micro-batch is exactly one hour,
 *  `dropDuplicatesWithinWatermark` on the key with a 1-hour watermark.
 *  Keys are unique per hour and each key appears 3× within its hour,
 *  so the correct output is exactly hours×keysPerHour rows and the
 *  state horizon is ~2 hours of keys (watermark delay + in-flight
 *  hour) REGARDLESS of how many hours stream by — the flat-state
 *  claim under test. Evidence comes from StreamingQueryProgress:
 *  per-batch triggerExecution wall and the dedup state operator's
 *  numRowsTotal / numRowsRemoved / memoryUsedBytes.
 */
object StreamDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hours = 24
    val root = java.nio.file.Files.createTempDirectory("sd_probe").toString
    // (scaleLabel, keysPerHour, rocksdb?)
    val configs = Seq(("1x", 5000, false), ("16x", 80000, false),
      ("64x", 320000, false), ("64x_rocksdb", 320000, true))
    configs.foreach { case (label, keysPerHour, rocks) =>
      val feed = s"$root/feed_$label"
      val dups = 3
      // one job per hour: exactly one parquet file per hour, named and
      // mtime-stamped so listing order == chronological order
      val fdir = new java.io.File(feed); fdir.mkdirs()
      val t0 = System.currentTimeMillis() - hours * 3600000L
      (0 until hours).foreach { h =>
        val df = spark.range(keysPerHour.toLong * dups)
          .select(
            (col("id") / dups + h.toLong * keysPerHour).cast("long").as("user_id"),
            to_timestamp(lit(t0 / 1000 + h * 3600L) +
              pmod(col("id") * 7919, lit(3500))).as("ts"),
            (col("id") % 5).cast("string").as("event_type"))
        val stage = s"$root/stage_$label"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(fdir, f"h$h%03d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(t0 + h * 10000L)
      }
      val schema = spark.read.parquet(feed).schema
      val out = s"$root/run_$label"
      def go(): Unit = {
        val wall0 = System.nanoTime()
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(feed)
          .transform(df => graft.streaming.Streaming.dedupStream(
            df, Seq("user_id"), "ts", "1 hour"))
          .writeStream.format("parquet")
          .option("path", s"$out/out")
          .option("checkpointLocation", s"$out/chk")
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val wall = (System.nanoTime() - wall0) / 1e9
        val prog = q.recentProgress.toIndexedSeq
          .filter(p => p.numInputRows > 0 || p.stateOperators.nonEmpty)
        val rows = prog.map { p =>
          val so = p.stateOperators.headOption
          (p.batchId,
            p.durationMs.getOrDefault("triggerExecution", -1L),
            so.map(_.numRowsTotal).getOrElse(-1L),
            so.map(_.numRowsRemoved).getOrElse(-1L),
            so.map(_.memoryUsedBytes).getOrElse(-1L))
        }
        val n = spark.read.parquet(s"$out/out").count()
        val expect = hours.toLong * keysPerHour
        println(s"== $label keys/hour=$keysPerHour rocksdb=$rocks " +
          f"wall=$wall%.1f s out=$n (expect $expect, " +
          s"match=${n == expect})")
        rows.foreach { case (b, ms, tot, rem, mem) =>
          println(f"   batch=$b%3d trigger=${ms / 1000.0}%6.2f s " +
            f"stateRows=$tot%9d removed=$rem%9d stateMB=${mem / 1e6}%8.1f")
        }
      }
      if (rocks) graft.streaming.Streaming.withRocksDbStateStore(spark)(go())
      else go()
    }
    spark.stop()
  }
}
