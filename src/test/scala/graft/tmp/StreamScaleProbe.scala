package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/**
 * Round-15 measurement harness (scratch, not an operator — lives under
 * graft/tmp which the operator scan skips): state-store size and
 * per-trigger cost for the keyed-state streaming family
 * (q309 twapStream / q288 cusumStream / q237 heavyHitterStream /
 * q229 quantileStream) at 16x/64x the gate's key scale, per the
 * round-14 verdict #4. Synthetic ticks: K keys x 6 waves, one wave
 * per trigger (maxFilesPerTrigger=1, AvailableNow), Update mode with
 * a noop batch sink — the measured numbers are the state machinery's,
 * not a sink's. Emits one JSON line per (op, K, batch) with
 * numRowsTotal / memoryUsedBytes / triggerExecution ms, then a
 * summary line per (op, K). Results land in PLANS.md and the
 * operators' scaladoc state-size envelopes.
 */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ks = sys.env.get("SSP_KEYS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16000, 256000, 1024000))
    val ops = sys.env.get("SSP_OPS")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("twap", "cusum", "hh", "kll"))
    for (k <- ks; op <- ops) run(spark, k, op)
    spark.stop()
  }

  private def run(spark: SparkSession, k: Int, op: String): Unit = {
    val root = s"/tmp/ssp/${op}_$k"
    val rootDir = new java.io.File(root)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (rootDir.exists()) rm(rootDir)
    new java.io.File(s"$root/in").mkdirs()
    val waves = 6
    // K keys x `waves` ticks; ts advances 10 min per wave so twap's
    // hourly buckets close mid-stream for some keys; deterministic
    // values on the cent grid
    val base = spark.range(k.toLong * waves)
      .select((col("id") % k).as("key"),
        (col("id") / k).cast("int").as("wave"),
        col("id").as("tie"),
        timestamp_seconds(lit(1700000000L) + (col("id") / k) * 600 +
          (col("id") % 7)).as("ts"),
        ((col("id") * 37 % 10000).cast("double") / 100.0).as("value"),
        (col("id") % 50).cast("string").as("item"))
    (0 until waves).foreach { w =>
      val stage = s"$root/stage_$w"
      base.filter(col("wave") === w).drop("wave")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$root/in/w$w.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 3600000L + w * 10000L)
      rm(new java.io.File(stage))
    }
    val schema = spark.read.parquet(s"$root/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
    val transformed: DataFrame = op match {
      case "twap" => graft.streaming.Streaming.twapStream(
        stream, "key", "ts", "tie", "value", unitMicros = 3600000000L)
      case "cusum" => graft.streaming.Streaming.cusumStream(
        stream, "key", "ts", "tie", "value",
        target = 50.0, slack = 5.0, threshold = 500.0)
      case "hh" => graft.streaming.Streaming.heavyHitterStream(
        stream, "key", "item", k = 8)
      case "kll" => graft.streaming.Streaming.quantileStream(
        stream, "key", "value")
    }
    val t0 = System.nanoTime()
    val q = transformed.writeStream
      .option("checkpointLocation", s"$root/chk")
      .outputMode(OutputMode.Update())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.format("noop").mode("overwrite").save()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    var lastRows = -1L; var lastMem = -1L; var sumTrig = 0L
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      val rows = so.map(_.numRowsTotal).getOrElse(-1L)
      val mem = so.map(_.memoryUsedBytes).getOrElse(-1L)
      val trig = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      val upd = so.map(_.numRowsUpdated).getOrElse(-1L)
      lastRows = rows; lastMem = mem; sumTrig += math.max(trig, 0L)
      println(s"""{"probe":"batch","op":"$op","keys":$k,""" +
        s""""batch":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""trigger_ms":$trig,"state_rows":$rows,""" +
        s""""state_rows_updated":$upd,"state_mem_bytes":$mem}""")
    }
    println(s"""{"probe":"summary","op":"$op","keys":$k,""" +
      s""""waves":$waves,"wall_s":${math.round(wall * 1000) / 1000.0},""" +
      s""""trigger_ms_total":$sumTrig,"state_rows_final":$lastRows,""" +
      s""""state_mem_final_bytes":$lastMem,"state_bytes_per_key":""" +
      s"""${if (lastRows > 0) lastMem / lastRows else -1}}""")
    rm(rootDir)
  }
}
