package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where do the streaming gates' ~3 s go? Phase breakdown of q143
 *  (the simplest keyed-state gate) at sf0.1, with statePartitions and
 *  batch-count sweeps. */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Engine.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def run(tag: String, sp: Int, nFiles: Int, mft: Int): Unit = {
      val ev = graft.core.Tables(s, "/root/testdata/sf0.1", "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"),
          date_trunc("hour", col("ts")).as("hr"))
      val tmp = java.nio.file.Files.createTempDirectory("scp").toString
      var t0 = System.nanoTime()
      ev.repartitionByRange(nFiles, col("hr")).write.parquet(s"$tmp/in")
      val files = new java.io.File(s"$tmp/in").listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val base = System.currentTimeMillis() - 3600000L
      files.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(base + i * 10000L) }
      val schema = s.read.parquet(s"$tmp/in").schema
      val tPrep = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val updates = graft.streaming.Streaming.runUpdateStreamFiles(
        s, s"$tmp/in", schema,
        df => {
          import df.sparkSession.implicits._
          graft.streaming.Streaming.runningCount(
            df.select(col("user_id").cast("string"), lit(1L))
              .as[(String, Long)]).toDF()
        },
        dir = s"$tmp/run", statePartitions = Some(sp),
        sourceOptions = Map("maxFilesPerTrigger" -> mft.toString))
      val tStream = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val n = updates.groupBy(col("key"))
        .agg(max(col("count")).as("n_events")).count()
      val tFold = (System.nanoTime() - t0) / 1e9
      println(f"[scp] $tag sp=$sp%-2d files=$nFiles mft=$mft keys=$n%d " +
        f"prep=$tPrep%.2fs stream=$tStream%.2fs fold=$tFold%.2fs")
    }

    // warm the session once (first run pays JIT/codegen caches)
    run("warmup", 8, 6, 1)
    run("shipped", 8, 6, 1)
    run("shipped", 8, 6, 1)
    for (sp <- Seq(2, 4, 16, 32)) run("sp-sweep", sp, 6, 1)
    run("batches3", 8, 6, 2)   // 3 micro-batches instead of 6
    run("batches2", 8, 6, 3)
    s.stop()
  }
}
