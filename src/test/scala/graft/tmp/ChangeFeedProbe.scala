package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch scale probe for the bucketed ChangeFeed (round-8 judge ask):
 *  per-batch wall must track the DELTA's touched data, not the
 *  snapshot size. For each snapshot scale {1x, 16x, 64x} of a 50k-row
 *  base, apply (a) a NARROW 1000-key delta confined to 4 of 64 buckets
 *  and (b) a SCATTERED 1000-key delta hitting all 64 buckets (= the
 *  old full-rewrite design's cost), and time the re-entrant
 *  materialize() that applies just that delta. */
object ChangeFeedProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nb = 64
    val base = 50000L

    Seq(1L, 16L, 64L, 256L).foreach { scale =>
      val n = base * scale
      val root = java.nio.file.Files.createTempDirectory(s"cf_probe_$scale").toString
      // value column ~100 bytes so the snapshot has real width
      def rows(keys: org.apache.spark.sql.DataFrame, op: String, ver: Long) =
        keys.select(col("id").as("k"),
          concat(lit("v" * 100 + "_"), col("id")).as("v"),
          lit(op).as("op"), lit(ver).as("version"))
      rows(spark.range(n).toDF("id"), "I", 1L)
        .repartition(32).write.mode("append").parquet(s"$root/feed")
      val schema = spark.read.parquet(s"$root/feed").schema
      def run(tag: String): Double = {
        val t0 = System.nanoTime()
        val snap = graft.streaming.ChangeFeed.materialize(spark, s"$root/feed",
          schema, keys = Seq("k"), opCol = "op", versionCol = "version",
          workDir = s"$root/work", statePartitions = Some(32), numBuckets = nb)
        snap.queryExecution.optimizedPlan.stats // force nothing heavy
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"scale=${scale}x n=$n $tag wall=$wall%.2f s")
        wall
      }
      run("initial-load ") // builds the bucketed snapshot

      // (a) narrow delta: 1000 keys all hashing into buckets 0..3;
      // (b) scattered delta: 1000 consecutive keys, hash-spread over
      //     all 64 buckets — the old design's full-merge cost.
      // Two interleaved samples each so GC / page-cache noise from the
      // initial load doesn't bias either side.
      val narrowKeys = spark.range(n).toDF("id")
        .filter(pmod(hash(col("id")), lit(nb)) < 4).limit(1000)
      (0 to 1).foreach { i =>
        rows(narrowKeys, "U", 2L + 2 * i)
          .coalesce(1).write.mode("append").parquet(s"$root/feed")
        run(s"narrow-delta (4/64 buckets) #$i")
        rows(spark.range(1000).toDF("id"), "U", 3L + 2 * i)
          .coalesce(1).write.mode("append").parquet(s"$root/feed")
        run(s"scattered-delta (64/64 buckets) #$i")
      }

      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    }
    spark.stop()
  }
}
