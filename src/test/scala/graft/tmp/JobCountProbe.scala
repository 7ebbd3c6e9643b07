package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/**
 * Round-15 scratch probe (verdict #2b): job-barrier count and wall
 * time for a single gate query, isolated — used to measure the
 * bfsHops isEmpty→fused-count change. Run:
 * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tmp.JobCountProbe q274_bfs_hops 3"
 */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q274_bfs_hops"
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    val fn = graft.SparkEntry.queries(q)
    (1 to iters).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      jobs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(500)
      println(f"""{"probe":"jobs","q":"$q","iter":$i,"jobs":${jobs.get},"wall_s":$wall%.3f}""")
    }
    spark.stop()
  }
}
