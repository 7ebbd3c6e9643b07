package graft.tmp

import org.apache.spark.sql.SparkSession

/** Scratch plan dumper: runs named gate queries and prints the
 *  AQE-finalized executed plan (after an action). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // executes THIS QueryExecution so AQE finalizes in place
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
      println(s"===== end $name =====")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
