package graft.tmp

import org.apache.spark.sql.SparkSession

/** Scratch: dump .explain("formatted") for named queries to files under
 *  plans/r19/<query>_<suffix>.txt. Usage:
 *    runMain graft.tmp.DrivePlan <suffix> <query substrings...>
 *  DELETE before round end if unused. */
object DrivePlan {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val wanted = args.drop(1).toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of("plans/r19"))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          // a suffix ending in "final" asks for the AQE-FINAL plan:
          // execute through the noop sink first, then print the
          // executed plan (ReusedExchange / ShuffledHashJoin rewrites
          // only exist at runtime)
          val plan = if (suffix.endsWith("final")) {
            df.write.format("noop").mode("overwrite").save()
            df.queryExecution.executedPlan.toString
          } else df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Path.of(s"plans/r19/${name}_$suffix.txt"), plan)
          println(s"PLAN $name -> plans/r19/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"PLAN $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
