package graft.tmp

import org.apache.spark.sql.SparkSession

/** Scratch: dump .explain("formatted") for named queries to files under
 *  plans/r20/<query>_<suffix>.txt. Usage:
 *    runMain graft.tmp.DrivePlan <suffix> <query substrings...>
 *  A suffix ending in "final" asks for the AQE-FINAL plan. */
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
    java.nio.file.Files.createDirectories(java.nio.file.Path.of("plans/r20"))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          // A suffix ending in "final" asks for the AQE-FINAL plan.
          // r19's version wrote via the noop sink (a SEPARATE
          // QueryExecution) and then printed the ORIGINAL QE's
          // executedPlan, which had never run — the dumps showed
          // isFinalPlan=false. Fix (r20, per ADVICE): drive THE SAME
          // QueryExecution by executing its own executedPlan RDD, so
          // the AQE loop materializes every stage and the printed
          // plan is the genuinely final one (isFinalPlan=true, with
          // runtime SMJ→SHJ rewrites and ReusedExchange visible).
          val plan = if (suffix.endsWith("final")) {
            val rdd = df.queryExecution.executedPlan.execute()
            rdd.foreach(_ => ())
            df.queryExecution.executedPlan.toString
          } else df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Path.of(s"plans/r20/${name}_$suffix.txt"), plan)
          println(s"PLAN $name -> plans/r20/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"PLAN $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
