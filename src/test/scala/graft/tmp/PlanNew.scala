package graft.tmp

import org.apache.spark.sql.SparkSession

/** Plan-stat dump for gate queries: scan/exchange/reuse counts + the
  * full executed plan (kept: the per-operator scale audit loop). */
object PlanNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"==== $q ====")
      println("scans of documents.parquet: " +
        "documents\\.parquet".r.findAllIn(p).size)
      println("ReusedExchange: " + "ReusedExchange".r.findAllIn(p).size)
      println("Exchange: " + "Exchange".r.findAllIn(p).size)
      println(p)
    }
    spark.stop()
  }
}
