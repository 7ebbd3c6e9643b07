package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Drive {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[info] TIMER $label ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = graft.core.Tables(spark, "/root/testdata/sf0.1", "orders")
      .withColumn("valid_str", col("o_orderkey").cast("string"))
    o.write.format("noop").mode("overwrite").save()
    for (r <- 1 to 2) {
      time(s"r$r try_valid  ") { o.select(expr("try_cast(valid_str AS INT)").as("x")).write.format("noop").mode("overwrite").save() }
      time(s"r$r try_invalid") { o.select(expr("try_cast(o_orderpriority AS INT)").as("x")).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
