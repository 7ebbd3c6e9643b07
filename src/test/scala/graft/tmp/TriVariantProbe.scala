package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures q152's fixed cost: triangleCountsImpl with each
 *  checkpoint toggled, at sf0.01 and sf0.1, two reps each (second rep
 *  removes scan-cache noise). */
object TriVariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val li = graft.core.Tables(spark, s"/root/testdata/$sf", "lineitem")
      for ((cu, co) <- Seq((true, true), (false, true), (true, false),
          (false, false)); rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val e = graft.graph.Graph.coOccurrenceEdges(li, "l_orderkey",
          "l_partkey", maxPerGroup = 8)
        val tri = graft.graph.Graph.triangleCountsImpl(e, "u", "v", cu, co)
        val s = tri.agg(count(lit(1)), sum("n_triangles")).collect()(0)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[tri] $sf und=$cu%5s oriented=$co%5s rep=$rep " +
          f"v=${s.getLong(0)}%d inc=${s.getLong(1)}%d wall=$wall%.2fs")
      }
    }
    spark.stop()
  }
}
