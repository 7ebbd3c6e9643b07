package graft.tmp
import org.apache.spark.sql.SparkSession
object Plans {
  def main(a: Array[String]): Unit = {
    val s = graft.core.Engine.local(32)
    val dir = "/root/testdata/sf0.1"
    def p(name: String): Unit = {
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(s, dir)
      println(df.queryExecution.executedPlan.toString.linesIterator.take(30).mkString("\n"))
      val t0 = System.nanoTime(); df.count()
      println(f"--- time: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    Seq("q13_sort_limit", "q10_lookup", "q29_embedding_neardup", "q30_ann_lsh").foreach(p)
    s.stop()
  }
}
