package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probes for the wave-7/10 heavy operators:
 *
 *  - q152 triangleCounts on the co-order graph at sf0.01 vs sf0.1
 *    (10× lineitem): the degree-ordered wedge relation must grow
 *    ~O(m^1.5) worst case but near-linearly on this bounded-degree
 *    basket graph, and wall should track edges, not vertices².
 *  - q154 charLmScore on documents replicated N×: gram relation and
 *    wall must stay linear (model relations are charset-bounded, so
 *    only the corpus-side explode scales).
 *  - q167 ewma at sf0.1 (10× events per key): the per-key array fold
 *    is quadratic in the KEY's series length — probe confirms the
 *    per-key envelope holds as series lengthen.
 */
object GraphStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val li = graft.core.Tables(spark, s"/root/testdata/$sf", "lineitem")
      val t0 = System.nanoTime()
      val e = graft.graph.Graph.coOccurrenceEdges(li, "l_orderkey",
        "l_partkey", maxPerGroup = 8).localCheckpoint(false)
      val nE = e.count()
      val tri = graft.graph.Graph.triangleCounts(e, "u", "v")
      val agg = tri.agg(count(lit(1)), sum("n_triangles")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe-tri] $sf edges=$nE%d vertices_in_tri=${agg.getLong(0)}%d " +
        f"tri_incidences=${agg.getLong(1)}%d wall=$wall%.1fs")
    }

    val base = graft.core.Tables(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    for (n <- Seq(1, 16, 64)) {
      val corpus =
        if (n == 1) base
        else base.crossJoin(spark.range(n).select(col("id").as("__copy")))
          .select((col("doc_id") + col("__copy") * 10000000L).as("doc_id"),
            col("text"))
      val t0 = System.nanoTime()
      val out = graft.llm.TextAnalysis.charLmScore(corpus, "doc_id", "text")
      val agg = out.agg(count(lit(1)), sum("n_grams")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe-lm] ${n}%dx docs=${agg.getLong(0)}%d grams=${agg.getLong(1)}%d " +
        f"wall=$wall%.1fs")
    }

    val ev = graft.core.Tables(spark, "/root/testdata/sf0.1", "events")
      .filter(col("user_id").isNotNull)
    val t0 = System.nanoTime()
    val sm = graft.ops.TimeSeries.ewma(ev, Seq("user_id"), "ts", "event_id",
      "value", alpha = 0.3)
    val agg = sm.agg(count(lit(1))).collect()(0)
    val maxSeries = ev.groupBy("user_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    println(f"[probe-ewma] sf0.1 rows=${agg.getLong(0)}%d max_series=$maxSeries%d " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    // fuzzy-join scale: unique digit+parity names, linear neighbor
    // structure — pairs and wall must track corpus size, not its square
    for (n <- Seq(1, 4, 16)) {
      val ids =
        if (n == 1) base.select(col("doc_id"))
        else base.select(col("doc_id"))
          .crossJoin(spark.range(n).select(col("id").as("__c")))
          .select((col("doc_id") + col("__c") * 500L).as("doc_id"))
      val names = ids.select(col("doc_id"),
        concat(col("doc_id").cast("string"),
          when(col("doc_id") % 2 === 1, lit("b")).otherwise(lit("a")))
          .as("name"))
      val t1 = System.nanoTime()
      val pairs = graft.join.Fuzzy.selfJoin(names, "doc_id", "name", 1).count()
      println(f"[probe-fuzzy] ${n}%dx strings=${500 * n}%d pairs=$pairs%d " +
        f"wall=${(System.nanoTime() - t1) / 1e9}%.1fs")
    }
    spark.stop()

  }
}
