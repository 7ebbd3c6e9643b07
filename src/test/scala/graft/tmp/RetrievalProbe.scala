package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the round-9 retrieval/quality family: BM25 top-k,
 *  winnowed copied-span pairs, and n-gram coherence at 1×/16×/64× of
 *  the sf0.1 document count.
 *
 *  Corpus: synthetic DISTINCT texts (200 tokens from a 50k vocab,
 *  token ids a pure function of (doc, pos)) so the pair list scales
 *  with planted copies, not quadratically with fixture duplication.
 *  One doc per 1000 copies a 16-token span from its predecessor-1000
 *  → expected copied-span pairs ≈ docs/1000 (LINEAR in corpus size,
 *  the realistic regime). BM25 runs the same 10 8-token queries at
 *  every scale — per-query retrieval cost vs corpus size is exactly
 *  the 100 TB question.
 */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{Dedup, TextAnalysis => TA}

    def corpus(n: Long): DataFrame = {
      // text_i = 200 vocab tokens, token = murmur3(doc, pos) mod 50k
      // (NONLINEAR in (doc, pos): a linear formula would make whole
      // token runs collide in parallel across doc pairs). Docs i ≡ 0
      // (mod 1000), i >= 1000 carry tokens 50..65 of doc i-1000 at
      // positions 100..115 — the planted copied spans.
      def tok(id: org.apache.spark.sql.Column, j: Int) =
        concat(lit("w"), pmod(hash(id, lit(j)), lit(50000)))
      val base = spark.range(n).select(col("id"),
        concat_ws(" ", (0 until 200).map(j => tok(col("id"), j)): _*).as("text"))
      base.withColumn("text",
        when(col("id") % 1000 === 0 && col("id") >= 1000,
          concat_ws(" ", (0 until 200).map { j =>
            if (j >= 100 && j < 116) tok(col("id") - 1000, j - 50)
            else tok(col("id"), j)
          }: _*))
          .otherwise(col("text")))
    }

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$rows")
    }

    val queries = spark.range(10).select(
      col("id").as("query_id"),
      concat_ws(" ", (0 until 8).map(j =>
        concat(lit("w"), pmod(hash(col("id") + 1000000, lit(j)), lit(50000)))): _*)
        .as("qtext"))

    val wanted = args.headOption.map(_.split(",").toSet)
    Seq(("1x", 12500L), ("16x", 200000L), ("64x", 800000L))
      .filter { case (l, _) => wanted.forall(_.contains(l)) }
      .foreach { case (label, n) =>
        val docs = corpus(n).localCheckpoint(true) // materialize fixture OUTSIDE timings
        time(s"$label bm25TopK(10q,k=10)") {
          TA.bm25TopK(docs, "id", "text", queries, "query_id", "qtext", k = 10).count()
        }
        time(s"$label bm25 maxDf=n/10") {
          TA.bm25TopK(docs, "id", "text", queries, "query_id", "qtext",
            k = 10, maxDf = Some(n / 10)).count()
        }
        time(s"$label copiedSpanPairs") {
          Dedup.copiedSpanPairs(docs, "id", "text", k = 5, w = 4,
            minShared = 2, maxDocFreq = 50).count()
        }
        time(s"$label ngramCoherence") {
          TA.ngramCoherence(docs, "id", "text").count()
        }
        docs.unpersist()
    }
    spark.stop()
  }
}
