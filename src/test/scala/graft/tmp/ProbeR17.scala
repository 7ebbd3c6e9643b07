package graft.tmp

import org.apache.spark.sql.functions._

/** Round-17 scale probe (round-16 verdict #6): run the heaviest three
 *  k-group/paired statistics — the Fisher exact walk, Jonckheere pair
 *  counting, the Friedman rank grid — at 1x and 64x the gate row
 *  count off the gate fixtures, and report wall + driver-observed
 *  heap so the grid-collapse posture is MEASURED, not argued.
 *  Scratch main; results land in PLANS.md. */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.local(8, "probe-r17", 8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def heapMB: Long = {
      val r = Runtime.getRuntime
      System.gc()
      (r.totalMemory - r.freeMemory) / (1024 * 1024)
    }
    def time[A](label: String)(f: => A): Unit = {
      val h0 = heapMB
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s wall=${w}%7.2f s heap=${h0}%5d -> ${heapMB}%5d MB")
    }

    for (mult <- Seq(1, 64)) {
      val rows = 10000L * mult
      // gate-shaped fixture: 4 event types, values on the cent grid,
      // user ids spread so margins/blocks grow WITH the data
      val df = spark.range(rows)
        .select(col("id"),
          (col("id") % 4).cast("string").as("k"),
          (col("id") % 997).as("user_id"),
          ((col("id") * 37) % 20000).cast("double").as("cents"))
        .withColumn("value", col("cents") / 100.0)
        .localCheckpoint(true)
      println(s"[probe] ---- ${rows} rows (x$mult) ----")
      time(s"fisherExact x$mult") {
        graft.agg.Stats.fisherExact(
          df.withColumn("ex", col("user_id") % 2 === 0)
            .withColumn("oc", col("value") >= 100.0),
          Seq("k"), "ex", "oc").write.format("noop").mode("overwrite").save()
      }
      time(s"jonckheereTerpstra x$mult") {
        graft.agg.Stats.jonckheereTerpstra(
          df.withColumn("dose", col("user_id") % 4),
          Seq("k"), "dose", "value").write.format("noop").mode("overwrite").save()
      }
      time(s"friedman x$mult") {
        graft.agg.Stats.friedman(
          df.withColumn("blk", col("user_id") % 50)
            .withColumn("trt", col("id") % 3),
          Seq("k"), "blk", "trt", "value")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
