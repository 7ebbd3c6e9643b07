package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch: IN-JVM A/B of the streaming gates' statePartitions knob
 *  (r19 verdict #3 — the cross-JVM A/B noise band exceeded the
 *  expected win, so alternate configs INSIDE one session instead).
 *  Usage: Test/runMain graft.tmp.StreamAB <reps> <gate substrings...>
 *  Alternates -Dgraft.gate.statePartitions between the A and B values
 *  per repetition (ABBA order kills warmup/drift bias), times each
 *  full gate through the noop sink, and prints a per-gate table plus
 *  the per-batch durationMs breakdown from a StreamingQueryListener. */
object StreamAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val wanted = args.drop(1).toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aVal = sys.env.getOrElse("SPARK_GRAFT_AB_A", "8")
    val bVal = sys.env.getOrElse("SPARK_GRAFT_AB_B", "4")
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-batch duration breakdown, keyed by the config in force
    val batchLog = new java.lang.StringBuilder
    spark.streams.addListener(new StreamingQueryListener {
      def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        batchLog.append(
          s"[batch] sp=${sys.props.getOrElse("graft.gate.statePartitions", "8")} " +
          s"batch=${p.batchId} durationMs=${p.durationMs}\n"): Unit
      }
    })
    val gates = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
    println(s"[ab] gates=${gates.map(_._1).mkString(",")} A=$aVal B=$bVal reps=$reps")
    // warmup once (cold JIT otherwise lands entirely on the first arm)
    gates.foreach { case (_, fn) =>
      fn(spark, dir).write.format("noop").mode("overwrite").save() }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (r <- 0 until reps; arm <- if (r % 2 == 0) Seq(aVal, bVal, bVal, aVal).take(2)
                                   else Seq(bVal, aVal)) {
      sys.props("graft.gate.statePartitions") = arm
      gates.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        acc((name, arm)) = s :: acc.getOrElse((name, arm), Nil)
        println(f"[ab] $name sp=$arm%s wall=$s%.3f")
      }
    }
    sys.props.remove("graft.gate.statePartitions")
    println("[ab] ==== per-gate best / median ====")
    gates.foreach { case (name, _) =>
      def stats(arm: String) = {
        val xs = acc.getOrElse((name, arm), Nil).sorted
        if (xs.isEmpty) (Double.NaN, Double.NaN)
        else (xs.head, xs(xs.size / 2))
      }
      val (ab, am) = stats(aVal); val (bb, bm) = stats(bVal)
      println(f"[ab] $name A($aVal%s) best=$ab%.3f med=$am%.3f | B($bVal%s) best=$bb%.3f med=$bm%.3f")
    }
    print(batchLog.toString)
    spark.stop()
  }
}
