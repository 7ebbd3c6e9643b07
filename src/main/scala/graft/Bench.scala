package graft
import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

object Bench {

  // ---- telemetry probes (local mode: the driver JVM is the only JVM,
  //      so these see executor-side pressure too) ----
  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  private def heapMB: Double = {
    val r = Runtime.getRuntime
    (r.totalMemory - r.freeMemory) / (1024.0 * 1024.0)
  }
  /** Cumulative process CPU ns; -1 if the platform bean is unavailable. */
  private def procCpuNs: Long = ManagementFactory.getOperatingSystemMXBean match {
    case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
    case _ => -1L
  }
  /** 1-minute system load average — the EXTERNAL-pressure probe: a
   *  query whose wall time inflates while its own CPU seconds do not,
   *  under high load, was starved by the machine, not by its plan. */
  private def sysLoad: Double =
    ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
  /** `some avg10` from /proc/pressure/cpu (%% of the last 10 s in
   *  which at least one runnable task waited for a CPU) — the direct
   *  CPU-contention probe the r18 verdict asked for alongside load1m:
   *  load1m counts tasks, PSI measures actual starvation, so ambient
   *  load that never delays anyone reads ~0 here. -1 when the file is
   *  absent (non-cgroup2 kernels) or unreadable. */
  private def cpuPressureAvg10: Double =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Path.of("/proc/pressure/cpu")))
      s.linesIterator.find(_.startsWith("some")).flatMap { l =>
        l.split("\\s+").collectFirst {
          case f if f.startsWith("avg10=") =>
            f.stripPrefix("avg10=").toDouble
        }
      }.getOrElse(-1.0)
    } catch { case _: Exception => -1.0 }

  /** Cumulative JIT compilation ms — the COLD-CODEGEN probe: a query
   *  whose wall time inflates while this delta is large was spending
   *  its time compiling, not executing (the round-14 q234 signature:
   *  two cold draws, 108 → 57 s CPU as codegen warmed). */
  private def jitMs: Long = {
    val c = ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported)
      c.getTotalCompilationTime else -1L
  }
  /** Used bytes across the CodeHeap pools, MB — answers the round-14
   *  verdict's open question: does the 322-plan suite FILL the forked
   *  JVM's code cache (default 240 MB) and trigger sweeping that
   *  keeps mid-suite kernels permanently cold? Near-capacity values
   *  here + high jit deltas late in the suite = yes, size it up. */
  private def codeCacheMB: Double =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") ||
        p.getName.contains("Code Cache"))
      .map(_.getUsage.getUsed / (1024.0 * 1024.0)).sum

  // sink for the calibration spin's results: keeps the JIT from
  // proving the loop dead and deleting the fixed work
  private val calibSink = new java.util.concurrent.atomic.AtomicLong()

  /** Fixed-work machine-health calibration (round-17 verdict #2):
   *  `threads` threads each run (a) 100M xorshift64 steps — pure
   *  register work, sensitive to CPU oversubscription — and (b) ten
   *  sequential passes over a private 16 MB long array — bandwidth-
   *  bound work, sensitive to the LLC/memory-bandwidth contention
   *  that inflated q234 in r16 WITHOUT moving load1m much. The WALL
   *  time of the joined batch is the machine-health number: on an
   *  idle box it approaches one thread's time; under co-tenant load
   *  either phase inflates. The artifact records this before and
   *  after the suite next to the pinned calm value, so a reader can
   *  adjudicate "was it the machine" from the artifact alone instead
   *  of burning a verdict cycle re-proving it. */
  private[graft] def calibrationSpinMs(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + i
        var n = 0
        while (n < 100000000) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17; n += 1
        }
        val a = new Array[Long](2 * 1024 * 1024) // 16 MB: past L2
        var pass = 0
        while (pass < 10) {
          var j = 0
          while (j < a.length) { x += a(j); a(j) = x; j += 1 }
          pass += 1
        }
        calibSink.addAndGet(x): Unit
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e6
  }

  /** The externally-starved draw signature (round-15 verdict #1,
   *  jit denominator fixed per round-17 verdict #1): the process
   *  used under 20% of the configured cores — low OWN cpu rules out
   *  a plan property — AND JIT compilation explains neither the wall
   *  NOR the cpu (under 25% of EITHER; the cold-JIT signature is the
   *  opposite — jit_ms ≈ wall, as in r14's q234). The cpu arm of the
   *  jit guard is the r17 fix: for the streaming trigger-floor class
   *  wall is trigger-WAIT-dominated, so a modest absolute jit (q343:
   *  1.65 s) could exceed 25% of a 6 s wall while being obviously
   *  cold-code-free next to 18 s of cpu — jit is only disqualifying
   *  when it is large relative to BOTH denominators. */
  private[graft] def starvedSignature(wallS: Double, cpuS: Double,
                                      jitMs: Long, cores: Int): Boolean =
    wallS > 0 && cpuS < 0.2 * cores * wallS && jitMs >= 0 &&
      jitMs < math.max(250.0 * wallS, 250.0 * cpuS) // 25% of either

  /** One measurement's telemetry, rendered as a fixed-position JSON
   *  array (keeps the detail line compact): [wall s, gc ms during the
   *  query, heap MB before, heap MB after, process-CPU s during the
   *  query, 1-min load at start, storage MB before isolate, broadcasts
   *  dropped by isolate]. */
  private final case class Tel(wall: Double, gc: Long, heapB: Double,
                               heapA: Double, cpu: Double, load: Double,
                               bmB: Double, bcDropped: Int,
                               jit: Long, ccMB: Double, stalled: Int = 0,
                               psi: Double = -1.0) {
    // Locale.ROOT, not the f-interpolator: a JVM whose default locale
    // writes comma decimal separators would otherwise emit invalid
    // JSON and silently break downstream artifact parsing
    def json: String = String.format(java.util.Locale.ROOT,
      "[%.3f,%d,%.0f,%.0f,%.2f,%.2f,%.1f,%d,%d,%.1f,%d,%.2f]",
      Double.box(wall), Long.box(gc), Double.box(heapB), Double.box(heapA),
      Double.box(cpu), Double.box(load), Double.box(bmB), Int.box(bcDropped),
      Long.box(jit), Double.box(ccMB), Int.box(stalled), Double.box(psi))
  }

  /** Reset session state a prior query may have left behind: cached
   *  relations, temp views, GRAFT-CREATED catalog tables (q59 writes
   *  `graft_bkt_*`; dropping keeps every iteration's create path timed
   *  identically), leftover persistent RDDs (checkpoint blocks — the
   *  async ContextCleaner lags, so drop SYNCHRONOUSLY), and — new in
   *  round 7 — ALL broadcast blocks: isolate() previously unpersisted
   *  RDDs but never destroyed broadcasts (q100's dims, q24's band
   *  tables, every AQE-planned broadcast join build side), a plausible
   *  contributor to the late-suite inflation the round-6 artifact
   *  showed on q26/q24/q39. Scoped to the `graft` name prefix for
   *  catalog tables so a bench launched over a warehouse holding
   *  unrelated managed tables never destroys them; best-effort so a
   *  failing drop records a query failure, not a dead bench.
   *  Returns the number of broadcasts dropped (telemetry). */
  private def isolate(spark: SparkSession): Int = {
    var dropped = 0
    try {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      dropped = org.apache.spark.graft.BenchInternals
        .dropBroadcasts(spark.sparkContext)
      spark.catalog.listTables().collect()
        .filter(_.name.toLowerCase.startsWith("graft"))
        .foreach { t =>
          if (t.isTemporary) spark.catalog.dropTempView(t.name)
          else spark.sql(s"DROP TABLE IF EXISTS `${t.namespace.mkString("`.`")}`.`${t.name}`")
        }
    } catch { case e: Exception =>
      System.err.println(s"[bench] isolate: ${e.getMessage}")
    }
    System.gc()
    dropped
  }

  /** Pinned calm-machine value for [[calibrationSpinMs]](32): the
   *  best-of-5 measured at load1m 1.8 on the reference box was
   *  316 ms (range 316–405); 330 ms is the pin. The health rule
   *  (PLANS.md r18): a probe > 2× this pin labels the artifact
   *  `contended` — round-over-round deltas should not be read from
   *  a contended artifact. */
  private val CalibCalmMs = 330.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // machine-health probe BEFORE any Spark init competes for cores
    val calibStartMs = calibrationSpinMs(32)
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      // The status listeners retain job/stage/task/SQL-execution data
      // in DRIVER HEAP even with the UI off — at the defaults (1000
      // jobs/stages, 100k tasks, 1000 SQL executions) a 109-query
      // suite accumulates real GC pressure by the time the q2x family
      // runs mid-suite. The bench needs none of it (telemetry comes
      // from MX beans); keep a token window for post-mortem debugging.
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.ui.retainedExecutions", "10"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/parquet-scan/noop-sink paths so the first timed
    // query doesn't absorb session bootstrap (~2-3 s of JIT + init).
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.format("noop").mode("overwrite").save()
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // The round-5/6 artifacts inflated this family 3-5× over isolated
    // runs IN THE DRIVER'S ENVIRONMENT ONLY (external machine load is
    // the telemetry hypothesis): one extra attempt gives best-of-3 a
    // chance to land between load spikes without tripling the suite.
    // Membership re-derived from the r18 definitive (calm-certified)
    // telemetry per the r18 verdict: a query rides best-of-3 when its
    // 2-draw budget demonstrably never reaches the warm floor — first
    // draws jit-dominated (jit_ms within ~2x of wall) AND the final
    // best still carries multi-second JIT.
    val heavy = Set(
      // n-gram prefix join: first draw jit 4.4 s, 1.65x inflation
      "q26_ngram_jaccard",
      // Iterative-graph family (round-14 verdict #1): many-barrier
      // plans whose per-job codegen units stay JIT-cold mid-suite —
      // r18 first draws still 1.2-2.1x inflated with jit 2.9-8.7 s.
      "q234_clustering_coeff", "q152_triangles", "q249_kcore",
      "q274_bfs_hops", "q319_grid_clusters",
      // Change-feed/stream-reentry class (r18 verdict #1/#2): the
      // cold-JIT wall moved here in r18 — q113's two draws were BOTH
      // jit-saturated (w8.51/jit8.9, w8.61/jit6.0; r17 warm floor
      // 6.48), q111 11.4 s first-draw jit, q138 5.5, q110 7.7 — so a
      // 2-draw budget headlines a cold number and q113 crossed its
      // envelope ceiling on pure codegen scheduling. Dropped from the
      // set vs r18: q24_minhash/q39_ivf/q40_weighted_mean_expr (r18
      // best 0.8-1.4 s, first-draw jit under 2 s — warm by draw 2).
      "q111_change_stream", "q113_change_stream_reentry",
      "q138_stream_funnel", "q110_stream_dedup")
    // Optional comma-separated name filter for quick subset runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // ABSOLUTE arm of the stall rule (round-16 verdict #2): the
    // relative arm below compares against the best draw SO FAR, so
    // when EVERY draw of a query is externally starved there is no
    // good "best" and nothing gets flagged — the r16 definitive
    // artifact shipped q250 at 9.0 s on ~1.6 busy cores unflagged
    // that way. These are the PLANS.md envelope CEILINGS ("Worst-N
    // artifact envelopes", re-derived r19 per the r18 verdict #2:
    // ceiling = ceil-to-0.5 of 1.5x the calm-certified warm floor,
    // floor = best draw across the r18 definitive artifact and the
    // r19 calm-certified local run — a uniform formula, so slack
    // can't drift per-query (several r17 ceilings sat at 2-4x their
    // floors, wide enough to hide a real 50% regression). A draw
    // whose wall exceeds its ceiling while the starved signature
    // holds (see [[starvedSignature]]: under 20% of cores busy AND
    // jit small relative to both wall and cpu) is flagged `stalled`
    // no matter what the other draws look like. Queries without a
    // row keep relative-arm-only behavior. Cold-JIT draws are NOT
    // caught here (their cpu/jit is high) — by design; best-of-N
    // absorbs those (every heavy-set member has a row now).
    val envelopeCeilingS: Map[String, Double] = Map(
      "q234_clustering_coeff" -> 11.0, "q152_triangles" -> 12.5,
      "q113_change_stream_reentry" -> 10.0, "q111_change_stream" -> 8.0,
      "q26_ngram_jaccard" -> 5.5, "q283_overlap_join" -> 7.5,
      "q317_bootstrap_ci" -> 7.5, "q154_char_lm" -> 6.5,
      "q180_stream_compaction" -> 6.5, "q203_link_prediction" -> 6.0,
      "q250_stream_drift" -> 5.5, "q309_stream_twap" -> 6.5,
      "q168_stream_ewma" -> 6.5, "q161_stream_transitions" -> 6.5,
      "q237_stream_heavy_hitters" -> 6.5, "q376_stream_holt" -> 6.0,
      "q49_drop_near_dups" -> 5.5, "q45_components" -> 5.0,
      "q319_grid_clusters" -> 8.0, "q343_stream_page_hinkley" -> 6.0,
      "q360_stream_macd" -> 6.5, "q394_stream_tracking_signal" -> 6.0,
      "q402_stream_bottom_k" -> 6.5, "q110_stream_dedup" -> 6.0,
      "q138_stream_funnel" -> 6.5, "q249_kcore" -> 5.0,
      "q274_bfs_hops" -> 6.5)
    // Fixed (sorted) execution order + per-iteration times in the JSON:
    // run-order and GC effects stay diagnosable from the artifact alone.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (name, fn) =>
      // noop sink: forces full materialization of every output column
      // (count() would let Catalyst prune the benchmarked compute away).
      // Best of `iters` runs — single-shot numbers on a shared box swing
      // ±30%. A failed query records -1, never a normal-looking time.
      val n = if (heavy(name)) math.max(iters, 3) else iters
      def draw(): Tel = {
        // Isolation BEFORE the timer: each measurement starts from a
        // clean block manager, so query N's number never carries the
        // cache pressure (or the leaked temp objects) of 1..N-1 —
        // round 4's artifact falsely reported 2-11× regressions that
        // were session-accumulation effects, not plans.
        val bmBefore = org.apache.spark.graft.BenchInternals
          .storageUsedMB(spark.sparkContext)
        val dropped = isolate(spark)
        val (g0, h0, c0, l0, j0) = (gcMs, heapMB, procCpuNs, sysLoad, jitMs)
        val p0 = cpuPressureAvg10
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Tel(wall, gcMs - g0, h0, heapMB, (procCpuNs - c0) / 1e9, l0,
            bmBefore, dropped, jitMs - j0, codeCacheMB, psi = p0)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Tel(-1.0, gcMs - g0, h0, heapMB, (procCpuNs - c0) / 1e9, l0,
            bmBefore, dropped, jitMs - j0, codeCacheMB, psi = p0)
        }
      }
      // Stall-aware resampling (round-15 verdict #1): a draw whose wall
      // time is >2× the best draw so far, while the process used under
      // 20% of the configured cores AND JIT compilation explains under
      // 25% of the wall, was starved by EXTERNAL machine load — not a
      // plan property (low own-CPU) and not cold codegen (low jit_ms;
      // the cold-JIT signature is the opposite: jit_ms ≈ the wall, as
      // in r14's q234). Mark it `stalled` in the telemetry and take ONE
      // extra draw (cap +1 per query), so the artifact's best-of is a
      // warm un-starved floor and a 23.9 s draw on 1.6 busy cores
      // (round-15's q26) never shapes the headline silently.
      val cores = cpus.toInt
      val tels = scala.collection.mutable.ArrayBuffer.empty[Tel]
      var budget = n
      var extraTaken = false
      // Unmapped queries get a DEFAULT absolute ceiling (r19): the
      // micro-batch streaming gates have a trigger-wait failure mode
      // that wanders between queries run-to-run (wall >> cpu, psi ~0,
      // jit small — this round's q288 drew 25.7/20.2 s on ~1.2 busy
      // cores with NO annotation because only mapped queries had an
      // absolute arm, exactly the r16 q250 escape on a new query).
      // Every unmapped query runs well under 8 s warm at sf0.1, and
      // the starved-signature conjunct (under 20% of cores AND jit
      // small) keeps cold-JIT or genuinely-heavy draws exempt, so a
      // 10 s default cannot misfire on honest work.
      val ceil = envelopeCeilingS.getOrElse(name, 10.0)
      while (tels.size < budget) {
        val tel = draw()
        // best UN-STARVED draw so far: draws already flagged stalled
        // are excluded, so a starved-but-fast first draw can never
        // suppress relative flagging of later draws (r17 advice)
        val bestSoFar = tels.iterator.filter(_.stalled == 0)
          .map(_.wall).filter(_ > 0)
          .foldLeft(Double.MaxValue)(math.min)
        val starved = starvedSignature(tel.wall, tel.cpu, tel.jit, cores)
        // relative arm: >2x the best un-starved draw so far
        val isStallRel = starved && bestSoFar < Double.MaxValue &&
          tel.wall > 2.0 * bestSoFar
        // absolute arm: above the query's PLANS.md envelope ceiling —
        // catches the all-draws-starved case the relative arm can't
        val isStallAbs = starved && tel.wall > ceil
        val isStall = isStallRel || isStallAbs
        tels += tel.copy(stalled = if (isStall) 1 else 0)
        if (isStall && !extraTaken) { extraTaken = true; budget += 1 }
      }
      val times = tels.toSeq.map(_.wall)
      (name, if (times.contains(-1.0)) -1.0 else times.min, times, tels)
    }
    def f(d: Double) = // Locale.ROOT — see Tel.json
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val its = results.map { case (k, _, ts, _) =>
      "\"" + k + "\":" + ts.map(f).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Line order is tail-survival order: the driver keeps only a
    // bounded tail of stdout, so the largest lines (telemetry, then
    // per-iteration detail) go FIRST, the full primary JSON second,
    // and a COMPACT summary (total + worst-10 queries + the heavy
    // family's telemetry, a few hundred bytes) LAST — whatever the
    // tail window cuts, the total and the queries that matter for
    // perf triage always survive (round 5's artifact lost q01–q21
    // and the total to mid-line truncation).
    val telJson = results.map { case (k, _, _, tels) =>
      "\"" + k + "\":" + tels.map(_.json).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // schema: each entry [wall s, gcMs, heapBeforeMB, heapAfterMB,
    // procCpuS, load1m, storageMBBeforeIsolate, broadcastsDropped,
    // jitMsDuringQuery, codeCacheUsedMBAfter, stalledFlag]
    // machine-health probe again AFTER the suite: contention that
    // arrived mid-run shows up in at least one of the two probes
    val calibEndMs = calibrationSpinMs(32)
    val health =
      if (math.max(calibStartMs, calibEndMs) > 2.0 * CalibCalmMs)
        "contended" else "calm"
    // PSI alongside the probes (r18 verdict #7): cpu-pressure avg10
    // at suite start/end plus the per-draw samples' median/max below
    val calibJson = s""""calib_start_ms":${f(calibStartMs)},"calib_end_ms":${f(calibEndMs)},"calib_calm_ms":${f(CalibCalmMs)},"health":"$health","psi_cpu_end":${f(cpuPressureAvg10)}"""
    val telLine = s"""{"detail":"telemetry","schema":["wall_s","gc_ms","heap_before_mb","heap_after_mb","proc_cpu_s","load1m","storage_mb_pre","bc_dropped","jit_ms","codecache_mb","stalled","psi_cpu_avg10_pre"],"queries":$telJson}"""
    val itersLine = s"""{"detail":"iters","iters":$its}"""
    val totalLine = s"""{"metric":"total","value":${f(total)},"unit":"sec",$calibJson,"queries":$qs,"sf":"$sfDir"}"""
    println(telLine)
    println(itersLine)
    println(totalLine)
    val worst = results.filter(_._2 > 0).sortBy(-_._2).take(10)
      .map { case (k, v, _, _) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // compact total sums SUCCESSFUL queries only — adding the -1.0
    // failure sentinels would understate the headline by 1 s per
    // failure on the very line meant for triage (the primary line
    // keeps its historical all-results sum for round-over-round
    // comparability; its failures are visible as -1 entries)
    val okTotal = results.map(_._2).filter(_ > 0).sum
    // The heavy family's full telemetry used to RIDE the compact line;
    // that made the line thousands of characters and the r18 artifact's
    // copy was decapitated by the driver's 2000-char stdout tail — the
    // whole r19 round-over-round comparison was lost to it (r19 verdict
    // #3). r20: hvytel moves to its OWN detail line (printed before the
    // compact line, so the compact line stays nearest the tail), and
    // the compact line stays a few hundred bytes. Measurement-contract
    // change only — no timing methodology changed.
    val hvy = results.filter(r => heavy(r._1)).map { case (k, _, _, tels) =>
      "\"" + k + "\":" + tels.map(_.json).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val hvyLine = s"""{"detail":"hvytel","queries":$hvy}"""
    // metric "total" (not "total_compact"): every driver BENCH artifact
    // through round 11 has parsed:None — the primary line is larger than
    // the driver's stdout-tail window, so THIS line is the only complete
    // JSON a tail parser can recover; give it the spec's metric name and
    // a spec-shaped "queries" map (the worst-10; "n" says how many ran,
    // "compact":1 distinguishes it from the full primary line above).
    // "stalls": total externally-starved draws detected by the
    // resample rule, with the queries they hit — lets a reader of the
    // compact line alone know which numbers carry a stall annotation.
    val stallQs = results.filter(_._4.exists(_.stalled == 1))
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val nStalls = results.map(_._4.count(_.stalled == 1)).sum
    // mid-suite ambient-load summary (r18): the calibration probes
    // bracket the suite, so co-tenant load that arrives mid-run shows
    // up only in the per-draw load1m samples — surface their median/
    // max here so a compact-line reader can adjudicate "was the
    // MIDDLE of the run loaded" without unpacking the telemetry line
    val loads = results.flatMap(_._4.map(_.load)).filter(_ >= 0).sorted
    val loadMed = if (loads.isEmpty) 0.0
      else loads((loads.size - 1) / 2)
    val loadMax = if (loads.isEmpty) 0.0 else loads.last
    val psis = results.flatMap(_._4.map(_.psi)).filter(_ >= 0).sorted
    val psiMed = if (psis.isEmpty) -1.0 else psis((psis.size - 1) / 2)
    val psiMax = if (psis.isEmpty) -1.0 else psis.last
    // "queries" here is the worst-10 SUBSET (the full per-query map
    // rides the primary line and the flat per-line stream below);
    // "queries_subset" names that explicitly instead of duplicating
    // the map under a second key (r17 verdict #3)
    // "master"/"cpus" on the compact line (r19 verdict #6): the
    // driver's scaling probe flagged `suspect_cpus_ignored` because the
    // bench never exposed its parallelism — now it can verify instead
    // of suspecting.
    val compactLine = s"""{"metric":"total","compact":1,"value":${f(okTotal)},"unit":"sec","n":${results.size},"master":"local[$cpus]","cpus":$cpus,"queries":$worst,"queries_subset":"worst10","failed":$failed,"stalls":$nStalls,"stalled_queries":$stallQs,$calibJson,"load1m_med":${f(loadMed)},"load1m_max":${f(loadMax)},"psi_cpu_med":${f(psiMed)},"psi_cpu_max":${f(psiMax)},"load_end":${f(sysLoad)},"heap_end_mb":${f(heapMB)},"sf":"$sfDir"}"""
    println(hvyLine)
    println(compactLine)
    // SELF-CONTAINED artifact file: the driver captures only a bounded
    // tail of stdout (round 7's BENCH artifact truncated the per-query
    // map mid-dict), so the full four lines also land on disk where a
    // reader can parse them without stdout archaeology. Best-effort —
    // a read-only CWD must not fail the bench.
    // Flat per-query stream after the four primary lines: one
    // {"query","value"} object per line (value = the headline best-of
    // wall, -1 for a failure) — readable without unpacking the nested
    // per-iteration arrays.
    val flatLines = results.map { case (k, v, _, _) =>
      s"""{"query":"$k","value":${f(v)}}"""
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Path.of("bench_results.json"),
      (Seq(telLine, itersLine, totalLine, hvyLine, compactLine) ++ flatLines)
        .mkString("", "\n", "\n"))
    catch { case e: Exception =>
      System.err.println(s"[bench] bench_results.json not written: ${e.getMessage}")
    }
    spark.stop()
  }
}
