package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec,
  InputAdapter, ProjectExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Plan lint — the engine's 100×-readiness checks as a USER-FACING
 * API: run the same physical-plan predicates the internal
 * PlanGuardSpec pins (cartesian products, single-partition windows,
 * unbroadcast small join sides, unpushed partition filters, codegen
 * fallbacks, shuffle counts) against ANY DataFrame and get a report
 * back — "would this plan survive a 1000-executor cluster reading
 * 100 TB" as a queryable result instead of tribal knowledge.
 *
 * Every rule checks a SHAPE property of the physical plan, so the
 * report is deterministic for a fixed query + session config (it
 * never executes the input). With AQE enabled the inspected plan is
 * the INITIAL adaptive plan — AQE may still improve a flagged shape
 * at runtime (e.g. convert a sort-merge join to broadcast once the
 * build side's true size is known); a `warn` therefore means "not
 * PROVEN scale-safe at plan time", the same contract the internal
 * guards use. [[lintFinal]] / [[findingsFinal]] lint AQE's FINAL
 * choices instead — executing the query once if needed — so a CI
 * gate can assert on what actually ran.
 *
 * One row per rule, ALWAYS (status `ok` with n = 0 when clean), so
 * callers can assert on the full report shape:
 * `lint(df).filter($"status" === "warn").isEmpty` is the CI gate.
 */
object PlanLint {

  /** One lint result: `rule` (stable kebab-case id), `status`
   *  (`ok` | `warn`), `n` (how many plan nodes fired it), `detail`
   *  (what it means at scale + the standard fix). */
  final case class Finding(rule: String, status: String, n: Long,
                           detail: String)

  /**
   * Lint a DataFrame's physical plan; driver-side result (the plan
   * tree lives on the driver — there is nothing to distribute).
   *
   * @param maxExchanges      shuffle-count ceiling before
   *                          `exchange-count` warns (each shuffle
   *                          rewrites the working set over the
   *                          network at 100 TB)
   * @param broadcastableBytes a sort-merge join whose smaller side's
   *                          OPTIMIZER-ESTIMATED size is at or under
   *                          this warns `broadcastable-join` —
   *                          `broadcast()` it and the corpus-side
   *                          shuffle disappears
   * @param wideScanCols      a file scan that reads EVERY data column
   *                          of a source at least this wide warns
   *                          `full-width-scan` — at 100 TB column
   *                          pruning is the first I/O lever, and a
   *                          full-width read of a wide table usually
   *                          means a `select` is missing upstream
   */
  def findings(df: DataFrame, maxExchanges: Int = 4,
               broadcastableBytes: Long = 32L << 20,
               wideScanCols: Int = 8): Seq[Finding] =
    findingsOfPlan(df.queryExecution.executedPlan, maxExchanges,
      broadcastableBytes, wideScanCols)

  private[core] def findingsOfPlan(root: SparkPlan,
               maxExchanges: Int,
               broadcastableBytes: Long,
               wideScanCols: Int): Seq[Finding] = {
    require(maxExchanges >= 0, s"maxExchanges must be >= 0")
    require(broadcastableBytes >= 0, s"broadcastableBytes must be >= 0")
    require(wideScanCols >= 1, s"wideScanCols must be >= 1")
    // strip adaptive / query-stage wrappers so rules see real operators;
    // track whether we're inside a WholeStageCodegen span (InputAdapter
    // re-opens the interpreted world below it)
    val nodes = scala.collection.mutable.ArrayBuffer
      .empty[(SparkPlan, Boolean)]
    def walk(p: SparkPlan, inCodegen: Boolean): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, inCodegen)
      case q: QueryStageExec => walk(q.plan, inCodegen)
      case w: WholeStageCodegenExec =>
        nodes += ((w, inCodegen)); w.children.foreach(walk(_, true))
      case i: InputAdapter =>
        nodes += ((i, inCodegen)); i.children.foreach(walk(_, false))
      case other =>
        nodes += ((other, inCodegen))
        other.children.foreach(walk(_, inCodegen))
    }
    walk(root, inCodegen = false)
    val plan = nodes.map(_._1)

    val cartesians = plan.count(_.isInstanceOf[CartesianProductExec])
    val nestedLoops = plan.count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
    val globalWindows = plan.count {
      case w: WindowExec => w.partitionSpec.isEmpty
      case _ => false
    }
    val globalSorts = plan.count {
      case s: SortExec => s.global
      case _ => false
    }
    val exchanges = plan.count(_.isInstanceOf[ShuffleExchangeLike])
    // a side's optimizer-estimated bytes: the first node in the
    // side's subtree carrying a logical link (sorts/exchanges above
    // the scan often have none); a side with no link anywhere counts
    // as large — the rule under-warns rather than mis-warns
    def sideBytes(p: SparkPlan): BigInt =
      p.collect {
        case n if n.logicalLink.isDefined =>
          n.logicalLink.get.stats.sizeInBytes
      }.headOption.getOrElse(BigInt(Long.MaxValue))
    val smallSmjs = plan.count {
      case j: SortMergeJoinExec =>
        sideBytes(j.left).min(sideBytes(j.right)) <=
          BigInt(broadcastableBytes)
      case _ => false
    }
    val unprunedPartScans = plan.count {
      case s: FileSourceScanExec =>
        s.relation.partitionSchema.nonEmpty && s.partitionFilters.isEmpty
      case _ => false
    }
    // a scan whose post-scan data filters outnumber what reached the
    // reader is carrying an untranslatable predicate (udf/length/...)
    // — IsNotNull and plain comparisons always push, so equality
    // holds exactly when every predicate was translated. The
    // PushedFilters metadata is a ", "-joined list whose ELEMENTS can
    // themselves contain ", " (In(col, [a, b]), string literals), so
    // count bracket-aware: only commas at nesting depth 0 separate
    // filters — every element is a `Name(args…)` rendering, so its
    // internal commas sit at depth >= 1.
    // filter VALUES are rendered unquoted, so a literal containing an
    // unbalanced bracket (In(s, [a)b]), StringStartsWith(s, ()) makes
    // the element list unparseable — depth dips below 0 or ends
    // nonzero. Rather than warn/ok off a shifted count, an imbalanced
    // rendering returns None ("unknown") and the scan is excluded
    // from the filter-not-pushed rule entirely: parse ambiguity must
    // not flip the rule either way.
    def pushedCount(s: FileSourceScanExec): Option[Int] =
      s.metadata.get("PushedFilters").map(_.trim)
        .filter(v => v.startsWith("[") && v.endsWith("]"))
        .map(_.stripPrefix("[").stripSuffix("]").trim) match {
        case None => Some(0)
        case Some(v) if v.isEmpty => Some(0)
        case Some(v) =>
          var depth = 0; var n = 1; var balanced = true
          v.foreach {
            case '(' | '[' => depth += 1
            case ')' | ']' =>
              depth -= 1; if (depth < 0) balanced = false
            case ',' if depth == 0 => n += 1
            case _ => ()
          }
          if (balanced && depth == 0) Some(n) else None
      }
    val unpushedFilters = plan.count {
      case s: FileSourceScanExec =>
        s.dataFilters.nonEmpty &&
          pushedCount(s).exists(s.dataFilters.size > _)
      case _ => false
    }
    // a scan whose read schema covers EVERY data column of a wide
    // source: either the query truly consumes all of them, or a
    // projection is missing and the scan ships dead columns
    val fullWidthScans = plan.count {
      case s: FileSourceScanExec =>
        val dataCols = s.relation.dataSchema.fields.length
        dataCols >= wideScanCols &&
          s.requiredSchema.fields.length >= dataCols
      case _ => false
    }
    val interpreted = nodes.count {
      case (_: ProjectExec, false) | (_: FilterExec, false) => true
      case _ => false
    }
    val udfs = plan.iterator.map(_.expressions.map(e =>
      e.collect { case u: ScalaUDF => u }.size).sum).sum

    def f(rule: String, n: Int, warn: Boolean, detail: String) =
      Finding(rule, if (warn) "warn" else "ok", n.toLong, detail)
    Seq(
      f("cartesian-join", cartesians, cartesians > 0,
        "CartesianProduct compares every row pair — O(n²) rows " +
          "shipped at scale; add an equi-key, band the condition " +
          "(binned range/interval join), or broadcast a bounded side"),
      f("nested-loop-join", nestedLoops, nestedLoops > 0,
        "BroadcastNestedLoopJoin streams the big side past every " +
          "broadcast row — fine when the broadcast side is small and " +
          "bounded (top-k probes), a scan-multiplier otherwise; " +
          "verify the broadcast side cannot grow with the data"),
      f("global-window", globalWindows, globalWindows > 0,
        "a window with no PARTITION BY moves EVERY row to one " +
          "partition — one task, one executor, no scale-out; " +
          "partition the window or use a global aggregate instead"),
      f("global-sort", globalSorts, globalSorts > 0,
        "a global ORDER BY range-shuffles the full result; at 100 TB " +
          "prefer sortWithinPartitions, a top-k limit (planner turns " +
          "it into TakeOrderedAndProject), or sort only the final " +
          "small output"),
      f("exchange-count", exchanges, exchanges > maxExchanges,
        s"$exchanges shuffle exchange(s), ceiling $maxExchanges: " +
          "each one rewrites the working set across the network; " +
          "co-partition (bucketing), reuse one partitioning across " +
          "stages, or pre-aggregate before joining"),
      f("broadcastable-join", smallSmjs, smallSmjs > 0,
        "sort-merge join whose smaller side the optimizer estimates " +
          s"at <= $broadcastableBytes bytes: broadcast() it and the " +
          "big side's shuffle disappears (AQE may do this at " +
          "runtime, but a hint makes it a guarantee)"),
      f("partition-filter-missing", unprunedPartScans, unprunedPartScans > 0,
        "scan of a hive-partitioned source with NO partition filter " +
          "reads every partition; filter on the partition column(s) " +
          "so pruning cuts the input before any I/O"),
      f("filter-not-pushed", unpushedFilters, unpushedFilters > 0,
        "scan carries more post-scan data filters than reached the " +
          "reader (dataFilters > PushedFilters — at least one " +
          "predicate was NOT translated) — the format/expression " +
          "blocks pushdown (e.g. a UDF or length() predicate); " +
          "rewrite it over plain columns so the scan skips row groups"),
      f("full-width-scan", fullWidthScans, fullWidthScans > 0,
        s"scan reads EVERY data column of a >= $wideScanCols-column " +
          "source: at 100 TB column pruning is the first I/O lever — " +
          "select only the needed fields so the reader's ReadSchema " +
          "shrinks (or verify the consumer truly needs all of them)"),
      f("interpreted-stage", interpreted, interpreted > 0,
        "Project/Filter outside any WholeStageCodegen span runs " +
          "interpreted (codegen fallback) — usually a non-codegen " +
          "expression in the hot path; prefer built-in functions or " +
          "a doGenCode-capable expression"),
      f("scala-udf", udfs, udfs > 0,
        "ScalaUDF in the plan: opaque to the optimizer (no pushdown " +
          "through it, no codegen) — prefer org.apache.spark.sql." +
          "functions or a native Catalyst expression"))
  }

  /** [[findings]] as a one-partition DataFrame (rule, status, n,
   *  detail), rule-name ordered — composes with the caller's own
   *  reporting sinks; `filter(status = 'warn')` is the CI gate. */
  def lint(df: DataFrame, maxExchanges: Int = 4,
           broadcastableBytes: Long = 32L << 20,
           wideScanCols: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    findings(df, maxExchanges, broadcastableBytes, wideScanCols)
      .sortBy(_.rule).toDF("rule", "status", "n", "detail")
  }

  /**
   * Lint AQE's FINAL physical plan — what actually RAN, after
   * runtime replanning (sort-merge→broadcast conversions once the
   * build side's true size is known, skew-join splits, coalesced
   * shuffle partitions). [[findings]]/[[lint]] inspect the INITIAL
   * adaptive plan and never execute the input; this variant closes
   * the loop the `broadcastable-join` rule's own detail text points
   * at ("AQE may do this at runtime") by letting a CI gate assert
   * on the runtime choices themselves.
   *
   * If `df`'s plan has not executed yet, this EXECUTES it once —
   * one full distributed pass whose rows are discarded executor-side
   * (nothing is collected to the driver) — then walks the now-final
   * adaptive plan. If the caller already ran an action on this very
   * DataFrame, the executed plan is reused and nothing re-runs.
   * Plans without an adaptive wrapper (AQE off, or a command) lint
   * exactly as [[findings]] does.
   */
  def findingsFinal(df: DataFrame, maxExchanges: Int = 4,
                    broadcastableBytes: Long = 32L << 20,
                    wideScanCols: Int = 8): Seq[Finding] = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec if !a.isFinalPlan =>
        // drive THIS QueryExecution's RDD (a noop-sink write would
        // plan a fresh command around the logical plan and leave
        // df's own adaptive plan un-finalized)
        df.queryExecution.toRdd.foreach(_ => ())
      case _ => ()
    }
    findings(df, maxExchanges, broadcastableBytes, wideScanCols)
  }

  /** [[findingsFinal]] as the same one-row-per-rule DataFrame shape
   *  [[lint]] returns — `lint` for plan-time CI (never executes),
   *  `lintFinal` for post-run assertions on what AQE actually chose. */
  def lintFinal(df: DataFrame, maxExchanges: Int = 4,
                broadcastableBytes: Long = 32L << 20,
                wideScanCols: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    findingsFinal(df, maxExchanges, broadcastableBytes, wideScanCols)
      .sortBy(_.rule).toDF("rule", "status", "n", "detail")
  }

  /**
   * Session-wide continuous lint — the CI-continuous completion of
   * [[lint]]/[[lintFinal]]: register ONE listener and every action
   * in the session gets its EXECUTED plan linted with no call sites
   * to remember. Because a [[org.apache.spark.sql.util
   * .QueryExecutionListener]] fires AFTER the action completes, the
   * plan it sees carries AQE's final choices — these are
   * [[lintFinal]] semantics for free, with zero extra executions.
   *
   * Returns the [[InstalledLint]] handle: `report()` is the
   * accumulated findings as a DataFrame (one row per action × rule),
   * `warnings` the warn-only subset as data, `clear()` resets,
   * `close()` unregisters (try-with-resources friendly). Typical CI
   * shape:
   * {{{
   *   val lint = PlanLint.install(spark)
   *   try { runJob(spark) } finally {
   *     assert(lint.warnings.isEmpty, lint.warnings.mkString("\n"))
   *     lint.close()
   *   }
   * }}}
   *
   * The listener bus is ASYNCHRONOUS: after the last action, call
   * `spark.sparkContext.listenerBus`-draining utilities or simply
   * assert after `close()` on a quiesced session; `report()` reads a
   * point-in-time snapshot. Recording is driver-side and
   * plan-tree-sized per action (never touches data); failed actions
   * are skipped (no finalized plan to trust).
   */
  def install(spark: org.apache.spark.sql.SparkSession,
              maxExchanges: Int = 4,
              broadcastableBytes: Long = 32L << 20,
              wideScanCols: Int = 8): InstalledLint = {
    val h = new InstalledLint(spark, maxExchanges, broadcastableBytes,
      wideScanCols)
    spark.listenerManager.register(h)
    h
  }

  /** Handle returned by [[install]]: accumulates one lint report per
   *  completed action until [[InstalledLint.close]]. */
  final class InstalledLint private[core] (
      spark: org.apache.spark.sql.SparkSession,
      maxExchanges: Int, broadcastableBytes: Long, wideScanCols: Int)
    extends org.apache.spark.sql.util.QueryExecutionListener
    with AutoCloseable {

    private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Seq[Finding])]()

    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit = {
      // lint the executed plan (AQE-final at this point); a listener
      // must never throw back into the bus
      try buf.add((seq.getAndIncrement(), funcName,
        findingsOfPlan(qe.executedPlan, maxExchanges,
          broadcastableBytes, wideScanCols))): Unit
      catch { case _: Exception => () }
    }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()

    /** Point-in-time snapshot of every recorded (action, rule) row:
     *  `(action, func, rule, status, n, detail)`, action-then-rule
     *  ordered. Building the report is itself an action and will be
     *  recorded too once it executes — `clear()` between assertion
     *  rounds keeps reports disjoint. */
    def report(): DataFrame = {
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      buf.iterator().asScala.toSeq.flatMap { case (i, func, fs) =>
        fs.map(f => (i, func, f.rule, f.status, f.n, f.detail))
      }.sortBy(r => (r._1, r._3))
        .toDF("action", "func", "rule", "status", "n", "detail")
        .coalesce(1)
    }

    /** The warn rows recorded so far, as data (driver-side, no job):
     *  `(action, func, Finding)` — the CI-assert surface. */
    def warnings: Seq[(Long, String, Finding)] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq.flatMap { case (i, func, fs) =>
        fs.filter(_.status == "warn").map(f => (i, func, f))
      }.sortBy(w => (w._1, w._3.rule))
    }

    /** Drop everything recorded so far (the action counter keeps
     *  climbing — report rows stay globally ordered). */
    def clear(): Unit = buf.clear()

    /** Unregister from the session; the handle stops recording and
     *  keeps whatever it already recorded readable. */
    override def close(): Unit =
      spark.listenerManager.unregister(this)
  }
}
