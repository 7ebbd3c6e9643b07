package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Linear pipeline facade — the reference's fluent
 * `From(src).Transform(...).Filter(...).To(sink)` surface
 * (goetl `pipeline/pipeline.go:68-159`, execution `:180-251`)
 * over one lazy DataFrame plan.
 *
 * Deliberate improvement (SURVEY.md §3.1): the reference stores
 * transforms and filters in separate lists, so ALL transforms run
 * before ANY filter regardless of chaining order
 * (`pipeline/pipeline.go:217`, `:231`). Here stages apply in the exact
 * order chained — and Catalyst then reorders them safely (filter
 * pushdown) without changing semantics.
 *
 * Error strategies (reference `core/error.go:29-47`, applied
 * `pipeline/pipeline.go:294-311`) map to Spark-native mechanisms:
 *  - parse-level errors via source modes ([[ErrorStrategy.sourceMode]]);
 *  - transform-stage errors via [[Pipeline.transformChecked]], which
 *    honors the strategy per checked stage: FailFast raises on the
 *    first bad row, SkipErrors drops bad rows, CollectErrors routes
 *    them to a side error frame ([[Pipeline.buildWithErrors]] /
 *    [[Pipeline.executeCollecting]]) with per-row messages — the full
 *    reference CollectErrors contract, rows kept and inspected, not
 *    nulled.
 */
object Pipeline {

  sealed trait ErrorStrategy {
    /** The Spark source parse mode implementing this strategy for
     *  CSV/JSON reads. */
    def sourceMode: String
  }
  /** First bad record fails the job (reference FailFast). */
  case object FailFast extends ErrorStrategy { val sourceMode = "FAILFAST" }
  /** Bad records are dropped (reference SkipErrors). */
  case object SkipErrors extends ErrorStrategy { val sourceMode = "DROPMALFORMED" }
  /** Bad records are kept in a side output for later inspection
   *  (reference CollectErrors; Spark `_corrupt_record` at parse level,
   *  the [[graft.ops.Transforms.collectErrors]] split at transform level). */
  case object CollectErrors extends ErrorStrategy { val sourceMode = "PERMISSIVE" }

  def from(source: => DataFrame): Pipeline =
    new Pipeline(() => source, Vector.empty, Vector.empty, FailFast)
}

final class Pipeline private (
    source: () => DataFrame,
    // each stage maps (current frame, effective error strategy) to
    // (continuing rows, rows diverted to the error side-channel, if
    // the stage has one) — the strategy is a parameter, not a capture,
    // so withErrorStrategy after chaining still governs every stage
    stages: Vector[(DataFrame, Pipeline.ErrorStrategy) => (DataFrame, Option[DataFrame])],
    sinks: Vector[DataFrame => Unit],
    val errorStrategy: Pipeline.ErrorStrategy) {

  /** Append a transform stage (kept in chain order). */
  def transform(t: DataFrame => DataFrame): Pipeline =
    new Pipeline(source,
      stages :+ ((df: DataFrame, _: Pipeline.ErrorStrategy) => (t(df), None)),
      sinks, errorStrategy)

  /** Append checked (per-row-failable) transform stages, honoring the
   *  pipeline's error strategy — the reference applies one strategy to
   *  the whole pipeline (`pipeline/pipeline.go:294-311`), so the
   *  strategy is read when the stage is APPLIED, i.e. a later
   *  [[withErrorStrategy]] still governs earlier checked stages. */
  def transformChecked(checked: graft.ops.Transforms.CheckedStage*): Pipeline =
    new Pipeline(source, stages :+ { (df: DataFrame, strategy: Pipeline.ErrorStrategy) =>
      strategy match {
        case Pipeline.FailFast =>
          (graft.ops.Transforms.failFast(checked)(df), None)
        case Pipeline.SkipErrors =>
          (graft.ops.Transforms.skipErrors(checked)(df), None)
        case Pipeline.CollectErrors =>
          val (good, errs) = graft.ops.Transforms.collectErrors(checked)(df)
          (good, Some(errs))
      }
    }, sinks, errorStrategy)

  /** Append a filter stage (kept in chain order, unlike the reference). */
  def filter(predicate: Column): Pipeline =
    new Pipeline(source,
      stages :+ ((df: DataFrame, _: Pipeline.ErrorStrategy) => (df.filter(predicate), None)),
      sinks, errorStrategy)

  /** Register a sink; multiple sinks each force their own action. */
  def to(sink: DataFrame => Unit): Pipeline =
    new Pipeline(source, stages, sinks :+ sink, errorStrategy)

  def withErrorStrategy(s: Pipeline.ErrorStrategy): Pipeline =
    new Pipeline(source, stages, sinks, s)

  /** The composed lazy plan (no action). */
  def build(): DataFrame = buildWithErrors()._1

  /** The composed lazy plan PLUS the collected-error frame: every row
   *  a CollectErrors checked stage diverted, as (`record` original-row
   *  JSON, `errors` array of messages) — stage-position-independent
   *  schema, so frames from every checked stage union into one. None
   *  when no stage collected (strategy not CollectErrors, or no
   *  checked stages chained). */
  def buildWithErrors(): (DataFrame, Option[DataFrame]) = {
    val (out, errFrames) = stages.foldLeft((source(), Vector.empty[DataFrame])) {
      case ((df, errs), stage) =>
        val (good, err) = stage(df, errorStrategy)
        (good, errs ++ err)
    }
    (out, errFrames.reduceOption(_ unionByName _))
  }

  /** Run: applies stages, writes all sinks, returns the output row
   *  count (the reference reports RecordsProcessed,
   *  `pipeline/pipeline.go:250`). The count comes from an `observe`
   *  metric piggybacked on the first sink's action — NOT from a
   *  separate `count()` pass, which would re-execute the whole plan
   *  and could disagree with what the sinks actually wrote when the
   *  source changes between runs. If no sink ran a Spark action (so
   *  no metric exists), falls back to one `count()` rather than
   *  blocking on the observation. A sink that consumes only part of
   *  the plan (e.g. a `limit`) reports the rows it consumed.
   *
   *  Under CollectErrors with checked stages, `execute()` runs the
   *  good path only — the collected error frame is available ONLY
   *  through [[executeCollecting]]/[[buildWithErrors]]; a warning is
   *  logged so the diversion is never silent. */
  def execute(): Long = {
    val (out, errs) = buildWithErrors()
    if (errs.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "Pipeline.execute() under CollectErrors: checked stages divert " +
          "failing rows to an error frame this call DISCARDS — use " +
          "executeCollecting() to inspect them")
    executeInternal(out)
  }

  /** [[execute]] + the collected error frame (empty-schema-correct
   *  frame when nothing collected): the reference's post-run
   *  `CollectErrors` inspection hook. */
  def executeCollecting(): (Long, DataFrame) = {
    val (out, errs) = buildWithErrors()
    val n = executeInternal(out)
    val errFrame = errs.getOrElse {
      val spark = out.sparkSession
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField(graft.ops.Transforms.ErrorRecordCol, StringType),
          StructField(graft.ops.Transforms.ErrorMessagesCol, ArrayType(StringType, containsNull = false)))))
    }
    (n, errFrame)
  }

  private def executeInternal(df: DataFrame): Long = {
    if (sinks.isEmpty) df.count()
    else {
      import org.apache.spark.sql.functions.{count, lit}
      val obs = org.apache.spark.sql.Observation()
      val observed = df.observe(obs, count(lit(1)).as("n"))
      sinks.foreach(_(observed))
      // metrics arrive via an async listener that can lag behind a
      // completed action on a busy driver — wait generously before
      // concluding that no sink triggered an action and falling back
      // to a count() re-execution (correct, but a second full pass)
      try {
        import scala.concurrent.Await
        import scala.concurrent.duration._
        Await.result(obs.future, 30.seconds).getAs[Long]("n")
      } catch {
        case _: java.util.concurrent.TimeoutException => df.count()
      }
    }
  }
}
