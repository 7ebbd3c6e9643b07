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
 * parse-level errors via source modes ([[ErrorStrategy.sourceMode]]),
 * conversion errors via lenient `try_cast` (skip) vs `strictCast`
 * (fail-fast) — see `graft.ops.Transforms`.
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
  /** Bad records are kept in a side column for later inspection
   *  (reference CollectErrors; Spark `_corrupt_record`). */
  case object CollectErrors extends ErrorStrategy { val sourceMode = "PERMISSIVE" }

  def from(source: => DataFrame): Pipeline =
    new Pipeline(() => source, Vector.empty, Vector.empty, FailFast)
}

final class Pipeline private (
    source: () => DataFrame,
    stages: Vector[DataFrame => DataFrame],
    sinks: Vector[DataFrame => Unit],
    val errorStrategy: Pipeline.ErrorStrategy) {

  /** Append a transform stage (kept in chain order). */
  def transform(t: DataFrame => DataFrame): Pipeline =
    new Pipeline(source, stages :+ t, sinks, errorStrategy)

  /** Append a filter stage (kept in chain order, unlike the reference). */
  def filter(predicate: Column): Pipeline =
    new Pipeline(source, stages :+ ((df: DataFrame) => df.filter(predicate)), sinks, errorStrategy)

  /** Register a sink; multiple sinks each force their own action. */
  def to(sink: DataFrame => Unit): Pipeline =
    new Pipeline(source, stages, sinks :+ sink, errorStrategy)

  def withErrorStrategy(s: Pipeline.ErrorStrategy): Pipeline =
    new Pipeline(source, stages, sinks, s)

  /** The composed lazy plan (no action). */
  def build(): DataFrame = stages.foldLeft(source())((df, t) => t(df))

  /** Run: applies stages, writes all sinks, returns the output row
   *  count (the reference reports RecordsProcessed,
   *  `pipeline/pipeline.go:250`). The count comes from an `observe`
   *  metric piggybacked on the first sink's action — NOT from a
   *  separate `count()` pass, which would re-execute the whole plan
   *  and could disagree with what the sinks actually wrote when the
   *  source changes between runs. If no sink ran a Spark action (so
   *  no metric exists), falls back to one `count()` rather than
   *  blocking on the observation. A sink that consumes only part of
   *  the plan (e.g. a `limit`) reports the rows it consumed. */
  def execute(): Long = {
    val df = build()
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
