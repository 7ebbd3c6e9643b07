package graft.dag

import org.apache.spark.sql.DataFrame

/**
 * Task-graph model — the reference's DAG layer (goetl `dag/types.go:38-44`,
 * `dag/dag_builder.go:39-215`) as a thin Scala orchestration veneer.
 *
 * The crucial difference from the reference: task edges carry LAZY
 * DataFrames (logical plans), not materialized record slices
 * (`dag/tasks/base.go:181-193`). Catalyst fuses chains of tasks into
 * single physical plans; only explicitly-acting tasks (sinks,
 * validations) run Spark jobs. The orchestration layer contributes
 * exactly what Catalyst can't: trigger rules, retries, timeouts, and
 * concurrent submission of independent actions.
 */

/** Trigger rules (reference `dag/types.go:29-35`, evaluation
 *  `dag/dag_executor.go:308-349`). */
sealed trait TriggerRule
object TriggerRule {
  /** Run only if ALL dependencies succeeded (default). */
  case object AllSuccess extends TriggerRule
  /** Run once all dependencies finished, regardless of outcome. */
  case object AllComplete extends TriggerRule
  /** Run if at least one dependency failed. */
  case object OneFailed extends TriggerRule
  /** Run if at least one dependency succeeded. */
  case object OneSuccess extends TriggerRule
  /** Run if no dependency failed (success or skipped both fine). */
  case object NoneFailed extends TriggerRule
}

/** Backoff strategies (reference `dag/tasks/base.go:80-144`). */
sealed trait Backoff { def delayMs(attempt: Int): Long }
object Backoff {
  case object None extends Backoff { def delayMs(a: Int) = 0L }
  final case class Fixed(ms: Long) extends Backoff { def delayMs(a: Int) = ms }
  final case class Linear(baseMs: Long) extends Backoff {
    def delayMs(a: Int) = baseMs * a
  }
  final case class Exponential(baseMs: Long, maxMs: Long = Long.MaxValue) extends Backoff {
    def delayMs(a: Int) = math.min(baseMs * (1L << math.min(a - 1, 30)), maxMs)
  }
  /** Deterministic jitter derived from the attempt number (no
   *  wall-clock randomness, reproducible runs). */
  final case class Jittered(baseMs: Long) extends Backoff {
    def delayMs(a: Int) = baseMs + (baseMs * ((a * 2654435761L) % 100) / 200)
  }
}

final case class RetryConfig(
    maxRetries: Int = 0,
    backoff: Backoff = Backoff.None,
    /** Retry only when the error message matches one of these substrings;
     *  empty = retry on any error (reference `shouldRetryError`,
     *  `dag/dag_executor.go:378-391`). */
    retryOn: Seq[String] = Seq.empty) {
  def shouldRetry(e: Throwable): Boolean =
    retryOn.isEmpty || retryOn.exists(s => Option(e.getMessage).exists(_.contains(s)))
}

/** Descriptive task metadata (reference `dag/tasks/base.go:146-204`:
 *  description/tags/owner/custom fields). */
final case class TaskMeta(
    description: String = "",
    tags: Seq[String] = Seq.empty,
    owner: String = "",
    custom: Map[String, Any] = Map.empty)

/** Per-run mutable key-value context shared across tasks (reference
 *  global context, `dag/dag.go:124-144`, merged after each task
 *  `dag_executor.go:264-273`). Lives in the ORCHESTRATOR only — never
 *  inside query plans (SURVEY.md §7.3 item 6). */
final class DagContext {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Any]()
  def put(key: String, value: Any): Unit = m.put(key, value)
  def get(key: String): Option[Any] = Option(m.get(key))
  def toMap: Map[String, Any] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }
}

/** One node: `run` maps dependency outputs (by task id) to this task's
 *  output. Source tasks see an empty map; sink tasks perform their
 *  action and return the written frame. Task kinds (source/transform/
 *  join/…, reference `dag/tasks/base.go:35-45`) collapse into this one
 *  shape because DataFrames compose lazily. Tasks needing the shared
 *  run context use `runWithContext` instead of `run`. */
final case class TaskDef(
    id: String,
    deps: Seq[String],
    run: Map[String, DataFrame] => DataFrame,
    trigger: TriggerRule = TriggerRule.AllSuccess,
    retry: RetryConfig = RetryConfig(),
    timeoutMs: Long = 30 * 60 * 1000L, // reference default 30 min (dag_builder.go:48)
    meta: TaskMeta = TaskMeta(),
    runWithContext: Option[(Map[String, DataFrame], DagContext) => DataFrame] = None) {
  def describe(description: String, tags: Seq[String] = Seq.empty,
               owner: String = ""): TaskDef =
    copy(meta = TaskMeta(description, tags, owner, meta.custom))
}

final case class Dag(id: String, name: String, tasks: Map[String, TaskDef]) {

  /** Kahn topological order (reference `dag/dag.go:339-385`). */
  lazy val topoOrder: Seq[String] = {
    val inDeg = collection.mutable.Map(tasks.map { case (id, t) => id -> t.deps.size }.toSeq: _*)
    val out = tasks.values.flatMap(t => t.deps.map(_ -> t.id))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val queue = collection.mutable.PriorityQueue(
      inDeg.collect { case (id, 0) => id }.toSeq: _*)(Ordering[String].reverse)
    val order = Seq.newBuilder[String]
    var n = 0
    while (queue.nonEmpty) {
      val id = queue.dequeue(); order += id; n += 1
      out.getOrElse(id, Seq.empty).foreach { child =>
        inDeg(child) -= 1
        if (inDeg(child) == 0) queue.enqueue(child)
      }
    }
    require(n == tasks.size, s"DAG $id has a cycle")
    order.result()
  }

  /** Level = 1 + max(dep levels) (reference `dag/dag_executor.go:150-183`) —
   *  exposed for introspection; the executor schedules by actual deps. */
  lazy val levels: Map[String, Int] = {
    val memo = collection.mutable.Map.empty[String, Int]
    def levelOf(id: String): Int = memo.getOrElseUpdate(id, {
      val ds = tasks(id).deps
      if (ds.isEmpty) 1 else 1 + ds.map(levelOf).max
    })
    tasks.keys.foreach(levelOf)
    memo.toMap
  }

  /** Introspection metrics (reference GetDAGMetrics, `dag/dag.go:147-212`). */
  def metrics: Map[String, Any] = Map(
    "taskCount" -> tasks.size,
    "edgeCount" -> tasks.values.map(_.deps.size).sum,
    "maxDepth" -> (if (tasks.isEmpty) 0 else levels.values.max),
    "roots" -> tasks.values.filter(_.deps.isEmpty).map(_.id).toSeq.sorted,
    "leaves" -> {
      val depped = tasks.values.flatMap(_.deps).toSet
      tasks.keys.filterNot(depped.contains).toSeq.sorted
    })
}

/** Fluent builder (reference `dag/dag_builder.go:39-133`): validates
 *  duplicate ids, missing deps, self-deps at add time and cycles at
 *  [[build]] (reference validation `dag_builder.go:153-215`). */
final class DagBuilder(dagId: String, name: String) {
  private val tasks = collection.mutable.LinkedHashMap.empty[String, TaskDef]

  def add(t: TaskDef): this.type = {
    require(!tasks.contains(t.id), s"duplicate task id ${t.id}")
    require(!t.deps.contains(t.id), s"task ${t.id} depends on itself")
    tasks += t.id -> t
    this
  }

  /** Source task: no deps, ignores input (reference AddSourceTask). */
  def addSource(id: String, run: () => DataFrame): this.type =
    add(TaskDef(id, Seq.empty, _ => run()))

  /** Transform over the UNION of dependency outputs — the reference
   *  concatenates multi-parent inputs (`dag/dag_executor.go:362-366`). */
  def addTransform(id: String, deps: Seq[String],
                   run: DataFrame => DataFrame): this.type =
    add(TaskDef(id, deps, ins =>
      run(graft.join.Joins.unionAll(deps.flatMap(ins.get)))))

  /** Join task: exactly two dependencies, left = first (reference
   *  `dag/tasks/join.go:62-63`). */
  def addJoin(id: String, left: String, right: String,
              run: (DataFrame, DataFrame) => DataFrame): this.type =
    add(TaskDef(id, Seq(left, right), ins => run(ins(left), ins(right))))

  /** Validation gate (reference ConditionalTask + DataQualityValidator,
   *  `dag/tasks/conditional.go:49-79`): passes its input THROUGH
   *  unchanged; a failed validation fails the task, so downstream
   *  AllSuccess tasks skip — exactly the reference's gating semantics. */
  def addValidation(id: String, deps: Seq[String],
                    cfg: graft.quality.Quality.Config): this.type =
    add(TaskDef(id, deps, ins => {
      val df = graft.join.Joins.unionAll(deps.flatMap(ins.get))
      graft.quality.Quality.validateOrThrow(df, cfg)
      df
    }))

  /** Sink task: forces the action, passes the frame through. */
  def addSink(id: String, deps: Seq[String],
              write: DataFrame => Unit): this.type =
    add(TaskDef(id, deps, ins => {
      val df = graft.join.Joins.unionAll(deps.flatMap(ins.get))
      write(df)
      df
    }))

  def build(): Dag = {
    val ids = tasks.keySet
    tasks.values.foreach(t => t.deps.foreach(d =>
      require(ids.contains(d), s"task ${t.id} depends on unknown task $d")))
    val dag = Dag(dagId, name, tasks.toMap)
    dag.topoOrder // forces cycle detection
    dag
  }
}
