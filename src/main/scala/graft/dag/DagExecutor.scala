package graft.dag

import org.apache.spark.sql.DataFrame

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import scala.util.control.NonFatal

/** Terminal task states (reference task status,
 *  `dag/dag_executor.go:254-306`). */
sealed trait TaskStatus
object TaskStatus {
  case object Success extends TaskStatus
  case object Failed extends TaskStatus
  /** Trigger rule unsatisfied → task (and its AllSuccess descendants)
   *  skipped, mirroring the reference's gating. */
  case object Skipped extends TaskStatus
}

final case class TaskResult(
    id: String,
    status: TaskStatus,
    attempts: Int,
    durationMs: Long,
    error: Option[Throwable] = None,
    /** Output row count (reference RecordsOut, `dag/tasks/base.go:188-193`);
     *  populated only when the executor runs with `collectMetrics=true`
     *  — counting forces a job per task. */
    recordsOut: Option[Long] = None)

final case class DagResult(
    success: Boolean,
    results: Map[String, TaskResult],
    outputs: Map[String, DataFrame],
    /** Final shared context (reference global context, `dag/dag.go:124-144`). */
    context: Map[String, Any] = Map.empty)

/**
 * Dependency-driven executor (reference `dag/dag_executor.go:83-306`).
 *
 * Deliberate improvement over the reference (SURVEY.md §3.2): tasks
 * are scheduled as soon as THEIR dependencies finish, not in global
 * levels — the reference's level barrier (`dag_executor.go:120-139`)
 * makes every task wait for the whole previous level. Observable
 * behavior for any DAG is identical; stragglers stop blocking
 * unrelated branches.
 *
 * Concurrency: `maxWorkers` threads submit independent Spark actions
 * concurrently (Spark's scheduler interleaves their stages); the
 * orchestration itself holds no Spark internals.
 */
final class DagExecutor(maxWorkers: Int = Runtime.getRuntime.availableProcessors(),
                        collectMetrics: Boolean = false) {

  def execute(dag: Dag): DagResult = {
    val pool = Executors.newFixedThreadPool(math.max(1, maxWorkers))
    val timeoutPool = Executors.newCachedThreadPool()
    val context = new DagContext
    try {
      val results = collection.mutable.Map.empty[String, TaskResult]
      val outputs = collection.mutable.Map.empty[String, DataFrame]
      val pending = collection.mutable.Set(dag.tasks.keySet.toSeq: _*)
      val running = collection.mutable.Map.empty[String, java.util.concurrent.Future[TaskResult]]
      val lock = new Object

      def depsDone(t: TaskDef): Boolean =
        t.deps.forall(results.contains)

      def triggerSatisfied(t: TaskDef): Boolean = {
        val dep = t.deps.map(results(_).status)
        t.trigger match {
          case TriggerRule.AllSuccess => dep.forall(_ == TaskStatus.Success)
          case TriggerRule.AllComplete => true
          case TriggerRule.OneFailed => dep.contains(TaskStatus.Failed)
          case TriggerRule.OneSuccess => dep.contains(TaskStatus.Success)
          case TriggerRule.NoneFailed => !dep.contains(TaskStatus.Failed)
        }
      }

      def runWithRetryAndTimeout(t: TaskDef, ins: Map[String, DataFrame]): TaskResult = {
        val start = System.nanoTime()
        var attempt = 0
        var lastError: Option[Throwable] = None
        while (attempt <= t.retry.maxRetries) {
          attempt += 1
          val fut = timeoutPool.submit(new java.util.concurrent.Callable[DataFrame] {
            def call(): DataFrame = t.runWithContext match {
              case Some(f) => f(ins, context)
              case None => t.run(ins)
            }
          })
          try {
            val out = fut.get(t.timeoutMs, TimeUnit.MILLISECONDS)
            lock.synchronized { outputs(t.id) = out }
            val n = if (collectMetrics) Some(out.count()) else None
            return TaskResult(t.id, TaskStatus.Success, attempt,
              (System.nanoTime() - start) / 1000000, recordsOut = n)
          } catch {
            case e: TimeoutException =>
              fut.cancel(true)
              lastError = Some(new TimeoutException(
                s"task ${t.id} timed out after ${t.timeoutMs} ms"))
              // A timeout is not retried-around by the reference either:
              // treat as a failed attempt subject to the retry budget.
              if (attempt <= t.retry.maxRetries)
                Thread.sleep(t.retry.backoff.delayMs(attempt))
            case e: java.util.concurrent.ExecutionException =>
              val cause = Option(e.getCause).getOrElse(e)
              lastError = Some(cause)
              if (attempt <= t.retry.maxRetries && t.retry.shouldRetry(cause))
                Thread.sleep(t.retry.backoff.delayMs(attempt))
              else
                return TaskResult(t.id, TaskStatus.Failed, attempt,
                  (System.nanoTime() - start) / 1000000, lastError)
            case NonFatal(e) =>
              lastError = Some(e)
              if (attempt <= t.retry.maxRetries && t.retry.shouldRetry(e))
                Thread.sleep(t.retry.backoff.delayMs(attempt))
              else
                return TaskResult(t.id, TaskStatus.Failed, attempt,
                  (System.nanoTime() - start) / 1000000, lastError)
          }
        }
        TaskResult(t.id, TaskStatus.Failed, attempt,
          (System.nanoTime() - start) / 1000000, lastError)
      }

      while (pending.nonEmpty || running.nonEmpty) {
        // Launch every task whose dependencies are all terminal.
        val ready = pending.toSeq.sorted
          .map(dag.tasks).filter(t => depsDone(t) && !running.contains(t.id))
        ready.foreach { t =>
          pending -= t.id
          if (!triggerSatisfied(t)) {
            results(t.id) = TaskResult(t.id, TaskStatus.Skipped, 0, 0)
          } else {
            // Skipped deps have no output (e.g. under AllComplete):
            // the task sees only the outputs that exist. Read under the
            // same lock the workers write with — a concurrent HashMap
            // resize mid-read corrupts results even for unrelated keys.
            val ins = lock.synchronized {
              t.deps.flatMap(d => outputs.get(d).map(d -> _)).toMap
            }
            running(t.id) = pool.submit(new java.util.concurrent.Callable[TaskResult] {
              def call(): TaskResult = runWithRetryAndTimeout(t, ins)
            })
          }
        }
        // Collect any finished task, then re-evaluate readiness.
        val done = running.find(_._2.isDone)
        done match {
          case Some((id, fut)) =>
            results(id) = fut.get()
            running -= id
          case None if running.nonEmpty => Thread.sleep(2)
          case None => () // only skipped tasks remained; loop re-evaluates
        }
      }

      DagResult(
        success = results.values.forall(_.status != TaskStatus.Failed),
        results = results.toMap,
        outputs = lock.synchronized(outputs.toMap),
        context = context.toMap)
    } finally {
      pool.shutdownNow()
      timeoutPool.shutdownNow()
    }
  }
}
