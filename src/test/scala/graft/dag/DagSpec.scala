package graft.dag

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src(n: Int) = () => (1 to n).toDF("v")

  test("RetryConfig.shouldRetry: substring match on the error " +
    "message; empty list retries on anything") {
    val p = RetryConfig(retryOn = Seq("timeout", "connection"))
    assert(p.shouldRetry(new RuntimeException("read timeout hit")))
    assert(!p.shouldRetry(new RuntimeException("schema mismatch")))
    assert(!p.shouldRetry(new RuntimeException(null: String)))
    assert(RetryConfig().shouldRetry(new RuntimeException("anything")))
  }

  test("addSink forces the write and passes the frame through") {
    val seen = new java.util.concurrent.atomic.AtomicLong(-1)
    val dag = new DagBuilder("d", "d")
      .addSource("s", src(5))
      .addSink("w", Seq("s"), df => seen.set(df.count()))
      .addTransform("after", Seq("w"), _.filter(col("v") > 3))
      .build()
    val res = new DagExecutor(1).execute(dag)
    assert(res.success)
    assert(seen.get() == 5L) // the sink's write ran
    // downstream of a sink sees the same frame (pass-through)
    assert(res.outputs("after").count() == 2L)
  }

  test("builder validates duplicate ids, self-deps, unknown deps, cycles") {
    intercept[IllegalArgumentException] {
      new DagBuilder("d", "d").addSource("a", src(1)).addSource("a", src(1))
    }
    intercept[IllegalArgumentException] {
      new DagBuilder("d", "d").add(TaskDef("a", Seq("a"), _ => null))
    }
    intercept[IllegalArgumentException] {
      new DagBuilder("d", "d").addTransform("a", Seq("ghost"), identity).build()
    }
    intercept[IllegalArgumentException] {
      new DagBuilder("d", "d")
        .add(TaskDef("a", Seq("b"), _ => null))
        .add(TaskDef("b", Seq("a"), _ => null)).build()
    }
  }

  test("topological order respects deps; levels/metrics") {
    val dag = new DagBuilder("d", "d")
      .addSource("s1", src(1)).addSource("s2", src(1))
      .addTransform("t", Seq("s1", "s2"), identity)
      .addTransform("u", Seq("t"), identity)
      .build()
    val order = dag.topoOrder
    assert(order.indexOf("t") > order.indexOf("s1"))
    assert(order.indexOf("u") > order.indexOf("t"))
    assert(dag.levels == Map("s1" -> 1, "s2" -> 1, "t" -> 2, "u" -> 3))
    assert(dag.metrics("maxDepth") == 3)
  }

  test("executor runs a diamond and merges multi-parent inputs as union") {
    val dag = new DagBuilder("d", "d")
      .addSource("a", src(3)).addSource("b", src(2))
      .addTransform("merge", Seq("a", "b"), _.agg(count(lit(1)).as("n")))
      .build()
    val res = new DagExecutor(2).execute(dag)
    assert(res.success)
    assert(res.outputs("merge").collect()(0).getLong(0) == 5L)
  }

  test("failure skips AllSuccess descendants; OneFailed branch runs; NoneFailed tolerates skips") {
    val dag = new DagBuilder("d", "d")
      .addSource("ok", src(1))
      .add(TaskDef("boom", Seq.empty, _ => throw new RuntimeException("kaboom")))
      .addTransform("after_boom", Seq("boom"), identity) // skipped
      .add(TaskDef("cleanup", Seq("boom"), _ => (1 to 1).toDF("v"),
        trigger = TriggerRule.OneFailed))                // runs
      .add(TaskDef("after_skip", Seq("after_boom"), _ => (1 to 1).toDF("v"),
        trigger = TriggerRule.NoneFailed))               // skip is not a failure
      .build()
    val res = new DagExecutor(2).execute(dag)
    assert(!res.success)
    val st = res.results.view.mapValues(_.status).toMap
    assert(st("boom") == TaskStatus.Failed)
    assert(st("after_boom") == TaskStatus.Skipped)
    assert(st("cleanup") == TaskStatus.Success)
    assert(st("after_skip") == TaskStatus.Success)
  }

  test("validation gate passes clean data through and fails downstream on violation") {
    import graft.quality.Quality
    val good = new DagBuilder("d", "d")
      .addSource("src", src(5))
      .addValidation("check", Seq("src"), Quality.Config(minRecords = 1))
      .addTransform("after", Seq("check"), identity)
      .build()
    val ok = new DagExecutor(1).execute(good)
    assert(ok.success && ok.outputs("after").count() == 5)

    val bad = new DagBuilder("d", "d")
      .addSource("src", src(5))
      .addValidation("check", Seq("src"), Quality.Config(minRecords = 100))
      .addTransform("after", Seq("check"), identity)
      .build()
    val res = new DagExecutor(1).execute(bad)
    assert(!res.success)
    assert(res.results("check").status == TaskStatus.Failed)
    assert(res.results("after").status == TaskStatus.Skipped)
  }

  test("retry with backoff retries the configured number of times") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dag = new DagBuilder("d", "d")
      .add(TaskDef("flaky", Seq.empty, _ => {
        if (attempts.incrementAndGet() < 3) throw new RuntimeException("transient")
        (1 to 1).toDF("v")
      }, retry = RetryConfig(maxRetries = 3, backoff = Backoff.Fixed(1))))
      .build()
    val res = new DagExecutor(1).execute(dag)
    assert(res.success)
    assert(res.results("flaky").attempts == 3)
  }

  test("retryOn filter: non-matching errors fail immediately") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dag = new DagBuilder("d", "d")
      .add(TaskDef("fatal", Seq.empty, _ => {
        attempts.incrementAndGet(); throw new RuntimeException("fatal problem")
      }, retry = RetryConfig(maxRetries = 5, backoff = Backoff.None,
        retryOn = Seq("transient"))))
      .build()
    assert(!new DagExecutor(1).execute(dag).success)
    assert(attempts.get() == 1)
  }

  test("timeout fails the task") {
    val dag = new DagBuilder("d", "d")
      .add(TaskDef("slow", Seq.empty, _ => {
        Thread.sleep(5000); (1 to 1).toDF("v")
      }, timeoutMs = 200))
      .build()
    val res = new DagExecutor(1).execute(dag)
    assert(res.results("slow").status == TaskStatus.Failed)
    assert(res.results("slow").error.exists(_.getMessage.contains("timed out")))
  }

  test("shared context flows between tasks; metrics collect row counts; metadata attaches") {
    val dag = new DagBuilder("d", "d")
      .add(TaskDef("probe", Seq.empty, null,
        runWithContext = Some((_, ctx) => {
          val df = (1 to 4).toDF("v")
          ctx.put("probe_rows", 4L)
          df
        })).describe("counts the source", Seq("audit"), owner = "graft"))
      .add(TaskDef("use", Seq("probe"), null,
        runWithContext = Some((ins, ctx) => {
          assert(ctx.get("probe_rows").contains(4L)) // upstream context visible
          ins("probe")
        })))
      .build()
    assert(dag.tasks("probe").meta.description == "counts the source")
    val res = new DagExecutor(2, collectMetrics = true).execute(dag)
    assert(res.success)
    assert(res.context("probe_rows") == 4L)
    assert(res.results("probe").recordsOut.contains(4L))
    assert(res.results("use").recordsOut.contains(4L))
  }

  test("backoff strategies compute expected delays") {
    assert(Backoff.None.delayMs(3) == 0)
    assert(Backoff.Fixed(50).delayMs(3) == 50)
    assert(Backoff.Linear(10).delayMs(3) == 30)
    assert(Backoff.Exponential(10).delayMs(1) == 10)
    assert(Backoff.Exponential(10).delayMs(4) == 80)
    assert(Backoff.Exponential(10, maxMs = 50).delayMs(4) == 50)
    val j = Backoff.Jittered(100)
    assert(j.delayMs(2) == j.delayMs(2)) // deterministic
    assert(j.delayMs(2) >= 100 && j.delayMs(2) <= 150)
  }
}
