package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{Transforms => T}

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stages apply in chain order (filter between transforms)") {
    val src = Seq(1, 2, 3, 4).toDF("v")
    // Double v, keep > 4, then add one — the filter must see DOUBLED
    // values (the reference would run both transforms first).
    val out = Pipeline.from(src)
      .transform(T.addField("v", col("v") * 2))
      .filter(col("v") > 4)
      .transform(T.addField("v", col("v") + 1))
      .build()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(out == Seq(7, 9))
  }

  test("execute writes all sinks and reports output count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val n = Pipeline.from(Seq((1, "a"), (2, "b")).toDF("id", "v"))
      .filter(col("id") > 0)
      .to(df => graft.sinks.Sinks.parquet(df, s"$dir/p"))
      .to(df => graft.sinks.Sinks.jsonl(df, s"$dir/j"))
      .execute()
    assert(n == 2)
    assert(spark.read.parquet(s"$dir/p").count() == 2)
    assert(spark.read.json(s"$dir/j").count() == 2)
  }

  test("error strategies map to source parse modes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_err").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.json"),
      "{\"id\": 1}\nnot json at all\n{\"id\": 3}\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    // SkipErrors drops the bad line
    val skipped = graft.sources.Sources.jsonl(spark, dir, Some(schema),
      mode = Pipeline.SkipErrors.sourceMode)
    assert(skipped.count() == 2)
    // CollectErrors keeps it in _corrupt_record (cache first — Spark
    // disallows queries touching only the internal corrupt column)
    val collected = graft.sources.Sources.jsonl(spark, dir, Some(schema),
      mode = Pipeline.CollectErrors.sourceMode).cache()
    assert(collected.filter(col("_corrupt_record").isNotNull).count() == 1)
    collected.unpersist()
    // FailFast throws on materialization
    intercept[Exception] {
      graft.sources.Sources.jsonl(spark, dir, Some(schema),
        mode = Pipeline.FailFast.sourceMode).count()
    }
  }
}
