package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MathExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("libmLog: Math.log on positives, null on zero/negative/null") {
    val df = Seq(Some(1.0), Some(math.E), Some(0.25), Some(0.0),
      Some(-3.0), None).toDF("x")
    val out = df.select(MathFunctions.libmLog(col("x"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).contains(0.0))
    assert(out(1).contains(Math.log(math.E)))
    assert(out(2).contains(Math.log(0.25)))
    assert(out(3).isEmpty && out(4).isEmpty && out(5).isEmpty)
  }

  test("libmLog: codegen and interpreted paths agree") {
    val xs = (1 to 1000).map(i => i / 7.0)
    val viaDf = xs.toDF("x")
      .select(MathFunctions.libmLog(col("x"))).collect().map(_.getDouble(0))
    assert(viaDf.sameElements(xs.map(Math.log)))
  }

  test("libmLog differs from Spark's StrictMath-based log where fdlibm rounds differently") {
    // the motivating case: Spark log() = StrictMath.log (fdlibm), which
    // lands 1 ulp from libm/Math.log on a measurable input fraction
    val xs = (1 to 20000).map(i => i.toDouble / 20001.0)
    val rows = xs.toDF("x")
      .select(MathFunctions.libmLog(col("x")).as("a"), log(col("x")).as("b"))
      .collect()
    val diffs = rows.count(r => r.getDouble(0) != r.getDouble(1))
    assert(diffs > 0, "expected at least one fdlibm-vs-intrinsic ulp difference")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <=
        math.ulp(r.getDouble(0)) * 2)
    }
  }
}
