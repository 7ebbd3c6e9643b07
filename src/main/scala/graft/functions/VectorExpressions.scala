package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native (whole-stage-codegen) vector kernels for the similarity /
 * dedup family. The Column-function forms (`aggregate` over
 * `zip_with`) are correct but allocate an intermediate zipped array
 * and evaluate a lambda per element; these expressions compile to a
 * tight primitive loop inside the generated code — the preferred
 * Spark-native extension point for scalar kernels (custom Catalyst
 * `Expression` with `doGenCode`, per the build plan's preference
 * order) — while computing the SAME fixed-order sums, so results stay
 * bit-identical to the Column forms and to the external oracle.
 *
 * Null semantics mirror `aggregate(zip_with(...))`: a null input, a
 * length mismatch (zip_with pads with null), or a null element all
 * yield null.
 */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** Per-element contribution in interpreted mode. */
  protected def combine(x: Double, y: Double): Double
  /** Java source for the per-element contribution in codegen. */
  protected def combineCode(x: String, y: String): String

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += combine(a.getDouble(i), b.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${combineCode(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — sequential fold, bit-identical to
 *  `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"
  protected def combine(x: Double, y: Double): Double = x * y
  protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² — sequential fold, bit-identical to
 *  `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _ + _)`. */
case class SquaredL2(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_sqdist"
  protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  protected def combineCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points + SQL registration for the kernels. */
object VectorExpressions {

  /** Cast to array<double> so float-array (the common on-disk
   *  embedding type) and int-array inputs keep working like the old
   *  lambda forms did; a no-op cast is simplified away by Catalyst. */
  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(d(a)), GraftShims.expression(d(b))))

  def sqDist(a: Column, b: Column): Column =
    GraftShims.column(SquaredL2(GraftShims.expression(d(a)), GraftShims.expression(d(b))))

  /** Make the kernels callable from SQL (`graft_dot`, `graft_sqdist`)
   *  on an already-built session; cluster deployments can instead
   *  inject them at session build via [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.functionList.foreach { case (name, builder) =>
      GraftShims.registerFunction(spark, name, builder)
    }
}
