package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, SquaredL2}

/**
 * Session-extensions entry point: enables graft's native SQL functions
 * on any cluster without code changes —
 * `--conf spark.sql.extensions=graft.GraftExtensions` (or
 * `SparkSession.builder().withExtensions(new GraftExtensions)`).
 * The same expression builders back the imperative
 * [[graft.functions.Functions.register]] path.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functionList.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  /** (name, builder) for every injectable native function. */
  val functionList: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_sqdist" -> (es => SquaredL2(es(0), es(1))))
}
