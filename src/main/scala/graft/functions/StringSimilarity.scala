package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro-Winkler similarity, pinned to the convention DuckDB's
 * `jaro_winkler_similarity` implements (probe-verified bit-identical
 * on a 289-pair cross sample, PLANS.md round 10):
 *
 *  - Jaro: match window `max(|a|,|b|)/2 − 1`, greedy left-to-right
 *    matching, transpositions = half the out-of-order matches,
 *    `(m/|a| + m/|b| + (m−t)/m) / 3` in exactly that IEEE order;
 *  - Winkler boost only when jaro > 0.7: `j + ℓ·0.1·(1−j)` with ℓ the
 *    common prefix length capped at 4;
 *  - EITHER input empty → 0.0 (including both-empty — the DuckDB
 *    convention; the textbook 1.0 for two empties is the one probe
 *    divergence, resolved in DuckDB's favor so the oracle replays).
 *
 * Spark ships no Jaro-Winkler (only levenshtein), hence the native
 * expression: stays inside whole-stage codegen as one reference-object
 * call with native null handling (same rationale as
 * [[BpeTokenizeExpr]]).
 */
object StringSimilarity {

  /** The pinned kernel over full Unicode codepoints. */
  def jaroWinkler(a: String, b: String): Double = {
    val l1 = a.codePointCount(0, a.length)
    val l2 = b.codePointCount(0, b.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val c1 = a.codePoints().toArray
    val c2 = b.codePoints().toArray
    if (java.util.Arrays.equals(c1, c2)) return winkler(1.0, c1, c2)
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && c2(j) == c1(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (c1(i) != c2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    winkler(jaro, c1, c2)
  }

  private def winkler(jaro: Double, c1: Array[Int], c2: Array[Int]): Double =
    if (jaro > 0.7) {
      val max = math.min(4, math.min(c1.length, c2.length))
      var p = 0
      while (p < max && c1(p) == c2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
}

/** [[StringSimilarity.jaroWinkler]] as a codegen'd binary expression. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  def sim(a: UTF8String, b: UTF8String): Double =
    StringSimilarity.jaroWinkler(a.toString, b.toString)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("jwExpr", this, classOf[JaroWinklerExpr].getName)
      s"${ev.value} = $self.sim($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
