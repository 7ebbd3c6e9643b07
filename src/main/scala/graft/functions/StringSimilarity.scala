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

  /**
   * FULL (unrestricted) Damerau-Levenshtein distance over UTF-8
   * BYTES, pinned to DuckDB's `damerau_levenshtein` (probe-verified:
   * "CA"→"ABC" = 2 — the unrestricted algorithm, where OSA gives 3 —
   * and "héllo"→"hello" = 2, i.e. BYTE granularity, where a
   * codepoint kernel gives 1). The alphabet table is the 256 byte
   * values; integer counts, no floats anywhere.
   */
  def damerauLevenshtein(a: Array[Byte], b: Array[Byte]): Long = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val maxd = la + lb
    val da = new Array[Int](256)
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = maxd
    var i = 0
    while (i <= la) { d((i + 1) * w) = maxd; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = maxd; d(w + j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        var m = d(i * w + j) + cost                       // substitute
        val ins = d((i + 1) * w + j) + 1                  // insert
        if (ins < m) m = ins
        val del = d(i * w + j + 1) + 1                    // delete
        if (del < m) m = del
        val tr = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tr < m) m = tr
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d((la + 1) * w + lb + 1).toLong
  }
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

/** [[StringSimilarity.damerauLevenshtein]] as a codegen'd binary
 *  expression (BIGINT result — the DuckDB return type). */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  def dist(a: UTF8String, b: UTF8String): Long =
    StringSimilarity.damerauLevenshtein(a.getBytes, b.getBytes)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("dlExpr", this,
        classOf[DamerauLevenshteinExpr].getName)
      s"${ev.value} = $self.dist($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}
