package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Exception-free lenient string→integer parsing.
 *
 * `try_cast(s AS INT)` runs the ANSI cast inside a TRY wrapper, so a
 * row that fails to parse pays a thrown-and-caught
 * `NumberFormatException` — measured ~10 µs/row, 8× slower than the
 * success path, on an all-invalid column (the realistic worst case for
 * "convert-or-null" ingestion of messy data: a column that is mostly
 * NOT numeric). These kernels parse via `UTF8String.toInt/toLong
 * (IntWrapper/LongWrapper)` — Spark's own non-throwing parser (sign,
 * digits, overflow check) over the `trimAll()`ed input — so invalid
 * rows cost a boolean, not an exception.
 *
 * Semantics: whitespace-trimmed optional-sign decimal integers;
 * anything else (including decimal points and overflow) → null —
 * matching `try_cast` on integral/garbage inputs (equivalence
 * unit-tested across the corner cases). The grammar is parsed by hand
 * because Spark's only non-throwing parser (`UTF8String.toInt`) is the
 * LEGACY-cast one that truncates decimals ("12.5" → 12, where
 * `try_cast` yields null).
 */
abstract class TryParseIntegral extends UnaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  /** Strict `[+-]?[0-9]+` over the trimAll()ed input, range-checked to
   *  [min, max]; boxed Long or null. Accumulates NEGATIVE so
   *  Long.MinValue parses without overflow. */
  protected final def parseRange(s: UTF8String, min: Long, max: Long): java.lang.Long = {
    val t = s.trimAll()
    val n = t.numBytes()
    if (n == 0) return null
    val first = t.getByte(0)
    val neg = first == '-'
    var i = if (neg || first == '+') 1 else 0
    if (i >= n) return null
    var v = 0L
    while (i < n) {
      val c = t.getByte(i)
      if (c < '0' || c > '9') return null
      val d = c - '0'
      if (v < (Long.MinValue + d) / 10) return null
      v = v * 10 - d
      i += 1
    }
    if (!neg) {
      if (v == Long.MinValue) return null
      v = -v
    }
    if (v < min || v > max) return null
    java.lang.Long.valueOf(v)
  }

  /** Boxed result or null — shared by interpreted eval and the
   *  generated code (one implementation, no mode drift). */
  def parse(s: UTF8String): Any

  override protected def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[UTF8String])

  protected def genParse(ctx: CodegenContext, ev: ExprCode,
                         boxCls: String, a: String): String = {
    val self = ctx.addReferenceObj("tryParse", this, classOf[TryParseIntegral].getName)
    val boxed = ctx.freshName("boxed")
    s"""
       |$boxCls $boxed = ($boxCls) $self.parse($a);
       |if ($boxed == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $boxed; }
     """.stripMargin
  }
}

/** Non-throwing `try_cast(s AS INT)` analogue. */
case class TryToInt(child: Expression) extends TryParseIntegral {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_try_int"

  override def parse(s: UTF8String): Any = {
    val v = parseRange(s, Int.MinValue, Int.MaxValue)
    if (v == null) null else java.lang.Integer.valueOf(v.intValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => genParse(ctx, ev, "java.lang.Integer", a))

  override protected def withNewChildInternal(newChild: Expression): TryToInt =
    copy(child = newChild)
}

/** Non-throwing `try_cast(s AS BIGINT)` analogue. */
case class TryToLong(child: Expression) extends TryParseIntegral {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_try_long"

  override def parse(s: UTF8String): Any =
    parseRange(s, Long.MinValue, Long.MaxValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => genParse(ctx, ev, "java.lang.Long", a))

  override protected def withNewChildInternal(newChild: Expression): TryToLong =
    copy(child = newChild)
}

/** Column-level entry points for the parse kernels. */
object ParseExpressions {
  def tryToInt(c: Column): Column =
    GraftShims.column(TryToInt(GraftShims.expression(c.cast("string"))))
  def tryToLong(c: Column): Column =
    GraftShims.column(TryToLong(GraftShims.expression(c.cast("string"))))
}
