package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native (whole-stage-codegen) text kernels — the same preference
 * order as [[VectorExpressions]]: a custom Catalyst `Expression`
 * beats a Scala UDF, because a ScalaUDF in a projection is a codegen
 * black box with per-row encoder plumbing, while these stay inside
 * the generated code as one reference-object call with native null
 * handling. They back [[graft.llm.TextAnalysis.nfcNormalize]] /
 * `bpeTokenCountExact` / `bpeTokenize`, which run over EVERY document
 * of a corpus — exactly the hot path the build plan says to keep
 * codegen-friendly.
 *
 * Both share one implementation between interpreted eval and the
 * generated code (called through the codegen reference to the
 * expression instance) — no interpreted-vs-codegen drift.
 */

/**
 * Unicode NFC normalization over `java.text.Normalizer`. Fast path:
 * `isNormalized` (a cheap quick-check, true for all-ASCII and most
 * already-composed text) returns the INPUT UTF8String untouched — the
 * overwhelmingly common corpus case costs one scan, no allocation.
 */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  /** Shared by interpreted eval and generated code. */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("nfcExpr", this, classOf[NfcNormalizeExpr].getName)
      s"${ev.value} = $self.nfc($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Token count from a real merges-table byte-level BPE ([[Bpe]]).
 *  The vocab rides the expression as a serialized reference object
 *  (rank map rebuilt lazily per executor). */
case class BpeCountExpr(child: Expression, vocab: Bpe.BpeVocab)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  def count(u: UTF8String): Long = Bpe.tokenCount(u.toString, vocab)

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bpeCountExpr", this, classOf[BpeCountExpr].getName)
      s"${ev.value} = $self.count($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** GPT-2-shaped PRE-tokenization ([[Bpe.preTokens]]) as a native
 *  kernel: `string → array<string>` of raw pre-token words (no merge
 *  table applied). This is the corpus-scan half of DISTRIBUTED BPE
 *  training — explode + count over every document is the part that
 *  must scale; the merge loop then runs on the bounded vocabulary
 *  (see [[graft.llm.TextAnalysis.bpeTrainFromCorpus]]). */
case class PreTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_pretokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  private[graft] def pretokens(u: UTF8String): ArrayData = {
    val toks = Bpe.preTokens(u.toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    pretokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("preTokensExpr", this, classOf[PreTokensExpr].getName)
      s"${ev.value} = $self.pretokens($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PreTokensExpr =
    copy(child = newChild)
}

/** Full BPE tokenization: the subword strings themselves (byte-mapped
 *  alphabet), as `array<string>`. */
case class BpeTokenizeExpr(child: Expression, vocab: Bpe.BpeVocab)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_tokenize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  private[graft] def tokenize(u: UTF8String): ArrayData = {
    val toks = Bpe.encode(u.toString, vocab)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bpeTokenizeExpr", this, classOf[BpeTokenizeExpr].getName)
      s"${ev.value} = $self.tokenize($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenizeExpr =
    copy(child = newChild)
}

/**
 * Repetition-concentration kernel: duplicated-character mass of a
 * document's word n-grams, in one compiled pass. Input is the token
 * array; the kernel builds the n-gram strings, byte-order sorts them
 * (`UTF8String.compareTo` is unsigned byte comparison — the same
 * order as Spark's `array_sort` and DuckDB's VARCHAR collation, so
 * results are engine-independent), and run-length scans:
 *
 *   - `dup = false` → `count(top gram) · chars(top gram)` — the
 *     numerator of the Gopher top-n-gram char fraction. The
 *     strictly-greater best-run update keeps the FIRST (byte-order
 *     smallest) max-count gram, pinning ties.
 *   - `dup = true` → `Σ_{g: count≥2} count(g)·chars(g)` — the
 *     duplicate-n-gram char mass (a run's 2nd element retroactively
 *     adds the 1st's chars).
 *
 * Fewer than `n` tokens yields 0. Replaces an interpreted
 * `array_sort` + two-struct `aggregate` HOF fold: q114's three
 * signals over the sf0.1 corpus went 4.3 → 0.9 s; the kernel is one
 * reference-object call inside whole-stage codegen.
 */
case class NgramCharsExpr(child: Expression, n: Int, dup: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = if (dup) "graft_dup_ngram_chars" else "graft_top_ngram_chars"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  def chars(arr: ArrayData): Long = {
    val sz = arr.numElements()
    val m = sz - (n - 1)
    if (m <= 0) return 0L
    val grams = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      if (n == 1) {
        val t = arr.getUTF8String(i)
        grams(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      } else {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) {
          val t = arr.getUTF8String(i + k)
          parts(k) = if (t == null) UTF8String.EMPTY_UTF8 else t
          k += 1
        }
        grams(i) = UTF8String.concatWs(space, parts: _*)
      }
      i += 1
    }
    // UTF8String.compareTo is unsigned byte order
    java.util.Arrays.sort(grams, java.util.Comparator.naturalOrder[UTF8String]())
    var best = 0L
    var bestLen = 0L
    var dupChars = 0L
    var run = 0L
    var prev: UTF8String = null
    var j = 0
    while (j < m) {
      val g = grams(j)
      run = if (prev != null && g.equals(prev)) run + 1 else 1
      if (dup) {
        if (run == 2) dupChars += 2L * g.numChars()
        else if (run > 2) dupChars += g.numChars()
      } else if (run > best) {
        best = run
        bestLen = g.numChars()
      }
      prev = g
      j += 1
    }
    if (dup) dupChars else best * bestLen
  }

  override protected def nullSafeEval(input: Any): Any =
    chars(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("ngramCharsExpr", this, classOf[NgramCharsExpr].getName)
      s"${ev.value} = $self.chars($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramCharsExpr =
    copy(child = newChild)
}

/**
 * Deflate compression ratio: `deflate(utf8_bytes).length /
 * utf8_bytes.length` at a FIXED level (6, raw/nowrap stream) — the
 * classic repetition/junk quality signal (highly repetitive boilerplate
 * compresses far below ~0.4; natural prose sits noticeably higher).
 * Pinned to the JDK's zlib with explicit level and no header so the
 * value is stable across JVMs; empty input yields NULL (no signal),
 * not a ratio. Per-row cost is one deflate pass over the document —
 * the same shape as the BPE/NFC kernels, and like them it stays inside
 * whole-stage codegen as a single reference-object call.
 */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  /** Shared by interpreted eval and generated code; null for empty. */
  def ratio(u: UTF8String): Any = {
    val bytes = u.getBytes
    if (bytes.length == 0) null
    else {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / bytes.length.toDouble
      } finally d.end()
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("deflateExpr", this, classOf[DeflateRatioExpr].getName)
    val c = child.genCode(ctx)
    // hand-rolled null propagation: the expression is null-PRODUCING
    // (empty input -> null), which nullSafeCodeGen cannot express
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${c.isNull}) {
          Object ${ev.value}_r = $self.ratio(${c.value});
          if (${ev.value}_r != null) {
            ${ev.isNull} = false;
            ${ev.value} = ((java.lang.Double) ${ev.value}_r).doubleValue();
          }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}
