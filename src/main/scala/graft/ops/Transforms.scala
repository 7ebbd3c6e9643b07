package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/**
 * Row-shaping operators — the capability surface of the reference's
 * transformer set (goetl `transform/transforms.go:41-305`), re-expressed
 * as Column-expression builders so every operation stays inside Catalyst
 * whole-stage codegen (no UDFs on the hot path).
 *
 * Each member returns a `DataFrame => DataFrame` so transforms compose as
 * `df.transform(Transforms.select(...)).transform(Transforms.trimSpace(...))`.
 *
 * Divergences from the reference, by design (SURVEY.md §7.3):
 *  - schemas are per-DataFrame and column-typed, not per-record;
 *  - `convertType` uses Spark cast (null on failure) by default; the
 *    reference's fail-the-record semantics are available via [[strictCast]].
 */
object Transforms {

  /** Keep only the listed fields; missing fields are silently dropped
   *  (reference `transform/transforms.go:41-51` tolerates absences). */
  def select(fields: String*): DataFrame => DataFrame = df => {
    val present = fields.filter(df.columns.contains)
    df.select(present.map(col): _*)
  }

  /** Rename via mapping; non-mapped columns pass through
   *  (reference `transform/transforms.go:55-67`). */
  def rename(mapping: Map[String, String]): DataFrame => DataFrame =
    df => df.withColumnsRenamed(mapping)

  /** Drop one or more fields (reference `transform/transforms.go:202-234`). */
  def removeFields(fields: String*): DataFrame => DataFrame =
    df => df.drop(fields: _*)

  /** Computed column (reference AddField, `transform/transforms.go:71-80`).
   *  The expression is a Column, so arbitrary arithmetic / string logic
   *  stays codegen'd — use a UDF only when a Column can't express it. */
  def addField(name: String, expr: Column): DataFrame => DataFrame =
    df => df.withColumn(name, expr)

  /** Cast with Spark semantics: failure yields null
   *  (reference ConvertType, `transform/transforms.go:84-101`).
   *  String→int/long goes through the exception-free parse kernels
   *  ([[graft.functions.ParseExpressions]]): `try_cast`'s TRY wrapper
   *  throws-and-catches per failing row (~10 µs/row, 8× the success
   *  path) — the wrong cost model for convert-or-null ingestion where
   *  whole columns can be non-numeric. */
  def convertType(field: String, to: DataType): DataFrame => DataFrame = df => {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val c = col(field)
    // resolve through the analyzer (honors spark.sql.caseSensitive),
    // not StructType.apply (always case-sensitive)
    val fieldType = df.select(c).schema.head.dataType
    val converted = (fieldType, to) match {
      case (StringType, IntegerType) => graft.functions.ParseExpressions.tryToInt(c)
      case (StringType, LongType) => graft.functions.ParseExpressions.tryToLong(c)
      case _ => c.try_cast(to)
    }
    df.withColumn(field, converted)
  }

  /** Cast that fails the job on unconvertible values — matches the
   *  reference's error-the-record contract under FailFast
   *  (`transform/transforms.go:92-96` + `pipeline/pipeline.go:294-311`). */
  def strictCast(field: String, to: DataType): DataFrame => DataFrame =
    df => df.withColumn(field,
      when(col(field).isNotNull && col(field).try_cast(to).isNull,
        raise_error(concat(lit(s"graft.strictCast: cannot cast field '$field' value '"),
          col(field).cast("string"), lit(s"' to $to"))).try_cast(to))
        .otherwise(col(field).try_cast(to)))

  /** Convenience casts (reference `transform/transforms.go:104-116`). */
  def toStringField(field: String): DataFrame => DataFrame =
    convertType(field, org.apache.spark.sql.types.StringType)
  def toIntField(field: String): DataFrame => DataFrame =
    convertType(field, org.apache.spark.sql.types.LongType)
  def toFloatField(field: String): DataFrame => DataFrame =
    convertType(field, org.apache.spark.sql.types.DoubleType)

  /** Trim whitespace on string fields (reference `transform/transforms.go:119-136`). */
  def trimSpace(fields: String*): DataFrame => DataFrame = df =>
    fields.foldLeft(df)((d, f) => d.withColumn(f, trim(col(f))))

  /** Case conversion (reference `transform/transforms.go:139-176`). */
  def toUpper(fields: String*): DataFrame => DataFrame = df =>
    fields.foldLeft(df)((d, f) => d.withColumn(f, upper(col(f))))
  def toLower(fields: String*): DataFrame => DataFrame = df =>
    fields.foldLeft(df)((d, f) => d.withColumn(f, lower(col(f))))

  /** Parse a string field into a timestamp with a Java datetime pattern
   *  (reference ParseTime takes a Go layout, `transform/transforms.go:179-198`;
   *  [[goLayoutToJava]] translates the common layouts). */
  def parseTime(field: String, pattern: String): DataFrame => DataFrame =
    df => df.withColumn(field, to_timestamp(col(field), pattern))

  /** ParseTime taking the reference's Go layout directly
   *  (`transform/transforms.go:179-198`) — ports goetl configs verbatim. */
  def parseTimeGo(field: String, goLayout: String): DataFrame => DataFrame =
    parseTime(field, goLayoutToJava(goLayout))

  /** Translate a Go reference-time layout (`transform/transforms.go:179-198`
   *  takes Go layouts) into a Java DateTimeFormatter pattern, so goetl
   *  configs port verbatim.
   *
   *  Proper longest-match tokenizer over the full Go layout token table
   *  (the set Go's `time/format.go` nextStdChunk recognizes): literal
   *  letters in the layout are quoted for Java, and a digit run that is
   *  NOT a recognized reference-time token throws — Go would treat it as
   *  a literal, but a digit literal in a datetime layout is almost always
   *  a mistranscribed token, and silently emitting it produces wrong
   *  timestamps instead of an error. */
  def goLayoutToJava(goLayout: String): String = {
    // Longest-first token table: Go reference-time chunk → Java pattern.
    val table: Seq[(String, String)] = Seq(
      "2006" -> "yyyy",
      "January" -> "MMMM", "Monday" -> "EEEE",
      ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
      // Go's .9-forms drop trailing zeros; Java's closest parse-compatible
      // form is an optional fraction section.
      ".999999999" -> "[.SSSSSSSSS]", ".999999" -> "[.SSSSSS]", ".999" -> "[.SSS]",
      "-07:00:00" -> "xxxxx", "-070000" -> "xxxx",
      "-07:00" -> "xxx", "-0700" -> "xx", "-07" -> "x",
      "Z07:00:00" -> "XXXXX", "Z070000" -> "XXXX",
      "Z07:00" -> "XXX", "Z0700" -> "XX", "Z07" -> "X",
      "Jan" -> "MMM", "Mon" -> "EEE", "MST" -> "zzz",
      "002" -> "DDD", "__2" -> "DD", "_2" -> "d",
      "15" -> "HH", "01" -> "MM", "02" -> "dd", "03" -> "hh",
      "04" -> "mm", "05" -> "ss", "06" -> "yy",
      "PM" -> "a", "pm" -> "a",
      "1" -> "M", "2" -> "d", "3" -> "h", "4" -> "m", "5" -> "s"
    )
    val sb = new StringBuilder
    var i = 0
    def quoteLiteral(run: String): String =
      if (run.exists(c => c.isLetter || c == '\'')) "'" + run.replace("'", "''") + "'"
      else run
    while (i < goLayout.length) {
      table.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, java)) => sb.append(java); i += go.length
        case None =>
          val c = goLayout.charAt(i)
          if (c.isDigit)
            throw new IllegalArgumentException(
              s"goLayoutToJava: unrecognized digit at index $i of layout '$goLayout' — " +
                "not a Go reference-time token; a digit literal here is almost certainly a mistake")
          // Accumulate a run of literal (non-token-starting) chars.
          val start = i
          while (i < goLayout.length && !goLayout.charAt(i).isDigit &&
                 !table.exists { case (go, _) => goLayout.startsWith(go, i) }) i += 1
          sb.append(quoteLiteral(goLayout.substring(start, i)))
      }
    }
    sb.toString
  }

  /** Apply a sequence of transforms in order (reference pipelines chain
   *  transformers, `pipeline/pipeline.go:276-286`; unlike the reference,
   *  chain order interleaves with filters faithfully — SURVEY.md §3.1). */
  /** Parse a JSON string column in place with an explicit DDL schema
   *  (`"a INT, nested STRUCT<x: DOUBLE>"`). Malformed documents yield
   *  null (Spark PERMISSIVE mode) — the fail-soft analogue of the
   *  reference's per-record JSON decode. */
  def parseJson(field: String, ddlSchema: String): DataFrame => DataFrame = df =>
    df.withColumn(field, org.apache.spark.sql.functions.from_json(
      df(field), org.apache.spark.sql.types.StructType.fromDDL(ddlSchema)))

  /** Promote a struct column's fields to top level (dropping the
   *  struct) — the flatten step after [[parseJson]] for nested
   *  documents. Name collisions are the caller's to resolve (rename
   *  first); Spark fails the plan on ambiguity rather than guessing. */
  def flatten(field: String): DataFrame => DataFrame = df => {
    val others = df.columns.filter(_ != field).map(df(_))
    df.select(others.toIndexedSeq :+ org.apache.spark.sql.functions.col(s"$field.*"): _*)
  }

  def chain(ts: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    df => ts.foldLeft(df)((d, t) => t(d))

  // --------------------------------------------------------------------
  // Checked transforms: the reference's CollectErrors contract
  // (`pipeline/pipeline.go:294-311`, `core/error.go:29-47`) — a failing
  // record is not nulled or dropped silently; it is routed to a side
  // output together with what went wrong, and processing continues.
  // --------------------------------------------------------------------

  /** A transform stage that can fail per row. `resolve` returns, for a
   *  given frame: (converted value, failure predicate, error message) —
   *  all Column expressions, so checked pipelines stay inside
   *  whole-stage codegen (failure detection costs one null-check, not
   *  an exception). */
  sealed trait CheckedStage {
    def field: String
    private[graft] def resolve(df: DataFrame): (Column, Column, Column)
  }

  /** Checked [[convertType]]: failure = non-null input that does not
   *  convert (null input passes through as null — absence is not an
   *  error, matching Spark cast semantics and the reference's
   *  null-tolerant transforms). */
  final case class CheckedCast(field: String, to: DataType) extends CheckedStage {
    private[graft] def resolve(df: DataFrame): (Column, Column, Column) = {
      import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
      val c = col(field)
      // same dispatch as [[convertType]], but as UNBOUND expressions —
      // the caller composes them onto its own frame
      val fieldType = df.select(c).schema.head.dataType
      val converted = (fieldType, to) match {
        case (StringType, IntegerType) => graft.functions.ParseExpressions.tryToInt(c)
        case (StringType, LongType) => graft.functions.ParseExpressions.tryToLong(c)
        case _ => c.try_cast(to)
      }
      (converted, c.isNotNull && converted.isNull,
        concat(lit(s"field '$field': cannot cast '"), c.cast("string"), lit(s"' to ${to.sql}")))
    }
  }

  /** Checked [[parseTime]]: failure = non-null string that does not
   *  parse with the pattern. */
  final case class CheckedParseTime(field: String, pattern: String) extends CheckedStage {
    private[graft] def resolve(df: DataFrame): (Column, Column, Column) = {
      val c = col(field)
      val converted = try_to_timestamp(c, lit(pattern))
      (converted, c.isNotNull && converted.isNull,
        concat(lit(s"field '$field': cannot parse '"), c.cast("string"),
          lit(s"' with pattern '$pattern'")))
    }
  }

  /** Checked custom conversion: caller supplies the converted value,
   *  the failure predicate, and the message (reference custom
   *  TransformFunc + ErrorHandler pairing). */
  final case class CheckedCustom(field: String, converted: Column,
                                 failed: Column, message: Column) extends CheckedStage {
    private[graft] def resolve(df: DataFrame): (Column, Column, Column) =
      (converted, failed, message)
  }

  /** Error-frame schema produced by [[collectErrors]]: the ORIGINAL
   *  record (pipeline-input values for checked fields, JSON-encoded so
   *  error frames from different pipeline positions stay unionable)
   *  plus every stage error message that hit the row. */
  val ErrorRecordCol = "record"
  val ErrorMessagesCol = "errors"

  /**
   * Apply checked stages in chain order, splitting the input into
   * (good, errors):
   *
   *  - `good`: rows no stage failed on, with ALL conversions applied —
   *    later stages see earlier stages' converted values, exactly like
   *    a [[chain]] of the unchecked forms;
   *  - `errors`: rows at least one stage failed on, as
   *    (`record` JSON of the original row, `errors` array of messages).
   *    A row failing stage k still runs through stages k+1.. (its
   *    failed field is null there, and null input is never an error),
   *    so ALL its problems are reported in one pass — the reference's
   *    CollectErrors accumulates the same way.
   *
   * Both frames derive from one projection chain; consumers of both
   * pay two source scans unless the caller caches — the same trade the
   * lazy operators make everywhere else in this library.
   */
  def collectErrors(stages: Seq[CheckedStage]): DataFrame => (DataFrame, DataFrame) = df => {
    val originalCols = df.columns.toSeq
    // Stash pipeline-input values of checked fields once (a field may
    // be converted by an earlier stage; the error frame reports what
    // the pipeline was GIVEN, not a half-converted intermediate).
    val checkedFields = stages.map(_.field).distinct
    val stash = checkedFields.map(f => f -> s"__orig_$f").toMap
    var cur = stash.foldLeft(df) { case (d, (f, s)) => d.withColumn(s, col(f)) }
    val errCols = stages.zipWithIndex.map { case (st, i) =>
      val (converted, failed, msg) = st.resolve(cur)
      val en = s"__err_$i"
      // error expr FIRST (reads the pre-conversion value), then convert
      cur = cur.withColumn(en, when(failed, msg))
        .withColumn(st.field, converted)
      en
    }
    val errArr = filter(array(errCols.map(col): _*), _.isNotNull)
    val scratch = errCols ++ stash.values
    val good = cur.filter(size(errArr) === 0).drop(scratch: _*)
    val restored = originalCols.map(c =>
      stash.get(c).map(s => col(s).as(c)).getOrElse(col(c)))
    val errs = cur.filter(size(errArr) > 0)
      .select(to_json(struct(restored: _*)).as(ErrorRecordCol),
        errArr.as(ErrorMessagesCol))
    (good, errs)
  }

  /** Checked stages under SkipErrors: failing rows are dropped, good
   *  rows continue converted (reference SkipErrors strategy). */
  def skipErrors(stages: Seq[CheckedStage]): DataFrame => DataFrame =
    df => collectErrors(stages)(df)._1

  /** Checked stages under FailFast: the first failing row raises, with
   *  the same message the error frame would carry (reference FailFast;
   *  generalizes [[strictCast]] to any checked stage). */
  def failFast(stages: Seq[CheckedStage]): DataFrame => DataFrame = df => {
    var cur = df
    stages.foreach { st =>
      val (converted, failed, msg) = st.resolve(cur)
      val dt = cur.select(converted).schema.head.dataType
      cur = cur.withColumn(st.field,
        when(failed, raise_error(concat(lit("graft.failFast: "), msg)).try_cast(dt))
          .otherwise(converted))
    }
    cur
  }

  /**
   * Dataset patch/overlay: merge a CORRECTIONS frame over a base —
   * where both have a key, the correction's non-null values win
   * column-wise; base-only and correction-only rows pass through.
   * The late-correction / config-overlay merge (a full-outer join +
   * per-column coalesce), upsert semantics WITHOUT a mutable table.
   *
   * Both frames must share a schema; null in a correction column
   * falls back to the base value (a correction that must null a
   * field should carry a sentinel and map it after).
   *
   * One key-shuffled full-outer join; AQE broadcasts a small
   * correction set.
   */
  def patch(base: DataFrame, fixes: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "patch needs key columns")
    require(base.columns.toSeq == fixes.columns.toSeq,
      s"patch frames must share a schema: ${base.columns.toSeq} vs ${fixes.columns.toSeq}")
    val payload = base.columns.filterNot(keys.contains).toSeq
    val f = fixes.select(fixes.columns.map(c => col(c).as(s"__f_$c")).toSeq: _*)
    val cond = keys.map(c => col(c) === col(s"__f_$c")).reduce(_ && _)
    base.join(f, cond, "full_outer")
      .select(
        keys.map(c => coalesce(col(s"__f_$c"), col(c)).as(c)) ++
          payload.map(c => coalesce(col(s"__f_$c"), col(c)).as(c)): _*)
  }

  /**
   * Missing-value imputation per group — the cleaning step between
   * "drop the row" and "train on garbage". `strategy`:
   *  - `"mean"`: exact-DECIMAL group mean of the non-null values,
   *    surfaced as double (order-independent, engine-reproducible —
   *    the [[graft.agg.Stats]] discipline);
   *  - `"median"`: the group's exact discrete 50th percentile
   *    ([[graft.agg.GroupBy.percentilesDisc]] — an actual data
   *    value, works for any orderable type);
   *  - `"mode"`: the group's most frequent non-null value, ties to
   *    the smallest (deterministic, works for categoricals).
   *
   * Output: the input plus `out` = value with nulls filled by the
   * group statistic (all-null groups stay null). `groupCols` empty →
   * one global statistic.
   *
   * Scale posture: one group-keyed aggregate builds the |groups|-row
   * statistic table (AQE broadcasts it back); the fill itself is a
   * pure projection.
   */
  def impute(df: DataFrame, groupCols: Seq[String], valueCol: String,
             strategy: String, out: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val outCol = if (out.nonEmpty) out else s"${valueCol}_f"
    val stat = strategy match {
      case "mean" =>
        df.groupBy(groupCols.map(col): _*)
          .agg((sum(col(valueCol).cast("decimal(18,2)")).cast("double") /
            count(col(valueCol)).cast("double")).as("__stat"))
      case "median" =>
        graft.agg.GroupBy.percentilesDisc(df, groupCols, valueCol,
            Seq(0.5), out = "__stat")
          .drop("p")
      case "mode" =>
        df.filter(col(valueCol).isNotNull)
          .groupBy((groupCols :+ valueCol).map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .withColumn("__r", row_number().over(
            Window.partitionBy(groupCols.map(col): _*)
              .orderBy(col("__n").desc, col(valueCol).asc)))
          .filter(col("__r") === 1)
          .select(groupCols.map(col) :+ col(valueCol).as("__stat"): _*)
      case other =>
        throw new IllegalArgumentException(
          s"impute strategy must be mean/median/mode, got $other")
    }
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(stat))
      else df.join(stat, groupCols, "left")
    joined
      .withColumn(outCol, coalesce(col(valueCol), col("__stat")))
      .drop("__stat")
  }
  /**
   * Unpivot (melt): widen-to-long reshape — one output row per
   * (row, value column), with the column NAME in `varName` and its
   * value (cast to a common type) in `valueName`. The inverse of the
   * pivot surface; the tidy-data primitive feeding per-metric
   * aggregation, plotting extracts, and EAV sinks.
   *
   * Values are cast to `valueType` (default double — unpivot only
   * makes sense over comparable measures); nulls are KEPT (a melted
   * null is a fact: the measure was absent), matching ANSI UNPIVOT
   * INCLUDE NULLS.
   *
   * Scale posture: one shuffle-free codegen'd projection (a
   * `stack(n, ...)` generator) — row count multiplies by
   * |valueCols|, width shrinks to id + 2; no state, no join.
   */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valueName: String = "value",
           valueType: String = "double"): DataFrame = {
    require(valueCols.nonEmpty, "melt needs value columns")
    val pairs = valueCols.map(c =>
      s"'${c.replace("'", "''")}', CAST(`$c` AS $valueType)").mkString(", ")
    df.select(idCols.map(col) :+
      expr(s"stack(${valueCols.size}, $pairs) AS (`$varName`, `$valueName`)")
        : _*)
  }
}
