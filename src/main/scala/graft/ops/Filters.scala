package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Predicate builders — the reference's filter surface
 * (goetl `filter/filters.go:38-246`) as pure [[Column]] expressions.
 * Everything here is codegen'd. Pushdown: string/equality/in predicates
 * reach the parquet scan directly; the double-coercing numeric forms
 * ([[greaterThan]]/[[lessThan]]/[[between]]) do NOT reach parquet
 * `PushedFilters` (measured on Spark 4.1.2: `cast(c as double) > x`
 * stays above the scan even for bigint columns), and bigints beyond
 * 2^53 lose precision in the coercion. They exist for goetl's lenient
 * cross-type semantics (`filter/filters.go:249-264`). Callers that know
 * the column type should use the typed forms ([[gt]]/[[lt]]/
 * [[betweenTyped]]), which compare without coercion and always push down.
 *
 * Reference semantics preserved: a missing/null field excludes the record
 * in every predicate (`filter/filters.go` passim) — Spark's three-valued
 * NULL logic gives the same observable drop-the-row behavior in `.filter`.
 */
object Filters {

  /** Excludes null AND empty-string values (reference NotNull,
   *  `filter/filters.go:38-52` treats "" as null-like). */
  def notNull(field: String): Column = {
    val c = col(field)
    c.isNotNull && !(c.cast(StringType) === lit(""))
  }

  /** Typed equality (reference used reflect.DeepEqual, `filter/filters.go:55-63`). */
  def equalsTo(field: String, value: Any): Column = col(field) === lit(value)

  def contains(field: String, substr: String): Column = col(field).contains(substr)
  def startsWith(field: String, prefix: String): Column = col(field).startsWith(prefix)
  def endsWith(field: String, suffix: String): Column = col(field).endsWith(suffix)

  /** Regex match (reference `filter/filters.go:108-120`); Java regex. */
  def matchesRegex(field: String, pattern: String): Column = col(field).rlike(pattern)

  /** Numeric comparisons after double coercion (reference coerces leniently,
   *  `filter/filters.go:123-172`, `:249-264`; non-numeric ⇒ excluded).
   *  `try_cast`, not `cast`: under ANSI mode (the Spark 4 default) a
   *  plain cast THROWS on a malformed string instead of excluding the
   *  row — the reference's lenient semantics need the null-on-failure
   *  form in every session. */
  def greaterThan(field: String, v: Double): Column = col(field).try_cast("double") > lit(v)
  def lessThan(field: String, v: Double): Column = col(field).try_cast("double") < lit(v)
  /** Inclusive on both ends (reference `filter/filters.go:152-172`). */
  def between(field: String, lo: Double, hi: Double): Column =
    col(field).try_cast("double").between(lit(lo), lit(hi))

  /** Typed comparisons — no coercion, so the predicate pushes to the
   *  scan for every column type and long-range values stay exact. */
  def gt(field: String, v: Any): Column = col(field) > lit(v)
  def lt(field: String, v: Any): Column = col(field) < lit(v)
  def betweenTyped(field: String, lo: Any, hi: Any): Column =
    col(field).between(lit(lo), lit(hi))

  /** Set membership (reference `filter/filters.go:175-189`). */
  def in(field: String, values: Any*): Column = col(field).isin(values: _*)

  /** Combinators (reference `filter/filters.go:192-232`); Catalyst
   *  short-circuits and reorders these safely. */
  def and(cs: Column*): Column = {
    require(cs.nonEmpty, "Filters.and needs at least one predicate")
    cs.reduce(_ && _)
  }
  def or(cs: Column*): Column = {
    require(cs.nonEmpty, "Filters.or needs at least one predicate")
    cs.reduce(_ || _)
  }
  def not(c: Column): Column = !c
}
