package graft.scd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension operators — the reference's SCDTask
 * (goetl `dag/tasks/scd.go`) as single-join DataFrame algorithms.
 *
 * The reference indexes the dimension in a driver-side hash map
 * (`scd.go:99-113`); here each SCD type is ONE shuffle join (or a
 * broadcast join when the dimension is small), so it scales to
 * dimensions that don't fit in memory.
 *
 * Output contract preserved from the reference: only keys present in
 * the SOURCE produce output rows — untouched dimension keys (including
 * all historical rows) are NOT emitted (`scd.go:119-158`). Source rows
 * with null business-key fields are skipped (`buildBusinessKey`,
 * `scd.go:260-270`).
 *
 * Deliberate divergence (SURVEY.md §7.3): change detection uses typed
 * null-safe equality instead of `fmt.Sprintf("%v")` string compare
 * (`scd.go:272-282`).
 */
object SCD {

  /** SCD Type 1 — overwrite: output is the source verbatim; the existing
   *  dimension is ignored (`scd.go:183-186`). */
  def scd1(source: DataFrame): DataFrame = source

  /**
   * SCD Type 2 — close-and-insert row versioning (`scd.go:98-161`).
   *
   * For each source row (joined against CURRENT dimension rows only,
   * `scd.go:106-113`):
   *  - tracked fields changed → emit the closed old row
   *    (`effectiveTo = today`, flag false) AND a new current row
   *    (`effectiveFrom = today`, `effectiveTo = farFuture`, flag true);
   *  - unchanged → emit the existing dimension row;
   *  - new key → emit a new current row.
   *
   * Single-pass: one left join, then each joined row explodes into its
   * 1 or 2 output rows — no plan branch re-executes the join.
   *
   * @param dimension must carry `source.columns` ++ the three SCD
   *   metadata columns.
   * @param today effective-date literal, e.g. `"2024-06-01"`; the
   *   reference stamps wall-clock today (`scd.go:117`) — pass
   *   `java.time.LocalDate.now.toString` for that behavior.
   */
  def scd2(
      source: DataFrame,
      dimension: DataFrame,
      businessKeys: Seq[String],
      trackedFields: Seq[String],
      today: String,
      effectiveFrom: String = "effective_from",
      effectiveTo: String = "effective_to",
      currentFlag: String = "is_current",
      farFuture: String = "9999-12-31"): DataFrame = {
    require(businessKeys.nonEmpty, "SCD2 needs at least one business key")
    require(trackedFields.nonEmpty, "SCD2 needs at least one tracked field")

    val dimCols = dimension.columns.toSeq
    val src = dropNullKeys(source, businessKeys).alias("s")
    val dim = dimension.filter(col(currentFlag) === true).alias("d")
    val cond = businessKeys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val joined = src.join(dim, cond, "left_outer")

    val matched = businessKeys.map(k => col(s"d.$k").isNotNull).reduce(_ && _)
    val changed = trackedFields.map(f => !(col(s"s.$f") <=> col(s"d.$f"))).reduce(_ || _)

    // A row of the OLD dimension version, closed out today.
    val closedRow = struct(dimCols.map {
      case c if c == effectiveTo => lit(today).as(effectiveTo)
      case c if c == currentFlag => lit(false).as(currentFlag)
      case c => col(s"d.$c").as(c)
    }: _*)
    // A NEW current version built from the source record.
    val newRow = struct(dimCols.map {
      case c if c == effectiveFrom => lit(today).as(effectiveFrom)
      case c if c == effectiveTo => lit(farFuture).as(effectiveTo)
      case c if c == currentFlag => lit(true).as(currentFlag)
      case c => col(s"s.$c").as(c)
    }: _*)
    // The existing dimension row, passed through unchanged.
    val existingRow = struct(dimCols.map(c => col(s"d.$c").as(c)): _*)

    joined
      .select(explode(
        when(matched && changed, array(closedRow, newRow))
          .when(matched && !changed, array(existingRow))
          .otherwise(array(newRow))).as("__r"))
      .select("__r.*")
  }

  /**
   * SCD Type 3 — previous-value columns (`scd.go:189-238`): matched
   * source rows gain `previous_<field>` columns holding the dimension's
   * value for each tracked field, and `versionField` = dimension version
   * + 1 (or 1 when the dimension had no integer version); new keys get
   * version 1 and null previous values.
   *
   * Unlike SCD2 the whole dimension is joined (not only current rows,
   * `scd.go:195-202`).
   */
  def scd3(
      source: DataFrame,
      dimension: DataFrame,
      businessKeys: Seq[String],
      trackedFields: Seq[String],
      versionField: String = "version",
      previousPrefix: String = "previous_"): DataFrame = {
    require(businessKeys.nonEmpty, "SCD3 needs at least one business key")

    val src = dropNullKeys(source, businessKeys).alias("s")
    val dimKeep = (businessKeys ++ trackedFields ++
      (if (dimension.columns.contains(versionField)) Seq(versionField) else Nil)).distinct
    val dim = dimension.select(dimKeep.map(col): _*).alias("d")
    val cond = businessKeys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val joined = src.join(dim, cond, "left_outer")

    val matched = businessKeys.map(k => col(s"d.$k").isNotNull).reduce(_ && _)
    val prevVersion =
      if (dimension.columns.contains(versionField))
        col(s"d.$versionField").cast("int")
      else lit(null).cast("int")

    val outCols =
      source.columns.toSeq.map(c => col(s"s.$c").as(c)) ++
        trackedFields.map(f =>
          when(matched, col(s"d.$f")).as(s"$previousPrefix$f")) :+
        when(matched, coalesce(prevVersion + 1, lit(1)))
          .otherwise(lit(1)).as(versionField)

    joined.select(outCols: _*)
  }

  private def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(col(_).isNotNull).reduce(_ && _))

  /**
   * Point-in-time lookup against an SCD2 dimension: join each fact
   * row to the dimension VERSION that was valid at the fact's own
   * date — `from ≤ factDate < to` (half-open, the [[scd2]] interval
   * contract: a version closing on day d and its successor opening on
   * day d never both match). THE query an SCD2 table exists to
   * answer; left join, so facts with no valid version (pre-history
   * dates, late dimension arrivals) survive with null attributes.
   *
   * Scale posture: an equi-join on the business keys with the
   * validity range as a residual join condition — planned as a hash
   * join (dims broadcast under AQE), never a nested loop; versions
   * per key are bounded (that's what an SCD2 grain is), so the range
   * residual scans a handful of rows per fact.
   */
  def pointInTime(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                  factDateCol: String, fromCol: String, toCol: String,
                  prefix: String = "dim_"): DataFrame = {
    require(keys.nonEmpty, "pointInTime needs business keys")
    val payload = dim.columns.filterNot(c =>
      keys.contains(c) || c == fromCol || c == toCol).toSeq
    val d = dim.select(keys.map(c => col(c).as(s"__k_$c")) ++
      Seq(col(fromCol).as("__from"), col(toCol).as("__to")) ++
      payload.map(c => col(c).as(s"$prefix$c")): _*)
    val cond = keys.map(c => col(c) === col(s"__k_$c")).reduce(_ && _) &&
      col("__from") <= col(factDateCol) && col(factDateCol) < col("__to")
    fact.join(d, cond, "left")
      .drop(keys.map(c => s"__k_$c") :+ "__from" :+ "__to": _*)
  }
}
