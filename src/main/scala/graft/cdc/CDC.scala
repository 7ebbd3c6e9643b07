package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot-diff change data capture — the reference's CDCTask
 * (goetl `dag/tasks/cdc.go:103-161`) re-expressed as ONE full-outer
 * join, so change detection shuffles on the key columns and scales
 * horizontally instead of indexing the previous snapshot in RAM
 * (`cdc.go:105-112`).
 *
 * Reference semantics preserved:
 *  - INSERT  = key present only in current        (`cdc.go:138-142`)
 *  - UPDATE  = key in both AND any compare field differs (`cdc.go:132-137`)
 *  - DELETE  = key present only in previous       (`cdc.go:146-157`)
 *  - unchanged rows are dropped (no output row)   (`cdc.go:132-137` else)
 *  - rows whose key fields are missing/null are skipped on BOTH sides
 *    (`buildRecordKey`, `cdc.go:163-173`)
 *  - output = the originating record (current for INSERT/UPDATE,
 *    previous for DELETE) + `change_type` (+ `change_timestamp`)
 *    (`createChangeRecord`, `cdc.go:188-202`)
 *
 * Deliberate divergence (SURVEY.md §7.3): field comparison uses typed
 * null-safe equality (`<=>`) instead of the reference's
 * `fmt.Sprintf("%v")` string-formatted compare (`cdc.go:176-186`) —
 * observably identical except on pathological cross-type values.
 */
object CDC {

  val ChangeTypeCol = "change_type"
  val ChangeTimestampCol = "change_timestamp"

  /**
   * Diff two snapshots. Output columns = `current.columns` (both inputs
   * must share the key + compare + payload columns) ++ `change_type`
   * ++ optionally `change_timestamp`.
   *
   * @param changeTimestamp expression for the audit timestamp column;
   *   `Some(current_timestamp())` mirrors the reference's RFC3339 now
   *   (`cdc.go:199`); None omits the column for deterministic output.
   */
  val AllChangeTypes: Seq[String] = Seq("INSERT", "UPDATE", "DELETE")

  /**
   * @param changeTypes which change kinds to emit. The reference
   *   DECLARES this config but never enforces it (`cdc.go:36` vs the
   *   emit paths) — here it filters, as the config promises.
   */
  def changes(
      current: DataFrame,
      previous: DataFrame,
      keyFields: Seq[String],
      compareFields: Seq[String],
      changeTimestamp: Option[Column] = Some(current_timestamp()),
      changeTypes: Seq[String] = AllChangeTypes): DataFrame = {
    require(keyFields.nonEmpty, "CDC needs at least one key field")
    require(compareFields.nonEmpty, "CDC needs at least one compare field")
    require(changeTypes.nonEmpty && changeTypes.forall(AllChangeTypes.contains),
      s"changeTypes must be drawn from $AllChangeTypes")

    def dropNullKeys(df: DataFrame): DataFrame =
      df.filter(keyFields.map(col(_).isNotNull).reduce(_ && _))

    val payload = current.columns.toSeq
    val cur = dropNullKeys(current).withColumn("__cur", lit(true))
    val prev = dropNullKeys(previous)
      .select(payload.map(col): _*).withColumn("__prev", lit(true))
      // Prefix non-key columns so the full-outer join keeps both sides.
      .transform(df => payload.filterNot(keyFields.contains)
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, s"__prev_$c")))

    // USING-style full outer join coalesces the key columns natively.
    val joined = cur.join(prev, keyFields, "full_outer")

    val isInsert = col("__prev").isNull
    val isDelete = col("__cur").isNull
    val differs = compareFields
      .map(f => !(col(f) <=> col(s"__prev_$f"))).reduce(_ || _)

    val changeType = when(isInsert, "INSERT")
      .when(isDelete, "DELETE")
      .when(differs, "UPDATE") // both present, some compare field changed

    // DELETE rows carry the previous record's values (cdc.go:152-156).
    val outCols = payload.map { c =>
      if (keyFields.contains(c)) col(c)
      else when(isDelete, col(s"__prev_$c")).otherwise(col(c)).as(c)
    } :+ changeType.as(ChangeTypeCol)

    val withTs = changeTimestamp match {
      case Some(ts) => outCols :+ ts.as(ChangeTimestampCol)
      case None => outCols
    }

    joined.select(withTs: _*)
      .filter(col(ChangeTypeCol).isin(changeTypes: _*))
  }
  /**
   * Apply a change feed to a snapshot — [[changes]]' inverse: INSERTs
   * and UPDATEs upsert by key, DELETEs remove, so
   * `apply(previous, changes(current, previous, …)) == current` holds
   * exactly over the key+compare+payload columns (the round-trip
   * contract the gate checks). This is the batch MERGE-INTO shape:
   * refresh a materialized snapshot from an extracted delta without
   * rescanning the source.
   *
   * Feed rows carry [[ChangeTypeCol]] (and optionally
   * [[ChangeTimestampCol]], dropped here). Duplicate keys within one
   * feed are a caller error for INSERT/UPDATE (last-writer is
   * undefined); the reference's snapshot diff never emits them.
   *
   * Scale posture: ONE key-keyed full-outer join consuming the feed
   * exactly once (an anti-join + union formulation reads the feed —
   * often itself a computed diff — twice); rows resolve columnwise:
   * no feed row → snapshot row, DELETE → dropped, INSERT/UPDATE →
   * the feed's payload. The feed is typically the small side and
   * broadcasts.
   */
  def applyChanges(snapshot: DataFrame, feed: DataFrame,
                   keyFields: Seq[String]): DataFrame = {
    require(keyFields.nonEmpty, "applyChanges needs at least one key field")
    val cols = snapshot.columns.toSeq
    val payload = cols.filterNot(keyFields.contains)
    val f = feed.select(keyFields.map(col) :+
      col(ChangeTypeCol).as("__ct") :+
      struct(payload.map(col): _*).as("__new"): _*)
    snapshot.join(f, keyFields, "full_outer")
      .filter(col("__ct").isNull || col("__ct").isin("INSERT", "UPDATE"))
      .select(cols.map { c =>
        if (keyFields.contains(c)) col(c)
        else when(col("__ct").isNull, col(c))
          .otherwise(col(s"__new.$c")).as(c)
      }: _*)
  }
}
