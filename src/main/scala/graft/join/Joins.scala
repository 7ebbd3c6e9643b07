package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join operators — the reference's single in-memory hash join
 * (goetl `dag/tasks/join.go`) generalized to Catalyst's full strategy set.
 *
 * The reference always hash-builds the right side in RAM
 * (`dag/tasks/join.go:107-117`) — its ceiling. Here Catalyst + AQE pick
 * broadcast / shuffled-hash / sort-merge from statistics at runtime;
 * [[lookup]] force-broadcasts the dimension for the enrichment pattern
 * (`dag/dag_builder.go:126-133` AddLookupTask).
 *
 * Column-name conflicts: the reference's mergeRecords applies
 * leftPrefix/rightPrefix to ALL fields including the join key
 * (`dag/tasks/join.go:196-199`); with no prefixes, clashing right
 * columns get `right_` (`join.go:214-219`). DELIBERATE DIVERGENCE:
 * [[join]] prefixes only non-key columns, because Spark's `using`-style
 * join emits one merged key column — prefixing it would break the merged
 * output contract. A ported goetl config expecting `left_custkey` gets
 * `custkey` here.
 */
object Joins {
  val types: Set[String] = Set("inner", "left", "right", "full", "semi", "anti", "cross")

  private def sparkType(t: String): String = t match {
    case "left"  => "left_outer"
    case "right" => "right_outer"
    case "full"  => "full_outer"
    case "semi"  => "left_semi"
    case "anti"  => "left_anti"
    case other   => other
  }

  /** Strategy hints a caller may pin on the RIGHT side (Catalyst/AQE
   *  choose freely otherwise): broadcast for known-small builds,
   *  shuffle_hash when sort-merge's sort is the bottleneck, merge to
   *  force SMJ, shuffle_replicate_nl as the cartesian fallback. */
  val strategyHints: Set[String] =
    Set("broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl")

  /**
   * Multi-key equi-join (reference composite keys stringified
   * `"v1|v2"`, `join.go:172-187` — here native typed key columns).
   * Many-to-many duplicates emit the cross-product per key, as the
   * reference does (`join.go:110-118`).
   *
   * @param leftPrefix/rightPrefix optional per-side prefixes for
   *   non-key columns (reference JoinConfig prefixes); when both empty,
   *   clashing right columns get `right_` (reference default).
   */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           joinType: String = "inner",
           leftPrefix: String = "", rightPrefix: String = "",
           rightHint: Option[String] = None): DataFrame = {
    require(types.contains(joinType), s"unknown join type $joinType")
    rightHint.foreach(h => require(strategyHints.contains(h),
      s"unknown join hint '$h' (${strategyHints.mkString("|")})"))
    val l = prefixNonKeys(left, keys, leftPrefix)
    val rPre = prefixNonKeys(right, keys, rightPrefix)
    val r =
      if (leftPrefix.isEmpty && rightPrefix.isEmpty) {
        // Default clash handling: right_<col> on collision (join.go:214-219)
        val clashes = rPre.columns.toSet.intersect(l.columns.toSet) -- keys
        clashes.foldLeft(rPre)((d, c) => d.withColumnRenamed(c, s"right_$c"))
      } else rPre
    l.join(rightHint.fold(r)(r.hint(_)), keys, sparkType(joinType))
  }

  private def prefixNonKeys(df: DataFrame, keys: Seq[String], prefix: String): DataFrame =
    if (prefix.isEmpty) df
    else df.columns.foldLeft(df) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, prefix + c)
    }

  /** Lookup/enrichment: left join against a small dimension, explicitly
   *  broadcast — no shuffle of the fact side at any scale. */
  def lookup(facts: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    facts.join(broadcast(dim), keys, "left_outer")

  /** Multi-parent fan-in: the reference concatenates all dependency
   *  outputs (`dag/dag_executor.go:362-366`) — an implicit UNION ALL over
   *  possibly-heterogeneous schemas. `unionByName(allowMissing)` is the
   *  faithful, schema-aware analogue. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Set operations (absent in the reference, SURVEY.md §2.5 — part of
   *  the engine surface; SQL INTERSECT/EXCEPT [ALL] semantics). */
  def intersect(a: DataFrame, b: DataFrame, all: Boolean = false): DataFrame =
    if (all) a.intersectAll(b) else a.intersect(b)
  def except(a: DataFrame, b: DataFrame, all: Boolean = false): DataFrame =
    if (all) a.exceptAll(b) else a.except(b)

  /**
   * As-of (point-in-time) left join — an operator Spark has no native
   * form for: each left row matches the LATEST right row with
   * `rightTime <= leftTime` for the same key (SQL `ASOF LEFT JOIN`).
   *
   * Spark-first formulation: tag and union both sides, then one window
   * pass per key ordered by (time, side) carrying the last-seen right
   * row forward as a struct — a single shuffle on (keys), linear in
   * |left|+|right|, no range self-join blowup. Matched right columns
   * come back prefixed `asof_` (including `asof_<rightTime>`).
   *
   * Right rows with duplicate (keys, rightTime) make the match
   * ambiguous — dedupe first (e.g. [[graft.llm.Dedup.exact]]).
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           prefix: String = "asof_"): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))
    val r = right
      .select((keys.map(col) :+
        col(rightTime).as("__t") :+ lit(0).as("__side") :+
        struct(rightPayload.map(col): _*).as("__r")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal time → `<=` semantics.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(left.columns.toIndexedSeq.map(col) ++
      rightPayload.map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
  }

  /**
   * [[asOf]] with a TOLERANCE: matches older than `maxGap` are nulled
   * out — the pandas `merge_asof(tolerance=…)` contract, and what
   * attribution windows actually mean ("last touch, but only within
   * the hour"). Same union+window plan as [[asOf]] (one key exchange,
   * no range self-join); the gap test is one extra projection.
   * `maxGap` is in MICROSECONDS for timestamp time columns, and in
   * the column's own units for numeric ones.
   */
  def asOfWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String, maxGap: Long,
                 prefix: String = "asof_"): DataFrame = {
    require(maxGap >= 0, s"maxGap must be >= 0, got $maxGap")
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def asLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case TimestampType | TimestampNTZType => unix_micros(c)
        case _ => c.cast("long")
      }
    val m = asOf(left, right, keys, leftTime, rightTime, prefix)
    val matchT = s"$prefix$rightTime"
    val ok = col(matchT).isNotNull &&
      asLong(col(leftTime), left.schema(leftTime).dataType) -
        asLong(col(matchT), right.schema(rightTime).dataType) <= maxGap
    right.columns.filterNot(keys.contains).foldLeft(m) { (df, c) =>
      df.withColumn(s"$prefix$c", when(ok, col(s"$prefix$c")))
    }
  }

  /**
   * NEAREST-direction as-of join: each left row matches the right row
   * whose time is CLOSEST, in either direction — sensor/clock
   * alignment semantics (pandas `merge_asof(direction="nearest")`),
   * where backward-only matching ([[asOf]]) systematically lags.
   * Ties (equidistant backward and forward matches) take the
   * BACKWARD one, matching pandas.
   *
   * Same union+window plan as [[asOf]] — ONE key exchange whose sort
   * carries BOTH candidate passes: the backward candidate is the
   * last right row at-or-before (frame: unbounded preceding →
   * current), the forward candidate the first right row strictly
   * after (frame: current → unbounded following; right rows at equal
   * time sort before left rows, so they land in the backward frame,
   * where their distance-0 match wins anyway). No range self-join,
   * linear in |left|+|right|.
   *
   * Output: left columns + right payload prefixed (matched side),
   * plus `<prefix>gap` — the absolute time distance (micros for
   * timestamp columns, native units for numeric).
   *
   * Restriction: the deterministic tie-break among right rows sharing
   * (key, time) orders by the WHOLE right payload struct, so every
   * right payload column must be an ORDERABLE type — a MapType payload
   * fails analysis. (The full struct is the only tie-break that is
   * total and engine-replayable without asking the caller for a unique
   * row id; callers with a MapType payload should drop or serialize it
   * first. When (key, time) is unique on the right, the struct
   * comparison never runs past the first field in practice — sort cost
   * is the (time, side) prefix.)
   */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def asLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case TimestampType | TimestampNTZType => unix_micros(c)
        case _ => c.cast("long")
      }
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))
    val r = right
      .select((keys.map(col) :+
        col(rightTime).as("__t") :+ lit(0).as("__side") :+
        struct(rightPayload.map(col): _*).as("__r")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // `__r` in the ordering is the deterministic tie-break among right
    // rows sharing (key, time): backward takes the LARGEST payload
    // struct at the latest time ≤ t, forward the SMALLEST strictly
    // after — same pick under any partitioning or engine (left rows
    // carry null __r and never influence each other's frames).
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__r"))
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward candidate via a RUNNING frame over the DESCENDING order —
    // ≡ first(...) over (currentRow → unboundedFollowing) but O(n) per
    // partition instead of Spark's O(n²)
    // UnboundedFollowingWindowFunctionFrame; right rows at equal time
    // sort desc-after left rows, so they stay out of the forward frame
    // (they land in the backward frame, where their distance-0 match
    // wins anyway). One extra partition-local sort, same key exchange.
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").desc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rtDt = right.schema(rightTime).dataType
    val ltDt = left.schema(leftTime).dataType
    val cand = unioned
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val tl = asLong(col("__t"), ltDt)
    val dB = tl - asLong(col(s"__b.$rightTime"), rtDt)
    val dF = asLong(col(s"__f.$rightTime"), rtDt) - tl
    val pickB = col("__b").isNotNull && (col("__f").isNull || dB <= dF)
    val m = cand
      .withColumn("__m", when(pickB, col("__b")).otherwise(col("__f")))
      .withColumn("__gap", when(pickB, dB)
        .otherwise(when(col("__f").isNotNull, dF)))
    m.select(left.columns.toIndexedSeq.map(col) ++
      (rightPayload.map(c => col(s"__m.$c").as(s"$prefix$c")) :+
        col("__gap").as(s"${prefix}gap")): _*)
  }

  /**
   * Skew-resistant equi-join: the left (skewed) side gets a
   * deterministic salt in [0, saltFactor); the right side is
   * replicated once per salt value; the join key becomes
   * (keys…, salt), splitting each hot key's rows across `saltFactor`
   * tasks. Same result set as [[join]] "inner"/"left" — use when one
   * key dominates and AQE's skew handling isn't enough (e.g. the
   * right side must sort-merge). Costs |right|·saltFactor replication.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 joinType: String = "inner", saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    require(Set("inner", "left").contains(joinType),
      "salted join supports inner/left (right/full would need the salt on the other side)")
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    join(l, r, keys :+ "__salt", joinType).drop("__salt")
  }

  /**
   * Range (interval-containment) join — `points.p BETWEEN intervals.lo
   * AND intervals.hi` without the nested-loop cross product Spark
   * would otherwise plan for a pure inequality join: both sides are
   * binned by `binWidth` (intervals explode into every bin they
   * cover), the join is an EQUI-join on the bin, and the exact BETWEEN
   * predicate filters in the same stage. Each point belongs to exactly
   * one bin, so no dedup is needed. Choose `binWidth` near the typical
   * interval width: wider bins → fewer interval replicas but more
   * false candidates.
   */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /**
   * Interval-OVERLAP equi-binned join: pairs of left/right intervals
   * of the same key with `l.lo ≤ r.hi AND r.lo ≤ l.hi` — the
   * interval × interval sibling of [[rangeJoin]]'s point × interval,
   * and the shape Spark would otherwise plan as a per-key nested
   * loop. Both sides explode into every `binWidth` bin they cover,
   * the join is an EQUI-join on (keys…, bin), and each qualifying
   * pair is EMITTED EXACTLY ONCE — counted only in the bin holding
   * `max(l.lo, r.lo)`, the first bin where both intervals are live —
   * so no distinct/dedup pass ever runs (dedup on the pair product
   * would be a second corpus-sized shuffle).
   *
   * Columns from `right` that collide with `left` come back
   * `<prefix>`-renamed. Bins are computed with floor division on the
   * RAW numeric columns (cast to double for binning only; the exact
   * overlap predicate runs on the original values).
   *
   * Scale posture: one (keys, bin) equi-exchange; interval replication
   * = span/binWidth per row; candidate blow-up per (key, bin) is
   * bounded by in-bin interval density, never |left| × |right| per
   * key. Hot bins ride AQE skew splitting.
   *
   * Picking binWidth — two cost terms, measured (sf0.1 probe, 600k
   * intervals, spans ≤ 50 days): REPLICATION ∝ span/binWidth dominates
   * on keyed workloads (bw 1.75 → 15.9 s vs bw 112 → 1.7 s, identical
   * pair sets), because the exact predicate filters candidates
   * in-stage for almost free while every replica pays the exchange.
   * CANDIDATE DENSITY ∝ (intervals per key per bin)² matters only when
   * one key is dense in time (a 20k-interval hot key emitted its 4.1M
   * genuine pairs in ~2 s at either width — output-bound, not
   * machinery-bound). Start at a few× the MEDIAN span and narrow only
   * if per-bin density genuinely explodes.
   *
   * Contract: rows with `lo > hi` (inverted intervals) are DROPPED,
   * like nulls — an inverted range has no overlap semantics, and
   * letting it through would make `sequence(bin(lo), bin(hi))` emit a
   * DESCENDING bin range with undefined pairing. Note also that one
   * row explodes into `⌈span/binWidth⌉ + 1` bin replicas and Spark's
   * `sequence` caps elements at spark.sql.maxArrayLength-ish limits —
   * a binWidth orders of magnitude under the typical span fails fast
   * in `sequence`, not silently.
   */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  loCol: String, hiCol: String, binWidth: Double,
                  prefix: String = "r_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(keys.nonEmpty, "overlapJoin needs at least one key column")
    def bin(c: Column): Column =
      floor(c.cast("double") / binWidth).cast("long")
    val r = right.columns.foldLeft(right) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"$prefix$c")
    }
    val (rlo, rhi) = (s"$prefix$loCol", s"$prefix$hiCol")
    // spread (r20, guide §2.5): the bin explode multiplies each side
    // span/binWidth times INSIDE its scan stage — over a single-split
    // input that stage is ONE task, and when AQE then broadcasts a
    // side, its whole build is constructed serially (r19 verdict #4:
    // q283's build measured 8.4 s CPU at ~1.6 busy cores). A no-op on
    // inputs the scan can already split `defaultParallelism` ways.
    val lx = graft.core.Par.spread(
        left.filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
          col(loCol) <= col(hiCol)))
      .withColumn("__bin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val rx = graft.core.Par.spread(
        r.filter(col(rlo).isNotNull && col(rhi).isNotNull &&
          col(rlo) <= col(rhi)))
      .withColumn("__bin",
        explode(sequence(bin(col(rlo)), bin(col(rhi)))))
    lx.join(rx, keys :+ "__bin")
      .filter(col(loCol) <= col(rhi) && col(rlo) <= col(hiCol) &&
        col("__bin") === bin(greatest(col(loCol), col(rlo))))
      .drop("__bin")
  }
}
