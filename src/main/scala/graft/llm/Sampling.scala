package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus sampling / sharding operators for training-data pipelines:
 * stratified mixes, deterministic per-key caps, and token-budget shard
 * packing. Beyond the reference's surface; north-star LLM-pipeline
 * scope.
 */
object Sampling {

  /**
   * Stratified sample: per-stratum Bernoulli fractions (e.g. language
   * rebalancing: keep 100% of low-resource strata, 5% of the head).
   * Deterministic for a fixed `seed`. Strata absent from `fractions`
   * are dropped — pass 1.0 explicitly to keep a stratum whole.
   */
  def stratified(df: DataFrame, stratumCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /**
   * Deterministic per-key cap: at most `n` rows per key, the first `n`
   * by `orderCol` — corpus mixing with hard per-source/per-language
   * quotas, reproducible run-to-run (unlike a random sample). One
   * shuffle on the keys; the window's rank never leaves its partition.
   */
  def perKeyLimit(df: DataFrame, keys: Seq[String], orderCol: String,
                  n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val rn = graft.core.Engine.freshColumn(df, "__graft_pkl_rn")
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n).drop(rn)
  }

  /**
   * Deterministic bottom-k sample per key — the k DISTINCT ids with
   * the smallest `(md5i(id ++ salt), id)` pairs: a COORDINATED
   * uniform sample (the bottom-k sketch). Unlike a random sample it
   * is stable run-to-run AND composable: the union of two keys'
   * bottom-k sets bottom-k'd again IS the union's bottom-k, so
   * shards/days merge exactly — which is also why it has a
   * streaming arm with perfect parity
   * ([[graft.streaming.Streaming.bottomKStream]]).
   *
   * Engine-exact: the hash is the cross-engine [[exactKByHash]]
   * md5 prefix; ids dedupe on the (keys, id) grid first (set
   * semantics); the cut is a rank window over the total order
   * (hash, id). Null ids are excluded.
   *
   * Output: (keys…, idCol, rank) — rank 1..k in (hash, id) order.
   *
   * Scale posture: one map-side (keys, id) collapse; the per-key
   * rank window plans with WindowGroupLimit (per-partition pre-cut
   * to k before the shuffle).
   */
  def bottomKByHash(df: DataFrame, keys: Seq[String], idCol: String,
                    k: Int, salt: String = ""): DataFrame = {
    require(keys.nonEmpty, "bottomKByHash needs key columns")
    require(k >= 1, s"k must be >= 1, got $k")
    val h = TextAnalysis.md5i(concat(col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__h"), col(idCol))
    df.filter(col(idCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) :+ col(idCol): _*)
      .distinct()
      .withColumn("__h", h)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(keys.map(col) ++ Seq(col(idCol), col("rank")): _*)
  }

  /**
   * Token-budget shard packing: within each group, rows are laid out
   * in `orderCol` order and assigned shard ids so consecutive rows
   * accumulate until `budget` tokens (a row straddling the boundary
   * belongs to the shard where it started — shards can overshoot by
   * at most one document). `shard = floor(cumulative_tokens_before /
   * budget)`, deterministic and reproducible in any engine.
   *
   * Scale posture: packing is inherently sequential WITHIN a group
   * (each shard depends on everything before it), so the window
   * partitions by `groupCols` and parallelism comes from the number of
   * groups — pack per (source, language, date) rather than globally.
   * An empty `groupCols` packs globally in a single partition: correct,
   * but only for corpora that fit one task's disk spill.
   */
  def packByTokenBudget(df: DataFrame, groupCols: Seq[String],
                        orderCol: String, tokenCol: String,
                        budget: Long, shardCol: String = "shard"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(col(tokenCol)).over(w) - col(tokenCol)
    df.withColumn(shardCol, floor(cumBefore / lit(budget)))
  }

  /**
   * Pretraining SEQUENCE construction: documents packed into token-
   * budget shards by the [[packByTokenBudget]] rule, then every
   * (group, shard) concatenated — in `orderCol` order, joined with
   * `eos` — into one training sequence row carrying its exact token
   * total and document count. The step after sharding that a
   * pretraining loader actually consumes: ~budget-token sequences
   * with document boundaries marked.
   *
   * Deterministic for unique `orderCol` values within a group (the
   * corpus contract). A null text concatenates as an EMPTY segment —
   * the document keeps its boundary, and `n_docs`/`seq_tokens` stay
   * aligned with the sequence's segments (silently skipping it would
   * desynchronize them). Scale posture: the shard window plus ONE
   * aggregation, both partitioned by the group keys — sequences never
   * exceed budget + one document, so no aggregate row outgrows an
   * executor.
   */
  def packSequences(df: DataFrame, groupCols: Seq[String], orderCol: String,
                    tokenCol: String, textCol: String, budget: Long,
                    eos: String = "<eos>",
                    shardCol: String = "shard"): DataFrame = {
    val sharded = packByTokenBudget(df, groupCols, orderCol, tokenCol,
      budget, shardCol)
    sharded.groupBy((groupCols :+ shardCol).map(col): _*)
      .agg(
        Dedup.reassembleLines(col(orderCol),
          coalesce(col(textCol), lit("")), eos).as("sequence"),
        sum(col(tokenCol)).as("seq_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /**
   * Content-deterministic Bernoulli sample: keep a row iff
   * `md5(key ++ salt) mod denom < numer` — the same row set on every
   * run, every engine, every partitioning (unlike `df.sample`, whose
   * row set depends on partition layout). The standard trick for
   * reproducible corpus subsetting and stable A/B splits: vary `salt`
   * to draw independent samples. Pure projection + filter — no
   * shuffle, fully pushdown-friendly.
   */
  def hashSample(df: DataFrame, keyCol: String, numer: Int, denom: Int,
                 salt: String = ""): DataFrame = {
    require(denom > 0 && numer >= 0 && numer <= denom,
      s"need 0 <= numer <= denom, got $numer/$denom")
    df.filter(pmod(graft.llm.TextAnalysis.md5i(
      concat(col(keyCol).cast("string"), lit(salt))), lit(denom)) < numer)
  }

  /**
   * Content-deterministic EXACT-k sample: the `k` rows whose
   * `md5(key ++ salt)` hashes are globally smallest (ties — hash
   * collisions — broken by the key itself, so the set is total-order
   * defined). The "carve exactly 10k eval documents" operation that
   * [[hashSample]]'s fraction form cannot pin down. Because the hash
   * is uniform, the selection is an unbiased simple random sample,
   * yet reproducible on any engine/partitioning/run.
   *
   * Scale: plans as TakeOrderedAndProject — each partition keeps its
   * local top-k (a k-row heap) and the driver merges partition heads;
   * no global sort, no shuffle of the corpus. k-sized results are the
   * contract (an eval slice, not a corpus split) — for proportional
   * subsets use [[hashSample]]/[[topFractionByScore]].
   *
   * PRECONDITION for the determinism contract: `keyCol` values must be
   * UNIQUE (it is the document id). The total order is (hash, key);
   * rows sharing a key value tie on both sort columns, so which of
   * them crosses the k-boundary becomes partition/engine-dependent.
   * With duplicate keys, dedup first (or pick a unique key) — a
   * content-column tiebreaker is deliberately NOT appended here: it
   * would drag every payload column into the top-k heap comparisons
   * for a guarantee the id-key contract already provides.
   */
  def exactKByHash(df: DataFrame, keyCol: String, k: Int,
                   salt: String = ""): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val h = graft.llm.TextAnalysis.md5i(
      concat(col(keyCol).cast("string"), lit(salt)))
    df.orderBy(h.asc, col(keyCol).asc).limit(k)
  }

  /**
   * Weight-proportional exact-k sampling per stratum — sequential
   * Poisson sampling (Ohlsson 1998, the πps workhorse of official
   * statistics): each row draws the deterministic uniform
   * `u = md5i(key ++ salt)` and the k rows with the smallest
   * PRIORITY `u / weight` are kept — heavier rows draw smaller
   * priorities proportionally more often, approximating
   * probability-proportional-to-size without replacement.
   *
   * Pinned arithmetic: the priority is the QUANTIZED integer
   * `floor(u · 2²⁰ / w)` with `w = round(weight)` ≥ 1 (exact long ops
   * only — a float `u/w` ranks differently across engines at ulp
   * boundaries, and decimal division scales diverge; the 2²⁰ scale
   * keeps u·2²⁰ < 2⁵³ while making quantization ties astronomically
   * rarer than hash ties). Total order: (priority, key) — key ties
   * carry [[exactKByHash]]'s uniqueness precondition. Rows with null
   * or < 0.5 weight never qualify, and neither do null-key rows: a
   * null key hashes to a null priority, which Spark's ASC sort ranks
   * FIRST but SQL engines' NULLS LAST ranks last — excluding them is
   * the only engine-independent reading (and a null key has no
   * deterministic draw anyway).
   *
   * Scale posture: per-stratum top-k via the rank window plans with a
   * Partial WindowGroupLimit — every scan partition pre-cuts to k, so
   * the shuffle ships ≤ partitions·strata·k rows; with no keys it is
   * one TakeOrderedAndProject, no global sort either way.
   */
  def weightedPriority(df: DataFrame, keys: Seq[String], keyCol: String,
                       weightCol: String, k: Int,
                       salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = TextAnalysis.md5i(concat(col(keyCol).cast("string"), lit(salt)))
    val w = round(col(weightCol).cast("double")).cast("long")
    val scaled = u * lit(1048576L)
    val prio = ((scaled - pmod(scaled, w)) / w).cast("long")
    val base = df.filter(col(keyCol).isNotNull &&
        col(weightCol).isNotNull && w >= 1)
      .withColumn("__prio", prio)
    if (keys.isEmpty) {
      base.orderBy(col("__prio").asc, col(keyCol).asc).limit(k).drop("__prio")
    } else {
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("__prio").asc, col(keyCol).asc)
      base.withColumn("__rk", row_number().over(win))
        .filter(col("__rk") <= k)
        .drop("__prio", "__rk")
    }
  }

  /**
   * EXACT global top-fraction selection by score — "keep the best 30%
   * of the corpus by quality" — without a global sort. The kept set is
   * defined by rank: rows ordered by (`scoreCol` DESC, `idCol` ASC),
   * the first ⌈fraction·n⌉ survive (the id tie-break makes the set
   * deterministic and engine-reproducible). Rows with a null score
   * never qualify.
   *
   * Scale posture: a global `ORDER BY ... LIMIT N` either range-sorts
   * the corpus (full shuffle) or funnels N rows to one task. Instead,
   * three passes, none of which moves the corpus globally:
   *   1. one aggregate: count, min/max score;
   *   2. a score-histogram aggregate (`buckets` cells, driver-side
   *      cumulative) locates the threshold bucket — every row in a
   *      higher bucket is in, lower is out;
   *   3. one result scan keeping `bucket >= threshold`, with a window
   *      PARTITIONED BY BUCKET ranking each bucket independently
   *      (only the threshold bucket's rank is consulted) — the only
   *      shuffle, and it moves just the kept rows, spread across
   *      bucket partitions of ≈ n/buckets rows each.
   * Degenerate case: a mass-tied score puts its whole bucket into one
   * rank partition — raise `buckets` or accept the bounded sort; the
   * histogram never lies about membership because bucketization is
   * monotonic in score (internal only — the OUTPUT is rank-defined,
   * so any consistent bucketing yields the same set).
   *
   * NaN scores are excluded like nulls (a single NaN would otherwise
   * poison max() and collapse every bucket to one).
   */
  def topFractionByScore(df: DataFrame, scoreCol: String, idCol: String,
                         fraction: Double, buckets: Int = 1000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val sc = col(scoreCol).cast("double")
    val scored = df.filter(col(scoreCol).isNotNull && !isnan(sc))
    val stats = scored.agg(count(lit(1)), min(sc), max(sc)).collect()(0)
    val n = stats.getLong(0)
    val target = math.ceil(fraction * n).toLong
    if (n == 0 || target == 0) return scored.limit(0)
    if (target >= n) return scored
    val (lo, hi) = (stats.getDouble(1), stats.getDouble(2))
    val width = (hi - lo) / buckets
    // all-tied scores (width 0) collapse to one bucket — the exact-rank
    // window then ranks everything; correct, documented degenerate
    val bucket =
      if (width == 0) lit(0L)
      else least(floor((sc - lit(lo)) / lit(width)),
        lit(buckets - 1L)).cast("long")
    val histo = scored.groupBy(bucket.as("__b")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // walk buckets from the top until the quota is crossed
    var kept = 0L
    var t = buckets.toLong - 1
    while (t >= 0 && kept + histo.getOrElse(t, 0L) < target) {
      kept += histo.getOrElse(t, 0L); t -= 1
    }
    val fromThreshold = target - kept
    // collision-safe scratch names (the input may carry any columns)
    def fresh(base: String): String = graft.core.Engine.freshColumn(df, base)
    val bCol = fresh("__graft_topfrac_b")
    val rnCol = fresh("__graft_topfrac_rn")
    val w = Window.partitionBy(col(bCol)).orderBy(sc.desc, col(idCol))
    scored.withColumn(bCol, bucket)
      .filter(col(bCol) >= t)
      .withColumn(rnCol, row_number().over(w))
      .filter(col(bCol) > t || col(rnCol) <= fromThreshold)
      .drop(bCol, rnCol)
  }

  /**
   * Content-deterministic STRATIFIED sample: per-stratum keep
   * fractions applied via the [[hashSample]] rule (`md5(key ++ salt)
   * mod denom < round(frac·denom)`), so the row set is identical on
   * every run, engine, and partitioning — [[stratified]]'s
   * `sampleBy` draws a seeded partition-dependent sample, which is
   * fine for one-off rebalancing but not for reproducible corpus
   * releases. Strata absent from `fractions` are dropped (pass 1.0 to
   * keep a stratum whole). Fraction granularity is 1/`denom`. Pure
   * filter — no shuffle, pushdown-friendly.
   */
  def stratifiedByHash(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], keyCol: String,
                       salt: String = "", denom: Int = 10000): DataFrame = {
    require(fractions.nonEmpty, "stratifiedByHash needs at least one stratum")
    fractions.foreach { case (k, f) =>
      require(f >= 0 && f <= 1, s"fraction out of range for stratum '$k': $f") }
    require(denom > 0, s"denom must be positive, got $denom")
    val h = pmod(graft.llm.TextAnalysis.md5i(
      concat(col(keyCol).cast("string"), lit(salt))), lit(denom))
    // when-chain over the strata; unmatched strata get a null
    // threshold, and `h < null` is null -> filtered out
    val thresh = fractions.foldLeft(lit(null).cast("long")) {
      case (els, (k, f)) =>
        when(col(stratumCol) === k, lit(math.round(f * denom))).otherwise(els)
    }
    df.filter(h < thresh)
  }

  /**
   * Per-key top-fraction by score — "keep each language's best 30%":
   * within every key group, rows ranked by (`scoreCol` DESC, `idCol`)
   * survive up to ⌈fraction·group size⌉. Unlike the global
   * [[topFractionByScore]] this needs no histogram: the rank and the
   * group count ride ONE window partitioned by the keys — a single
   * shuffle, each group sorted within its own partition (per-key
   * quality thresholds are the practical corpus recipe; group skew
   * lands in AQE). Null/NaN scores never qualify.
   */
  def topFractionByScorePerKey(df: DataFrame, keys: Seq[String],
                               scoreCol: String, idCol: String,
                               fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    val sc = col(scoreCol).cast("double")
    val scored = df.filter(col(scoreCol).isNotNull && !isnan(sc))
    def fresh(base: String): String = graft.core.Engine.freshColumn(df, base)
    val rnCol = fresh("__graft_pk_rn")
    val nCol = fresh("__graft_pk_n")
    val part = Window.partitionBy(keys.map(col): _*)
    scored
      .withColumn(rnCol, row_number().over(part.orderBy(sc.desc, col(idCol))))
      .withColumn(nCol, count(lit(1)).over(part))
      .filter(col(rnCol) <= ceil(lit(fraction) * col(nCol)))
      .drop(rnCol, nCol)
  }

  /**
   * Weight-proportional content-deterministic Bernoulli sample: a row
   * survives iff `md5-uniform(key ++ salt) < baseRate · weight` — keep
   * probability `min(1, baseRate·weight)` per row, the same row set on
   * every run/engine/partitioning (the [[hashSample]] rule with a
   * per-row rate). The tool for importance-weighted corpus subsetting:
   * weight by quality score, length, or source priority. Null or
   * negative weights never qualify. Pure filter — no shuffle,
   * pushdown-friendly. The uniform is the 32-bit md5 prefix over
   * 2³², exactly representable in doubles, so the comparison is
   * engine-reproducible (one IEEE multiply each side).
   */
  def weightedHashSample(df: DataFrame, keyCol: String, weightCol: String,
                         baseRate: Double, salt: String = ""): DataFrame = {
    require(baseRate >= 0, s"baseRate must be >= 0, got $baseRate")
    val dt = df.schema(weightCol).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"weight column '$weightCol' must be numeric, got $dt")
    val h = TextAnalysis.md5i(concat(col(keyCol).cast("string"), lit(salt)))
    df.filter(h.cast("double") <
      lit(baseRate) * col(weightCol).cast("double") * lit(4294967296.0))
  }

  /**
   * Temperature-rebalanced stratum fractions: per-stratum keep rates
   * so the EXPECTED sample allocates `targetRows` across strata
   * proportionally to `count^alpha` — the multilingual temperature-
   * sampling recipe (alpha 1 = natural distribution, alpha 0 = uniform
   * across strata, 0.3–0.7 = the usual low-resource boost). Clamped
   * strata (allocation ≥ stratum size) keep everything and their
   * surplus redistributes over the rest (waterfilling), so the total
   * expectation stays `min(targetRows, N)`. Driver-side arithmetic
   * over one row per stratum.
   */
  /**
   * Per-source keep fractions that hit a TOKEN budget under explicit
   * mixture weights — the "assemble the training mix" recipe (70% web,
   * 20% code, 10% reference…) stated the way a dataset card states it.
   * `target_s = budget · w_s / Σw`, `f_s = min(1, target_s /
   * tokens_s)`. Deterministic (one division per source, fixed
   * arithmetic). Sources present in `weights` but ABSENT from the
   * corpus (zero tokens) under-fill the budget rather than silently
   * inflating the other sources past their requested share — the mix
   * ratio is the contract, the budget is best-effort. Sources without
   * a weight are excluded entirely (fraction absent). An oversubscribed
   * source clamps at 1.0 (all of it, still under its requested share).
   */
  def budgetFractions(tokenTotals: Map[String, Long],
                      weights: Map[String, Double],
                      budgetTokens: Long): Map[String, Double] = {
    require(weights.nonEmpty, "budgetFractions needs at least one weight")
    weights.foreach { case (s, w) =>
      require(w >= 0, s"negative weight for source '$s': $w") }
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    val wsum = weights.values.sum
    require(wsum > 0, "weights must not all be zero")
    weights.collect { case (s, w) if tokenTotals.getOrElse(s, 0L) > 0 =>
      val target = budgetTokens.toDouble * (w / wsum)
      s -> math.min(1.0, target / tokenTotals(s).toDouble)
    }
  }

  /**
   * Token-budget mixture assembly: sample each source at the
   * [[budgetFractions]] rate via the content-deterministic
   * [[stratifiedByHash]] rule — the final step of a training-data
   * pipeline ("N tokens at these source ratios"), reproducible to the
   * row on any engine or partitioning. The kept token count is the
   * budget in EXPECTATION (hash-Bernoulli per doc); for an exact-cut
   * variant rank docs per source by hash and take a prefix
   * ([[topFractionByScore]] machinery) at one extra shuffle.
   *
   * Scale: one per-source token-sum aggregate (result is
   * sources-sized, the only driver materialization) + one pure filter
   * over the corpus — no shuffle of the data itself, pushdown-friendly.
   */
  def mixtureByTokenBudget(df: DataFrame, stratumCol: String, keyCol: String,
                           tokenCol: String, weights: Map[String, Double],
                           budgetTokens: Long, salt: String = "",
                           denom: Int = 10000): DataFrame = {
    val totals = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).agg(sum(col(tokenCol)).as("__t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fr = budgetFractions(totals, weights, budgetTokens)
    if (fr.isEmpty) df.limit(0)
    else stratifiedByHash(df, stratumCol, fr, keyCol, salt, denom)
  }

  def temperatureFractions(counts: Map[String, Long], alpha: Double,
                           targetRows: Long): Map[String, Double] = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    counts.foreach { case (s, n) =>
      require(n >= 0, s"negative count for stratum '$s': $n") }
    var active = counts.filter(_._2 > 0)
    var remaining = targetRows.toDouble
    val out = scala.collection.mutable.Map[String, Double]()
    counts.collect { case (s, n) if n == 0 => out(s) = 0.0 }
    var fixed = true
    while (fixed && active.nonEmpty && remaining > 0) {
      fixed = false
      // fixed fold order (sorted by stratum): Map iteration order comes
      // from a nondeterministic collect() upstream, and IEEE addition
      // is order-sensitive — an ulp of mass drift could flip a
      // round(f·n) threshold at a knife-edge downstream
      val mass = active.toSeq.sortBy(_._1)
        .map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
      val clamped = active.filter { case (_, n) =>
        remaining * math.pow(n.toDouble, alpha) / mass >= n }
      if (clamped.nonEmpty) {
        clamped.foreach { case (s, n) => out(s) = 1.0; remaining -= n }
        active = active -- clamped.keys
        fixed = true // re-solve with the surplus redistributed
      } else {
        active.foreach { case (s, n) =>
          out(s) = remaining * math.pow(n.toDouble, alpha) / mass / n }
        active = Map.empty
      }
    }
    active.foreach { case (s, _) => out(s) = 0.0 } // targetRows exhausted
    out.toMap
  }

  /**
   * Temperature-rebalanced deterministic sample: count the strata,
   * derive [[temperatureFractions]], apply them via the content-
   * deterministic [[stratifiedByHash]] rule. One counting aggregate
   * (tiny result — one row per stratum) + one pure filter over the
   * corpus; nothing else moves. Null strata are dropped (no count, no
   * threshold), like [[stratifiedByHash]] does for absent strata.
   */
  def temperatureRebalance(df: DataFrame, stratumCol: String, keyCol: String,
                           alpha: Double, targetRows: Long,
                           salt: String = "",
                           denom: Int = 10000): DataFrame = {
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.limit(0)
    stratifiedByHash(df, stratumCol,
      temperatureFractions(counts, alpha, targetRows), keyCol, salt, denom)
  }

  /**
   * Cluster-aware train/val/test split: assign every document to a
   * named split by hashing its near-dup CLUSTER label, so near-
   * duplicates never straddle splits (the classic eval-contamination
   * leak: doc A in train, its 0.9-Jaccard twin in test). Documents in
   * no pair are their own cluster. Content-deterministic — the same
   * assignment on every run, engine, and partitioning (`md5(label ++
   * salt) mod denom` against cumulative thresholds, the [[hashSample]]
   * rule).
   *
   * `splits` are (name, weight) in order; weights must sum to 1 (the
   * last split absorbs the rounding remainder, so every row lands
   * somewhere). Granularity is 1/`denom`.
   *
   * Scale posture: [[Dedup.components]] bounds the label table to
   * paired documents only; the corpus joins it once (left join on the
   * id — AQE broadcasts when the pair set is small) and everything
   * else is a pure projection. Adds a `splitCol` column; rows are
   * never dropped.
   */
  def splitByCluster(df: DataFrame, pairs: DataFrame, idCol: String,
                     splits: Seq[(String, Double)], salt: String = "",
                     denom: Int = 10000,
                     splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splitByCluster needs at least one split")
    splits.foreach { case (n, w) =>
      require(w >= 0 && w <= 1, s"weight out of range for split '$n': $w") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split weights must sum to 1, got $total")
    require(denom > 0, s"denom must be positive, got $denom")
    def fresh(base: String): String = graft.core.Engine.freshColumn(df, base)
    val compCol = fresh("__graft_split_comp")
    val labels = Dedup.components(pairs)
      .select(col("node").as(idCol), col("component").as(compCol))
    val label = coalesce(col(compCol), col(idCol))
    val h = pmod(TextAnalysis.md5i(
      concat(label.cast("string"), lit(salt))), lit(denom))
    // cumulative thresholds; the LAST split is the otherwise-branch so
    // rounding can never orphan the top of the hash range
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * denom))
    val assigned = splits.init.zip(cums.init)
      .foldLeft(when(lit(false), lit(null).cast("string"))) {
        case (chain, ((name, _), t)) => chain.when(h < t, name)
      }.otherwise(splits.last._1)
    df.join(labels, Seq(idCol), "left")
      .withColumn(splitCol, assigned)
      .drop(compCol)
  }

  /**
   * Weighted mix of corpora: each source sampled at its fraction, then
   * unioned by name — the standard recipe for blending data sources at
   * target ratios. Deterministic for a fixed `seed` (each source uses
   * `seed + index` so equal sources don't sample identical row sets).
   */
  def weightedMix(sources: Seq[(DataFrame, Double)], seed: Long): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    sources.zipWithIndex.map { case ((df, frac), i) =>
      require(frac >= 0 && frac <= 1, s"fraction out of range: $frac")
      df.sample(withReplacement = false, frac, seed + i)
    }.reduce(_ unionByName _)
  }

  /**
   * Deterministic negative sampling for contrastive training: for
   * every anchor, `k` pseudo-random partners drawn by an integer hash
   * ring — no RNG state, no shuffle of the corpus, identical on any
   * engine or partitioning (the [[hashSample]] philosophy applied to
   * pair construction).
   *
   * Requires DENSE ids `0 ≤ id < n` (the usual corpus-index frame;
   * `n` is one count() scalar). Slot j of anchor a pairs with
   * `(a + 1 + mix(a, j) mod (n−1)) mod n` where
   * `mix(a, j) = a·2654435761 + j·40503` — pure 64-bit arithmetic,
   * offset ∈ [1, n−1] so an anchor never samples itself. Collisions
   * between slots of one anchor are possible (bounded by k²/n) and
   * kept: contrastive batches tolerate a rare duplicate negative;
   * dedup downstream if not.
   *
   * Output: (`idCol`, slot, neg_id). Join payloads on `neg_id`
   * downstream — the sampler itself never touches them.
   */
  def negativeSamples(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = df.filter(col(idCol).isNotNull).count()
    require(n >= 2, s"need at least 2 rows to sample negatives, got $n")
    val slots = explode(sequence(lit(1), lit(k)))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), slots.as("slot"))
      .withColumn("neg_id",
        pmod(col(idCol) + 1 +
          pmod(col(idCol) * 2654435761L + col("slot") * 40503L,
            lit(n - 1)), lit(n)))
      .select(col(idCol), col("slot"), col("neg_id"))
  }

  /**
   * EXACT stratified train/valid/test split: within each stratum,
   * rows rank by the deterministic hash draw `(md5i(key ++ salt),
   * key)` and the splits carve CONSECUTIVE rank ranges — split j of
   * cumulative fraction c_j takes ranks `(⌊c_{j−1}·n⌋, ⌊c_j·n⌋]`, the
   * LAST split takes everything left. Counts are exact (⌊⌋
   * differences — the property [[stratifiedByHash]]'s independent
   * coin flips cannot give), assignment is content-deterministic
   * (reruns and engines agree row-by-row), and splits are disjoint
   * and exhaustive by construction.
   *
   * The cumulative fractions are accumulated LEFT-TO-RIGHT in IEEE
   * doubles and the thresholds are `floor(c_j · n)` — replay the same
   * accumulated values, not re-derived ones (0.7 + 0.2 is
   * 0.8999999999999999, not 0.9; a re-rounded oracle disagrees at
   * n·c_j integer boundaries). Null keys are excluded (the
   * [[weightedPriority]] rule).
   *
   * Output: input columns + `split`.
   *
   * Scale posture: one stratum-keyed exchange for the rank window
   * (full per-stratum sort — stratum-count parallelism; for a single
   * global stratum at corpus scale, use [[topFractionByScore]]'s
   * histogram path on the hash instead).
   */
  def exactSplit(df: DataFrame, keys: Seq[String], keyCol: String,
                 splits: Seq[(String, Double)],
                 salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "exactSplit needs at least one split")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions must sum to <= 1, got ${splits.map(_._2).sum}")
    import org.apache.spark.sql.expressions.Window
    val h = TextAnalysis.md5i(concat(col(keyCol).cast("string"), lit(salt)))
    val wk = Window.partitionBy(keys.map(col): _*)
    val ranked = df.filter(col(keyCol).isNotNull)
      .withColumn("__rk",
        row_number().over(wk.orderBy(h.asc, col(keyCol).asc)).cast("long"))
      .withColumn("__n", count(lit(1)).over(wk))
    // cumulative fractions, left-to-right; the last split is the
    // catch-all (no threshold, no float-boundary risk at the top end)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val n = col("__n").cast("double")
    val assign = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), c), els) =>
      when(col("__rk") <= floor(lit(c) * n).cast("long"), {
        // nested when chain evaluates in order: the FIRST matching
        // threshold wins, so each split gets exactly its rank range
        lit(name)
      }).otherwise(els)
    }
    ranked.withColumn("split", assign).drop("__rk", "__n")
  }

  /**
   * DSIR-style importance weights for data selection: score every
   * RAW document by how TARGET-like its hashed-unigram profile is —
   * `log w(d) = Σ_b c_b(d)·(ln p̂_t(b) − ln p̂_r(b))` over `dim`
   * hash buckets with Laplace-smoothed distributions estimated from
   * a target-domain sample and the raw corpus itself (Xie et al.'s
   * data-selection recipe, hashed-feature form). Feed the weights
   * to [[topFractionByScore]] or [[weightedHashSample]] to tilt a
   * web-scale crawl toward the target domain.
   *
   * Engine-exact: tokens and buckets are [[TextAnalysis
   * .hashingTrick]]'s conventions (whitespace tokens, md5-prefix
   * hash, pmod dim); all counts are exact integers; each bucket's
   * log-ratio is ONE pinned chain with the smoothing constants
   * computed in-expression (the q327 discipline), and each doc's
   * Σ c_b·lr(b) folds in BUCKET order (≡ list_reduce — never an
   * order-free double sum).
   *
   * Output: (idCol, n_tokens, log_weight) — one row per raw doc
   * that has at least one token; log_weight > 0 = more target-like
   * than the raw average.
   *
   * Scale posture: the doc×bucket relation localCheckpoints once
   * (two consumers: bucket totals and the per-doc fold — one
   * tokenization pass, not two); the bucket table is `dim` rows
   * with the corpus totals attached as broadcast scalars, and the
   * per-doc join BROADCASTS it. Per-doc state is its ≤ dim distinct
   * buckets. Target-side cost is one aggregation to `dim` rows.
   */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, dim: Int = 1024,
                  alpha: Double = 0.5): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    import org.apache.spark.sql.functions.broadcast
    def buckets(df: DataFrame, cols: Seq[Column]) = df
      .filter(col(textCol).isNotNull)
      .select(cols :+ explode(TextAnalysis.cleanTokens(col(textCol)))
        .as("__tok"): _*)
      .withColumn("__b", pmod(TextAnalysis.md5i(col("__tok")),
        lit(dim.toLong)))
    val rawB = buckets(raw, Seq(col(idCol)))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(false)
    val rawTot = rawB.groupBy(col("__b"))
      .agg(sum(col("__cnt")).as("__cr"))
    val tgtTot = buckets(target, Seq.empty)
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    val nr = rawTot.agg(sum(col("__cr")).as("__nr"))
    val nt = tgtTot.agg(coalesce(sum(col("__ct")), lit(0L)).as("__nt"))
    val aD = lit(alpha)
    val dimA = lit(alpha) * lit(dim.toDouble)
    val lrTable = rawTot
      .join(tgtTot, Seq("__b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)).cast("double") + aD) /
          (col("__nt").cast("double") + dimA)) -
          log((col("__cr").cast("double") + aD) /
            (col("__nr").cast("double") + dimA))).as("__lr"))
    rawB.join(broadcast(lrTable), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        aggregate(sort_array(collect_list(struct(col("__b"),
          col("__cnt").cast("double").as("__c"),
          col("__lr")))), lit(0.0),
          (acc, p) => acc + p.getField("__c") * p.getField("__lr"))
          .as("log_weight"))
  }
}
