package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextAnalysis.md5i

/**
 * Similarity search over an embedding column (`array<float>`):
 * brute-force cosine top-k as the exact baseline, and a random-
 * hyperplane LSH-bucketed variant as the scale path.
 *
 * Scale posture: brute-force is a broadcast of the (small) query set
 * against the corpus — no corpus shuffle, one window per query for the
 * top-k. The LSH path buckets the corpus ONCE (pure projection), then
 * joins queries to buckets — candidate sets shrink by ~2^bits, the
 * classic recall/cost trade.
 *
 * All float math is fixed-order double arithmetic (sequential
 * `aggregate` over `zip_with`), so an external engine evaluating the
 * same formula sequence reproduces values bit-exactly.
 */
object Similarity {

  /** Sequential dot product of two double-array columns — a native
   *  codegen'd kernel ([[graft.functions.DotProduct]]); bit-identical
   *  to the `aggregate(zip_with(...))` Column form it replaced (same
   *  fixed evaluation order), without the intermediate zipped array. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Unit-normalize a vector (L2); zero-norm vectors pass through
   *  unchanged (guarding the ANSI divide-by-zero). After
   *  normalization, cosine reduces to a plain dot product. */
  def normalizeVec(v: Column): Column = {
    val n = norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  /** Symmetric int8 quantization: scale by 127/max|x| and round —
   *  4× smaller vectors for coarse ANN candidate stages (re-rank with
   *  the float vectors). Returns `struct(q: array<int>, scale:
   *  double)`; dequantize as `q[i] * scale`. All-zero vectors get
   *  scale 0. */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x)))
    val q = when(maxAbs === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => round(x * lit(127.0) / maxAbs).cast("int")))
    struct(q.as("q"), when(maxAbs === 0.0, lit(0.0))
      .otherwise(maxAbs / lit(127.0)).as("scale"))
  }

  /** Integer dot product of two int-array columns, accumulated in
   *  BIGINT (products of int8-range values never overflow the int
   *  lane; the accumulator is long for any dimensionality). Exact —
   *  the point of the quantized stage: candidate ranking becomes
   *  integer arithmetic, reproducible on any engine with no float
   *  ordering concerns. */
  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /**
   * Two-stage quantized top-k — the 100 TB ANN shape: the COARSE stage
   * ranks by cosine over int8-quantized vectors (scale-free: the
   * symmetric scales cancel in cosine, so only the `q` arrays are
   * needed — a 4× smaller corpus scan/broadcast footprint than
   * floats), keeps `candidates` per query, then the RE-RANK stage
   * joins ONLY those candidates back to their float vectors by id and
   * orders by exact cosine. The corpus is never shuffled BY A JOIN
   * (queries broadcast through both stages, and the candidate re-join
   * touches `candidates × |queries|` rows, not the corpus); the one
   * exchange each stage does — the per-query top-k window — ships
   * only per-partition-pre-limited rows (≤ partitions × |queries| ×
   * `candidates`): the `row_number <= n` filter plans as a Partial
   * WindowGroupLimit below the exchange, plan-guarded in
   * `PlanGuardSpec` so a regression to shuffling the full scored
   * frame fails the suite.
   *
   * Approximation contract: results equal [[bruteForceTopK]] whenever
   * each query's true top-k survives the coarse cut — raise
   * `candidates` to trade cost for recall. Every stage is
   * deterministic (integer coarse scores; id tie-breaks in both
   * windows), so the output is a pure function of the inputs,
   * reproducible cross-engine.
   */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    candidates: Int = 50): DataFrame = {
    require(candidates >= k, s"candidates=$candidates must be >= k=$k")
    val c = corpus.select(col(idCol).as("neighbor_id"),
        quantizeInt8(col(vecCol)).getField("q").as("__cq"))
      .withColumn("__cn", sqrt(idot(col("__cq"), col("__cq")).cast("double")))
    val q = queries.select(col(idCol).as("query_id"),
        quantizeInt8(col(vecCol)).getField("q").as("__qq"))
      .withColumn("__qn", sqrt(idot(col("__qq"), col("__qq")).cast("double")))
    val coarseCos = {
      val d = idot(col("__qq"), col("__cq")).cast("double")
      val nn = col("__qn") * col("__cn")
      when(nn === 0.0, lit(0.0)).otherwise(d / nn)
    }
    val wc = Window.partitionBy("query_id")
      .orderBy(col("__qcos").desc, col("neighbor_id").asc)
    val cand = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), coarseCos.as("__qcos"))
      .withColumn("__crank", row_number().over(wc))
      .filter(col("__crank") <= candidates)
      .select("query_id", "neighbor_id")
    // re-rank: candidates re-join their FLOAT vectors by id — at scale
    // this reads candidates×queries rows, not the corpus
    val cf = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cnf", norm(col("__cv")))
    val qf = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qnf", norm(col("__qv")))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    // broadcast the candidate LIST (candidates × |queries| rows) —
    // without the hint the planner has no stats for the window-derived
    // frame and can pick a corpus-shuffling sort-merge join, exactly
    // the cost the two-stage design avoids
    broadcast(cand).join(cf, "neighbor_id").join(broadcast(qf), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosPre(col("__qv"), col("__cv"), col("__qnf"), col("__cnf")).as("__cos"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Cosine similarity; zero-norm inputs score 0.0 (ANSI mode throws
   *  on division by zero, and all-zero embeddings occur in practice —
   *  e.g. padding rows or failed encoder outputs). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /**
   * Exact brute-force top-k: for every row of `queries`, the `k`
   * nearest `corpus` rows by cosine (desc), ties broken by corpus id
   * (asc) for determinism. Self-matches (same id) are excluded.
   * The query side is broadcast: the corpus is scanned once, never
   * shuffled; the only exchange is the per-query top-k window.
   */
  /**
   * Cosine from a precomputed-norm pair: norms are evaluated ONCE per
   * row on each join side (the join boundary stops Catalyst from
   * inlining them into the per-pair projection), so each candidate
   * pair costs one dot product instead of three array aggregates.
   * Bit-identical to [[cosine]] (same expressions, same order).
   * Zero-norm rows score 0.0 (ANSI divide-by-zero guard, as [[cosine]]).
   */
  private[llm] def cosPre(v1: Column, v2: Column, n1: Column, n2: Column): Column =
    when(n1 * n2 === 0.0, lit(0.0)).otherwise(dot(v1, v2) / (n1 * n2))

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosPre(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("__cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /**
   * Hard-negative mining for contrastive / retrieval training: for
   * every query, the `k` most similar corpus rows whose cosine falls
   * INSIDE `[minCos, maxCos)` — near enough to be informative
   * negatives, but below the positive/near-duplicate band that would
   * poison the loss with false negatives (the standard BM25/ANN
   * hard-negative recipe, cf. DPR, Karpukhin et al. 2020). Upper
   * bound excludes (`cos < maxCos`), lower bound includes
   * (`cos >= minCos`); self-pairs are always excluded. Ties broken by
   * corpus id (asc). Output: (query_id, rank, neighbor_id, cos).
   *
   * Same plan shape as [[bruteForceTopK]]: queries broadcast against
   * the corpus (never shuffling it), the band filter applies BELOW
   * the per-query top-k window, and the `row_number <= k` filter
   * plans as a Partial WindowGroupLimit — the exchange ships at most
   * partitions × |queries| × k pre-limited rows, and the band filter
   * shrinks even that. All cosine math is the fixed-order double
   * arithmetic of [[cosPre]], bit-reproducible cross-engine.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    maxCos: Double, minCos: Double = -1.0): DataFrame = {
    require(minCos < maxCos, s"empty band: [$minCos, $maxCos)")
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosPre(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("cos"))
      .filter(col("cos") < maxCos && col("cos") >= minCos)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /**
   * Prototypicality pruning (the SSL-prototypes metric of Sorscher et
   * al. 2022, "Beyond neural scaling laws", arXiv:2206.14486): assign
   * each row to its nearest k-means centroid (squared-Euclidean
   * argmin — the SAME [[graft.functions.CentroidRanks]] kernel and
   * tie rule as the IVF quantizer, so one trained centroid set serves
   * both ANN and pruning), score prototypicality as cosine to the
   * assigned centroid, and mark the TOP `dropNum/dropDen` fraction of
   * each cluster (most prototypical first — those are the redundant,
   * easy examples at big-data scale) as pruned. Rows are FLAGGED, not
   * filtered — curation wants the per-cluster diagnostics before
   * committing, same contract as
   * [[graft.llm.TextAnalysis.gopherRules]].
   *
   * The keep rule is an INTEGER cross-multiplication over the
   * per-cluster rank and size (`rank·dropDen > dropNum·n` ⇒ kept), so
   * the flag is exact at the knife edge; rank orders by (cos desc, id
   * asc) and cosine is fixed-order double arithmetic — the whole
   * output is a pure function of (data, centroids), reproducible
   * cross-engine.
   *
   * Output: (`idCol`, cluster, proto_rank, n_cluster, kept).
   * Scale: one pure-projection assignment scan (broadcast literal
   * centroids — the corpus never joins), then one cluster-keyed
   * exchange carrying (id, cluster, cos) triples — vectors do NOT
   * shuffle; both window functions (count, rank) ride that single
   * partitioning. Cluster granularity (nlist) bounds window-partition
   * size the same way it bounds IVF probe cost.
   */
  def prototypePrune(df: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[Array[Double]],
                     dropNum: Int, dropDen: Int): DataFrame = {
    require(dropDen > 0 && dropNum >= 0 && dropNum <= dropDen,
      s"drop fraction $dropNum/$dropDen outside [0, 1]")
    val mat = typedlit(centroids.map(_.toSeq))
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cluster", nearestCentroid(col("__v"), centroids).cast("long"))
      .where(col("cluster").isNotNull)
      .withColumn("__c", element_at(mat, (col("cluster") + 1).cast("int")))
      // cosine to the assigned centroid; vectors drop before the
      // exchange — only (id, cluster, cos) shuffles
      .select(col(idCol), col("cluster"),
        cosPre(col("__v"), col("__c"), norm(col("__v")), norm(col("__c")))
          .as("proto_cos"))
    val wc = Window.partitionBy("cluster")
    val wr = Window.partitionBy("cluster")
      .orderBy(col("proto_cos").desc, col(idCol).asc)
    v.withColumn("n_cluster", count(lit(1)).over(wc))
      .withColumn("proto_rank", row_number().over(wr).cast("long"))
      .withColumn("kept",
        col("proto_rank") * dropDen > lit(dropNum.toLong) * col("n_cluster"))
      .select(col(idCol), col("cluster"), col("proto_rank"),
        col("n_cluster"), col("kept"))
  }

  /**
   * Reciprocal-rank fusion of N ranked retrieval lists — the standard
   * glue of a hybrid (BM25 + embedding-ANN) retrieval stack: each
   * source contributes `1/(kRrf + rank)` for every (query, doc) it
   * ranked, fused score = the sum over sources, re-ranked. Rank-based
   * fusion needs no score calibration between sources (the reason RRF
   * beats score interpolation in practice) and `kRrf` (60 in the
   * original paper and most deployments) damps the head so one
   * source's #1 cannot drown the other's consensus.
   *
   * Each contribution is ONE IEEE division of exact values; the
   * per-(query, doc) sum folds contributions in SOURCE ORDER (same
   * ordered-fold determinism contract as
   * [[graft.llm.TextAnalysis.bm25TopK]]), so fused scores are
   * bit-reproducible cross-engine. The fold list is bounded by the
   * number of sources.
   *
   * Input frames carry (`qidCol`, `idCol`, `rankCol`); ranks are
   * 1-based positions (ties already broken upstream). Output:
   * (`qidCol`, `idCol`, rrf, rank), rank = row_number by (rrf desc,
   * `idCol` asc) per query, ≤ `k`.
   *
   * Scale: input lists are already top-k'd per query (query-bounded,
   * not corpus-bounded); the union shuffles (qid, id) keys only —
   * rank lists, never vectors or text. The final window is per-query
   * over ≤ N·k_source rows.
   */
  def rrfFuse(lists: Seq[DataFrame], qidCol: String, idCol: String,
              rankCol: String, kRrf: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(qidCol), col(idCol),
        (lit(1.0) / (lit(kRrf).cast("double") + col(rankCol).cast("double")))
          .as("__s"),
        lit(i).as("__src"))
    }
    val w = Window.partitionBy(qidCol).orderBy(col("rrf").desc, col(idCol).asc)
    tagged.reduce(_.unionByName(_))
      .groupBy(qidCol, idCol)
      .agg(sort_array(collect_list(struct(col("__src").as("i"), col("__s").as("s"))))
        .as("__ls"))
      .withColumn("rrf", aggregate(col("__ls"), lit(0.0),
        (acc, x) => acc + x.getField("s")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("rrf"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
   *  `(md5("<plane>_<dim>")[0:8] as int mod 2001 − 1000) / 1000`.
   *  Computed on the DRIVER (the planes are data-independent
   *  constants); an external oracle reproduces them with the same md5
   *  formula. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$dim".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L).toDouble / 1000.0
  }

  /** The deterministic hyperplane matrix used by [[lshBuckets]] —
   *  public so an external oracle can inline the same constants. */
  def planesFor(bits: Int, dims: Int): Seq[Array[Double]] =
    (0 until bits).map(p => Array.tabulate(dims)(d => planeComponent(p, d)))

  /**
   * Random-hyperplane LSH bucket id (`bits`-bit signature): bit_i =
   * sign of ⟨v, plane_i⟩. The planes are literal constant arrays in
   * the plan (never recomputed per row — an earlier per-row md5
   * formulation cost 384 digests/vector). Pure projection over the
   * vector column — computable on corpus and queries independently.
   */
  def lshBuckets(vec: Column, bits: Int = 12, dims: Int = 64): Column = {
    // one native kernel over the whole plane matrix (constant-size
    // generated code at any bit width) — bit-identical to the composed
    // `when(dot(v, plane_p) > 0, 2^p)` sum it replaced
    graft.functions.VectorExpressions.hyperplaneSig(
      vec.cast("array<double>"), planesFor(bits, dims))
  }

  /** Index of the nearest centroid (argmin over squared L2, ties to
   *  the lower index) — `ranks[0]` of the [[graft.functions.CentroidRanks]]
   *  kernel. One compact generated loop over the whole centroid
   *  matrix; an earlier `array_min(array(struct(sqdist…)×k))` form
   *  inlined k kernel copies into whole-stage codegen and cost ~1 s of
   *  codegen + Janino compile per k-means ROUND (fresh literals ⇒
   *  fresh class). Distances and tie order are bit-identical. */
  private def nearestCentroid(v: Column, centroids: Seq[Array[Double]]): Column =
    element_at(graft.functions.VectorExpressions.centroidRanks(v, centroids), 1)

  /**
   * IVF (inverted-file) coarse quantizer: `nlist` centroids from
   * `iters` rounds of k-means over the corpus. Each round is one scan
   * (assignment against broadcast literal centroids) plus one
   * partial-aggregated per-cluster mean — no driver-side data beyond
   * the nlist×dim centroid matrix. Initial centroids are the first
   * `nlist` vectors by id (deterministic).
   *
   * Cluster means accumulate as EXACT decimal sums (components
   * quantized to 12 decimal places), divided by the count on the
   * driver: the result is independent of partition order and task
   * scheduling, so the centroids are bit-reproducible run-to-run —
   * which is what lets the gate inline them into an external oracle
   * (a plain double `avg` drifts with partitioning).
   */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, iters: Int = 3, dims: Int = 64): Seq[Array[Double]] = {
    // Persisted: the loop reads this relation iters+1 times (init pick
    // + one assignment scan per round); at 8·dims bytes/row the cache
    // is far cheaper than re-scanning + re-casting parquet each round.
    val v = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    var centroids: Seq[Array[Double]] = v.orderBy("__id").limit(nlist)
      .collect().map(_.getSeq[Double](1).toArray).toSeq
    for (_ <- 1 to iters) {
      val assigned = v.select(
        nearestCentroid(col("__v"), centroids).as("__c"), col("__v"))
        // a vector whose length mismatches the centroid dims (or a null
        // vector) gets a null assignment — drop it from the means
        // instead of NPE-ing on the driver when the null cluster id
        // unboxes; such rows also can't be probed at query time
        .where(col("__c").isNotNull)
      // Per-(cluster, dimension) decimal sums via posexplode — ONE
      // small aggregate expression instead of `dims` parallel agg
      // columns (whose generated class measured ~1 s/round to compile);
      // the shuffle carries at most nlist×dims partial rows.
      // decimal(18,12): 6 integer digits is ample for unit-scale
      // embedding components, and precision ≤ 18 keeps Spark's Decimal
      // on the compact long representation in the sum buffers.
      // try_cast: a NaN/Inf/±1e6+ outlier component (corrupt encoder
      // row) becomes null and drops out of that dimension's sum
      // instead of killing the job under ANSI mode — a bounded, still
      // deterministic nudge to one centroid dimension.
      val prev = centroids
      val cells = assigned
        .select(col("__c"), posexplode(col("__v")))
        .groupBy("__c", "pos")
        .agg(count(lit(1)).as("__n"),
          sum(col("col").try_cast("decimal(18,12)")).as("__s"))
        .collect()
      val means = cells.groupBy(_.getInt(0)).map { case (j, rows) =>
        val comps = prev(j).clone()
        rows.foreach { r =>
          val d = r.getInt(1)
          val n = r.getLong(2).toDouble
          val bd = r.getDecimal(3)
          // a dimension whose every value was nulled by try_cast (all
          // rows corrupt in that cluster) keeps its previous centroid
          // component instead of NPE-ing on a null sum
          if (bd != null) comps(d) = bd.doubleValue() / n
        }
        j -> comps
      }
      // Empty clusters keep their previous centroid.
      centroids = centroids.zipWithIndex.map { case (c, j) => means.getOrElse(j, c) }
    }
    centroids
    // unpersist even when a collect mid-loop throws — the training
    // relation must never outlive the call as an orphan cache entry
    } finally v.unpersist()
  }

  /**
   * IVF approximate top-k: corpus rows are assigned to their nearest
   * centroid ONCE (pure projection); each query probes its `nprobe`
   * nearest clusters; candidates come from an equi-join on the cluster
   * id — the candidate set shrinks ~nlist/nprobe-fold vs brute force.
   * Returns ≤ k neighbors per query, ranked by cosine.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
              dims: Int = 64): DataFrame = {
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val centroids = ivfCentroids(corpus, idCol, vecCol, nlist, iters, dims)
    ivfTopKWith(corpus, queries, idCol, vecCol, k, centroids, nprobe)
  }

  /** [[ivfTopK]] against a pre-trained (or externally supplied) coarse
   *  quantizer — lets callers train once and reuse across query
   *  batches, and lets the gate verify the probe path against an
   *  oracle holding the same centroid constants. */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  centroids: Seq[Array[Double]], nprobe: Int = 4): DataFrame = {
    require(nprobe <= centroids.size, "nprobe must be <= number of centroids")
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .withColumn("__cluster", nearestCentroid(col("__cv"), centroids))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .withColumn("__cluster", explode(slice(
        graft.functions.VectorExpressions.centroidRanks(col("__qv"), centroids),
        1, nprobe)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), "__cluster")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosPre(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("__cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /**
   * Approximate top-k: like [[bruteForceTopK]] but candidates are
   * restricted to the query's LSH bucket. Returns ≤ k neighbors per
   * query (fewer when the bucket is small) — the standard ANN
   * recall/cost trade, tunable via `bits`.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, bits: Int = 12,
              dims: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"),
      lshBuckets(col(vecCol), bits, dims).as("__bucket"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"),
      lshBuckets(col(vecCol), bits, dims).as("__bucket"))
      .withColumn("__qn", norm(col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), "__bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosPre(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("__cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /**
   * Retrieval-quality evaluation: recall@k of an approximate
   * ranking against an exact one — THE acceptance metric for every
   * ANN configuration in this module (how many of the true top-k
   * did LSH/IVF/quantized retrieval surface?). Both inputs are
   * (qid, id, rank) relations, e.g. [[lshTopK]] vs [[bruteForceTopK]]
   * on the same queries.
   *
   * Per query: `n_exact` = exact neighbors at rank ≤ k, `hits` = of
   * those, how many the approximate list (rank ≤ k) also contains,
   * `recall = hits / n_exact`, `first_hit_rank` = the best approx
   * rank among true hits (null if none) and `rr` its reciprocal
   * (0.0 if none — mean(rr) over queries is MRR@k). Queries the
   * approximate arm missed entirely still appear (hits = 0) — silent
   * denominator shrinkage would overstate recall.
   *
   * Scale: both inputs are rank-filtered to queries×k rows BEFORE
   * the joins, so cost is list-sized, never corpus-sized; the
   * semi-join and the two aggregates share the qid shuffle.
   */
  def recallAtK(approx: DataFrame, exact: DataFrame, qidCol: String,
                idCol: String, rankCol: String, k: Int): DataFrame = {
    val e = exact.filter(col(rankCol) <= k).select(col(qidCol), col(idCol))
    val a = approx.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("long").as("__ar"))
    // inner join keeps only true hits; per query, count them and take
    // the best (lowest) approx rank for the reciprocal-rank metric —
    // 1/r over small integer ranks is exactly rounded, so rr is
    // engine-reproducible (unlike log-discounted nDCG, deliberately
    // not emitted)
    val hits = e.join(a, Seq(qidCol, idCol))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("hits"), min(col("__ar")).as("first_hit_rank"))
    e.groupBy(col(qidCol)).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq(qidCol), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall",
        col("hits").cast("double") / col("n_exact").cast("double"))
      .withColumn("rr",
        when(col("first_hit_rank").isNotNull,
          lit(1.0) / col("first_hit_rank").cast("double")).otherwise(lit(0.0)))
      .select(col(qidCol), col("n_exact"), col("hits"), col("recall"),
        col("first_hit_rank"), col("rr"))
  }

  /**
   * Rank-biased overlap (RBO@k, Webber et al.) between two rankings
   * per query — the top-weighted list-similarity metric for comparing
   * retrieval runs ("how differently do the old and new index rank
   * what users actually see?"). Unlike [[recallAtK]] it rewards
   * AGREEMENT IN ORDER, geometrically discounted by depth with
   * persistence `p` (p = 0.9 ≈ the top ~10 ranks carry ~86% of the
   * weight).
   *
   * Closed form that keeps it relational: the truncated
   * `RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·|S_d ∩ T_d|/d` re-sums per ITEM —
   * an item ranked (a, b) joins the intersection at every depth
   * d ≥ max(a,b), so it contributes the SUFFIX SUM
   * `Σ_{d=max(a,b)}^{k} p^{d−1}/d`, precomputed for every m ≤ k as
   * driver-side double literals (no runtime pow — the literals parse
   * identically in any engine). Per-item terms round to the 10⁻¹²
   * grid and sum in DECIMAL.
   *
   * Output: (qidCol, n_overlap, rbo) — one row per rank-1 query of
   * `run1`, rbo = 0 when the top-k lists are disjoint.
   *
   * Scale posture: one (qid, id) equi join of two k-bounded runs, one
   * qid aggregation; everything is queries×k-sized.
   */
  def rankBiasedOverlap(run1: DataFrame, run2: DataFrame, qidCol: String,
                        idCol: String, rankCol: String, k: Int,
                        p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"p in (0,1), got $p")
    val suffix = (1 to k).map(m =>
      (m to k).map(d => math.pow(p, d - 1) / d).sum).toArray
    val r1 = run1.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("int").as("__r1"))
    val r2 = run2.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("int").as("__r2"))
    val j = r1.join(r2, Seq(qidCol, idCol))
      .withColumn("__m", greatest(col("__r1"), col("__r2")))
      .withColumn("__contrib",
        round(element_at(lit(suffix), col("__m")), 12)
          .cast("decimal(16,12)"))
    val s = j.groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_overlap"), sum(col("__contrib")).as("__s"))
    r1.select(col(qidCol)).distinct()
      .join(s, Seq(qidCol), "left")
      .select(col(qidCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (lit(1.0 - p) *
          coalesce(col("__s").cast("double"), lit(0.0))).as("rbo"))
  }

  /**
   * nDCG@k of an approximate ranking against the exact one — the
   * graded, position-discounted retrieval-quality score [[recallAtK]]
   * deliberately omitted while log discounts meant engine libm calls.
   * Now pinnable: the discounts `1/log2(d+1)` and the ideal-DCG
   * prefix sums are DRIVER-SIDE double literals (d ≤ k — no runtime
   * transcendental anywhere), per-item terms round to the 10⁻¹² grid
   * and sum in DECIMAL, so the score replays bit-for-bit.
   *
   * Relevance grading: the exact rank-r neighbor carries
   * `rel = k+1−r` (top exact hit = k, …, 0 for items outside the
   * exact top-k); `DCG = Σ_d rel(item at approx rank d)·disc(d)`;
   * `IDCG` = the exact list in its own order — `Σ_{d≤n} (k+1−d)·
   * disc(d)` with n = that query's exact-neighbor count.
   *
   * Output: (qidCol, n_exact, dcg, idcg, ndcg) — one row per query
   * of the EXACT run.
   *
   * Scale posture: identical to [[rankBiasedOverlap]] — k-bounded
   * joins and one aggregation.
   */
  def ndcgAtK(approx: DataFrame, exact: DataFrame, qidCol: String,
              idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val disc = (1 to k)
      .map(d => 1.0 / (math.log(d + 1.0) / math.log(2.0))).toArray
    val ideal = disc.zipWithIndex
      .scanLeft(0.0) { case (acc, (dc, i)) => acc + (k - i) * dc }
      .tail.toArray
    val a = approx.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("int").as("__ar"))
    val e = exact.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("int").as("__er"))
    val terms = a.join(e, Seq(qidCol, idCol), "left")
      .withColumn("__rel",
        when(col("__er").isNotNull, lit(k + 1) - col("__er"))
          .otherwise(lit(0)))
      .withColumn("__term",
        round(col("__rel").cast("double") *
          element_at(lit(disc), col("__ar")), 12).cast("decimal(18,12)"))
    val dcg = terms.groupBy(col(qidCol)).agg(sum(col("__term")).as("__dcg"))
    e.groupBy(col(qidCol)).agg(count(lit(1)).as("n_exact"))
      .join(dcg, Seq(qidCol), "left")
      .withColumn("dcg", coalesce(col("__dcg").cast("double"), lit(0.0)))
      .withColumn("idcg", element_at(lit(ideal), col("n_exact").cast("int")))
      .withColumn("ndcg",
        when(col("idcg") > 0, col("dcg") / col("idcg")))
      .select(col(qidCol), col("n_exact"), col("dcg"), col("idcg"),
        col("ndcg"))
  }

  /**
   * MAP@k (mean average precision, per query) of an approximate
   * ranking against the exact one — the binary-relevance,
   * precision-weighted companion to [[ndcgAtK]]: an item is RELEVANT
   * iff it appears in the exact top-k, and
   * `AP = (Σ_{d : hit at d} precision@d) / min(n_exact, k)` over the
   * approx ranks d ≤ k. Rewards putting the hits EARLY, ignores the
   * order of misses — the standard one-number retrieval score when
   * relevance is binary.
   *
   * Engine-exact: precision@d = cumhits/d is ONE pinned double
   * division per hit, rounded to the 10⁻¹² grid (unambiguous for
   * rationals with d ≤ k — no tie can sit on the grid midpoint),
   * summed in DECIMAL, one closing double division by min(n_exact, k).
   *
   * Output: (qidCol, n_exact, ap) — one row per query of the EXACT
   * run; a query whose approx list has no hits scores 0.
   *
   * Scale posture: identical to [[ndcgAtK]] — k-bounded join, one
   * k-row window per query, one aggregation.
   */
  def mapAtK(approx: DataFrame, exact: DataFrame, qidCol: String,
             idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = approx.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("int").as("__ar"))
    val e = exact.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), lit(1L).as("__hit"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("__ar"))
    val terms = a.join(e, Seq(qidCol, idCol), "left")
      .withColumn("__r", coalesce(col("__hit"), lit(0L)))
      .withColumn("__cum", sum(col("__r")).over(w))
      .withColumn("__term",
        round((col("__r") * col("__cum")).cast("double") /
          col("__ar").cast("double"), 12).cast("decimal(18,12)"))
    val sums = terms.groupBy(col(qidCol)).agg(sum(col("__term")).as("__s"))
    e.groupBy(col(qidCol)).agg(count(lit(1)).as("n_exact"))
      .join(sums, Seq(qidCol), "left")
      .withColumn("ap",
        coalesce(col("__s").cast("double"), lit(0.0)) /
          least(col("n_exact"), lit(k.toLong)).cast("double"))
      .select(col(qidCol), col("n_exact"), col("ap"))
  }

  /**
   * Embedding-centroid drift between segments (model-ops monitor:
   * "has the upstream encoder or the traffic mix shifted?"): for
   * every pair of segments, the cosine between their MEAN embeddings
   * — computed so the result is bit-reproducible at any parallelism:
   *
   *  - per-dimension values scale by 2^`scaleBits` and FLOOR to
   *    integers (power-of-two scaling is exact for any double; floor
   *    is exact), so per-(segment, dim) sums are order-free longs;
   *  - counts cancel in cosine, so the integer sum VECTORS stand in
   *    for the centroids directly;
   *  - the closing dot/norms fold in DIMENSION order over the joined
   *    per-dim sums (the χ²-drift contract), one sqrt/divide each.
   *
   * Flooring quantizes each component by 2^-scaleBits (~6e-8 at the
   * default) — far below any drift worth alerting on. Null/empty
   * embeddings are ignored. Output: (g1, g2, n_1, n_2, cosine).
   *
   * Scale posture: one (segment, dim) shuffle (map-side combined);
   * everything after runs on |segments| × dims rows.
   */
  def centroidDrift(df: DataFrame, groupCol: String, vecCol: String,
                    scaleBits: Int = 24): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 40, s"scaleBits: $scaleBits")
    val scale = math.pow(2.0, scaleBits)
    // floor BEFORE summing: aggregate the already-floored terms
    val perDim = df
      .filter(col(groupCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) > 0)
      .select(col(groupCol).as("__g"),
        posexplode(transform(col(vecCol),
          v => floor(v.cast("double") * scale).cast("long"))))
      .groupBy(col("__g"), col("pos").as("__d"))
      .agg(sum(col("col")).as("__s"), count(lit(1)).as("__n"))
    val a = perDim.select(col("__g").as("g1"), col("__d"),
      col("__s").as("__s1"), col("__n").as("__n1"))
    val b = perDim.select(col("__g").as("g2"), col("__d"),
      col("__s").as("__s2"), col("__n").as("__n2"))
    a.join(b, Seq("__d")).filter(col("g1") < col("g2"))
      .groupBy(col("g1"), col("g2"))
      .agg(max(col("__n1")).as("n_1"), max(col("__n2")).as("n_2"),
        aggregate(sort_array(collect_list(struct(col("__d").as("d"),
            (col("__s1").cast("double") * col("__s2").cast("double")).as("xy"),
            (col("__s1").cast("double") * col("__s1").cast("double")).as("xx"),
            (col("__s2").cast("double") * col("__s2").cast("double")).as("yy")))),
          struct(lit(0.0).as("xy"), lit(0.0).as("xx"), lit(0.0).as("yy")),
          (acc, x) => struct(
            (acc.getField("xy") + x.getField("xy")).as("xy"),
            (acc.getField("xx") + x.getField("xx")).as("xx"),
            (acc.getField("yy") + x.getField("yy")).as("yy"))).as("__m"))
      .withColumn("cosine",
        when(col("__m.xx") > 0 && col("__m.yy") > 0,
          col("__m.xy") / (sqrt(col("__m.xx")) * sqrt(col("__m.yy")))))
      .select(col("g1"), col("g2"), col("n_1"), col("n_2"), col("cosine"))
  }

  /**
   * Centroid silhouette per point — the O(n·k) cluster-quality score
   * for embedding clusterings (full silhouette is O(n²) and dead at
   * corpus scale): with cosine distance `d(x, c) = 1 − cos(x, μ_c)`,
   * `a` = distance to the OWN centroid, `b` = distance to the nearest
   * OTHER centroid, `s = (b − a)/max(a, b)` ∈ [−1, 1] — near 1 =
   * firmly placed, near 0 = boundary, negative = probably
   * mis-clustered (the standard prune/review signal for semantic
   * dedup and IVF cell QA, pairing with [[prototypePrune]]).
   *
   * Engine-exact: components snap to the 10⁻⁶ grid ([[classSeparation]]
   * discipline); centroids close from exact decimal per-(cluster, dim)
   * sums with pinned divisions; every dot/norm folds SEQUENTIALLY in
   * dim order (zip_with + aggregate ≡ list_reduce — bare double SUMs
   * would be partial-order-dependent); the silhouette chain is pinned
   * IEEE. PER-POINT output — no cross-point mean, so nothing
   * order-dependent survives (callers average with their own
   * discipline). Zero-norm points/centroids or a single cluster emit
   * null silhouette. Vectors must share ONE length (asserted with a
   * diagnostic — ragged input would otherwise silently null every
   * comparison against a short cluster's centroid); filter to the
   * modal dimensionality upstream when mixing embedding versions.
   *
   * Output: (idCol, clusterCol, cos_own, cos_nearest_other,
   * silhouette).
   *
   * Scale posture: ONE corpus explode → map-side (cluster, dim)
   * collapse builds the k centroids (grid-sized); the point × centroid
   * cosine table is a BROADCAST of k rows against one corpus pass —
   * O(n·k), no shuffle beyond the centroid grid.
   */
  def centroidSilhouette(df: DataFrame, idCol: String, vecCol: String,
                         clusterCol: String): DataFrame = {
    val snapped = df
      .filter(col(idCol).isNotNull && col(clusterCol).isNotNull &&
        col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol), col(clusterCol),
        transform(col(vecCol), x => round(x.cast("double"), 6)).as("__v"))
      .localCheckpoint(false) // feeds the centroid grid AND the scan
    // Uniform-length precondition (round-15 advisory): a cluster
    // holding SHORTER vectors builds a centroid over only observed
    // dims, and zip_with's null padding then silently nulls every
    // dot against it — fail fast with a diagnostic instead. One-row
    // collect over the already-checkpointed frame.
    val lens = snapped
      .agg(min(size(col("__v"))).as("mn"), max(size(col("__v"))).as("mx"))
      .head()
    if (!lens.isNullAt(0) && lens.getInt(0) != lens.getInt(1))
      throw new IllegalArgumentException(
        s"centroidSilhouette requires a uniform vector length; got " +
          s"lengths ${lens.getInt(0)}..${lens.getInt(1)} in '$vecCol' — " +
          "filter to one embedding dimensionality (e.g. the modal " +
          "size) upstream")
    val grid = snapped
      .select(col(clusterCol), posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy(col(clusterCol), col("__d"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast("decimal(18,6)")).as("__s"))
    val centroids = grid
      .groupBy(col(clusterCol).as("__cc"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("__d"),
          (col("__s").cast("double") / col("__n").cast("double"))
            .as("m")))),
        array().cast("array<double>"),
        (acc, x) => concat(acc, array(x.getField("m")))).as("__mu"))
    def dotf(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (s, t) => s + t)
    val paired = snapped.crossJoin(broadcast(centroids))
      .withColumn("__dot", dotf(col("__v"), col("__mu")))
      .withColumn("__np", dotf(col("__v"), col("__v")))
      .withColumn("__nc", dotf(col("__mu"), col("__mu")))
      .withColumn("__cos", when(col("__np") > 0.0 && col("__nc") > 0.0,
        col("__dot") / (sqrt(col("__np")) * sqrt(col("__nc")))))
    val perPoint = paired.groupBy(col(idCol), col(clusterCol))
      .agg(max(when(col(clusterCol) === col("__cc"), col("__cos")))
          .as("cos_own"),
        max(when(col(clusterCol) =!= col("__cc"), col("__cos")))
          .as("cos_nearest_other"))
    val a = lit(1.0) - col("cos_own")
    val b = lit(1.0) - col("cos_nearest_other")
    perPoint.withColumn("silhouette",
      when(col("cos_own").isNotNull && col("cos_nearest_other").isNotNull &&
        greatest(a, b) > 0.0, (b - a) / greatest(a, b)))
  }

  /**
   * Per-dimension class-separation profile of a labeled embedding
   * column: for each vector dimension, the Fisher ratio
   * `Σ_c n_c(μ_c − μ)² / Σ_c n_c σ²_c` (between-class over pooled
   * within-class scatter) — the embedding-QA readout for "which
   * dimensions actually carry the label, and does this space separate
   * classes at all". Dimensions rank by ratio descending (dim index
   * as tie-break, a total order).
   *
   * Engine-exact: components snap to the 10⁻⁶ decimal grid (floats
   * round-trip exactly), per-(class, dim) moments are exact decimal
   * sums, and the scatter chain closes from the class grid in pinned
   * IEEE — scatter identities `Σn_c μ_c² − n μ²` on moment doubles,
   * both engines identical. Zero within-class scatter emits a null
   * ratio (separation is infinite or the dim is constant — either
   * way not a number).
   *
   * Output: (dim, n, fisher, rank).
   *
   * Scale posture: posexplode → ONE map-side-combined (label, dim)
   * collapse (|classes × dims| rows); everything after runs on that
   * grid. The corpus crosses the wire once, aggregated.
   */
  def classSeparation(df: DataFrame, vecCol: String, labelCol: String)
  : DataFrame = {
    val base = df.filter(col(labelCol).isNotNull && col(vecCol).isNotNull)
      .select(col(labelCol).as("__c"), posexplode(col(vecCol))
        .as(Seq("dim", "__v0")))
      .withColumn("__v",
        round(col("__v0").cast("double"), 6).cast("decimal(18,6)"))
    val grid = base.groupBy(col("__c"), col("dim"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
        sum((col("__v") * col("__v")).cast("decimal(38,6)")).as("__ss"))
    // per-dim closing from the class grid: exact decimal totals, one
    // double cast each, pinned scatter identities
    val per = grid.groupBy(col("dim"))
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("__ts"),
        // exact decimal Σv² closes with one correctly-rounded double
        // cast; oracle replays it as exact integer micro-units / 1e6
        // (bit-identical under 2⁵³ micro-units per dim — oracle-side
        // envelope; the engine cast is correct at any magnitude)
        sum(col("__ss")).cast("double").as("__tss"),
        // Σ n_c μ_c² = Σ s_c²/n_c — per-class pinned divisions folded
        // SEQUENTIALLY in class order (a bare double SUM would be
        // partial-aggregation-order-dependent; the sorted fold is the
        // crossGroupCosine discipline, list_reduce on the SQL side)
        aggregate(sort_array(collect_list(struct(col("__c").as("c"),
            (col("__s").cast("double") * col("__s").cast("double") /
              col("__n").cast("double")).as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("__bsum"))
    val n = col("n").cast("double")
    val between = col("__bsum") - col("__ts") * col("__ts") / n
    val within = col("__tss") - col("__bsum")
    per.select(col("dim"), col("n"),
        when(within > 0.0, between / within).as("fisher"))
      .withColumn("rank", row_number().over(Window
        .orderBy(col("fisher").desc_nulls_last, col("dim").asc)))
  }
}
