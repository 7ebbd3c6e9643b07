package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph centrality for corpus curation — the web-graph quality
 * prior (Common-Crawl-style pipelines rank hosts by centrality and
 * use it as a document quality signal; reference has no graph
 * operators, this is beyond-reference surface like the dedup family).
 *
 * Everything here is FIXED-POINT integer arithmetic: ranks are longs
 * in `SCALE` millionths, per-edge contributions are floor divisions,
 * damping is an integer 85/100 split. Integer sums are order-free and
 * overflow-checked by construction (total mass is conserved below
 * nodes·SCALE), so every iteration is bit-reproducible in any engine —
 * a float PageRank's per-node sums would depend on addend order and
 * could never be hash-verified cross-engine.
 */
object Centrality {

  /** Fixed-point scale: ranks are expressed in millionths. */
  val SCALE: Long = 1000000L

  /**
   * PageRank with damping `d_num/100` over `iterations` synchronous
   * sweeps, in fixed-point arithmetic. Input: an edge list; output:
   * (node_id, rank_fp) for every node appearing as source OR target,
   * rank_fp in [[SCALE]] millionths.
   *
   * Semantics pinned for reproducibility (and mirrored by the gate
   * oracle):
   *  - initial rank = SCALE for every node;
   *  - each sweep: rank' = (100−d_num)·SCALE/100 +
   *    d_num·Σ_in floor(rank_src / outdeg_src) / 100, all floor divs;
   *  - DANGLING nodes (no out-edges) leak their mass rather than
   *    redistributing it — the cheap variant every large-scale
   *    implementation starts from; ranks remain a valid relative
   *    ordering, which is all a quality prior needs.
   *
   * Scale: the edge list shuffles ONCE per sweep on the target key
   * (sum of contributions, map-side partial); ranks and out-degrees
   * join edges on the source key. `iterations` is a static unroll —
   * each sweep's ranks ride a lazy localCheckpoint, so sweep i+1
   * reads materialized blocks instead of recursively recomputing
   * sweeps 1..i (the unrolled lineage would otherwise grow
   * geometrically). Convergence in rank ORDER is typically reached in
   * a handful of sweeps; this operator is a quality prior, not a
   * numerical eigensolver.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, d_num: Int = 85): DataFrame = {
    require(iterations >= 1, "pageRank needs >= 1 iteration")
    require(d_num >= 0 && d_num <= 100, s"damping numerator $d_num outside [0,100]")
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst"))
      .distinct()
      .localCheckpoint(false) // 2 consumers per sweep + degree/node set
    val nodes = e.select(col("__src").as("node_id"))
      .union(e.select(col("__dst")))
      .distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__outdeg"))
    val base = lit((100L - d_num) * SCALE / 100L)
    var ranks = nodes.select(col("node_id"), lit(SCALE).as("rank_fp"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node_id", "__src"), "__src")
        .join(outdeg, "__src")
        .select(col("__dst").as("node_id"),
          expr("rank_fp div __outdeg").as("__c"))
        .groupBy("node_id")
        .agg(sum(col("__c")).as("__m"))
      ranks = nodes.join(contrib, Seq("node_id"), "left")
        .select(col("node_id"),
          (base + expr(s"($d_num * coalesce(__m, 0L)) div 100"))
            .as("rank_fp"))
        .localCheckpoint(false)
    }
    ranks
  }

  /**
   * HITS hubs & authorities over `iterations` synchronous sweeps, in
   * the same fixed-point integer arithmetic as [[pageRank]] — the
   * directed-graph quality pair PageRank collapses into one score:
   * on a customer→supplier (or page→page) graph, a good HUB points
   * at good authorities and a good AUTHORITY is pointed at by good
   * hubs.
   *
   * Semantics pinned for reproducibility (mirrored by the gate
   * oracle):
   *  - initial hub = auth = [[SCALE]] for every node;
   *  - each sweep: `auth'(v) = Σ_{u→v} hub(u)`, normalized to
   *    `auth = auth'·SCALE div max(auth')` (floor div, integer max —
   *    max-normalization keeps everything exact where the classic
   *    L2 norm would need a square root); then
   *    `hub'(u) = Σ_{u→v} auth(v)` from the NORMALIZED new
   *    authorities, normalized the same way;
   *  - nodes with no in-edges carry auth 0, no out-edges hub 0.
   *
   * Overflow by construction: scores stay ≤ SCALE after each
   * normalization, so a sweep's raw sums are ≤ SCALE·maxDegree and
   * the normalization product ≤ SCALE²·maxDegree — exact in longs up
   * to maxDegree ≈ 9·10⁶ (beyond that, lower SCALE; documented, not
   * silently wrong: longs overflow loudly in ANSI engines).
   *
   * Output: (node_id, hub_fp, auth_fp) in SCALE millionths.
   *
   * Scale posture: per sweep, TWO target-keyed edge shuffles with
   * map-side partial sums and two one-row max aggregates attached by
   * broadcast; per-sweep lazy localCheckpoint cuts the unrolled
   * lineage exactly as [[pageRank]].
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "hits needs >= 1 iteration")
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst"))
      .distinct()
      .localCheckpoint(false) // 2 consumers per sweep + node set
    val nodes = e.select(col("__src").as("node_id"))
      .union(e.select(col("__dst")))
      .distinct()
      .localCheckpoint(false)
    def normalized(raw: DataFrame, out: String): DataFrame = {
      // raw: (node_id, __v) for scoring side only; absent nodes -> 0
      val full = nodes.join(raw, Seq("node_id"), "left")
        .select(col("node_id"), coalesce(col("__v"), lit(0L)).as("__v"))
      val mx = full.agg(max(col("__v")).as("__mx"))
      full.crossJoin(broadcast(mx))
        .select(col("node_id"),
          when(col("__mx") > 0L,
            expr(s"(__v * $SCALE) div __mx")).otherwise(0L).as(out))
    }
    var scores = nodes.select(col("node_id"),
      lit(SCALE).as("hub_fp"), lit(SCALE).as("auth_fp"))
    for (_ <- 1 to iterations) {
      val auth = normalized(
        e.join(scores.select(col("node_id").as("__src"), col("hub_fp")),
            "__src")
          .groupBy(col("__dst").as("node_id"))
          .agg(sum(col("hub_fp")).as("__v")), "auth_fp")
      val hub = normalized(
        e.join(auth.select(col("node_id").as("__dst"), col("auth_fp")),
            "__dst")
          .groupBy(col("__src").as("node_id"))
          .agg(sum(col("auth_fp")).as("__v")), "hub_fp")
      scores = hub.join(auth, "node_id")
        .select(col("node_id"), col("hub_fp"), col("auth_fp"))
        .localCheckpoint(false)
    }
    scores
  }

  /** Per-document centrality prior: join [[pageRank]] scores computed
   *  on a (doc → outlink-target) edge list back onto the corpus by a
   *  grouping key (host, source, domain). Documents whose key has no
   *  rank (never linked) get the teleport floor — the same score an
   *  isolated node would earn. */
  def centralityPrior(docs: DataFrame, keyCol: String, ranks: DataFrame,
                      d_num: Int = 85): DataFrame = {
    val floor = lit((100L - d_num) * SCALE / 100L)
    docs.join(ranks.withColumnRenamed("node_id", keyCol), Seq(keyCol), "left")
      .withColumn("rank_fp", coalesce(col("rank_fp"), floor))
      .select(docs.columns.map(col) :+ col("rank_fp"): _*) // caller's order, key not hoisted
  }
}
