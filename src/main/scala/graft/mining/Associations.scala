package graft.mining

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Market-basket association mining: frequent co-occurring item pairs
 * and both directed association rules per pair, with the classic
 * support / confidence / lift statistics — the "customers who bought X
 * also bought Y" primitive (cross-sell, query suggestion, co-view).
 *
 * Reference scope: goetl ships no mining operators; this extends the
 * aggregation family per the training-data/analytics north star.
 */
object Associations {

  /**
   * Association rules over (basket, item) rows: for every unordered
   * item pair occurring in ≥ `minPairSupport` baskets, both directed
   * rules `antecedent → consequent` with
   *
   *  - `support    = n_pair / n_baskets`
   *  - `confidence = n_pair / n_antecedent`
   *  - `lift       = confidence / (n_consequent / n_baskets)`
   *
   * each a pinned single/double IEEE division chain on exact integer
   * counts (engine-reproducible). Duplicate (basket, item) rows count
   * once. Output: (antecedent, consequent, n_pair, n_antecedent,
   * n_consequent, n_baskets, support, confidence, lift).
   *
   * `maxPerGroup` drops baskets larger than the cap BEFORE the pair
   * fan-out — the same scale lever as
   * [[graft.graph.Graph.coOccurrenceEdges]]: pair mass is then
   * O(baskets · maxPerGroup²) instead of Σ basket², and a single
   * degenerate mega-basket (one customer buying the whole catalog)
   * cannot produce a catalog² explosion. Dropped baskets leave
   * `n_baskets` too (support stays a probability over the baskets
   * actually mined).
   *
   * Scale posture: basket dedup and the size cap ride one
   * basket-keyed exchange (window count on the same partitioning);
   * the pair self-join keys on the basket id; item supports and the
   * rule joins key on items; `n_baskets` is a one-row aggregate
   * broadcast by crossJoin — no driver collect, nothing corpus-sized
   * on a build side.
   */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minPairSupport: Long = 2L, maxPerGroup: Int = 64): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport >= 1, got $minPairSupport")
    require(maxPerGroup >= 2, s"maxPerGroup >= 2, got $maxPerGroup")
    val gi = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__g"), col(itemCol).as("__i"))
      .distinct()
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("__g"))))
      .filter(col("__sz") <= maxPerGroup)
      .select("__g", "__i")
      .localCheckpoint(false) // three consumers: baskets, items, pairs
    val nBaskets = gi.agg(countDistinct(col("__g")).as("n_baskets"))
    val items = gi.groupBy(col("__i")).agg(count(lit(1)).as("__s"))
    val pairs = gi.as("x").join(gi.as("y"),
        col("x.__g") === col("y.__g") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("__a"), col("y.__i").as("__b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairSupport)
    val directed = pairs
      .select(col("__a").as("antecedent"), col("__b").as("consequent"),
        col("n_pair"))
      .unionByName(pairs.select(col("__b").as("antecedent"),
        col("__a").as("consequent"), col("n_pair")))
    val conf = col("n_pair").cast("double") /
      col("n_antecedent").cast("double")
    directed
      .join(items.select(col("__i").as("antecedent"),
        col("__s").as("n_antecedent")), Seq("antecedent"))
      .join(items.select(col("__i").as("consequent"),
        col("__s").as("n_consequent")), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("n_antecedent"), col("n_consequent"), col("n_baskets"),
        (col("n_pair").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        conf.as("confidence"),
        (conf / (col("n_consequent").cast("double") /
          col("n_baskets").cast("double"))).as("lift"))
  }
}
