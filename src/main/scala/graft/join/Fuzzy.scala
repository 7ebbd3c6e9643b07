package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity self-join (fuzzy entity matching /
 * record-linkage dedup): all pairs within Levenshtein distance
 * `maxDist`, found WITHOUT the all-pairs cross join — the PassJoin
 * scheme (Li, Deng, Feng 2011): partition every string into
 * `maxDist + 1` segments; by pigeonhole, `maxDist` edits cannot touch
 * all segments, so any match shares at least one segment VERBATIM —
 * at a position shifted by at most `maxDist`. Candidates come from an
 * equi-join on (segment index, partner length, substring); only
 * candidates pay the Levenshtein verification.
 *
 * Duplication caveat: the OUTPUT is the pair list, so a corpus where
 * thousands of rows share a handful of distinct strings pays for the
 * pairs it genuinely contains — quadratic in duplication depth
 * (measured: 5k rows over 600 distinct names → ~200k pairs, 26-31 s;
 * unique-per-row names with linear neighbor structure → seconds). In
 * that regime dedup exact duplicates FIRST (`groupBy(strCol)`,
 * carry counts), fuzzy-join the distinct strings, and re-expand —
 * same answer, block and pair mass shrink by the duplication factor
 * squared. The sibling cliff: a UNIVERSAL affix ("-doc", ".html",
 * "https://www.") that swallows a whole segment makes that segment's
 * block corpus-sized (measured 18 s vs sub-second without it at 5k
 * strings) — strip fixed formatting before joining; the edit
 * distance you want is over the distinguishing part anyway.
 *
 * Pinned semantics: classic unit-cost Levenshtein (Spark's
 * `levenshtein`, identical to DuckDB/Postgres), output one row per
 * unordered pair `(id1 < id2, dist ≤ maxDist)`; null/too-short
 * handling below. Completeness is the PassJoin theorem — the gate
 * verifies it against a literal all-pairs oracle.
 *
 * Scale posture: the indexed side emits `k+1` segments per string;
 * the probe side emits ≤ `(k+1)·(2k+1)²` substrings per string —
 * small constants, so the join input is O(n), and the equi-join keys
 * on (i, l, substring) — hot keys only where many strings genuinely
 * share segment content (real near-dup mass). Verification is
 * per-candidate, never per-pair-of-corpus. Strings shorter than
 * `maxDist + 1` cannot be segmented; they join against everything
 * within `±maxDist` length through a tiny broadcast block (their
 * count is bounded by the alphabet — document corpora have
 * essentially none).
 */
object Fuzzy {

  /**
   * All unordered pairs of `df` rows whose `strCol` values are within
   * Levenshtein distance `maxDist`. Output: (id1, id2, dist). Null
   * strings never match; identical ids never pair with themselves.
   */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist
    val base = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        length(col(strCol)).as("__l"))
      .localCheckpoint(false)
    val long = base.filter(col("__l") >= k + 1)
    val short = base.filter(col("__l") <= k)

    // ---- indexed side: the k+1 segments of each string ----
    // segment lengths differ by <= 1: first (k+1-r) of length q, rest q+1
    val q = ((col("__l") - pmod(col("__l"), lit(k + 1))) / (k + 1)).cast("int")
    val r = pmod(col("__l"), lit(k + 1)).cast("int")
    def segStart(i: org.apache.spark.sql.Column) =
      i * q + greatest(lit(0), i - (lit(k + 1) - r))
    def segLen(i: org.apache.spark.sql.Column) =
      q + when(i >= lit(k + 1) - r, 1).otherwise(0)
    val indexed = long
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
      .withColumn("__seg",
        col("__s").substr(segStart(col("__i")) + 1, segLen(col("__i"))))
      .filter(length(col("__seg")) >= 1)
      .select(col("__id").as("__ida"), col("__s").as("__sa"),
        col("__i"), col("__l").as("__la"), col("__seg").as("__sub"))

    // ---- probe side: for each partner length l in [m-k, m+k] and
    //      segment index i, every substring of that segment's length
    //      within the +-k position window ----
    val probe0 = long
      .withColumnRenamed("__l", "__m")
      .withColumn("__la", explode(sequence(
        greatest(lit(k + 1), col("__m") - k), col("__m") + k)))
      .withColumn("__i", explode(sequence(lit(0), lit(k))))
    val ql = ((col("__la") - pmod(col("__la"), lit(k + 1))) / (k + 1)).cast("int")
    val rl = pmod(col("__la"), lit(k + 1)).cast("int")
    val pl = col("__i") * ql +
      greatest(lit(0), col("__i") - (lit(k + 1) - rl))
    val wl = ql + when(col("__i") >= lit(k + 1) - rl, 1).otherwise(0)
    val probe = probe0
      .withColumn("__w", wl)
      .withColumn("__jlo", greatest(lit(0), pl - k))
      .withColumn("__jhi", least(col("__m") - col("__w"), pl + k))
      .filter(col("__w") >= 1 && col("__jhi") >= col("__jlo"))
      .withColumn("__j", explode(sequence(col("__jlo"), col("__jhi"))))
      .select(col("__id").as("__idb"), col("__s").as("__sb"),
        col("__i"), col("__la"),
        col("__s").substr(col("__j") + 1, col("__w")).as("__sub"))

    val longPairs = indexed.join(probe, Seq("__i", "__la", "__sub"))
      .filter(col("__ida") =!= col("__idb"))
      .select(least(col("__ida"), col("__idb")).as("id1"),
        greatest(col("__ida"), col("__idb")).as("id2"),
        when(col("__ida") < col("__idb"), col("__sa")).otherwise(col("__sb")).as("__s1"),
        when(col("__ida") < col("__idb"), col("__sb")).otherwise(col("__sa")).as("__s2"))
      .distinct()

    // ---- short strings: cannot be segmented; broadcast against all
    //      partners within +-k length (tiny side by construction) ----
    val shortPairs = broadcast(short.select(col("__id").as("__ida"),
        col("__s").as("__sa"), col("__l").as("__la")))
      .join(base.select(col("__id").as("__idb"), col("__s").as("__sb"),
        col("__l").as("__lb")),
        abs(col("__la") - col("__lb")) <= k && col("__ida") =!= col("__idb"))
      .select(least(col("__ida"), col("__idb")).as("id1"),
        greatest(col("__ida"), col("__idb")).as("id2"),
        when(col("__ida") < col("__idb"), col("__sa")).otherwise(col("__sb")).as("__s1"),
        when(col("__ida") < col("__idb"), col("__sb")).otherwise(col("__sa")).as("__s2"))
      .distinct()

    longPairs.unionByName(shortPairs).distinct()
      .withColumn("dist", levenshtein(col("__s1"), col("__s2")))
      .filter(col("dist") <= k)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
