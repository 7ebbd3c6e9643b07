package graft.join

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/**
 * Bloom-pruned semi/anti joins — the 100 TB pattern for joining a huge
 * fact side against a key set that is too large to broadcast but whose
 * MEMBERSHIP fits a few megabytes of bits. The reference filters row
 * streams one record at a time (goetl `dag/tasks/filter.go`); at scale
 * the equivalent "is this key in the seen set" check must avoid
 * shuffling the fact table, which is exactly what a Bloom prefilter
 * buys:
 *
 *   - [[semiJoin]]: rows that fail the filter are DEFINITELY not in
 *     the key set (no false negatives) and are dropped before the
 *     shuffle; only might-contain candidates (true matches + the fpp
 *     tail) reach the exact semi join.
 *   - [[antiJoin]]: rows that fail the filter are definitely new and
 *     bypass the join entirely; only candidates shuffle into the
 *     exact anti join. With a 1% fpp, ~99% of a mostly-new corpus
 *     never shuffles at all — the incremental-ingest dedup shape
 *     ([[graft.llm.Dedup.newAgainstSeen]]) at cluster scale.
 *
 * Both forms return EXACTLY the plain semi/anti join result: the Bloom
 * stage only prunes, the residual join decides. False positives cost
 * shuffle volume, never correctness; the fpp/bits trade is a pure
 * performance knob.
 *
 * Implementation: Spark's own runtime-row-filter kernels —
 * `BloomFilterAggregate` builds the filter distributed (partial
 * filters merged via OR), `BloomFilterMightContain` probes it inside
 * whole-stage codegen. Both sides key on `xxhash64(keys...)`, the
 * combination the kernels are built for (the probe takes a LONG).
 * The serialized filter collects to the driver (one binary cell —
 * `optimalNumOfBits(items, fpp)/8` bytes, ~1.2 MB per million keys at
 * 1% fpp) and ships to executors as a literal, like any broadcast
 * bound. NOTE: the aggregate clamps to
 * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
 * (defaults 4M items / 8MB bits) — raise them for bigger key sets;
 * a clamped filter only raises the false-positive rate.
 */
object Bloom {

  /** The shared probe key: one 64-bit hash over the key columns.
   *  Null keys hash like any value; rows carrying them are settled by
   *  the residual join (SQL equi-join semantics: null never matches). */
  private def keyHash(keys: Seq[String]): Column =
    xxhash64(keys.map(col): _*)

  /**
   * Build a serialized Bloom filter over `xxhash64(keys...)` of `df`.
   * One distributed aggregate job; the driver holds only the bits.
   * `expectedItems` is a sizing estimate — overestimating wastes bits,
   * underestimating raises the false-positive rate; neither affects
   * join correctness. Returns None for an empty/degenerate input
   * (callers treat that as "filter matches nothing").
   */
  def buildFilter(df: DataFrame, keys: Seq[String],
                  expectedItems: Long, fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp out of (0,1): $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftShims.expression(keyHash(keys)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = df.select(GraftShims.column(agg)).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** `might_contain(filter, xxhash64(keys...))` as a codegen'd Column
   *  predicate — true for every key present when the filter was built,
   *  plus an fpp-bounded false-positive tail. */
  def mightContain(filterBytes: Array[Byte], keys: Seq[String]): Column =
    GraftShims.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      GraftShims.expression(keyHash(keys))))

  /**
   * Exact left-semi join with a Bloom prefilter on the left: rows
   * whose key hash fails the filter cannot match and never shuffle.
   * Result is identical to `left SEMI JOIN right ON keys`.
   */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               expectedItems: Long, fpp: Double = 0.01): DataFrame =
    buildFilter(right, keys, expectedItems, fpp) match {
      case None        => left.limit(0)  // empty build side: semi join is empty
      case Some(bytes) =>
        left.filter(mightContain(bytes, keys)).join(right, keys, "left_semi")
          // using-join moves key columns first; restore the left order
          .select(left.columns.map(col).toIndexedSeq: _*)
    }

  /**
   * Exact left-anti join with a Bloom split on the left: filter
   * misses are DEFINITELY absent from `right` and bypass the join;
   * only might-contain candidates run the exact anti join. The two
   * branches scan `left` twice (both scans keep pushdown) — at scale
   * two columnar scans are far cheaper than shuffling the full left
   * side, which is what the plain anti join does. Result is identical
   * to `left ANTI JOIN right ON keys`.
   *
   * `left` MUST be deterministic (the two branches re-evaluate it
   * independently — a `sample`/`rand()`-derived frame could drop rows
   * from both branches or land in both; cache or `localCheckpoint`
   * such inputs first). Every graft operator upstream of this one is
   * deterministic by design.
   */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               expectedItems: Long, fpp: Double = 0.01): DataFrame =
    buildFilter(right, keys, expectedItems, fpp) match {
      case None        => left  // empty build side: anti join keeps everything
      case Some(bytes) =>
        val might = mightContain(bytes, keys)
        val definitelyNew = left.filter(!might)
        val candidates    = left.filter(might).join(right, keys, "left_anti")
        definitelyNew.unionByName(candidates)
          .select(left.columns.map(col).toIndexedSeq: _*)
    }
}
