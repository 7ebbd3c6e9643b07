package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact monetary allocation: split a per-group total across the
 * group's rows proportionally to a weight column, to the cent, with
 * the LARGEST-REMAINDER rule — the invoice/cost-allocation ETL
 * primitive ("spread the order total over its lines by quantity";
 * "allocate the budget by headcount"). The allocations are integers
 * on the cent grid and sum EXACTLY to the total per group — the
 * property naive `round(total · w/W)` does not have (its per-group
 * drift of ±n/2 cents is the classic reconciliation bug).
 */
object Allocate {

  /**
   * Largest-remainder pro-rata split. For each group: every row gets
   * `floor(T·wᵢ/W)` cents (T = the group's total in cents, W = Σ wᵢ),
   * and the `T − Σ floor(...)` leftover cents go one each to the rows
   * with the largest remainders `(T·wᵢ) mod W`. All integer
   * arithmetic.
   *
   * Determinism contract: remainder ties are broken by `(tieCol ASC,
   * weightCol ASC)`. That chain is a total order whenever `tieCol` is
   * unique within each group; when it is NOT (real ledgers — and the
   * synthetic lineitem fixture — repeat line numbers), rows that still
   * tie agree on group, tie, weight, remainder AND base share, so the
   * OUTPUT MULTISET is deterministic even though row identity isn't —
   * PROVIDED rows equal on `(group, tieCol, weightCol)` are equal on
   * every other column you keep. If they aren't (extra payload columns
   * differ), supply a genuinely unique `tieCol`; otherwise which
   * payload row carries the extra cent is engine/partition-order
   * dependent.
   *
   * Inputs: `totalCol` — the group's total, constant within the
   * group, on a 2-decimal grid (money); `weightCol` — non-negative
   * integer-valued weights. Rows of a group with `W = 0` allocate
   * null (no proportion exists). Output: input columns +
   * `allocated` DECIMAL(18,2).
   *
   * Overflow bound: `T_cents · wᵢ` must fit a long — totals to ~9e16
   * cents (~$9e14) at weight 100, far past any ledger; past that,
   * widen to decimal upstream.
   *
   * Scale posture: one group-keyed exchange carries BOTH window
   * passes (the W/base sums and the remainder rank) and the result —
   * groups are orders/invoices, i.e. small and numerous; nothing
   * global, nothing collected.
   */
  def proRata(df: DataFrame, groupCols: Seq[String], tieCol: String,
              weightCol: String, totalCol: String,
              out: String = "allocated"): DataFrame = {
    require(groupCols.nonEmpty, "proRata needs group columns")
    val wg = Window.partitionBy(groupCols.map(col): _*)
    // cents via round(double·100): float-stored money ("173665.47" →
    // 17366546.999…96·100) lands back on the grid identically in any
    // IEEE engine; exact past 2^53 cents is out of ledger range
    val tc = round(col(totalCol).cast("double") * 100).cast("long")
    val wi = col(weightCol).cast("long")
    val p = tc * col("__w")
    // floor(p / W) as an exact long: strip the remainder, then the
    // (double) division divides exactly-divisible values
    val base = ((p - pmod(p, col("__wsum"))) / col("__wsum")).cast("long")
    val ranked = df
      .withColumn("__w", wi)
      .withColumn("__wsum", sum(col("__w")).over(wg))
      .withColumn("__base", when(col("__wsum") > 0, base))
      .withColumn("__rem", when(col("__wsum") > 0, pmod(p, col("__wsum"))))
      .withColumn("__rk", row_number().over(
        wg.orderBy(col("__rem").desc, col(tieCol).asc, col("__w").asc)))
      .withColumn("__left", tc - sum(col("__base")).over(wg))
    ranked
      .withColumn(out,
        when(col("__wsum") > 0,
          ((col("__base") + when(col("__rk") <= col("__left"), 1L)
            .otherwise(0L)).cast("decimal(18,0)") / 100)
            .cast("decimal(18,2)")))
      .drop("__w", "__wsum", "__base", "__rem", "__rk", "__left")
  }
}
