package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic training-sample augmentation: masked-language-model
 * example generation from raw documents. Everything is a pure Column
 * expression over the document row (no shuffle, embarrassingly
 * parallel) and every "random" choice is an md5 hash of
 * (doc id, position, salt) — the same examples on every run, engine,
 * partitioning, and cluster size, so an external oracle replays them
 * and an interrupted pipeline resumes without drift.
 */
object Augment {

  /**
   * BERT-style MLM masking: token `i` of a document is masked iff
   * `md5i(id ++ "_" ++ i ++ "_" ++ salt) mod denom == 0` (expected
   * mask rate `1/denom`). Returns one row per input document:
   *
   *  - `masked_text` — tokens with masked positions replaced by
   *    `maskToken`, space-joined;
   *  - `targets` — the masked originals as `pos:token`, space-joined
   *    in position order (0-based over NON-EMPTY tokens);
   *  - `n_tokens`, `n_masked`.
   *
   * Documents with no tokens emit (empty text, empty targets, 0, 0).
   * The label layout is flat strings (not arrays) so downstream
   * tokenizer pipelines and the correctness oracle consume the exact
   * same bytes.
   */
  def mlmMask(df: DataFrame, idCol: String, textCol: String,
              denom: Int = 7, maskToken: String = "<mask>",
              salt: String = "mlm1"): DataFrame = {
    require(denom >= 2, s"denom must be >= 2, got $denom")
    val toks = TextAnalysis.cleanTokens(coalesce(col(textCol), lit("")))
    // (token, 0-based pos) pairs; the hash decides per position
    val zipped = zip_with(toks,
      sequence(lit(0), greatest(size(toks) - 1, lit(0))),
      (t, i) => struct(t.as("t"), i.as("i")))
    def hit(i: org.apache.spark.sql.Column) =
      pmod(TextAnalysis.md5i(concat(col(idCol).cast("string"), lit("_"),
        i.cast("string"), lit("_"), lit(salt))), lit(denom)) === 0
    df.select(col(idCol),
        when(size(toks) === 0, array().cast("array<struct<t:string,i:int>>"))
          .otherwise(zipped).as("__z"))
      .select(col(idCol),
        size(col("__z")).cast("long").as("n_tokens"),
        concat_ws(" ", transform(col("__z"), z =>
          when(hit(z.getField("i")), lit(maskToken))
            .otherwise(z.getField("t")))).as("masked_text"),
        concat_ws(" ", transform(filter(col("__z"),
            z => hit(z.getField("i"))),
          z => concat(z.getField("i").cast("string"), lit(":"),
            z.getField("t")))).as("targets"),
        size(filter(col("__z"), z => hit(z.getField("i"))))
          .cast("long").as("n_masked"))
  }
}
