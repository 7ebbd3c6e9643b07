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

  /**
   * T5-style span corruption: contiguous token SPANS are replaced by
   * consecutive sentinels `<extra_id_k>`, and the target sequence
   * interleaves each sentinel with the tokens it swallowed — the
   * denoising-objective example generator.
   *
   * Deterministic span placement without sequential state: positions
   * partition into fixed BLOCKS of `blockSize`; block `b` of a
   * document is corrupted iff `md5i(id ++ "_b" ++ b ++ salt) mod
   * denom == 0` (expected span rate `1/denom` per block), and a
   * corrupted block's first `spanLen` tokens form the span. Blocks
   * are disjoint, so spans never overlap or merge — the property the
   * classic sequential sampler needs a scan for. Sentinel numbering
   * is consecutive in position order (`k` = corrupted blocks before
   * this one), computed as a per-block prefix count over the block
   * index array (O(blocks²) per document — fine for document-sized
   * inputs).
   *
   * Output per input row: (`idCol`, n_tokens, n_spans,
   * corrupted_text, targets) — flat strings, one corrupted example
   * per document; a document with no tokens emits (0, 0, "", "").
   *
   * Scale posture: a single shuffle-free scan; every choice is a
   * per-row hash expression.
   */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  blockSize: Int = 10, spanLen: Int = 3, denom: Int = 3,
                  salt: String = "sc1"): DataFrame = {
    require(blockSize >= 1 && spanLen >= 1 && spanLen <= blockSize,
      s"need 1 <= spanLen <= blockSize, got $spanLen/$blockSize")
    require(denom >= 2, s"denom must be >= 2, got $denom")
    import org.apache.spark.sql.Column
    val toks = TextAnalysis.cleanTokens(coalesce(col(textCol), lit("")))
    val zipped = zip_with(toks,
      sequence(lit(0), greatest(size(toks) - 1, lit(0))),
      (t, i) => struct(t.as("t"), i.as("i")))
    def hit(b: Column) =
      pmod(TextAnalysis.md5i(concat(col(idCol).cast("string"), lit("_b"),
        b.cast("string"), lit("_"), lit(salt))), lit(denom)) === 0
    // exact int block index (Column./ is double division; the values
    // are small ints, so the truncating cast is exact)
    def blk(i: Column) =
      ((i - pmod(i, lit(blockSize))) / lit(blockSize)).cast("int")
    // hash each block ONCE per row (not once per position×predicate):
    // __h = per-block corruption flags, __p = prefix counts (the
    // consecutive sentinel ids)
    val nBlocks = floor((size(col("__z")) + lit(blockSize - 1)) /
      lit(blockSize)).cast("int")
    def corrupt(i: Column) =
      element_at(col("__h"), blk(i) + 1) && pmod(i, lit(blockSize)) < spanLen
    def spanStart(i: Column) =
      element_at(col("__h"), blk(i) + 1) && pmod(i, lit(blockSize)) === 0
    def sentinel(i: Column) =
      concat(lit("<extra_id_"),
        element_at(col("__p"), blk(i) + 1).cast("string"), lit(">"))
    df.select(col(idCol),
        when(size(toks) === 0, array().cast("array<struct<t:string,i:int>>"))
          .otherwise(zipped).as("__z"))
      .withColumn("__h",
        when(size(col("__z")) === 0, array().cast("array<boolean>"))
          .otherwise(transform(sequence(lit(0), nBlocks - 1), b => hit(b))))
      .withColumn("__p",
        when(size(col("__h")) === 0, array().cast("array<int>"))
          .otherwise(transform(sequence(lit(1), size(col("__h"))), b =>
            when(b === 1, lit(0)).otherwise(
              aggregate(slice(col("__h"), lit(1), b - 1), lit(0),
                (acc, h) => acc + when(h, 1).otherwise(0))))))
      .select(col(idCol),
        size(col("__z")).cast("long").as("n_tokens"),
        size(filter(col("__z"), z => spanStart(z.getField("i"))))
          .cast("long").as("n_spans"),
        concat_ws(" ", transform(
          filter(col("__z"), z => !corrupt(z.getField("i")) ||
            spanStart(z.getField("i"))),
          z => when(spanStart(z.getField("i")), sentinel(z.getField("i")))
            .otherwise(z.getField("t")))).as("corrupted_text"),
        concat_ws(" ", transform(
          filter(col("__z"), z => corrupt(z.getField("i"))),
          z => when(spanStart(z.getField("i")),
            concat(sentinel(z.getField("i")), lit(" "), z.getField("t")))
            .otherwise(z.getField("t")))).as("targets"))
  }
}
