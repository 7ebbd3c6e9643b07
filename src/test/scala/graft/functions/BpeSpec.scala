package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Bpe.BpeVocab

/** Byte-level BPE: hand-verified tokenizations against known merge
 *  tables, plus roundtrip/determinism/monotonicity properties over
 *  arbitrary unicode input (seeded ScalaCheck generators, no flake). */
class BpeSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("known tokenization: hand-built merge table applies in rank order") {
    // alphabet here is plain ASCII so symbols are the chars themselves
    val vocab = BpeVocab(Vector(("l", "o"), ("lo", "w"), ("e", "r")))
    // "low" -> l o w -> [lo] w -> [low]
    assert(Bpe.encode("low", vocab) == Vector("low"))
    // "lower" -> l o w e r -> [lo] w e r -> [low] e r -> low [er]
    assert(Bpe.encode("lower", vocab) == Vector("low", "er"))
    // no applicable merges: stays one symbol per byte
    assert(Bpe.encode("wd", vocab) == Vector("w", "d"))
  }

  test("known tokenization: merge RANK wins over position") {
    // both ("b","c") and ("a","b") occur in "abc"; ("b","c") has the
    // lower rank so it must merge FIRST, blocking ("a","b")
    val vocab = BpeVocab(Vector(("b", "c"), ("a", "b")))
    assert(Bpe.encode("abc", vocab) == Vector("a", "bc"))
    // opposite ranks: ("a","b") first
    val vocab2 = BpeVocab(Vector(("a", "b"), ("b", "c")))
    assert(Bpe.encode("abc", vocab2) == Vector("ab", "c"))
  }

  test("pre-tokenizer: contractions split, spaces attach to the following word") {
    val empty = BpeVocab(Vector.empty)
    // with no merges each token is its byte symbols; count = bytes
    assert(Bpe.encode("it's", empty).mkString == "it's")
    // leading-space attachment: " world" is one pre-token, so a merge
    // of (space-mapped-char, 'w') can apply across the boundary
    val spaceChar = "Ġ" // 0x20 maps to U+0120 in the GPT-2 byte table
    val vocab = BpeVocab(Vector((spaceChar, "w")))
    assert(Bpe.encode("hello world", vocab).contains(spaceChar + "w"))
  }

  test("training learns the most frequent pair first, ties break lexicographically") {
    // "aa" appears 3x within words of corpus; "ab" twice
    val v = Bpe.train(Seq("aaa aaa ab ab"), 2)
    assert(v.merges.head == ("a", "a"))
    // trained vocab tokenizes its own corpus words compactly
    assert(Bpe.encode("aaa", v).length < 3)
  }

  test("roundtrip: decode(encode(s)) == s for arbitrary unicode, any vocab") {
    val texts = samples(Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\n', '\t', 'é', 'ß', '中', '†')))
      .map(_.mkString), 25) :+ "emoji \ud83c\udf89 survives surrogate pairs"
    val vocabs = Seq(BpeVocab(Vector.empty), Bpe.DefaultVocab,
      Bpe.train(texts, 50))
    for (t <- texts; v <- vocabs) {
      assert(Bpe.decode(Bpe.encode(t, v)) == t, s"roundtrip failed for ${t.take(40)}")
    }
  }

  test("token count: bounded by byte count, shrinks monotonically with more merges") {
    val texts = samples(Gen.listOfN(60, Gen.oneOf(
      Gen.alphaLowerChar, Gen.const(' '))).map(_.mkString), 15)
    val full = Bpe.train(texts, 200)
    for (t <- texts) {
      val bytes = t.getBytes("UTF-8").length
      val steps = Seq(0, 10, 50, 200).map(k =>
        Bpe.tokenCount(t, BpeVocab(full.merges.take(k))))
      assert(steps.head == bytes.toLong) // zero merges = one token per byte
      assert(steps.zip(steps.tail).forall { case (a, b) => b <= a },
        s"counts must shrink with merges: $steps")
    }
  }

  test("default vocab is deterministic and compresses English") {
    // training stops early when no pair repeats, so <= the requested
    // 256 merges — but well past a hundred on the embedded sample
    assert(Bpe.DefaultVocab.merges.length > 100 &&
      Bpe.DefaultVocab.merges.length <= 256)
    // retraining from the same embedded text gives the identical table
    assert(Bpe.train(Seq(Bpe.SampleText), 256) == Bpe.DefaultVocab)
    val t = "the tokens become batches that fill a context window"
    assert(Bpe.tokenCount(t, Bpe.DefaultVocab) < t.getBytes("UTF-8").length / 2)
  }

  test("null and empty are safe") {
    assert(Bpe.encode(null, Bpe.DefaultVocab).isEmpty)
    assert(Bpe.encode("", Bpe.DefaultVocab).isEmpty)
    assert(Bpe.tokenCount("", Bpe.DefaultVocab) == 0L)
  }

  test("distributed UDF application equals sequential driver-side encoding") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = samples(Gen.listOfN(30, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', 'é'))).map(_.mkString), 20) :+ ""
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(4)
    val got = graft.llm.TextAnalysis.bpeTokenCountExact(col("text"))
    val rows = df.select(col("id"), got.as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i.toLong) == Bpe.tokenCount(t, Bpe.DefaultVocab))
    }
  }

  test("sequence packing driven by REAL BPE counts: budgets and totals conserve") {
    // the integration the tokenizer exists for — trustworthy token
    // budgets feeding packSequences (same contract the q96 gate checks
    // with whitespace counts)
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the engine reads records from many sources"),
      (2L, "the text becomes tokens and the tokens become batches"),
      (3L, "count what you must skip what you can"),
      (4L, "shards of nearly equal size feed the trainers"),
      (5L, "x")).toDF("doc_id", "text")
      .withColumn("grp", org.apache.spark.sql.functions.lit("g"))
      .withColumn("n_tokens",
        graft.llm.TextAnalysis.bpeTokenCountExact(col("text")))
    val budget = 12L
    val packed = graft.llm.Sampling.packSequences(docs, Seq("grp"),
      orderCol = "doc_id", tokenCol = "n_tokens", textCol = "text",
      budget = budget).collect()
    val expectTotal = docs.select(org.apache.spark.sql.functions
      .sum("n_tokens")).collect()(0).getLong(0)
    assert(packed.map(_.getAs[Long]("seq_tokens")).sum == expectTotal)
    assert(packed.map(_.getAs[Long]("n_docs")).sum == 5L)
    // every shard except possibly the last stays within budget + one doc
    val maxDoc = docs.select(org.apache.spark.sql.functions
      .max("n_tokens")).collect()(0).getLong(0)
    assert(packed.forall(_.getAs[Long]("seq_tokens") <= budget + maxDoc))
  }
}
