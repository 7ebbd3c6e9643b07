package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * BPE at REALISTIC vocab scale: the default embedded vocab (~250
 * merges from 1 KB of prose) is fine for out-of-the-box token counts,
 * but real tokenizers carry 30k–100k merges and the per-token merge
 * loop is rank-map-driven — a toy vocab can hide encode hot spots.
 * The fixture corpus cannot feed this (31 distinct words: merges
 * exhaust once every word is a single token), so the corpus here is a
 * deterministic seeded synthetic: ~8k distinct syllable-composed words
 * under a Zipf-ish frequency law — enough shared-substring structure
 * to learn well past 5k merges, reproducible run over run.
 */
class BpeScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic Zipf-ish corpus: word i appears ~N/(i+1) times. */
  private lazy val corpusWords: Vector[String] = {
    val syll = Vector("ka", "to", "mi", "ren", "va", "shu", "pel", "or",
      "an", "da", "qu", "ix", "lo", "ber", "tan", "ce", "ul", "fra",
      "nim", "os", "ze", "wick", "ja", "pho", "gry", "eth", "mond",
      "ba", "tri", "xu")
    val rnd = new scala.util.Random(20260813L)
    val distinct = Vector.fill(16000) {
      (0 until (2 + rnd.nextInt(4))).map(_ => syll(rnd.nextInt(syll.size))).mkString
    }
    distinct.zipWithIndex.flatMap { case (w, i) =>
      Vector.fill(math.max(1, 8000 / (i + 1)))(w)
    }
  }
  private lazy val docs: Vector[String] = {
    // shuffle deterministically into ~120-word documents
    val rnd = new scala.util.Random(7L)
    rnd.shuffle(corpusWords).grouped(120).map(_.mkString(" ")).toVector
  }
  private lazy val bigVocab: Bpe.BpeVocab = Bpe.train(docs, 5000)

  test("training reaches 5k merges and is deterministic") {
    assert(bigVocab.merges.length == 5000,
      s"early stop at ${bigVocab.merges.length} merges — corpus too small")
    // a second training run must reproduce the identical merges table
    // (the arg-max scan must not depend on hash-map iteration order)
    val again = Bpe.train(docs, 5000)
    assert(again.merges == bigVocab.merges)
  }

  test("incremental trainer matches the from-scratch recount on a prefix") {
    // reference recount implementation (the pre-round-7 algorithm),
    // kept here as the oracle for the incremental pair maintenance
    def naiveTrain(corpus: Seq[String], numMerges: Int): Vector[(String, String)] = {
      var words: Map[Vector[String], Long] = corpus
        .flatMap(t => Bpe.preTokens(t)).groupBy(identity)
        .map { case (w, occ) =>
          w.getBytes("UTF-8").map(b => Bpe.byteToChar(b & 0xff).toString).toVector ->
            occ.size.toLong }
      val merges = Vector.newBuilder[(String, String)]
      var n = 0
      var done = false
      while (n < numMerges && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (w, c) =>
          (0 until w.length - 1).foreach { i =>
            pc.update((w(i), w(i + 1)), pc.getOrElse((w(i), w(i + 1)), 0L) + c) }
        }
        val cands = pc.filter(_._2 >= 2)
        if (cands.isEmpty) done = true
        else {
          val p @ (p1, p2) = cands.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          merges += p
          words = words.map { case (w, c) =>
            val buf = Vector.newBuilder[String]
            var i = 0
            while (i < w.length) {
              if (i < w.length - 1 && w(i) == p1 && w(i + 1) == p2) { buf += p1 + p2; i += 2 }
              else { buf += w(i); i += 1 }
            }
            (buf.result(), c)
          }
          n += 1
        }
      }
      merges.result()
    }
    val sample = docs.take(8)
    assert(Bpe.train(sample, 200).merges == naiveTrain(sample, 200))
  }

  test("5k-merge encode: roundtrip, fixpoint, and expression-path agreement") {
    val probe = docs.take(20) :+ "café ångström 😀 tabs\tand\nnewlines  "
    probe.foreach { d =>
      val toks = Bpe.encode(d, bigVocab)
      assert(Bpe.decode(toks) == d) // byte-level roundtrip at 5k merges
    }
    // fixpoint: no adjacent output pair within a pre-token still holds
    // a merge rank (otherwise the merge loop exited early)
    Bpe.preTokens(probe.head).foreach { w =>
      val toks = Bpe.encode(w, bigVocab)
      toks.sliding(2).filter(_.size == 2).foreach { p =>
        assert(!bigVocab.rank.contains((p(0), p(1))), s"unmerged pair $p in '$w'")
      }
    }
    // the codegen expression path must agree with plain-Scala encode
    import spark.implicits._
    val df = probe.toDF("text")
    val viaExpr = df.select(
      graft.llm.TextAnalysis.bpeTokenCountExact(col("text"), bigVocab).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == probe.map(Bpe.tokenCount(_, bigVocab)))
  }

  test("distributed corpus training reproduces local training exactly") {
    import spark.implicits._
    // same documents, split across partitions — the distributed
    // word-frequency aggregation + driver merge loop must yield the
    // IDENTICAL merges table as local end-to-end training (order
    // invariance of trainFromFreqs + exact distributed counting)
    val sample = docs.take(40)
    val local = Bpe.train(sample, 400)
    val distributed = graft.llm.TextAnalysis.bpeTrainFromCorpus(
      sample.toDF("text").repartition(7), "text", 400)
    assert(distributed.merges == local.merges)
    // the maxWords cap keeps determinism (freq desc, word asc): a
    // capped table is a deterministic function of the corpus too
    val capped = graft.llm.TextAnalysis.bpeTrainFromCorpus(
      sample.toDF("text").repartition(3), "text", 400, maxWords = 500)
    val capped2 = graft.llm.TextAnalysis.bpeTrainFromCorpus(
      sample.toDF("text").repartition(11), "text", 400, maxWords = 500)
    assert(capped.merges == capped2.merges)
  }

  test("encode throughput at 5k merges is recorded (cold + memoized)") {
    val text = docs.take(50)
    val bytes = text.map(_.length.toLong).sum
    // COLD: fresh vocab instance — empty memo, every word runs the
    // merge loop (the adversarial all-unique-words floor)
    val cold = Bpe.BpeVocab(bigVocab.merges)
    Bpe.tokenCount(text.head, cold) // JIT + lazy rank map, one doc
    cold.encodeCache.clear()
    val t0 = System.nanoTime()
    val tokens = text.map(Bpe.tokenCount(_, cold)).sum
    val coldSec = (System.nanoTime() - t0) / 1e9
    // WARM: Zipf text re-encoded via the memo — the steady state on
    // natural corpora
    val t1 = System.nanoTime()
    val tokens2 = text.map(Bpe.tokenCount(_, cold)).sum
    val warmSec = (System.nanoTime() - t1) / 1e9
    assert(tokens == tokens2) // memoization must not change results
    info(f"encode @5k merges/core: cold ${bytes / 1e6 / coldSec}%.1f MB/s, " +
      f"memoized ${bytes / 1e6 / warmSec}%.1f MB/s (${tokens} tokens)")
    assert(tokens > 0 && coldSec < 60.0)
  }
}
