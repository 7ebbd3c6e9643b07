package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Direct tests for public kernel entry points that the gate suite
 * exercises only TRANSITIVELY (each is called by a gated operator —
 * binByEdges by Quality's histogram, docFrequencies by tfIdf,
 * trainFromFreqs by Bpe.train, norm by cosine paths, sim/dist/parse
 * by their codegen expressions' generated Java). The hardened
 * operator scan (scripts/selfcheck.py, round-15) requires a
 * CALL-SHAPED direct reference per public def — these are them, and
 * each pins behavior the transitive gates would mask on regression:
 * the eval kernels here are the SAME methods the generated code
 * invokes through addReferenceObj, so a hand value pinned here covers
 * both interpreter and codegen arms.
 */
class KernelSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("GroupBy.binByEdges labels by sorted edge array; null passes through") {
    val df = Seq(Some(5.0), Some(15.0), Some(25.0), None).toDF("v")
    val edges = Seq(Seq(10.0, 20.0)).toDF("__edges")
    val out = graft.agg.GroupBy.binByEdges(df, "v", edges)
      .select("v", "bin").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(out == Set(
      (Some(5.0), Some(1)), (Some(15.0), Some(2)),
      (Some(25.0), Some(3)), (None, None)))
  }

  test("TextAnalysis.docFrequencies counts docs per term, -1 tf sentinel excluded") {
    val tf = Seq(("a", "t1", 3L), ("b", "t1", 1L), ("b", "t2", 2L),
      ("c", "t2", -1L)).toDF("doc", "term", "tf")
    val out = graft.llm.TextAnalysis.docFrequencies(tf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("t1" -> 2L, "t2" -> 1L))
  }

  test("Bpe.trainFromFreqs is invariant to input order and matches train") {
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val a = graft.functions.Bpe.trainFromFreqs(freqs, 8)
    val b = graft.functions.Bpe.trainFromFreqs(freqs.reverse, 8)
    assert(a.merges == b.merges)
    val viaTrain = graft.functions.Bpe.train(
      freqs.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }, 8)
    assert(a.merges == viaTrain.merges)
  }

  test("Similarity.norm is the L2 norm of an array column") {
    val df = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0)).toDF("v")
    val out = df.select(graft.llm.Similarity.norm(col("v")).as("n"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(5.0, 0.0))
  }

  test("JaroWinklerExpr.sim eval kernel: pinned hand values") {
    val e = graft.functions.JaroWinklerExpr(Literal("a"), Literal("b"))
    def s(x: String, y: String) =
      e.sim(UTF8String.fromString(x), UTF8String.fromString(y))
    assert(math.abs(s("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(s("abc", "abc") == 1.0)
    assert(s("abc", "xyz") == 0.0)
  }

  test("DamerauLevenshteinExpr.dist eval kernel: unrestricted + byte-level") {
    val e = graft.functions.DamerauLevenshteinExpr(Literal("a"), Literal("b"))
    def d(x: String, y: String) =
      e.dist(UTF8String.fromString(x), UTF8String.fromString(y))
    // unrestricted DL: "CA"→"ABC" = 2 (OSA would give 3)
    assert(d("CA", "ABC") == 2L)
    // byte granularity: é is two UTF-8 bytes, so one substitution
    // at codepoint level is two byte edits
    assert(d("héllo", "hello") == 2L)
    assert(d("", "abc") == 3L)
  }

  test("TryToInt/TryToLong.parse kernel: in-range parses, junk and overflow null") {
    val i = graft.functions.TryToInt(Literal("x"))
    assert(i.parse(UTF8String.fromString("42")) == 42)
    assert(i.parse(UTF8String.fromString("-7")) == -7)
    assert(i.parse(UTF8String.fromString("9999999999")) == null)
    assert(i.parse(UTF8String.fromString("abc")) == null)
    val l = graft.functions.TryToLong(Literal("x"))
    assert(l.parse(UTF8String.fromString("9999999999")) == 9999999999L)
    assert(l.parse(UTF8String.fromString("1e3")) == null)
  }

  test("NgramCharsExpr.chars kernel: top-run chars and duplicated-gram chars") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(ts: String*) = new GenericArrayData(
      ts.map(UTF8String.fromString).toArray[Any])
    // tokens a b a b a → 2-grams "a b","b a","a b","b a" (sorted:
    // two runs of 2); top = run 2 × numChars("a b") = 6
    val top = graft.functions.NgramCharsExpr(Literal("x"), 2, dup = false)
    assert(top.chars(arr("a", "b", "a", "b", "a")) == 6L)
    // dup: each run-2 gram adds 2×len → 6 + 6 = 12
    val dup = graft.functions.NgramCharsExpr(Literal("x"), 2, dup = true)
    assert(dup.chars(arr("a", "b", "a", "b", "a")) == 12L)
    // fewer tokens than n → 0, not an exception
    assert(top.chars(arr("a")) == 0L)
  }

  test("DeflateRatioExpr.ratio kernel: repetitive text compresses, empty is null, deterministic") {
    val e = graft.functions.DeflateRatioExpr(Literal("x"))
    val rep = e.ratio(UTF8String.fromString("ab" * 200))
    assert(rep != null && rep.asInstanceOf[Double] > 0.0 &&
      rep.asInstanceOf[Double] < 0.2)
    val prose = e.ratio(UTF8String.fromString(
      "The quick brown fox jumps over the lazy dog near the river bank."))
    assert(prose.asInstanceOf[Double] > rep.asInstanceOf[Double])
    assert(e.ratio(UTF8String.fromString("")) == null)
    // pinned level-6 raw stream ⇒ same value every call/JVM
    assert(e.ratio(UTF8String.fromString("ab" * 200)) == rep)
  }
}
