package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (1 to 40).map(i =>
    (i.toLong, if (i % 4 == 0) "de" else "en", s"doc $i text", (i % 7 + 1).toLong))
    .toDF("id", "lang", "text", "n_tokens")

  test("perKeyLimit keeps the first n per key, deterministically") {
    val out = Sampling.perKeyLimit(corpus, Seq("lang"), "id", 3)
    val byLang = out.collect().groupBy(_.getString(1))
      .map { case (k, rs) => k -> rs.map(_.getLong(0)).sorted.toSeq }
    assert(byLang("de") == Seq(4L, 8L, 12L))
    assert(byLang("en") == Seq(1L, 2L, 3L))
    // idempotent
    assert(Sampling.perKeyLimit(out, Seq("lang"), "id", 3).count() == out.count())
  }

  test("exactKByHash: exactly k rows, equal to the naive global hash sort, heap-planned") {
    val out = Sampling.exactKByHash(corpus, "id", k = 7, salt = "t")
    // plan: TakeOrderedAndProject (partition-local heaps), no global Sort
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val got = out.collect().map(_.getLong(0)).toSet
    assert(got.size == 7)
    val naive = corpus.select(col("id"),
        graft.llm.TextAnalysis.md5i(concat(col("id").cast("string"), lit("t"))).as("h"))
      .collect().sortBy(r => (r.getLong(1), r.getLong(0))).take(7).map(_.getLong(0)).toSet
    assert(got == naive)
    // deterministic across runs; different salt draws a different set
    assert(Sampling.exactKByHash(corpus, "id", 7, "t")
      .collect().map(_.getLong(0)).toSet == got)
    assert(Sampling.exactKByHash(corpus, "id", 7, "u")
      .collect().map(_.getLong(0)).toSet != got)
    // k >= n degrades to the full set; k = 0 to empty
    assert(Sampling.exactKByHash(corpus, "id", 100).count() == 40)
    assert(Sampling.exactKByHash(corpus, "id", 0).count() == 0)
  }

  test("packByTokenBudget: shards fill in order, overshoot at most one doc") {
    val docs = Seq((1L, 400L), (2L, 400L), (3L, 400L), (4L, 100L), (5L, 900L))
      .toDF("id", "toks").withColumn("g", lit("a"))
    val out = Sampling.packByTokenBudget(docs, Seq("g"), "id", "toks", budget = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // cum-before: 0, 400, 800, 1200, 1300 → shards 0,0,0,1,1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
    // groups pack independently
    val two = Sampling.packByTokenBudget(corpus, Seq("lang"), "id", "n_tokens", 10L)
    val firstPerLang = two.filter(col("shard") === 0).groupBy("lang").count().collect()
    assert(firstPerLang.forall(_.getLong(1) > 0))
  }

  test("stratified sampling is deterministic per seed and respects strata") {
    val a = Sampling.stratified(corpus, "lang", Map("en" -> 0.5, "de" -> 1.0), seed = 7)
    val b = Sampling.stratified(corpus, "lang", Map("en" -> 0.5, "de" -> 1.0), seed = 7)
    assert(a.collect().map(_.getLong(0)).toSeq == b.collect().map(_.getLong(0)).toSeq)
    assert(a.filter(col("lang") === "de").count() == 10) // fraction 1.0 keeps all
    // a stratum absent from fractions is dropped
    val onlyDe = Sampling.stratified(corpus, "lang", Map("de" -> 1.0), seed = 7)
    assert(onlyDe.filter(col("lang") === "en").count() == 0)
  }

  test("weightedMix blends sources at their fractions, deterministically") {
    val en = corpus.filter(col("lang") === "en")
    val de = corpus.filter(col("lang") === "de")
    val mix = Sampling.weightedMix(Seq(en -> 1.0, de -> 0.0), seed = 3)
    assert(mix.count() == en.count())
    val m1 = Sampling.weightedMix(Seq(en -> 0.4, de -> 0.8), seed = 3).collect().length
    val m2 = Sampling.weightedMix(Seq(en -> 0.4, de -> 0.8), seed = 3).collect().length
    assert(m1 == m2)
  }

  test("topFractionByScore equals the naive global rank on random data, ties and all") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // many duplicate scores so bucket boundaries and ties are exercised
    val rows = (0L until 500L).map(i => (i, (rnd.nextInt(20) / 10.0)))
    val df = rows.toDF("id", "score")
    for (frac <- Seq(0.0, 0.1, 0.37, 1.0)) {
      val got = Sampling.topFractionByScore(df, "score", "id", frac, buckets = 8)
        .select("id").collect().map(_.getLong(0)).toSet
      val n = math.ceil(frac * 500).toLong
      val naive = df.withColumn("__rn", org.apache.spark.sql.functions.row_number()
          .over(Window.orderBy(col("score").desc, col("id"))))
        .filter(col("__rn") <= n).select("id").collect().map(_.getLong(0)).toSet
      assert(got == naive, s"frac=$frac")
    }
    // null scores never qualify
    val withNull = Seq((1L, Some(0.9)), (2L, None), (3L, Some(0.1)))
      .toDF("id", "score")
    val kept = Sampling.topFractionByScore(withNull, "score", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    // all-tied scores: deterministic id order fills the quota
    val tied = (0L until 10L).map(i => (i, 1.0)).toDF("id", "score")
    val t3 = Sampling.topFractionByScore(tied, "score", "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(t3 == Set(0L, 1L, 2L))
  }

  test("topFractionByScorePerKey equals per-group naive rank; ceil quota per group") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.5), ("en", 3L, 0.5), ("en", 4L, 0.1),
      ("de", 5L, 0.7), ("de", 6L, 0.2),
      ("fr", 7L, 0.3)).toDF("lang", "id", "score")
    val got = Sampling.topFractionByScorePerKey(df, Seq("lang"), "score", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    // en: ceil(0.5*4)=2 -> ids 1,2 (0.5-tie broken by id); de: ceil(1)=1 -> 5;
    // fr: ceil(0.5)=1 -> 7
    assert(got == Set(1L, 2L, 5L, 7L))
  }

  test("packSequences: order preserved, eos-joined, token totals exact") {
    val docs = Seq(
      ("en", 1L, "a a a", 3L), ("en", 2L, "b b", 2L),   // shard 0 (5 <= 6)
      ("en", 3L, "c c c c", 4L),                        // starts at 5 -> shard 0
      ("en", 4L, "d", 1L),                              // starts at 9 -> shard 1
      ("de", 5L, "x", 1L)
    ).toDF("lang", "id", "text", "n_tok")
    val out = Sampling.packSequences(docs, Seq("lang"), "id", "n_tok",
        "text", budget = 6L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("en", 0L)) == ("a a a<eos>b b<eos>c c c c", 9L, 3L))
    assert(out(("en", 1L)) == ("d", 1L, 1L))
    assert(out(("de", 0L)) == ("x", 1L, 1L))
    // repartitioning cannot change the sequences
    val again = Sampling.packSequences(docs.repartition(7), Seq("lang"),
      "id", "n_tok", "text", 6L).collect().toSet
    assert(again == Sampling.packSequences(docs, Seq("lang"), "id",
      "n_tok", "text", 6L).collect().toSet)
    // null text keeps its boundary as an empty segment; counts aligned
    val withNull = Seq(("en", 1L, Some("a"), 1L), ("en", 2L, None, 1L),
      ("en", 3L, Some("c"), 1L)).toDF("lang", "id", "text", "n_tok")
    val r = Sampling.packSequences(withNull, Seq("lang"), "id", "n_tok",
      "text", budget = 10L).head
    assert(r.getString(2) == "a<eos><eos>c" && r.getLong(4) == 3L)
  }

  test("weightedHashSample: deterministic, monotone in rate, nulls/negatives drop") {
    val df = (1L to 500L).map(i =>
      (i, if (i % 50 == 0) None else Some(i % 100 + 1L)))
      .toDF("id", "w")
    val a = Sampling.weightedHashSample(df, "id", "w", baseRate = 0.002, salt = "s")
    val b = Sampling.weightedHashSample(df.repartition(13), "id", "w", 0.002, "s")
    assert(a.collect().toSet == b.collect().toSet) // partition-independent
    val bigger = Sampling.weightedHashSample(df, "id", "w", 0.008, "s")
    val (aIds, bigIds) = (a.select("id").as[Long].collect().toSet,
      bigger.select("id").as[Long].collect().toSet)
    assert(aIds.subsetOf(bigIds)) // same hash, higher rate → superset
    assert(a.filter($"w".isNull).count() == 0)
    val neg = Sampling.weightedHashSample(
      df.withColumn("w", lit(-5.0)), "id", "w", 0.002, "s")
    assert(neg.count() == 0)
    intercept[IllegalArgumentException](
      Sampling.weightedHashSample(df.withColumn("w", lit("x")), "id", "w", 0.1))
  }

  test("temperatureFractions: expectation hits target; waterfilling clamps small strata") {
    val counts = Map("en" -> 1000L, "de" -> 100L, "tiny" -> 10L)
    // alpha 1 = natural: every stratum keeps the same fraction
    val nat = Sampling.temperatureFractions(counts, alpha = 1.0, targetRows = 555)
    assert(nat.values.map(f => math.abs(f - 0.5)).max < 1e-9)
    // alpha 0 = uniform target per stratum: tiny clamps to 1.0 and the
    // surplus waterfills; expectation stays exactly on target
    val uni = Sampling.temperatureFractions(counts, alpha = 0.0, targetRows = 300)
    assert(uni("tiny") == 1.0)
    val expected = counts.map { case (s, n) => uni(s) * n }.sum
    assert(math.abs(expected - 300.0) < 1e-6, s"expected $expected")
    // target >= N keeps everything; target 0 keeps nothing
    assert(Sampling.temperatureFractions(counts, 0.5, 2000L).values.forall(_ == 1.0))
    assert(Sampling.temperatureFractions(counts, 0.5, 0L).values.forall(_ == 0.0))
  }

  test("budgetFractions: weighted token targets, clamping, missing-source under-fill") {
    val totals = Map("web" -> 10000L, "code" -> 5000L, "ref" -> 1000L)
    val fr = Sampling.budgetFractions(totals,
      Map("web" -> 0.7, "code" -> 0.2, "ref" -> 0.1), budgetTokens = 8000L)
    // mirror the operator's exact expression tree (budget·(w/Σw)/total —
    // Σw here is 0.7+0.2+0.1 = 0.9999999999999999, not literal 1.0)
    val ws = Map("web" -> 0.7, "code" -> 0.2, "ref" -> 0.1).values.sum
    def f(w: Double, tot: Long) = 8000.0 * (w / ws) / tot.toDouble
    assert(fr("web") == f(0.7, 10000L))
    assert(fr("code") == f(0.2, 5000L))
    assert(fr("ref") == f(0.1, 1000L))
    // oversubscribed source clamps at 1.0 (all of it)
    assert(Sampling.budgetFractions(totals, Map("ref" -> 1.0), 50000L)("ref") == 1.0)
    // a weighted-but-absent source UNDER-FILLS the budget: the present
    // source still gets only its requested share of the budget
    val part = Sampling.budgetFractions(Map("web" -> 10000L),
      Map("web" -> 0.5, "missing" -> 0.5), budgetTokens = 10000L)
    assert(part == Map("web" -> 0.5))
    // unweighted sources are excluded entirely
    assert(!Sampling.budgetFractions(totals, Map("web" -> 1.0), 100L).contains("code"))
  }

  test("mixtureByTokenBudget: deterministic row set, unweighted strata dropped") {
    val docs = (0 until 300).map { i =>
      (i.toLong, Seq("web", "code", "zh")(i % 3), 10L + i % 5)
    }.toDF("id", "source", "n_tok")
    val w = Map("web" -> 0.8, "code" -> 0.2)
    val a = Sampling.mixtureByTokenBudget(docs, "source", "id", "n_tok",
      w, budgetTokens = 600L, salt = "m1").select("id").as[Long].collect().toSet
    val b = Sampling.mixtureByTokenBudget(docs.repartition(7), "source", "id",
      "n_tok", w, budgetTokens = 600L, salt = "m1")
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)          // content-deterministic
    val srcs = Sampling.mixtureByTokenBudget(docs, "source", "id", "n_tok",
      w, budgetTokens = 600L, salt = "m1")
      .select("source").distinct().as[String].collect().toSet
    assert(!srcs.contains("zh"))           // unweighted source excluded
  }

  test("temperatureRebalance: deterministic sample lands near the target mix") {
    val docs = (1L to 1000L).map(i =>
      (i, if (i <= 800) "en" else if (i <= 950) "de" else "fr"))
      .toDF("id", "lang")
    val out = Sampling.temperatureRebalance(docs, "lang", "id",
      alpha = 0.5, targetRows = 300, salt = "t")
    val n = out.count()
    assert(n > 200 && n < 400, s"total $n far from 300")
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // temperature flattens: fr (50 docs) keeps a far larger share than
    // its natural 5%
    assert(byLang("fr").toDouble / n > 0.10, byLang.toString)
    val again = Sampling.temperatureRebalance(docs.repartition(7), "lang",
      "id", 0.5, 300, "t")
    assert(again.collect().toSet == out.collect().toSet)
  }

  test("splitByCluster: clusters move together, weights roughly honored") {
    val docs = (1L to 200L).toDF("id")
    // pairs chain 1~2, 2~3 (one cluster {1,2,3}) and 10~11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val out = Sampling.splitByCluster(docs, pairs, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    assert(out.count() == 200)           // no rows dropped
    assert(out.columns.toSeq == Seq("id", "split"))
    // every doc of a cluster lands in ONE split
    val bySplit = out.filter($"id".isin(1L, 2L, 3L))
      .select("split").distinct().count()
    assert(bySplit == 1)
    assert(out.filter($"id".isin(10L, 11L))
      .select("split").distinct().count() == 1)
    // all three splits populated at n=200 and deterministic across runs
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val"))
    val again = Sampling.splitByCluster(docs.repartition(7), pairs, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    assert(again.collect().toSet == out.collect().toSet)
  }

  test("splitByCluster: weight validation and single split") {
    val docs = Seq(1L, 2L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    intercept[IllegalArgumentException](
      Sampling.splitByCluster(docs, noPairs, "id", Seq("a" -> 0.5)))
    val all = Sampling.splitByCluster(docs, noPairs, "id", Seq("all" -> 1.0))
    assert(all.select("split").as[String].collect().toSeq == Seq("all", "all"))
  }

  test("stratifiedByHash: partitioning-independent strata, absent strata drop") {
    val corpus = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val a = Sampling.stratifiedByHash(corpus, "lang",
      Map("en" -> 0.5, "de" -> 1.0), "id", salt = "x")
      .collect().map(_.getLong(0)).toSet
    // repartitioned input must select the IDENTICAL row set
    val b = Sampling.stratifiedByHash(corpus.repartition(13), "lang",
      Map("en" -> 0.5, "de" -> 1.0), "id", salt = "x")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.count(_ % 2 == 1) == 100)        // de kept whole
    val enKept = a.count(_ % 2 == 0)
    assert(enKept > 20 && enKept < 80)        // ~half of en
    // absent stratum drops; fraction 0 drops
    val none = Sampling.stratifiedByHash(corpus, "lang",
      Map("en" -> 0.0), "id", salt = "x")
    assert(none.count() == 0)
  }

  test("weightedPriority: weight-proportional, deterministic, per-key exact k") {
    // 200 candidates per key, weights 1 or 100: the heavy 10% should
    // dominate the k=20 sample, and two runs must agree exactly
    val df = (0L until 200L).map(i =>
      (if (i < 100) "x" else "y", i, if (i % 10 == 0) 100.0 else 1.0))
      .toDF("k", "id", "w")
    val take = Sampling.weightedPriority(df, Seq("k"), "id", "w", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(take.size == 40 && take.count(_._1 == "x") == 20)
    val again = Sampling.weightedPriority(df, Seq("k"), "id", "w", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(take == again)
    // only 10 heavy candidates exist per key; every one must be kept
    val heavy = take.count { case (_, id) => id % 10 == 0 }
    assert(heavy == 20, s"heavy weights underrepresented: $heavy/40")
    // zero/null weights never qualify
    val zw = Seq(("x", 1L, 0.0), ("x", 2L, 0.4), ("x", 3L, 1.0))
      .toDF("k", "id", "w")
    val kept = Sampling.weightedPriority(zw, Seq("k"), "id", "w", k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(3L)) // 0.4 rounds to 0 -> excluded
    // null keys never claim slots (Spark sorts nulls FIRST; SQL
    // engines NULLS LAST — exclusion is the only portable reading)
    val nk = Seq(("x", java.lang.Long.valueOf(1L), 1.0),
      ("x", null.asInstanceOf[java.lang.Long], 100.0),
      ("x", java.lang.Long.valueOf(2L), 1.0))
      .toDF("k", "id", "w")
    val nkKept = Sampling.weightedPriority(nk, Seq("k"), "id", "w", k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(nkKept == Set(1L, 2L))
    // and with no stratification keys either
    val nkGlobal = Sampling.weightedPriority(nk, Seq.empty, "id", "w", k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(nkGlobal == Set(1L, 2L))
  }

  test("mlmMask: hash-pinned masks, flat targets, empty docs safe") {
    val df = Seq((7L, "alpha beta gamma delta eps zeta eta theta iota kappa"),
      (8L, ""), (9L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Augment.mlmMask(df, "id", "text", denom = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r7 = out(7L)
    assert(r7.getAs[Long]("n_tokens") == 10L)
    val masked = r7.getAs[String]("masked_text").split(" ")
    val targets = r7.getAs[String]("targets")
    val nMasked = r7.getAs[Long]("n_masked")
    assert(masked.length == 10)
    assert(masked.count(_ == "<mask>") == nMasked)
    // every target re-fills its masked slot to reproduce the original
    val orig = "alpha beta gamma delta eps zeta eta theta iota kappa".split(" ")
    targets.split(" ").filter(_.nonEmpty).foreach { pt =>
      val Array(p, tok) = pt.split(":", 2)
      assert(masked(p.toInt) == "<mask>" && orig(p.toInt) == tok)
    }
    // deterministic across runs
    val again = Augment.mlmMask(df, "id", "text", denom = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("masked_text")).toMap
    assert(again(7L) == r7.getAs[String]("masked_text"))
    assert(out(8L).getAs[Long]("n_tokens") == 0L &&
      out(8L).getAs[String]("targets") == "")
    assert(out(9L).getAs[Long]("n_tokens") == 0L)
  }

  test("spanCorrupt: sentinels consecutive, reconstruction recovers " +
      "the original, empty docs safe") {
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val df = Seq((7L, text), (8L, ""), (9L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Augment.spanCorrupt(df, "id", "text",
      blockSize = 5, spanLen = 2, denom = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r7 = out(7L)
    assert(r7.getAs[Long]("n_tokens") == 23L)
    val nSpans = r7.getAs[Long]("n_spans")
    val corrupted = r7.getAs[String]("corrupted_text").split(" ").toSeq
    val targets = r7.getAs[String]("targets")
    // sentinels appear once each, consecutively numbered, in order
    val sent = corrupted.filter(_.startsWith("<extra_id_"))
    assert(sent == (0 until nSpans.toInt).map(k => s"<extra_id_$k>"))
    // splice the target spans back into the sentinel slots ->
    // the original text, exactly
    val spans = targets.split("<extra_id_\\d+> ").filter(_.nonEmpty)
      .map(_.trim.split(" ").toSeq)
    assert(spans.length == nSpans.toInt)
    val rebuilt = corrupted.flatMap { t =>
      if (t.startsWith("<extra_id_"))
        spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
      else Seq(t)
    }
    assert(rebuilt.mkString(" ") == text)
    // spans bounded by spanLen, deterministic across runs
    assert(spans.forall(_.length <= 2))
    val again = Augment.spanCorrupt(df, "id", "text",
      blockSize = 5, spanLen = 2, denom = 2)
      .collect().map(r => r.getLong(0) ->
        r.getAs[String]("corrupted_text")).toMap
    assert(again(7L) == r7.getAs[String]("corrupted_text"))
    assert(out(8L).getAs[Long]("n_tokens") == 0L &&
      out(8L).getAs[String]("corrupted_text") == "")
    assert(out(9L).getAs[Long]("n_spans") == 0L)
  }

  test("exactSplit: exact floor-boundary counts, disjoint-exhaustive, " +
      "deterministic, per stratum") {
    val df = ((1 to 10).map(i => ("a", i.toLong)) ++
      (11 to 15).map(i => ("b", i.toLong))).toDF("k", "id")
    val splits = Seq("train" -> 0.7, "valid" -> 0.2, "test" -> 0.1)
    val out = Sampling.exactSplit(df, Seq("k"), "id", splits, salt = "s")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[String]("split")))
    assert(out.length == 15) // exhaustive
    def counts(k: String) = out.filter(_._1 == k)
      .groupBy(_._3).view.mapValues(_.length).toMap
    // n=10: thresholds floor(0.7*10)=7 and floor(0.8999...*10)=9
    // (the product rounds UP to 9.0 in IEEE) -> 7/2/1
    assert(counts("a") == Map("train" -> 7, "valid" -> 2, "test" -> 1))
    // n=5: floor(3.5)=3, floor(4.4999...)=4 -> 3/1/1
    assert(counts("b") == Map("train" -> 3, "valid" -> 1, "test" -> 1))
    // rerun agrees row-by-row
    val again = Sampling.exactSplit(df, Seq("k"), "id", splits, salt = "s")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[String]("split")))
    assert(out.toSet == again.toSet)
    // a different salt reshuffles membership but keeps the counts
    val other = Sampling.exactSplit(df, Seq("k"), "id", splits, salt = "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[String]("split")))
    assert(other.toSet != out.toSet)
  }

  test("dsirWeights: target-like docs outscore off-target docs; " +
    "weights are deterministic; token counts exact") {
    val raw = Seq((1L, "alpha alpha beta"), (2L, "omega omega omega"),
      (3L, "alpha beta"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // the target corpus is pure alpha/beta
    val target = Seq((10L, "alpha beta alpha"), (11L, "beta"))
      .toDF("doc_id", "text")
    val out = Sampling.dsirWeights(raw, target, "doc_id", "text",
      dim = 16, alpha = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // null text drops
    assert(out(1L)._1 == 3L && out(2L)._1 == 3L && out(3L)._1 == 2L)
    // alpha/beta docs must beat the omega doc at equal length
    assert(out(1L)._2 > out(2L)._2)
    assert(out(3L)._2 > out(2L)._2)
    val again = Sampling.dsirWeights(raw, target, "doc_id", "text",
      dim = 16, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.forall { case (k, (_, w)) => again(k) == w })
    // an empty target still scores (pure raw-side penalty term)
    val none = Sampling.dsirWeights(raw,
      target.filter(col("doc_id") < 0L), "doc_id", "text",
      dim = 16, alpha = 0.5).collect()
    assert(none.length == 3)
  }
}
