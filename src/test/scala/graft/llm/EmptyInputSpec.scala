package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Every corpus operator must survive EMPTY inputs (a filtered
 *  partition, an empty crawl delta, a benchmark with no overlap) —
 *  returning empty results, never throwing. ANSI mode makes this a
 *  real hazard class (divide-by-zero on empty aggregates). */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
  private def someDocs = Seq((1L, "alpha beta gamma delta")).toDF("id", "text")

  test("dedup family on empty corpora") {
    assert(Dedup.exact(emptyDocs, Seq("text"), "id").count() == 0)
    assert(Dedup.minHashDedup(emptyDocs, "id", "text", 32, 8, 3, 0.5).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "id", "text", Seq.empty :+ "id", 3, 0.5).count() == 0)
    assert(Dedup.dedupLines(emptyDocs, "id", "text").count() == 0)
    assert(Dedup.simHashSignatures(emptyDocs, "id", "text").count() == 0)
  }

  test("decontamination with empty corpus, empty benchmark, or both") {
    assert(Dedup.contaminationHits(emptyDocs, someDocs, "id", "text", 3).count() == 0)
    assert(Dedup.contaminationHits(someDocs, emptyDocs, "id", "text", 3).count() == 0)
    assert(Dedup.decontaminate(someDocs, emptyDocs, "id", "text", 3).count() == 1)
    assert(Dedup.newAgainstSeen(someDocs, emptyDocs, "text").count() == 1)
    assert(Dedup.newAgainstSeen(emptyDocs, someDocs, "text").count() == 0)
  }

  test("components and dropNearDuplicates on an empty pair list") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.components(emptyPairs).count() == 0)
    assert(Dedup.dropNearDuplicates(someDocs, emptyPairs, "id").count() == 1)
  }

  test("round-5 operators on empty inputs") {
    assert(Dedup.minHashEstPairs(emptyDocs, "id", "text").count() == 0)
    assert(Sampling.topFractionByScore(
      emptyDocs.withColumn("q", lit(1.0)), "q", "id", 0.5).count() == 0)
    // all scores null/NaN: nothing qualifies, nothing throws
    val allBad = Seq((1L, Double.NaN), (2L, Double.NaN)).toDF("id", "q")
    assert(Sampling.topFractionByScore(allBad, "q", "id", 0.5).count() == 0)
  }

  test("text analysis and sampling on empty corpora") {
    assert(TextAnalysis.tfIdfTopK(emptyDocs, "id", "text", 5).count() == 0)
    assert(TextAnalysis.termFrequencies(emptyDocs, "id", "text").count() == 0)
    assert(TextAnalysis.chunkByTokens(emptyDocs, "id", "text", 10, 2).count() == 0)
    assert(Sampling.hashSample(emptyDocs, "id", 3, 10).count() == 0)
    assert(Sampling.perKeyLimit(emptyDocs, Seq("text"), "id", 3).count() == 0)
    assert(Sampling.packByTokenBudget(
      emptyDocs.withColumn("n", lit(1L)), Seq("text"), "id", "n", 10).count() == 0)
  }

  test("round-9 retrieval/coherence operators on empty inputs") {
    val emptyQ = Seq.empty[(Long, String)].toDF("qid", "qtext")
    val someQ = Seq((10L, "hello")).toDF("qid", "qtext")
    // empty corpus: no candidates for any query; empty query set: no rows
    assert(TextAnalysis.bm25TopK(emptyDocs, "id", "text",
      someQ, "qid", "qtext", 5).count() == 0)
    assert(TextAnalysis.bm25TopK(someDocs, "id", "text",
      emptyQ, "qid", "qtext", 5).count() == 0)
    // empty corpus: coherence emits nothing (id set is empty too)
    assert(TextAnalysis.ngramCoherence(emptyDocs, "id", "text").count() == 0)
  }

  test("round-9 wave-2 operators on empty inputs") {
    assert(Dedup.winnowFingerprints(emptyDocs, "id", "text").count() == 0)
    assert(Dedup.copiedSpanPairs(emptyDocs, "id", "text").count() == 0)
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.graph.Centrality.pageRank(emptyEdges, "src", "dst").count() == 0)
    val emptyTok = emptyDocs.withColumn("n_tok", lit(1L))
    assert(Sampling.mixtureByTokenBudget(emptyTok, "text", "id", "n_tok",
      Map("en" -> 1.0), 100L).count() == 0)
  }

  test("aggregation helpers on empty input") {
    import graft.agg.GroupBy
    assert(GroupBy.percentilesDisc(emptyDocs, Seq("text"), "id", Seq(0.5)).count() == 0)
    assert(GroupBy.stringAgg(emptyDocs, Seq("text"), "id").count() == 0)
    val prof = graft.quality.Quality.profile(emptyDocs)
    assert(prof.count() == 2) // one row per column, zero counts
    assert(prof.collect().forall(r =>
      r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0))
  }

  test("round-5 second-wave operators on empty inputs") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.removeBoilerplateLines(emptyDocs, "id", "text", 0.5).count() == 0)
    assert(Sampling.splitByCluster(emptyDocs, emptyPairs, "id",
      Seq("all" -> 1.0)).count() == 0)
    assert(Sampling.weightedHashSample(
      Seq.empty[(Long, Long)].toDF("id", "w"), "id", "w", 0.5).count() == 0)
    assert(Sampling.temperatureRebalance(
      Seq.empty[(Long, String)].toDF("id", "lang"), "lang", "id", 0.5, 100)
      .count() == 0)
    val emptyVals = Seq.empty[(String, Double)].toDF("g", "v")
    assert(graft.quality.Quality.madOutlierFilter(emptyVals, Seq("g"), "v")
      .count() == 0)
    assert(graft.agg.GroupBy.normalizePerKey(emptyVals, Seq("g"), "v")
      .count() == 0)
    val emptyEv = Seq.empty[(Long, Long, Double)].toDF("u", "t", "v")
    assert(graft.agg.GroupBy.rollingByTime(emptyEv, Seq("u"), "t", "v", 10L)
      .count() == 0)
    assert(graft.agg.GroupBy.sessionize(emptyEv, Seq("u"), "t", 10L).count() == 0)
    val emptyKeys = Seq.empty[(Long, String)].toDF("id", "k")
    assert(graft.join.Bloom.semiJoin(emptyKeys,
      Seq(("a")).toDF("k"), Seq("k"), 10).count() == 0)
    assert(graft.join.Bloom.antiJoin(emptyKeys,
      Seq(("a")).toDF("k"), Seq("k"), 10).count() == 0)
    val emptyPack = Seq.empty[(String, Long, String, Long)]
      .toDF("g", "id", "text", "tok")
    assert(Sampling.packSequences(emptyPack, Seq("g"), "id", "tok",
      "text", 10L).count() == 0)
    assert(Dedup.exactKeepBest(emptyDocs.withColumn("q", lit(1.0)),
      Seq("text"), "q", "id").count() == 0)
  }

  test("round-6 operators on empty corpora and empty/degenerate text") {
    assert(Sampling.exactKByHash(emptyDocs, "id", 5).count() == 0)
    assert(TextAnalysis.domainBlocklistFilter(
      emptyDocs.withColumnRenamed("text", "url"), "url", Seq("x.com")).count() == 0)
    val r = Seq(("", 1L), (null, 2L)).toDF("t", "i")
      .select(col("i"),
        TextAnalysis.stripHtml(col("t")).as("s"),
        TextAnalysis.extractDomain(col("t")).as("d"),
        TextAnalysis.nfcNormalize(col("t")).as("n"),
        graft.llm.TextAnalysis.bpeTokenCountExact(col("t")).as("b"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getString(1) == "" && r(1L).isNullAt(2) &&
      r(1L).getString(3) == "" && r(1L).getLong(4) == 0L)
    // native expressions propagate null (SQL semantics), they do not
    // coerce to zero like a primitive-returning UDF would
    assert(r(2L).isNullAt(1) && r(2L).isNullAt(2) &&
      r(2L).isNullAt(3) && r(2L).isNullAt(4))
  }

  test("empty TEXT (not just empty corpus): metrics and shingles") {
    val blank = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val m = blank.select(
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.repetitionRatio(col("text"), 3).as("r"),
      Dedup.shingles(col("text"), 3).as("sh")).collect()
    assert(m.forall(r => !r.isNullAt(0) && r.getSeq[String](3).forall(_.isEmpty)))
  }

  test("round-8 operators on empty corpora and empty/null text/payloads") {
    // repetition signals: empty AND null text both score the defined
    // 0.0 (the guard's otherwise-branch absorbs the null condition —
    // matching the oracle's left-join + coalesce(0.0) shape)
    val rep = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"),
        TextAnalysis.topNgramCharFraction(col("text"), 2).as("t"),
        TextAnalysis.dupNgramCharFraction(col("text"), 5).as("d"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(rep(1L).getDouble(1) == 0.0 && rep(1L).getDouble(2) == 0.0)
    assert(rep(2L).getDouble(1) == 0.0 && rep(2L).getDouble(2) == 0.0)
    // multimodal hashing on empty corpora and empty/null payloads
    import Multimodal._
    val emptyMedia = spark.emptyDataset[MediaRecord](
      org.apache.spark.sql.Encoders.product[MediaRecord])
    assert(imageDHash(emptyMedia).count() == 0)
    assert(audioFingerprint(emptyMedia).count() == 0)
    val degenerate = Seq(
      MediaRecord(1L, Array.empty[Byte], MediaMeta("image/png", None, None, None)),
      MediaRecord(2L, null, MediaMeta("audio/wav", None, None, None))).toDS()
    assert(imageDHash(degenerate).collect().forall(_.dhash.isEmpty))
    assert(audioFingerprint(degenerate).collect().forall(_.fp.isEmpty))
    // generic pairing on an empty signature frame
    val emptySigs = Seq.empty[(Long, Option[Long])].toDF("id", "sig")
    assert(Dedup.hammingPairs(emptySigs, "id", "sig", bits = 64).count() == 0)
  }

  test("round-9 wave 7-19 operators on empty inputs") {
    import java.sql.Timestamp
    val emptyEv = Seq.empty[(Long, Timestamp, String, Long, Option[Double])]
      .toDF("user_id", "ts", "event_type", "event_id", "value")
    val emptyNum = Seq.empty[(String, Option[Double])].toDF("g", "v")

    // stats / quality
    assert(graft.quality.Quality.psiDrift(emptyNum, "v", "g", Seq(0.5)).count() == 0)
    assert(graft.quality.Quality.mannWhitneyU(emptyNum, "v", "g", "a", "b").count() == 0)
    assert(graft.quality.Quality.benfordDrift(emptyNum, "v").count() == 0)
    assert(graft.quality.Quality.kAnonymity(emptyNum, Seq("g"), 3).count() == 0)
    assert(graft.agg.Stats.pearsonMatrix(
      Seq.empty[(Double, Double)].toDF("a", "b"),
      Seq(("a", 2), ("b", 2))).collect().forall(_.isNullAt(3)))
    assert(graft.agg.Stats.linearFit(emptyNum.withColumn("x",
      org.apache.spark.sql.functions.lit(1L)), Seq("g"), "x", "v").count() == 0)
    assert(graft.agg.GroupBy.empiricalCdf(emptyNum, Seq("g"), "v").count() == 0)
    assert(graft.agg.GroupBy.skyline2D(
      Seq.empty[(Double, Int)].toDF("p", "s"), "p", "s").count() == 0)
    assert(graft.agg.GroupBy.weightedPercentilesDisc(
      Seq.empty[(Double, Double)].toDF("v", "w"), Nil, "v", "w",
      Seq(0.5)).count() == 0)
    assert(graft.ops.Transforms.impute(emptyNum, Seq("g"), "v", "mean").count() == 0)
    assert(graft.ops.Transforms.impute(emptyNum, Seq("g"), "v", "mode").count() == 0)
    assert(graft.quality.Quality.referentialIntegrity(emptyNum,
      Seq(graft.quality.Quality.FkSpec("f", Seq("g"),
        Seq("x").toDF("pk"), Seq("pk")))).collect()(0).getLong(1) == 0L)

    // text / llm
    assert(TextAnalysis.pmiCollocations(emptyDocs.select(col("text")), "text",
      1L, 5).count() == 0)
    assert(TextAnalysis.tokenEntropy(emptyDocs, "id", "text").count() == 0)
    assert(TextAnalysis.charLmScore(emptyDocs, "id", "text").count() == 0)
    assert(TextAnalysis.rakeKeywords(emptyDocs, "id", "text").count() == 0)
    assert(graft.join.Fuzzy.selfJoin(emptyDocs, "id", "text", 1).count() == 0)
    assert(Similarity.centroidDrift(
      Seq.empty[(String, Seq[Float])].toDF("g", "v"), "g", "v").count() == 0)
    assert(graft.agg.Sketches.heavyHitters(
      emptyDocs.select(col("text").as("item")), "item", 0.1, 20).count() == 0)

    // time series / events
    assert(graft.ops.TimeSeries.transitionMatrix(emptyEv, Seq("user_id"),
      "ts", "event_type", "event_id").count() == 0)
    assert(graft.ops.TimeSeries.ewma(emptyEv, Seq("user_id"), "ts",
      "event_id", "value", 0.5).count() == 0)
    assert(graft.ops.TimeSeries.seasonalityProfile(emptyEv, Seq("event_type"),
      "ts", "value").count() == 0)
    assert(graft.ops.TimeSeries.frequentPaths(emptyEv, "user_id", "ts",
      "event_id", "event_type", 1000L).count() == 0)
    assert(graft.ops.TimeSeries.gaps(emptyEv, Nil, "event_id").count() == 0)
    assert(graft.ops.TimeSeries.periodOverPeriod(emptyEv, Seq("event_type"),
      "ts", "value", "day").count() == 0)
    assert(graft.ops.TimeSeries.lagFeatures(emptyEv, Seq("user_id"), "ts",
      "event_id", "value", Seq(1)).count() == 0)

    // graph
    val emptyEdges = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(graft.graph.Graph.triangleCounts(emptyEdges).count() == 0)
    assert(graft.graph.Graph.coOccurrenceEdges(
      Seq.empty[(Long, Long)].toDF("g", "i"), "g", "i", 5).count() == 0)
  }

  test("round-10 operators on empty inputs") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("id", "text", "src")
    val emptyEv = Seq.empty[(Long, Timestamp, String, Long, Option[Double])]
      .toDF("user_id", "ts", "event_type", "event_id", "value")
    assert(graft.mining.Associations.rules(
      Seq.empty[(Long, Long)].toDF("g", "i"), "g", "i").count() == 0)
    assert(graft.ops.TimeSeries.levelShift(emptyEv, Seq("event_type"),
      "ts", "event_id", "value", 5).count() == 0)
    assert(graft.graph.Graph.linkPredictionRA(
      Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0)
    assert(graft.join.Fuzzy.jaroWinklerSelfJoin(emptyDocs, "id", "text",
      0.9).count() == 0)
    assert(TextAnalysis.hapaxRate(emptyDocs, Seq("src"), "text").count() == 0)
    assert(TextAnalysis.noveltyRate(emptyDocs, "id", "text").count() == 0)
    assert(graft.ops.Allocate.proRata(
      Seq.empty[(Long, Int, Double, Double)].toDF("g", "ln", "w", "t"),
      Seq("g"), "ln", "w", "t").count() == 0)
    // empty/null TEXT (not just empty frames): scalar readability family
    val nullText = Seq((1L, null.asInstanceOf[String], "s"), (2L, "", "s"))
      .toDF("id", "text", "src")
    val r = nullText.select(
      TextAnalysis.sentenceCount(col("text")).as("s"),
      TextAnalysis.syllableCount(col("text")).as("y"),
      TextAnalysis.fleschKincaidGrade(col("text")).as("g")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1) && r(0).isNullAt(2)) // null in
    assert(r(1).getLong(0) == 1L && r(1).getLong(1) == 0L && r(1).isNullAt(2))
  }

  test("round-11 operators on empty inputs") {
    val emptyAb = Seq.empty[(String, String, Option[Double])]
      .toDF("k", "arm", "v")
    assert(graft.agg.Stats.mannWhitneyU(
      emptyAb, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.spearman(
      Seq.empty[(String, Double, Double)].toDF("k", "x", "y"),
      Seq("k"), "x", "y").count() == 0)
    assert(graft.agg.Stats.benjaminiHochberg(
      Seq.empty[(String, String, Option[Double])].toDF("fam", "id", "p"),
      Seq("fam"), "id", "p").count() == 0)
    // all-null p: every row excluded, not a crash
    assert(graft.agg.Stats.benjaminiHochberg(
      Seq(("f", "a", Option.empty[Double])).toDF("fam", "id", "p"),
      Seq("fam"), "id", "p").count() == 0)
    assert(graft.ops.Normalize.quantileNormalize(
      Seq.empty[(String, Option[Double])].toDF("src", "v"),
      "src", "v").count() == 0)
    assert(graft.agg.Stats.cohenKappa(
      Seq.empty[(String, String, String)].toDF("k", "r1", "r2"),
      Seq("k"), "r1", "r2").count() == 0)
    assert(graft.llm.TextAnalysis.zipfSlope(
      Seq.empty[(String, String)].toDF("src", "text"),
      Seq("src"), "text").count() == 0)
    // empty/whitespace text: zero tokens, no xy rows, no crash
    assert(graft.llm.TextAnalysis.zipfSlope(
      Seq(("s", ""), ("s", "   ")).toDF("src", "text"),
      Seq("src"), "text").count() == 0)
    assert(graft.quality.Quality.benfordDeviation(
      Seq.empty[(String, Option[Double])].toDF("k", "v"),
      Seq("k"), "v").count() == 0)
    assert(graft.ops.Survival.kaplanMeier(
      Seq.empty[(String, Option[Long], Option[Boolean])]
        .toDF("k", "dur", "obs"),
      Seq("k"), "dur", "obs").count() == 0)
    assert(graft.agg.Stats.gini(
      Seq.empty[(String, Option[Double])].toDF("k", "v"),
      Seq("k"), "v").count() == 0)
    assert(graft.ops.TimeSeries.laggedCrossCorr(
      Seq.empty[(Long, Double, Double)].toDF("t", "x", "y"),
      Seq.empty, "t", "x", "y", maxLag = 3).count() == 0)
    assert(graft.llm.TextAnalysis.jensenShannonBySlice(
      Seq.empty[(String, String)].toDF("src", "text"),
      "src", "text").count() == 0)
    // disjoint-vocabulary slices: no shared tokens, no row (ln 2 by
    // contract, materialized by the caller)
    assert(graft.llm.TextAnalysis.jensenShannonBySlice(
      Seq(("a", "xx yy"), ("b", "zz ww")).toDF("src", "text"),
      "src", "text").count() == 0)
    assert(graft.join.Fuzzy.jaroWinklerJoin(
      emptyDocs, "id", "text", someDocs.toDF("id", "text"), "id", "text",
      threshold = 0.9).count() == 0)
    val sc = graft.llm.Augment.spanCorrupt(emptyDocs, "id", "text")
    assert(sc.count() == 0)
    assert(graft.llm.Sampling.exactSplit(
      Seq.empty[(String, Long)].toDF("src", "id"), Seq("src"), "id",
      Seq("train" -> 0.8, "test" -> 0.2)).count() == 0)
    assert(graft.agg.Stats.mutualInfo(
      Seq.empty[(String, String, String)].toDF("k", "a", "b"),
      Seq("k"), "a", "b").count() == 0)
    assert(graft.agg.Stats.theilSen(
      Seq.empty[(String, Double, Double, Long)].toDF("k", "x", "y", "id"),
      Seq("k"), "x", "y", "id").count() == 0)
    // a single point (no pair) and an all-equal-x group emit no row
    assert(graft.agg.Stats.theilSen(
      Seq(("k", 1.0, 2.0, 1L), ("e", 3.0, 1.0, 1L), ("e", 3.0, 2.0, 2L))
        .toDF("k", "x", "y", "id"),
      Seq("k"), "x", "y", "id").count() == 0)
    assert(graft.llm.TextAnalysis.tokenBurstiness(
      emptyDocs, "id", "text").count() == 0)
    assert(graft.llm.Dedup.containmentPairs(
      emptyDocs, "id", "text").count() == 0)
    // sub-shingle-length docs: empty sets, no pairs, no crash
    assert(graft.llm.Dedup.containmentPairs(
      Seq((1L, "a b"), (2L, "a b")).toDF("id", "text"),
      "id", "text", shingleN = 3).count() == 0)
    val emptyRun = Seq.empty[(Long, Long, Long)].toDF("qid", "id", "rank")
    assert(graft.llm.Similarity.rankBiasedOverlap(
      emptyRun, emptyRun, "qid", "id", "rank", k = 5).count() == 0)
    assert(graft.llm.Similarity.ndcgAtK(
      emptyRun, emptyRun, "qid", "id", "rank", k = 5).count() == 0)
    assert(graft.ops.TimeSeries.rollingCorr(
      Seq.empty[(String, Long, Double, Double)].toDF("k", "t", "x", "y"),
      Seq("k"), "t", "t", "x", "y", window = 3).count() == 0)
    assert(graft.agg.Stats.twoProportionZ(
      Seq.empty[(String, String, Boolean)].toDF("k", "arm", "hit"),
      Seq("k"), "arm", "a", "b", "hit").count() == 0)
    assert(graft.ops.TimeSeries.intervalCoverage(
      Seq.empty[(String, Long, Long)].toDF("k", "s", "e"),
      Seq("k"), "s", "e").count() == 0)
    assert(graft.graph.Graph.clusteringCoefficient(
      Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0)
    assert(graft.join.Joins.asOfWithin(
      Seq.empty[(Long, Long)].toDF("id", "t"),
      Seq.empty[(Long, Double)].toDF("t", "px"),
      Seq.empty, "t", "t", maxGap = 10L).count() == 0)
  }

  test("round-16 operators on empty inputs") {
    import java.sql.Timestamp
    val emptyPY = Seq.empty[(String, Double, Boolean)].toDF("k", "p", "y")
    assert(graft.agg.Stats.isotonicCalibration(
      emptyPY, Seq("k"), "p", "y").count() == 0)
    val emptyXVW =
      Seq.empty[(String, Double, Double, Double)].toDF("k", "x", "v", "w")
    assert(graft.agg.Stats.quantileRegression(
      emptyXVW, Seq("k"), "x", "v", "w", tau = 0.5,
      binWidth = 1.0).count() == 0)
    val emptyGV = Seq.empty[(String, Long, Double)].toDF("k", "g", "v")
    assert(graft.agg.Stats.brownForsythe(
      emptyGV, Seq("k"), "g", "v").count() == 0)
    assert(graft.agg.Stats.kruskalWallis(
      emptyGV, Seq("k"), "g", "v").count() == 0)
    val emptyDose = Seq.empty[(String, Long, Boolean)].toDF("k", "d", "y")
    assert(graft.agg.Stats.cochranArmitage(
      emptyDose, Seq("k"), "d", "y").count() == 0)
    val emptyTs =
      Seq.empty[(String, Timestamp, Long, Double)].toDF("k", "ts", "id", "v")
    assert(graft.agg.Stats.durbinWatson(
      emptyTs, Seq("k"), "ts", "id", "v").count() == 0)
    assert(graft.agg.Stats.runsTest(
      emptyTs, Seq("k"), "ts", "id", "v").count() == 0)
    assert(graft.ops.TimeSeries.rsi(
      emptyTs, Seq("k"), "ts", "id", "v").count() == 0)
    assert(graft.ops.TimeSeries.pageHinkley(
      emptyTs, Seq("k"), "ts", "id", "v", delta = 0.0,
      lambda = 1.0).count() == 0)
    assert(graft.ops.TimeSeries.holtWinters(
      emptyTs, Seq("k"), "ts", "id", "v", alpha = 0.5, beta = 0.5,
      gamma = 0.5, period = 2).count() == 0)
    assert(graft.graph.Centrality.hits(
      Seq.empty[(Long, Long)].toDF("src", "dst"),
      "src", "dst").count() == 0)
    val emptyGV2 = Seq.empty[(String, Long, Double)].toDF("k", "g", "v")
    assert(graft.agg.Stats.anovaF(
      emptyGV2, Seq("k"), "g", "v").count() == 0)
    assert(graft.agg.Stats.moodsMedianTest(
      emptyGV2, Seq("k"), "g", "v").count() == 0)
    assert(graft.agg.Stats.cohensD(
      Seq.empty[(String, String, Double)].toDF("k", "arm", "v"),
      Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.ops.TimeSeries.croston(
      Seq.empty[(String, java.sql.Timestamp, Long, Double)]
        .toDF("k", "ts", "id", "v"),
      Seq("k"), "ts", "id", "v", alpha = 0.5).count() == 0)
    assert(graft.agg.Stats.friedman(
      Seq.empty[(String, Long, String, Double)]
        .toDF("k", "blk", "trt", "v"),
      Seq("k"), "blk", "trt", "v").count() == 0)
    assert(graft.agg.Stats.cochranQ(
      Seq.empty[(String, Long, String, Boolean)]
        .toDF("k", "s", "trt", "y"),
      Seq("k"), "s", "trt", "y").count() == 0)
    assert(graft.agg.Stats.jarqueBera(
      Seq.empty[(String, Double)].toDF("k", "v"),
      Seq("k"), "v").count() == 0)
    assert(graft.agg.Stats.partialCorr(
      Seq.empty[(String, Double, Double, Double)]
        .toDF("k", "x", "y", "z"),
      Seq("k"), "x", "y", "z").count() == 0)
    assert(graft.agg.Stats.linCcc(
      Seq.empty[(String, Double, Double)].toDF("k", "x", "y"),
      Seq("k"), "x", "y").count() == 0)
    val emptySeries =
      Seq.empty[(String, Timestamp, Long, Double)]
        .toDF("k", "ts", "id", "v")
    assert(graft.ops.TimeSeries.macd(
      emptySeries, Seq("k"), "ts", "id", "v").count() == 0)
    assert(graft.ops.TimeSeries.stochasticOscillator(
      emptySeries, Seq("k"), "ts", "id", "v").count() == 0)
    assert(graft.ops.TimeSeries.forecastAccuracy(
      Seq.empty[(String, Timestamp, Long, Double, Double)]
        .toDF("k", "ts", "id", "a", "f"),
      Seq("k"), "ts", "id", "a", "f").count() == 0)
    assert(graft.agg.Stats.chowTest(
      Seq.empty[(String, Boolean, Double, Double)]
        .toDF("k", "seg", "x", "y"),
      Seq("k"), "seg", "x", "y").count() == 0)
    assert(graft.agg.Stats.cronbachAlpha(
      Seq.empty[(String, Long, String, Double)]
        .toDF("k", "s", "it", "v"),
      Seq("k"), "s", "it", "v").count() == 0)
    assert(graft.agg.Stats.diversityIndex(
      Seq.empty[(String, String)].toDF("k", "c"),
      Seq("k"), "c").count() == 0)
    assert(graft.agg.Stats.bartlett(
      Seq.empty[(String, Long, Double)].toDF("k", "g", "v"),
      Seq("k"), "g", "v").count() == 0)
    assert(graft.agg.Stats.grubbs(
      Seq.empty[(String, Double)].toDF("k", "v"),
      Seq("k"), "v").count() == 0)
    assert(graft.agg.Stats.wilcoxonSignedRank(
      Seq.empty[(String, Long, String, Double)]
        .toDF("k", "s", "cond", "v"),
      Seq("k"), "s", "cond", "A", "B", "v").count() == 0)
    assert(graft.agg.Stats.logRank(
      Seq.empty[(String, Boolean, Double, Boolean)]
        .toDF("k", "g", "d", "e"),
      Seq("k"), "g", "d", "e").count() == 0)
    val emptyTs16 =
      Seq.empty[(String, Timestamp, Long, Double)]
        .toDF("k", "ts", "id", "v")
    assert(graft.agg.Stats.ljungBox(
      emptyTs16, Seq("k"), "ts", "id", "v").count() == 0)
    assert(graft.agg.Stats.mannKendall(
      emptyTs16, Seq("k"), "ts", "id", "v").count() == 0)
    assert(graft.agg.Stats.grangerF(
      Seq.empty[(String, Timestamp, Long, Double, Double)]
        .toDF("k", "ts", "id", "y", "x"),
      Seq("k"), "ts", "id", "y", "x").count() == 0)
    assert(graft.agg.Stats.cmhTest(
      Seq.empty[(String, Long, Boolean, Boolean)]
        .toDF("k", "st", "ex", "oc"),
      Seq("k"), "st", "ex", "oc").count() == 0)
    assert(graft.agg.Stats.pageTrend(
      Seq.empty[(String, Long, Long, Double)]
        .toDF("k", "blk", "trt", "v"),
      Seq("k"), "blk", "trt", "v").count() == 0)
    assert(graft.agg.Stats.jonckheereTerpstra(
      Seq.empty[(String, Long, Double)].toDF("k", "g", "v"),
      Seq("k"), "g", "v").count() == 0)
    assert(graft.agg.Stats.ordinalAssociation(
      Seq.empty[(String, Double, Double)].toDF("k", "x", "y"),
      Seq("k"), "x", "y").count() == 0)
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Sampling.dsirWeights(emptyCorpus, emptyCorpus,
      "doc_id", "text", dim = 8).count() == 0)
    assert(graft.agg.Stats.fisherExact(
      Seq.empty[(String, Boolean, Boolean)].toDF("k", "ex", "oc"),
      Seq("k"), "ex", "oc").count() == 0)
    assert(graft.ops.Survival.rmst(
      Seq.empty[(String, Long, Boolean)].toDF("k", "dur", "obs"),
      Seq("k"), "dur", "obs", tau = 10L).count() == 0)
    assert(graft.agg.Stats.cliffsDelta(
      Seq.empty[(String, String, Double)].toDF("k", "arm", "v"),
      Seq("k"), "arm", "a", "b", "v").count() == 0)
  }

  test("round-17 operators on empty inputs") {
    import java.sql.Timestamp
    val emptyArm = Seq.empty[(String, String, Double)]
      .toDF("k", "arm", "v")
    assert(graft.agg.Stats.wasserstein1(
      emptyArm, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.cramerVonMises(
      emptyArm, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.kuiper(
      emptyArm, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.energyDistance(
      emptyArm, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.kendallsW(
      Seq.empty[(String, Long, String, Double)]
        .toDF("k", "rater", "item", "v"),
      Seq("k"), "rater", "item", "v").count() == 0)
    assert(graft.agg.Stats.holmBonferroni(
      Seq.empty[(String, String, Double)].toDF("k", "id", "p"),
      Seq("k"), "id", "p").count() == 0)
    assert(graft.agg.Stats.cohensH(
      Seq.empty[(String, String, Boolean)].toDF("k", "arm", "hit"),
      Seq("k"), "arm", "a", "b", "hit").count() == 0)
    assert(graft.agg.Stats.riskRatio(
      Seq.empty[(String, Boolean, Boolean)].toDF("k", "ex", "oc"),
      Seq("k"), "ex", "oc").count() == 0)
    assert(graft.agg.Stats.atkinson(
      Seq.empty[(String, Double)].toDF("k", "v"),
      Seq("k"), "v").count() == 0)
    assert(graft.agg.Stats.lorenzCurve(
      Seq.empty[(String, Double)].toDF("k", "v"),
      Seq("k"), "v").count() == 0)
    val emptyTs17 = Seq.empty[(String, Timestamp, Long, Double, Double)]
      .toDF("k", "ts", "id", "a", "f")
    assert(graft.ops.TimeSeries.theilU(
      emptyTs17, Seq("k"), "ts", "id", "a", "f").count() == 0)
    assert(graft.ops.TimeSeries.trackingSignal(
      Seq.empty[(String, Double, Double)].toDF("k", "a", "f"),
      Seq("k"), "a", "f").count() == 0)
    val emptyArm17 = Seq.empty[(String, String, Double)]
      .toDF("k", "arm", "v")
    assert(graft.agg.Stats.distributionDistance(
      emptyArm17, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.hodgesLehmann(
      emptyArm17, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.gehanWilcoxon(
      Seq.empty[(String, Boolean, Double, Boolean)]
        .toDF("k", "g", "d", "e"),
      Seq("k"), "g", "d", "e").count() == 0)
    assert(graft.ops.Survival.survivalQuantiles(
      Seq.empty[(String, Long, Boolean)].toDF("k", "dur", "obs"),
      Seq("k"), "dur", "obs").count() == 0)
    assert(graft.agg.Stats.quade(
      Seq.empty[(String, Long, Long, Double)]
        .toDF("k", "blk", "trt", "v"),
      Seq("k"), "blk", "trt", "v").count() == 0)
    assert(graft.agg.Stats.conoverSquaredRanks(
      emptyArm17, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.poissonRateTest(
      Seq.empty[(String, String, Long, Double)]
        .toDF("k", "arm", "ev", "exp"),
      Seq("k"), "arm", "a", "b", "ev", "exp").count() == 0)
    assert(graft.agg.Stats.captureRecapture(
      Seq.empty[(String, String, Long)].toDF("k", "src", "id"),
      Seq("k"), "src", "a", "b", "id").count() == 0)
    assert(graft.agg.Stats.chao1(
      Seq.empty[(String, Long)].toDF("k", "item"),
      Seq("k"), "item").count() == 0)
    assert(graft.agg.Stats.brunnerMunzel(
      emptyArm17, Seq("k"), "arm", "a", "b", "v").count() == 0)
    assert(graft.agg.Stats.sampleSizeTwoProportions(
      Seq.empty[(String, Boolean)].toDF("k", "y"),
      Seq("k"), "y", mde = 0.02).count() == 0)
    assert(Sampling.bottomKByHash(
      Seq.empty[(String, Long)].toDF("k", "id"),
      Seq("k"), "id", k = 3).count() == 0)
    assert(graft.agg.Stats.qiniCurve(
      Seq.empty[(String, Double, Long, Boolean, Boolean)]
        .toDF("k", "s", "id", "tr", "y"),
      Seq("k"), "s", "id", "tr", "y").count() == 0)
    assert(graft.agg.Stats.gTest(
      Seq.empty[(String, String, String)].toDF("k", "a", "b"),
      Seq("k"), "a", "b").count() == 0)
  }
}
