package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-4 corpus operators: decontamination, line dedup, TF-IDF,
 *  deterministic sampling, incremental ingest dedup. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contaminationHits counts distinct shared n-grams; decontaminate removes them") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma", "beta gamma delta", "gamma delta epsilon"
      (2L, "zeta eta theta iota kappa"),      // clean
      (3L, "alpha beta gamma zeta eta")       // shares "alpha beta gamma" only
    ).toDF("id", "text")
    val bench = Seq((10L, "alpha beta gamma delta epsilon")).toDF("id", "text")

    val hits = Dedup.contaminationHits(corpus, bench, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 3L, 3L -> 1L))

    val clean = Dedup.decontaminate(corpus, bench, "id", "text", n = 3)
    assert(clean.select("id").as[Long].collect().toSet == Set(2L))

    // minHits threshold: only doc 1 reaches 2 shared grams
    val strict = Dedup.decontaminate(corpus, bench, "id", "text", n = 3, minHits = 2)
    assert(strict.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("dedupLines keeps corpus-wide first occurrence, preserves order, drops emptied docs") {
    val corpus = Seq(
      (1L, "header\nbody one\nfooter"),
      (2L, "header\nbody two\nfooter"), // header+footer dup'd from doc 1
      (3L, "header\nfooter")            // every line already seen -> doc vanishes
    ).toDF("id", "text")
    val out = Dedup.dedupLines(corpus, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "header\nbody one\nfooter", 2L -> "body two"))
  }

  test("removeBoilerplateLines deletes ubiquitous lines everywhere, keeps content") {
    val corpus = Seq(
      (1L, Some("FOOTER\ncontent one")),
      (2L, Some("content two\nFOOTER")),
      (3L, Some("FOOTER")),        // all-boilerplate -> empty, row kept
      (4L, Some("content four")),
      (5L, Option.empty[String])   // null text stays null
    ).toDF("id", "text")
    // FOOTER in 3 of 4 non-null docs; threshold ceil(0.5*4)=2
    val out = Dedup.removeBoilerplateLines(corpus, "id", "text", minDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("content one"), 2L -> Some("content two"),
      3L -> Some(""), 4L -> Some("content four"), 5L -> None))
    // row count and column order unchanged
    assert(Dedup.removeBoilerplateLines(corpus, "id", "text", 0.5)
      .columns.toSeq == Seq("id", "text"))
    intercept[IllegalArgumentException](
      Dedup.removeBoilerplateLines(corpus, "id", "text", 0.0))
  }

  test("exactKeepBest keeps the highest-scoring duplicate, min id on ties") {
    val corpus = Seq(
      (1L, "dup", Some(0.2)), (2L, "dup", Some(0.9)), (3L, "dup", Some(0.9)),
      (4L, "solo", Some(0.1)),
      (5L, "nulls", Option.empty[Double]), (6L, "nulls", Some(0.0))
    ).toDF("id", "text", "q")
    val out = Dedup.exactKeepBest(corpus, Seq("text"), "q", "id")
      .select("id").as[Long].collect().toSet
    // dup: 0.9 wins, tie -> id 2; nulls sort last -> id 6's 0.0 wins
    assert(out == Set(2L, 4L, 6L))
    // a NaN score must never outrank a real one
    val withNan = Seq((1L, "k", Double.NaN), (2L, "k", 0.1)).toDF("id", "text", "q")
    assert(Dedup.exactKeepBest(withNan, Seq("text"), "q", "id")
      .select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("removeBoilerplateLines: a null id keeps its text (null-safe rejoin)") {
    val corpus = Seq((Option.empty[Long], Some("FOOTER\nkeep")),
      (Some(1L), Some("FOOTER\nother")), (Some(2L), Some("FOOTER")))
      .toDF("id", "text")
    val out = Dedup.removeBoilerplateLines(corpus, "id", "text", minDocFrac = 0.6)
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(out(None) == "keep")     // not wiped to ""
    assert(out(Some(1L)) == "other" && out(Some(2L)) == "")
  }

  test("dedupLines dedups repeats WITHIN one document too") {
    val corpus = Seq((1L, "a\nb\na\nc")).toDF("id", "text")
    val out = Dedup.dedupLines(corpus, "id", "text")
      .collect().map(r => r.getString(1))
    assert(out.toSeq == Seq("a\nb\nc"))
  }

  test("tfIdfTopK ranks rare terms above common ones, rational score") {
    val corpus = Seq(
      (1L, "spark spark unique common"),
      (2L, "common other words here"),
      (3L, "common more common words")
    ).toDF("id", "text")
    val top = TextAnalysis.tfIdfTopK(corpus, "id", "text", k = 2)
    val doc1 = top.filter(col("id") === 1L).orderBy("rank")
      .select("term", "tf", "df", "score").collect()
    // spark: tf=2, df=1 -> 2.0; unique: tf=1, df=1 -> 1.0; common: tf=1, df=3
    assert(doc1(0).getString(0) == "spark" && doc1(0).getDouble(3) == 2.0)
    assert(doc1(1).getString(0) == "unique" && doc1(1).getDouble(3) == 1.0)
    // logIdf: higher df => lower weight, same tf
    val w = corpus.sparkSession.range(1).select(
      TextAnalysis.logIdf(lit(2L), lit(1L), lit(3L)).as("rare"),
      TextAnalysis.logIdf(lit(2L), lit(3L), lit(3L)).as("common")).head()
    assert(w.getDouble(0) > w.getDouble(1))
  }

  test("bm25TopK: rational-idf scoring, query-term dedup, doc-id tie-break") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry date date")
    ).toDF("id", "text")
    val queries = Seq((10L, "apple date"), (11L, "banana banana cherry"))
      .toDF("qid", "qtext")
    val out = TextAnalysis.bm25TopK(docs, "id", "text",
      queries, "qid", "qtext", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // corpus: N=3, total tokens=8, avgdl=8/3
    def score(terms: Seq[(Long, Long, Long)]): Double = { // (tf, df, dl)
      val avgdl = 8.0 / 3.0
      terms.foldLeft(0.0) { case (acc, (tf, df, dl)) =>
        val idf = ((3L - df).toDouble + 0.5) / (df.toDouble + 0.5)
        acc + idf * ((tf.toDouble * 2.2) /
          (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
      }
    }
    // q10 "apple date": apple→doc1(tf2,df1,dl3), date→doc3(tf2,df1,dl3) —
    // IDENTICAL scores, so rank must tie-break by doc id
    val q10 = out.filter(_._1 == 10L).sortBy(_._4)
    assert(q10.map(r => (r._2, r._4)).toSeq == Seq((1L, 1L), (3L, 2L)))
    assert(q10(0)._3 == q10(1)._3)
    assert(q10(0)._3 == score(Seq((2L, 1L, 3L))))
    // q11 "banana banana cherry": query terms DEDUPED — doc2 scores
    // banana(tf1,df2,dl2)+cherry(tf1,df2,dl2) once each, not banana
    // twice. doc1 (banana,tf1,dl3) and doc3 (cherry,tf1,dl3) tie
    // exactly — k=2 keeps doc2 then the LOWER id, doc1
    val q11 = out.filter(_._1 == 11L).sortBy(_._4)
    assert(q11.map(r => (r._2, r._4)).toSeq == Seq((2L, 1L), (1L, 2L)))
    assert(q11(0)._3 == score(Seq((1L, 2L, 2L), (1L, 2L, 2L))))
    assert(q11(1)._3 == score(Seq((1L, 2L, 3L))))
  }

  test("bm25TopK maxDf prunes stopword terms before the candidate fan-out") {
    val docs = Seq(
      (1L, "the apple"), (2L, "the banana"), (3L, "the cherry")
    ).toDF("id", "text")
    val queries = Seq((20L, "the apple")).toDF("qid", "qtext")
    val all = TextAnalysis.bm25TopK(docs, "id", "text",
      queries, "qid", "qtext", k = 10)
    assert(all.count() == 3) // "the" drags in every doc
    val pruned = TextAnalysis.bm25TopK(docs, "id", "text",
      queries, "qid", "qtext", k = 10, maxDf = Some(2L))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // df("the")=3 > 2 → pruned; only "apple" (df=1) scores → doc1 only
    assert(pruned.map(_._1).toSeq == Seq(1L))
    // and the surviving term's df/dl stats are UNCHANGED by pruning
    val exact = all.filter(col("id") === 1L).select("score").head.getDouble(0)
    val apple = { // single-term contribution of "apple" in doc1
      val avgdl = 6.0 / 3.0
      val idf = ((3L - 1L).toDouble + 0.5) / (1L.toDouble + 0.5)
      idf * ((1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * (2.0 / avgdl))))
    }
    assert(pruned.head._2 == apple)
    assert(exact > apple) // the full score still carried "the"'s floor contribution
  }

  test("ngramCoherence: exact integer corpus probabilities, short docs score 0") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b"×2, "b a"×1
      (2L, "a b"),     // bigram:  "a b"×1
      (3L, "x")        // too short: 0 bigrams
    ).toDF("id", "text")
    // corpus: C("a b")=3, C("b a")=1, B=4
    val out = TextAnalysis.ngramCoherence(docs, "id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, (2.0 * 3.0 + 1.0 * 1.0) / (3.0 * 4.0)))) // 7/12
    assert(out(2L) == ((1L, 3.0 / 4.0)))
    assert(out(3L) == ((0L, 0.0)))
    // a doc of only corpus-common bigrams outscores one that mixes in
    // a corpus-rare sequence ("b a" appears once in the corpus)
    assert(out(2L)._2 > out(1L)._2)
  }

  test("canonicalizeUrl: case/ports/www/tracking/fragment collapse; path case kept") {
    val cases = Seq(
      ("HTTP://WWW.Example.COM:80/A/b/?utm_source=x&q=1#frag",
        "http://example.com/A/b/?q=1"),
      ("https://Host.com:443", "https://host.com"),              // end-of-string port
      ("http://a.com/", "http://a.com"),                         // trailing slash
      ("https://a.com/p?gclid=z", "https://a.com/p"),            // lone tracking param
      ("https://a.com/p?utm_a=1&utm_b=2&x=3", "https://a.com/p?x=3"), // adjacent params
      ("ftp://X.com/Y", "ftp://x.com/Y"),                        // other scheme: no port/www rules
      ("no-scheme/path#f", "no-scheme/path"),                    // non-URL: generic steps only
      ("https://a.com:8443/p", "https://a.com:8443/p")           // non-default port kept
    ).toDF("url", "want")
    val out = cases.withColumn("got", TextAnalysis.canonicalizeUrl(col("url")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    out.foreach { case (u, want, got) => assert(got == want, s"url=$u") }
    // stripWww=false keeps the www. prefix
    val keep = Seq(("http://www.a.com/x", "")).toDF("url", "w")
      .select(TextAnalysis.canonicalizeUrl(col("url"), stripWww = false))
      .head.getString(0)
    assert(keep == "http://www.a.com/x")
  }

  test("gopherRules: each rule trips on its own pathology, integer-exact thresholds") {
    val good = ((1 to 48).map(i => s"word$i") ++ Seq("the", "of")).mkString(" ")
    val docs = Seq(
      (1L, good),                                   // 50 words, all rules pass
      (2L, (1 to 49).map(i => s"word$i").mkString(" ")), // 49 words: length rule
      (3L, good.replace("word1 ", "# # # # # # ")), // 55 words, 6 '#': symbol rule
      (4L, ((1 to 48).map(_ => "xx") ++ Seq("the", "of")).mkString(" ")), // mean len 2
      (5L, Seq.fill(10)((1 to 5).map(i => s"w$i").mkString("- ", " ", "")).mkString("\n")
        + " the of " + (1 to 48).map(i => s"w$i").mkString(" ")), // all 11? lines: >90% bulleted
      (6L, ((1 to 40).map(i => s"word$i") ++ (1 to 12).map(_ => "1234")
        ++ Seq("the", "of")).mkString(" ")),        // 12/54 non-alpha words: alpha rule
      (7L, (1 to 50).map(i => s"word$i").mkString(" "))  // no stopwords
    ).toDF("id", "text")
    val r = TextAnalysis.gopherRules(docs, "id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(2), x.getBoolean(3), x.getBoolean(4), x.getBoolean(5),
          x.getBoolean(6), x.getBoolean(7), x.getBoolean(8), x.getBoolean(9)))
      .toMap // (word_count, mean_len, symbol, bullet, ellipsis, alpha, stop, pass)
    assert(r(1L) == ((true, true, true, true, true, true, true, true)))
    assert(!r(2L)._1 && !r(2L)._8)   // too short
    assert(!r(3L)._3 && !r(3L)._8)   // 10·6 > 55 symbols
    assert(!r(4L)._2 && !r(4L)._8)   // mean word length 2 < 3
    assert(!r(5L)._4 && !r(5L)._8)   // 10/11 bullet lines > 9/10
    assert(!r(6L)._6 && !r(6L)._8)   // 5·42 < 4·54 alphabetic
    assert(!r(7L)._7 && !r(7L)._8)   // zero stopwords
    // ellipsis rule: 2 of 4 lines end in …
    val e = Seq((8L, "a …\nb\nc ...\nd " + good)).toDF("id", "text")
    val re = TextAnalysis.gopherRules(e, "id", "text").head()
    assert(!re.getBoolean(6) && !re.getBoolean(9))
  }

  test("winnowing: a copied span of w+k-1 tokens is always detected; boilerplate capped") {
    val span = (1 to 8).map("c" + _).mkString(" ") // w+k-1 = 8 tokens at k=5, w=4
    val docs = Seq(
      (1L, s"z1 z2 $span y1 y2"),
      (2L, s"x1 x2 x3 $span x4"),
      (3L, (1 to 12).map("m" + _).mkString(" "))
    ).toDF("id", "text")
    val pairs = Dedup.copiedSpanPairs(docs, "id", "text",
        k = 5, w = 4, minShared = 1, maxDocFreq = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the winnowing guarantee: SOME fingerprint of the shared span is
    // selected in both docs regardless of surrounding context
    assert(pairs.toSeq == Seq((1L, 2L)))
    // frequency cap: IDENTICAL docs in more than maxDocFreq copies —
    // every fingerprint hits df=3 > 2, all drop, no quadratic fan-out
    val boiler = Seq(1L, 2L, 3L).map(i => (i, span)).toDF("id", "text")
    assert(Dedup.copiedSpanPairs(boiler, "id", "text",
      k = 5, w = 4, minShared = 1, maxDocFreq = 2).count() == 0)
    // and fingerprints themselves are a pure function of the text:
    // identical docs yield identical fingerprint sets
    val fp = Dedup.winnowFingerprints(docs, "id", "text", k = 5, w = 4)
    val f1 = fp.filter(col("id") === 1L).select("fp").collect().map(_.getString(0)).toSet
    val f2 = fp.filter(col("id") === 2L).select("fp").collect().map(_.getString(0)).toSet
    assert((f1 intersect f2).nonEmpty)
    val f3 = fp.filter(col("id") === 3L).select("fp").collect().map(_.getString(0)).toSet
    assert((f1 intersect f3).isEmpty)
  }

  test("hashSample is partitioning-independent and salt-sensitive") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Sampling.hashSample(df, "id", 3, 10, "s1").select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(13), "id", 3, 10, "s1")
      .select("id").as[Long].collect().toSet
    assert(a == b)                     // layout-independent
    assert(a.nonEmpty && a.size < 1000) // actually samples
    val c = Sampling.hashSample(df, "id", 3, 10, "s2").select("id").as[Long].collect().toSet
    assert(a != c)                     // independent draw per salt
    // fraction roughly 30% (md5 is uniform; 1000 draws, loose bound)
    assert(a.size > 200 && a.size < 400)
  }

  test("chunkByTokens: overlap coverage, boundary, short docs") {
    val docs = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")), // 10 tokens, chunk=4, overlap=1 -> step 3
      (2L, "a b c"),                              // short: one chunk of itself
      (3L, "x y z w")                             // exactly chunkTokens: one chunk
    ).toDF("id", "text")
    val out = TextAnalysis.chunkByTokens(docs, "id", "text", chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // starts at 1, 4, 7 (step 3): chunk 3 reaches the end, so no 4th chunk
    assert(d1.toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, "x y z w")))
    // every token position is covered by some chunk
    val covered = d1.flatMap(_.split(" ")).toSet
    assert(covered == (1 to 10).map("t" + _).toSet)
  }

  test("simHashPairs equals the naive all-pairs hamming join (pigeonhole completeness)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "a completely different document about spark"),
      (4L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val banded = Dedup.simHashPairs(docs, "id", "text", bits = 16,
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // naive reference over the same signatures
    val sigs = Dedup.simHashSignatures(docs, "id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded == naive)
    assert(banded.contains((1L, 4L, 0))) // exact dup at hamming 0
    intercept[IllegalArgumentException](
      Dedup.simHashPairs(docs, "id", "text", maxHamming = 4, bands = 4))
  }

  test("newAgainstSeen drops exact content matches only") {
    val corpus = Seq((1L, "seen text"), (2L, "new text"), (3L, "seen text"))
      .toDF("id", "text")
    val seen = Seq(Tuple1("seen text")).toDF("text")
    val out = Dedup.newAgainstSeen(corpus, seen, "text")
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L))
  }

  test("invertedIndex: full-corpus stats, capped ascending postings") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, null: String), (4L, ""))
      .toDF("id", "text")
    val out = TextAnalysis.invertedIndex(docs, "id", "text", maxPostings = 20)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      "a" -> ((1L, 2L, "1")),
      "b" -> ((2L, 2L, "1,2")),
      "c" -> ((1L, 1L, "2"))))
    // cap truncates the LIST but never the corpus stats
    val capped = TextAnalysis.invertedIndex(docs, "id", "text", maxPostings = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(3)))).toMap
    assert(capped("b") == ((2L, "1")))
  }

  test("duplicateSpans: cross-doc repeats found, overlaps merged, disjoint spans split") {
    val docs = Seq(
      (1L, "x y z w q a b c d e"),      // "x y z w q"@0 and "y z w q a"@1 repeat
      (2L, "p x y z w q r"),            // "x y z w q"@1
      (3L, "x y z w q a"),              // both grams again
      (4L, "x y z w q m1 m2 m3 m4 m5 x y z w q") // two DISJOINT spans
    ).toDF("id", "text")
    val out = Dedup.duplicateSpans(docs, "id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(out == Set(
      (1L, 0, 6, 6), (2L, 1, 6, 5), (3L, 0, 6, 6),
      (4L, 0, 5, 5), (4L, 10, 15, 5)))
  }

  test("duplicateSpans: hashGrams variant matches the exact form") {
    val docs = (1 to 60).map(i =>
      (i.toLong, if (i % 3 == 0) "x y z w q a b c" else s"u$i v$i w$i x$i y$i z$i"))
      .toDF("id", "text")
    val exact = Dedup.duplicateSpans(docs, "id", "text", k = 5)
      .collect().map(_.toSeq).toSet
    val hashed = Dedup.duplicateSpans(docs, "id", "text", k = 5, hashGrams = true)
      .collect().map(_.toSeq).toSet
    assert(exact == hashed && exact.nonEmpty)
  }

  test("duplicateSpans: no repeats / empty / null text produce nothing") {
    val docs = Seq((1L, "all tokens here unique once"), (2L, ""), (3L, null: String))
      .toDF("id", "text")
    assert(Dedup.duplicateSpans(docs, "id", "text", k = 3).count() == 0)
  }

  test("recallAtK: hand-checked hits, rank cut, missed queries kept at zero") {
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 99L, 4L), // rank 4 cut
      (2L, 20L, 1L), (2L, 21L, 2L)
    ).toDF("qid", "id", "rank")
    val approx = Seq(
      (1L, 11L, 1L), (1L, 12L, 2L), (1L, 55L, 3L), (1L, 10L, 4L) // 10 outside k
    ).toDF("qid", "id", "rank")
    val out = Similarity.recallAtK(approx, exact, "qid", "id", "rank", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getDouble(5))))
      .toMap
    // columns: (qid, n_exact, hits, recall, first_hit_rank, rr);
    // first hit is id 11 at approx rank 1 -> rr 1.0
    assert(out(1L) == ((3L, 2L, 2.0 / 3.0, Some(1L), 1.0)))
    // query 2 absent from the approximate arm: present with recall 0, rr 0
    assert(out(2L) == ((2L, 0L, 0.0, None, 0.0)))
  }

  test("rankBiasedOverlap: identical lists = 1 - p^k; disjoint = 0; " +
      "order-sensitivity") {
    def run(rows: (Long, Long, Long)*) = rows.toSeq.toDF("qid", "id", "rank")
    val a = run((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L))
    val b = run((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), // identical
      (2L, 22L, 1L), (2L, 21L, 2L), (2L, 20L, 3L),           // reversed
      (3L, 90L, 1L), (3L, 91L, 2L), (3L, 92L, 3L))           // disjoint
    val out = Similarity.rankBiasedOverlap(a, b, "qid", "id", "rank",
      k = 3, p = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // identical: rbo = (1-p)*sum(p^(d-1)) = 1 - p^3, through the
    // operator's 1e-12 contribution grid
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def suffix(m: Int) = (m to 3).map(d => math.pow(0.5, d - 1) / d).sum
    val ident = 0.5 * (r12(suffix(1)) + r12(suffix(2)) + r12(suffix(3)))
      .toDouble
    assert(out(1L)._1 == 3L && out(1L)._2 == ident)
    assert(math.abs(out(1L)._2 - (1.0 - 0.125)) < 1e-9)
    // reversed: same members, max-rank = 3 for the outer pair, 2 mid
    val rev = 0.5 * (r12(suffix(3)) + r12(suffix(2)) + r12(suffix(3)))
      .toDouble
    assert(out(2L)._2 == rev && out(2L)._2 < out(1L)._2)
    assert(out(3L) == ((0L, 0.0)))
  }

  test("ndcgAtK: perfect ranking ~1, graded degradation, misses at 0") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L)).toDF("qid", "id", "rank")
    val approxRows = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 22L, 1L), (2L, 21L, 2L), (2L, 20L, 3L),
      (3L, 99L, 1L)).toDF("qid", "id", "rank")
    val out = Similarity.ndcgAtK(approxRows, exact, "qid", "id", "rank",
      k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    // perfect ordering: dcg == idcg up to the 1e-12 term grid
    assert(math.abs(out(1L)._2.get - 1.0) < 1e-9)
    // reversed ordering: strictly worse, still > 0
    assert(out(2L)._2.get < out(1L)._2.get && out(2L)._2.get > 0.0)
    // no exact hit anywhere: ndcg 0
    assert(out(3L)._1 == 1L && out(3L)._2.get == 0.0)
  }

  test("mapAtK: perfect list = 1, hits-early beats hits-late, " +
    "no hits = 0") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (4L, 40L, 1L), (4L, 41L, 2L)).toDF("qid", "id", "rank")
    val approxRows = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 99L, 1L), (2L, 98L, 2L), (2L, 20L, 3L), // one late hit
      (3L, 77L, 1L), // no hits
      (4L, 40L, 1L), (4L, 97L, 2L), (4L, 41L, 3L)) // hits at 1 and 3
      .toDF("qid", "id", "rank")
    val out = Similarity.mapAtK(approxRows, exact, "qid", "id", "rank",
      k = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((3L, 1.0))) // all hits in order: AP = 1
    // q2: single hit at rank 3, 3 relevant: (1/3)/3 = 1/9
    assert(math.abs(out(2L)._2 - 1.0 / 9.0) < 1e-9)
    assert(out(3L) == ((1L, 0.0)))
    // q4: hits at ranks 1 and 3 of 2 relevant: (1 + 2/3)/2 = 5/6
    assert(math.abs(out(4L)._2 - 5.0 / 6.0) < 1e-9)
  }

  test("vocabCoverage: exact counts, tie order, topN cut, running share") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "b d  "),            // trailing whitespace: empty token excluded
      (3L, null.asInstanceOf[String])
    ).toDF("id", "text")
    // counts: a=3, b=3, c=1, d=1; total=8; ties break lexicographically
    val out = TextAnalysis.vocabCoverage(docs, "text", topN = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, "a", 3L, 3L, 3.0 / 8.0),
      (2L, "b", 3L, 6L, 6.0 / 8.0),
      (3L, "c", 1L, 7L, 7.0 / 8.0))) // topN=3 cuts d; total still 8
  }

  test("tokenDistributionDrift: hand-computed chi-square, OTHER bucket, zero for matching mix") {
    // corpus: a×6, b×4, c×2 (12 tokens). topV=2 → categories a, b,
    // OTHER(c). s1 mirrors the corpus mix exactly → χ² = 0.
    val docs = Seq(
      ("s1", "a a a b b c"),
      ("s2", "a a a b b c"),   // s1+s2 identical halves of the corpus
      ("s3", null.asInstanceOf[String]) // null text → no tokens, no row
    ).toDF("source", "text")
    val out = TextAnalysis.tokenDistributionDrift(docs, "source", "text",
        topV = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set("s1", "s2"))
    assert(out("s1") == ((6L, 3L, 0.0)))
    assert(out("s2") == ((6L, 3L, 0.0)))
    // skewed source: all-c document drifts; χ² hand-computed over
    // categories (a: o=0,e=2·(6/15)... recompute) — use exact formula
    val docs2 = Seq(("s1", "a a a b b c"), ("s2", "c c c")).toDF("source", "text")
    val out2 = TextAnalysis.tokenDistributionDrift(docs2, "source", "text", topV = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // corpus: a=3 b=2 c=4, T=9; cats: c(rank1,4), a(rank2,3), OTHER=b(2)
    def chi(o: Seq[Long], s: Long): Double = {
      val cs = Seq(4L, 3L, 2L) // category counts in rank order
      cs.zip(o).map { case (c, ob) =>
        val e = c.toDouble * s.toDouble / 9.0
        (ob.toDouble - e) * (ob.toDouble - e) / e
      }.foldLeft(0.0)(_ + _)
    }
    assert(out2("s1") == chi(Seq(1L, 3L, 2L), 6L))
    assert(out2("s2") == chi(Seq(3L, 0L, 0L), 3L))
  }

  test("overlapMatrix: unordered pair counts over distinct (source, key)") {
    val df = Seq(
      ("s1", 1L), ("s1", 2L), ("s2", 1L), ("s2", 1L), // dup row collapses
      ("s3", 1L), ("s3", 2L)
    ).toDF("source", "h")
    val out = Dedup.overlapMatrix(df, "source", "h")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("s1", "s2") -> 1L, ("s1", "s3") -> 2L, ("s2", "s3") -> 1L))
  }
}
