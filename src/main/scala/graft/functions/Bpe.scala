package graft.functions

/**
 * Byte-level Byte-Pair Encoding: a REAL merges-table subword tokenizer
 * (Sennrich et al. 2016, the GPT-2 byte-level variant — both public
 * algorithms), pure Scala, no network, no external model files. The
 * reference has no tokenizer (goetl has no text operators at all);
 * this exists because token BUDGETS drive training-data pipelines —
 * sequence packing and shard sizing are only trustworthy if the count
 * comes from an actual merges table, not a regex proxy.
 *
 * Shape of the algorithm:
 *  1. Pre-tokenize text into words (GPT-2-shaped regex: contraction
 *     suffixes, optionally-space-prefixed letter/digit/punct runs).
 *  2. Map each word's UTF-8 bytes through the reversible byte→char
 *     table (every byte gets a printable char, so merges are plain
 *     string concatenation and any byte sequence round-trips).
 *  3. Repeatedly merge the adjacent symbol pair with the LOWEST merge
 *     rank until no ranked pair remains.
 *
 * Training (classic BPE): count adjacent pairs over the word-frequency
 * table, merge the most frequent pair everywhere, repeat. Ties break
 * lexicographically on the pair — training is a pure function of
 * (corpus, numMerges), so a vocab is reproducible from its inputs.
 *
 * Everything here is driver/executor-side plain Scala; the Spark
 * surface (a UDF over a broadcast-captured vocab) lives in
 * [[graft.llm.TextAnalysis.bpeTokenCountExact]].
 */
object Bpe {

  /** A trained tokenizer: ordered merge list (rank = position). */
  final case class BpeVocab(merges: Vector[(String, String)]) extends Serializable {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
    /** Per-JVM encode memo: pre-token → merged symbols. Natural text
     *  is Zipf-distributed — a few thousand distinct words cover the
     *  vast majority of occurrences, so memoizing the per-word merge
     *  loop (quadratic in word length, rank lookups per pass) turns
     *  most encode calls into one hash probe. The vocab instance
     *  itself is deserialized PER TASK on the codegen path (it rides
     *  the expression tree inside the stage's task binary), so an
     *  instance-local map would restart empty every task — the lazy
     *  val instead resolves ONCE per instance to a JVM-wide cache
     *  keyed by the merges table ([[Bpe.sharedEncodeCache]]): all
     *  tasks of all stages share one memo per distinct vocab.
     *  SIZE-BOUNDED — adversarial unique-word streams stop inserting
     *  at the cap instead of growing executor heap. Pure memoization:
     *  sharing/capping never changes results. */
    @transient private[functions] lazy val encodeCache =
      sharedEncodeCache(merges)
    /** Compact form — the default case-class toString would dump the
     *  whole merges table into every plan/explain string that renders
     *  an expression carrying the vocab. */
    override def toString: String = s"BpeVocab(${merges.length} merges)"
  }

  /** Encode-cache cap (distinct pre-tokens per vocab per JVM): ~64k
   *  words × ~100 B ≈ a few MB — noise next to executor memory. */
  private val EncodeCacheMax = 65536

  /** JVM-wide encode-cache registry, keyed by the merges table (full
   *  value equality — two vocabs share a memo only when their merges
   *  are identical, so sharing can never change a result). The key
   *  hash is O(merges) but computed once per deserialized vocab
   *  instance (the lazy val holds the resolved reference), i.e. once
   *  per task — negligible. Registry bounded at [[MaxCachedVocabs]]
   *  distinct tables; beyond that, later vocabs fall back to a
   *  private (per-instance) memo rather than evicting a hot one. */
  private val encodeCaches = new java.util.concurrent.ConcurrentHashMap[
    Vector[(String, String)],
    java.util.concurrent.ConcurrentHashMap[String, Vector[String]]]()
  private val MaxCachedVocabs = 16
  private def sharedEncodeCache(merges: Vector[(String, String)])
      : java.util.concurrent.ConcurrentHashMap[String, Vector[String]] = {
    val hit = encodeCaches.get(merges)
    if (hit != null) hit
    else encodeCaches.synchronized { // size check + insert must be atomic
      // or N racing tasks could push the registry past the bound
      val again = encodeCaches.get(merges)
      if (again != null) again
      else if (encodeCaches.size >= MaxCachedVocabs)
        new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()
      else {
        val fresh = new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()
        encodeCaches.put(merges, fresh)
        fresh
      }
    }
  }

  /** GPT-2-shaped pre-tokenizer. Java regex (driver/executor side —
   *  RE2 portability does not apply; no oracle replays this). */
  private val PreToken = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

  private[functions] def preTokens(text: String): Vector[String] = {
    val m = PreToken.matcher(text)
    val buf = Vector.newBuilder[String]
    while (m.find()) buf += m.group()
    buf.result()
  }

  /** Reversible byte→printable-char table (GPT-2 bytes_to_unicode):
   *  visible latin ranges map to themselves, every other byte gets a
   *  codepoint from 256 upward — so a "symbol" is always a non-empty
   *  printable string and concatenation never collides. */
  private[functions] val byteToChar: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val arr = new Array[Char](256)
    var next = 0
    (0 until 256).foreach { b =>
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + next).toChar; next += 1 }
    }
    arr
  }
  private[functions] val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  private def toSymbols(word: String): Vector[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .iterator.map(b => byteToChar(b & 0xff).toString).toVector

  /** Apply the merges table to one word's symbol sequence: always the
   *  LOWEST-rank (earliest-learned) pair present, all its occurrences
   *  left-to-right, until no ranked pair remains. */
  private[functions] def mergeWord(word: Vector[String], vocab: BpeVocab): Vector[String] = {
    var w = word
    while (w.length >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < w.length - 1) {
        vocab.rank.get((w(i), w(i + 1))).foreach(r => if (r < best) best = r)
        i += 1
      }
      if (best == Int.MaxValue) return w
      val (p1, p2) = vocab.merges(best)
      val buf = Vector.newBuilder[String]
      i = 0
      while (i < w.length) {
        if (i < w.length - 1 && w(i) == p1 && w(i + 1) == p2) { buf += p1 + p2; i += 2 }
        else { buf += w(i); i += 1 }
      }
      w = buf.result()
    }
    w
  }

  /** Tokenize: subword strings in the byte-mapped alphabet. Null-safe
   *  (null → empty, matching SQL semantics at the UDF boundary). */
  def encode(text: String, vocab: BpeVocab): Vector[String] =
    if (text == null) Vector.empty
    else preTokens(text).flatMap { pt =>
      val hit = vocab.encodeCache.get(pt)
      if (hit != null) hit
      else {
        val m = mergeWord(toSymbols(pt), vocab)
        if (vocab.encodeCache.size < EncodeCacheMax) vocab.encodeCache.put(pt, m)
        m
      }
    }

  def tokenCount(text: String, vocab: BpeVocab): Long = encode(text, vocab).length.toLong

  /** Invert [[encode]]: concatenate tokens, map chars back to bytes,
   *  decode UTF-8 — the roundtrip property every byte-level BPE must
   *  satisfy (tested over arbitrary unicode input). */
  def decode(tokens: Seq[String]): String = {
    val bytes = tokens.iterator.flatMap(_.iterator).map(c => charToByte(c).toByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /**
   * Train a merges table: greedy most-frequent-adjacent-pair, ties by
   * ascending pair order (deterministic — training is a pure function
   * of (corpus, numMerges)). Stops early when no pair occurs twice —
   * learning singleton merges would just memorize the corpus.
   *
   * The pair-count table is maintained INCREMENTALLY: each merge
   * rewrites only the words that actually contain the chosen pair
   * (tracked by an inverted pair→words index) and adjusts their pair
   * contributions, instead of recounting the whole corpus — the
   * classic fast-BPE formulation. Cost per merge = scan of the live
   * pair table (for the deterministic arg-max) + rewrite of the
   * affected words, which makes REALISTIC vocab sizes (5k+ merges)
   * train in seconds where the naive recount was O(merges × corpus).
   * Training still runs single-JVM: a merges table is trained once and
   * shipped as data; what must scale to 100 TB is ENCODE (the codegen
   * expressions), not training.
   */
  def train(corpus: Seq[String], numMerges: Int): BpeVocab = {
    val freqMap = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    corpus.foreach(preTokens(_).foreach(w =>
      freqMap.update(w, freqMap.getOrElse(w, 0L) + 1L)))
    trainFromFreqs(freqMap.toSeq, numMerges)
  }

  /**
   * Train from a PRE-COUNTED word-frequency table — the entry point
   * for corpus-scale training: counting pre-token frequencies over
   * 100 TB is a distributed one-pass aggregation
   * ([[graft.llm.TextAnalysis.bpeTrainFromCorpus]]), while the merge
   * loop below only ever touches the BOUNDED vocabulary (Heaps' law:
   * natural-language corpora hold ~1e5–1e7 distinct pre-tokens
   * regardless of corpus bytes), so it runs driver-side on a table of
   * megabytes. The result is invariant to the ORDER of `wordFreqs`
   * (the arg-max scan is totally ordered), so any deterministic
   * upstream aggregation yields the identical merges table.
   */
  def trainFromFreqs(wordFreqs: Seq[(String, Long)], numMerges: Int): BpeVocab = {
    import scala.collection.mutable
    // index-addressed words so the inverted pair index stays cheap.
    // Two distinct words can never evolve into the same symbol
    // sequence (the concatenation always spells the original word),
    // so no re-aggregation is ever needed.
    val words = mutable.ArrayBuffer.empty[Vector[String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    wordFreqs.foreach { case (w, c) => words += toSymbols(w); freqs += c }

    val pairCounts = mutable.Map.empty[(String, String), Long]
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def addWord(idx: Int): Unit = {
      val w = words(idx); val c = freqs(idx)
      var i = 0
      while (i < w.length - 1) {
        val p = (w(i), w(i + 1))
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
        pairWords.getOrElseUpdate(p, mutable.Set.empty) += idx
        i += 1
      }
    }
    def removeWord(idx: Int): Unit = {
      val w = words(idx); val c = freqs(idx)
      var i = 0
      while (i < w.length - 1) {
        val p = (w(i), w(i + 1))
        val left = pairCounts(p) - c
        if (left <= 0L) { pairCounts.remove(p); pairWords.remove(p) }
        else { pairCounts.update(p, left); pairWords(p) -= idx }
        i += 1
      }
    }
    words.indices.foreach(addWord)

    val merges = Vector.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < numMerges && !done) {
      // deterministic arg-max: highest count, ties by ascending pair —
      // a full scan (not a heap) so the winner never depends on map
      // iteration order or mutation history
      var best: (String, String) = null
      var bestC = 1L // a learnable pair must occur at least twice
      pairCounts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
          { best = p; bestC = c }
      }
      if (best == null) done = true
      else {
        val (p1, p2) = best
        merges += best
        val merged = p1 + p2
        // rewrite ONLY the words containing the pair; snapshot+sort the
        // index set before mutating it (rewrites are per-word
        // independent, sorted order keeps instrumentation reproducible)
        pairWords.get(best).map(_.toArray.sorted).getOrElse(Array.empty[Int])
          .foreach { idx =>
            removeWord(idx)
            val w = words(idx)
            val buf = Vector.newBuilder[String]
            var i = 0
            while (i < w.length) {
              if (i < w.length - 1 && w(i) == p1 && w(i + 1) == p2) { buf += merged; i += 2 }
              else { buf += w(i); i += 1 }
            }
            words(idx) = buf.result()
            addWord(idx)
          }
        n += 1
      }
    }
    BpeVocab(merges.result())
  }

  /** Embedded training sample for the default vocab: ORIGINAL plain
   *  English prose written for this repository (no copied corpus, no
   *  downloaded model). ~1 KB is enough for a few hundred merges of
   *  common English subwords — the default vocab exists so token
   *  counts are REAL BPE outputs out of the box; serious pipelines
   *  pass their own trained vocab. */
  private[functions] val SampleText: String =
    """The engine reads records from many sources and writes them back
      |to many sinks. Each record moves through the plan as a row, and
      |the planner decides where the work runs. When the data grows, the
      |partitions split and the shuffle carries only the keys that the
      |join needs. A filter that runs early saves the scan from reading
      |columns that nobody asked for. The same idea repeats at every
      |scale: count what you must, skip what you can, and never move
      |bytes twice when once will do. Training corpora arrive as text,
      |and the text becomes tokens, and the tokens become batches that
      |fill a context window. If the counter lies about the tokens, the
      |batches overflow or waste space, so the counter has to run the
      |same merges the model will run. Deduplication removes the pages
      |that repeat, the language filter keeps the words it knows, and
      |the quality score ranks what remains. What is left packs into
      |shards of nearly equal size, and the shards feed the trainers,
      |and the trainers do not care how hard that was. They never do.
      |""".stripMargin

  /** Default vocab: up to 256 merges trained on [[SampleText]]
   *  (training stops when no pair repeats) — computed once per JVM,
   *  deterministic (pure function of the embedded text). */
  lazy val DefaultVocab: BpeVocab = train(Seq(SampleText), 256)
}
