package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling: images/audio/video as opaque `binary`
 * columns with typed metadata, plus partition-wise decode / feature
 * extraction.
 *
 * Design: media content travels as `BinaryType` next to a metadata
 * struct ([[MediaMeta]]); cheap facts (byte length, digest) are pure
 * codegen'd Column expressions; decode-dependent work runs per
 * PARTITION over batches ([[extractFeatures]]) so a real decoder
 * amortizes model/codec init per partition, not per row — the Scala
 * analogue of `mapInPandas` batch processing.
 *
 * IMAGE decode is REAL: [[ImageIoDecoder]]/[[ImageIoResizer]] bind
 * `javax.imageio` (in every JDK, headless-safe — PNG/JPEG/BMP/GIF).
 * AUDIO decode is REAL for WAV/PCM: [[WavDecoder]] binds
 * `javax.sound.sampled`. Video decode remains a clearly-marked STUB
 * ([[FakeDecoder]] produces deterministic pseudo-features from the
 * bytes — no video codec ships with the JDK) so the Spark-side
 * plumbing — schema, partitioning, batch shape, encoders — is real
 * and testable for every modality. Swap [[Decoder]] for a JNI/FFI
 * codec binding for the rest.
 */
object Multimodal {

  /** Typed metadata carried alongside the binary payload. Dimensions
   *  are optional — unknown until decode. */
  final case class MediaMeta(mime: String, width: Option[Int],
                             height: Option[Int], durationMs: Option[Long])

  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, n_bytes: Long, digest: String,
                                 features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("durationMs", LongType, nullable = true))), nullable = true)))

  /** Payload byte length — codegen'd, no decode. */
  def byteLength(content: Column): Column = length(content).cast("long")

  /** Content digest (md5 hex) — codegen'd, no decode. */
  def digest(content: Column): Column = md5(content)

  /** Attach a binary payload + metadata struct to an id column;
   *  `payload` may be any column castable to binary. */
  def attach(df: DataFrame, idCol: String, payload: Column, mime: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      payload.cast("binary").as("content"),
      struct(lit(mime).as("mime"), lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("durationMs")).as("meta"))

  /** Decoder contract: bytes → fixed-width feature vector. A real
   *  implementation binds an image/audio codec; init in [[open]] runs
   *  once per partition. */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(content: Array[Byte], dim: Int): Array[Float]
  }

  /**
   * REAL image decoder over `javax.imageio` (PNG/JPEG/BMP/GIF — the
   * readers every JDK ships, no display needed). Features are exact,
   * hand-computable channel-stripe means: with `B = dim/3` spatial
   * buckets, pixel `p` (row-major) lands in bucket `j = p·B/nPixels`,
   * and `out(3j+c)` is the mean of channel `c` (R,G,B order) over the
   * bucket's pixels, normalized to [0,1] by /255. Payloads ImageIO
   * cannot parse (or empty) yield the zero vector — one corrupt file
   * in a 100 TB corpus must cost a zero row, never the job.
   */
  final class ImageIoDecoder extends Decoder {
    override def open(): Unit =
      // no temp-file cache: decode stays in-memory per task
      javax.imageio.ImageIO.setUseCache(false)
    def decode(content: Array[Byte], dim: Int): Array[Float] = {
      require(dim % 3 == 0 && dim > 0, s"image feature dim must be a multiple of 3, got $dim")
      val out = new Array[Float](dim)
      if (content.isEmpty) return out
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case _: java.io.IOException => null }
      if (img == null) return out
      val (w, h) = (img.getWidth, img.getHeight)
      val buckets = dim / 3
      val counts = new Array[Int](buckets)
      var p = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val j = (p.toLong * buckets / (w.toLong * h)).toInt
          out(3 * j) += ((rgb >> 16) & 0xff)
          out(3 * j + 1) += ((rgb >> 8) & 0xff)
          out(3 * j + 2) += (rgb & 0xff)
          counts(j) += 1
          p += 1; x += 1
        }
        y += 1
      }
      var j = 0
      while (j < buckets) {
        if (counts(j) > 0) {
          val norm = 255f * counts(j)
          out(3 * j) /= norm; out(3 * j + 1) /= norm; out(3 * j + 2) /= norm
        }
        j += 1
      }
      out
    }
  }

  /**
   * REAL audio decoder over `javax.sound.sampled` (WAV/PCM and the
   * other formats the JDK's AudioSystem readers handle — headless, no
   * native codecs). Features are exact, hand-computable bucketed RMS
   * amplitudes: frames (first channel) normalize to [-1,1] by the
   * sample-format max, split into `dim` equal time buckets (frame `f`
   * → bucket `f·dim/nFrames`), and `out(b)` is the root-mean-square
   * of bucket `b` — the standard cheap envelope signal for silence
   * trimming, clipping detection, and segment-level filtering.
   * Unparsable or empty payloads yield the zero vector — the same
   * corrupt-file posture as [[ImageIoDecoder]]. Supports 8/16-bit PCM
   * (signed and unsigned), the formats WAV corpora actually carry.
   */
  final class WavDecoder extends Decoder {
    def decode(content: Array[Byte], dim: Int): Array[Float] = {
      require(dim > 0, s"audio feature dim must be positive, got $dim")
      val out = new Array[Float](dim)
      if (content.isEmpty) return out
      val stream =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (stream == null) return out
      try {
        val fmt = stream.getFormat
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val frameSize = fmt.getFrameSize
        val signed = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        // LINEAR PCM only: companded encodings (ULAW/ALAW) would pass
        // the size checks but decode to garbage if treated as linear —
        // they take the corrupt-file zero-vector path instead
        if (!(signed || unsigned) ||
          bytesPerSample < 1 || bytesPerSample > 2 || frameSize <= 0) return out
        val bytes = stream.readAllBytes()
        val nFrames = bytes.length / frameSize
        if (nFrames == 0) return out
        val sums = new Array[Double](dim)
        val counts = new Array[Int](dim)
        val big = fmt.isBigEndian
        var f = 0
        while (f < nFrames) {
          val o = f * frameSize // first channel only
          val raw =
            if (bytesPerSample == 1)
              if (signed) bytes(o).toInt else (bytes(o) & 0xff) - 128
            else {
              val (b0, b1) = if (big) (bytes(o), bytes(o + 1)) else (bytes(o + 1), bytes(o))
              // assemble UNSIGNED first: sign-extending the high byte
              // before re-centering would map the upper half of an
              // unsigned waveform to [-2,-1)
              val u = ((b0 & 0xff) << 8) | (b1 & 0xff)
              if (signed) u.toShort.toInt else u - 32768
            }
          val norm = raw.toDouble / (if (bytesPerSample == 1) 128.0 else 32768.0)
          val b = (f.toLong * dim / nFrames).toInt
          sums(b) += norm * norm
          counts(b) += 1
          f += 1
        }
        var b = 0
        while (b < dim) {
          if (counts(b) > 0) out(b) = math.sqrt(sums(b) / counts(b)).toFloat
          b += 1
        }
        out
      } finally stream.close()
    }
  }

  /** STUB decoder for modalities WITHOUT a JDK codec (video) —
   *  deterministic pseudo-features from a rolling hash of the payload
   *  bytes. The plumbing around it (schema/partitioning/batching) is
   *  production-shaped; only this class is fake. Images have the real
   *  [[ImageIoDecoder]]; WAV audio the real [[WavDecoder]]. */
  object FakeDecoder extends Decoder {
    def decode(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0L
      var i = 0
      while (i < content.length) {
        h = (h * 31 + (content(i) & 0xff)) % 1000000007L
        out(i % dim) += ((h % 256).toFloat / 256f)
        i += 1
      }
      out
    }
  }

  /**
   * Partition-wise feature extraction: decoder opens once per
   * partition, then maps the partition's records — the batch shape a
   * real codec needs. Narrow (no shuffle); scales with partition count.
   */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int,
                      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      decoder.open() // per-partition init (codec/model load)
      it.map { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        MediaFeatures(r.media_id, bytes.length.toLong,
          java.security.MessageDigest.getInstance("MD5").digest(bytes)
            .map("%02x".format(_)).mkString,
          decoder.decode(bytes, dim))
      }
    }
  }

  /** Resizer contract: payload bytes → payload bytes at the target
   *  dimensions. A real implementation binds an image codec; init in
   *  [[open]] runs once per partition. */
  trait Resizer extends Serializable {
    def open(): Unit = ()
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** REAL image resizer over `javax.imageio` + `BufferedImage`:
   *  decode, nearest-neighbor scale onto a TYPE_INT_RGB canvas
   *  (deterministic — no interpolation variance across JVMs), re-encode
   *  as PNG (lossless, so resized pixels are exactly recoverable by
   *  [[ImageIoDecoder]]). Unparsable payloads pass through unchanged —
   *  same corrupt-file posture as decode. */
  final class ImageIoResizer extends Resizer {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0, s"target dims must be positive: ${width}x$height")
      if (content.isEmpty) return content
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case _: java.io.IOException => null }
      if (img == null) return content
      val outImg = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = outImg.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, width, height, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(outImg, "png", bos)
      bos.toByteArray
    }
  }

  /** STUB resizer for modalities WITHOUT a JDK codec — deterministic
   *  index-scaled byte resampling; output size ∝ target pixel count,
   *  so downstream size accounting behaves realistically. Images have
   *  the real [[ImageIoResizer]]. */
  object FakeResizer extends Resizer {
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val target = math.max(1, width * height / 64)
      Array.tabulate(target)(i =>
        if (content.isEmpty) 0.toByte
        else content((i.toLong * content.length / target).toInt))
    }
  }

  /** Partition-wise resize: codec opens once per partition; metadata
   *  dimensions update alongside the payload. Narrow — no shuffle. */
  def resize(ds: Dataset[MediaRecord], width: Int, height: Int,
             resizer: Resizer = FakeResizer): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      resizer.open()
      it.map { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        val meta = if (r.meta == null)
          MediaMeta("application/octet-stream", None, None, None) else r.meta
        MediaRecord(r.media_id, resizer.resize(bytes, width, height),
          meta.copy(width = Some(width), height = Some(height)))
      }
    }
  }

  /** Per-image perceptual-hash record: `dhash_bits` is the
   *  `(gridW−1)·gridH`-char bitstring (bit index `y·(gridW−1)+x`
   *  ascending), `dhash` the same bits packed into one long (bit 63
   *  may set — the value is a BIT PATTERN, not a number). Unparsable
   *  or empty payloads carry None throughout — a corrupt file must
   *  cost a null row, never the job, and nulls are excluded from
   *  pairing ([[graft.llm.Dedup.hammingPairs]]). */
  final case class MediaHash(media_id: Long, dhash_bits: Option[String],
                             dhash: Option[Long], width: Option[Int],
                             height: Option[Int])

  /**
   * Difference hash (dHash) over REAL decoded pixels — the standard
   * perceptual fingerprint for image near-dup dedup (resize-, codec-
   * and brightness-shift-tolerant; a training-corpus pipeline dedups
   * images by dHash/pHash the way it dedups text by SimHash). The
   * image reduces to a `gridW×gridH` gray grid by EXACT integer area
   * pooling — pixel `(x,y)` lands in cell `(x·gridW/w, y·gridH/h)`,
   * cell value = `sum(gray)/count` in integer math, gray =
   * `(r+g+b)/3` of the sRGB pixel — then bit `y·(gridW−1)+x` is set
   * iff `cell(x+1,y) > cell(x,y)`. Every step is integer arithmetic
   * over decoded pixels, so the hash is a pure function of image
   * content: reproducible across JVMs and engines (no interpolation
   * variance — the reason for area pooling over `Graphics2D` scaling).
   * Images already at `gridW×gridH` hash their raw pixels (pooling is
   * identity), which is what lets an external oracle replay the gate.
   *
   * Per-partition decode, narrow, no shuffle — the same batch shape
   * as [[extractFeatures]]. Images smaller than the grid leave the
   * uncovered cells at 0 (defined, documented; dedup compares like
   * against like within a corpus).
   */
  def imageDHash(ds: Dataset[MediaRecord], gridW: Int = 9,
                 gridH: Int = 8): Dataset[MediaHash] = {
    require(gridW >= 2 && gridH >= 1, s"grid must be >= 2x1: ${gridW}x$gridH")
    require((gridW - 1) * gridH <= 64,
      s"dhash must fit a long: (${gridW}-1)*$gridH > 64 bits")
    val spark = ds.sparkSession
    import spark.implicits._
    // spread (r19): the decode loop below is pure per-row CPU — a
    // single-split input would run it on one task (guide §2.5)
    graft.core.Par.spread(ds).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        val img =
          if (bytes.isEmpty) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        if (img == null) MediaHash(r.media_id, None, None, None, None)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Long](gridW * gridH)
          val counts = new Array[Long](gridW * gridH)
          var y = 0
          while (y < h) {
            val cy = (y.toLong * gridH / h).toInt
            var x = 0
            while (x < w) {
              val cx = (x.toLong * gridW / w).toInt
              val rgb = img.getRGB(x, y)
              val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              sums(cy * gridW + cx) += gray
              counts(cy * gridW + cx) += 1
              x += 1
            }
            y += 1
          }
          def cell(cx: Int, cy: Int): Long = {
            val i = cy * gridW + cx
            if (counts(i) == 0) 0L else sums(i) / counts(i)
          }
          val bits = new StringBuilder((gridW - 1) * gridH)
          var packed = 0L
          var cy = 0
          while (cy < gridH) {
            var cx = 0
            while (cx < gridW - 1) {
              val set = cell(cx + 1, cy) > cell(cx, cy)
              bits.append(if (set) '1' else '0')
              if (set) packed |= 1L << (cy * (gridW - 1) + cx)
              cx += 1
            }
            cy += 1
          }
          MediaHash(r.media_id, Some(bits.toString), Some(packed),
            Some(w), Some(h))
        }
      }
    }
  }

  /** Per-clip audio fingerprint: `fp_bits`/`fp` as [[MediaHash]]'s
   *  dhash fields (bit index = bucket, ascending); None for
   *  unparsable/non-linear-PCM payloads. */
  final case class AudioFingerprint(media_id: Long, fp_bits: Option[String],
                                    fp: Option[Long], n_frames: Option[Long])

  /** Exact `a·b > c·d` for non-negative longs via 128-bit products
   *  (`Math.multiplyHigh` + unsigned low-word compare) — no overflow
   *  at any operand size, no BigInt allocation in the per-bucket loop. */
  private[llm] def productGreater(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /**
   * Envelope fingerprint over REAL decoded PCM — the audio analogue
   * of [[imageDHash]] for near-dup dedup: frames (first channel)
   * split into `buckets` equal time buckets, and bucket `b`'s bit is
   * set iff its mean |amplitude| exceeds the clip's global mean,
   * compared in EXACT integer cross-multiplication
   * (`sum_b·count_global > sum_global·count_b` — no division, no
   * floats), so the fingerprint is a pure function of the samples:
   * reproducible across JVMs and replayable by an external engine
   * from the same PCM values (WAV PCM round-trips bit-exactly, which
   * is what lets the q117 oracle recompute it without decoding).
   * Loudness-scale-INVARIANT in the exact sense only (integer
   * comparisons survive exact scaling; real-world gain changes
   * survive approximately — the standard envelope-hash trade). Same
   * linear-PCM-only posture as [[WavDecoder]]: 8/16-bit
   * signed/unsigned, companded encodings take the None path. Pair
   * with [[graft.llm.Dedup.hammingPairs]] on `fp`.
   */
  def audioFingerprint(ds: Dataset[MediaRecord],
                       buckets: Int = 64): Dataset[AudioFingerprint] = {
    require(buckets >= 1 && buckets <= 64,
      s"fingerprint must fit a long: buckets=$buckets")
    val spark = ds.sparkSession
    import spark.implicits._
    // spread (r19): the decode loop below is pure per-row CPU — a
    // single-split input would run it on one task (guide §2.5)
    graft.core.Par.spread(ds).mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        val stream =
          if (bytes.isEmpty) null
          else try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => null
            case _: java.io.IOException => null
          }
        if (stream == null) AudioFingerprint(r.media_id, None, None, None)
        else try {
          val fmt = stream.getFormat
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val frameSize = fmt.getFrameSize
          val signed = fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (!(signed || unsigned) ||
            bytesPerSample < 1 || bytesPerSample > 2 || frameSize <= 0)
            AudioFingerprint(r.media_id, None, None, None)
          else {
            val pcm = stream.readAllBytes()
            val nFrames = pcm.length / frameSize
            if (nFrames == 0) AudioFingerprint(r.media_id, None, None, None)
            else {
              val sums = new Array[Long](buckets)
              val counts = new Array[Long](buckets)
              var globalSum = 0L
              val big = fmt.isBigEndian
              var f = 0
              while (f < nFrames) {
                val o = f * frameSize // first channel only
                val raw =
                  if (bytesPerSample == 1)
                    if (signed) pcm(o).toInt else (pcm(o) & 0xff) - 128
                  else {
                    val (b0, b1) =
                      if (big) (pcm(o), pcm(o + 1)) else (pcm(o + 1), pcm(o))
                    val u = ((b0 & 0xff) << 8) | (b1 & 0xff)
                    if (signed) u.toShort.toInt else u - 32768
                  }
                val amp = math.abs(raw.toLong)
                val b = (f.toLong * buckets / nFrames).toInt
                sums(b) += amp
                counts(b) += 1
                globalSum += amp
                f += 1
              }
              val bits = new StringBuilder(buckets)
              var packed = 0L
              var b = 0
              while (b < buckets) {
                // mean_b > mean_global without division: exact integer
                // compare. 32768·nFrames² outgrows a long past ~16M
                // frames (~6 min at 44.1 kHz), so compare the full
                // 128-bit products — exact at any clip length
                val set = productGreater(sums(b), nFrames, globalSum, counts(b))
                bits.append(if (set) '1' else '0')
                if (set) packed |= 1L << b
                b += 1
              }
              AudioFingerprint(r.media_id, Some(bits.toString), Some(packed),
                Some(nFrames.toLong))
            }
          }
        } finally stream.close()
      }
    }
  }

  /** Deterministic 16-bit signed little-endian mono WAV encoder —
   *  fixture generator for decode-path gates and tests (PCM
   *  round-trips bit-exactly); real corpora bring their own bytes. */
  def pcmWav(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic RGB PNG encoder (TYPE_INT_RGB — sRGB in, sRGB
   *  out, no gray-colorspace gamma conversion, and PNG is lossless,
   *  so decode recovers `pixel(x,y)` exactly). Fixture generator for
   *  decode-path gates and tests; real corpora bring their own
   *  bytes. */
  def rgbPng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /**
   * Frame sampling stub for video payloads: emits `n` (frame_index,
   * offset) pairs per record — the real implementation would seek the
   * container; offsets here are deterministic byte positions so the
   * 1→N row expansion (the expensive part at scale) is real.
   */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.select(col("media_id"), byteLength(col("content")).as("__len"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i => i)))
      .select(col("media_id"), col("pos").cast("long").as("frame_index"),
        (col("col").cast("long") * col("__len") / n).cast("long").as("byte_offset"))
}
