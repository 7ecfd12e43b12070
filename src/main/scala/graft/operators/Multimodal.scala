package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample stages.
 *
 * The image decode is REAL: PNG/JPEG/GIF/BMP via the JDK's `javax.imageio`
 * (no external dependency), producing width/height and per-channel pixel
 * means. Audio metadata (sample rate / channels / duration) is likewise real
 * for WAV/AU/AIFF via `javax.sound.sampled`. Video remains a chunk-level
 * frame sampler (the JDK ships no video codec); payloads the JDK cannot
 * decode fall back to deterministic byte-derived features so the batch shape
 * stays total.
 *
 * Scale design: binary payloads stay opaque until the per-partition decode
 * stage (`mapPartitions`, the Scala analog of `mapInPandas` batch UDFs);
 * metadata extraction is pure expression level so pruning/pushdown still
 * work; `spark.sql.files.maxPartitionBytes` bounds decode batch memory.
 */
object Multimodal {

  // The JDK default `ImageIO.useCache = true` backs EVERY image input/output
  // stream with a temp FILE on disk — per tiny per-row image, per task, this
  // round-trips the filesystem and serializes on temp-dir creation. All our
  // payloads are in-memory byte arrays, so force the memory-cache streams
  // once per JVM (executors hit this on classload of the first decode
  // closure). Applies to ImageIO.read/write AND createImage{Input,Output}
  // Stream used by the GIF frame sampler.
  ImageIO.setUseCache(false)

  /** Media asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = true),
      StructField("content_md5", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Expression-level metadata over a binary column — no decode needed, fully
    * codegen'd: byte length + content hash. */
  def withByteMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast(LongType))
      .withColumn("content_md5", md5(col(payloadCol)))

  /** One decoded image: dimensions + exact per-channel pixel means (0..255). */
  final case class DecodedImage(id: Long, width: Option[Int], height: Option[Int],
                                mean_r: Option[Double], mean_g: Option[Double],
                                mean_b: Option[Double])

  /** One probed audio clip (WAV/AU/AIFF header + PCM frame count). */
  final case class DecodedAudio(id: Long, sample_rate: Option[Double],
                                channels: Option[Int], frames: Option[Long],
                                duration_ms: Option[Double])

  /** Sample-level PCM statistics for one clip. */
  final case class AudioStats(id: Long, n_samples: Option[Long],
                              sum_sq: Option[Long], peak: Option[Long],
                              zero_crossings: Option[Long], rms: Option[Double])

  /** Encode a solid-colour PNG with the JDK encoder — used by tests and the
    * oracle round-trip query (PNG is lossless, so channel means are exact). */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val row = Array.fill(width)(rgb)
    var y = 0
    while (y < height) { img.setRGB(0, y, width, 1, row, 0, width); y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image decode via `javax.imageio`: None when the payload is not a
    * decodable image (wrong magic, truncated, or an unsupported codec). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      // bulk pixel fetch per row bounds memory at O(width), not O(pixels)
      var sr = 0L; var sg = 0L; var sb = 0L
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val p = rowBuf(x)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    } catch { case _: Exception => None }
  }

  /** Real audio probe via `javax.sound.sampled` (WAV/AU/AIFF in the JDK). */
  def decodeAudio(payload: Array[Byte]): Option[(Double, Int, Long, Double)] = {
    if (payload == null || payload.length == 0) return None
    var in: AudioInputStream = null
    try {
      in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val rate = fmt.getSampleRate.toDouble
      if (rate <= 0 || frames < 0) return None
      Some((rate, fmt.getChannels, frames, frames * 1000.0 / rate))
    } catch { case _: Exception => None }
    finally { if (in != null) in.close() }
  }

  /** Per-partition batch image decode: (id, width, height, mean_r/g/b), null
    * metadata for undecodable payloads. One decode loop per partition — the
    * mapInPandas batch shape — so codec setup cost amortizes and binary
    * columns never enter a shuffle wider than the scan partitioning. */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payload) =>
          decodeImage(payload) match {
            case Some((w, h, r, g, b)) =>
              DecodedImage(id, Some(w), Some(h), Some(r), Some(g), Some(b))
            case None => DecodedImage(id, None, None, None, None, None)
          }
        }
      }.toDF()
  }

  /** 64-cell average hash (aHash) of an image — the standard perceptual
    * fingerprint for image dedup: nearest-neighbor-sample the picture to
    * an 8×8 grid (the same floor mapping as [[resizeImage]]), take the
    * integer gray value r+g+b per cell, and set bit i when
    * gray_i·64 ≥ Σgray (an EXACT integer threshold — no division, no
    * float mean). The hash rides as a 64-char '0'/'1' string: bit 63 of a
    * signed long overflows engines differently, a string never does, and
    * equality-grouping (the dedup key) is identical either way. Returns
    * None for undecodable payloads. */
  def perceptualHash(payload: Array[Byte], hw: Int = 8, hh: Int = 8): Option[String] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
      val n = hw * hh
      val gray = new Array[Long](n)
      val srcRow = new Array[Int](img.getWidth)
      var total = 0L
      var ty = 0
      while (ty < hh) {
        val sy = ty * img.getHeight / hh
        img.getRGB(0, sy, img.getWidth, 1, srcRow, 0, img.getWidth)
        var tx = 0
        while (tx < hw) {
          val p = srcRow(tx * img.getWidth / hw)
          val g = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          gray(ty * hw + tx) = g
          total += g
          tx += 1
        }
        ty += 1
      }
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) {
        sb.append(if (gray(i) * n >= total) '1' else '0')
        i += 1
      }
      Some(sb.toString)
    } catch { case _: Exception => None }
  }

  /** Per-partition batch perceptual hashing: (id, phash), null for
    * undecodable payloads. Same mapPartitions batch shape as
    * [[decodeImages]] — the corpus-scale image dedup pass is then ONE
    * phash groupBy (exact-duplicate clusters) or a banded Hamming join on
    * hash substrings (near-duplicate clusters), with the binary payloads
    * never entering a shuffle. */
  def perceptualHashes(df: DataFrame, idCol: String, payloadCol: String,
                       hw: Int = 8, hh: Int = 8)
                      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payload) => (id, perceptualHash(payload, hw, hh)) }
      }.toDF("id", "phash")
  }

  /** Banded Hamming near-duplicate pairs over a perceptual-hash column —
    * the LSH trick transplanted to bit space: split the 64-bit hash into
    * `bands` equal substrings; two images within Hamming distance d must
    * share at least one band verbatim whenever d < bands (pigeonhole), so
    * candidates are ONE equality join on (band index, band bits) — never
    * all pairs — and the exact Hamming distance then filters candidates.
    * Returns (id_a, id_b, hamming) with id_a < id_b, distance ≤ maxDist.
    * At corpus scale the band join's collision volume is the near-dup
    * rate, not N²; the 64-char hashes are the only payload shuffled. */
  def phashNearDups(ph: DataFrame, idCol: String, phashCol: String,
                    bands: Int = 4, maxDist: Int = 3,
                    hashBits: Int = 64): DataFrame = {
    require(bands >= 1 && hashBits % bands == 0, s"bands must divide $hashBits")
    require(maxDist < bands, "pigeonhole guarantee needs maxDist < bands")
    val bandLen = hashBits / bands
    require(bandLen <= 62, "band substrings must parse into a signed long")
    // band bit-substrings parse to ints ONCE PER IMAGE, so the per-pair
    // Hamming is bands × (xor + popcount) — codegen'd primitives, not an
    // interpreted 64-char comparison fold per candidate
    val ints = array((0 until bands).map(b =>
      conv(substring(col("__ph"), b * bandLen + 1, bandLen), 2, 10)
        .cast(LongType)): _*)
    val base = ph.select(col(idCol).cast(LongType).as("__id"),
        col(phashCol).as("__ph"))
      .filter(col("__ph").isNotNull)
      // fail loudly on a hash whose width disagrees with hashBits (e.g. a
      // non-8x8 perceptualHashes output fed to the default): the band
      // substring offsets would otherwise silently truncate and produce
      // wrong candidate sets
      .select(col("__id"),
        when(length(col("__ph")) === hashBits, col("__ph"))
          .otherwise(raise_error(concat(
            lit(s"phashNearDups: expected $hashBits-bit hash, got length "),
            length(col("__ph")).cast(StringType)))).as("__ph"))
      .select(col("__id"), col("__ph"), ints.as("__ints"))
    val banded = base.select(col("__id"), col("__ints"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("b"), element_at(col("__ints"), b + 1).as("bi"))): _*)).as("__bd"))
      .select(col("__id"), col("__ints"),
        col("__bd.b").as("__b"), col("__bd.bi").as("__bandint"))
    val a = banded.select(col("__b"), col("__bandint"),
      col("__id").as("id_a"), col("__ints").as("__ia"))
    val b = banded.select(col("__b"), col("__bandint"),
      col("__id").as("id_b"), col("__ints").as("__ib"))
    val ham = aggregate(
      zip_with(col("__ia"), col("__ib"), (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)
    a.join(b, Seq("__b", "__bandint"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__ia"), col("__ib"))
      .distinct() // a pair sharing k bands collides k times
      .withColumn("hamming", ham.cast(LongType))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Encode deterministic 16-bit mono PCM as a WAV container via the JDK
    * encoder — the audio analog of [[encodeGradientPng]]: sample t is the
    * exact integer `((seed + 37·t) mod 2001 − 1000) · 16`, so decoded
    * statistics have closed forms an oracle can replay. */
  def encodePcmWav(nFrames: Int, seed: Int, sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.AudioFileFormat
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var t = 0
    while (t < nFrames) {
      val s = ((seed + 37 * t) % 2001 - 1000) * 16
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real PCM sample statistics from a WAV/AU/AIFF payload (16-bit mono):
    * (n_samples, sum_sq, peak, zero_crossings, rms). All but rms are EXACT
    * integers — sum of squares is order-free, peak is max |s|, a zero
    * crossing is a sign-bit flip between consecutive samples — and
    * rms = sqrt(sum_sq/n) is two correctly-rounded IEEE ops. None when
    * the payload doesn't decode to 16-bit mono PCM. */
  def decodeAudioStats(payload: Array[Byte]): Option[(Long, Long, Long, Long, Double)] = {
    if (payload == null || payload.length == 0) return None
    var in: AudioInputStream = null
    try {
      in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return None
      val bytes = in.readAllBytes()
      val bigEndian = fmt.isBigEndian
      val n = bytes.length / 2
      if (n == 0) return None
      var sumSq = 0L; var peak = 0L; var zc = 0L
      var prevNeg = false
      var t = 0
      while (t < n) {
        val lo = bytes(2 * t) & 0xff
        val hi = bytes(2 * t + 1) & 0xff
        val s = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toLong
        sumSq += s * s
        val a = math.abs(s)
        if (a > peak) peak = a
        val neg = s < 0
        if (t > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        t += 1
      }
      Some((n.toLong, sumSq, peak, zc, math.sqrt(sumSq.toDouble / n)))
    } catch { case _: Exception => None }
    finally { if (in != null) in.close() }
  }

  /** Per-partition batch PCM stats: (id, n_samples, sum_sq, peak,
    * zero_crossings, rms), nulls when undecodable — the feature-extract
    * stage an audio curation pipeline thresholds on (silence ⇒ rms ~ 0,
    * clipping ⇒ peak at full scale, tone vs noise ⇒ crossing rate). */
  def decodeAudioStatsBatch(df: DataFrame, idCol: String, payloadCol: String)
                           (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payload) =>
          decodeAudioStats(payload) match {
            case Some((n, ss, pk, zc, rms)) =>
              AudioStats(id, Some(n), Some(ss), Some(pk), Some(zc), Some(rms))
            case None => AudioStats(id, None, None, None, None, None)
          }
        }
      }.toDF()
  }

  /** Per-partition batch audio probe: (id, sample_rate, channels, frames,
    * duration_ms), nulls for undecodable payloads. */
  def decodeAudioMeta(df: DataFrame, idCol: String, payloadCol: String)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payload) =>
          decodeAudio(payload) match {
            case Some((rate, ch, frames, ms)) =>
              DecodedAudio(id, Some(rate), Some(ch), Some(frames), Some(ms))
            case None => DecodedAudio(id, None, None, None, None)
          }
        }
      }.toDF()
  }

  /** Deterministic byte-derived fallback features for payloads the JDK has no
    * codec for — keeps `extractFeatures` total over mixed corpora. */
  private def byteFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < 7) {
      out(i) = (if (payload.length > i) (payload(i) & 0xff) else 0) / 256.0f
      i += 1
    }
    out(7) = 0.0f // marker: not image-decoded
    out
  }

  /** Feature extraction over binary payloads: per-partition batch decode
    * (the mapInPandas analog — one decoder pass per partition, rows streamed
    * through it). Image payloads get real pixel-derived features
    * [w, h, meanR, meanG, meanB, luma (Rec.601), aspect, 1]; everything else
    * the deterministic byte fallback with a 0 marker in slot 7.
    * Output: (id, features array<float>). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payloadOrNull) =>
          val payload = if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
          val feats = decodeImage(payload) match {
            case Some((w, h, r, g, b)) =>
              Array(w.toFloat, h.toFloat, (r / 255.0).toFloat, (g / 255.0).toFloat,
                (b / 255.0).toFloat,
                ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat,
                (math.min(w, h).toFloat / math.max(w, h)), 1.0f)
            case None => byteFeatures(payload)
          }
          (id, feats)
        }
      }
      .toDF("id", "features")
  }

  /** Encode a PNG whose pixel channels are affine functions of (x, y) —
    * the deterministic gradient fixture for the resize oracle (PNG is
    * lossless, so every sampled pixel is exactly the formula value).
    * Channel c at (x, y) = (base_c + mx_c·x + my_c·y) mod 256. */
  def encodeGradientPng(width: Int, height: Int, base: Int,
                        mx: Int = 3, my: Int = 5): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (base + mx * x + my * y) & 0xff
        val g = (base * 3 + mx * x + my * y) & 0xff
        val b = (base * 5 + mx * x + my * y) & 0xff
        row(x) = (r << 16) | (g << 8) | b
        x += 1
      }
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Nearest-neighbor resize with the standard floor mapping
    * src_x = tx·srcW div dstW (explicit integer arithmetic rather than
    * Graphics2D so the sampled grid is engine-reproducible), re-encoded
    * as PNG. None when the payload is not a decodable image. */
  def resizeImage(payload: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
      val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
      val srcRow = new Array[Int](img.getWidth)
      val dstRow = new Array[Int](dstW)
      var ty = 0
      while (ty < dstH) {
        val sy = ty * img.getHeight / dstH
        img.getRGB(0, sy, img.getWidth, 1, srcRow, 0, img.getWidth)
        var tx = 0
        while (tx < dstW) { dstRow(tx) = srcRow(tx * img.getWidth / dstW); tx += 1 }
        out.setRGB(0, ty, dstW, 1, dstRow, 0, dstW)
        ty += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Per-partition batch resize: (id, payload) with the payload re-encoded
    * at dstW×dstH (null when undecodable). Same mapPartitions batch shape
    * as [[decodeImages]]; compose with it for resize→decode pipelines. */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
                   dstW: Int, dstH: Int)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, payload) =>
          (id, resizeImage(payload, dstW, dstH).orNull)
        }
      }.toDF(idCol, payloadCol)
  }

  /** Encode an animated GIF (one palette per solid-colour frame, so every
    * frame round-trips exactly) — the fixture for the frame-sample oracle.
    * GIF is the one multi-frame container the JDK both reads and writes. */
  def encodeGif(width: Int, height: Int, frameRgbs: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frameRgbs.foreach { rgb =>
        val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val row = Array.fill(width)(rgb)
        var y = 0
        while (y < height) { img.setRGB(0, y, width, 1, row, 0, width); y += 1 }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** One sampled, decoded frame of a multi-frame payload. */
  final case class DecodedFrame(id: Long, frame: Int, width: Option[Int],
                                height: Option[Int], mean_r: Option[Double],
                                mean_g: Option[Double], mean_b: Option[Double])

  /** Real frame decode for multi-frame containers (animated GIF in the
    * JDK): every `stride`-th frame is decoded to dims + exact channel
    * means. Returns Nil for undecodable payloads. */
  def decodeFrames(payload: Array[Byte], stride: Int): Seq[(Int, Int, Int, Double, Double, Double)] = {
    if (payload == null || payload.length == 0) return Nil
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        reader.setInput(in)
        val n = reader.getNumImages(true)
        (0 until n by stride).flatMap { i =>
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val p = rowBuf(x)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val np = w.toLong * h
          Some((i, w, h, sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
        }
      } finally reader.dispose()
    } catch { case _: Exception => Nil }
    finally in.close()
  }

  /** Per-partition batch frame sampling with REAL decode: one output row
    * per sampled frame — (id, frame, width, height, mean_r/g/b). The
    * mapPartitions flatMap is the video analog of [[decodeImages]]: frame
    * explosion happens executor-side, after the binary column has reached
    * its final partitioning, so payload bytes never ride a wider shuffle
    * than the scan. */
  def sampleDecodeFrames(df: DataFrame, idCol: String, payloadCol: String,
                         stride: Int = 2)
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, payload) =>
          decodeFrames(payload, stride).map { case (i, w, h, r, g, b) =>
            DecodedFrame(id, i, Some(w), Some(h), Some(r), Some(g), Some(b))
          }
        }
      }.toDF()
  }

  /** Frame sampling for video payloads: take every `stride`-th chunk of
    * `frameBytes` bytes as a "frame" (expression-level chunking — the JDK
    * ships no video codec, so real frame decode plugs in at the
    * mapPartitions stage like `decodeImages`). */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int = 16,
                   stride: Int = 4, result: String = "frames"): DataFrame =
    df.withColumn(result,
      transform(
        sequence(lit(0), greatest(
          floor(length(col(payloadCol)) / (frameBytes * stride)).cast(IntegerType) - 1, lit(0))),
        i => col(payloadCol).substr(lit(1) + i * (frameBytes * stride), lit(frameBytes))))
}
