package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — image/audio/video handled as opaque `binary`
  * payloads with typed metadata, exactly as a 100 TB training-data lake
  * stores them (media bytes inline or as object-store pointers; Spark
  * moves them as BinaryType and never interprets them in the engine).
  *
  * The decode path is REAL: [[ingestBmp]] synthesizes a well-formed
  * 24-bit BMP per document and [[decodePartitions]] decodes it with
  * `javax.imageio` — an independent JDK codec, not the encoder run
  * backwards — extracting pixel statistics that the DuckDB oracle
  * reproduces analytically. The PNG leg ([[pngBytes]] /
  * [[decodeGrayPartitions]]) and the audio leg ([[wavBytes]] /
  * [[decodeWavPartitions]]) follow the same doctrine through ImageIO's
  * PNG codec and javax.sound's PCM parser; the JPEG leg ([[jpegBytes]])
  * proves the harness on a LOSSY codec (dimensions exact, values
  * MAE-bounded by spec). Remaining codecs (video containers, Lanczos
  * kernels) drop into the same mapPartitions harness: one
  * decoder per PARTITION, batch-iterating rows — in PySpark this
  * boundary is `mapInPandas` with an Arrow batch per call; the
  * Scala-native equivalent with identical batch semantics is
  * `mapPartitions`, one codec instance per partition (not per row —
  * the pattern that survives scale).
  */
object Multimodal {

  /** Ingest: attach a binary payload + typed metadata struct to each doc.
    * The payload here is the utf-8 text bytes standing in for media bytes;
    * metadata (byte count, fake width/height derived from content length)
    * is the real plumbing a decode step would fill. */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media_bytes"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        (pmod(col("n_chars"), lit(64)) + 16).as("width"),
        (pmod(col("n_chars"), lit(48)) + 16).as("height"),
        lit("fake/media").as("mime")).as("media_meta"))

  /** Feature extraction over the binary column: md5 content digest plus
    * byte-level stats. STUB: a real pipeline would decode pixels/samples
    * here; the digest stands in for the feature vector. Everything else
    * (binary in, fixed-width features out, narrow per-row plan) is the
    * real shape. */
  def extractFeatures(ingested: DataFrame): DataFrame =
    ingested.select(
      col("doc_id"),
      md5(col("media_bytes")).as("content_digest"),
      col("media_meta.n_bytes").as("n_bytes"),
      col("media_meta.width").as("width"),
      col("media_meta.height").as("height"),
      (col("media_meta.width") * col("media_meta.height")).as("n_pixels"))

  /** Frame sampling: every `step`-th frame index of a fake video whose
    * frame count derives from content length — the explode/pos pattern
    * used to fan one media row out to per-frame rows (narrow, no
    * shuffle; at scale follow with repartition before a heavy decode). */
  def sampleFrames(ingested: DataFrame, step: Int = 2): DataFrame =
    ingested
      .withColumn("n_frames", expr("media_meta.n_bytes div 100") + 1)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong)))
          .as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Deterministic synthetic image dimensions: small enough that a 10k-doc
    * verify stays trivial, varied enough to exercise row padding (BMP rows
    * pad to 4 bytes, so widths not divisible by 4 matter). */
  def bmpWidth(nChars: Long): Int = (nChars % 13 + 4).toInt
  def bmpHeight(nChars: Long): Int = (nChars % 7 + 4).toInt

  /** Grayscale value of pixel index `i` (row-major, top-down) — the fixed
    * arithmetic the DuckDB oracle replays analytically. */
  def pixelValue(docId: Long, i: Long): Int = ((docId * 31 + i * 7) % 256).toInt

  /** Encode one well-formed 24-bit bottom-up BMP (14-byte file header +
    * 40-byte BITMAPINFOHEADER + padded BGR rows). Hand-built on purpose:
    * [[decodePartitions]] reads it back with the JDK's own ImageIO BMP
    * codec, so a malformed header, wrong padding or flipped row order
    * fails loudly rather than round-tripping. */
  def bmpBytes(docId: Long, nChars: Long): Array[Byte] = {
    val w = bmpWidth(nChars); val h = bmpHeight(nChars)
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    // bottom-up storage: last image row first; pixel index stays
    // row-major TOP-down so decode must honor BMP row order to match
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = pixelValue(docId, y.toLong * w + x).toByte
        buf.put(v).put(v).put(v)
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Ingest real media: one synthetic BMP per document as the binary
    * payload, with the typed metadata a decode step consumes. */
  def ingestBmp(docs: DataFrame): DataFrame = {
    val bmp = udf((docId: Long, nChars: Long) => bmpBytes(docId, nChars))
    docs.select(
      col("doc_id"),
      bmp(col("doc_id"), col("n_chars")).as("media_bytes"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        lit(null).cast("long").as("width"), // filled by decode, not trusted from ingest
        lit(null).cast("long").as("height"),
        lit("image/bmp").as("mime")).as("media_meta"))
  }

  /** Deterministic synthetic audio dims: short mono 16-bit PCM clips. */
  def wavNumSamples(nChars: Long): Int = (nChars % 50 + 20).toInt
  val WavSampleRate = 8000

  /** Signed 16-bit PCM sample `i` — fixed arithmetic the DuckDB oracle
    * replays analytically (operands always positive before the shift
    * into signed range, so both engines' % agree). */
  def sampleValue(docId: Long, i: Long): Int =
    ((docId * 37 + i * 11) % 65536).toInt - 32768

  /** Encode one well-formed RIFF/WAVE file (44-byte header + LE int16
    * mono PCM). Hand-built like [[bmpBytes]]: [[decodeWavPartitions]]
    * reads it back through javax.sound's own WAV parser, so a wrong
    * chunk size, endianness or block alignment fails loudly. */
  def wavBytes(docId: Long, nChars: Long): Array[Byte] = {
    val n = wavNumSamples(nChars)
    val dataSize = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(WavSampleRate).putInt(WavSampleRate * 2)
      .putShort(2).putShort(16) // blockAlign, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { buf.putShort(sampleValue(docId, i).toShort); i += 1 }
    buf.array()
  }

  /** Ingest real audio: one synthetic WAV per document. */
  def ingestWav(docs: DataFrame): DataFrame = {
    val wav = udf((docId: Long, nChars: Long) => wavBytes(docId, nChars))
    docs.select(
      col("doc_id"),
      wav(col("doc_id"), col("n_chars")).as("media_bytes"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        lit("audio/wav").as("mime")).as("media_meta"))
  }

  /** WAV decode through javax.sound.sampled — the JDK's own RIFF/PCM
    * parser, not our encoder run backwards — in the same one-codec-per-
    * partition mapPartitions harness as [[decodePartitions]]. Emits the
    * decoded format (sample rate — trusted from the DECODER, not the
    * ingest metadata) plus sample statistics; `s_posw` is
    * position-weighted so sample-order bugs cannot pass. */
  def decodeWavPartitions(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", LongType),
      StructField("n_samples", LongType),
      StructField("s_sum", LongType),
      StructField("s_posw", LongType),
      StructField("s_min", LongType),
      StructField("s_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = ingested.select(col("doc_id"), col("media_bytes"))
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media_bytes")
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 &&
          !fmt.isBigEndian, s"unexpected decoded format: $fmt")
        val data = ais.readAllBytes()
        ais.close()
        val n = data.length / 2
        var sum = 0L; var posw = 0L
        var mn = Long.MaxValue; var mx = Long.MinValue
        var i = 0
        while (i < n) {
          // little-endian int16, sign-extended
          val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
          sum += s; posw += i * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        Row(r.getAs[Long]("doc_id"), fmt.getSampleRate.toLong, n.toLong,
          sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** IMAGE ENTROPY profile (round 11) — the content-vs-flat filter of
    * an image curation pipeline (a near-constant image is a blank
    * scan, a banner, a dead camera; a full-entropy one is noise —
    * both tails get trimmed): per image, the gray-level histogram's
    * concentration as exact integers — distinct gray count, modal
    * count, and the engine's bit-length entropy surrogate
    * Σ c_g·(bitlen(n div c_g) − 1) (the `text_lm_perplexity` /
    * `text_tfidf_keywords` doctrine: 0 for a constant image, ~8·n for
    * a uniform 256-level one, the true Σ c·log₂(n/c) within one bit
    * per term — and exactly replayable, unlike a float entropy).
    * Decode through the same real-ImageIO per-partition harness.
    *
    * Output: (doc_id, n_pixels, n_grays, max_count, ent_surrogate),
    * ordered. */
  def imageEntropy(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("n_grays", LongType), StructField("max_count", LongType),
      StructField("ent_surrogate", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val hist = new Array[Long](256)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              hist((img.getRGB(x, y) >> 16) & 0xff) += 1; x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          var grays = 0L; var mx = 0L; var ent = 0L
          var g = 0
          while (g < 256) {
            val c = hist(g)
            if (c > 0) {
              grays += 1
              if (c > mx) mx = c
              ent += c * (64 - java.lang.Long.numberOfLeadingZeros(n / c) - 1)
            }
            g += 1
          }
          Row(r.getAs[Long]("doc_id"), n, grays, mx, ent)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** HISTOGRAM EQUALIZATION (round 14) — the contrast-normalization
    * transform every vision-ingest pipeline offers (washed-out scans
    * and under-exposed frames get their dynamic range stretched before
    * feature extraction): remap each gray level through the image's
    * own CDF, eq(g) = (cdf(g) − cdf_min)·255 div (n − cdf_min) — the
    * classic integer formula, EXACT end to end (one integral division
    * per level, nonneg operands so div ≡ //). A single-gray image
    * (n = cdf_min) maps to all-zeros — the documented degenerate
    * convention. Decode through the same real-ImageIO per-partition
    * harness as [[imageEntropy]]; the 256-entry LUT is built per
    * image, and the digests are position-weighted (raster-order bugs
    * cannot pass). n_grays_out ≤ n_grays_in always (the map is
    * monotone, never splitting); the equalized max hits 255 whenever
    * the image has ≥ 2 grays — both invariants spec-pinned.
    *
    * Output: (doc_id, n_pixels, n_grays_in, n_grays_out, eq_sum,
    * eq_posw, eq_min, eq_max), ordered. */
  def imageHistEq(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("n_grays_in", LongType),
      StructField("n_grays_out", LongType),
      StructField("eq_sum", LongType), StructField("eq_posw", LongType),
      StructField("eq_min", LongType), StructField("eq_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val n = w.toLong * h
          val px = new Array[Int](n.toInt)
          val hist = new Array[Long](256)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = (img.getRGB(x, y) >> 16) & 0xff
              px(y * w + x) = g; hist(g) += 1; x += 1
            }
            y += 1
          }
          val lut = new Array[Long](256)
          var cdf = 0L; var cdfMin = -1L; var graysIn = 0L
          var g = 0
          while (g < 256) {
            if (hist(g) > 0) {
              graysIn += 1
              if (cdfMin < 0) cdfMin = hist(g)
            }
            cdf += hist(g)
            lut(g) = if (n > cdfMin && cdfMin >= 0)
              (cdf - cdfMin) * 255L / (n - cdfMin)
            else 0L
            g += 1
          }
          var sum = 0L; var posw = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          val outSeen = new Array[Boolean](256)
          var graysOut = 0L
          var i = 0
          while (i < n) {
            val v = lut(px(i.toInt))
            sum += v; posw += i * v
            if (v < mn) mn = v; if (v > mx) mx = v
            if (!outSeen(v.toInt)) { outSeen(v.toInt) = true; graysOut += 1 }
            i += 1
          }
          Row(r.getAs[Long]("doc_id"), n, graysIn, graysOut, sum, posw,
            if (n == 0) 0L else mn, if (n == 0) 0L else mx)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** OTSU THRESHOLD (round 15) — the classic automatic binarization
    * every document-scan pipeline runs before OCR: pick the gray
    * threshold maximizing between-class variance
    * ω₀ω₁(μ₀−μ₁)² = (s₀N − w₀S)² / (w₀(N−w₀)) · 1/N² — the argmax is
    * invariant to the 1/N², so the score is the EXACT integer
    * (s₀N − w₀S)²·1024 div (w₀(N−w₀)) over cumulative count w₀ and
    * cumulative gray-sum s₀ at each candidate t (fixed ×1024 scaling,
    * identical truncation both engines; ties break to the LOWEST t —
    * deterministic). The score is computed in EXACT BigInt arithmetic
    * (round 16, advisor): the int64 form d²·1024 wraps silently once
    * |s₀N − w₀S| passes ~3e6 (a megapixel scan is far beyond it) and a
    * wrapped score picks a wrong threshold with no error; 256 BigInt
    * ops per image is noise next to the decode. The score never leaves
    * the executor — only the argmax t and its int64-safe prefix sums do.
    * Decode is the same real-ImageIO per-partition loop as
    * [[imageEntropy]]; the 256-entry histogram scan is per-row work —
    * embarrassingly parallel, no shuffle before the final ordering.
    *
    * Output: (doc_id, n_pixels, otsu_t, n_below, sum_below),
    * ordered. */
  def imageOtsu(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("otsu_t", LongType), StructField("n_below", LongType),
      StructField("sum_below", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val hist = new Array[Long](256)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              hist((img.getRGB(x, y) >> 16) & 0xff) += 1; x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          var s = 0L
          var g = 0
          while (g < 256) { s += g.toLong * hist(g); g += 1 }
          var w0 = 0L; var s0 = 0L
          var bestT = 0L; var bestScore = BigInt(-1)
          var t = 0
          while (t < 255) {
            w0 += hist(t); s0 += t.toLong * hist(t)
            if (w0 > 0L && w0 < n) {
              val d = BigInt(s0) * n - BigInt(w0) * s
              val score = d * d * 1024 / (BigInt(w0) * (n - w0))
              if (score > bestScore) { bestScore = score; bestT = t.toLong }
            }
            t += 1
          }
          // re-derive the winning prefix sums for the output columns
          var nb = 0L; var sb = 0L
          t = 0
          while (t <= bestT) { nb += hist(t); sb += t.toLong * hist(t); t += 1 }
          Row(r.getAs[Long]("doc_id"), n, bestT, nb, sb)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** OTSU BINARIZATION — the downstream consumer (round 16): apply the
    * [[imageOtsu]] threshold and digest the resulting BINARY MASK, the
    * step an OCR/document pipeline actually feeds forward (the
    * threshold alone is a statistic; the mask is the artifact). Per
    * image: foreground = pixels with gray > t; the digest is the
    * foreground census (count, gray sum) plus the POSITION-WEIGHTED
    * sum Σ(y·w + x) over foreground pixels — the [[imagePatchify]]
    * posw doctrine, pinning the mask's GEOMETRY (two masks with equal
    * counts but different layouts digest differently), so the oracle
    * checks where the foreground sits, not just how much there is.
    * Same real-ImageIO per-partition decode; one extra O(pixels) pass
    * per image, no shuffle before the final ordering.
    *
    * Output: (doc_id, n_pixels, otsu_t, n_fg, fg_sum_gray, fg_posw),
    * ordered. */
  def imageOtsuBinarize(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("otsu_t", LongType), StructField("n_fg", LongType),
      StructField("fg_sum_gray", LongType), StructField("fg_posw", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val n = w.toLong * h
          val hist = new Array[Long](256)
          val gray = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = (img.getRGB(x, y) >> 16) & 0xff
              gray(y * w + x) = g; hist(g) += 1; x += 1
            }
            y += 1
          }
          var s = 0L; var g = 0
          while (g < 256) { s += g.toLong * hist(g); g += 1 }
          // the imageOtsu argmax verbatim (exact BigInt score)
          var w0 = 0L; var s0 = 0L
          var bestT = 0L; var bestScore = BigInt(-1)
          var t = 0
          while (t < 255) {
            w0 += hist(t); s0 += t.toLong * hist(t)
            if (w0 > 0L && w0 < n) {
              val d = BigInt(s0) * n - BigInt(w0) * s
              val score = d * d * 1024 / (BigInt(w0) * (n - w0))
              if (score > bestScore) { bestScore = score; bestT = t.toLong }
            }
            t += 1
          }
          var nf = 0L; var fs = 0L; var fp = 0L
          var i = 0
          while (i < gray.length) {
            if (gray(i) > bestT) { nf += 1; fs += gray(i); fp += i }
            i += 1
          }
          Row(r.getAs[Long]("doc_id"), n, bestT, nf, fs, fp)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** BINARY-MASK RUN-LENGTH DIGEST (round 16) — the compression-side
    * consumer of [[imageOtsuBinarize]]'s mask: per image, the
    * horizontal run-length census of the foreground (count of maximal
    * same-row runs, the longest run, and Σ len² — the quadratic term
    * that separates "speckle noise" from "solid strokes" at equal
    * foreground count, and the exact size driver of an RLE/CCITT-
    * style mask encoding). Runs never cross row boundaries (the
    * scanline convention every RLE codec uses). Same per-partition
    * real-decode harness; one extra O(pixels) scan per image, digests
    * are plain BIGINTs.
    *
    * Output: (doc_id, n_pixels, otsu_t, n_runs, max_run, run_sq_sum),
    * ordered. */
  def imageOtsuRle(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("otsu_t", LongType), StructField("n_runs", LongType),
      StructField("max_run", LongType), StructField("run_sq_sum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val n = w.toLong * h
          val hist = new Array[Long](256)
          val gray = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = (img.getRGB(x, y) >> 16) & 0xff
              gray(y * w + x) = g; hist(g) += 1; x += 1
            }
            y += 1
          }
          var s = 0L; var g = 0
          while (g < 256) { s += g.toLong * hist(g); g += 1 }
          // the imageOtsu argmax verbatim (exact BigInt score)
          var w0 = 0L; var s0 = 0L
          var bestT = 0L; var bestScore = BigInt(-1)
          var t = 0
          while (t < 255) {
            w0 += hist(t); s0 += t.toLong * hist(t)
            if (w0 > 0L && w0 < n) {
              val d = BigInt(s0) * n - BigInt(w0) * s
              val score = d * d * 1024 / (BigInt(w0) * (n - w0))
              if (score > bestScore) { bestScore = score; bestT = t.toLong }
            }
            t += 1
          }
          var nRuns = 0L; var maxRun = 0L; var sqSum = 0L
          y = 0
          while (y < h) {
            var cur = 0L
            var x = 0
            while (x < w) {
              if (gray(y * w + x) > bestT) cur += 1
              else if (cur > 0L) {
                nRuns += 1; if (cur > maxRun) maxRun = cur
                sqSum += cur * cur; cur = 0L
              }
              x += 1
            }
            if (cur > 0L) {
              nRuns += 1; if (cur > maxRun) maxRun = cur
              sqSum += cur * cur
            }
            y += 1
          }
          Row(r.getAs[Long]("doc_id"), n, bestT, nRuns, maxRun, sqSum)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** FOREGROUND BOUNDING BOX (round 16) — the crop-to-content consumer
    * of [[imageOtsuBinarize]]'s mask: the tight axis-aligned box
    * around the foreground (the auto-crop every scanned-document and
    * thumbnail pipeline runs before resizing — whitespace margins are
    * wasted pixels at training time) plus the FILL RATIO (foreground
    * over box area, in exact ppm) that separates "solid block" from
    * "sparse scatter" at equal box size. The Otsu construction
    * guarantees ≥ 1 foreground pixel, so the box is always defined.
    * Same per-partition real-decode harness, one O(pixels) pass.
    *
    * Output: (doc_id, n_pixels, otsu_t, min_x, min_y, max_x, max_y,
    * n_fg, fill_ppm), ordered. */
  def imageFgBbox(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("otsu_t", LongType), StructField("min_x", LongType),
      StructField("min_y", LongType), StructField("max_x", LongType),
      StructField("max_y", LongType), StructField("n_fg", LongType),
      StructField("fill_ppm", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val n = w.toLong * h
          val hist = new Array[Long](256)
          val gray = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = (img.getRGB(x, y) >> 16) & 0xff
              gray(y * w + x) = g; hist(g) += 1; x += 1
            }
            y += 1
          }
          var s = 0L; var g = 0
          while (g < 256) { s += g.toLong * hist(g); g += 1 }
          // the imageOtsu argmax verbatim (exact BigInt score)
          var w0 = 0L; var s0 = 0L
          var bestT = 0L; var bestScore = BigInt(-1)
          var t = 0
          while (t < 255) {
            w0 += hist(t); s0 += t.toLong * hist(t)
            if (w0 > 0L && w0 < n) {
              val d = BigInt(s0) * n - BigInt(w0) * s
              val score = d * d * 1024 / (BigInt(w0) * (n - w0))
              if (score > bestScore) { bestScore = score; bestT = t.toLong }
            }
            t += 1
          }
          var minX = Long.MaxValue; var minY = Long.MaxValue
          var maxX = -1L; var maxY = -1L; var nf = 0L
          y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              if (gray(y * w + x) > bestT) {
                nf += 1
                if (x < minX) minX = x
                if (x > maxX) maxX = x
                if (y < minY) minY = y
                if (y > maxY) maxY = y
              }
              x += 1
            }
            y += 1
          }
          val area = (maxX - minX + 1) * (maxY - minY + 1)
          Row(r.getAs[Long]("doc_id"), n, bestT, minX, minY, maxX, maxY,
            nf, nf * 1000000L / area)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** DATASET NORMALIZATION CONSTANTS (round 13) — the per-corpus-shard
    * mean/std every vision training pipeline computes BEFORE training
    * (the `transforms.Normalize(mean, std)` numbers), grouped by
    * document source so a drifting shard (a new scanner, a re-encoded
    * feed) is visible as a moved mean — the image-lake twin of the
    * text side's per-source quality profile. Decode through the same
    * real-ImageIO per-partition harness as [[imageEntropy]]; per-image
    * gray sums are exact BIGINTs, the per-source rollup accumulates in
    * DECIMAL(38,0) (pixel-count × 255² overflows int64 at lake scale),
    * and mean/std are fixed-order IEEE trees through the via-string
    * bridge — population variance, ONE sqrt. Join to the source label
    * is per-image (never per-pixel); ≤ |sources| rows out.
    *
    * Output: (source, n_images, n_pixels, min_gray, max_gray,
    * mean_gray, std_gray), ordered by source. */
  def imageNormStats(spark: SparkSession, ingested: DataFrame,
                     docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n", LongType),
      StructField("s", LongType), StructField("ss", LongType),
      StructField("mn", LongType), StructField("mx", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val per = ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          var s = 0L; var ss = 0L; var mn = 255L; var mx = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((img.getRGB(x, y) >> 16) & 0xff).toLong
              s += g; ss += g * g
              if (g < mn) mn = g
              if (g > mx) mx = g
              x += 1
            }
            y += 1
          }
          Row(r.getAs[Long]("doc_id"), w.toLong * h, s, ss, mn, mx)
        }
      }(enc).toDF()
    val dec = DecimalType(38, 0)
    def d(c: Column) = c.cast("string").cast("double")
    per.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"), sum(col("n")).as("n_pixels"),
        sum(col("s").cast(dec)).as("sg"),
        sum(col("ss").cast(dec)).as("ssg"),
        min(col("mn")).as("min_gray"), max(col("mx")).as("max_gray"))
      .select(col("source"), col("n_images"), col("n_pixels"),
        col("min_gray"), col("max_gray"),
        (d(col("sg")) / col("n_pixels")).as("mean_gray"),
        sqrt((col("n_pixels") * d(col("ssg")) - d(col("sg")) * d(col("sg"))) /
          (col("n_pixels") * col("n_pixels").cast("double"))).as("std_gray"))
      .orderBy(col("source"))
  }

  /** BLUR / SHARPNESS AUDIT (round 12) — the focus-quality gate an
    * image-lake curation pass runs before training: the Laplacian
    * energy Σ(4·g − g_left − g_right − g_up − g_down)² over interior
    * pixels collapses toward zero on defocused or upscaled images
    * (the classic variance-of-Laplacian detector, kept in PURE INTEGER
    * form: the sum of squares is exact, and sharp_milli =
    * 1000·Σlap² div n_interior replays anywhere — no float variance).
    * Decode is the REAL ImageIO BMP codec in the shared mapPartitions
    * harness; the oracle replays the convolution analytically from the
    * fixture's pixel formula, so a codec mis-decode fails the compare.
    *
    * Scale shape: narrow per-row decode + bounded per-image loop; one
    * output row per image, no shuffle beyond the final orderBy. */
  def imageSharpness(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("n_interior", LongType),
      StructField("lap_sq_sum", LongType),
      StructField("sharp_milli", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val g = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { g(y)(x) = (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
          var s = 0L
          y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val lap = 4L * g(y)(x) - g(y)(x - 1) - g(y)(x + 1) -
                g(y - 1)(x) - g(y + 1)(x)
              s += lap * lap
              x += 1
            }
            y += 1
          }
          val nInt = math.max((w - 2).toLong, 0L) * math.max((h - 2).toLong, 0L)
          Row(r.getAs[Long]("doc_id"), w.toLong * h, nInt, s,
            1000L * s / math.max(nInt, 1L))
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** 2×2 PATCH EXTRACTION (round 14) — the ViT-style patchify step
    * every transformer vision pipeline runs (the image becomes a
    * SEQUENCE of patch embeddings; here each patch is summarized by
    * its integer mean gray): the grid crops to even dimensions (the
    * resize stage owns shape normalization — odd edge rows/cols drop,
    * the standard convention), patch mean = sum div 4 (nonneg — div ≡
    * floor), and the digest is position-weighted over the PATCH
    * sequence index (row-major over the patch grid) so a patch-order
    * bug cannot pass. Same real-ImageIO per-partition harness.
    *
    * Output: (doc_id, n_patches, mean_sum, mean_posw, mean_min,
    * mean_max), ordered. */
  def imagePatchify(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_patches", LongType),
      StructField("mean_sum", LongType), StructField("mean_posw", LongType),
      StructField("mean_min", LongType), StructField("mean_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val pw = w / 2; val ph = h / 2
          var sum = 0L; var posw = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var py = 0
          while (py < ph) {
            var px = 0
            while (px < pw) {
              var s = 0L
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  s += (img.getRGB(2 * px + dx, 2 * py + dy) >> 16) & 0xff
                  dx += 1
                }
                dy += 1
              }
              val m = s / 4
              val idx = (py * pw + px).toLong
              sum += m; posw += idx * m
              if (m < mn) mn = m; if (m > mx) mx = m
              px += 1
            }
            py += 1
          }
          val n = pw.toLong * ph
          Row(r.getAs[Long]("doc_id"), n, sum, posw,
            if (n == 0) 0L else mn, if (n == 0) 0L else mx)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** SOBEL EDGE ENERGY (round 14) — the gradient-magnitude audit next
    * to [[imageSharpness]]'s Laplacian: Sobel responds to oriented
    * EDGES where the Laplacian responds to curvature, and the pair
    * (edge energy vs sharpness) separates "blurry" from "featureless"
    * — the two reasons a vision-ingest gate drops a frame. Exact
    * integers: Gx/Gy are the classic 3×3 kernels over interior pixels,
    * magnitude is the |Gx|+|Gy| surrogate (the L1 norm — no sqrt, no
    * float), energy its interior sum, grad_posw the position-weighted
    * digest over the interior raster index (kernel-orientation bugs
    * cannot pass). Same real-ImageIO per-partition harness.
    *
    * Output: (doc_id, n_pixels, n_interior, edge_energy, grad_max,
    * grad_posw), ordered. */
  def imageSobel(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("n_interior", LongType),
      StructField("edge_energy", LongType),
      StructField("grad_max", LongType),
      StructField("grad_posw", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val g = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { g(y)(x) = (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
          var energy = 0L; var mx = 0L; var posw = 0L; var idx = 0L
          y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (g(y - 1)(x + 1) + 2L * g(y)(x + 1) + g(y + 1)(x + 1)) -
                (g(y - 1)(x - 1) + 2L * g(y)(x - 1) + g(y + 1)(x - 1))
              val gy = (g(y + 1)(x - 1) + 2L * g(y + 1)(x) + g(y + 1)(x + 1)) -
                (g(y - 1)(x - 1) + 2L * g(y - 1)(x) + g(y - 1)(x + 1))
              val m = math.abs(gx) + math.abs(gy)
              energy += m; posw += idx * m
              if (m > mx) mx = m
              idx += 1; x += 1
            }
            y += 1
          }
          val nInt = math.max((w - 2).toLong, 0L) * math.max((h - 2).toLong, 0L)
          Row(r.getAs[Long]("doc_id"), w.toLong * h, nInt, energy, mx, posw)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** Letterbox spread threshold: a row/column is border-flat when its
    * pixel range (max−min) is ≤ this. Shared with the oracle
    * generator. */
  val LetterboxSpread: Int = 120

  /** LETTERBOX / PILLARBOX DETECTOR (round 12) — the framing audit a
    * video-frame lake runs before training: re-encoded footage carries
    * low-contrast bars (letterbox top/bottom, pillarbox left/right)
    * that waste pixels and poison crop statistics. Per image, the
    * consecutive run of BORDER-FLAT rows from the top and bottom and
    * columns from the left and right, where border-flat means the
    * row/column's pixel range (max−min) stays ≤ [[LetterboxSpread]] —
    * a pure integer criterion (true black bars have range 0; dark
    * noisy bars still qualify; content rows blow past it). Real
    * ImageIO decode in the shared harness; the oracle replays the
    * ranges analytically from the fixture pixel formula.
    *
    * Scale shape: narrow per-row decode + bounded per-image loops; one
    * row per image out. */
  def letterboxReport(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", LongType),
      StructField("height", LongType),
      StructField("top_rows", LongType), StructField("bottom_rows", LongType),
      StructField("left_cols", LongType), StructField("right_cols", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val w = img.getWidth; val h = img.getHeight
          val g = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { g(y)(x) = (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
          def rowFlat(y: Int): Boolean = {
            var mn = 255; var mx = 0; var x = 0
            while (x < w) {
              val v = g(y)(x); if (v < mn) mn = v; if (v > mx) mx = v; x += 1
            }
            mx - mn <= LetterboxSpread
          }
          def colFlat(x: Int): Boolean = {
            var mn = 255; var mx = 0; var y = 0
            while (y < h) {
              val v = g(y)(x); if (v < mn) mn = v; if (v > mx) mx = v; y += 1
            }
            mx - mn <= LetterboxSpread
          }
          var top = 0L; while (top < h && rowFlat(top.toInt)) top += 1
          var bot = 0L; while (bot < h - top && rowFlat((h - 1 - bot).toInt)) bot += 1
          var lft = 0L; while (lft < w && colFlat(lft.toInt)) lft += 1
          var rgt = 0L; while (rgt < w - lft && colFlat((w - 1 - rgt).toInt)) rgt += 1
          Row(r.getAs[Long]("doc_id"), w.toLong, h.toLong, top, bot, lft, rgt)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** GIF SCENE-CUT detection (round 11) — the video-curation primitive
    * over the animated-GIF leg: per consecutive frame pair, the sum of
    * absolute pixel differences (SAD — the classic shot-boundary
    * signal), flagged as a cut when the MEAN difference clears
    * `threshold` gray levels (integer compare: sad ≥ threshold·pixels —
    * no division). A training pipeline samples around cuts instead of
    * uniformly; this is the pass that finds them. Same
    * one-decoder-per-partition ImageIO harness as
    * [[decodeGifFramesPartitions]] (real LZW + palette decode — a
    * codec that drops or reorders frames fails the compare); SAD is
    * exact integer arithmetic over the decoded rasters, replayed
    * analytically by the oracle.
    *
    * Output: (doc_id, frame_from, frame_to, n_pixels, sad, is_cut),
    * ordered. */
  def gifSceneCuts(spark: SparkSession, ingested: DataFrame,
                   threshold: Long = 64L): DataFrame = {
    require(threshold >= 0, s"threshold must be nonnegative: $threshold")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("frame_from", LongType),
      StructField("frame_to", LongType), StructField("n_pixels", LongType),
      StructField("sad", LongType), StructField("is_cut", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, "no reader for media payload")
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val nf = reader.getNumImages(true)
            val grays = (0 until nf).map { fi =>
              val img = reader.read(fi)
              val w = img.getWidth; val h = img.getHeight
              // SAD below differences same-index pixels of consecutive
              // rasters, which is only meaningful when every frame spans
              // the full logical screen. An OPTIMIZED GIF (frame rects
              // smaller than the screen, offsets + disposal semantics)
              // would need compositing first — out of contract here, so
              // refuse loudly instead of comparing a truncated prefix
              // or indexing past the shorter raster.
              require(w == reader.getWidth(0) && h == reader.getHeight(0),
                s"optimized GIF unsupported: frame $fi is ${w}x$h but the " +
                  s"logical screen is ${reader.getWidth(0)}x" +
                  s"${reader.getHeight(0)} — composite frames before SAD")
              val a = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  a(y * w + x) = (img.getRGB(x, y) >> 16) & 0xff; x += 1
                }
                y += 1
              }
              a
            }
            val docId = r.getAs[Long]("doc_id")
            (0 until nf - 1).map { fi =>
              val (a, b) = (grays(fi), grays(fi + 1))
              var sad = 0L; var i = 0
              while (i < a.length) { sad += math.abs(a(i) - b(i)); i += 1 }
              Row(docId, fi.toLong, (fi + 1).toLong, a.length.toLong, sad,
                sad >= threshold * a.length)
            }
          } finally reader.dispose()
        }
      }(enc).toDF().orderBy(col("doc_id"), col("frame_from"))
  }

  /** Windowed PCM ENERGY profile (round 11) — the first real audio
    * FEATURE over the WAV leg (decode stats prove the codec;
    * energy/peak windows are what an audio curation pipeline actually
    * consumes: silence trimming, clipping detection, loudness
    * bucketing). Same one-codec-per-partition harness as
    * [[decodeWavPartitions]], fanning each clip to one row per
    * `win`-sample window: sample count, exact integer energy Σ s²
    * (int16 squares over a bounded window — never overflows), and the
    * clipping-relevant peak max|s|. The short final window reports its
    * true length (structural, not padded). Oracle-replayable because
    * the fixture PCM is analytic ([[sampleValue]]); the engine still
    * decodes the real RIFF bytes through javax.sound, so a codec that
    * drops or reorders samples fails the compare.
    *
    * Output: (doc_id, win, n_samples, energy, peak), ordered. */
  /** ZERO-CROSSING-RATE profile (round 12) — the cheapest
    * voiced/unvoiced/noise discriminator in audio curation (speech
    * voicing sits low, fricatives and hiss high), next to the energy
    * profile [[wavRmsWindows]] reads: per clip, the number of SIGN
    * CHANGES between consecutive samples (zero samples carry the
    * previous sign — the convention the oracle replays), total
    * samples, and zcr_ppm = crossings·10⁶ div (n−1) — all exact
    * integers off the REAL javax.sound decode (format-asserted like
    * the RMS leg). */
  def wavZeroCrossings(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", LongType),
      StructField("n_crossings", LongType), StructField("zcr_ppm", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          require(data.length % 2 == 0,
            s"odd PCM byte count ${data.length}: truncated int16 stream")
          val n = data.length / 2
          var cross = 0L
          var prevSign = 0 // 0 until the first nonzero sample
          var i = 0
          while (i < n) {
            val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
            val sg = if (s > 0) 1 else if (s < 0) -1 else prevSign
            if (prevSign != 0 && sg != 0 && sg != prevSign) cross += 1
            if (sg != 0) prevSign = sg
            i += 1
          }
          val docId = r.getAs[Long]("doc_id")
          Row(docId, n.toLong, cross,
            if (n > 1) cross * 1000000L / (n - 1) else 0L)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** PCM AUTOCORRELATION at fixed lags (round 13) — the periodicity
    * primitive behind every pitch detector / tonal-vs-noise gate (a
    * periodic signal's r_k peaks at its period; white noise decays
    * immediately), completing the audio feature set beside energy
    * ([[wavRmsWindows]]), [[wavZeroCrossings]] and the silence trim.
    * No FFT anywhere — the repo's no-transcendentals doctrine: r_k =
    * Σ s_t·s_{t+k} over the REAL javax.sound decode is pure BIGINT
    * (|s| ≤ 2¹⁵ → products fit trivially), r₀ normalizes with ONE
    * IEEE division per lag. Lags {1,2,4,8} fixed and shared with the
    * oracle generator. Output: (doc_id, lag, n_pairs, r_lag, r0,
    * r_norm), ordered. */
  def wavAutocorr(spark: SparkSession, ingested: DataFrame,
                  lags: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags $lags")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lag", LongType),
      StructField("n_pairs", LongType), StructField("r_lag", LongType),
      StructField("r0", LongType), StructField("r_norm", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          val n = data.length / 2
          val s = new Array[Long](n)
          var i = 0
          while (i < n) {
            s(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
              .toShort.toLong
            i += 1
          }
          var r0 = 0L
          i = 0
          while (i < n) { r0 += s(i) * s(i); i += 1 }
          val docId = r.getAs[Long]("doc_id")
          lags.map { k =>
            var rk = 0L; var t = 0
            while (t < n - k) { rk += s(t) * s(t + k); t += 1 }
            Row(docId, k.toLong, math.max(n - k, 0).toLong, rk, r0,
              if (r0 > 0) rk.toDouble / r0 else 0.0)
          }
        }
      }(enc).toDF().orderBy(col("doc_id"), col("lag"))
  }

  /** PEAK NORMALIZATION (round 13) — the gain pass every audio
    * pipeline runs before feature extraction (a quiet clip and a hot
    * clip must hit the model at the same level): each sample rescaled
    * s′ = s·32767 div peak with peak = max |s| — the scale factor that
    * puts the loudest sample at full scale. ENGINE-EXACT: the rescale
    * is the sign-split truncating division (negative samples must
    * truncate identically across engines — the division-portability
    * doctrine at audio gain), so the normalized digest replays
    * bit-for-bit. Emits the post-gain peak (the max-|s| sample lands
    * on exactly ±32767 — the self-check) plus sum / position-weighted
    * digests of the normalized signal. Real javax.sound decode in the
    * shared harness. Output: (doc_id, n_samples, peak, norm_peak,
    * norm_sum, norm_posw), ordered. */
  def wavPeakNormalize(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", LongType),
      StructField("peak", LongType), StructField("norm_peak", LongType),
      StructField("norm_sum", LongType), StructField("norm_posw", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          val n = data.length / 2
          val s = new Array[Long](n)
          var peak = 0L
          var i = 0
          while (i < n) {
            s(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
              .toShort.toLong
            if (math.abs(s(i)) > peak) peak = math.abs(s(i))
            i += 1
          }
          var nPeak = 0L; var sum = 0L; var posw = 0L
          i = 0
          while (i < n) {
            // sign-split truncating rescale — JVM long division already
            // truncates toward zero; the oracle spells the CASE form
            val v = if (peak == 0) s(i) else s(i) * 32767L / peak
            if (math.abs(v) > nPeak) nPeak = math.abs(v)
            sum += v; posw += i * v
            i += 1
          }
          Row(r.getAs[Long]("doc_id"), n.toLong, peak, nPeak, sum, posw)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  def wavRmsWindows(spark: SparkSession, ingested: DataFrame,
                    win: Int = 16): DataFrame = {
    require(win >= 1, s"window must be positive, got $win")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("win", LongType),
      StructField("n_samples", LongType), StructField("energy", LongType),
      StructField("peak", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          // the int16-LE-mono parse below is only valid for exactly that
          // format — an 8-bit, big-endian, or stereo stream would decode
          // to garbage energy/peak values, so assert the decoder's own
          // format report instead of trusting the payload
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          require(data.length % 2 == 0,
            s"odd PCM byte count ${data.length}: truncated int16 stream")
          val n = data.length / 2
          val docId = r.getAs[Long]("doc_id")
          (0 until (n + win - 1) / win).map { w =>
            var e = 0L; var pk = 0L; var c = 0L
            var i = w * win
            val end = math.min(n, (w + 1) * win)
            while (i < end) {
              val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
                .toShort.toLong
              e += s * s; if (math.abs(s) > pk) pk = math.abs(s)
              c += 1; i += 1
            }
            Row(docId, w.toLong, c, e, pk)
          }
        }
      }(enc).toDF().orderBy(col("doc_id"), col("win"))
  }

  /** 2× LINEAR UPSAMPLE (round 13) — the resample leg of the audio
    * family (every speech pipeline normalizes sample rates before
    * featurization): decode the WAV through javax.sound (the same
    * one-codec-per-partition harness as [[wavRmsWindows]] — format
    * asserted from the DECODER), then upsample by exactly 2 with
    * integer-midpoint interpolation: out[2k] = s[k], out[2k+1] =
    * (s[k] + s[k+1]) / 2 with JVM truncating division (the oracle
    * replays it as the explicit sign-split — DuckDB's // floors). A
    * ×2 ratio keeps every interpolated value EXACT (no fractional
    * positions), which is what makes the whole resample oracle-able;
    * arbitrary-ratio resampling is the same per-partition loop with a
    * documented fixed-point phase step. Output digests are
    * position-weighted ([[decodeWavPartitions]]'s s_posw doctrine) so
    * a sample-order bug cannot pass: (doc_id, n_in, n_out, s_sum,
    * s_posw, s_min, s_max), ordered. */
  def wavResample2x(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_in", LongType),
      StructField("n_out", LongType), StructField("s_sum", LongType),
      StructField("s_posw", LongType), StructField("s_min", LongType),
      StructField("s_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          require(data.length % 2 == 0,
            s"odd PCM byte count ${data.length}: truncated int16 stream")
          val n = data.length / 2
          def s(i: Int): Long =
            ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
          val nOut = if (n == 0) 0 else 2 * n - 1
          var sum = 0L; var posw = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var j = 0
          while (j < nOut) {
            val v = if (j % 2 == 0) s(j / 2)
              else (s((j - 1) / 2) + s((j + 1) / 2)) / 2
            sum += v; posw += j.toLong * v
            if (v < mn) mn = v; if (v > mx) mx = v
            j += 1
          }
          Row(r.getAs[Long]("doc_id"), n.toLong, nOut.toLong, sum, posw,
            if (nOut == 0) 0L else mn, if (nOut == 0) 0L else mx)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** VAD energy threshold per sample — E[s²] of the uniform int16
    * synthetic PCM ((2³²−1)/12, floored): a window is "voiced" when
    * its energy is at least count×this, splitting windows near 50/50
    * on the analytic corpus so both branches always bite. Shared with
    * the oracle. */
  val VadThreshPerSample: Long = 357913941L

  /** ENERGY-GATE VOICE ACTIVITY DETECTION (round 14) — the
    * segmentation primitive every speech pipeline runs before ASR or
    * diarization (silence carries no training signal and costs GPU
    * time): per [[wavRmsWindows]]-style window, voiced ⇔ energy ≥
    * count·[[VadThreshPerSample]], then the RUN-LENGTH view —
    * segments (maximal voiced runs), their count and the longest —
    * because what a trimmer consumes is segments, not per-window
    * flags. All integer: exact energies from the decoded PCM, the
    * threshold an integer product, run-length in the same
    * per-partition loop. Same one-codec-per-partition harness,
    * decoder-asserted format.
    *
    * Output: (doc_id, n_windows, n_voiced, n_segments,
    * longest_segment), ordered. */
  def wavVadSegments(spark: SparkSession, ingested: DataFrame,
                     win: Int = 16): DataFrame = {
    require(win >= 1, s"window must be positive, got $win")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_windows", LongType),
      StructField("n_voiced", LongType),
      StructField("n_segments", LongType),
      StructField("longest_segment", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          require(data.length % 2 == 0,
            s"odd PCM byte count ${data.length}: truncated int16 stream")
          val n = data.length / 2
          val nWin = (n + win - 1) / win
          var voiced = 0L; var segs = 0L; var longest = 0L
          var run = 0L; var prevVoiced = false
          var wIdx = 0
          while (wIdx < nWin) {
            var e = 0L; var c = 0L
            var i = wIdx * win
            val end = math.min(n, (wIdx + 1) * win)
            while (i < end) {
              val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
                .toShort.toLong
              e += s * s; c += 1; i += 1
            }
            val v = e >= c * VadThreshPerSample
            if (v) {
              voiced += 1
              run = if (prevVoiced) run + 1 else { segs += 1; 1L }
              if (run > longest) longest = run
            } else run = 0L
            prevVoiced = v
            wIdx += 1
          }
          Row(r.getAs[Long]("doc_id"), nWin.toLong, voiced, segs, longest)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** Clipping threshold for [[wavClipDetect]], shared with the oracle
    * (|s| ≥ this counts as clipped — a headroom of 67 LSBs under
    * int16 full scale, the practical "hit the rail" band). */
  val ClipThresh: Long = 32700L

  /** CLIPPING DETECTOR (round 15) — the source-signal QA gate a
    * speech-ingest pipeline runs BEFORE any augmentation: samples at
    * |s| ≥ [[ClipThresh]] (the rail band), their longest consecutive
    * RUN (one railed sample is a transient; a run is a flat-topped
    * waveform — real distortion), run count, and the clip rate in ppm.
    * The run-length scan is the [[wavVadSegments]] machinery applied
    * per-sample. Same one-codec-per-partition harness; per-row work,
    * no shuffle before the final ordering.
    *
    * Output: (doc_id, n_samples, n_clipped, n_runs, longest_run,
    * clip_ppm), ordered. */
  def wavClipDetect(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", LongType),
      StructField("n_clipped", LongType), StructField("n_runs", LongType),
      StructField("longest_run", LongType), StructField("clip_ppm", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          val n = data.length / 2
          var clipped = 0L; var runs = 0L; var longest = 0L
          var run = 0L; var prev = false
          var i = 0
          while (i < n) {
            val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
              .toShort.toLong
            val c = math.abs(s) >= ClipThresh
            if (c) {
              clipped += 1
              run = if (prev) run + 1 else { runs += 1; 1L }
              if (run > longest) longest = run
            } else run = 0L
            prev = c
            i += 1
          }
          Row(r.getAs[Long]("doc_id"), n.toLong, clipped, runs, longest,
            if (n == 0) 0L else clipped * 1000000L / n)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** Fade ramp length for [[wavFade]], shared with the oracle. */
  val FadeLen: Long = 16L

  /** LINEAR FADE IN/OUT (round 15) — the edit every audio-chunking
    * pipeline applies at segment boundaries so concatenated clips
    * don't click (a hard cut is a step discontinuity — a broadband
    * pop): gain ramps linearly over the first and last [[FadeLen]]
    * samples, v = s·min(i+1, F, n−i) div F with truncating sign-split
    * division — EXACT integers end to end, and on a clip shorter than
    * 2F the two ramps compose through the single min (the documented
    * overlap rule, not two multiplications). Digest outputs
    * (sum, position-weighted, head/tail zeros) make a reversed or
    * off-by-one ramp unmistakable.
    *
    * Output: (doc_id, n_samples, fade_sum, fade_posw, head_abs,
    * tail_abs), ordered — head_abs/tail_abs are Σ|v| over the first/
    * last F samples (strictly less than the unfaded Σ|s| unless the
    * signal is zero there). */
  def wavFade(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val f = FadeLen
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", LongType),
      StructField("fade_sum", LongType), StructField("fade_posw", LongType),
      StructField("head_abs", LongType), StructField("tail_abs", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          val n = data.length / 2
          var sum = 0L; var posw = 0L; var headAbs = 0L; var tailAbs = 0L
          var i = 0
          while (i < n) {
            val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
              .toShort.toLong
            val g = math.min(math.min(i + 1L, f), n.toLong - i)
            // JVM long division truncates toward zero — the sign split
            // the oracle spells as CASE
            val v = s * g / f
            sum += v; posw += i * v
            if (i < f) headAbs += math.abs(v)
            if (i >= n - f) tailAbs += math.abs(v)
            i += 1
          }
          Row(r.getAs[Long]("doc_id"), n.toLong, sum, posw, headAbs, tailAbs)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** OVERLAY MIX WITH SATURATION (round 14) — the audio-augmentation
    * primitive every speech-training pipeline runs (noise/music-bed
    * overlay at reduced gain): decode the WAV, add a deterministic
    * overlay tone at HALF GAIN, and clamp the sum into the int16 range
    * — the saturating add real mixers do, and the branch a naive
    * modular add silently corrupts (wraparound turns a loud peak into
    * its negative). The overlay is analytic like [[sampleValue]] —
    * tone(doc, i) = ((doc·53 + i·7) mod 65536) − 32768 — so the oracle
    * replays the whole mix; half gain is JVM truncating division (the
    * oracle spells the sign split). n_clipped counts saturated samples
    * — the clipping-rate readout a gain stage is tuned by.
    *
    * Same one-codec-per-partition harness, decoder-asserted format,
    * position-weighted digests. Output: (doc_id, n_samples, n_clipped,
    * mix_sum, mix_posw, mix_min, mix_max), ordered. */
  def wavMixOverlay(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", LongType),
      StructField("n_clipped", LongType), StructField("mix_sum", LongType),
      StructField("mix_posw", LongType), StructField("mix_min", LongType),
      StructField("mix_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          require(data.length % 2 == 0,
            s"odd PCM byte count ${data.length}: truncated int16 stream")
          val n = data.length / 2
          val docId = r.getAs[Long]("doc_id")
          var clipped = 0L; var sum = 0L; var posw = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var i = 0
          while (i < n) {
            val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8))
              .toShort.toLong
            val tone = (docId * 53 + i.toLong * 7) % 65536 - 32768
            val raw = s + tone / 2 // JVM division truncates toward zero
            val v =
              if (raw > 32767L) { clipped += 1; 32767L }
              else if (raw < -32768L) { clipped += 1; -32768L }
              else raw
            sum += v; posw += i.toLong * v
            if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Row(docId, n.toLong, clipped, sum, posw,
            if (n == 0) 0L else mn, if (n == 0) 0L else mx)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** ARBITRARY-RATIO POLYPHASE RESAMPLE (round 14) — the fixed-point
    * phase-step generalization [[wavResample2x]]'s scaladoc documents:
    * output rate = input rate × l/m (l=2, m=3 ≈ 48→32 kHz, the classic
    * speech-pipeline conversion). Output sample j sits at input phase
    * j·m/l: base = (j·m) div l, frac = (j·m) mod l, and the linear
    * interpolation stays EXACT INTEGER arithmetic — v = s[base] when
    * frac = 0, else s[base] + (s[base+1] − s[base])·frac div l with
    * JVM truncating division (the oracle replays the negative-diff leg
    * as the explicit sign split; DuckDB's // floors). n_out =
    * (l·(n−1)) div m + 1 — exactly the phases whose interpolation
    * window exists. Same one-codec-per-partition harness, same
    * decoder-asserted format, same position-weighted digests (a
    * phase-accumulator bug cannot pass s_posw).
    *
    * Output: (doc_id, n_in, n_out, s_sum, s_posw, s_min, s_max),
    * ordered. */
  def wavResamplePoly(spark: SparkSession, ingested: DataFrame,
                      l: Int = 2, m: Int = 3): DataFrame = {
    require(l >= 1 && m >= 1, s"resample ratio must be positive: $l/$m")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_in", LongType),
      StructField("n_out", LongType), StructField("s_sum", LongType),
      StructField("s_posw", LongType), StructField("s_min", LongType),
      StructField("s_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"expected 16-bit little-endian mono signed PCM, got $fmt")
          val data = ais.readAllBytes(); ais.close()
          require(data.length % 2 == 0,
            s"odd PCM byte count ${data.length}: truncated int16 stream")
          val n = data.length / 2
          def s(i: Int): Long =
            ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
          val nOut = if (n == 0) 0 else (l * (n - 1)) / m + 1
          var sum = 0L; var posw = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var j = 0
          while (j < nOut) {
            val base = (j * m) / l
            val frac = (j * m) % l
            val v = if (frac == 0) s(base)
              else s(base) + (s(base + 1) - s(base)) * frac / l
            sum += v; posw += j.toLong * v
            if (v < mn) mn = v; if (v > mx) mx = v
            j += 1
          }
          Row(r.getAs[Long]("doc_id"), n.toLong, nOut.toLong, sum, posw,
            if (nOut == 0) 0L else mn, if (nOut == 0) 0L else mx)
        }
      }(enc).toDF().orderBy(col("doc_id"))
  }

  /** SILENCE-TRIM / CLIPPING segmentation (round 12) — what a speech
    * curation pipeline does with the energy profile [[wavRmsWindows]]
    * computes: per clip, how many windows are silent (window energy
    * below `silentMeanEnergy` per sample — integer cross-multiplied
    * compare, no division), how many clip (peak ≥ `clipPeak`), and the
    * trim boundaries — the first and last NON-silent window (NULL when
    * the whole clip is silent: structural, a dead clip is visible).
    * Built directly ON the windowed profile (one more
    * map-side-combinable aggregate past the decode — the derived-view
    * doctrine), so the real javax.sound decode path is shared and the
    * analytic fixture replays the whole report in the oracle.
    *
    * Output: (doc_id, n_windows, n_silent, n_clipped, first_active,
    * last_active), ordered. */
  def wavSilenceTrim(spark: SparkSession, ingested: DataFrame,
                     win: Int = 16, silentMeanEnergy: Long = 300000000L,
                     clipPeak: Long = 32000L): DataFrame =
    wavRmsWindows(spark, ingested, win)
      .withColumn("silent",
        col("energy") < lit(silentMeanEnergy) * col("n_samples"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"),
        sum(when(col("peak") >= clipPeak, 1L).otherwise(0L)).as("n_clipped"),
        min(when(!col("silent"), col("win"))).as("first_active"),
        max(when(!col("silent"), col("win"))).as("last_active"))
      .orderBy(col("doc_id"))

  /** The mapPartitions decode harness with a REAL codec: javax.imageio's
    * BMP reader (an independent JDK implementation — not our encoder run
    * backwards) decodes each payload; per-pixel statistics come off the
    * decoded raster. One decoder context per PARTITION, batch-iterating
    * rows — the exact shape a heavyweight codec needs (amortized init,
    * bounded memory). Output schema is fixed and explicit, as a real
    * Arrow/mapInPandas boundary requires; `px_posw` is position-weighted
    * so a decoder that flips BMP's bottom-up row order cannot pass.
    * (Partition ids are deliberately NOT emitted: output is a pure
    * function of the data, independent of partitioning.) */
  def decodePartitions(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_pixels", LongType),
      StructField("px_sum", LongType),
      StructField("px_posw", LongType),
      StructField("px_min", LongType),
      StructField("px_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = ingested.select(col("doc_id"), col("media_bytes"))
    in.mapPartitions { rows =>
      // a stateful codec would be opened once HERE (ImageIO's static
      // entry point is already per-JVM); close at iterator end.
      // setUseCache(false): ImageIO's default ImageInputStream is
      // DISK-backed — a temp file per decoded row; in-memory streams
      // are the only sane setting for a per-row decode loop
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media_bytes")
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, "undecodable media payload")
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L; var posw = 0L
        var mn = 255L; var mx = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val red = (img.getRGB(x, y) >> 16) & 0xff
            val i = y.toLong * w + x
            sum += red; posw += i * red
            if (red < mn) mn = red
            if (red > mx) mx = red
            x += 1
          }
          y += 1
        }
        Row(r.getAs[Long]("doc_id"), w.toLong, h.toLong, w.toLong * h,
          sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** Deterministic synthetic PNG dims — moduli coprime to the BMP ones
    * so the two codec paths never share a shape by accident. */
  def pngWidth(nChars: Long): Int = (nChars % 11 + 4).toInt
  def pngHeight(nChars: Long): Int = (nChars % 5 + 4).toInt

  /** Encode one well-formed 8-bit GRAYSCALE PNG: signature, IHDR, a
    * single zlib IDAT, IEND, with the CRC32 of every chunk. Hand-built
    * like [[bmpBytes]]: the container bytes, scanline filter bytes and
    * chunk CRCs are authored here (the zlib stream itself comes from
    * `java.util.zip.Deflater` — not ImageIO), so [[decodeGrayPartitions]]
    * reading it back through ImageIO's OWN PNG codec (inflate, CRC check,
    * scanline defilter) is an independent decode, not the encoder run
    * backwards. Pixel (x,y) carries [[pixelValue]](docId, y*w+x); PNG
    * stores rows top-down, so the index is direct — BMP's bottom-up flip
    * is the OTHER path's trap, and a decoder confusing the two fails the
    * position-weighted checksum. */
  def pngBytes(docId: Long, nChars: Long): Array[Byte] = {
    val w = pngWidth(nChars); val h = pngHeight(nChars)
    // raw scanlines: filter byte 0 (None) + w grayscale samples per row
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      val base = y * (w + 1)
      raw(base) = 0
      var x = 0
      while (x < w) {
        raw(base + 1 + x) = pixelValue(docId, y.toLong * w + x).toByte
        x += 1
      }
      y += 1
    }
    val z = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(z)
    dos.write(raw); dos.close()
    val idat = z.toByteArray
    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }
    // IHDR: width, height, bit depth 8, color type 0 (grayscale),
    // compression 0 (zlib), filter method 0, no interlace
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array())
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Ingest real PNG media: one synthetic grayscale PNG per document. */
  def ingestPng(docs: DataFrame): DataFrame = {
    val png = udf((docId: Long, nChars: Long) => pngBytes(docId, nChars))
    docs.select(
      col("doc_id"),
      png(col("doc_id"), col("n_chars")).as("media_bytes"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        lit(null).cast("long").as("width"),
        lit(null).cast("long").as("height"),
        lit("image/png").as("mime")).as("media_meta"))
  }

  /** Deterministic synthetic JPEG dims: ≥ 8 on each axis so every image
    * spans at least one full 8×8 DCT block. */
  def jpegWidth(nChars: Long): Int = (nChars % 9 + 8).toInt
  def jpegHeight(nChars: Long): Int = (nChars % 6 + 8).toInt

  /** Smooth grayscale ramp for the lossy leg: JPEG reproduces gradients
    * with small bounded error, so a spec can assert a mean-absolute-error
    * bound (the sharp %256 wrap of [[pixelValue]] would ring at every
    * wrap edge and make the bound meaningless). */
  def smoothValue(docId: Long, x: Int, y: Int): Int =
    math.min(255, (docId % 8).toInt * 16 + x * 6 + y * 3)

  /** Encode one grayscale JPEG through ImageIO's own writer. Unlike
    * [[bmpBytes]]/[[pngBytes]] this container is NOT hand-built (JPEG
    * entropy coding is out of scope), so the leg does not claim encoder/
    * decoder independence; what it proves is that the one-codec-per-
    * partition harness handles a heavyweight LOSSY codec: dimensions are
    * exact, pixel values are approximate BY DESIGN — checked by a
    * mean-absolute-error spec, never a value oracle. */
  def jpegBytes(docId: Long, nChars: Long): Array[Byte] = {
    val w = jpegWidth(nChars); val h = jpegHeight(nChars)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, smoothValue(docId, x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val ok = javax.imageio.ImageIO.write(img, "jpg", out)
    require(ok, "no JPEG writer available")
    out.toByteArray
  }

  /** Ingest lossy media: one synthetic grayscale JPEG per document. */
  def ingestJpeg(docs: DataFrame): DataFrame = {
    val jpg = udf((docId: Long, nChars: Long) => jpegBytes(docId, nChars))
    docs.select(
      col("doc_id"),
      jpg(col("doc_id"), col("n_chars")).as("media_bytes"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        lit(null).cast("long").as("width"),
        lit(null).cast("long").as("height"),
        lit("image/jpeg").as("mime")).as("media_meta"))
  }

  /** Lossy-codec VERDICT row (round 9) — makes the JPEG leg visible to
    * the hash oracle despite lossy values: per document, the decoded
    * dimensions and pixel count are EXACT (oracle-replayable from
    * n_chars), the payload byte count is exact, and the pixel values
    * collapse to one integer error-band boolean — max |decoded −
    * [[smoothValue]]| ≤ `band` — which the oracle asserts as literal
    * TRUE. A broken encoder, decoder, or harness flips dims, counts or
    * the verdict and the hash mismatches; the values themselves stay
    * approximate BY DESIGN (no value oracle, per the [[jpegBytes]]
    * doctrine). Band default 8: measured max |err| on the sf0.01 and
    * sf0.1 corpora is 3 (smooth ramps quantize gently), so 8 is ~2.6×
    * headroom yet still catches any real decode regression. Same
    * one-decoder-per-partition shape as [[decodeGrayPartitions]];
    * narrow, no shuffle — scale-safe. */
  def decodeJpegVerdict(spark: SparkSession, ingested: DataFrame,
                        band: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_pixels", LongType),
      StructField("err_band", LongType),
      StructField("within_band", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = ingested.select(col("doc_id"), col("media_bytes"),
      col("media_meta.n_bytes").as("n_bytes"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val docId = r.getAs[Long]("doc_id")
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        require(img != null, "undecodable media payload")
        val raster = img.getRaster
        val w = img.getWidth; val h = img.getHeight
        var maxErr = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val e = math.abs(raster.getSample(x, y, 0) -
              smoothValue(docId, x, y)).toLong
            if (e > maxErr) maxErr = e
            x += 1
          }
          y += 1
        }
        Row(docId, r.getAs[Long]("n_bytes"), w.toLong, h.toLong,
          w.toLong * h, band.toLong, maxErr <= band)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** Grayscale decode in the same one-codec-per-partition harness as
    * [[decodePartitions]], for single-band images (the PNG leg). Samples
    * come off the decoded RASTER (band 0) rather than `getRGB`:
    * `TYPE_BYTE_GRAY`'s gray→sRGB conversion is non-identity (gamma), so
    * `getRGB` would corrupt the raw sample values that the analytic
    * oracle replays — the raster read is the decoder's own defiltered
    * bytes, untransformed. Same fixed output schema and position-weighted
    * checksum as the BMP leg. */
  def decodeGrayPartitions(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_pixels", LongType),
      StructField("px_sum", LongType),
      StructField("px_posw", LongType),
      StructField("px_min", LongType),
      StructField("px_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = ingested.select(col("doc_id"), col("media_bytes"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no disk-backed streams
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        require(img != null, "undecodable media payload")
        val raster = img.getRaster
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L; var posw = 0L
        var mn = 255L; var mx = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0).toLong
            val i = y.toLong * w + x
            sum += v; posw += i * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        Row(r.getAs[Long]("doc_id"), w.toLong, h.toLong, w.toLong * h,
          sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** BILINEAR resize in the same codec harness as [[resizePartitions]] —
    * the smooth-kernel counterpart to its nearest-neighbor index math.
    * Half-pixel-center source mapping with clamp-to-edge, the standard
    * image-pipeline convention: dst pixel dx samples source coordinate
    * fx = (dx+0.5)·w/dstW − 0.5, blending the 2×2 neighborhood with
    * weights (1−frac, frac) per axis.
    *
    * All arithmetic is EXACT INTEGER fixed-point: fx = xnum/(2·dstW)
    * with xnum = (2·dx+1)·w − dstW, so the fractional weights are
    * rationals with denominator 2·dstW, and the blended value scaled by
    * (2·dstW)·(2·dstH) is an integer both engines compute identically —
    * the emitted `rb_*` stats are those SCALED values (scale 64 for the
    * default 4×4), which is what makes a bilinear kernel — normally a
    * float soup no two engines agree on bit-for-bit — fully
    * DuckDB-oracle-checkable. */
  def resizeBilinearPartitions(spark: SparkSession, ingested: DataFrame,
                               dstW: Int = 4, dstH: Int = 4): DataFrame = {
    require(dstW > 0 && dstH > 0, s"bad target shape ${dstW}x$dstH")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("src_width", LongType),
      StructField("src_height", LongType),
      StructField("rb_sum", LongType),
      StructField("rb_posw", LongType),
      StructField("rb_min", LongType),
      StructField("rb_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val denX = 2 * dstW; val denY = 2 * dstH
    val in = ingested.select(col("doc_id"), col("media_bytes"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no disk-backed streams
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        require(img != null, "undecodable media payload")
        val w = img.getWidth; val h = img.getHeight
        def red(x: Int, y: Int): Long = ((img.getRGB(x, y) >> 16) & 0xff).toLong
        var sum = 0L; var posw = 0L
        var mn = Long.MaxValue; var mx = Long.MinValue
        var dy = 0
        while (dy < dstH) {
          val ynum = (2 * dy + 1) * h - dstH
          var y0 = if (ynum < 0) 0 else ynum / denY
          var ry = if (ynum < 0) 0L else (ynum % denY).toLong
          if (y0 > h - 1) { y0 = h - 1; ry = 0L }
          val y1 = math.min(y0 + 1, h - 1)
          var dx = 0
          while (dx < dstW) {
            val xnum = (2 * dx + 1) * w - dstW
            var x0 = if (xnum < 0) 0 else xnum / denX
            var rx = if (xnum < 0) 0L else (xnum % denX).toLong
            if (x0 > w - 1) { x0 = w - 1; rx = 0L }
            val x1 = math.min(x0 + 1, w - 1)
            val v = (denY - ry) * ((denX - rx) * red(x0, y0) + rx * red(x1, y0)) +
              ry * ((denX - rx) * red(x0, y1) + rx * red(x1, y1))
            val i = dy.toLong * dstW + dx
            sum += v; posw += i * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            dx += 1
          }
          dy += 1
        }
        Row(r.getAs[Long]("doc_id"), w.toLong, h.toLong, sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** Deterministic synthetic GIF dims + frame count: small multi-frame
    * "videos" (GIF is the one animated container the JDK decodes out of
    * the box), moduli distinct from every still-image leg. */
  def gifWidth(nChars: Long): Int = (nChars % 8 + 4).toInt
  def gifHeight(nChars: Long): Int = (nChars % 6 + 4).toInt
  def gifNumFrames(nChars: Long): Int = (nChars % 4 + 2).toInt

  /** Grayscale value of pixel `i` (row-major) in frame `f` — the fixed
    * arithmetic the DuckDB oracle replays analytically per frame. */
  def gifPixelValue(docId: Long, frame: Long, i: Long): Int =
    ((docId * 31 + frame * 97 + i * 7) % 256).toInt

  /** LSB-first GIF code packer (GIF's LZW bit order). */
  private final class GifBitPacker {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur |= code << nbits
      nbits += width
      while (nbits >= 8) { buf.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    def toBytes: Array[Byte] = {
      if (nbits > 0) { buf.write(cur & 0xff); cur = 0; nbits = 0 }
      buf.toByteArray
    }
  }

  /** Encode one well-formed ANIMATED GIF89a: header + logical screen
    * descriptor, 256-entry grayscale global color table, and per frame a
    * graphic-control extension, image descriptor and LZW-coded indices.
    * Hand-built like [[bmpBytes]]/[[pngBytes]] — including the LZW
    * stream, authored with the fixed-width technique (a CLEAR code every
    * 200 literals keeps the decoder's table under 2^9 entries, so every
    * code is exactly 9 bits and no variable-width state machine is
    * needed; the stream is valid LZW, just minimally compressed). The
    * decoder ([[decodeGifFramesPartitions]]) is ImageIO's OWN GIF
    * reader — real LZW table reconstruction + palette lookup — so a
    * wrong sub-block length, bit order or table-growth boundary fails
    * loudly rather than round-tripping. Palette entry i is (i,i,i), so
    * the index IS the gray value and the codec is lossless — the
    * analytic pixel oracle applies exactly, unlike the JPEG leg. */
  def gifBytes(docId: Long, nChars: Long): Array[Byte] =
    gifBytesDims(docId, gifWidth(nChars), gifHeight(nChars),
      gifNumFrames(nChars))

  /** Explicit-dims entry point: the production moduli cap frames at
    * 11×9 = 99 pixels, which never reaches the 200-literal CLEAR branch
    * in the packer loop — this hook lets the spec drive ≥200-pixel
    * frames through ImageIO so that branch is exercised BEFORE any
    * future modulus growth meets it in production decode. */
  private[graft] def gifBytesDims(docId: Long, w: Int, h: Int,
                                  nf: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    u16(w); u16(h)
    out.write(0xF7) // global color table present, 8-bit color, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    val Clear = 256; val Eoi = 257
    var f = 0
    while (f < nf) {
      out.write(0x21); out.write(0xF9); out.write(4) // graphic control ext
      out.write(0)  // no disposal, no transparency
      u16(10)       // delay: 100 ms
      out.write(0); out.write(0)
      out.write(0x2C) // image descriptor: full-frame, no local table
      u16(0); u16(0); u16(w); u16(h); out.write(0)
      out.write(8)  // LZW minimum code size
      val bits = new GifBitPacker
      bits.put(Clear, 9)
      val n = w * h
      var i = 0
      var sinceClear = 0
      while (i < n) {
        bits.put(gifPixelValue(docId, f, i), 9)
        sinceClear += 1
        // decoder table grows by one entry per code after the first; a
        // clear every 200 literals stays far below the 9->10-bit
        // boundary at 512 entries (and clear of deferred-clear ambiguity)
        if (sinceClear == 200 && i < n - 1) { bits.put(Clear, 9); sinceClear = 0 }
        i += 1
      }
      bits.put(Eoi, 9)
      val data = bits.toBytes
      var off = 0
      while (off < data.length) { // ≤255-byte sub-blocks
        val len = math.min(255, data.length - off)
        out.write(len); out.write(data, off, len); off += len
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Ingest real video-ish media: one synthetic animated GIF per doc. */
  def ingestGif(docs: DataFrame): DataFrame = {
    val gif = udf((docId: Long, nChars: Long) => gifBytes(docId, nChars))
    docs.select(
      col("doc_id"),
      gif(col("doc_id"), col("n_chars")).as("media_bytes"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        lit("image/gif").as("mime")).as("media_meta"))
  }

  /** Multi-frame container decode + frame sampling in the same
    * one-codec-per-partition harness: ImageIO's GIF reader opens each
    * payload ONCE, `getNumImages` counts frames, and every `step`-th
    * frame is decoded (real LZW + palette lookup) and reduced to pixel
    * stats — [[sampleFrames]]'s explode pattern joined to a REAL decode.
    * One row per sampled frame; `px_posw` is position-weighted so a
    * frame-order or row-order bug cannot pass the oracle. */
  def decodeGifFramesPartitions(spark: SparkSession, ingested: DataFrame,
                                step: Int = 2): DataFrame = {
    require(step > 0, s"bad frame step $step")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("n_frames", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("px_sum", LongType),
      StructField("px_posw", LongType),
      StructField("px_min", LongType),
      StructField("px_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = ingested.select(col("doc_id"), col("media_bytes"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no disk-backed streams
      rows.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no reader for media payload")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val nf = reader.getNumImages(true)
          (0 until nf by step).map { fi =>
            val img = reader.read(fi)
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L; var posw = 0L; var mn = 255L; var mx = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = ((img.getRGB(x, y) >> 16) & 0xff).toLong
                val i = y.toLong * w + x
                sum += v; posw += i * v
                if (v < mn) mn = v
                if (v > mx) mx = v
                x += 1
              }
              y += 1
            }
            Row(r.getAs[Long]("doc_id"), fi.toLong, nf.toLong, w.toLong,
              h.toLong, sum, posw, mn, mx)
          }
        } finally { reader.dispose(); iis.close() }
      }
    }(enc).toDF().orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Nearest-neighbor RESIZE in the same mapPartitions codec harness as
    * [[decodePartitions]]: decode each payload with ImageIO, resample to
    * a fixed `dstW`×`dstH` thumbnail — the shape-normalization step every
    * vision feature pipeline runs before batching — and emit stats over
    * the RESIZED pixels. Nearest neighbor is exact integer index math
    * (src = (dst · srcDim) div dstDim), so the oracle replays the pixel
    * selection analytically; a real bilinear/Lanczos kernel would slot
    * into the same harness with a spec-only check. */
  def resizePartitions(spark: SparkSession, ingested: DataFrame,
                       dstW: Int = 4, dstH: Int = 4): DataFrame = {
    require(dstW > 0 && dstH > 0, s"bad target shape ${dstW}x$dstH")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("src_width", LongType),
      StructField("src_height", LongType),
      StructField("r_sum", LongType),
      StructField("r_posw", LongType),
      StructField("r_min", LongType),
      StructField("r_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = ingested.select(col("doc_id"), col("media_bytes"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no disk-backed streams
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        require(img != null, "undecodable media payload")
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L; var posw = 0L; var mn = 255L; var mx = 0L
        var dy = 0
        while (dy < dstH) {
          val sy = dy * h / dstH
          var dx = 0
          while (dx < dstW) {
            val sx = dx * w / dstW
            val red = (img.getRGB(sx, sy) >> 16) & 0xff
            val i = dy.toLong * dstW + dx
            sum += red; posw += i * red
            if (red < mn) mn = red
            if (red > mx) mx = red
            dx += 1
          }
          dy += 1
        }
        Row(r.getAs[Long]("doc_id"), w.toLong, h.toLong, sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** CENTER CROP (round 13) — the third member of the spatial
    * preprocess trio ([[resizePartitions]] stretches,
    * `letterboxPartitions` pads, THIS cuts): the fixed-size central
    * window ((w−cw)/2, (h−ch)/2 integer offsets — the torchvision/
    * PIL convention) every vision pipeline applies after a
    * shorter-side resize. Real ImageIO decode in the shared
    * per-partition harness; the emitted offsets make the window
    * placement itself oracle-checked, and the position-weighted digest
    * catches any raster-order slip. Output: (doc_id, src_width,
    * src_height, x0, y0, c_sum, c_posw, c_min, c_max), ordered. */
  def cropCenterPartitions(spark: SparkSession, ingested: DataFrame,
                           cw: Int = 4, ch: Int = 4): DataFrame = {
    require(cw > 0 && ch > 0, s"bad crop shape ${cw}x$ch")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("src_width", LongType),
      StructField("src_height", LongType),
      StructField("x0", LongType), StructField("y0", LongType),
      StructField("c_sum", LongType), StructField("c_posw", LongType),
      StructField("c_min", LongType), StructField("c_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        require(img != null, "undecodable media payload")
        val w = img.getWidth; val h = img.getHeight
        require(w >= cw && h >= ch,
          s"image ${w}x$h smaller than crop ${cw}x$ch")
        val x0 = (w - cw) / 2; val y0 = (h - ch) / 2
        var sum = 0L; var posw = 0L; var mn = 255L; var mx = 0L
        var dy = 0
        while (dy < ch) {
          var dx = 0
          while (dx < cw) {
            val red = (img.getRGB(x0 + dx, y0 + dy) >> 16) & 0xff
            val i = dy.toLong * cw + dx
            sum += red; posw += i * red
            if (red < mn) mn = red
            if (red > mx) mx = red
            dx += 1
          }
          dy += 1
        }
        Row(r.getAs[Long]("doc_id"), w.toLong, h.toLong, x0.toLong,
          y0.toLong, sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** HORIZONTAL FLIP (round 13) — the mirror augmentation, the
    * cheapest train-time augmentation every vision pipeline runs (and
    * the fourth spatial op beside resize / letterbox / crop: stretch,
    * pad, cut, MIRROR). Real ImageIO decode in the shared harness;
    * the flip itself is index arithmetic — output raster position
    * (x, y) reads source (w−1−x, y). The plain sum/min/max are
    * flip-INVARIANT (same multiset of pixels — they audit the decode),
    * while the position-weighted digest is the flip PROOF: it matches
    * the oracle's mirrored-index replay only if every row was actually
    * reversed. Output: (doc_id, width, height, f_sum, f_posw, f_min,
    * f_max), ordered. */
  def flipHorizontalPartitions(spark: SparkSession,
                               ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("f_sum", LongType), StructField("f_posw", LongType),
      StructField("f_min", LongType), StructField("f_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        require(img != null, "undecodable media payload")
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L; var posw = 0L; var mn = 255L; var mx = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val red = (img.getRGB(w - 1 - x, y) >> 16) & 0xff
            val i = y.toLong * w + x
            sum += red; posw += i * red
            if (red < mn) mn = red
            if (red > mx) mx = red
            x += 1
          }
          y += 1
        }
        Row(r.getAs[Long]("doc_id"), w.toLong, h.toLong, sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** ROTATE 90° clockwise (round 13) — the other lossless spatial
    * augmentation beside [[flipHorizontalPartitions]] (together they
    * generate the dihedral orientation set every augmentation policy
    * samples from). Output dimensions SWAP (w_out = h, h_out = w) and
    * output pixel (x, y) reads source column y, source row h−1−x —
    * i.e. source raster index (h−1−x)·w + y. Sum/min/max are
    * rotation-INVARIANT (decode audit); the position-weighted digest
    * proves the index map. Output: (doc_id, out_width, out_height,
    * r_sum, r_posw, r_min, r_max), ordered. */
  def rotate90Partitions(spark: SparkSession,
                         ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("out_width", LongType), StructField("out_height", LongType),
      StructField("r_sum", LongType), StructField("r_posw", LongType),
      StructField("r_min", LongType), StructField("r_max", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    ingested.select(col("doc_id"), col("media_bytes")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
        require(img != null, "undecodable media payload")
        val w = img.getWidth; val h = img.getHeight
        val ow = h; val oh = w // CW rotation swaps dims
        var sum = 0L; var posw = 0L; var mn = 255L; var mx = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            // CW: output (x, y) ← source (y_src = h-1-x, x_src = y)
            val red = (img.getRGB(y, h - 1 - x) >> 16) & 0xff
            val i = y.toLong * ow + x
            sum += red; posw += i * red
            if (red < mn) mn = red
            if (red > mx) mx = red
            x += 1
          }
          y += 1
        }
        Row(r.getAs[Long]("doc_id"), ow.toLong, oh.toLong, sum, posw, mn, mx)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }

  /** Perceptual dHash of one decoded image: nearest-neighbor downsample
    * to a 9×8 grid (same `dx*w/9`, `dy*h/8` integer mapping as the
    * resize legs), then one bit per horizontally-adjacent grid pair —
    * `grid(r)(c) > grid(r)(c+1)` — packed LOW BIT FIRST into four
    * 16-bit band values (band k covers grid rows 2k and 2k+1). Bands
    * are the unit the dedup groups on; they are never packed into one
    * 64-bit word so the DuckDB oracle can replay them without signed
    * shift overflow at bit 63. */
  private def dhashBands(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    val grid = new Array[Int](72) // 9 cols × 8 rows, row-major
    var dy = 0
    while (dy < 8) {
      val sy = dy * h / 8
      var dx = 0
      while (dx < 9) {
        grid(dy * 9 + dx) = (img.getRGB(dx * w / 9, sy) >> 16) & 0xff
        dx += 1
      }
      dy += 1
    }
    val bands = new Array[Long](4)
    var k = 0
    while (k < 4) {
      var j = 0
      while (j < 16) {
        val r = 2 * k + j / 8; val c = j % 8
        if (grid(r * 9 + c) > grid(r * 9 + c + 1)) bands(k) |= 1L << j
        j += 1
      }
      k += 1
    }
    bands
  }

  /** Perceptual-hash image dedup — the FIRST dedup pass a 100 TB image
    * lake runs: decode each payload with the real codec
    * ([[decodePartitions]]'s ImageIO harness), reduce it to a dHash
    * fingerprint ([[dhashBands]] — gradient signs survive re-encoding
    * and brightness shifts, unlike a byte digest), then EXACT-fingerprint
    * group: canonical = min doc_id per identical hash. Linear shapes
    * end to end — a narrow per-row decode and one shuffle on the hash,
    * the `dedup_exact` doctrine lifted to pixels; pairwise near-dup
    * banding (the `dedup_simhash` shape) stays a second pass over the
    * survivors, deliberately not fused here because exact-hash grouping
    * removes the overwhelming share of image duplicates before any
    * pairwise work exists.
    *
    * Oracle-replayable because the fixture pixels are analytic
    * ([[pixelValue]]): the oracle recomputes grid, bands and grouping in
    * SQL; the engine path still decodes the real bytes, so a codec that
    * mis-decodes fails the compare.
    *
    * Output: one row per image — (doc_id, b0..b3, canon, group_n,
    * is_canonical), ordered by doc_id. */
  def dhashDedup(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("b0", LongType), StructField("b1", LongType),
      StructField("b2", LongType), StructField("b3", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val sigs = ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no disk-backed streams
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val b = dhashBands(img)
          Row(r.getAs[Long]("doc_id"), b(0), b(1), b(2), b(3))
        }
      }(enc).toDF()
    val hashCols = Seq("b0", "b1", "b2", "b3")
    val groups = sigs.groupBy(hashCols.map(col): _*)
      .agg(min(col("doc_id")).as("canon"), count(lit(1)).as("group_n"))
    sigs.join(groups, hashCols)
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("canon"), col("group_n"),
        (col("doc_id") === col("canon")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-point DCT-II basis for [[phashDedup]]: C[u][x] =
    * round(16384·cos(π(2x+1)u/16)). StrictMath.cos guarantees
    * bit-identical constants on every JVM; the oracle embeds the SAME
    * 64 integers as literals, so the two sides cannot drift. 14
    * fraction bits keep every DCT sum exact in a long
    * (255·2^28·64 ≈ 2^42). */
  private[graft] lazy val dctTable: Array[Array[Long]] =
    Array.tabulate(8, 8)((u, x) =>
      math.round(16384.0 * StrictMath.cos(Math.PI * (2 * x + 1) * u / 16.0)))

  /** pHash of one decoded image: 8×8 nearest-neighbor gray grid → 2D
    * DCT-II in the fixed-point integer basis ([[dctTable]]) → median of
    * the 63 AC coefficients (nearest-rank: the 32nd smallest) → bit i
    * (= u·8+v, DC always 0) set iff F(u,v) > median. Returned as 4
    * 16-bit bands plus the median. All exact integer arithmetic. */
  private def phashBands(img: java.awt.image.BufferedImage): (Array[Long], Long) = {
    val w = img.getWidth; val h = img.getHeight
    val g = Array.tabulate(8, 8)((r, c) =>
      ((img.getRGB(c * w / 8, r * h / 8) >> 16) & 0xff).toLong)
    val f = Array.tabulate(8, 8) { (u, v) =>
      var s = 0L; var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) { s += g(r)(c) * dctTable(u)(r) * dctTable(v)(c); c += 1 }
        r += 1
      }
      s
    }
    val ac = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
      yield f(u)(v)).sorted
    val med = ac(31)
    val bands = new Array[Long](4)
    for (u <- 0 until 8; v <- 0 until 8) {
      val i = u * 8 + v
      if (i != 0 && f(u)(v) > med) bands(i / 16) |= 1L << (i % 16)
    }
    (bands, med)
  }

  /** DCT perceptual-hash image dedup (round 11) — the SECOND perceptual
    * fingerprint next to [[dhashDedup]]'s gradient hash, and the one
    * production image pipelines default to (the pHash lineage —
    * Zauner 2010, public): dHash keys on local gradient signs, pHash on
    * the image's low-frequency SPECTRUM, so it survives blur and
    * high-frequency noise that flip gradient bits. The classic
    * float DCT + mean threshold is replaced by an integer-exact
    * surrogate — fixed-point DCT basis ([[dctTable]]), nearest-rank
    * median of the 63 AC terms — so unusually for a perceptual hash
    * every bit replays in the DuckDB oracle (the fixture pixels are
    * analytic; the ENGINE path still decodes the real BMP bytes through
    * ImageIO, so a codec mis-decode fails the compare).
    *
    * Same scale shape as the dHash leg: narrow per-partition decode
    * (one codec instance per partition, no disk cache), one shuffle on
    * the hash for exact-fingerprint grouping, canonical = min doc_id.
    * Output: (doc_id, p0..p3, median_ac, canon, group_n, is_canonical),
    * ordered. */
  /** Hamming verify threshold for [[phashNearDupPairs]], shared with
    * the oracle generator. Pigeonhole: ≤ 3 differing bits over 4
    * bands guarantees at least one band matches exactly — the Manku
    * block-combination argument at its simplest split. */
  val PhashMaxHamming: Int = 3

  /** pHash HAMMING NEAR-DUP PAIRS (round 12) — the "second pass over
    * survivors" the exact-hash grouping keys (`multimodal_dhash`,
    * `multimodal_phash`) document: re-encodes, mild crops and noise
    * flip a FEW spectrum bits, so the near-dup relation needs
    * Hamming ≤ [[PhashMaxHamming]], not equality. Candidates by the
    * band-exact pigeonhole (any ≤3-bit pair shares one of the 4
    * 16-bit bands verbatim — recall 1 by construction), enumerated
    * through the shared bounded-bucket machinery (a re-encode farm's
    * identical band is the hot bucket being bounded), then the exact
    * bit_count Hamming verify. Real decode; the analytic oracle
    * replays candidates AND verify bit-for-bit.
    *
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b, ordered. */
  def phashNearDupPairs(spark: SparkSession, ingested: DataFrame,
                        maxHamming: Int = PhashMaxHamming,
                        maxBucket: Int = 1024,
                        overflow: graft.operators.BucketOverflow =
                          graft.operators.BucketOverflow.Fail): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("p0", LongType), StructField("p1", LongType),
      StructField("p2", LongType), StructField("p3", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val sigs = ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val (b, _) = phashBands(img)
          Row(r.getAs[Long]("doc_id"), b(0), b(1), b(2), b(3))
        }
      }(enc).toDF().localCheckpoint()
    val keyed = sigs.select(col("doc_id"),
        posexplode(array((0 until 4).map(k => col(s"p$k")): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
    val cand = Dedup.boundedCandidatePairs(keyed, "doc_id",
      Seq("band", "bucket"), maxBucket, overflow, "phashNearDupPairs")
    val a = sigs.select(col("doc_id").as("doc_a") +:
      (0 until 4).map(k => col(s"p$k").as(s"a$k")): _*)
    val b = sigs.select(col("doc_id").as("doc_b") +:
      (0 until 4).map(k => col(s"p$k").as(s"b$k")): _*)
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("hamming",
        (0 until 4).map(k =>
          bit_count(col(s"a$k").bitwiseXOR(col(s"b$k"))).cast("long"))
          .reduce(_ + _))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def phashDedup(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("p0", LongType), StructField("p1", LongType),
      StructField("p2", LongType), StructField("p3", LongType),
      StructField("median_ac", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val sigs = ingested.select(col("doc_id"), col("media_bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media_bytes")))
          require(img != null, "undecodable media payload")
          val (b, med) = phashBands(img)
          Row(r.getAs[Long]("doc_id"), b(0), b(1), b(2), b(3), med)
        }
      }(enc).toDF()
    val hashCols = Seq("p0", "p1", "p2", "p3")
    val groups = sigs.groupBy(hashCols.map(col): _*)
      .agg(min(col("doc_id")).as("canon"), count(lit(1)).as("group_n"))
    sigs.join(groups, hashCols)
      .select(col("doc_id"), col("p0"), col("p1"), col("p2"), col("p3"),
        col("median_ac"), col("canon"), col("group_n"),
        (col("doc_id") === col("canon")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }
}
