package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Real-decode coverage for the multimodal path: the hand-built BMP
  * encoder must round-trip through the JDK's independent ImageIO codec
  * pixel-for-pixel, and the partition-parallel decode harness must be a
  * pure function of the data (invariant under repartitioning). */
class MultimodalSpec extends SparkSpec {

  test("bmpBytes → ImageIO: exact dimensions and per-pixel values") {
    // widths 4..16 cover every row-padding residue (BMP pads rows to 4B)
    for (nChars <- Seq(3L, 64L, 128L, 441L); docId <- Seq(0L, 7L, 12345L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.bmpBytes(docId, nChars)))
      assert(img != null, s"ImageIO rejected BMP for doc=$docId n=$nChars")
      assert(img.getWidth == Multimodal.bmpWidth(nChars))
      assert(img.getHeight == Multimodal.bmpHeight(nChars))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val i = y.toLong * img.getWidth + x
        val expected = Multimodal.pixelValue(docId, i)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == expected, s"R at ($x,$y) doc=$docId")
        assert(((rgb >> 8) & 0xff) == expected, s"G at ($x,$y) doc=$docId")
        assert((rgb & 0xff) == expected, s"B at ($x,$y) doc=$docId")
      }
    }
  }

  test("decodePartitions: stats match the analytic form, any partitioning") {
    val docs = Tables.documents(spark, sf0)
    val decoded = Multimodal.decodePartitions(spark, Multimodal.ingestBmp(docs))
      .collect()
    assert(decoded.length == docs.count())
    decoded.take(50).foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_pixels")
      val px = (0L until n).map(Multimodal.pixelValue(docId, _).toLong)
      assert(r.getAs[Long]("width") * r.getAs[Long]("height") == n)
      assert(r.getAs[Long]("px_sum") == px.sum)
      assert(r.getAs[Long]("px_posw") == px.zipWithIndex.map {
        case (v, i) => v * i }.sum)
      assert(r.getAs[Long]("px_min") == px.min)
      assert(r.getAs[Long]("px_max") == px.max)
    }
    // partition invariance: decode is a pure function of the data
    val reparted = Multimodal.decodePartitions(spark,
      Multimodal.ingestBmp(docs.repartition(7))).collect()
    assert(reparted.toSeq == decoded.toSeq)
  }

  test("gifBytes → ImageIO: a real multi-frame container — frame count, " +
    "dimensions and per-pixel values per frame") {
    for (nChars <- Seq(3L, 64L, 129L, 442L); docId <- Seq(0L, 7L, 12345L)) {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(Multimodal.gifBytes(docId, nChars)))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis)
      assert(reader.getNumImages(true) == Multimodal.gifNumFrames(nChars),
        s"frame count doc=$docId n=$nChars")
      for (f <- 0 until Multimodal.gifNumFrames(nChars)) {
        val img = reader.read(f)
        assert(img.getWidth == Multimodal.gifWidth(nChars))
        assert(img.getHeight == Multimodal.gifHeight(nChars))
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val i = y.toLong * img.getWidth + x
          val expected = Multimodal.gifPixelValue(docId, f, i)
          assert(((img.getRGB(x, y) >> 16) & 0xff) == expected,
            s"pixel ($x,$y) frame=$f doc=$docId n=$nChars")
        }
      }
      reader.dispose(); iis.close()
    }
  }

  test("decodeGifFramesPartitions: sampled-frame stats match the analytic " +
    "form; step=1 covers every frame") {
    val docs = Tables.documents(spark, sf0)
    val decoded = Multimodal.decodeGifFramesPartitions(
      spark, Multimodal.ingestGif(docs), step = 1).collect()
    // every frame of every doc is present at step=1
    val byDoc = decoded.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.forall { case (_, rs) =>
      rs.length == rs.head.getAs[Long]("n_frames")
    })
    decoded.take(60).foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val f = r.getAs[Long]("frame_idx")
      val n = r.getAs[Long]("width") * r.getAs[Long]("height")
      val px = (0L until n).map(Multimodal.gifPixelValue(docId, f, _).toLong)
      assert(r.getAs[Long]("px_sum") == px.sum, s"doc=$docId f=$f")
      assert(r.getAs[Long]("px_posw") == px.zipWithIndex.map {
        case (v, i) => v * i }.sum, s"doc=$docId f=$f")
      assert(r.getAs[Long]("px_min") == px.min)
      assert(r.getAs[Long]("px_max") == px.max)
    }
    // the sampled (step=2) form is exactly the even-frame slice
    val sampled = Multimodal.decodeGifFramesPartitions(
      spark, Multimodal.ingestGif(docs), step = 2).collect()
    val evens = decoded.filter(_.getAs[Long]("frame_idx") % 2 == 0)
    assert(sampled.toSeq == evens.toSeq)
  }

  test("decodeWavPartitions: javax.sound round-trip matches the PCM " +
    "arithmetic, any partitioning") {
    val docs = Tables.documents(spark, sf0)
    val decoded = Multimodal
      .decodeWavPartitions(spark, Multimodal.ingestWav(docs)).collect()
    assert(decoded.length == docs.count())
    decoded.take(50).foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_samples")
      val s = (0L until n).map(Multimodal.sampleValue(docId, _).toLong)
      // the rate comes from the DECODED format, not ingest metadata
      assert(r.getAs[Long]("sample_rate") == Multimodal.WavSampleRate.toLong)
      assert(r.getAs[Long]("s_sum") == s.sum)
      assert(r.getAs[Long]("s_posw") == s.zipWithIndex.map {
        case (v, i) => v * i }.sum)
      assert(r.getAs[Long]("s_min") == s.min)
      assert(r.getAs[Long]("s_max") == s.max)
    }
    val reparted = Multimodal.decodeWavPartitions(spark,
      Multimodal.ingestWav(docs.repartition(7))).collect()
    assert(reparted.toSeq == decoded.toSeq)
  }

  test("wavResamplePoly: 2/3-rate fixed-point phase step matches the " +
    "exact integer interpolation, any partitioning") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal
      .wavResamplePoly(spark, Multimodal.ingestWav(docs)).collect()
    assert(out.length == docs.count())
    out.take(50).foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_in").toInt
      def s(i: Int) = Multimodal.sampleValue(docId, i.toLong).toLong
      val nOut = if (n == 0) 0 else (2 * (n - 1)) / 3 + 1
      val vs = (0 until nOut).map { j =>
        val base = (j * 3) / 2; val frac = (j * 3) % 2
        if (frac == 0) s(base) else s(base) + (s(base + 1) - s(base)) / 2
      }
      assert(r.getAs[Long]("n_out") == nOut.toLong)
      assert(r.getAs[Long]("s_sum") == vs.sum)
      assert(r.getAs[Long]("s_posw") == vs.zipWithIndex.map {
        case (v, j) => v * j }.sum)
      assert(r.getAs[Long]("s_min") == vs.min)
      assert(r.getAs[Long]("s_max") == vs.max)
    }
    val reparted = Multimodal.wavResamplePoly(spark,
      Multimodal.ingestWav(docs.repartition(7))).collect()
    assert(reparted.toSeq == out.toSeq)
  }

  test("pngBytes → ImageIO: exact dimensions and per-pixel raster samples") {
    // widths 4..14 / heights 4..8 cover the modulus ranges; docId varies
    // the pixel ramp's phase
    for (nChars <- Seq(0L, 3L, 64L, 128L, 441L); docId <- Seq(0L, 7L, 12345L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngBytes(docId, nChars)))
      assert(img != null, s"ImageIO rejected PNG for doc=$docId n=$nChars")
      assert(img.getWidth == Multimodal.pngWidth(nChars))
      assert(img.getHeight == Multimodal.pngHeight(nChars))
      val raster = img.getRaster
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val i = y.toLong * img.getWidth + x
        assert(raster.getSample(x, y, 0) == Multimodal.pixelValue(docId, i),
          s"sample at ($x,$y) doc=$docId n=$nChars")
      }
    }
  }

  test("decodeGrayPartitions: PNG stats match the analytic form, any " +
    "partitioning") {
    val docs = Tables.documents(spark, sf0)
    val decoded = Multimodal
      .decodeGrayPartitions(spark, Multimodal.ingestPng(docs)).collect()
    assert(decoded.length == docs.count())
    decoded.take(50).foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_pixels")
      val px = (0L until n).map(Multimodal.pixelValue(docId, _).toLong)
      assert(r.getAs[Long]("width") * r.getAs[Long]("height") == n)
      assert(r.getAs[Long]("px_sum") == px.sum)
      assert(r.getAs[Long]("px_posw") == px.zipWithIndex.map {
        case (v, i) => v * i }.sum)
      assert(r.getAs[Long]("px_min") == px.min)
      assert(r.getAs[Long]("px_max") == px.max)
    }
    val reparted = Multimodal.decodeGrayPartitions(spark,
      Multimodal.ingestPng(docs.repartition(7))).collect()
    assert(reparted.toSeq == decoded.toSeq)
  }

  test("jpegBytes → decodeGrayPartitions: the lossy leg — exact dimensions, " +
    "bounded mean pixel error through the same harness") {
    import spark.implicits._
    // unit level: ImageIO round-trip per fixture shape
    for (nChars <- Seq(0L, 17L, 441L); docId <- Seq(0L, 5L, 12345L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.jpegBytes(docId, nChars)))
      assert(img != null, s"ImageIO rejected JPEG for doc=$docId n=$nChars")
      assert(img.getWidth == Multimodal.jpegWidth(nChars))
      assert(img.getHeight == Multimodal.jpegHeight(nChars))
      val raster = img.getRaster
      val errs = for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield math.abs(raster.getSample(x, y, 0) -
          Multimodal.smoothValue(docId, x, y))
      val mae = errs.sum.toDouble / errs.size
      assert(mae < 8.0, s"JPEG MAE $mae too high for doc=$docId n=$nChars")
    }
    // harness level: dimensions exact, px_sum within the MAE bound
    val docs = (0L until 40L).map(n => (n, "j" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    val decoded = Multimodal
      .decodeGrayPartitions(spark, Multimodal.ingestJpeg(docs)).collect()
    assert(decoded.length == 40)
    decoded.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val w = Multimodal.jpegWidth(docId); val h = Multimodal.jpegHeight(docId)
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
      val exact = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.smoothValue(docId, x, y).toLong).sum
      val n = r.getAs[Long]("n_pixels")
      assert(math.abs(r.getAs[Long]("px_sum") - exact) <= 8 * n,
        s"decoded px_sum drifted past the lossy bound for doc=$docId")
    }
  }

  test("gifBytesDims: frames past the 200-literal CLEAR boundary decode " +
    "pixel-exact through ImageIO (the branch production dims never reach)") {
    // 20×15 = 300 pixels/frame: the packer emits a mid-stream CLEAR at
    // literal 200 — ImageIO's LZW table reset must resync exactly
    for ((w, h) <- Seq((20, 15), (23, 11), (16, 25))) {
      val bytes = Multimodal.gifBytesDims(docId = 7L, w = w, h = h, nf = 2)
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val reader = javax.imageio.ImageIO.getImageReaders(in).next()
      reader.setInput(in)
      assert(reader.getNumImages(true) == 2)
      for (f <- 0 until 2) {
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w) {
          val got = img.getRGB(x, y) & 0xff
          assert(got == Multimodal.gifPixelValue(7L, f, y.toLong * w + x),
            s"pixel ($x,$y) frame $f at ${w}x$h")
        }
      }
      reader.dispose()
    }
  }

  test("decodeJpegVerdict: exact dims/counts, verdict TRUE at the real " +
    "band and FALSE at band 0 (the verdict is not vacuous)") {
    import spark.implicits._
    val docs = (0L until 30L).map(n => (n, "j" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    val ing = Multimodal.ingestJpeg(docs)
    val out = Multimodal.decodeJpegVerdict(spark, ing).collect()
    assert(out.length == 30)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("width") == Multimodal.jpegWidth(id))
      assert(r.getAs[Long]("height") == Multimodal.jpegHeight(id))
      assert(r.getAs[Long]("n_pixels") ==
        Multimodal.jpegWidth(id).toLong * Multimodal.jpegHeight(id))
      assert(r.getAs[Long]("n_bytes") == id) // "j" * n: n chars
      assert(r.getAs[Long]("err_band") == 8L)
      assert(r.getAs[Boolean]("within_band"), s"doc $id out of band")
    }
    // control: at band 0 the lossy codec CANNOT be exact everywhere —
    // if it were, the verdict column would assert nothing
    val strict = Multimodal.decodeJpegVerdict(spark, ing, band = 0).collect()
    assert(strict.exists(!_.getAs[Boolean]("within_band")),
      "band 0 verdict all-true: the error-band check is vacuous")
  }

  test("resizeBilinearPartitions: identity (×64) on 4x4 sources; matches " +
    "an independent double-math kernel on every fixture shape") {
    import spark.implicits._
    // 4x4 source → every dst center lands exactly on a src center, all
    // fractional weights are zero: scaled output must be 64 × decode
    val sq = Seq((1L, "x" * 91, 91L), (2L, "y" * 91, 91L))
      .toDF("doc_id", "text", "n_chars")
    val dec = Multimodal.decodePartitions(spark, Multimodal.ingestBmp(sq))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("px_sum"), r.getAs[Long]("px_posw"),
          r.getAs[Long]("px_min"), r.getAs[Long]("px_max"))).toMap
    Multimodal.resizeBilinearPartitions(spark, Multimodal.ingestBmp(sq))
      .collect().foreach { r =>
        val (s, p, mn, mx) = dec(r.getAs[Long]("doc_id"))
        assert(r.getAs[Long]("rb_sum") == 64 * s)
        assert(r.getAs[Long]("rb_posw") == 64 * p)
        assert(r.getAs[Long]("rb_min") == 64 * mn)
        assert(r.getAs[Long]("rb_max") == 64 * mx)
      }
    // independent reference kernel: plain double arithmetic, written
    // directly from the half-pixel-center definition (no shared code
    // with the integer fixed-point implementation under test). The
    // weights are eighths, so 64·v is exactly representable — equality,
    // not tolerance.
    def reference(docId: Long, nChars: Long): Seq[Long] = {
      val w = Multimodal.bmpWidth(nChars); val h = Multimodal.bmpHeight(nChars)
      def px(x: Int, y: Int) = Multimodal.pixelValue(docId, y.toLong * w + x).toDouble
      for (dy <- 0 until 4; dx <- 0 until 4) yield {
        val fx = math.max(0.0, math.min(w - 1.0, (dx + 0.5) * w / 4 - 0.5))
        val fy = math.max(0.0, math.min(h - 1.0, (dy + 0.5) * h / 4 - 0.5))
        val x0 = fx.toInt; val y0 = fy.toInt
        val x1 = math.min(x0 + 1, w - 1); val y1 = math.min(y0 + 1, h - 1)
        val gx = fx - x0; val gy = fy - y0
        val v = (1 - gy) * ((1 - gx) * px(x0, y0) + gx * px(x1, y0)) +
          gy * ((1 - gx) * px(x0, y1) + gx * px(x1, y1))
        math.round(v * 64)
      }
    }
    // one doc per (w,h) residue class: n_chars 0..90 covers all 13×7 shapes
    val shapes = (0L until 91L).map(n => (n + 100L, "z" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    val got = Multimodal
      .resizeBilinearPartitions(spark, Multimodal.ingestBmp(shapes))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    (0L until 91L).foreach { n =>
      val exp = reference(n + 100L, n)
      val r = got(n + 100L)
      assert(r.getAs[Long]("rb_sum") == exp.sum, s"sum for n_chars=$n")
      assert(r.getAs[Long]("rb_posw") == exp.zipWithIndex.map {
        case (v, i) => v * i }.sum, s"posw for n_chars=$n")
      assert(r.getAs[Long]("rb_min") == exp.min, s"min for n_chars=$n")
      assert(r.getAs[Long]("rb_max") == exp.max, s"max for n_chars=$n")
    }
  }

  test("resizePartitions: identity on 4x4 sources, downsample picks the " +
    "exact nearest-neighbor pixels") {
    import spark.implicits._
    // n_chars = 91 → width = 91%13+4 = 4, height = 91%7+4 = 4: the 4x4
    // resize is then the identity, so its stats must equal decode's
    val sq = Seq((1L, "x" * 91, 91L), (2L, "y" * 91, 91L))
      .toDF("doc_id", "text", "n_chars")
    val dec = Multimodal.decodePartitions(spark, Multimodal.ingestBmp(sq))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("px_sum"), r.getAs[Long]("px_posw"),
          r.getAs[Long]("px_min"), r.getAs[Long]("px_max"))).toMap
    val res = Multimodal.resizePartitions(spark, Multimodal.ingestBmp(sq))
      .collect()
    res.foreach { r =>
      val d = dec(r.getAs[Long]("doc_id"))
      assert((r.getAs[Long]("r_sum"), r.getAs[Long]("r_posw"),
        r.getAs[Long]("r_min"), r.getAs[Long]("r_max")) == d)
      assert(r.getAs[Long]("src_width") == 4L &&
        r.getAs[Long]("src_height") == 4L)
    }
    // a non-square source (n_chars = 1 → 5x5... use 9 → w=13%… ) —
    // downsample case: verify against the pixel formula directly
    val wide = Seq((7L, "z" * 9, 9L)).toDF("doc_id", "text", "n_chars")
    val w = Multimodal.bmpWidth(9); val h = Multimodal.bmpHeight(9)
    val expected = (for (dy <- 0 until 4; dx <- 0 until 4) yield {
      val sy = dy * h / 4; val sx = dx * w / 4
      Multimodal.pixelValue(7L, sy.toLong * w + sx).toLong
    }).toSeq
    val row = Multimodal.resizePartitions(spark, Multimodal.ingestBmp(wide))
      .collect().head
    assert(row.getAs[Long]("r_sum") == expected.sum)
    assert(row.getAs[Long]("r_min") == expected.min)
    assert(row.getAs[Long]("r_max") == expected.max)
    assert(row.getAs[Long]("r_posw") ==
      expected.zipWithIndex.map { case (v, i) => v * i }.sum)
  }

  /** Analytic dHash replay: the spec-side mirror of what the engine must
    * produce from the DECODED raster — NN 9×8 grid over pixelValue, one
    * bit per adjacent pair, low-bit-first into four 16-bit bands. */
  private def expectedBands(docId: Long, nChars: Long): Seq[Long] = {
    val w = Multimodal.bmpWidth(nChars); val h = Multimodal.bmpHeight(nChars)
    def g(r: Int, c: Int): Int =
      Multimodal.pixelValue(docId, (r * h / 8).toLong * w + c * w / 9)
    (0 until 4).map { k =>
      (0 until 16).foldLeft(0L) { (acc, j) =>
        val r = 2 * k + j / 8; val c = j % 8
        if (g(r, c) > g(r, c + 1)) acc | (1L << j) else acc
      }
    }
  }

  test("dhashDedup: bands from the real decode match the analytic replay; " +
    "exact-fingerprint grouping is canonical-min and partition-invariant") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.dhashDedup(spark, Multimodal.ingestBmp(docs)).collect()
    assert(out.length == docs.count())
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val exp = expectedBands(d, meta(d))
      val got = Seq("b0", "b1", "b2", "b3").map(r.getAs[Long])
      assert(got == exp, s"doc $d: bands $got != analytic $exp")
    }
    // grouping: canon is the min doc_id of each identical-hash class and
    // group_n its exact size — recomputed here from the band values
    val byHash = out.groupBy(r => Seq("b0", "b1", "b2", "b3").map(r.getAs[Long]))
    byHash.values.foreach { rs =>
      val ids = rs.map(_.getAs[Long]("doc_id"))
      rs.foreach { r =>
        assert(r.getAs[Long]("canon") == ids.min)
        assert(r.getAs[Long]("group_n") == rs.length)
        assert(r.getAs[Boolean]("is_canonical") ==
          (r.getAs[Long]("doc_id") == ids.min))
      }
    }
    val reparted = Multimodal.dhashDedup(spark,
      Multimodal.ingestBmp(docs.repartition(7))).collect()
    assert(reparted.toSeq == out.toSeq)
  }

  test("imageEntropy: histogram metrics match the analytic replay; " +
    "constant image scores zero, spread image scores positive") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.imageEntropy(spark, Multimodal.ingestBmp(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val d = r.getLong(0)
      val w = Multimodal.bmpWidth(meta(d)); val h = Multimodal.bmpHeight(meta(d))
      val hist = (0 until w * h)
        .groupBy(i => Multimodal.pixelValue(d, i)).view.mapValues(_.size.toLong)
      val n = (w * h).toLong
      assert(r.getLong(1) == n && r.getLong(2) == hist.size)
      assert(r.getLong(3) == hist.values.max)
      val ent = hist.values.map(c =>
        c * (64 - java.lang.Long.numberOfLeadingZeros(n / c) - 1)).sum
      assert(r.getLong(4) == ent, s"doc $d entropy surrogate")
      // step-7 pattern spreads grays: never the constant-image zero
      assert(r.getLong(4) > 0)
    }
    // the surrogate's boundary case: a constant image is exactly zero
    assert((64 - java.lang.Long.numberOfLeadingZeros(1L) - 1) == 0)
  }

  test("flipHorizontal: sum/min/max flip-invariant vs the plain decode; " +
    "posw matches the mirrored-index replay and differs from unflipped") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.flipHorizontalPartitions(spark,
        Multimodal.ingestBmp(docs)).collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    var poswDiffers = 0
    out.foreach { r =>
      val d = r.getLong(0)
      val w = Multimodal.bmpWidth(meta(d)); val h = Multimodal.bmpHeight(meta(d))
      val src = (0 until w * h).map(i => Multimodal.pixelValue(d, i).toLong)
      val flip = (0 until w * h).map { i =>
        val y = i / w; val x = i % w
        Multimodal.pixelValue(d, y.toLong * w + (w - 1 - x)).toLong
      }
      assert(r.getLong(3) == src.sum && r.getLong(5) == src.min &&
        r.getLong(6) == src.max, s"doc $d invariants")
      assert(r.getLong(4) ==
        flip.zipWithIndex.map { case (g, i) => i.toLong * g }.sum,
        s"doc $d posw")
      if (r.getLong(4) !=
        src.zipWithIndex.map { case (g, i) => i.toLong * g }.sum)
        poswDiffers += 1
    }
    // the digest must actually witness the mirror on nearly every image
    assert(poswDiffers > out.length / 2, s"only $poswDiffers posw changed")
  }

  test("wavPeakNormalize: the loudest sample lands on full scale, the " +
    "rescale replays the truncating local computation exactly") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.wavPeakNormalize(spark, Multimodal.ingestWav(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getLong(0)
      val n = Multimodal.wavNumSamples(meta(d))
      val s = (0 until n).map(i => Multimodal.sampleValue(d, i).toLong)
      val peak = s.map(math.abs).max
      val v = s.map(x => if (peak == 0) x else x * 32767L / peak)
      assert(r.getLong(2) == peak && r.getLong(3) == v.map(math.abs).max,
        s"doc $d peaks")
      // gain applied: the hottest sample sits AT full scale (the
      // max-|s| sample maps to exactly ±32767 by construction)
      assert(peak == 0 || r.getLong(3) == 32767L, s"doc $d not full scale")
      assert(r.getLong(4) == v.sum &&
        r.getLong(5) == v.zipWithIndex.map { case (x, i) => i * x }.sum,
        s"doc $d digests")
    }
  }

  test("imagePatchify: exact local 2x2 patch replay through the " +
    "decoder; odd edges crop") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.imagePatchify(spark, Multimodal.ingestBmp(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getLong(0)
      val nc = meta(d)
      val w = (nc % 13 + 4).toInt; val h = (nc % 7 + 4).toInt
      val pw = w / 2; val ph = h / 2
      def g(x: Int, y: Int): Long = (d * 31 + (y * w + x).toLong * 7) % 256
      val means = for (py <- 0 until ph; px <- 0 until pw) yield
        (g(2 * px, 2 * py) + g(2 * px + 1, 2 * py) +
          g(2 * px, 2 * py + 1) + g(2 * px + 1, 2 * py + 1)) / 4
      assert(r.toSeq == Seq(d, pw.toLong * ph, means.sum,
        means.zipWithIndex.map { case (m, i) => i * m }.sum,
        means.min, means.max), s"doc $d")
      assert(means.forall(m => m >= 0 && m <= 255))
    }
  }

  test("wavVadSegments: exact local run-length replay through the " +
    "decoder; both gate branches bite corpus-wide") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.wavVadSegments(spark, Multimodal.ingestWav(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    var voicedTotal = 0L; var windowsTotal = 0L
    out.foreach { r =>
      val d = r.getLong(0)
      val n = Multimodal.wavNumSamples(meta(d))
      val nWin = (n + 15) / 16
      val flags = (0 until nWin).map { w =>
        val idx = (w * 16) until math.min(n, (w + 1) * 16)
        val e = idx.map(i => { val s = Multimodal.sampleValue(d, i).toLong
          s * s }).sum
        e >= idx.size * Multimodal.VadThreshPerSample
      }
      val runs = flags.foldLeft(List.empty[Long]) {
        case (h :: t, true) if h > 0 => (h + 1) :: t
        case (acc, true) => 1L :: acc
        case (acc, false) => 0L :: acc
      }.filter(_ > 0)
      assert(r.toSeq == Seq(d, nWin.toLong, flags.count(identity).toLong,
        runs.length.toLong, if (runs.isEmpty) 0L else runs.max), s"doc $d")
      voicedTotal += flags.count(identity); windowsTotal += nWin
    }
    assert(voicedTotal > 0L && voicedTotal < windowsTotal,
      s"VAD gate vacuous: $voicedTotal of $windowsTotal voiced")
  }

  test("imageSobel: exact local nine-tap replay through the decoder; " +
    "edges present corpus-wide") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.imageSobel(spark, Multimodal.ingestBmp(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getLong(0)
      val nc = meta(d)
      val w = (nc % 13 + 4).toInt; val h = (nc % 7 + 4).toInt
      def g(x: Int, y: Int): Long = (d * 31 + (y * w + x).toLong * 7) % 256
      var energy = 0L; var mx = 0L; var posw = 0L; var idx = 0L
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
          (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
        val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
          (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
        val m = math.abs(gx) + math.abs(gy)
        energy += m; posw += idx * m; if (m > mx) mx = m; idx += 1
      }
      assert(r.toSeq == Seq(d, w.toLong * h,
        (w - 2).toLong * (h - 2), energy, mx, posw), s"doc $d")
      // the analytic pattern is never flat: gradients must exist
      assert(energy > 0L, s"doc $d reads zero edge energy")
    }
  }

  test("imageHistEq: exact local CDF-remap replay through the decoder; " +
    "full-scale stretch and monotone gray counts corpus-wide") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.imageHistEq(spark, Multimodal.ingestBmp(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getLong(0)
      val nc = meta(d)
      val w = (nc % 13 + 4).toInt; val h = (nc % 7 + 4).toInt
      val n = (w * h).toLong
      val px = (0 until (w * h)).map(i => ((d * 31 + i * 7) % 256).toInt)
      val hist = px.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val grays = hist.keys.toSeq.sorted
      val cdfMin = hist(grays.head)
      val cdf = grays.scanLeft(0L)((a, g) => a + hist(g)).tail
      val lut = grays.zip(cdf).map { case (g, c) =>
        g -> (if (n > cdfMin) (c - cdfMin) * 255L / (n - cdfMin) else 0L)
      }.toMap
      val eq = px.map(lut)
      assert(r.getLong(1) == n && r.getLong(2) == grays.length.toLong,
        s"doc $d counts")
      assert(r.getLong(3) == eq.distinct.length.toLong, s"doc $d grays out")
      assert(r.getLong(4) == eq.sum &&
        r.getLong(5) == eq.zipWithIndex.map { case (v, i) => i * v }.sum,
        s"doc $d digests")
      assert(r.getLong(6) == eq.min && r.getLong(7) == eq.max,
        s"doc $d range")
      // invariants: equalization never splits a gray, and any image
      // with >= 2 grays stretches to full scale
      assert(r.getLong(3) <= r.getLong(2), s"doc $d split a gray")
      if (r.getLong(2) >= 2) assert(r.getLong(7) == 255L,
        s"doc $d max ${r.getLong(7)} not full scale")
    }
  }

  test("wavMixOverlay: exact local mix replay through the decoder; " +
    "saturation bites corpus-wide") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.wavMixOverlay(spark, Multimodal.ingestWav(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    var totalClipped = 0L
    out.foreach { r =>
      val d = r.getLong(0)
      val n = Multimodal.wavNumSamples(meta(d))
      val mixed = (0 until n).map { i =>
        val s = Multimodal.sampleValue(d, i).toLong
        val raw = s + ((d * 53 + i.toLong * 7) % 65536 - 32768) / 2
        math.max(-32768L, math.min(32767L, raw))
      }
      val clipped = (0 until n).count { i =>
        val s = Multimodal.sampleValue(d, i).toLong
        val raw = s + ((d * 53 + i.toLong * 7) % 65536 - 32768) / 2
        raw > 32767L || raw < -32768L
      }.toLong
      assert(r.getLong(1) == n.toLong && r.getLong(2) == clipped,
        s"doc $d counts")
      assert(r.getLong(3) == mixed.sum &&
        r.getLong(4) == mixed.zipWithIndex.map { case (x, i) => i * x }.sum,
        s"doc $d digests")
      assert(r.getLong(5) == mixed.min && r.getLong(6) == mixed.max,
        s"doc $d range")
      assert(mixed.forall(v => v >= -32768L && v <= 32767L))
      totalClipped += clipped
    }
    // the clamp branch must actually execute somewhere in the corpus —
    // a mix that never clips is not testing saturation
    assert(totalClipped > 0L, "saturation never bit at sf0")
  }

  test("wavAutocorr: exact local PCM replay at every lag; Cauchy-Schwarz " +
    "|r_k| <= r0 holds corpus-wide") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.wavAutocorr(spark, Multimodal.ingestWav(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getLong(0); val k = r.getLong(1).toInt
      val n = Multimodal.wavNumSamples(meta(d))
      val s = (0 until n).map(i => Multimodal.sampleValue(d, i).toLong)
      val rk = (0 until n - k).map(t => s(t) * s(t + k)).sum
      val r0 = s.map(x => x * x).sum
      assert(r.getLong(3) == rk && r.getLong(4) == r0, s"doc $d lag $k")
      assert(math.abs(r.getLong(3)) <= r.getLong(4), s"CS violated doc $d")
    }
  }

  test("rotate90: dims swap, invariants hold, posw matches the rotated " +
    "index map") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.rotate90Partitions(spark,
        Multimodal.ingestBmp(docs)).collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getLong(0)
      val w = Multimodal.bmpWidth(meta(d)); val h = Multimodal.bmpHeight(meta(d))
      assert(r.getLong(1) == h && r.getLong(2) == w, s"doc $d dims")
      val src = (0 until w * h).map(i => Multimodal.pixelValue(d, i).toLong)
      val rot = (0 until w * h).map { i =>
        val ow = h; val x = i % ow; val y = i / ow
        src((h - 1 - x) * w + y)
      }
      assert(r.getLong(3) == src.sum && r.getLong(5) == src.min &&
        r.getLong(6) == src.max, s"doc $d invariants")
      assert(r.getLong(4) ==
        rot.zipWithIndex.map { case (g, i) => i.toLong * g }.sum,
        s"doc $d posw")
    }
  }

  test("imageNormStats: per-source constants match the analytic pixel " +
    "replay — exact sums, population std within 1 ulp") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.imageNormStats(spark,
        Multimodal.ingestBmp(docs), docs).collect()
    val local = docs.select(col("doc_id"), col("n_chars"), col("source"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._3).view.mapValues { ds =>
        val px = ds.flatMap { case (d, nc, _) =>
          val n = Multimodal.bmpWidth(nc) * Multimodal.bmpHeight(nc)
          (0 until n).map(i => Multimodal.pixelValue(d, i).toLong)
        }
        (ds.size.toLong, px.size.toLong, px.sum, px.map(g => g * g).sum,
          px.min, px.max)
      }.toMap
    assert(out.nonEmpty && out.length == local.size)
    out.foreach { r =>
      val (ni, np, s, ss, mn, mx) = local(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((ni, np, mn, mx)), s"source ${r.getString(0)}")
      assert(math.abs(r.getDouble(5) - s.toDouble / np) < 1e-9)
      val variance = (np * ss.toDouble - s.toDouble * s) / (np.toDouble * np)
      assert(math.abs(r.getDouble(6) - math.sqrt(variance)) < 1e-9)
    }
  }

  test("gifSceneCuts: SAD from the real LZW decode matches the " +
    "analytic frame arithmetic; a still pair is no cut, a hard " +
    "pattern change is") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.gifSceneCuts(spark, Multimodal.ingestGif(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getLong(0); val f = r.getLong(1)
      val n = r.getLong(3)
      val sad = (0L until n).map(i =>
        math.abs(Multimodal.gifPixelValue(d, f, i) -
          Multimodal.gifPixelValue(d, f + 1, i)).toLong).sum
      assert(r.getLong(4) == sad, s"doc $d pair $f SAD mismatch")
      assert(r.getBoolean(5) == (sad >= 64 * n))
    }
    // row cover: one pair row per consecutive frame pair
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (d, rows) =>
      val nf = (meta(d) % 4) + 2
      assert(rows.length == nf - 1, s"doc $d pair count")
    }
    // the +97-per-frame analytic pattern is a hard change everywhere:
    // every pair must flag (the no-cut leg is covered by the SAD
    // formula equivalence above — a zero-diff pair yields sad 0 < 64n)
    assert(out.forall(_.getBoolean(5)),
      "analytic pattern shifts every pixel by ~97 gray levels")
  }

  test("wavRmsWindows: windows tile every decoded sample, energy and " +
    "peak match the analytic PCM, short tails report true length") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.wavRmsWindows(spark, Multimodal.ingestWav(docs))
      .collect()
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == meta.keySet)
    byDoc.foreach { case (d, rows) =>
      val n = Multimodal.wavNumSamples(meta(d))
      assert(rows.map(_.getLong(2)).sum == n, s"doc $d windows don't tile")
      assert(rows.length == (n + 15) / 16)
      rows.foreach { r =>
        val w = r.getLong(1).toInt
        val idx = (w * 16) until math.min(n, (w + 1) * 16)
        val vals = idx.map(i => Multimodal.sampleValue(d, i).toLong)
        assert(r.getLong(3) == vals.map(v => v * v).sum,
          s"doc $d win $w energy mismatch")
        assert(r.getLong(4) == vals.map(math.abs).max)
      }
    }
  }

  test("wavSilenceTrim: reconciles against a driver-side replay of the " +
    "window profile; all-silent clips NULL their bounds") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.wavSilenceTrim(spark, Multimodal.ingestWav(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == meta.keySet)
    meta.foreach { case (d, nc) =>
      val n = Multimodal.wavNumSamples(nc)
      val wins = (0 until (n + 15) / 16).map { w =>
        val idx = (w * 16) until math.min(n, (w + 1) * 16)
        val vals = idx.map(i => Multimodal.sampleValue(d, i).toLong)
        (w.toLong, vals.map(v => v * v).sum, vals.map(math.abs).max,
          idx.length)
      }
      val silent = wins.map { case (w, e, _, c) => w -> (e < 300000000L * c) }
      val r = out(d)
      assert(r.getLong(1) == wins.length)
      assert(r.getLong(2) == silent.count(_._2))
      assert(r.getLong(3) == wins.count(_._3 >= 32000L))
      val active = silent.filter(!_._2).map(_._1)
      if (active.isEmpty) assert(r.isNullAt(4) && r.isNullAt(5),
        s"doc $d: all-silent clip must NULL its bounds")
      else assert(r.getLong(4) == active.min && r.getLong(5) == active.max)
    }
  }

  test("phashDedup: spectra from the real decode match an independent " +
    "analytic DCT replay; at most 31 of 63 AC bits set; deterministic") {
    val docs = Tables.documents(spark, sf0)
    val out = Multimodal.phashDedup(spark, Multimodal.ingestBmp(docs)).collect()
    assert(out.length == docs.count())
    val meta = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // analytic replay straight from pixelValue — never touches ImageIO,
    // so a codec mis-decode on the engine side cannot hide
    def replay(d: Long, nChars: Long): (Seq[Long], Long) = {
      val w = Multimodal.bmpWidth(nChars); val h = Multimodal.bmpHeight(nChars)
      val g = Array.tabulate(8, 8)((r, c) =>
        Multimodal.pixelValue(d, (r * h / 8).toLong * w + (c * w / 8)).toLong)
      val t = Multimodal.dctTable
      val f = Array.tabulate(8, 8)((u, v) =>
        (for (r <- 0 until 8; c <- 0 until 8)
          yield g(r)(c) * t(u)(r) * t(v)(c)).sum)
      val med = (for (u <- 0 until 8; v <- 0 until 8 if u + v > 0)
        yield f(u)(v)).sorted.apply(31)
      val bands = new Array[Long](4)
      for (u <- 0 until 8; v <- 0 until 8; i = u * 8 + v
           if i != 0 && f(u)(v) > med) bands(i / 16) |= 1L << (i % 16)
      (bands.toSeq, med)
    }
    out.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (wantBands, wantMed) = replay(d, meta(d))
      val got = Seq("p0", "p1", "p2", "p3").map(r.getAs[Long])
      assert(got == wantBands, s"doc $d: bands $got != analytic $wantBands")
      assert(r.getAs[Long]("median_ac") == wantMed)
      assert(got.map(java.lang.Long.bitCount).sum <= 31,
        s"doc $d: more than 31 above-median bits")
    }
    val reparted = Multimodal.phashDedup(spark,
      Multimodal.ingestBmp(docs.repartition(7))).collect()
    assert(reparted.toSeq == out.toSeq)
  }

  test("imageSharpness: flat image scores 0, checkerboard scores the " +
    "exact Laplacian energy") {
    import spark.implicits._
    def bmpOf(px: (Int, Int) => Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos); bos.toByteArray
    }
    val flat = bmpOf((_, _) => 128, 6, 5)
    val checker = bmpOf((x, y) => if ((x + y) % 2 == 0) 0 else 255, 6, 5)
    val df = Seq((1L, flat), (2L, checker)).toDF("doc_id", "media_bytes")
    val out = Multimodal.imageSharpness(spark, df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // flat: every Laplacian is 0 — the blur floor
    assert(out(1L) == ((30L, 12L, 0L, 0L)))
    // checkerboard: |lap| = 4·255 + 4·255... each neighbor is the
    // opposite color: lap = 4g − 4·(255−g) = ±4·255 ∓ ... for g=0:
    // 0 − 4·255 = −1020; for g=255: 4·255 − 0 = 1020 → lap² = 1040400
    // at every one of the 12 interior pixels
    assert(out(2L) == ((30L, 12L, 12L * 1040400L,
      1000L * 12L * 1040400L / 12L)))
  }

  test("phashNearDupPairs: exact-hash groups surface at hamming 0, " +
    "bound holds, repartition-invariant") {
    val docs = Tables.documents(spark, sf0)
    val ing = Multimodal.ingestBmp(docs)
    val pairs = Multimodal.phashNearDupPairs(spark, ing).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.nonEmpty)
    assert(pairs.values.forall(h => h >= 0L && h <= 3L))
    assert(pairs.keys.forall { case (a, b) => a < b })
    // every same-hash pair from the exact grouping key must appear at
    // hamming 0 (the pair relation refines the grouping, never misses)
    val groups = Multimodal.phashDedup(spark, ing).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .groupBy(_._2).values.filter(_.length >= 2)
    groups.foreach { g =>
      val ids = g.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        assert(pairs.get((ids(i), ids(j))).contains(0L),
          s"exact-group pair (${ids(i)},${ids(j)}) missing or nonzero")
    }
    val re = Multimodal.phashNearDupPairs(spark,
      Multimodal.ingestBmp(docs.repartition(7))).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(re == pairs)
  }

  test("wavZeroCrossings: alternation saturates, constants score zero, " +
    "zero samples carry the previous sign") {
    import spark.implicits._
    def wavOf(samples: Seq[Int]): Array[Byte] = {
      val dataSize = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(s => buf.putShort(s.toShort))
      buf.array()
    }
    val alternating = wavOf(Seq.tabulate(10)(i => if (i % 2 == 0) 1000 else -1000))
    val constant = wavOf(Seq.fill(8)(500))
    val zeroCarry = wavOf(Seq(5, 0, -5)) // zero carries '+': ONE crossing
    val df = Seq((1L, alternating), (2L, constant), (3L, zeroCarry))
      .toDF("doc_id", "media_bytes")
    val out = Multimodal.wavZeroCrossings(spark, df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((10L, 9L, 1000000L)))
    assert(out(2L) == ((8L, 0L, 0L)))
    assert(out(3L) == ((3L, 1L, 500000L)), s"zero-carry ${out(3L)}")
  }

  test("letterboxReport: hand-built bars measured exactly, flat image " +
    "claims all rows") {
    import spark.implicits._
    def bmpOf(px: (Int, Int) => Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos); bos.toByteArray
    }
    // bars: 2 rows top, 1 bottom, 1 col left; checkered content
    val boxed = bmpOf((x, y) =>
      if (y < 2 || y == 5 || x == 0) 0 else ((x + y) % 2) * 255, 6, 6)
    val flat = bmpOf((_, _) => 40, 4, 4)
    val df = Seq((1L, boxed), (2L, flat)).toDF("doc_id", "media_bytes")
    val out = Multimodal.letterboxReport(spark, df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(1L) == ((6L, 6L, 2L, 1L, 1L, 0L)), s"boxed ${out(1L)}")
    // fully flat: the top/left runs claim everything, bottom/right 0 —
    // no double counting
    assert(out(2L) == ((4L, 4L, 4L, 0L, 4L, 0L)), s"flat ${out(2L)}")
  }

  test("wavClipDetect / wavFade: decoded results equal the analytic " +
    "replay exactly — runs, gains and digests") {
    import spark.implicits._
    val docs = (0L until 30L).map(n => (n, "w" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    def samples(docId: Long): Array[Long] = {
      val n = (docId % 50 + 20).toInt
      Array.tabulate(n)(i => (docId * 37 + i * 11) % 65536 - 32768)
    }
    val clip = Multimodal.wavClipDetect(spark, Multimodal.ingestWav(docs))
      .collect()
    assert(clip.length == 30)
    var anyClipped = false
    clip.foreach { r =>
      val s = samples(r.getAs[Long]("doc_id"))
      val flags = s.map(v => math.abs(v) >= Multimodal.ClipThresh)
      val runs = flags.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getAs[Long]("n_clipped") == flags.count(identity))
      assert(r.getAs[Long]("n_runs") == runs.size)
      assert(r.getAs[Long]("longest_run") ==
        (if (runs.isEmpty) 0L else runs.max.toLong))
      if (flags.exists(identity)) anyClipped = true
    }
    assert(anyClipped, "fixture never clips — threshold vacuous")
    val fade = Multimodal.wavFade(spark, Multimodal.ingestWav(docs))
      .collect()
    fade.foreach { r =>
      val s = samples(r.getAs[Long]("doc_id")); val n = s.length
      val v = s.zipWithIndex.map { case (x, i) =>
        x * math.min(math.min(i + 1L, 16L), n.toLong - i) / 16L }
      assert(r.getAs[Long]("fade_sum") == v.sum)
      assert(r.getAs[Long]("fade_posw") ==
        v.zipWithIndex.map { case (x, i) => i * x }.sum)
      val headAbs = v.take(16).map(math.abs).sum
      val rawHead = s.take(16).map(math.abs).sum
      assert(r.getAs[Long]("head_abs") == headAbs)
      // the ramp really attenuates (unless the head is silent)
      if (rawHead > 0) assert(headAbs < rawHead)
    }
  }

  test("imageOtsu: threshold matches an exhaustive analytic replay and " +
    "splits the mass exactly where the prefix sums say") {
    import spark.implicits._
    val docs = (0L until 30L).map(n => (n, "o" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal.imageOtsu(spark, Multimodal.ingestBmp(docs))
      .collect()
    assert(out.length == 30)
    out.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val w = (docId % 13 + 4).toInt; val h = (docId % 7 + 4).toInt
      val n = w.toLong * h
      val hist = new Array[Long](256)
      for (i <- 0 until (w * h)) hist(((docId * 31 + i * 7) % 256).toInt) += 1
      val s = (0 until 256).map(g => g.toLong * hist(g)).sum
      var w0 = 0L; var s0 = 0L; var bestT = 0L; var bestScore = -1L
      for (t <- 0 until 255) {
        w0 += hist(t); s0 += t.toLong * hist(t)
        if (w0 > 0 && w0 < n) {
          val d = s0 * n - w0 * s
          val score = d * d * 1024L / (w0 * (n - w0))
          if (score > bestScore) { bestScore = score; bestT = t.toLong }
        }
      }
      assert(r.getAs[Long]("n_pixels") == n)
      assert(r.getAs[Long]("otsu_t") == bestT,
        s"doc=$docId expected t=$bestT got ${r.getAs[Long]("otsu_t")}")
      val nb = (0 to bestT.toInt).map(hist(_)).sum
      val sb = (0 to bestT.toInt).map(g => g.toLong * hist(g)).sum
      assert(r.getAs[Long]("n_below") == nb &&
        r.getAs[Long]("sum_below") == sb)
      // the split is real: both classes populated
      assert(nb > 0 && nb < n, s"degenerate split for doc=$docId")
    }
  }

  test("imageOtsuRle: scanline run census matches the analytic replay " +
    "run-for-run — runs never cross row boundaries") {
    import spark.implicits._
    val docs = (0L until 20L).map(n => (n, "o" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal
      .imageOtsuRle(spark, Multimodal.ingestBmp(docs)).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val w = (docId % 13 + 4).toInt; val h = (docId % 7 + 4).toInt
      val n = w.toLong * h
      val gray = (0 until (w * h)).map(i => ((docId * 31 + i * 7) % 256).toInt)
      val hist = new Array[Long](256)
      gray.foreach(hist(_) += 1)
      val s = (0 until 256).map(g => g.toLong * hist(g)).sum
      var w0 = 0L; var s0 = 0L; var bestT = 0L; var bestScore = BigInt(-1)
      for (t <- 0 until 255) {
        w0 += hist(t); s0 += t.toLong * hist(t)
        if (w0 > 0 && w0 < n) {
          val d = BigInt(s0) * n - BigInt(w0) * s
          val score = d * d * 1024 / (BigInt(w0) * (n - w0))
          if (score > bestScore) { bestScore = score; bestT = t.toLong }
        }
      }
      val runs = (0 until h).flatMap { y =>
        val row = (0 until w).map(x => gray(y * w + x) > bestT)
        // split the scanline into maximal foreground runs
        row.foldLeft(List.empty[Long]) {
          case (acc, true) if acc.nonEmpty && acc.head > 0 =>
            (acc.head + 1) :: acc.tail
          case (acc, true) => 1L :: acc
          case (acc, false) if acc.nonEmpty && acc.head > 0 => 0L :: acc
          case (acc, false) => acc
        }.filter(_ > 0)
      }
      assert(r.getAs[Long]("otsu_t") == bestT && r.getAs[Long]("n_pixels") == n)
      assert(r.getAs[Long]("n_runs") == runs.length.toLong, s"doc=$docId")
      assert(r.getAs[Long]("max_run") ==
        (if (runs.isEmpty) 0L else runs.max), s"doc=$docId")
      assert(r.getAs[Long]("run_sq_sum") == runs.map(l => l * l).sum,
        s"doc=$docId")
    }
  }

  test("imageFgBbox: tight box around the analytic foreground, exact " +
    "ppm fill ratio") {
    import spark.implicits._
    val docs = (0L until 20L).map(n => (n, "o" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal
      .imageFgBbox(spark, Multimodal.ingestBmp(docs)).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val w = (docId % 13 + 4).toInt; val h = (docId % 7 + 4).toInt
      val n = w.toLong * h
      val gray = (0 until (w * h)).map(i => ((docId * 31 + i * 7) % 256).toInt)
      val hist = new Array[Long](256)
      gray.foreach(hist(_) += 1)
      val s = (0 until 256).map(g => g.toLong * hist(g)).sum
      var w0 = 0L; var s0 = 0L; var bestT = 0L; var bestScore = BigInt(-1)
      for (t <- 0 until 255) {
        w0 += hist(t); s0 += t.toLong * hist(t)
        if (w0 > 0 && w0 < n) {
          val d = BigInt(s0) * n - BigInt(w0) * s
          val score = d * d * 1024 / (BigInt(w0) * (n - w0))
          if (score > bestScore) { bestScore = score; bestT = t.toLong }
        }
      }
      val fg = gray.zipWithIndex.filter(_._1 > bestT).map(_._2)
      val xs = fg.map(_ % w); val ys = fg.map(_ / w)
      val area = (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
      assert(r.getAs[Long]("otsu_t") == bestT)
      assert(r.getAs[Long]("min_x") == xs.min.toLong &&
        r.getAs[Long]("max_x") == xs.max.toLong, s"doc=$docId x")
      assert(r.getAs[Long]("min_y") == ys.min.toLong &&
        r.getAs[Long]("max_y") == ys.max.toLong, s"doc=$docId y")
      assert(r.getAs[Long]("n_fg") == fg.length.toLong)
      assert(r.getAs[Long]("fill_ppm") == fg.length.toLong * 1000000L / area,
        s"doc=$docId fill")
    }
  }

  test("imageOtsuBinarize: foreground census and position digest match " +
    "the analytic pixel replay pixel-for-pixel") {
    import spark.implicits._
    val docs = (0L until 20L).map(n => (n, "o" * n.toInt, n))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal
      .imageOtsuBinarize(spark, Multimodal.ingestBmp(docs)).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val w = (docId % 13 + 4).toInt; val h = (docId % 7 + 4).toInt
      val n = w.toLong * h
      val gray = (0 until (w * h)).map(i => ((docId * 31 + i * 7) % 256).toInt)
      val hist = new Array[Long](256)
      gray.foreach(hist(_) += 1)
      val s = (0 until 256).map(g => g.toLong * hist(g)).sum
      var w0 = 0L; var s0 = 0L; var bestT = 0L; var bestScore = BigInt(-1)
      for (t <- 0 until 255) {
        w0 += hist(t); s0 += t.toLong * hist(t)
        if (w0 > 0 && w0 < n) {
          val d = BigInt(s0) * n - BigInt(w0) * s
          val score = d * d * 1024 / (BigInt(w0) * (n - w0))
          if (score > bestScore) { bestScore = score; bestT = t.toLong }
        }
      }
      val fg = gray.zipWithIndex.filter(_._1 > bestT)
      assert(r.getAs[Long]("otsu_t") == bestT && r.getAs[Long]("n_pixels") == n)
      assert(r.getAs[Long]("n_fg") == fg.length.toLong, s"doc=$docId")
      assert(r.getAs[Long]("fg_sum_gray") == fg.map(_._1.toLong).sum)
      // the posw digest pins WHERE the foreground sits, not just size
      assert(r.getAs[Long]("fg_posw") == fg.map(_._2.toLong).sum,
        s"doc=$docId mask geometry digest diverged")
    }
  }
}
