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
}
