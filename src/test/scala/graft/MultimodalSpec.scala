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
}
