package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — image/audio/video handled as opaque `binary`
  * payloads with typed metadata, exactly as a 100 TB training-data lake
  * stores them (media bytes inline or as object-store pointers; Spark
  * moves them as BinaryType and never interprets them in the engine).
  *
  * Real media codecs are not available in this environment, so DECODE IS
  * STUBBED with a deterministic fake (clearly marked below); everything
  * Spark-side — schema, batching, partition-parallel feature extraction,
  * the mapPartitions batch shape — is real and tested. In PySpark the
  * extract step would be `mapInPandas` with an Arrow batch per call; the
  * Scala-native equivalent with identical batch semantics is
  * `mapPartitions` over an iterator of rows, one decoder instance per
  * partition (not per row — that's the pattern that survives scale).
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

  /** The mapPartitions decode harness: one (stub) decoder per PARTITION,
    * batch-iterating rows through it — the exact shape a heavyweight
    * codec needs (amortized init, bounded memory). Output schema is fixed
    * and explicit, as a real Arrow/mapInPandas boundary requires. */
  def decodePartitions(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("decoded_ok", BooleanType),
      StructField("decoder_hash", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val in = ingested.select(col("doc_id"), col("media_bytes"))
    in.mapPartitions { rows =>
      // STUB decoder: deterministic fake in place of an image/audio
      // codec. Real impl: open the codec once HERE, close at iterator
      // end — mapPartitions gives init-once-per-partition structurally.
      // (Partition ids are deliberately NOT emitted: output must stay a
      // pure function of the data, independent of partitioning.)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media_bytes")
        // canonical FNV-1a: mask the byte (sign-extension would flip
        // the hash's high bits for bytes >= 0x80 and disagree with the
        // repo's other fnv1a implementations and external references)
        val fakeSignal = if (bytes == null) -1L
          else bytes.foldLeft(1469598103934665603L)(
            (h, b) => (h ^ (b & 0xffL)) * 1099511628211L)
        Row(r.getAs[Long]("doc_id"), bytes != null, fakeSignal)
      }
    }(enc).toDF().orderBy(col("doc_id"))
  }
}
