package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming benchmark-decontamination gate — the streaming face of
  * `contamination_ngram`: a continuously-ingesting corpus checked
  * against a STATIC benchmark/holdout set, flagging every incoming
  * document that shares a verbatim k-token passage with it.
  *
  * Shape: the benchmark's k-gram hash set is computed ONCE as a batch
  * frame (tiny next to the stream — a benchmark is thousands of docs,
  * not billions) and used as the static side of stream-static joins,
  * which are STATELESS in Structured Streaming — no watermark, no
  * state store, and Spark broadcasts the static side when it fits (a
  * benchmark gram set does). Per-batch cost is one narrow gram pass
  * over arriving docs plus a broadcast probe — the shape that keeps up
  * with ingest at corpus scale.
  *
  * The gram contract is IDENTICAL to the batch operator (winnow
  * machinery at w = 1 — every distinct k-gram's md5-prefix), so a doc
  * flagged here is exactly a doc the batch `contamination_ngram` pass
  * would pair with the benchmark: the streaming gate is the early-exit
  * filter, the batch pass the authoritative audit.
  */
object StreamingContamination {

  /** Distinct k-gram hashes of `textCol` (winnow selection at w = 1). */
  private def grams(textCol: Column, k: Int): Column =
    graft.functions.VectorFunctions.winnowFps(textCol, k, 1)

  /** The static side: one (fp) row per distinct k-gram of the benchmark
    * set — compute once, reuse across the query's lifetime. */
  def benchmarkGrams(benchmark: DataFrame, k: Int = 13): DataFrame =
    benchmark
      .select(explode(grams(col("text"), k)).as("fp"))
      .distinct()

  /** Pure-append hit stream: one row per (doc_id, fp) gram the arriving
    * document shares with the benchmark — a STATELESS stream-static
    * inner join, so the query runs in append mode with no state store.
    * Per-doc aggregation is deliberately NOT done here (it would make
    * the query stateful); consumers either count hits downstream in
    * batch or run [[gateBatch]] inside foreachBatch. */
  def hitPairs(docsStream: DataFrame, staticGrams: DataFrame,
               k: Int = 13): DataFrame =
    docsStream
      .select(col("doc_id"), explode(grams(col("text"), k)).as("fp"))
      .join(staticGrams, "fp")

  /** The deployable per-micro-batch gate, for `foreachBatch`: annotate
    * every document of one batch with its benchmark-gram hit count and
    * a contaminated flag (drop or quarantine flagged docs, pass the
    * rest). Inside foreachBatch the frame is a plain batch DataFrame,
    * so the join + per-doc aggregation carry no streaming-state
    * constraints — the standard pattern for per-entity aggregation on
    * a stateless stream. */
  def gateBatch(batch: DataFrame, staticGrams: DataFrame,
                k: Int = 13): DataFrame = {
    val hits = batch
      .select(col("doc_id"), explode(grams(col("text"), k)).as("fp"))
      .join(staticGrams, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    batch.join(hits, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated", col("n_shared") > 0)
  }
}
