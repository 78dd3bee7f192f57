package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The composed streaming corpus-ingest pipeline: the quality,
  * decontamination and near-duplicate gates the batch corpus tooling
  * provides, wired as ONE readStream→writeStream graph — the streaming
  * face of `corpus_pipeline` the way `StreamingExport` is the streaming
  * face of the batch export path (reference behavior: the export
  * client's decode→route→commit loop, `HiveExportClient.java:199-207`,
  * generalized to a training-corpus ingest).
  *
  * Gate order is a correctness statement, not just a cost one:
  *
  *  1. **Quality** (stateless per-row expression, rides the stream plan
  *     inside whole-stage codegen) — cheapest first, and a document
  *     that fails quality must never act as a near-dup suppressor of a
  *     document that would have passed.
  *  2. **Decontamination** (stream-static broadcast join against the
  *     persisted benchmark gram set — stateless, no state store) — a
  *     contaminated document is quarantined BEFORE it can suppress a
  *     clean near-duplicate; dropping it after dedup would lose both
  *     copies.
  *  3. **Near-dup gate** (banded MinHash vs the bounded cross-batch
  *     survivor store) — the most expensive gate sees only rows the
  *     cheap gates passed, and its survivors are exactly what lands in
  *     the corpus shards.
  *
  * Per-batch accounting rides the stream as observed metrics
  * ([[ObservedMetricsName]]: `n_in`, `n_quality`) — no extra driver
  * jobs; the near-dup gate's own max-ts observation rides its write
  * job (StreamingDedup discipline).
  *
  * 100 TB shape: stage 1 is a narrow map; stage 2 broadcasts only the
  * benchmark gram set (thousands of docs, tiny next to the stream);
  * stage 3 is equi-joins on (band, bucket) against a two-version
  * bounded store. Nothing accumulates driver-side; no streaming state
  * store anywhere (the survivor store is partitioned parquet).
  */
object StreamingCorpus {

  /** Name the per-batch observed metrics ride under
    * (`progress.observedMetrics.get(ObservedMetricsName)`): `n_in` =
    * rows entering the pipeline, `n_quality` = rows clearing the
    * quality gate. */
  val ObservedMetricsName = "graft_corpus_ingest"

  /** Launch the composed ingest over a STREAMING `docs` frame
    * (`doc_id`, `ts`, `text`, plus any payload columns, which pass
    * through to the corpus shards). Clean survivors land as parquet
    * under `outDir/batch_id=N/`; the near-dup survivor store lives
    * under `storeDir` (bounded at two horizon-sized versions). The
    * caller owns `bench` ([[StreamingContamination.benchmarkGrams]])
    * and closes it after the query stops. */
  def ingest(docs: DataFrame,
             bench: StreamingContamination.BenchmarkGrams,
             storeDir: String, outDir: String, checkpointDir: String,
             minQuality: Double = 0.5,
             threshold: Double = 0.5,
             horizonSec: Long = 600L,
             numHashes: Int = 64, rowsPerBand: Int = 4, n: Int = 3,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val scored = docs.withColumn("quality",
      graft.operators.TextAnalysis.qualityExpr(col("text")))
    val observed = scored.observe(ObservedMetricsName,
      count(lit(1)).as("n_in"),
      count(when(col("quality") >= minQuality, 1)).as("n_quality"))
    val kept = observed.filter(col("quality") >= minQuality).drop("quality")
    kept.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, bench, storeDir, outDir, threshold,
          horizonSec, numHashes, rowsPerBand, n)
      }
      .start()
  }

  /** One micro-batch of the composed ingest (exposed for direct
    * testing, like `StreamingExport.writeBatch` /
    * `StreamingDedup.nearDupGateBatch`): decontaminate, then hand the
    * clean rows to the near-dup gate, which writes the surviving
    * corpus shard and maintains the cross-batch store. The batch is
    * persisted for the duration — it feeds the contamination join's
    * two consumers and the dedup gate's signature build (standard
    * multi-consumer foreachBatch discipline). */
  def ingestBatch(batch: DataFrame, batchId: Long,
                  bench: StreamingContamination.BenchmarkGrams,
                  storeDir: String, outDir: String,
                  threshold: Double, horizonSec: Long,
                  numHashes: Int, rowsPerBand: Int, n: Int): Unit = {
    val pinned = batch.persist()
    try {
      // one full count, not isEmpty: materializes the cache so the
      // stream-side observe sees each row exactly ONCE (a limit(1)
      // probe before the cache re-executes the scan and inflates n_in)
      if (pinned.count() == 0L) return
      val clean = StreamingContamination.gateBatch(pinned, bench)
        .filter(!col("contaminated"))
        .drop("n_shared", "contaminated")
      StreamingDedup.nearDupGateBatch(clean, batchId, storeDir, outDir,
        threshold, horizonSec, numHashes, rowsPerBand, n)
    } finally {
      pinned.unpersist(blocking = false); ()
    }
  }
}
