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

  /** PARITY REPLAY (round 13) — the composed ingest under the DuckDB
    * oracle, closing the last spec-only streaming module: split the
    * train side of the corpus into `nFiles` DETERMINISTIC batches
    * (batch i = train docs with doc_id % nFiles = i — unlike the other
    * replays' repartitionByRange, batch MEMBERSHIP must be a SQL
    * function of the key here, because the near-dup gate's semantics
    * depend on batch boundaries: cross-batch hits consult the survivor
    * store, in-batch hits chain greedily), pin arrival order with
    * strictly increasing mtimes (oldest-first file source), and run the
    * production [[ingest]] — quality gate, stream-static
    * decontamination vs the holdout's 13-gram set, banded-MinHash
    * near-dup gate with the cross-batch store — over the replay.
    *
    * Event time is synthesized as `timestamp_seconds(doc_id)`: the
    * documents table carries no timestamp, and a MONOTONE ts makes the
    * gate's (ts, doc_id) in-batch precedence equal doc_id order —
    * arrival-order-independent and oracle-expressible. The horizon is
    * pinned far past the synthetic time span so store pruning is out
    * of frame (it is spec-tested in StreamingDedup; this key targets
    * the gate COMPOSITION: a quality-failed or contaminated document
    * must never suppress a near-duplicate, and a survivor must
    * suppress across batches exactly once).
    *
    * Output: (doc_id, batch_id, n_chars), ordered — the surviving
    * corpus rows with the batch that committed them; batch_id comes
    * from the physical `batch_id=N` commit directory, so the oracle's
    * doc_id % nFiles expectation also proves the pinned file→batch
    * mapping held. */
  def corpusParityReplay(docs: DataFrame, srcDir: String, storeDir: String,
                         outDir: String, checkpointDir: String,
                         nFiles: Int = 4,
                         horizonSec: Long = 10000000000L): DataFrame = {
    require(nFiles >= 2, s"need >= 2 files for a multi-batch replay: $nFiles")
    val spark = docs.sparkSession
    val tagged = docs.withColumn("is_test",
      graft.operators.Corpus.isHoldout(col("doc_id")))
    val bench = StreamingContamination
      .benchmarkGrams(tagged.filter(col("is_test")), k = 13)
    try {
      val train = tagged.filter(!col("is_test"))
        .select(col("doc_id"), timestamp_seconds(col("doc_id")).as("ts"),
          col("text"))
      new java.io.File(srcDir).mkdirs()
      val now = System.currentTimeMillis()
      // stage all batch files in ONE corpus pass: partitionBy(b) lands
      // each residue class as its own directory (repartition on b →
      // one part file per class), then each class's file moves into
      // srcDir under a pinned, strictly increasing mtime
      val stage = s"$srcDir/../stage"
      train.withColumn("b", pmod(col("doc_id"), lit(nFiles.toLong)))
        .repartition(col("b"))
        .write.mode("overwrite").partitionBy("b").parquet(stage)
      for (i <- 0 until nFiles) {
        val cls = new java.io.File(s"$stage/b=$i")
        val dst = new java.io.File(s"$srcDir/b$i.parquet")
        val part = if (cls.exists())
          cls.listFiles().filter(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).headOption
        else None
        part match {
          case Some(p) => java.nio.file.Files.move(p.toPath, dst.toPath); ()
          case None => // empty residue class: an empty batch file keeps
            // the file→batch numbering aligned with the oracle's fold
            train.filter(pmod(col("doc_id"), lit(nFiles.toLong)) === i)
              .coalesce(1).write.mode("overwrite").parquet(s"$stage/e$i")
            val p = new java.io.File(s"$stage/e$i").listFiles()
              .filter(f => f.getName.startsWith("part-") &&
                f.getName.endsWith(".parquet")).head
            java.nio.file.Files.move(p.toPath, dst.toPath); ()
        }
        dst.setLastModified(now + i * 2000L)
      }
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      // batch state is document-table scale — the replay pin cuts the
      // per-micro-batch task overhead (the exactParityReplay pinning
      // note); restored right after the bounded replay
      ReplayConf.withReplayPartitions(spark) {
        val q = ingest(stream, bench, storeDir, outDir, checkpointDir,
          minQuality = 0.5, threshold = 0.5,
          horizonSec = horizonSec)
        q.awaitTermination()
      }
    } finally bench.close()
    val out = new java.io.File(outDir)
    if (!out.exists())
      // empty train split: every micro-batch is empty, no commit ever
      // materializes outDir — the structural answer is the empty table
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType))))
    else
      spark.read.parquet(outDir)
        .select(col("doc_id"), col("batch_id").cast("long").as("batch_id"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
  }

  /** COMPACTING replay (round 14) — [[corpusParityReplay]] with the
    * survivor store's horizon pruning LIVE instead of pinned out of
    * frame: the horizon is the stream's own event-time span (ts =
    * doc_id seconds, so span = max doc_id + 1 — one bounded 1-row
    * aggregate), which makes the per-batch cutoff computation and the
    * store-write prune filter run FOR REAL every batch while staying
    * semantically inert by construction (every cutoff lands before
    * epoch at any scale factor) — so the unpruned fold is the oracle,
    * hash-pinning that compaction drops nothing it shouldn't. The
    * complementary direction — the horizon BITING — is spec-tested on
    * the composed pipeline (StreamingCorpusSpec: a pre-cutoff survivor
    * leaves the store, bounding it, and its late twin re-emits, the
    * documented [[StreamingDedup.nearDupGate]] trade). Together they
    * bound `stream_corpus_parity`'s store at arrival-rate × horizon
    * instead of stream lifetime. */
  def corpusCompactReplay(docs: DataFrame, srcDir: String, storeDir: String,
                          outDir: String, checkpointDir: String,
                          nFiles: Int = 4): DataFrame = {
    val maxRow = docs.agg(max(col("doc_id"))).head
    val span = if (maxRow.isNullAt(0)) 1L else maxRow.getLong(0) + 1L
    corpusParityReplay(docs, srcDir, storeDir, outDir, checkpointDir,
      nFiles, horizonSec = span)
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
      // the contamination join's OUTPUT is persisted too (round 16):
      // the dedup gate consumes its batch ~3× (signature build, ts
      // join, survivor anti-join) and each consumption would re-run
      // the 13-gram explosion + broadcast join against the benchmark
      // set — a fixed per-batch constant with no scale payoff
      val clean = StreamingContamination.gateBatch(pinned, bench)
        .filter(!col("contaminated"))
        .drop("n_shared", "contaminated")
        .persist()
      try StreamingDedup.nearDupGateBatch(clean, batchId, storeDir, outDir,
        threshold, horizonSec, numHashes, rowsPerBand, n)
      finally { clean.unpersist(blocking = false); () }
    } finally {
      pinned.unpersist(blocking = false); ()
    }
  }
}
