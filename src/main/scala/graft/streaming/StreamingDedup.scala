package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact deduplication — the streaming face of B1 dedup_exact,
  * the front gate of a continuously-ingesting training-data pipeline
  * (the same stream-shaped source the reference conduit consumes).
  *
  * Two contracts, different state growth:
  *
  *  - [[exactGlobal]]: `dropDuplicates(keys)` — a key is emitted once for
  *    the lifetime of the query. State grows with distinct keys forever;
  *    only safe when the key space is bounded (it is NOT at 100 TB/day —
  *    documented, kept for the bounded-key case).
  *  - [[withinWatermark]]: `dropDuplicatesWithinWatermark(keys)` — a key
  *    is emitted once per watermark horizon; state for keys older than
  *    the watermark is dropped by the engine. State is bounded by
  *    (arrival rate × horizon) regardless of stream lifetime — the
  *    100 TB-scale path. Duplicates separated by more than the horizon
  *    re-emit; that is the documented trade (downstream batch dedup_exact
  *    catches stragglers).
  */
object StreamingDedup {

  /** Lifetime-global dedup: unbounded state, bounded-key streams only. */
  def exactGlobal(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** Watermark-bounded dedup on `keys`: exactly-one emit per key within
    * the `watermark` horizon on event-time column `tsCol`; engine prunes
    * state past the watermark. */
  def withinWatermark(stream: DataFrame, keys: Seq[String],
                      tsCol: String = "ts",
                      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Batch-equivalence reference for the specs: the rows the watermarked
    * stream must emit for an in-horizon input — first row per key in
    * (ts, tiebreak) order is representative; we compare key sets, since
    * which duplicate wins is arrival-order-defined in a stream. */
  def distinctKeys(batch: DataFrame, keys: Seq[String]): Dataset[org.apache.spark.sql.Row] =
    batch.select(keys.map(col): _*).distinct()

  /** END-TO-END streaming-dedup parity replay (round 12) — the
    * `dropDuplicates` state store under the driver's full oracle,
    * sibling of `StreamingWindows.tumblingParityReplay`: the batch
    * `documents` relation is laid out as `nFiles` doc_id-ranged parquet
    * files (exact duplicates are scattered across the id space, so
    * duplicate groups SPAN micro-batches — the cross-batch suppression
    * is what this replay exists to prove), replayed with
    * `maxFilesPerTrigger=1` through [[exactGlobal]] on the content hash,
    * each append batch committed to its own `batch_id=N` directory, and
    * the union of the commits returned for the hash-compare against
    * `SELECT DISTINCT md5(text), length(text)`.
    *
    * The emitted columns are FUNCTIONS OF THE KEY (`h = md5(text)`,
    * `n_chars = length(text)`): which physical duplicate wins is
    * arrival-order-defined in a stream, so an arrival-order-independent
    * oracle row forces every non-key column to be derived from the key
    * text itself — the same reasoning behind [[distinctKeys]]. A key
    * seen in batch 1 and again in batch 4 MUST appear in exactly one
    * commit; a state miss double-writes it and the hash compare fails.
    *
    * Scale shape: the split is one bounded repartitionByRange write; the
    * replay is the production [[exactGlobal]] contract whose state is
    * the distinct-key set (bounded-key streams only — the watermarked
    * variant is the unbounded-corpus path, exercised by the specs). */
  def exactParityReplay(docs: DataFrame, srcDir: String, outDir: String,
                        checkpointDir: String, nFiles: Int = 5): DataFrame = {
    require(nFiles >= 2, s"need >= 2 files for a multi-batch replay: $nFiles")
    val spark = docs.sparkSession
    docs.select(col("doc_id"), col("text"))
      .repartitionByRange(nFiles, col("doc_id"))
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val keyed = stream.select(
      md5(col("text")).as("h"),
      length(col("text")).as("n_chars"))
    // distinct-hash state is small — 8 state partitions hold it; conf
    // restored after the bounded replay (state-partition pinning note
    // in the sessionize replay)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = exactGlobal(keyed, Seq("h")).writeStream
        .option("checkpointLocation", checkpointDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/batch_id=$id"); ()
        }.start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // empty corpus: zero batches commit, outDir never materializes —
    // the structural answer is the empty distinct-key table
    val out = new java.io.File(outDir)
    if (!out.exists())
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.IntegerType))))
    else
      spark.read.parquet(outDir).select(col("h"), col("n_chars"))
        .orderBy(col("h"))
  }

  /** Streaming NEAR-dup dedup — the MinHash-LSH front gate for a
    * continuously-ingesting corpus, composing the batch pieces
    * (Dedup.minHashSignatures / lshBands) with micro-batch state:
    *
    *  per micro-batch —
    *   1. signatures + (band, bucket) keys for the batch (narrow);
    *   2. a doc is suppressed when it shares a band bucket with a doc in
    *      the signature STORE (the horizon's survivors — same blocking
    *      equi-join as the batch path) or with an earlier doc in the same
    *      batch (earlier = smaller (ts, doc_id)), AND the signature
    *      agreement confirms it: |matching minhashes|/numHashes ≥
    *      `threshold` (the standard unbiased Jaccard estimator — the
    *      streaming stand-in for the batch path's exact re-verify, since
    *      the store keeps signatures, not shingle sets);
    *   3. survivors are committed to `outDir/batch_id=N` (idempotent
    *      overwrite — the StreamingExport exactly-once discipline) and
    *      their signatures appended to the store, PRUNED to the event-time
    *      horizon: state is bounded by arrival-rate × `horizonSec`
    *      forever, exactly like dropDuplicatesWithinWatermark's store.
    *      A near-dup arriving more than a horizon after its twin
    *      re-emits — the same documented trade as [[withinWatermark]].
    *
    * The store itself is versioned (`v=N` written per batch, batch N
    * reads the largest v < N): a replayed batch reads the same input
    * version it read before the crash and overwrites its own output —
    * exactly-once without read-modify-write on a single directory.
    * After v=N commits, versions older than N-1 are garbage-collected
    * (N-1 is kept so batch N itself can still replay), so store DISK is
    * bounded at two horizon-sized versions, not linear in batch count.
    *
    * 100 TB shape: everything is equi-joins on (band, bucket) plus
    * narrow signature maps; the store is a bounded partitioned table.
    */
  def nearDupGate(stream: DataFrame, storeDir: String, outDir: String,
                  checkpointDir: String,
                  threshold: Double = 0.5,
                  horizonSec: Long = 600L,
                  numHashes: Int = 64, rowsPerBand: Int = 4, n: Int = 3,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupGateBatch(batch, batchId, storeDir, outDir, threshold,
          horizonSec, numHashes, rowsPerBand, n)
      }
      .start()

  /** One micro-batch of the near-dup gate (exposed for direct testing —
    * same reason StreamingExport.writeBatch is). The store is SPLIT
    * (round 13) into `v=N/bands` (doc_id, ts, band, bucket) and
    * `v=N/sigs` (doc_id, ts, sig): the old single table duplicated
    * each survivor's numHashes-long signature across its 16 band rows
    * — ~16× write amplification on a store that is REWRITTEN every
    * batch, the kind of constant that decides feasibility at 100 TB.
    * Bucket matching now joins the narrow band table and fetches the
    * candidate's signature once per matched doc; commit/replay
    * semantics are unchanged (both halves land inside v=N before the
    * checkpoint commits, so a crash between them replays the whole
    * version). */
  def nearDupGateBatch(batch: DataFrame, batchId: Long,
                       storeDir: String, outDir: String,
                       threshold: Double, horizonSec: Long,
                       numHashes: Int, rowsPerBand: Int, n: Int): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val sigs = Dedup.minHashSignatures(batch, n, numHashes)
    val bands = Dedup.lshBands(sigs, numHashes, rowsPerBand)
      .join(sigs, "doc_id")
      .join(batch.select(col("doc_id"), col("ts")), "doc_id")
      .select(col("doc_id"), col("ts"), col("sig"), col("band"), col("bucket"))
      .persist()
    val (storeBands, storeSigs) = readStore(spark, storeDir, batchId)

    // estimated Jaccard between two signatures: fraction of agreeing
    // minhash entries (exact arithmetic; deterministic)
    def sigAgree(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / numHashes

    // cross-batch hits: share a bucket with a stored survivor (narrow
    // band-table join), then fetch that survivor's signature and
    // confirm the agreement clears the threshold
    val storeHits = bands.as("x").join(storeBands.as("s"),
        col("x.band") === col("s.band") && col("x.bucket") === col("s.bucket"))
      .join(storeSigs.select(col("doc_id").as("sd"), col("sig").as("ssig")),
        col("s.doc_id") === col("sd"))
      .filter(sigAgree(col("x.sig"), col("ssig")) >= threshold)
      .select(col("x.doc_id")).distinct()

    // in-batch hits: same bucket as an EARLIER batch doc ((ts, doc_id)
    // order), signature-verified — the earlier doc is the survivor.
    // Store-suppressed docs are excluded from the suppressor (y) side:
    // a doc that will not be emitted must not knock out others (its
    // stored twin may not be within threshold of them — near-dup
    // similarity is not transitive). Within the batch itself the chain
    // IS greedy: doc C suppressed by B is still a valid suppressor of D,
    // matching the batch path's single-pass pair semantics; the
    // documented trade is possible over-suppression along in-batch
    // chains, bounded by one micro-batch.
    val inBatchSuppressors = bands.join(storeHits, Seq("doc_id"), "left_anti")
    val inBatchHits = bands.as("x").join(inBatchSuppressors.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          (col("y.ts") < col("x.ts") ||
            (col("y.ts") === col("x.ts") && col("y.doc_id") < col("x.doc_id"))))
      .filter(sigAgree(col("x.sig"), col("y.sig")) >= threshold)
      .select(col("x.doc_id")).distinct()

    // batch max event time rides the survivors write as an observed
    // metric — the left side of a left_anti join scans every batch row,
    // so the metric is complete and costs no extra driver job (the old
    // form ran a separate agg(max).head() job per micro-batch)
    val obs = org.apache.spark.sql.Observation(s"neardup_gate_$batchId")
    val survivors = batch
      .observe(obs, max(col("ts")).as("max_ts"))
      .join(storeHits.union(inBatchHits).distinct(), Seq("doc_id"), "left_anti")
    survivors.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

    // next store version: previous survivors + this batch's, pruned to
    // the horizon behind the batch's max event time — bands and sigs
    // land as separate narrow tables (see the split-store note above)
    val survBands = bands.join(survivors.select("doc_id"), "doc_id")
    val maxTs = obs.get("max_ts").asInstanceOf[java.sql.Timestamp]
    val cutoff = new java.sql.Timestamp(maxTs.getTime - horizonSec * 1000L)
    storeBands.unionByName(
        survBands.select(col("doc_id"), col("ts"), col("band"), col("bucket")))
      .filter(col("ts") > cutoff)
      .write.mode("overwrite").parquet(s"$storeDir/v=$batchId/bands")
    // one signature row per surviving doc, read from the PERSISTED
    // bands frame (every band row of a doc carries the identical sig —
    // re-deriving from minHashSignatures would recompute the shingle +
    // 64-hash pass a second time per batch)
    storeSigs.unionByName(
        survBands.select(col("doc_id"), col("ts"), col("sig"))
          .dropDuplicates("doc_id"))
      .filter(col("ts") > cutoff)
      .write.mode("overwrite").parquet(s"$storeDir/v=$batchId/sigs")
    bands.unpersist()

    // GC: with v=batchId durable, versions older than batchId-1 can never
    // be read again (a replayed batch N reads the largest v < N, and the
    // smallest batch id that can still replay is batchId itself, which
    // reads v=batchId-1). Keeping exactly one prior version bounds store
    // disk at 2 versions forever instead of growing per batch.
    pruneStoreVersions(spark, storeDir, keepFrom = batchId - 1)
  }

  /** Delete store versions strictly below `keepFrom` (see GC note in
    * [[nearDupGateBatch]]). Deletion failures are non-fatal: a leftover
    * old version is never read, only re-collected next batch. */
  private def pruneStoreVersions(spark: SparkSession, storeDir: String,
                                 keepFrom: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val nm = st.getPath.getName
      // foreign entries (v=<non-numeric>, unrelated files) are ignored
      // like any other GC failure — never fail the micro-batch over them
      val ver = if (nm.startsWith("v="))
        scala.util.Try(nm.drop(2).toLong).toOption else None
      if (ver.exists(_ < keepFrom))
        try fs.delete(st.getPath, true) catch { case _: java.io.IOException => () }
    }
  }

  /** Largest committed store version strictly below `batchId` (a
    * replayed batch must re-read its original input state), or an empty
    * store when none exists yet. Returns the split (bands, sigs) pair
    * — see the layout note on [[nearDupGateBatch]]. */
  private def readStore(spark: SparkSession, storeDir: String,
                        batchId: Long): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(root)) Array.empty[Long]
      else fs.listStatus(root).map(_.getPath.getName)
        .flatMap(s => if (s.startsWith("v="))
          scala.util.Try(s.drop(2).toLong).toOption else None)
        .filter(_ < batchId)
    def empty(fields: StructField*) =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(fields))
    if (versions.isEmpty)
      (empty(StructField("doc_id", LongType),
          StructField("ts", TimestampType),
          StructField("band", IntegerType),
          StructField("bucket", StringType)),
        empty(StructField("doc_id", LongType),
          StructField("ts", TimestampType),
          StructField("sig", ArrayType(LongType))))
    else
      (spark.read.parquet(s"$storeDir/v=${versions.max}/bands"),
        spark.read.parquet(s"$storeDir/v=${versions.max}/sigs"))
  }
}
