package graft

import graft.config.ExportConfig
import graft.operators.ExportPipeline
import graft.streaming.StreamingExport
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference client's lifecycle as one facade — what a VoltDB
  * hive-export user calls after switching to this library:
  *
  *   configure(properties) → validated engine config     (A17, A4)
  *   exportBatch(df, table, out)                          (A1-A11, A13/A14)
  *   exportStream(stream, table, out, ckpt)               (A12, exactly-once)
  *
  * Ref lifecycle being mirrored: HiveExportClient.configure →
  * constructExportDecoder → onBlockStart/processRow/onBlockCompletion
  * (hive/HiveExportClient.java:66-112,171-196); the decode/route/write
  * semantics live in the operators this facade composes.
  */
object GraftExportClient {

  /** Parse + validate the reference's property surface
    * (`hive.uri`, `hive.db`, `hive.partition.columns`, `timezone`).
    * Throws IllegalArgumentException on bad config — the analogue of the
    * reference's config-time RestartBlockException. */
  def configure(props: Map[String, String]): ExportConfig =
    ExportConfig.fromProperties(props)

  /** Batch export: route `df` by the table's configured partition columns
    * and write committed partitioned files under `outDir/<table>/`. */
  def exportBatch(df: DataFrame, table: String, cfg: ExportConfig,
                  outDir: String, metaCols: Seq[String] = Nil): Unit =
    ExportPipeline.exportTable(df, table, cfg, s"$outDir/${table.toLowerCase}",
      metaCols)

  /** Catalog export: the reference's real sink contract — rows land in a
    * metastore table `cfg.db`.`table` as partitioned ORC (reference
    * README.md:77), created on first call, appended thereafter. Returns
    * the qualified identifier downstream readers resolve. */
  def exportCatalog(df: DataFrame, table: String, cfg: ExportConfig,
                    metaCols: Seq[String] = Nil,
                    format: String = "orc"): String =
    ExportPipeline.exportCatalogTable(df, table, cfg, metaCols, format)

  /** Streaming export: checkpointed micro-batches, exactly-once (see
    * StreamingExport). Returns the running query. */
  def exportStream(stream: DataFrame, table: String, cfg: ExportConfig,
                   outDir: String, checkpointDir: String): StreamingQuery = {
    val partitionCols = cfg.partitionColsFor(table).map(_.toLowerCase)
    StreamingExport.exportStream(stream, partitionCols,
      s"$outDir/${table.toLowerCase}", checkpointDir,
      timezone = Some(cfg.timezone))
  }

  /** Streaming CATALOG export — the reference's actual streaming sink:
    * micro-batches append into the partitioned ORC metastore table
    * `cfg.db`.`table`, exactly-once via leading batch_id partitions: a
    * replay statically overwrites its own batch_id subtree only. */
  def exportStreamCatalog(stream: DataFrame, table: String,
                          cfg: ExportConfig,
                          checkpointDir: String): StreamingQuery =
    StreamingExport.exportStreamCatalog(stream, table, cfg, checkpointDir)

  /** Maintenance: compact a table's exported partition tree toward
    * `targetFileBytes` files (see ExportPipeline.compact — a long-lived
    * micro-batching sink accretes small files without bound). Writes to
    * `outDir`; swapping it in place of the old tree is the caller's
    * atomic rename. Returns (rows, inputFiles, inputBytes). */
  def compactTable(spark: org.apache.spark.sql.SparkSession, table: String,
                   cfg: ExportConfig, inDir: String, outDir: String,
                   targetFileBytes: Long = 128L << 20): (Long, Long, Long) =
    ExportPipeline.compact(spark, s"$inDir/${table.toLowerCase}",
      s"$outDir/${table.toLowerCase}",
      cfg.partitionColsFor(table).map(_.toLowerCase),
      targetFileBytes)

  /** Maintenance: retention for the streaming catalog sink — drop every
    * partition with `keyCol` strictly below `maxExclusive` (batch_id or
    * date watermark; see ExportPipeline.expirePartitions). Returns the
    * number of partitions dropped. */
  def expireTablePartitions(spark: org.apache.spark.sql.SparkSession,
                            table: String, cfg: ExportConfig,
                            keyCol: String, maxExclusive: Long): Int =
    ExportPipeline.expirePartitions(spark, cfg.db, table, keyCol, maxExclusive)
}
