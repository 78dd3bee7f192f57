package graft.operators

import graft.config.ExportConfig
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** End-to-end export pipeline: the reference's whole row path composed from
  * the ExportOps column functions, plus the physical partitioned write.
  *
  * Reference lifecycle (SURVEY.md §3): block delivery → schema prime →
  * decode → meta-project → partition-route/JSON-encode → group by endpoint
  * → transactional partitioned write. In Spark that is: scan (A1/A2, the
  * vectorized parquet reader IS the row decode) → drop meta cols (A3) →
  * `partitionRoute` (A5-A10 fused in one codegen stage) →
  * `write.partitionBy` (A11/A13/A14 — the shuffle-and-write is the
  * grouping).
  */
object ExportPipeline {

  /** A4 schema_prime — bind and validate the advertised schema before any
    * data moves, the analysis-time analogue of the reference's lazy
    * first-row priming (hive/HiveExportClient.java:137-163;
    * hive/PartitionedJsonDecoder.java:71-92). Fails fast (like the
    * reference's RestartBlockException on bad config) when a partition
    * column is missing from the table or is not a string column —
    * partition columns MUST be VARCHAR (hive/PartitionedJsonDecoder.java:
    * 77-84, README.md:112).
    */
  def primeSchema(df: DataFrame, partitionCols: Seq[String]): Unit = {
    val byName = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    partitionCols.foreach { c =>
      val f = byName.getOrElse(c.toLowerCase,
        throw new IllegalArgumentException(
          s"partition column $c not present in ${df.schema.fieldNames.mkString(",")}"))
      if (f.dataType != org.apache.spark.sql.types.StringType)
        throw new IllegalArgumentException(
          s"partition column $c must be VARCHAR/string, got ${f.dataType.simpleString}")
    }
  }

  /** The full row path as a DataFrame transform: returns
    * (payload_json, partitionCols...). Narrow (no shuffle). */
  def route(df: DataFrame, partitionCols: Seq[String],
            metaCols: Seq[String] = Nil,
            timezone: Option[String] = None): DataFrame = {
    val projected = ExportOps.metaProject(df, metaCols)
    primeSchema(projected, partitionCols)
    ExportOps.partitionRoute(projected, partitionCols, timezone = timezone)
  }

  /** A13/A14 — partitioned sink write. `write.partitionBy` gives the same
    * guarantees the reference buys with 4 hashed writer threads + Hive
    * transactions, but stronger: per-partition single-writer ordering comes
    * from the file committer, and atomicity from Spark's commit protocol
    * (job-level, all-or-nothing) instead of 64-txn Hive batches.
    *
    * Scale design: `repartitionByExpr` hashes rows to
    * `spark.sql.shuffle.partitions` tasks BY the partition columns first, so
    * each dynamic partition is written by few tasks (avoids the classic
    * "every task opens every partition" small-file explosion at 100 TB);
    * `maxRecordsPerFile` bounds file size. AQE coalesces skewed routes.
    */
  def writeRouted(routed: DataFrame, outDir: String,
                  format: String = "parquet",
                  maxRecordsPerFile: Long = 5000000L,
                  repartitionFirst: Boolean = true): Unit = {
    val partitionCols = routed.columns.filter(_ != "payload_json").toSeq
    val arranged =
      if (repartitionFirst) routed.repartition(partitionCols.map(col): _*)
      else routed
    arranged.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(outDir)
  }

  /** Convenience: route + write in one call, config-driven. */
  def exportTable(df: DataFrame, table: String, cfg: ExportConfig,
                  outDir: String, metaCols: Seq[String] = Nil): Unit = {
    val partitionCols = cfg.partitionColsFor(table).map(_.toLowerCase)
    writeRouted(route(df, partitionCols, metaCols, Some(cfg.timezone)), outDir)
  }

  /** Catalog-table sink — the reference's ACTUAL sink contract: rows land
    * in a metastore table addressed as db.table with partition values
    * (HCatalog streaming endpoints, hive/HiveEndPointFactory.java:65-68;
    * hive/HivePartitionStream.java:62-75), and the streaming sink requires
    * ORC (reference README.md:77 — hence the ORC default here). Spark
    * analogue: a partitioned catalog table — `saveAsTable` creates the
    * generation, `insertInto` appends to it, and the metastore (not a bare
    * path) is what downstream readers resolve.
    *
    * Same anti-small-file arrangement as [[writeRouted]]: repartition by
    * the partition columns so each dynamic partition is written by few
    * tasks. `insertInto` is position-based; `route`'s layout
    * (payload_json, partition cols last) matches the schema the create
    * branch registers, so both branches write identical shapes.
    *
    * Returns the fully-qualified table identifier. */
  def exportCatalogTable(df: DataFrame, table: String, cfg: ExportConfig,
                         metaCols: Seq[String] = Nil,
                         format: String = "orc",
                         maxRecordsPerFile: Long = 5000000L): String = {
    val spark = df.sparkSession
    val partitionCols = cfg.partitionColsFor(table).map(_.toLowerCase)
    val routed = route(df, partitionCols, metaCols, Some(cfg.timezone))
    val db = cfg.db.toLowerCase
    val ident = s"$db.${table.toLowerCase}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    val writer = routed.repartition(partitionCols.map(col): _*)
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
    if (spark.catalog.tableExists(ident))
      writer.mode(SaveMode.Append).insertInto(ident)
    else
      writer.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
        .format(format).saveAsTable(ident)
    ident
  }

  /** Partition retention for a long-lived catalog sink: drop every
    * partition whose `keyCol` value is strictly below `maxExclusive` —
    * the batch_id / date watermark expiry every append-forever export
    * table needs (the streaming catalog sink grows one `batch_id=N`
    * subtree per micro-batch, forever, without this).
    *
    * Metadata-scale by design: SHOW PARTITIONS enumerates specs (one
    * short string per partition — bounded by partition count, never
    * data), expired FULL specs drop one by one (Spark's ALTER TABLE
    * DROP PARTITION takes equality specs only, so a comparator predicate
    * must be driver-expanded), and dropping a MANAGED table's partition
    * deletes its files. Returns the number of partitions dropped. */
  def expirePartitions(spark: org.apache.spark.sql.SparkSession,
                       db: String, table: String,
                       keyCol: String, maxExclusive: Long): Int = {
    val ident = s"${db.toLowerCase}.${table.toLowerCase}"
    val k = keyCol.toLowerCase
    val parts = spark.sql(s"SHOW PARTITIONS $ident").collect()
      .map(_.getString(0))
    val expired = parts.filter { p =>
      // non-numeric key values (date strings, __HIVE_DEFAULT_PARTITION__
      // for null keys) are skipped, not fatal: the watermark compares
      // integral keys only, and one foreign partition must not abort the
      // whole expiry sweep
      p.split("/").collectFirst {
        case kv if kv.toLowerCase.startsWith(s"$k=") =>
          scala.util.Try(kv.drop(kv.indexOf('=') + 1).toLong).toOption
      }.flatten.exists(_ < maxExclusive)
    }
    expired.foreach { p =>
      val spec = p.split("/").map { kv =>
        val Array(c, v) = kv.split("=", 2)
        s"`$c`='$v'"
      }.mkString(", ")
      spark.sql(s"ALTER TABLE $ident DROP IF EXISTS PARTITION ($spec)")
    }
    expired.length
  }

  /** Drop a managed table AND its storage location. With a non-Hive
    * (in-memory) catalog, a table created by a PREVIOUS JVM survives only
    * as its warehouse directory — the fresh catalog doesn't know it, so
    * `DROP TABLE IF EXISTS` no-ops and a later saveAsTable fails with
    * LOCATION_ALREADY_EXISTS. This removes both the entry and the orphan
    * directory; the db is created if absent so its location resolves. */
  def dropTableAndLocation(spark: org.apache.spark.sql.SparkSession,
                           db: String, table: String): Unit = {
    val d = db.toLowerCase; val t = table.toLowerCase
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$d`")
    spark.sql(s"DROP TABLE IF EXISTS `$d`.`$t`")
    val dbLoc = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.catalog.getDatabase(d).locationUri))
    val loc = new org.apache.hadoop.fs.Path(dbLoc, t)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    ()
  }

  /** Small-file compaction — the maintenance pass every long-lived
    * partitioned sink needs at scale: a streaming conduit committing a
    * micro-batch per trigger accretes files per partition without bound,
    * and at 100 TB the resulting per-file scheduling/open cost dominates
    * reads. Rewrites `inDir` into `outDir` with each dynamic partition
    * packed toward `targetFileBytes` files: measured avg row size →
    * `maxRecordsPerFile`, repartition by the partition columns so few
    * tasks write each partition (same anti-small-file shape as
    * [[writeRouted]]).
    *
    * `sortBy` additionally orders rows WITHIN each written file on the
    * given columns (sortWithinPartitions after the repartition — no
    * extra shuffle): compaction is the one moment the data is rewritten
    * anyway, so it is the free opportunity to make parquet row-group
    * min/max statistics selective — a later scan with a predicate on a
    * sorted column skips whole row groups / files instead of reading
    * them (the poor-man's clustering key; at 100 TB this is the
    * difference between a pruned scan and a full one).
    *
    * Returns (rows, inputFiles, inputBytes) for observability. Output
    * goes to a NEW directory (job-level atomic); swapping it in place of
    * `inDir` is the caller's rename — same publish discipline as any
    * compactor on an object store.
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
              inDir: String, outDir: String,
              partitionCols: Seq[String],
              targetFileBytes: Long = 128L << 20,
              format: String = "parquet",
              sortBy: Seq[String] = Nil,
              schema: Option[org.apache.spark.sql.types.StructType] = None)
      : (Long, Long, Long) = {
    // an explicit schema lets an EMPTY sink compact (a partitioned dir
    // with zero part files has nothing to infer from — inference throws
    // UNABLE_TO_INFER_SCHEMA exactly on the degenerate input a
    // maintenance pass must tolerate)
    val reader = spark.read.format(format)
    val df = schema.fold(reader)(reader.schema).load(inDir)
    // rows from footers (parquet count() reads no data pages); bytes
    // from ONE recursive content summary — not a getFileStatus RPC per
    // file, which would be O(files) serial driver round-trips on the
    // exact many-small-file input this pass exists to fix
    val rows = df.count()
    val nFiles = df.inputFiles.length.toLong
    val bytes = {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(inDir)
      root.getFileSystem(conf).getContentSummary(root).getLength
    }
    val avgRowBytes = math.max(1L, if (rows == 0) 1L else bytes / rows)
    val maxRecords = math.max(1L, targetFileBytes / avgRowBytes)
    val reparted = df.repartition(partitionCols.map(col): _*)
    // partition columns FIRST in the sort: the dynamic-partition writer
    // requires task rows ordered by partition cols and inserts its own
    // (unstable) sort when they are not — which would silently destroy
    // the clustering order. Leading with them satisfies the writer's
    // requirement, so the sortBy order actually reaches the files.
    val arranged =
      if (sortBy.isEmpty) reparted
      else reparted.sortWithinPartitions((partitionCols ++ sortBy).map(col): _*)
    arranged
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecords)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(outDir)
    (rows, nFiles, bytes)
  }

  /** Z-order layout cells — the MULTI-dimensional data-skipping layout
    * that [[compact]]'s single-column `sortBy` cannot give: each row's
    * two clustering dims are min/max-normalized to `bits` bits (the
    * two-pass shape every real OPTIMIZE-ZORDER runs — raw values
    * interleave uselessly when the dims occupy different bit ranges,
    * which they always do) and bit-interleaved into a Z cell id; the
    * output is the per-cell min/max/count index a skipping scan reads.
    * A predicate on EITHER dim prunes to ~2^bits-th of the cells — the
    * property a one-column sort only has for its own column.
    *
    * Everything is exact integer arithmetic (`div` truncation =
    * DuckDB's `//` floor on the non-negative domain), and the bound
    * rows ride a broadcast 1-row gate frame (the engine's standard
    * shape), so cells and stats are deterministic on any engine and
    * any partitioning. Two aggregates total: the 1-row bounds pass and
    * the per-cell groupBy — no global sort anywhere; the physical
    * re-write would be `repartitionByRange(zcell)` + write, which
    * shuffles once on the same key.
    *
    * Output: (zcell, n, ck_min, ck_max, dd_min, dd_max), ordered. */
  def zorderCells(orders: DataFrame, bits: Int = 4): DataFrame =
    zKeyed(orders, bits).groupBy(col("zcell"))
      .agg(count(lit(1)).as("n"),
        min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
        min(col("dd")).as("dd_min"), max(col("dd")).as("dd_max"))
      .orderBy(col("zcell"))

  /** Shared two-dim normalization: every order row with its clustering
    * keys min/max-normalized to `bits`-bit codes nk/nd — the front half
    * of BOTH space-filling-curve layouts ([[zorderCells]],
    * [[hilbertCells]]). */
  private def curveKeyed(orders: DataFrame, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val maxCode = (1 << bits) - 1
    val ck = col("o_custkey")
    val dd = datediff(to_date(col("o_orderdate")),
      lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")
    val keyed = orders.select(col("o_orderkey"), ck.as("ck"), dd.as("dd"))
    val bounds = keyed.agg(
      min(col("ck")).as("ck_lo"), max(col("ck")).as("ck_hi"),
      min(col("dd")).as("dd_lo"), max(col("dd")).as("dd_hi"))
    keyed.crossJoin(broadcast(bounds))
      .withColumn("nk",
        expr(s"((ck - ck_lo) * $maxCode) div greatest(ck_hi - ck_lo, 1)"))
      .withColumn("nd",
        expr(s"((dd - dd_lo) * $maxCode) div greatest(dd_hi - dd_lo, 1)"))
  }

  /** Shared Z-cell computation: every order row with its normalized,
    * bit-interleaved cell id (plus the raw clustering keys). */
  private def zKeyed(orders: DataFrame, bits: Int): DataFrame =
    curveKeyed(orders, bits)
      .withColumn("zcell", (0 until bits).map { i =>
        (shiftleft(shiftright(col("nk"), i) % 2, 2 * i) +
          shiftleft(shiftright(col("nd"), i) % 2, 2 * i + 1)): Column
      }.reduce(_ + _))

  /** The Hilbert cell id of normalized codes (nk, nd) — the classic
    * iterative xy→d walk (quadrant digit + reflect/swap rotation, s
    * halving from 2^(bits−1) to 1), unrolled into ONE per-row integer
    * expression chain: no join, no loop, nothing but bit tests,
    * reflections and a 2-bit XOR per level — exactly replayable as a
    * CTE chain in any engine. Exposed to the spec, which checks the
    * unrolled column against an independent driver-side walk over the
    * whole grid. */
  private[graft] def hilbertD(bits: Int, nk: Column, nd: Column): Column = {
    var x = nk; var y = nd
    var d: Column = lit(0L)
    for (s <- (bits - 1) to 0 by -1) {
      val sv = 1L << s
      val rx = when(x.bitwiseAND(lit(sv)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(sv)) > 0, lit(1L)).otherwise(lit(0L))
      d = d + lit(sv * sv) * (lit(3L) * rx).bitwiseXOR(ry)
      val nx = when(ry === 0,
        when(rx === 1, lit(sv - 1) - y).otherwise(y)).otherwise(x)
      val ny = when(ry === 0,
        when(rx === 1, lit(sv - 1) - x).otherwise(x)).otherwise(y)
      x = nx; y = ny
    }
    d
  }

  /** HILBERT-curve layout cells (round 11) — [[zorderCells]]' stronger
    * sibling: the Hilbert curve is the space-filling order with the
    * best known locality (every two CONSECUTIVE cells are Manhattan-
    * adjacent in key space — Z-order's worst-case jump spans half the
    * grid), which is why Delta/Iceberg expose it beside Z-order for
    * OPTIMIZE layouts: range scans touch fewer, more-contiguous cell
    * runs. Same two-pass shape as the Z leg (1-row broadcast bounds
    * frame, per-cell groupBy, zero global sorts, pure integer
    * arithmetic via [[hilbertD]]) and the same skipping-index output
    * contract, so a consumer swaps curves without changing its reader.
    *
    * Output: (hcell, n, ck_min, ck_max, dd_min, dd_max), ordered. */
  def hilbertCells(orders: DataFrame, bits: Int = 4): DataFrame =
    curveKeyed(orders, bits)
      .withColumn("hcell", hilbertD(bits, col("nk"), col("nd")))
      .groupBy(col("hcell"))
      .agg(count(lit(1)).as("n"),
        min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
        min(col("dd")).as("dd_min"), max(col("dd")).as("dd_max"))
      .orderBy(col("hcell"))

  /** Z-ordered physical LAYOUT (round 10) — what [[zorderCells]]'
    * index DESCRIBES, actually written: rows land in a parquet table
    * partitioned by their Z cell (one shuffle on zcell — the
    * `repartition(zcell)` is exactly the physical re-write every
    * OPTIMIZE-ZORDER runs), and the per-cell min/max skipping index
    * lands beside it as a ≤ 4^bits-row parquet at `<path>_idx`. At
    * 100 TB the layout would be `repartitionByRange` over composite
    * cells; the cell-partitioned form keeps the pruning observable to
    * Spark's partition listing, which is the property the read path
    * proves. */
  def zorderWrite(spark: org.apache.spark.sql.SparkSession,
                  orders: DataFrame, path: String, bits: Int = 4): Unit = {
    val z = zKeyed(orders, bits)
    z.select(col("o_orderkey"), col("ck"), col("dd"), col("zcell"))
      .repartition(col("zcell"))
      .write.mode("overwrite").partitionBy("zcell").parquet(path)
    zorderCells(orders, bits).coalesce(1)
      .write.mode("overwrite").parquet(path + "_idx")
  }

  /** The READ that the Z layout buys (round 10, hardened round 13):
    * probe the tiny skipping index for cells whose [ck_min, ck_max]
    * overlaps the predicate range, then scan ONLY those cell
    * partitions, with the exact predicate re-applied. Because a Z cell
    * bounds BOTH dimensions, the same index serves a dd predicate
    * equally — the property a single-column sort layout only has for
    * its own column.
    *
    * The index probe is a broadcast LEFT SEMI join on `zcell`, not a
    * driver-side collect-into-IN-list: Catalyst's dynamic partition
    * pruning turns the broadcast build side into a runtime
    * PartitionFilter on the layout scan (the broadcast exchange is
    * reused, so the DPP subquery is free), which means the candidate
    * cell set never materializes on the driver — at a 100× finer cell
    * grid the pruning cost stays on the executors. PlanInvariantsSpec
    * asserts the pruning is real: the scan's PartitionFilters carry
    * the dynamic zcell filter and the partition listing touches only
    * the candidate cells. */
  def zorderPrunedRead(spark: org.apache.spark.sql.SparkSession,
                       path: String, ckLo: Long, ckHi: Long): DataFrame = {
    // explicit schemas on both reads: an empty source writes zero part
    // files and schema inference would throw on the very input a
    // maintenance pass must pass through (the compactRoundTrip doctrine);
    // declaring zcell in the layout schema also pins the partition
    // column to LONG instead of leaving it to directory-name inference
    val cand = spark.read
      .schema("zcell long, n long, ck_min long, ck_max long, " +
        "dd_min long, dd_max long")
      .parquet(path + "_idx")
      .filter(col("ck_min") <= ckHi && col("ck_max") >= ckLo)
      .select(col("zcell"))
    spark.read
      .schema("o_orderkey long, ck long, dd long, zcell long")
      .parquet(path)
      .filter(col("ck").between(ckLo, ckHi))
      .join(org.apache.spark.sql.functions.broadcast(cand),
        Seq("zcell"), "left_semi")
      .select(col("o_orderkey"), col("ck"), col("dd"))
      .orderBy(col("o_orderkey"))
  }
}
