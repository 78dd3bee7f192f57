package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core scalar/row operators of the export surface, re-expressed as pure
  * Catalyst column functions (whole-stage-codegen friendly; no UDFs).
  *
  * Semantics derive from the reference conduit (cited per function from
  * /root/reference/src/main/java/org/voltdb/exportclient/hive/, abbreviated
  * `hive/`): per-row type-directed decode → JSON encode → dynamic partition
  * routing. Everything here is a `Column → Column` (or `DataFrame →
  * DataFrame`) transformation so Catalyst can push, prune and fuse freely —
  * on a 1000-executor cluster these all stay inside one WholeStageCodegen
  * over the scan, with zero shuffles until the partition-grouped write.
  */
object ExportOps {

  /** Partition-value sentinel for null/blank values.
    * Ref: hive/PartitionedJsonDecoder.java:262 (HIVE_UNSPECIFIED_VALUE),
    * README.md:112. */
  val Sentinel = "__VoltDB_unspecified__"

  /** ODBC timestamp wire format used for JSON-encoded TIMESTAMP columns.
    * Ref: hive/PartitionedJsonDecoder.java:55-56 (ODBC_DATE_FORMAT_STRING). */
  val OdbcTsFormat = "yyyy-MM-dd HH:mm:ss.SSS"

  /** A6 ts_format — TIMESTAMP → ODBC string in the session timezone.
    * Ref: hive/PartitionedJsonDecoder.java:201-214; tz config
    * hive/HiveExportClient.java:74-77 (we use spark.sql.session.timeZone). */
  def tsFormat(c: Column): Column = date_format(c, OdbcTsFormat)

  /** A6 with the reference's configurable formatting zone: render the
    * instant's wall-clock time in `zone` regardless of the session zone
    * (from_utc_timestamp shifts the instant so the session-zone formatter
    * prints zone-local time; exact under the UTC session this engine
    * pins). Ref: hive/HiveExportClient.java:74-77. */
  def tsFormatInZone(c: Column, zone: String): Column =
    date_format(from_utc_timestamp(to_utc_timestamp(c,
      current_timezone()), zone), OdbcTsFormat)

  /** A7 bin_base64 — VARBINARY → base64 string, null-safe (null → null).
    * Unchunked RFC 4648 form: some JVM/Spark versions emit MIME-chunked
    * base64 (CRLF every 76 chars) for long inputs, which no JSON consumer
    * wants — normalize it away (no-op when already unchunked).
    * Ref: hive/PartitionedJsonDecoder.java:235-247. */
  def binBase64(c: Column): Column = replace(base64(c), lit("\r\n"), lit(""))

  /** A8 null_sentinel — partition-value normalization: null or
    * blank-only → sentinel; everything else passes through UNMODIFIED
    * (the reference does not trim non-blank values). "Blank" is any char
    * ≤ 0x20, exactly Java String.trim's definition (the reference's
    * isNullOrEmpty check) — written as the char class [\x00-\x20], which
    * Java regex and DuckDB's RE2 interpret identically (unlike `\s`,
    * which differs between them on \x0B and misses control chars).
    * Ref: hive/PartitionedJsonDecoder.java:221-227 (isNullOrEmpty check),
    * hive/HiveEndPointFactory.java:88-93. */
  def nullSentinel(c: Column): Column =
    when(c.isNull || c.rlike("^[\\x00-\\x20]*$"), lit(Sentinel)).otherwise(c)

  /** A5 type_dispatch — per-column wire encoding, dispatched on the Spark
    * type exactly as the reference's DecodeType visitor dispatches on
    * VoltType. Numbers pass through (bare JSON numbers), TIMESTAMP gets the
    * ODBC string form, BINARY gets base64, everything else is identity.
    * Ref: hive/PartitionedJsonDecoder.java:163-253. */
  def wireEncode(c: Column, dt: DataType,
                 timezone: Option[String] = None): Column = dt match {
    // NTZ is a zone-less wall clock: format verbatim, NEVER zone-shift
    // (shifting would alter the stored wall-clock value)
    case TimestampNTZType => tsFormat(c)
    case TimestampType =>
      timezone.map(tsFormatInZone(c, _)).getOrElse(tsFormat(c))
    case BinaryType => binBase64(c)
    case _          => c
  }

  /** Field-name camelCasing (lower-first) — the reference's builder
    * option, disabled by its client but part of the surface:
    * `COLUMN_NAME` → `columnName`.
    * Ref: hive/PartitionedJsonDecoder.java:260,297-307;
    * camelCaseFieldNames(false) at hive/HiveExportClient.java:152. */
  def camelCaseName(name: String): String = {
    val parts = name.toLowerCase.split("_").filter(_.nonEmpty)
    if (parts.isEmpty) name.toLowerCase
    else parts.head + parts.tail.map(_.capitalize).mkString
  }

  /** A10 json_encode — payload columns (already wire-encoded) → one JSON
    * object string, fields in declaration order, null fields kept as JSON
    * null (the reference writes JSONWriter.value(null)).
    * Ref: hive/PartitionedJsonDecoder.java:94,109-129,146-151. */
  def jsonEncode(payload: Column*): Column =
    to_json(struct(payload: _*), Map("ignoreNullFields" -> "false"))

  /** A3 meta_project — drop the leading VoltDB-internal metadata fields
    * (txn id, ts, seq, partition id, site id, export op).
    * Ref: skipInternalFields(true) hive/HiveExportClient.java:155;
    * decode loop offset hive/PartitionedJsonDecoder.java:118-124. */
  def metaProject(df: DataFrame, metaCols: Seq[String]): DataFrame =
    df.drop(metaCols: _*)

  /** A9 partition_route — split each row into (partition-value tuple,
    * JSON payload): partition columns leave the payload (sentinel-
    * normalized, declaration order preserved); the remaining columns are
    * wire-encoded and JSON-packed. Output schema:
    * (partitionCols..., payload_json string).
    * Ref: hive/PartitionedJsonDecoder.java:135-152,218-228;
    * endpoint construction hive/HiveEndPointFactory.java:65-68.
    *
    * Scale note: purely narrow — no shuffle. Physical routing to
    * partitioned storage is `write.partitionBy(partitionCols)` (A13/A14),
    * which Spark executes with one writer per (task, partition) and no
    * extra shuffle unless we ask for it (see ExportPipeline.writeRouted).
    */
  def partitionRoute(df: DataFrame, partitionCols: Seq[String],
                     camelCaseFields: Boolean = false,
                     timezone: Option[String] = None): DataFrame = {
    val pset = partitionCols.map(_.toLowerCase).toSet
    val payloadFields = df.schema.fields.filterNot(f => pset(f.name.toLowerCase))
    val payload = payloadFields.map { f =>
      val name = if (camelCaseFields) camelCaseName(f.name) else f.name
      wireEncode(col(f.name), f.dataType, timezone).as(name)
    }
    val parts = partitionCols.map(c => nullSentinel(col(c)).as(c))
    df.select(jsonEncode(payload.toIndexedSeq: _*).as("payload_json") +: parts: _*)
  }

  /** A11 group_by_endpoint — batch rows grouped by their target endpoint
    * (partition-value tuple). The reference materializes a
    * Multimap<HiveEndPoint, String>; the oracle-checkable Spark form is the
    * grouped aggregate below. The physical path at scale must NOT
    * collect_list — it goes straight to write.partitionBy (A13/A14).
    * Ref: hive/StreamingHiveDecoder.java:35-54. */
  def groupByEndpoint(routed: DataFrame, partitionCols: Seq[String]): DataFrame =
    routed.groupBy(partitionCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        // order-insensitive, DuckDB-portable digest of the group's payloads
        min(col("payload_json")).as("first_payload"),
        max(col("payload_json")).as("last_payload"))
}
