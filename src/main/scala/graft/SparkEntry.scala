package graft

import graft.operators._
import graft.config.ExportConfig
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2 (Group A =
  * the reference's faithful surface, Group B = the analytics/LLM-pipeline
  * extensions). Keys with DuckDB-expressible semantics also appear in
  * [[oracleSql]]; column names and row ordering match exactly between the
  * Spark query and the oracle SQL.
  */
object SparkEntry {

  import ExportOps.Sentinel

  /** DuckDB-portable sentinel expression (mirrors ExportOps.nullSentinel). */
  private def sqlSentinel(c: String): String =
    s"CASE WHEN $c IS NULL OR trim($c) = '' THEN '$Sentinel' ELSE $c END"

  /** DuckDB strftime equivalent of ExportOps.OdbcTsFormat. */
  private val sqlTsFmt = "'%Y-%m-%d %H:%M:%S.%g'"

  /** Flagship: the reference's whole pipeline on `events` — meta-project,
    * sentinel partition routing, ODBC ts format, JSON encode, group by
    * endpoint (SURVEY.md §7.1). Driver smoke-checks rows > 0 at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("group_by_endpoint")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- events
  // Payload column order for the events export pipeline (declaration order
  // minus the partition column event_type).
  private def routedEvents(s: SparkSession, dir: String): DataFrame =
    ExportPipeline.route(Tables.events(s, dir), Seq("event_type"))

  /** Oracle fragment: the JSON payload DuckDB-side, matching
    * ExportOps.partitionRoute on events with partition col event_type. */
  private val sqlEventsPayload =
    "to_json(struct_pack(" +
      "event_id := event_id, " +
      s"ts := strftime(ts, $sqlTsFmt), " +
      "user_id := user_id, " +
      "value := value, " +
      "props := props))::varchar"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Group A: faithful export-conduit surface -----------------------

    // A1 source_scan: full scan of the stream table, schema-on-source.
    "source_scan" -> ((s, d) =>
      Tables.events(s, d).orderBy(col("event_id"))),

    // A2 row_decode: wire payload (JSON string props) → typed fields
    // against an advertised schema, the from_json analogue of the
    // reference's byte[]→Object[] decode.
    "row_decode" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .orderBy(col("event_id"))),

    // A3 meta_project: drop leading "internal metadata" fields.
    "meta_project" -> ((s, d) =>
      ExportOps.metaProject(Tables.events(s, d), Seq("event_id", "ts"))
        .orderBy(col("user_id"), col("event_type"), col("value"), col("props"))),

    // A4 schema_prime: bind + validate the advertised schema; emits the
    // resolved (ordinal, name, type, is_partition) binding as data.
    "schema_prime" -> ((s, d) => {
      val df = Tables.events(s, d)
      ExportPipeline.primeSchema(df, Seq("event_type"))
      val rows = df.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
        (i, f.name, f.dataType.simpleString, f.name == "event_type")
      }
      import s.implicits._
      rows.toDF("ordinal", "col_name", "col_type", "is_partition")
        .orderBy(col("ordinal"))
    }),

    // A5 type_dispatch: per-type wire encoding over one row of each
    // supported type (numbers bare, timestamp → ODBC string, binary →
    // base64, string identity, null-safe).
    "type_dispatch" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          ExportOps.wireEncode(col("ts"),
            org.apache.spark.sql.types.TimestampType).as("ts_wire"),
          ExportOps.wireEncode(col("user_id"),
            org.apache.spark.sql.types.LongType).as("user_id_wire"),
          ExportOps.wireEncode(encode(col("event_type"), "UTF-8"),
            org.apache.spark.sql.types.BinaryType).as("type_wire"),
          ExportOps.wireEncode(col("props"),
            org.apache.spark.sql.types.StringType).as("props_wire"))
        .orderBy(col("event_id"))),

    // A6 ts_format
    "ts_format" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), ExportOps.tsFormat(col("ts")).as("ts_odbc"))
        .orderBy(col("event_id"))),

    // A7 bin_base64
    "bin_base64" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          ExportOps.binBase64(encode(col("text"), "UTF-8")).as("text_b64"))
        .orderBy(col("doc_id"))),

    // A8 null_sentinel: null and blank partition values → sentinel.
    "null_sentinel" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          ExportOps.nullSentinel(nullif(col("event_type"), lit("click")))
            .as("from_null"),
          ExportOps.nullSentinel(
            when(col("event_type") === "error", lit("   "))
              .otherwise(col("event_type"))).as("from_blank"))
        .orderBy(col("event_id"))),

    // A9 partition_route: (payload_json, partition cols) split.
    "partition_route" -> ((s, d) =>
      routedEvents(s, d).orderBy(col("payload_json"))),

    // A10 json_encode: payload → JSON object string, declaration order,
    // nulls kept.
    "json_encode" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          ExportOps.jsonEncode(col("event_id"), col("user_id"),
            nullif(col("event_type"), lit("click")).as("event_type"),
            col("props")).as("payload_json"))
        .orderBy(col("event_id"))),

    // A11 group_by_endpoint: rows grouped by target endpoint.
    "group_by_endpoint" -> ((s, d) =>
      ExportOps.groupByEndpoint(routedEvents(s, d), Seq("event_type"))
        .orderBy(col("event_type"))),

    // A17 config_parse: the reference's partition-columns spec parser,
    // with the intended (fixed) validations. Emits the parsed binding.
    "config_parse" -> ((s, d) => {
      val cfg = ExportConfig.fromProperties(Map(
        "hive.uri" -> "thrift://meta:9083",
        "hive.db" -> "analytics",
        "hive.partition.columns" ->
          "alerts:continent|country, events:region|zone"))
      val rows = for {
        (table, cols) <- cfg.partitionColumns.toSeq.sortBy(_._1)
        (c, i) <- cols.zipWithIndex
      } yield (table, i, c)
      import s.implicits._
      rows.toDF("table_name", "ordinal", "part_col")
        .orderBy(col("table_name"), col("ordinal"))
    }),

    // ---- Group B: analytics extensions ----------------------------------

    // B6 agg_rollup: TPC-H Q1 pricing summary (decimal-exact sums).
    "agg_rollup" -> ((s, d) =>
      Relational.pricingSummary(Tables.lineitem(s, d))),

    // B7 join_enrich: orders ⋈ customer ⋈ nation ⋈ region, dims broadcast.
    "join_enrich" -> ((s, d) =>
      Relational.enrichOrders(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),

    // B1 dedup_exact: deterministic exact dedup of documents on text.
    "dedup_exact" -> ((s, d) =>
      Relational.dedupExact(Tables.documents(s, d), Seq("text"), "doc_id")
        .orderBy(col("doc_id")))
  )

  def oracleSql: Map[String, String] = Map(
    "source_scan" ->
      "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events ORDER BY event_id",

    "row_decode" ->
      "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM events ORDER BY event_id",

    "meta_project" ->
      "SELECT user_id, event_type, value, props FROM events ORDER BY user_id, event_type, value, props",

    "schema_prime" ->
      ("SELECT * FROM (VALUES " +
        "(0,'event_id','bigint',FALSE),(1,'ts','timestamp',FALSE)," +
        "(2,'user_id','bigint',FALSE),(3,'event_type','string',TRUE)," +
        "(4,'value','double',FALSE),(5,'props','string',FALSE)) " +
        "AS t(ordinal, col_name, col_type, is_partition) ORDER BY ordinal"),

    "type_dispatch" ->
      (s"SELECT event_id, strftime(CAST(ts AS TIMESTAMP), $sqlTsFmt) AS ts_wire, " +
        "user_id AS user_id_wire, to_base64(encode(event_type)) AS type_wire, " +
        "props AS props_wire FROM events ORDER BY event_id"),

    "ts_format" ->
      s"SELECT event_id, strftime(CAST(ts AS TIMESTAMP), $sqlTsFmt) AS ts_odbc FROM events ORDER BY event_id",

    "bin_base64" ->
      "SELECT doc_id, to_base64(encode(text)) AS text_b64 FROM documents ORDER BY doc_id",

    "null_sentinel" ->
      (s"SELECT event_id, ${sqlSentinel("nullif(event_type, 'click')")} AS from_null, " +
        s"${sqlSentinel("CASE WHEN event_type = 'error' THEN '   ' ELSE event_type END")} AS from_blank " +
        "FROM events ORDER BY event_id"),

    "partition_route" ->
      (s"SELECT $sqlEventsPayload AS payload_json, ${sqlSentinel("event_type")} AS event_type " +
        "FROM events ORDER BY payload_json"),

    "json_encode" ->
      ("SELECT event_id, to_json(struct_pack(event_id := event_id, user_id := user_id, " +
        "event_type := nullif(event_type, 'click'), props := props))::varchar AS payload_json " +
        "FROM events ORDER BY event_id"),

    "group_by_endpoint" ->
      (s"SELECT event_type, COUNT(*) AS n_rows, MIN(j) AS first_payload, MAX(j) AS last_payload " +
        s"FROM (SELECT ${sqlSentinel("event_type")} AS event_type, $sqlEventsPayload AS j FROM events) " +
        "GROUP BY event_type ORDER BY event_type"),

    "config_parse" ->
      ("SELECT * FROM (VALUES " +
        "('ALERTS',0,'CONTINENT'),('ALERTS',1,'COUNTRY')," +
        "('EVENTS',0,'REGION'),('EVENTS',1,'ZONE')) " +
        "AS t(table_name, ordinal, part_col) ORDER BY table_name, ordinal"),

    "agg_rollup" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price, " +
        "CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),

    "join_enrich" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, c_name, c_mktsegment, " +
        "n_name AS nation, r_name AS region " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey ORDER BY o_orderkey"),

    "dedup_exact" ->
      ("SELECT doc_id, text, lang, source, n_chars FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents) " +
        "WHERE rn = 1 ORDER BY doc_id")
  )
}
