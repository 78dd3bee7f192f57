package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through here so every query benefits from the same
  * conventions: explicit paths, no schema inference surprises, and the
  * nanosecond-precision `events.ts` normalization (see [[events]]).
  */
object Tables {
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def region(s: SparkSession, d: String): DataFrame    = s.read.parquet(path(d, "region"))
  def nation(s: SparkSession, d: String): DataFrame    = s.read.parquet(path(d, "nation"))
  def customer(s: SparkSession, d: String): DataFrame  = s.read.parquet(path(d, "customer"))
  def supplier(s: SparkSession, d: String): DataFrame  = s.read.parquet(path(d, "supplier"))
  def part(s: SparkSession, d: String): DataFrame      = s.read.parquet(path(d, "part"))
  def orders(s: SparkSession, d: String): DataFrame    = s.read.parquet(path(d, "orders"))
  def lineitem(s: SparkSession, d: String): DataFrame  = s.read.parquet(path(d, "lineitem"))
  def documents(s: SparkSession, d: String): DataFrame = s.read.parquet(path(d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = s.read.parquet(path(d, "embeddings"))

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * unless spark.sql.legacy.parquet.nanosAsLong is set — a runtime-
    * settable conf, so set it here defensively (the driver may hand us a
    * session without it). NOTE: this intentionally mutates the caller's
    * session conf and leaves it set — the conf must survive until task
    * execution, so a save/restore around the read would be unsafe; any
    * later ns-parquet read in the same session will also surface longs.
    * The long is then normalized to microsecond
    * TimestampType so downstream operators and the DuckDB oracle (which
    * also truncates ns → µs on cast) agree exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path(d, "events"))
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case TimestampType => raw
      // integer `div`, not `/`: epoch-nanos (~1.7e18) overflow double precision
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // parquet timestamp[us] WITHOUT the UTC-adjusted flag (DuckDB and
      // many writers emit this) surfaces as NTZ; under this engine's
      // pinned UTC session the wall clock IS the instant, so the cast is
      // exact — a conduit must accept both timestamp flavors
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other         => throw new IllegalStateException(s"unexpected ts type $other")
    }
  }
}
