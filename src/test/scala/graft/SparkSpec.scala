package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite: local, UTC, ns-parquet tolerant. */
trait SparkSpec extends AnyFunSuite {
  // pin the JVM default zone too: java.sql.Timestamp.valueOf interprets
  // its literal in the JVM zone, so fixture timestamps (and the expected
  // render strings) would shift on a non-UTC machine even though the
  // Spark session zone is UTC
  java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf0: String = "/root/testdata/sf0.001"
}
