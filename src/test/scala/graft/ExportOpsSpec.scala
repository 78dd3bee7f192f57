package graft

import graft.config.ExportConfig
import graft.operators.{ExportOps, ExportPipeline}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-style/unit tests for the core export column functions
  * (SURVEY.md §5.2): sentinel normalization, base64 round trip, JSON
  * field order and null encoding, config parsing with the corrected
  * validations. ScalaCheck Gen drives the sampling (the scalatest bridge
  * artifact is not in the offline cache, so sampling is manual). */
class ExportOpsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("null_sentinel: null, empty and whitespace-only → sentinel; others unchanged") {
    val blanks = samples(Gen.listOf(Gen.oneOf(' ', '\t', '\n')).map(_.mkString), 30)
    val outs = blanks.map(Option(_)).toDF("c")
      .select(ExportOps.nullSentinel($"c")).as[String].collect()
    assert(outs.forall(_ == ExportOps.Sentinel))
    val r = Seq(null.asInstanceOf[String], "", "   ", " x ", "EU")
      .toDF("c").select(ExportOps.nullSentinel($"c")).as[String].collect()
    assert(r.toSeq == Seq(ExportOps.Sentinel, ExportOps.Sentinel,
      ExportOps.Sentinel, " x ", "EU"))
  }

  test("bin_base64 round-trips arbitrary bytes, unchunked") {
    val byteArrays = samples(Gen.listOfN(200, Gen.choose(Byte.MinValue, Byte.MaxValue)), 20)
      .map(_.toArray)
    val b64s = byteArrays.map(Tuple1(_)).toDF("b")
      .select(ExportOps.binBase64($"b")).as[String].collect()
    byteArrays.zip(b64s).foreach { case (bytes, b64) =>
      assert(!b64.contains("\r") && !b64.contains("\n"))
      assert(java.util.Base64.getDecoder.decode(b64).toSeq == bytes.toSeq)
    }
  }

  test("json_encode: declaration order, nulls kept, quotes escaped") {
    val j = Seq((1L, null.asInstanceOf[String], "x\"y"))
      .toDF("a", "b", "c")
      .select(ExportOps.jsonEncode($"a", $"b", $"c")).as[String].head()
    assert(j == """{"a":1,"b":null,"c":"x\"y"}""")
  }

  test("ts_format: ODBC millisecond form, truncating microseconds") {
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123999")
    val s = Seq(Tuple1(ts)).toDF("t")
      .select(ExportOps.tsFormat($"t")).as[String].head()
    assert(s == "2024-03-01 10:20:30.123")
  }

  test("partition_route splits partition cols from payload, in order") {
    val df = Seq((1L, "EU", "IT", "m")).toDF("id", "continent", "country", "msg")
    val routed = ExportOps.partitionRoute(df, Seq("continent", "country"))
    assert(routed.columns.toSeq == Seq("payload_json", "continent", "country"))
    assert(routed.as[(String, String, String)].head() ==
      ("""{"id":1,"msg":"m"}""", "EU", "IT"))
  }

  test("config_parse: upper-casing, ordering, arity + URI validation") {
    val pc = ExportConfig.parsePartitionColumns("alerts:continent|country, ev:a|b")
    assert(pc("ALERTS") == Seq("CONTINENT", "COUNTRY"))
    assert(pc("EV") == Seq("A", "B"))
    // fixed arity check (reference's was buggy across ≥2 tables, SURVEY §4.4.1)
    ExportConfig.validateArity(pc)
    intercept[IllegalArgumentException] {
      ExportConfig.validateArity(Map("A" -> Seq("X"), "B" -> Seq("X", "Y")))
    }
    intercept[IllegalArgumentException] { ExportConfig.validateUri("http://x:1") }
    intercept[IllegalArgumentException] {
      ExportConfig.parsePartitionColumns("nocolon")
    }
    // fixed guard: unlisted table actually throws (reference's never fired)
    intercept[IllegalArgumentException] {
      ExportConfig(partitionColumns = pc).partitionColsFor("missing")
    }
  }

  test("schema_prime rejects non-string partition columns") {
    val df = Seq((1L, "x")).toDF("k", "p")
    ExportPipeline.primeSchema(df, Seq("p"))
    intercept[IllegalArgumentException] {
      ExportPipeline.primeSchema(df, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      ExportPipeline.primeSchema(df, Seq("absent"))
    }
  }
}
