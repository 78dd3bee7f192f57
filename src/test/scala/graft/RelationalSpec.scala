package graft

import graft.operators.{Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge-semantics regressions from review: upsert must be whole-row
  * latest-wins (NULLs included), PII scrub must be case-insensitive with
  * hex-before-digits precedence. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: change rows replace wholesale — NULLed fields stay NULL") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val changes = Seq((2L, null.asInstanceOf[String], 99.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val out = Relational.upsert(base, changes, "k")
      .as[(Long, Option[String], Double)].collect().toSeq
    assert(out == Seq((1L, Some("a"), 10.0), (2L, None, 99.0), (3L, Some("c"), 30.0)))
  }

  test("bucketed range join ≡ naive inequality join, incl. bucket-boundary pairs") {
    val events = Tables.events(spark, sf0)
    val bucketed = Relational.rangeJoin(events,
      windowSec = 600, bucketSec = 600).collect()
    // naive: direct inequality join (BNLJ — fine at sf0.001)
    val e = events.filter(col("event_type") === "error")
      .select(col("event_id").as("interval_id"), unix_micros(col("ts")).as("i_us"))
    val b = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("point_id"), unix_micros(col("ts")).as("p_us"))
    val naive = b.join(e,
        col("p_us") >= col("i_us") && col("p_us") < col("i_us") + 600000000L)
      .select(col("point_id"), col("interval_id")).collect()
    def keys(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.nonEmpty, "fixture produced no in-window pairs")
    assert(keys(bucketed) == keys(naive))
    // a shrunken bucket (interval spans >2 buckets) must still be exact
    val small = Relational.rangeJoin(events,
      windowSec = 600, bucketSec = 90).collect()
    assert(keys(small) == keys(naive))
  }

  test("pii scrub: case-insensitive, hex ids redacted before digit runs") {
    val df = Seq(
      (1L, "mail Alice.Smith@Example.COM now"),
      (2L, "id deadbeef00001111cafe ok"),
      (3L, "HEX DEADBEEF00001111CAFE ok"),
      (4L, "pin 1234")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(df).as[(Long, String, Long)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r(1L) == "mail <EMAIL> now")
    assert(r(2L) == "id <HEX> ok")   // not fragmented by the digit rule
    assert(r(3L) == "HEX <HEX> ok")  // uppercase hex caught
    assert(r(4L) == "pin <NUM>")     // tag longer than input → delta -1 ok
  }
}
