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
