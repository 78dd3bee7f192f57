package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

object StreamingDedupSpec {
  // top-level: inner case classes can't get an Encoder
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}

/** Drives watermark-bounded streaming dedup through a real streaming
  * query: in-batch and cross-batch duplicates within the horizon are
  * dropped; state is watermark-pruned so a duplicate arriving after the
  * horizon re-emits (the documented bounded-state trade). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamingDedupSpec.Doc

  private def ts(s: String) = Timestamp.valueOf(s)

  test("withinWatermark drops in-horizon duplicates, re-emits past it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val out = StreamingDedup.withinWatermark(mem.toDF(), Seq("doc_id"),
      watermark = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup_stream").start()
    try {
      // batch 1: doc 1 duplicated in-batch, doc 2 once
      mem.addData(
        Doc(1L, ts("2024-01-01 00:00:00"), "a"),
        Doc(1L, ts("2024-01-01 00:00:05"), "a-dup"),
        Doc(2L, ts("2024-01-01 00:00:10"), "b"))
      q.processAllAvailable()
      // batch 2: doc 1 again within the horizon → still suppressed
      mem.addData(Doc(1L, ts("2024-01-01 00:05:00"), "a-again"))
      q.processAllAvailable()
      val inHorizon = spark.table("wm_dedup_stream").as[Doc].collect()
      assert(inHorizon.map(_.doc_id).sorted.toSeq == Seq(1L, 2L))

      // advance the watermark far past doc 1's state, then replay doc 1:
      // state was pruned → re-emit (bounded-state semantics)
      mem.addData(Doc(3L, ts("2024-01-01 12:00:00"), "c"))
      q.processAllAvailable()
      mem.addData(Doc(1L, ts("2024-01-01 12:00:01"), "a-late-dup"))
      q.processAllAvailable()
      val all = spark.table("wm_dedup_stream").as[Doc].collect()
      assert(all.count(_.doc_id == 1L) == 2,
        s"expected doc 1 re-emitted after horizon, got ${all.toSeq}")
      assert(all.map(_.doc_id).toSet == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("exactGlobal never re-emits a key for the query lifetime") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val out = StreamingDedup.exactGlobal(mem.toDF(), Seq("doc_id"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("global_dedup_stream").start()
    try {
      mem.addData(Doc(1L, ts("2024-01-01 00:00:00"), "a"))
      q.processAllAvailable()
      mem.addData(Doc(1L, ts("2024-01-02 00:00:00"), "a-next-day"))
      q.processAllAvailable()
      assert(spark.table("global_dedup_stream").count() == 1L)
    } finally q.stop()
  }
}
