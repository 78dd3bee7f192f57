package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of Relational.enrichOrders / B7 join_enrich: a
  * stream-static equi-join against a (broadcast) dimension frame.
  *
  * Stream-static joins are STATELESS — each micro-batch joins the
  * current dim snapshot, no watermark or state store involved — so
  * append mode works unconditionally and the plan inside every
  * micro-batch is exactly the batch enrichment plan: broadcast dim, the
  * streaming side never shuffles. `how = "left"` keeps unmatched stream
  * rows (late dim arrival tolerant); inner drops them. The dim is
  * re-read per micro-batch when backed by a file source — a slowly
  * changing dimension picks up updates without restarting the query. */
object StreamingEnrich {

  def enrich(stream: DataFrame, dim: DataFrame, key: String,
             how: String = "inner"): DataFrame =
    stream.join(broadcast(dim), Seq(key), how)
}
