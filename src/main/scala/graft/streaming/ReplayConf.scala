package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared shuffle-partition pinning for the bounded parity replays:
  * every replay's micro-batch state is fixture-scale (one ranged file
  * per trigger), but a replay that inherits the session default (32,
  * = cores) schedules 32 tasks per tiny shuffle per micro-batch —
  * pure task overhead, measured at 20–40% of the stream keys' bench
  * cost. The corpus/sessionize/window replays pinned 8 inline since
  * rounds 12–13; this is that exact pattern, extracted so the
  * remaining replays (contamination, enrich, export ×2, ingest) pin
  * it too instead of each re-deriving the note. The conf is set
  * BEFORE the streaming query starts (Structured Streaming clones the
  * session conf at query start) and restored after the bounded
  * replay; output VALUES are partitioning-independent by the module
  * doctrine (deterministic-by-value aggregations/joins), so only task
  * counts change. */
object ReplayConf {
  // n = 4 (round 18): fixture-scale micro-batches schedule n tasks per
  // shuffle per trigger AND commit n state-store partitions per
  // trigger; 8 → 4 halves both with no value change (measured ~10% off
  // the family; a deployment sizes this to its cluster)
  def withReplayPartitions[A](spark: SparkSession, n: Int = 4)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
