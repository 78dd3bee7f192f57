package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded collect: gathers a group's values like collect_list but STOPS
  * accumulating at `maxKeep + 1` elements, so a hot key's buffer is
  * O(maxKeep) instead of O(group size) — collect_list on a skewed key
  * builds the whole group in one aggregation buffer before any filter
  * can drop it (executor OOM on exactly the stop-shingle inputs a df-cap
  * exists to survive).
  *
  * Contract: groups with ≤ maxKeep values are collected EXACTLY (no
  * element is ever dropped below the bound); larger groups come back
  * with maxKeep + 1 elements — an overflow marker the caller filters
  * with `size(c) <= maxKeep`. Combined with map-side partial
  * aggregation this caps both memory and shuffle volume per key. */
class BoundedLongList(maxKeep: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(maxKeep > 0, "maxKeep must be positive")
  private val limit = maxKeep + 1

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length >= limit) b else b :+ a

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    val room = limit - x.length
    if (room <= 0) x else x ++ y.take(room)
  }

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: ExpressionEncoder[Seq[Long]] =
    ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[Long]] =
    ExpressionEncoder()
}

object BoundedAgg {
  /** Column API: `boundedCollect(cap)(idCol)` → array<bigint>, exact for
    * groups ≤ cap, cap+1 elements (overflow marker) otherwise. */
  def boundedCollect(maxKeep: Int)(id: Column): Column =
    udaf(new BoundedLongList(maxKeep), ExpressionEncoder[Long]()).apply(id)
}
