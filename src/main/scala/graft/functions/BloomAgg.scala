package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bloom bitmask aggregation: OR-fold bit positions into a fixed
  * `words`×64-bit mask — the BUILD side of a Bloom filter as a real
  * partial aggregate (ObjectHashAggregate): each task folds its slice
  * of positions into an O(words) buffer and partial masks merge by
  * bitwise OR, so the shuffle carries one mask per task — independent
  * of how many member elements feed the build. The finished mask is an
  * `array<bigint>` small enough to broadcast (words=2048 → 16 KB), the
  * shape that lets a 100 TB probe side test membership with two array
  * lookups and no join.
  *
  * Positions must already be reduced mod words·64 by the caller — an
  * out-of-range position is a caller bug and fails loudly rather than
  * silently aliasing.
  */
class BloomMask(words: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(words > 0, "words must be positive")

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < words.toLong * 64,
      s"bit position $pos outside [0, ${words * 64})")
    b((pos >> 6).toInt) |= 1L << (pos & 63)
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: ExpressionEncoder[Array[Long]] =
    ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[Long]] =
    ExpressionEncoder()
}

object BloomAgg {
  /** Column API: `mask(words)(posCol)` → array<bigint> of length
    * `words`, bit `p` of the mask set iff some input row had pos = p. */
  def mask(words: Int)(pos: Column): Column =
    udaf(new BloomMask(words), ExpressionEncoder[Long]()).apply(pos)
}
