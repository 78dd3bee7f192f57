package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial top-k aggregation: per group, the k largest (score, id) pairs
  * with score-desc / id-asc ordering — the shuffle-light replacement for
  * the `row_number().over(Window.partitionBy(q).orderBy(score.desc))`
  * pattern.
  *
  * Scale rationale: the Window form shuffles EVERY scored row to its
  * group's partition before ranking (at 100 TB: N·Q rows through the
  * shuffle). An Aggregator gets map-side partial aggregation
  * (ObjectHashAggregate): each task reduces its slice to ≤ k pairs per
  * group, so only k·groups·tasks rows ever shuffle — independent of N.
  * Semantics are identical for equal inputs because the (−score, id)
  * ordering is total.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[(Double, Long)] = Vector.empty

  // buffer invariant: sorted by (score desc, id asc), length ≤ k
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.length >= k && !better(a, b.last)) b else insert(b, a)

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    y.foldLeft(x)(reduce)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  // strict total order: higher score wins; lower id breaks ties.
  // java.lang.Double.compare, not >/==, so NaN ranks ABOVE every finite
  // score — the same total order Spark's Window orderBy(desc) and
  // DuckDB's ORDER BY DESC use (a 0/0 cosine from a zero vector must
  // rank identically in all three formulations).
  private def better(a: (Double, Long), c: (Double, Long)): Boolean = {
    val cmp = java.lang.Double.compare(a._1, c._1)
    cmp > 0 || (cmp == 0 && a._2 < c._2)
  }

  private def insert(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    val i = b.indexWhere(better(a, _))
    val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
    ins.take(k)
  }

  override def bufferEncoder: ExpressionEncoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
}

object TopKAgg {
  /** Column API: `topK(k)(scoreCol, idCol)` → array<struct<_1:double,
    * _2:bigint>> of the group's k best, ordered (score desc, id asc). */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k), ExpressionEncoder[(Double, Long)]())
      .apply(score, id)
}

/** Partial bottom-k by (hash asc, value asc): per group, the k pairs
  * with the smallest hash — the bounded-state heart of a deterministic
  * md5-keyed reservoir ([[graft.operators.Sketches.quantileSketch]]).
  * Same scale argument as [[TopKByScore]]: map-side partial aggregation
  * reduces each task's slice to ≤ k pairs per group before any
  * exchange, where the window-rank form would shuffle every row. The
  * (hash, value) lexicographic order makes the SELECTED MULTISET
  * deterministic even under 28-bit hash collisions: pairs that compare
  * equal are interchangeable by value, so any winner yields the same
  * sample content on any engine or partitioning. */
class BottomKByHash(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[(Long, Double)] = Vector.empty

  // buffer invariant: sorted by (hash asc, value asc), length ≤ k
  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    if (b.length >= k && !smaller(a, b.last)) b else insert(b, a)

  override def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)]): Seq[(Long, Double)] =
    y.foldLeft(x)(reduce)

  override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b

  // java.lang.Double.compare for the value leg: a NaN value orders
  // ABOVE every finite one, matching ORDER BY in both engines
  private def smaller(a: (Long, Double), c: (Long, Double)): Boolean =
    a._1 < c._1 ||
      (a._1 == c._1 && java.lang.Double.compare(a._2, c._2) < 0)

  private def insert(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] = {
    val i = b.indexWhere(smaller(a, _))
    val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
    ins.take(k)
  }

  override def bufferEncoder: ExpressionEncoder[Seq[(Long, Double)]] =
    ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[(Long, Double)]] =
    ExpressionEncoder()
}

object BottomKAgg {
  /** Column API: `bottomK(k)(hashCol, valueCol)` → array<struct<
    * _1:bigint, _2:double>> of the group's k smallest-hash pairs,
    * ordered (hash asc, value asc). */
  def bottomK(k: Int)(hash: Column, value: Column): Column =
    udaf(new BottomKByHash(k), ExpressionEncoder[(Long, Double)]())
      .apply(hash, value)
}
