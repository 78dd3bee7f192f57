package graft

import graft.operators.{GraphAnn, Similarity}
import org.apache.spark.sql.functions.col

/** The graph-ANN family's contract, spec-driven (approximate by nature
  * → no SQL oracle): deterministic builds, brute-force-exact scores on
  * the candidates it does surface, recall floors single- and
  * multi-shard, degree bounds via the beam parameters, and the
  * no-corpus-broadcast scale property. */
class GraphAnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0)

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")) ->
      (r.getAs[Long]("n_id"), r.getAs[Double]("cos"))).toMap

  test("nswTopK is deterministic run-to-run and its scores are " +
    "bit-identical to brute force for the same (query, neighbor)") {
    val a = asMap(GraphAnn.nswTopK(emb, nQueries = 10, k = 10))
    val b = asMap(GraphAnn.nswTopK(emb, nQueries = 10, k = 10))
    assert(a == b, "two identical builds disagreed")
    val bf = Similarity.bruteForceTopK(emb, nQueries = 10, k = 499)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Double]("cos")).toMap
    a.foreach { case ((q, _), (n, c)) =>
      assert(bf((q, n)) == c, s"score for ($q,$n) diverged from brute force")
    }
  }

  test("recall floor vs brute force, single shard and resharded") {
    val truth = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getAs[Long]("q_id"))
        .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
      val hits = truth.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size }
      hits.sum.toDouble / truth.values.map(_.size).sum
    }
    val single = recallOf(GraphAnn.nswTopK(
      emb.coalesce(1), nQueries = 10, k = 10))
    assert(single >= 0.8, s"single-shard recall@10 = $single")
    // resharded: every shard searched, per-shard top-k merged — recall
    // holds under the distribution the operator actually runs with
    val sharded = recallOf(GraphAnn.nswTopK(
      emb.repartition(5), nQueries = 10, k = 10))
    assert(sharded >= 0.8, s"5-shard recall@10 = $sharded")
  }

  test("zero-norm vectors never surface; corpus side is never broadcast") {
    import spark.implicits._
    val fix = Seq(
      (0L, Array(1.0f, 0.0f), "a"),
      (1L, Array(0.9f, 0.1f), "a"),
      (2L, Array(0.0f, 0.0f), "z"), // zero norm: undefined cosine
      (3L, Array(0.5f, 0.5f), "b"),
      (4L, Array(-1.0f, 0.2f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = GraphAnn.nswTopK(fix, nQueries = 2, k = 4)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(!rows.map(_.getAs[Long]("n_id")).contains(2L),
      "zero-norm vector surfaced as a neighbor")
    assert(!rows.map(_.getAs[Long]("q_id")).contains(2L),
      "zero-norm vector ran as a query")
    assert(rows.forall(r => !r.getAs[Double]("cos").isNaN))
    // scale property: the only broadcast is the bounded query array
    // (an sc.broadcast value, invisible to the plan); the corpus rides
    // mapPartitions with no BroadcastExchange anywhere
    val plan = GraphAnn.nswTopK(emb, nQueries = 10, k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"corpus-sized broadcast in the plan:\n$plan")
  }
}
