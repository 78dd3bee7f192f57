package graft

/** Asserted physical-plan invariants for the headline queries — the
  * scale properties the per-round plan audit checks by hand, promoted to
  * specs so a Spark upgrade or refactor cannot silently regress them:
  * broadcast-dim joins must not shuffle the fact side, top-k must
  * partially aggregate before the exchange, rank filters must plan as
  * WindowGroupLimit, rollup's Expand must run over pre-aggregated rows
  * (not the input scan), and the LSH dedup paths must enumerate
  * candidates through the bounded-bucket aggregator instead of a
  * self-join.
  *
  * AQE is disabled while planning (same rationale as graft.Plans: the
  * pre-execution AdaptiveSparkPlan hides final join strategies); the
  * assertions target the static plan the optimizer commits to. */
class PlanInvariantsSpec extends SparkSpec {

  private def withAqeOff[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def planOf(name: String): String = withAqeOff {
    try SparkEntry.queries(name)(spark, sf0)
      .queryExecution.executedPlan.toString
    finally SparkEntry.harnessScope.release()
  }

  test("broadcast-dim joins never sort-merge (fact side stays unshuffled)") {
    Seq("q3_shipping_priority", "q5_local_supplier", "join_enrich").foreach {
      q =>
        val plan = planOf(q)
        assert(!plan.contains("SortMergeJoin"),
          s"$q plans a sort-merge join — a dim stopped broadcasting:\n$plan")
        assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcasts")
    }
    // join_enrich is a pure enrichment: the ONLY exchange allowed is the
    // final presentation orderBy (range partitioning) — a hash exchange
    // means the 100 TB fact table started shuffling for the join
    val enrich = planOf("join_enrich")
    assert(!enrich.contains("Exchange hashpartitioning"),
      s"join_enrich shuffles the fact side:\n$enrich")
  }

  test("sim_topk reduces to k rows per query BEFORE the exchange " +
    "(map-side partial top-k)") {
    val plan = planOf("sim_topk")
    assert(plan.contains("partial_topkbyscore"),
      s"no partial top-k aggregation — shuffle carries all scored rows:\n$plan")
  }

  test("rank<=k window filters plan as WindowGroupLimit " +
    "(per-partition top-k, not full sort)") {
    Seq("ngram_topk", "window_topk").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("WindowGroupLimit"),
        s"$q lost its group-limit pushdown:\n$plan")
    }
  }

  test("agg_rollup_sets expands PRE-AGGREGATED rows, never the input scan") {
    val plan = planOf("agg_rollup_sets")
    val expands = plan.linesIterator.filter(_.contains("Expand ")).toSeq
    assert(expands.nonEmpty, s"rollup plan has no Expand:\n$plan")
    // Expand must reference the base aggregate's aliases (sq/sp/cnt) and
    // none of the raw lineitem columns — i.e. it multiplies ~|groups|
    // rows by the grouping sets, not the 100 TB scan
    assert(expands.forall(l => l.contains("sq#") && !l.contains("l_quantity")),
      s"Expand runs over input rows:\n${expands.mkString("\n")}")
  }

  test("LSH dedup candidate enumeration goes through the bounded-bucket " +
    "aggregator, not a banded self-join") {
    Seq("dedup_minhash", "dedup_simhash", "dedup_embedding_lsh").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("boundedlonglist"),
        s"$q lost the bounded bucket guard:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q re-introduced a shuffle self-join:\n$plan")
    }
  }
}
