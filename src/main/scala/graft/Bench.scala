package graft


/** Driver bench contract: run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is fully evaluated through the noop data source (column
  * pruning can't cheat a count() out of the real work) — the measured
  * time is scan + compute + (for sink queries) the write itself.
  *
  * Measurement protocol: each query runs TWICE back-to-back and reports
  * the per-query MIN (declared in the JSON as "runs":2,"agg":"min";
  * "value_first_pass" keeps the plain single-run sum for comparison).
  * Rationale: two consecutive round artifacts were contaminated by
  * external load concurrent with the bench window — per-query times 10×
  * a clean same-config re-run, clustered in alphabetically-contiguous
  * blocks (queries run in sorted order, so time-correlated load maps to
  * contiguous name ranges). Steady-state min-of-2 is the standard
  * defense: transient load must now cover BOTH adjacent runs of a query
  * to distort its number, while a genuine plan regression still shows —
  * real cost inflates every run, including the min.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // dev-loop scoping: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    // (unset for the driver's full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = LocalSpark.session(aqe = Some(true))
    // untimed warmup: JIT, codegen cache, parquet reader init
    SparkEntry.queries.get("agg_rollup").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        SparkEntry.harnessScope.release()
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      val (t2, ok2) = once()
      (name, math.min(t1, t2), t1, ok1 && ok2)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val firstPass = results.map(_._3).sum
    val failed = results.filter(!_._4).map(_._1)
    // failures are machine-visible: a broken query must not silently pass
    // the bench gate on a near-zero wall time (both runs must succeed)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":2,"agg":"min","value_first_pass":$firstPass,"queries":$qs,"sf":"$sfDir","n_failed":${failed.size},"failed":$failedJson}""")
    spark.stop()
  }
}
