package graft


/** Driver bench contract: run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is fully evaluated through the noop data source (column
  * pruning can't cheat a count() out of the real work) — the measured
  * time is scan + compute + (for sink queries) the write itself.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSpark.session(aqe = Some(true))
    // untimed warmup: JIT, codegen cache, parquet reader init
    SparkEntry.queries.get("agg_rollup").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      SparkEntry.harnessScope.release()
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.filterNot(_._3).map(_._1)
    // failures are machine-visible: a broken query must not silently pass
    // the bench gate on a near-zero wall time
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_failed":${failed.size},"failed":$failedJson}""")
    spark.stop()
  }
}
