package graft

import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print the full per-query JSON line followed by a
  * BOUNDED compact summary line (the last stdout line — sized to
  * survive the driver's 2000-char stdout-tail capture, which clipped
  * the head of the full line in round 10 and left the driver artifact
  * unparsed); the full map is also mirrored to BENCH_LATEST.json.
  *
  * Each query is fully evaluated through the noop data source (column
  * pruning can't cheat a count() out of the real work) — the measured
  * time is scan + compute + (for sink queries) the write itself.
  *
  * Measurement protocol — two PASSES, min per query across passes
  * (`"agg":"min_of_passes"`): pass 1 runs every query once in sorted
  * order, then pass 2 runs them all again, and each query reports the
  * min of its two samples. Back-to-back min-of-2 (rounds ≤ 7) was
  * defeated twice by external load concurrent with the bench window —
  * a transient hit both adjacent runs of a query, so the min still
  * carried the contamination. With a full pass between a query's two
  * samples, time-local load would have to span the entire pass to
  * distort a min, while a genuine plan regression still shows in every
  * sample. `"value_first_pass"` keeps the plain pass-1 sum.
  *
  * Session-scoped memo accounting: the shared near-dup pair relation
  * (SparkEntry.nearDupPairsShared) is CLEARED at the start of each pass
  * and rebuilt as its own timed entry `memo:near_dup_pairs`, so the
  * n-gram/Jaccard pipeline cost appears in the artifact instead of
  * hiding behind the memo-fed queries' cheap reads; those queries are
  * flagged machine-readably in `"memo_fed"`. A SPARK_GRAFT_ONLY-scoped
  * dev run declares its filter in `"only"` so a scoped artifact can
  * never be mistaken for a full round result.
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
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val memoFed = SparkEntry.memoFedQueries.filter(q => names.exists(_._1 == q))

    def timed(work: () => Unit): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { work(); true } catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}"); false
      }
      SparkEntry.harnessScope.release()
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // one full pass over every query in sorted order; each memo whose
    // fed queries are in scope is cleared at pass start and rebuilt as
    // its own timed entry IMMEDIATELY BEFORE its first consumer (not in
    // a block at pass start: a pass-leading build measures with a cold
    // JIT while every query benefits from ~100 predecessors' warmup —
    // round 10's 9.7 s unigram train read 15.2 s as a pass-leading memo
    // entry purely from ordering). Shared-pipeline cost stays visible
    // in the artifact either way.
    def pass(): Seq[(String, Double, Boolean)] = {
      val inScope = SparkEntry.benchMemos.filter {
        case (_, fed, _, _) => fed.exists(q => names.exists(_._1 == q))
      }
      inScope.foreach { case (_, _, clear, _) => clear() }
      val anchor: Map[String, Seq[(String, (SparkSession, String) => Unit)]] =
        inScope.map { case (entry, fed, _, build) =>
          (fed.filter(q => names.exists(_._1 == q)).min, (entry, build))
        }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      names.flatMap { case (name, fn) =>
        val memoEntries = anchor.getOrElse(name, Nil).map {
          case (entry, build) =>
            val (t, ok) = timed(() => build(spark, sfDir))
            (entry, t, ok)
        }
        val (t, ok) = timed(() =>
          fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        if (!ok) System.err.println(s"[bench] query was: $name")
        memoEntries :+ ((name, t, ok))
      }
    }

    val p1 = pass()
    val p2 = pass()
    val results = p1.zip(p2).map { case ((n1, t1, ok1), (n2, t2, ok2)) =>
      require(n1 == n2, s"pass order diverged: $n1 vs $n2")
      (n1, math.min(t1, t2), t1, ok1 && ok2)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val firstPass = results.map(_._3).sum
    val failed = results.filter(!_._4).map(_._1)
    // failures are machine-visible: a broken query must not silently pass
    // the bench gate on a near-zero wall time (both passes must succeed)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val memoFedJson = memoFed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val onlyJson = only.map(_.toSeq.sorted.map("\"" + _ + "\"")
      .mkString(""","only":[""", ",", "]")).getOrElse("")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":2,"agg":"min_of_passes","value_first_pass":$firstPass,"memo_fed":$memoFedJson$onlyJson,"queries":$qs,"sf":"$sfDir","n_failed":${failed.size},"failed":$failedJson}"""
    println(line)
    // the driver's artifact capture keeps only a bounded stdout TAIL
    // (observed: last 2000 chars), so the full per-query line above can
    // never parse from the captured artifact — its head is clipped.
    // Emit a BOUNDED compact summary as the LAST stdout line: the same
    // headline fields, a locale-safe fixed-point total, and only the
    // slowest keys inline (named queries_slowest — NOT "queries", so a
    // truncated map is never mistaken for the full one); the full map
    // lives in the mirror file written below.
    def fx(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v, _, _) => "\"" + k + "\":" + fx(v) }
      .mkString("{", ",", "}")
    // every piece is bounded (10 keys, 10 failed names), so the line is
    // structurally < ~1 KB — never truncated, always parseable
    val failedBounded = failed.take(10).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val compact = s"""{"metric":"total","value":${fx(total)},"unit":"sec","runs":2,"agg":"min_of_passes","value_first_pass":${fx(firstPass)},"n_queries":${results.size}$onlyJson,"queries_slowest":$slowest,"queries_full":"BENCH_LATEST.json","sf":"$sfDir","n_failed":${failed.size},"failed":$failedBounded}"""
    println(compact)
    // mirror the FULL line to a file so the per-query map stays
    // machine-readable (full runs only: a dev-scoped run must never
    // overwrite a round artifact)
    if (only.isEmpty) {
      val mirror = sys.env.getOrElse("SPARK_GRAFT_BENCH_JSON", "BENCH_LATEST.json")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(mirror), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] mirror write failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
