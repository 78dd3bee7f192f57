package graft

import graft.operators.{Corpus, Sketches}
import org.apache.spark.sql.functions._

/** Bloom decontamination gate + Count-Min heavy hitters: the sketch
  * guarantees (one-sided error) as properties, plus the determinism that
  * makes these sketches — unusually — full-oracle queries. */
class SketchesSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0)

  test("dfHistogram: hand shingle dfs bucket by bit length; the " +
    "over-cap mass is exactly the occurrences the df filter drops") {
    import spark.implicits._
    val fx = Seq((1L, "a b c x y z"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.dfHistogram(fx, cap = 2).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // "a b c" df=3 (bucket 2, over cap 2); three unique shingles df=1
    assert(out == Seq(
      (1, 3L, 1L, 1L, 3L, 0L),
      (2, 1L, 3L, 3L, 3L, 3L)), s"got $out")
    // the dropped mass equals shingleTable's capped-vs-uncapped delta
    val uncapped = graft.operators.Dedup.shingleTable(fx, 3, None).count()
    val capped = graft.operators.Dedup.shingleTable(fx, 3, Some(2)).count()
    assert(out.map(_._6).sum == uncapped - capped,
      s"over-cap mass ${out.map(_._6).sum} != ${uncapped - capped}")
  }

  test("hllMerge: shard registers max-merge to EXACTLY the global " +
    "registers, merged estimate lands in the 1024-register envelope, " +
    "repartition-invariant") {
    val li = Tables.lineitem(spark, sf0)
    val r = Sketches.hllMerge(li).collect().head
    assert(r.getLong(0) == 6L, s"shards ${r.getLong(0)}")
    assert(r.getLong(1) == 0L, "merge identity broken: registers differ")
    // raw-estimate regime at sf0.001 (200 parts over 1024 registers:
    // the linear-counting branch is deliberately absent — no ln()), so
    // the assertion is the exact harmonic-form replay, not an envelope
    val alpha = 0.7213 / (1.0 + 1.079 / 1024.0)
    assert(r.getDouble(5) ==
      alpha * 1024 * 1024 * 524288 / r.getLong(3).toDouble,
      s"estimate is not the fixed harmonic form: $r")
    assert(r.getLong(3) > 0 && r.getLong(4) < 1024L, s"degenerate regs $r")
    assert(Sketches.hllMerge(li.repartition(17)).collect().head.toSeq ==
      r.toSeq, "not repartition-invariant")
  }

  test("bloom gate has no false negatives vs the exact 13-gram join") {
    // exact truth: train docs sharing >= 1 distinct 13-gram with holdout
    // (uncapped — the bloom gate has no df cap either)
    val exact = Corpus.contaminationNgrams(docs, k = 13, maxDf = None)
      .select(col("train_doc")).distinct()
      .collect().map(_.getLong(0)).toSet
    val gate = Sketches.bloomDecontaminate(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(exact.nonEmpty, "fixture should contain contaminated train docs")
    exact.foreach { d =>
      assert(gate.getOrElse(d, false),
        s"train doc $d shares a gram with holdout but bloom_hit is false")
    }
  }

  test("bloom flag counts bound the exact shared-gram counts per doc") {
    // n_flagged counts distinct grams the mask admits; a doc's distinct
    // grams actually present in the member set is a lower bound
    val grams = docs.select(col("doc_id"),
      substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1")
        .as("is_test"),
      explode(graft.functions.VectorFunctions.winnowFps(col("text"), 13, 1))
        .as("fp"))
    val mem = grams.filter(col("is_test")).select(col("fp")).distinct()
    val exactPerDoc = grams.filter(!col("is_test"))
      .join(mem, Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flagged = Sketches.bloomDecontaminate(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    exactPerDoc.foreach { case (d, n) =>
      assert(flagged.getOrElse(d, 0L) >= n,
        s"doc $d: n_flagged=${flagged.getOrElse(d, 0L)} < exact shared $n")
    }
  }

  test("bloom gate is repartition-invariant") {
    val a = Sketches.bloomDecontaminate(docs).collect().toSeq
    val b = Sketches.bloomDecontaminate(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("cms estimates never undercount, and are exact in light cells") {
    val out = Sketches.cmsHeavyHitters(docs).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"token ${r.getString(0)}: est $est < exact $exact")
      assert(r.getLong(3) == est - exact)
    }
    // descending exact order with token tiebreak
    val keys = out.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("cms overcount shrinks as width grows (collisions thin out)") {
    val narrow = Sketches.cmsHeavyHitters(docs, width = 64).collect()
      .map(_.getLong(3)).sum
    val wide = Sketches.cmsHeavyHitters(docs, width = 8192).collect()
      .map(_.getLong(3)).sum
    assert(wide <= narrow,
      s"total overcount at width 8192 ($wide) > at width 64 ($narrow)")
  }

  test("cms sketch is bounded at depth*width cells regardless of input") {
    // the sketch relation the estimates read from can never exceed the
    // grid — the bounded-memory claim, checked at the other end
    val est = Sketches.cmsHeavyHitters(docs, topK = 20, depth = 1, width = 8)
    assert(est.count() == 20)
    val narrowOver = est.collect().map(_.getLong(3))
    // depth 1 × width 8 forces cell sharing: overcounts must appear,
    // proving the probe actually reads collided counters (non-vacuous)
    assert(narrowOver.exists(_ > 0),
      "depth-1 width-8 grid shows no collisions — probe is not reading the grid")
  }

  /** lineitem-shaped frame for the quantile sketch. */
  private def liQ(rows: (String, Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
  }

  test("quantile sketch: with the group inside the reservoir the " +
    "nearest-rank percentiles are exact — hand-checked") {
    // group A = 1..10: p25 = ceil(2.5) = 3rd smallest, p50 = 5th,
    // p75 = 8th, p90 = 9th
    val out = Sketches.quantileSketch(
        liQ((1 to 10).map(i => ("A", i.toLong, 1L, i.toDouble)): _*))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 10L && r.getLong(2) == 10L)
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      == ((3.0, 5.0, 8.0, 9.0)))
  }

  test("quantile sketch is repartition-invariant (deterministic md5 " +
    "reservoir, not rand()) and caps the sample at r") {
    val li = Tables.lineitem(spark, sf0)
    val a = Sketches.quantileSketch(li).collect().toSeq
    val b = Sketches.quantileSketch(li.repartition(13)).collect().toSeq
    assert(a == b, "sample content changed under repartitioning")
    a.foreach { r =>
      assert(r.getLong(2) == math.min(256L, r.getLong(1)),
        s"n_sample != min(256, n_rows) for ${r.getString(0)}")
    }
  }

  test("quantileMergeAudit: bottom-k is a monoid — 0 mismatches on a " +
    "multi-shard fixture with r binding, merged percentiles replay an " +
    "independent driver-side bottom-k") {
    import spark.implicits._
    val rows = (1 to 40).map(i => (if (i % 2 == 0) "A" else "B",
      if (i % 3 == 0) "X" else "Y", i.toLong, 1L, i.toDouble * 10))
    val li = rows.toDF("l_returnflag", "l_linestatus", "l_orderkey",
      "l_linenumber", "l_extendedprice")
    val r = Sketches.quantileMergeAudit(li, r = 8).collect().head
    assert(r.getLong(0) == 4L, "4 shards expected (A/B x X/Y)")
    assert(r.getLong(1) == 8L, "direct sample must cap at r")
    assert(r.getLong(2) == 0L, "merge law violated: merged != direct")
    // independent replay of the global bottom-8 with the same hash
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(ok: Long, ln: Long): Long = {
      md.reset()
      graft.functions.PortableHash.hexPrefixVal(
        md.digest(s"$ok:$ln".getBytes("UTF-8")), 7)
    }
    val samp = rows.map { case (_, _, ok, ln, v) => (h(ok, ln), v) }
      .sorted.take(8).map(_._2).sorted
    def nr(p: Int): Double = samp((p * 8 + 99) / 100 - 1)
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      == ((nr(25), nr(50), nr(75), nr(90))))
  }

  test("quantileMergeAudit on the corpus: the law holds at full r and " +
    "the audit is repartition-invariant") {
    val li = Tables.lineitem(spark, sf0)
    val a = Sketches.quantileMergeAudit(li).collect().toSeq
    val b = Sketches.quantileMergeAudit(li.repartition(13)).collect().toSeq
    assert(a == b, "audit changed under repartitioning")
    assert(a.head.getLong(2) == 0L, "merge law violated on the corpus")
  }

  test("quantile sketch rank error stays within the binomial envelope " +
    "of a 256-sample against the exact distribution") {
    val li = Tables.lineitem(spark, sf0)
    val sk = Sketches.quantileSketch(li).collect()
      .map(r => r.getString(0) ->
        Seq(25 -> r.getDouble(3), 50 -> r.getDouble(4),
          75 -> r.getDouble(5), 90 -> r.getDouble(6))).toMap
    // observed rank of each sketched percentile in the FULL group;
    // tolerance ~4·sqrt(p(1-p)/256) — generous enough to be stable,
    // tight enough that a broken reservoir (e.g. hash bias) fails
    sk.foreach { case (g, qs) =>
      val vals = li.filter(col("l_returnflag") === g)
        .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
      qs.foreach { case (p, qv) =>
        val frac = vals.count(_ <= qv).toDouble / vals.length
        val tol = 4.0 * math.sqrt(p / 100.0 * (1 - p / 100.0) / 256.0)
        assert(math.abs(frac - p / 100.0) <= tol,
          f"group $g p$p: observed rank $frac%.3f vs target ${p / 100.0}%.2f (tol $tol%.3f)")
      }
    }
  }

  private def evFix(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("event_type", "user_id")
  }

  test("theta sketch: underfull sketches report exact counts, the " +
    "intersection degenerates to the exact overlap, duplicates fold") {
    // 4 click users {1,2,3,4}, 3 purchase users {3,4,5}, overlap = 2;
    // every set fits a k=64 sketch → both estimator branches are the
    // exact ones, regardless of which hashes md5 deals
    val out = Sketches.thetaSketch(evFix(
        ("click", 1L), ("click", 2L), ("click", 3L), ("click", 4L),
        ("click", 1L), // duplicate event must not inflate anything
        ("purchase", 3L), ("purchase", 4L), ("purchase", 5L)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(out("click") == ((4L, 4L, 4.0)))
    assert(out("purchase") == ((3L, 3L, 3.0)))
    assert(out("click_x_purchase") == ((2L, 2L, 2.0)),
      "underfull theta must be the exact sketch-level intersection")
  }

  test("theta sketch: a zero-row side still emits the structural " +
    "intersection row (theta degenerates to 2^48, est 0)") {
    // no 'purchase' events at all — the <a>_x_<b> row must SURVIVE
    // (the oracle's COUNT over an empty join still yields one row); a
    // filter+crossJoin formulation erases it and desyncs
    val out = Sketches.thetaSketch(evFix(
        ("click", 1L), ("click", 2L), ("click", 3L)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.contains("click_x_purchase"),
      "empty-side intersection row must be structural, not vanish")
    assert(out("click_x_purchase") == ((0L, 0L, 1L << 48, 0.0)))
  }

  test("thetaAnotB: underfull sketches report the exact differences " +
    "both ways; duplicates fold; a full A side estimates (k-1)/theta " +
    "against an empty B") {
    // clicks {1,2,3}, purchases {2,3,4}: A\B = {1}, B\A = {4};
    // everything underfull → theta = 2^48 and est IS the exact count
    val out = Sketches.thetaAnotB(evFix(
        ("click", 1L), ("click", 2L), ("click", 3L), ("click", 2L),
        ("purchase", 2L), ("purchase", 3L), ("purchase", 4L)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("click_not_purchase") == ((1L, 1L, 1L << 48, 1.0)), out)
    assert(out("purchase_not_click") == ((1L, 1L, 1L << 48, 1.0)), out)
    // k=2, 4 click users, zero purchases: theta = A's 2nd-smallest
    // hash, retained = the 1 hash strictly below it, est = Space/theta
    val full = Sketches.thetaAnotB(evFix(
        ("click", 1L), ("click", 2L), ("click", 3L), ("click", 4L)), k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val ab = full("click_not_purchase")
    assert(ab._1 == 4L && ab._2 == 1L && ab._3 < (1L << 48) &&
      ab._4 == (1L << 48).toDouble / ab._3, ab)
    assert(full("purchase_not_click") == ((0L, 0L, ab._3, 0.0)),
      "empty A side must read structural zeros under the shared theta")
  }

  test("theta sketch on the corpus: full sketches estimate within the " +
    "KMV error envelope, and the whole report is repartition-invariant") {
    val ev = Tables.events(spark, sf0)
    val out = Sketches.thetaSketch(ev).collect()
    val b = Sketches.thetaSketch(ev.repartition(13)).collect()
    assert(out.toSeq == b.toSeq)
    assert(out.length == 6, "5 event types + 1 intersection row")
    out.filter(_.getString(0) != "click_x_purchase").foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(4))
      // KMV relative error ~ 1/sqrt(k-2) ≈ 13% at k=64; allow 4 sigma
      assert(math.abs(est - exact) / exact <= 0.52,
        s"${r.getString(0)}: est $est vs exact $exact")
      assert(r.getLong(2) == math.min(64L, r.getLong(1)))
    }
    val ir = out.find(_.getString(0) == "click_x_purchase").get
    assert(ir.getLong(1) > 0, "fixture corpus must have overlapping users")
    assert(ir.getDouble(4) >= 0.0)
  }

  test("quantile sketch plans as partial aggregation — no window " +
    "shuffling every row, bottom-k reduced map-side") {
    val plan = Sketches.quantileSketch(Tables.lineitem(spark, sf0))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.window.WindowExec
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "quantile sketch fell back to a window rank")
    assert(plan.toString.contains("ObjectHashAggregate"),
      "bottom-k aggregator lost its partial-aggregation plan")
  }

  test("bloomFprAudit: no false negatives ever; a starved mask shows " +
    "measured false positives; arithmetic reconciles") {
    val docs = Tables.documents(spark, sf0)
    val healthy = Sketches.bloomFprAudit(docs).collect().head
    val (nm, np, ntm, nf, nfp) = (healthy.getLong(0), healthy.getLong(1),
      healthy.getLong(2), healthy.getLong(3), healthy.getLong(4))
    assert(nm > 0 && np > 0)
    // Bloom's structural guarantee: every true member is flagged
    assert(nf >= ntm, s"false negative: flagged $nf < members $ntm")
    assert(nfp == nf - ntm || nfp <= nf)
    assert(healthy.getLong(5) == nfp * 1000000L / (np - ntm))
    // starve the mask (64 bits, 1 hash): collisions are forced and the
    // measured FPR must show them
    val starved = Sketches.bloomFprAudit(docs, mBits = 64, nHash = 1)
      .collect().head
    assert(starved.getLong(4) > 0L,
      s"expected forced false positives on a 64-bit mask, got $starved")
  }

  test("amsF2: single-key stream estimates exactly (every sign cancels " +
    "into |Z| = c); full-table run is deterministic and self-audited") {
    import spark.implicits._
    // one key, count 5: Z_j = ±5 for every estimator, so Z² = 25 = F2
    // exactly and err_ppm = 0 — the degenerate case where the sketch
    // has NO sampling error, pinned by hand
    val one = Seq.fill(5)(Tuple1(42L)).toDF("l_partkey")
    val r = graft.operators.Sketches.amsF2(one).collect().head
    assert(r.toSeq == Seq(5L, 1L, 64L, "25", "25", 0L), r)
    // real table: exact F2 recomputed locally, estimate within 50% (64
    // estimators give ~1/8 relative sd; the bound is loose on purpose
    // — the VALUE is pinned by the oracle, this guards the wiring),
    // repartition-invariant
    val li = Tables.lineitem(spark, sf0).select(col("l_partkey"))
    val out = graft.operators.Sketches.amsF2(li).collect().head
    val counts = li.groupBy(col("l_partkey")).count().collect()
      .map(_.getLong(1))
    assert(out.getLong(0) == counts.sum && out.getLong(1) == counts.length)
    assert(BigInt(out.getString(3)) == counts.map(c => BigInt(c) * c).sum)
    val est = BigInt(out.getString(4)).toDouble
    val exact = BigInt(out.getString(3)).toDouble
    assert(est > exact * 0.5 && est < exact * 1.5,
      s"estimate $est vs exact $exact out of the loose band")
    val out2 = graft.operators.Sketches.amsF2(li.repartition(7))
      .collect().head
    assert(out.toSeq == out2.toSeq, "AMS not repartition-invariant")
  }

  test("bloomMergeAudit: shard masks OR-merge to EXACTLY the global " +
    "mask — censuses and position sums identical — and shards are " +
    "key-derived, not physical") {
    val out = Sketches.bloomMergeAudit(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("shard_0", "shard_1", "shard_2", "shard_3",
      "zz_global", "zz_merged"))
    assert(out("zz_merged") == out("zz_global"),
      s"OR-merge diverged from the single pass: $out")
    // every shard contributes and no shard is the whole corpus
    (0 to 3).foreach { s =>
      val (nk, bits, _) = out(s"shard_$s")
      assert(nk > 0L && bits > 0L && bits < out("zz_global")._2)
    }
    // physical-layout invariance: repartitioned input, identical rows
    val again = Sketches.bloomMergeAudit(docs.repartition(11)).collect()
      .map(r => r.toSeq).toSeq
    assert(again == Sketches.bloomMergeAudit(docs).collect()
      .map(r => r.toSeq).toSeq)
  }

  test("linearCount: occupancy is exactly the distinct bucket count, " +
    "the series estimate tracks exact within LC's regime, and the " +
    "bitmap is repartition-invariant") {
    val li = Tables.lineitem(spark, sf0)
    val rows = Sketches.linearCount(li).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getLong(1); val filled = r.getLong(2)
      val exact = r.getLong(4); val estMilli = r.getLong(5)
      assert(r.getLong(3) == m - filled)
      assert(filled <= exact, "occupancy cannot exceed exact distinct")
      // sf0.001 distinct ≈ hundreds vs m=1024: LC's sweet spot —
      // the estimate must land within ±15% of exact
      val est = estMilli / 1000.0
      assert(est > exact * 0.85 && est < exact * 1.15,
        s"LC estimate $est vs exact $exact outside the regime band")
    }
    val again = Sketches.linearCount(li.repartition(13)).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "linear counting not repartition-invariant")
  }
}
