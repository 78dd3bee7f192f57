package graft

import graft.operators.{Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge-semantics regressions from review: upsert must be whole-row
  * latest-wins (NULLs included), PII scrub must be case-insensitive with
  * hex-before-digits precedence. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: change rows replace wholesale — NULLed fields stay NULL") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val changes = Seq((2L, null.asInstanceOf[String], 99.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val out = Relational.upsert(base, changes, "k")
      .as[(Long, Option[String], Double)].collect().toSeq
    assert(out == Seq((1L, Some("a"), 10.0), (2L, None, 99.0), (3L, Some("c"), 30.0)))
  }

  test("bucketed range join ≡ naive inequality join, incl. bucket-boundary pairs") {
    val events = Tables.events(spark, sf0)
    val bucketed = Relational.rangeJoin(events,
      windowSec = 600, bucketSec = 600).collect()
    // naive: direct inequality join (BNLJ — fine at sf0.001)
    val e = events.filter(col("event_type") === "error")
      .select(col("event_id").as("interval_id"), unix_micros(col("ts")).as("i_us"))
    val b = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("point_id"), unix_micros(col("ts")).as("p_us"))
    val naive = b.join(e,
        col("p_us") >= col("i_us") && col("p_us") < col("i_us") + 600000000L)
      .select(col("point_id"), col("interval_id")).collect()
    def keys(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.nonEmpty, "fixture produced no in-window pairs")
    assert(keys(bucketed) == keys(naive))
    // a shrunken bucket (interval spans >2 buckets) must still be exact
    val small = Relational.rangeJoin(events,
      windowSec = 600, bucketSec = 90).collect()
    assert(keys(small) == keys(naive))
  }

  test("pricingCube ≡ the union of all four explicit groupings") {
    val li = Tables.lineitem(spark, sf0)
    val cube = Relational.pricingCube(li).collect()
      .map(r => (Option(r.getAs[String]("l_returnflag")),
        Option(r.getAs[String]("l_linestatus")), r.getAs[Long]("gid")) ->
        (r.getAs[Double]("sum_qty"), r.getAs[Long]("count_order"))).toMap
    val base = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"),
        count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))
        -> (r.getAs[Double]("q"), r.getAs[Long]("c"))).toMap
    // finest grouping rows (gid 0) match the direct groupBy exactly
    base.foreach { case ((f, s), v) =>
      assert(cube((Some(f), Some(s), 0L)) == v, s"cube cell ($f,$s)") }
    // subtotals are exact sums of their cells; the grand total covers all
    val grand = cube((None, None, 3L))
    assert(grand._2 == base.values.map(_._2).sum)
    assert(math.abs(grand._1 - base.values.map(_._1).sum) < 1e-6)
    val flagTotals = base.groupBy(_._1._1).view
      .mapValues(vs => vs.values.map(_._2).sum)
    flagTotals.foreach { case (f, c) =>
      assert(cube((Some(f), None, 1L))._2 == c, s"flag subtotal $f") }
    assert(cube.count(_._1._3 == 2L) ==
      base.keys.map(_._2).toSet.size, "one gid=2 row per status")
  }

  test("semiAntiJoin partitions customers exactly; no row multiplication") {
    val cust = Tables.customer(spark, sf0)
    val out = Relational.semiAntiJoin(cust, Tables.orders(spark, sf0)).collect()
    // every customer appears exactly once — a semi/anti pair is a
    // partition, regardless of how many orders matched
    assert(out.length == cust.count())
    assert(out.map(_.getAs[Long]("c_custkey")).distinct.length == out.length)
    val withOrders = out.filter(_.getAs[String]("kind") == "with_orders")
      .map(_.getAs[Long]("c_custkey")).toSet
    // cross-check the semi set against a direct distinct projection
    val expected = Tables.orders(spark, sf0)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    // orders reference existing customers in this data; intersect guards
    // against synthetic custkeys outside the customer table
    assert(withOrders == expected.intersect(
      cust.select(col("c_custkey")).collect().map(_.getLong(0)).toSet))
  }

  test("saltedJoin ≡ plain equi-join, and the shuffle key carries the salt") {
    val ev = Tables.events(spark, sf0)
    val cust = Tables.customer(spark, sf0)
      .select(col("c_custkey"), col("c_name"))
    val salted = Relational.saltedJoin(ev, cust,
      "user_id", "c_custkey", col("event_id"))
    val plain = ev.join(cust, col("user_id") === col("c_custkey"))
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "c_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys(salted).nonEmpty && keys(salted) == keys(plain))
    // with broadcast off, the fact-side exchange must partition on
    // (key, salt) — the hot key diffuses over `salts` partitions
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Relational.saltedJoin(ev, cust,
          "user_id", "c_custkey", col("event_id"))
        .queryExecution.executedPlan.toString
      val saltedExchanges = plan.linesIterator
        .filter(l => l.contains("Exchange hashpartitioning") &&
          l.contains("__salt"))
      assert(saltedExchanges.nonEmpty,
        s"no salted exchange — the hot key still lands on one reducer:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // helper-column collision: an input already carrying __salt/__dsalt
    // must be refused (withColumn would replace it and drop would then
    // delete the caller's data — silent column loss)
    val e1 = intercept[IllegalArgumentException] {
      Relational.saltedJoin(ev.withColumn("__salt", lit(1)), cust,
        "user_id", "c_custkey", col("event_id"))
    }
    assert(e1.getMessage.contains("__salt"))
    val e2 = intercept[IllegalArgumentException] {
      Relational.saltedJoin(ev, cust.withColumn("__dsalt", lit(1)),
        "user_id", "c_custkey", col("event_id"))
    }
    assert(e2.getMessage.contains("__dsalt"))
  }

  test("stratifiedSample: exact per-stratum quota, repartition-stable") {
    val docs = Tables.documents(spark, sf0)
    val sample = graft.operators.Corpus.stratifiedSample(docs, perSource = 5)
      .collect()
    val perSource = sample.groupBy(_.getString(1)).view.mapValues(_.length)
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum yields min(quota, stratum size), ranks are 1..k
    counts.foreach { case (s, n) =>
      assert(perSource.getOrElse(s, 0) == math.min(5L, n), s"quota for $s") }
    sample.groupBy(_.getString(1)).foreach { case (s, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq, s) }
    // identical selection under a different partitioning
    val reparted = graft.operators.Corpus
      .stratifiedSample(docs.repartition(7), perSource = 5).collect()
    assert(reparted.map(r => (r.getLong(0), r.getString(1))).toSet ==
      sample.map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("winnowing: a shared w+k-1 token run guarantees a common " +
    "fingerprint; selection is sparse; short docs yield none") {
    // k=3, w=4 defaults: any shared run of >= 6 tokens must contribute
    // at least one common selected hash (the winnowing guarantee)
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"red green blue $shared yellow purple orange pink"),
      (3L, "completely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty, "guaranteed common fingerprint missing")
    assert((fp(1L) & fp(3L)).isEmpty, "disjoint docs share a fingerprint")
    // sparsity: doc 1 has 13 tokens → 11 k-grams, but only ≤ 8 window
    // minima and fewer after dedup
    assert(fp(1L).size < 11, s"selected ${fp(1L).size} of 11 hashes")
    // below w+k-1 tokens there is no full window → no fingerprints
    assert(TextAnalysis.winnowFingerprints(
      Seq((9L, "a b c d e")).toDF("doc_id", "text")).count() == 0)
  }

  test("funnel: strictly-after ordering, missed steps cascade to null") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered funnel → stage 3
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:05:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: view BEFORE signup does not count → stage 1
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      // user 3: purchase without an intervening view → stage 1
      (3L, ts("2024-01-01 10:00:00"), "signup"),
      (3L, ts("2024-01-01 10:05:00"), "purchase"),
      // user 4: never signed up → stage 0
      (4L, ts("2024-01-01 10:00:00"), "view"),
      // user 5: view at the SAME instant as signup is not strictly after
      (5L, ts("2024-01-01 10:00:00"), "signup"),
      (5L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.operators.Sessionize.funnel(ev).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("funnel_stage")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
  }

  test("spearmanCorr: monotone-with-ties scores ~1, anti-monotone ~-1, " +
    "nonlinear-but-monotone still perfect") {
    import spark.implicits._
    def li(rows: (Long, Double)*) =
      rows.toDF("l_quantity", "l_extendedprice")
        .select(col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice"))
    val mono = graft.operators.Relational.spearmanCorr(
      li(1L -> 10.0, 2L -> 20.0, 2L -> 20.0, 3L -> 30.0)).collect().head
    assert(math.abs(mono.getDouble(1) - 1.0) < 1e-12, s"got $mono")
    val anti = graft.operators.Relational.spearmanCorr(
      li(1L -> 30.0, 2L -> 20.0, 3L -> 10.0)).collect().head
    assert(math.abs(anti.getDouble(1) + 1.0) < 1e-12, s"got $anti")
    // nonlinear monotone (y = x^3-ish): Pearson would drop below 1,
    // Spearman must not
    val cube = graft.operators.Relational.spearmanCorr(
      li(1L -> 1.0, 2L -> 8.0, 3L -> 27.0, 4L -> 64.0)).collect().head
    assert(math.abs(cube.getDouble(1) - 1.0) < 1e-12, s"got $cube")
  }

  test("orderMonthlyGrowth: hand timeline — first month NULL, negative " +
    "delta floors identically, positive delta truncates toward zero") {
    val orders = Seq(
      ("2024-01-15", 100.00),
      ("2024-02-01", 100.00), ("2024-02-20", 50.00),
      ("2024-03-09", 75.00),
      ("2024-04-30", 80.00))
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.orderMonthlyGrowth(orders)
      .select(col("rev_cents"), col("prev_cents"), col("growth_ppm"))
      .collect().toSeq
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(out == Seq(
      (10000L, None, None),                         // first month: no prior
      (15000L, Some(10000L), Some(500000L)),        // +50%
      (7500L, Some(15000L), Some(-500000L)),        // -50% exact
      // +500/7500 = 66666.67 ppm — sign-split div must TRUNCATE to 66666
      (8000L, Some(7500L), Some(66666L))), s"got $out")
  }

  test("lengthDriftBySource: disjoint length ranges score D = 1 exactly, " +
    "identical distributions score 0") {
    def docs(rows: (String, Long)*) =
      rows.toDF("source", "n_chars")
    // ranges disjoint in BIT-LENGTH-BUCKET space (buckets {1,2} vs
    // {7,8}) — the round-15 grid bound compares bucketed CDFs, so
    // same-bucket lengths are indistinguishable by design
    val disjoint = Relational.lengthDriftBySource(
        docs("a" -> 1L, "a" -> 2L, "b" -> 100L, "b" -> 200L))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(disjoint == Map("a" -> 1.0, "b" -> 1.0), s"got $disjoint")
    val same = Relational.lengthDriftBySource(
        docs("c" -> 5L, "c" -> 6L, "d" -> 5L, "d" -> 6L))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(same == Map("c" -> 0.0, "d" -> 0.0), s"got $same")
  }

  test("supplierHhi: even 50/50 split scores exactly 0.5 (eff 2); a " +
    "monopoly nation scores exactly 1") {
    val lineitem = Seq((1L, 10.00), (1L, 10.00), (2L, 20.00), (3L, 7.00))
      .toDF("l_suppkey", "l_extendedprice")
    val supplier = Seq((1L, 1), (2L, 1), (3L, 2))
      .toDF("s_suppkey", "s_nationkey")
    val nation = Seq((1, "alpha"), (2, "beta")).toDF("n_nationkey", "n_name")
    val out = Relational.supplierHhi(lineitem, supplier, nation)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out == Seq(
      ("alpha", 2L, 4000L, 0.5, 2.0),
      ("beta", 1L, 700L, 1.0, 1.0)), s"got $out")
  }

  test("eventCusum: hand recurrence exact — below-mean days pin at 0, " +
    "the level shift accumulates linearly") {
    // counts [1,1,1,1,10,10] → mean 24 div 6 = 4; cusum 0,0,0,0,6,12
    val rows = (1 to 4).map(d => s"2024-01-0$d 12:00:00") ++
      (1 to 10).map(_ => "2024-01-05 12:00:00") ++
      (1 to 10).map(_ => "2024-01-06 12:00:00")
    val events = rows.toDF("t").select(to_timestamp(col("t")).as("ts"))
    val out = Relational.eventCusum(events).collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out == Seq((1L, 0L, false), (1L, 0L, false), (1L, 0L, false),
      (1L, 0L, false), (10L, 6L, false), (10L, 12L, false)), s"got $out")
  }

  test("rollingMedian: the one-day spike never moves the median, the " +
    "gap day enters the frame as a zero, frames grow 1..n") {
    val orders = Seq(("2024-01-01", 1.00), ("2024-01-02", 9.00),
        ("2024-01-03", 1.00), ("2024-01-05", 1.00))
      .toDF("d", "o_totalprice")
      .select(to_timestamp(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.rollingMedian(orders).collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out == Seq(
      (100L, 1L, 100L), (900L, 2L, 100L), (100L, 3L, 100L),
      (0L, 4L, 100L), (100L, 5L, 100L)), s"got $out")
  }

  test("interarrivalHist: exact bit-length buckets — zero gap lands in " +
    "bucket 1, 1s in 20, 3s in 22; users never cross") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:00:01", 2L),
      (1L, "2024-01-01 00:00:04", 3L),
      (2L, "2024-01-01 00:00:10", 4L), (2L, "2024-01-01 00:00:10", 5L))
      .toDF("user_id", "t", "event_id")
      .select(col("user_id"), to_timestamp(col("t")).as("ts"),
        col("event_id"))
    val out = Relational.interarrivalHist(events).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out == Seq(
      (1, 1L, 0L, 0L),              // simultaneous pair, event_id order
      (20, 1L, 1000000L, 1000000L), // 1 s
      (22, 1L, 3000000L, 3000000L)), s"got $out")
  }

  test("basketSizeHist: per-order counts bucket exactly, shares ppm") {
    val li = Seq(1L, 1L, 2L, 3L, 3L).toDF("l_orderkey")
    val out = Relational.basketSizeHist(li).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out == Seq((1L, 1L, 333333L), (2L, 2L, 666666L)), s"got $out")
  }

  test("eventMixDrift: a week matching the global mix scores exactly 0; " +
    "a fully-drifted week scores the hand chi2") {
    def ev(rows: (String, String)*) =
      rows.toDF("t", "event_type")
        .select(to_timestamp(col("t")).as("ts"), col("event_type"))
    // both weeks 50/50 click/view == global mix → chi2 0
    val steady = Relational.eventMixDrift(ev(
      ("2024-01-01", "click"), ("2024-01-02", "view"),
      ("2024-01-08", "click"), ("2024-01-09", "view")))
      .collect().map(_.getDouble(2))
    assert(steady.forall(_ == 0.0), s"got ${steady.toSeq}")
    // week1 all click, week2 all view, global 50/50: per week
    // (4-2)^2/2 + (0-2)^2/2 = 4
    val drift = Relational.eventMixDrift(ev(
      (1 to 4).map(d => (s"2024-01-0$d", "click")) ++
        (8 to 11).map(d => (f"2024-01-$d%02d", "view")): _*))
      .collect().map(_.getDouble(2))
    assert(drift.toSeq == Seq(4.0, 4.0), s"got ${drift.toSeq}")
  }

  test("srmCheck: users counted once regardless of event volume, " +
    "imbalance exact ppm, chi2 = (n0-n1)^2/n") {
    val events = Seq(0L, 0L, 0L, 1L, 2L, 3L, 4L, 4L)
      .toDF("user_id")
    val r = Relational.srmCheck(events).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 3L, 2L, 200000L)), s"got $r")
    assert(r.getDouble(4) == 0.2, s"chi2 ${r.getDouble(4)}")
  }

  test("weeklyChurn: churn is a share of LAST week's actives; a gap " +
    "week inside the span reports total churn; weeks past the corpus " +
    "end don't report") {
    // week of Jan 1 2024 (a Monday): {1,2,3}; next week {2,3,4};
    // then a SILENT week (total churn of the 3 actives); then {1}.
    // The silent week reports retained=0 / churn_ppm=1000000; the
    // week after Jan 22 (past the observed span) does not report.
    val events = Seq(
      (1L, "2024-01-02"), (2L, "2024-01-03"), (3L, "2024-01-04"),
      (2L, "2024-01-09"), (3L, "2024-01-10"), (4L, "2024-01-11"),
      (1L, "2024-01-23"))
      .toDF("user_id", "t")
      .select(col("user_id"), to_timestamp(col("t")).as("ts"))
    val out = Relational.weeklyChurn(events).collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out == Seq(
      (3L, 2L, 1L, 333333L),
      (3L, 0L, 3L, 1000000L)), s"got $out")
  }

  test("newVsReturning: first day ever is NEW, any later active day " +
    "RETURNING; same-day repeat events collapse") {
    val events = Seq(
      ("2024-01-01 08:00:00", 1L), ("2024-01-01 09:00:00", 1L), // dup day
      ("2024-01-02 10:00:00", 1L),
      ("2024-01-02 11:00:00", 2L))
      .toDF("t", "user_id")
      .select(to_timestamp(col("t")).as("ts"), col("user_id"))
    val out = Relational.newVsReturning(events).collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out == Seq(
      (1L, 1L, 0L, 0L),
      (2L, 1L, 1L, 500000L)), s"got $out")
  }

  test("customerDiversity: uniform 2x2 scores simpson 2/3 (unbiased " +
    "form, eff 3 at N=4); single-segment nation scores zero, eff 1") {
    val customer = Seq(
      (1, "A"), (1, "A"), (1, "B"), (1, "B"),
      (2, "A"), (2, "A"), (2, "A"))
      .toDF("c_nationkey", "c_mktsegment")
    val nation = Seq((1, "alpha"), (2, "beta")).toDF("n_nationkey", "n_name")
    val out = Relational.customerDiversity(customer, nation)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // alpha: N=4, nn=12, ss=2+2=4 → simpson 8/12, eff 3.0
    assert(out(0) == (("alpha", 4L, 2L, 8.0 / 12.0, 3.0)), s"got ${out(0)}")
    // beta: one segment → simpson 0, eff exactly 1
    assert(out(1) == (("beta", 3L, 1L, 0.0, 1.0)), s"got ${out(1)}")
  }

  test("holtForecast: hand ramp trajectory exact — seed month NULL, " +
    "level/trend halvings truncate, errors replay") {
    val orders = Seq(("2024-01-01", 1.00), ("2024-02-01", 2.00),
        ("2024-03-01", 3.00), ("2024-04-01", 4.00))
      .toDF("d", "o_totalprice")
      .select(to_timestamp(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.holtForecast(orders).collect().toSeq
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // l: 100→150→237→346, t: 0→25→56→82; fc = prior l+t
    assert(out == Seq(
      (100L, None, None),
      (200L, Some(100L), Some(100L)),
      (300L, Some(175L), Some(125L)),
      (400L, Some(293L), Some(107L))), s"got $out")
  }

  test("orderSeasonality: years pool into the 12 structural months, " +
    "shares exact ppm, dead months present with zero mass") {
    val orders = Seq(("2023-01-10", 1.00), ("2024-01-05", 2.00),
        ("2024-03-20", 1.00))
      .toDF("d", "o_totalprice")
      .select(to_timestamp(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.orderSeasonality(orders).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.size == 12 && out.map(_._1) == (1 to 12), s"got $out")
    assert(out(0) == ((1, 2L, 300L, 750000L)), s"jan ${out(0)}")
    assert(out(2) == ((3, 1L, 100L, 250000L)), s"mar ${out(2)}")
    assert(out(1) == ((2, 0L, 0L, 0L)), s"feb ${out(1)}")
  }

  test("revenueAutocorr: period-2 series via GAP-FILLED zero days — " +
    "lag-1 exactly -1, lag-2 exactly +1") {
    // orders only on days 1/3/5 — days 2/4 must be zero-filled rows,
    // giving the series [100, 0, 100, 0, 100]
    val orders = Seq("2024-01-01", "2024-01-03", "2024-01-05")
      .toDF("d")
      .select(to_timestamp(col("d")).as("o_orderdate"),
        lit(1.00).as("o_totalprice"))
    val out = Relational.revenueAutocorr(orders, maxLag = 2)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)) == Seq((1, 4L), (2, 3L)), s"got $out")
    assert(math.abs(out(0)._3 + 1.0) < 1e-12, s"lag-1 ${out(0)._3}")
    assert(math.abs(out(1)._3 - 1.0) < 1e-12, s"lag-2 ${out(1)._3}")
  }

  test("fkIntegrity: orphans counted by row AND key, NULL FK split out, " +
    "clean edge reports zero") {
    val child = Seq(Some(1L), Some(1L), Some(2L), None)
      .toDF("fk")
    val parent = Seq(1L, 3L).toDF("pk")
    val out = Relational.fkIntegrity(Seq(
        ("clean", parent.toDF("fk"), "fk", parent, "pk", true),
        ("dirty", child, "fk", parent, "pk", true)))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out == Seq(
      ("clean", 2L, 2L, 0L, 0L, 0L),
      // 4 rows over keys {1,1,2,NULL}: key 2 orphans (1 key, 1 row),
      // the NULL row is MISSING, not orphaned
      ("dirty", 4L, 2L, 1L, 1L, 1L)), s"got $out")
  }

  test("orderGini: hand fixture exact (0.25 for 1..4), ties grouped, " +
    "uniform values score zero") {
    import spark.implicits._
    val r = graft.operators.Relational.orderGini(
      Seq(1.0, 2.0, 3.0, 4.0).toDF("o_totalprice")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 1000L)
    assert(r.getLong(2) == 1000L && r.getDouble(3) == 0.25, s"got $r")
    val u = graft.operators.Relational.orderGini(
      Seq(5.0, 5.0, 5.0).toDF("o_totalprice")).collect().head
    assert(u.getDouble(3) == 0.0, s"uniform gini ${u.getDouble(3)}")
  }

  test("anovaOneWay: hand two-live-group fixture — exact SS terms and " +
    "F, empty groups excluded from the dof") {
    import spark.implicits._
    // click = {1, 2, 3}, purchase = {2, 4} (dollars → exact cents):
    // SSB = 12000, SSW = 40000 (cents²), live k = 2 → F = 0.9
    val ev = Seq(("click", 1.0), ("click", 2.0), ("click", 3.0),
      ("purchase", 2.0), ("purchase", 4.0)).toDF("event_type", "value")
    val r = graft.operators.Relational.anovaOneWay(ev).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 12000.0, s"ss_between ${r.getDouble(2)}")
    assert(r.getDouble(3) == 40000.0, s"ss_within ${r.getDouble(3)}")
    assert(r.getDouble(4) == (12000.0 / 1.0) / (40000.0 / 3.0),
      s"f ${r.getDouble(4)}")
  }

  test("funnelWindowed: conversion window gates each stage, boundary " +
    "is inclusive, anchor stays greedy-earliest") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view 2h after signup (inside 1h window? no — outside)
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 12:00:00"), "view"),
      // user 2: view exactly AT the window boundary (inclusive) and
      // purchase inside its own window → stage 3
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-01 11:00:00"), "view"),
      (2L, ts("2024-01-01 11:30:00"), "purchase"),
      // user 3: greedy anchors on the EARLIEST view (10:10); the
      // purchase is within 1h of the later view but not of the
      // earliest → stage 2 (the documented no-backtrack trade)
      (3L, ts("2024-01-01 10:00:00"), "signup"),
      (3L, ts("2024-01-01 10:10:00"), "view"),
      (3L, ts("2024-01-01 10:50:00"), "view"),
      (3L, ts("2024-01-01 11:40:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.operators.Sessionize
      .funnelWindowed(ev, windowSec = 3600L).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("funnel_stage")).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 2L), s"got $out")
  }

  test("orderBacklog: open/close months reconcile, no-line order never " +
    "closes, cumulative backlog exact") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    import spark.implicits._
    val orders = Seq((1L, ts("2024-01-15 00:00:00")),
      (2L, ts("2024-01-20 00:00:00")), (3L, ts("2024-02-10 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq((1L, ts("2024-01-25 00:00:00")),
      (1L, ts("2024-03-05 00:00:00")),  // order 1 closes in March (MAX)
      (2L, ts("2024-02-02 00:00:00")))  // order 2 closes in Feb; 3 never
      .toDF("l_orderkey", "l_shipdate")
    val out = graft.operators.Relational.orderBacklog(orders, li).collect()
      .map(r => (r.getTimestamp(0).toString.take(7),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("2024-01", 2L, 0L, 2L),
      ("2024-02", 1L, 1L, 2L), ("2024-03", 0L, 1L, 1L)), s"got ${out.toSeq}")
  }

  test("lastTouchAttribution: as-of touch wins, horizon is inclusive, " +
    "stale and missing touches fall to __none__, same-instant ordering " +
    "by event_id") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: click then view — the LATER view gets the credit
      (10L, 1L, ts("2024-01-01 08:00:00"), "click", 0.0),
      (11L, 1L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (12L, 1L, ts("2024-01-01 10:00:00"), "purchase", 10.0),
      // user 2: touch EXACTLY at the 12 h horizon — inclusive, credited
      (20L, 2L, ts("2024-01-01 00:00:00"), "signup", 0.0),
      (21L, 2L, ts("2024-01-01 12:00:00"), "purchase", 20.0),
      // user 3: touch one second beyond the horizon → __none__
      (30L, 3L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (31L, 3L, ts("2024-01-01 12:00:01"), "purchase", 40.0),
      // user 4: no touch at all (errors are not touches) → __none__
      (40L, 4L, ts("2024-01-01 09:00:00"), "error", 0.0),
      (41L, 4L, ts("2024-01-01 10:00:00"), "purchase", 80.0),
      // user 5: touch at the SAME instant as the purchase but a LOWER
      // event_id sorts strictly before → credited
      (50L, 5L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (51L, 5L, ts("2024-01-01 10:00:00"), "purchase", 160.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.operators.Sessionize.lastTouchAttribution(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(
      "view" -> ((1L, 10.0)),      // user 1, view beat the earlier click
      "signup" -> ((1L, 20.0)),    // user 2, inclusive horizon
      "click" -> ((1L, 160.0)),    // user 5, same-instant tiebreak
      "__none__" -> ((2L, 120.0))  // users 3 (stale) + 4 (no touch)
    ))
    // credited + unattributed reconcile to the conversion count
    val conv = graft.operators.Sessionize.lastTouchAttribution(
      Tables.events(spark, sf0))
    assert(conv.agg(sum(col("n_conversions"))).head.getLong(0) ==
      Tables.events(spark, sf0)
        .filter(col("event_type") === "purchase").count())
  }

  test("multiTouchAttribution: ppm credits reconcile to exactly 1e6 per " +
    "conversion under every model; path splits match hand computation") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: click 2 h before, view 1 h before → n=2
      (10L, 1L, ts("2024-01-01 08:00:00"), "click", 0.0),
      (11L, 1L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (12L, 1L, ts("2024-01-01 10:00:00"), "purchase", 10.0),
      // user 4: conversion with NO touches → full-credit null row
      (40L, 4L, ts("2024-01-01 09:00:00"), "error", 0.0),
      (41L, 4L, ts("2024-01-01 10:00:00"), "purchase", 80.0),
      // user 6: 4 touches → U-shape 400000/100000/100000/400000
      (60L, 6L, ts("2024-01-01 06:00:00"), "click", 0.0),
      (61L, 6L, ts("2024-01-01 07:00:00"), "view", 0.0),
      (62L, 6L, ts("2024-01-01 08:00:00"), "view", 0.0),
      (63L, 6L, ts("2024-01-01 09:00:00"), "signup", 0.0),
      (64L, 6L, ts("2024-01-01 10:00:00"), "purchase", 1.0),
      // user 7: two conversions — each claims only its own segment
      (70L, 7L, ts("2024-01-01 08:00:00"), "click", 0.0),
      (71L, 7L, ts("2024-01-01 09:00:00"), "purchase", 1.0),
      (72L, 7L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (73L, 7L, ts("2024-01-01 11:00:00"), "purchase", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.operators.Sessionize.multiTouchAttribution(ev).collect()
    def rowsOf(conv: Long) = out.filter(_.getAs[Long]("conv_event_id") == conv)
    // user 1: linear 500000/500000; decay weights 2^28 (2 h) vs 2^29
    // (1 h): floors 333333 + 666666, remainder 1 → the LAST touch
    val u1 = rowsOf(12L).map(r => r.getAs[Long]("touch_event_id") ->
      ((r.getAs[Long]("linear_ppm"), r.getAs[Long]("decay_ppm"),
        r.getAs[Long]("position_ppm")))).toMap
    assert(u1 == Map(10L -> ((500000L, 333333L, 500000L)),
      11L -> ((500000L, 666667L, 500000L))))
    // user 4: null-touch full credit
    val u4 = rowsOf(41L)
    assert(u4.length == 1 && u4.head.isNullAt(1) &&
      u4.head.getAs[Long]("linear_ppm") == 1000000L &&
      u4.head.getAs[Long]("n_touches") == 0L)
    // user 6 U-shape
    val u6 = rowsOf(64L).map(r => r.getAs[Long]("touch_event_id") ->
      r.getAs[Long]("position_ppm")).toMap
    assert(u6 == Map(60L -> 400000L, 61L -> 100000L, 62L -> 100000L,
      63L -> 400000L))
    // user 7 segmentation: each conversion sees one touch
    assert(rowsOf(71L).map(_.getAs[Long]("touch_event_id")).toSeq == Seq(70L))
    assert(rowsOf(73L).map(_.getAs[Long]("touch_event_id")).toSeq == Seq(72L))
    // corpus-level reconciliation at sf0: every conversion sums to
    // EXACTLY 1e6 under every model, and every purchase appears
    val full = graft.operators.Sessionize.multiTouchAttribution(
      Tables.events(spark, sf0))
    val sums = full.groupBy(col("conv_event_id"))
      .agg(sum(col("linear_ppm")).as("l"), sum(col("decay_ppm")).as("d"),
        sum(col("position_ppm")).as("p"))
    assert(sums.filter(col("l") =!= 1000000L || col("d") =!= 1000000L ||
      col("p") =!= 1000000L).count() == 0)
    assert(sums.count() == Tables.events(spark, sf0)
      .filter(col("event_type") === "purchase").count())
  }

  test("valueAnomalies: planted outlier flagged, tight distributions " +
    "silent, degenerate types safe") {
    import java.sql.Timestamp
    def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)
    val base = (0 until 50).map(i =>
      (i.toLong, ts(i), "click", 100.0 + (i % 5))) // tight cluster
    val ev = (base :+
      (99L, ts(99), "click", 100000.0) :+     // the planted outlier
      (200L, ts(200), "lonely", 42.0))        // n = 1 type: no std
      .toDF("event_id", "ts", "event_type", "value")
    val out = Relational.valueAnomalies(ev).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(99L),
      s"expected exactly the planted outlier, got ${out.toSeq}")
    assert(math.abs(out.head.getAs[Double]("z")) > 3.0)
    // all-identical values: std = 0 → nothing can deviate, no division
    val flat = (0 until 10).map(i => (i.toLong, ts(i), "flat", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
    assert(Relational.valueAnomalies(flat).count() == 0)
    // two identical 1.06 rows: the string→double bridge rounds the
    // exactly-zero variance to -4.4e-16; unclamped, sqrt gives NaN and
    // Spark's NaN ordering makes std > 0 TRUE, flagging both rows
    val neg = Seq((0L, ts(0), "dup", 1.06), (1L, ts(1), "dup", 1.06))
      .toDF("event_id", "ts", "event_type", "value")
    assert(Relational.valueAnomalies(neg).count() == 0)
  }

  test("lengthQuantiles: exact type-7 values on fractional positions, " +
    "independent of partitioning; degenerate single-row input") {
    import spark.implicits._
    // n = 13 → p90 position = 10.8: rem 8/10, true fractional interpolation
    val lens = Seq(3L, 17L, 5L, 29L, 11L, 7L, 2L, 23L, 13L, 19L, 31L, 37L, 41L)
    // the CONTRACT formula: exact integer position arithmetic, one
    // double division — v(i)*(1-f)+v(i+1)*f double math drifts a ulp
    // (0.9*12 = 10.8 is inexact) and is exactly what the operator avoids
    def t7(num: Long, den: Long, s: Seq[Long]): Double = {
      val v = s.sorted; val posNum = (v.length - 1) * num
      val i = (posNum / den).toInt; val rem = posNum % den
      (v(i) * (den - rem) + v(math.min(i + 1, v.length - 1)) * rem).toDouble / den
    }
    for (parts <- Seq(1, 7)) {
      val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("doc_id", "n_chars").repartition(parts)
      val r = Relational.lengthQuantiles(docs).collect().head
      for ((c, num, den) <- Seq(("p25", 1L, 4L), ("p50", 1L, 2L),
        ("p75", 3L, 4L), ("p90", 9L, 10L)))
        assert(r.getAs[Double](c) == t7(num, den, lens), s"$c at $parts parts")
      assert(r.getAs[Long]("lo") == 2L && r.getAs[Long]("hi") == 41L)
    }
    val one = Seq((0L, 9L)).toDF("doc_id", "n_chars")
    val r1 = Relational.lengthQuantiles(one).collect().head
    assert(Seq("p25", "p50", "p75", "p90").forall(r1.getAs[Double](_) == 9.0))
    // the bounded-domain claim is ENFORCED, not assumed: an over-cap
    // distinct domain aborts loudly with the alternative named (the
    // connPoolState gate discipline) instead of silently sorting the
    // whole domain in one task
    val many = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n_chars")
    val e = intercept[Exception] {
      Relational.lengthQuantiles(many, maxDistinct = 5L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("lengthQuantilesApprox")),
      s"expected the loud domain gate, got: ${msgs(e).take(3)}")
  }

  test("userJourney: same-microsecond events order by the event_id " +
    "tiebreak (the tie the oracle data never exercises)") {
    import java.sql.Timestamp
    val t = new Timestamp(1700000000000L)
    val later = new Timestamp(1700000060000L)
    val ev = Seq(
      // two events at the IDENTICAL timestamp: event_id must decide
      (5L, t, 1L, "b_second"),
      (2L, t, 1L, "a_first"),
      (9L, later, 1L, "c_third"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.Sessionize.userJourney(ev).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("journey") == "a_first>b_second>c_third")
    assert(out.head.getAs[Long]("n_events") == 3L)
  }

  test("retention: first-event-week cohorts, exact offsets, distinct users") {
    import graft.operators.Sessionize
    // 2024-01-01 and 2024-01-08 are Mondays: week boundaries land exactly
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: cohort week W0 (joins Tue), active W0 twice and W2
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 11:00:00")),
      (1L, ts("2024-01-16 09:00:00")),
      // user 2: cohort W0, active W0 only
      (2L, ts("2024-01-07 23:59:59")),
      // user 3: cohort W1, active W1 and W2
      (3L, ts("2024-01-08 00:00:00")), (3L, ts("2024-01-18 12:00:00"))
    ).toDF("user_id", "ts")
    val out = Sessionize.retention(events).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("cohort").toString.take(10),
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, // users 1 and 2 active in their cohort week
      ("2024-01-01", 2L) -> 1L, // user 1 returns two weeks later
      ("2024-01-08", 0L) -> 1L, // user 3's cohort week
      ("2024-01-08", 1L) -> 1L  // user 3 returns the next week
    ))
  }

  test("readability: hand-computed Flesch on known counts, sentence " +
    "floor, wordless NULL") {
    val df = Seq(
      // 2 sentences, 6 words, 7 vowel runs: "the cat sat. it was happy!"
      (1L, "the cat sat. it was happy!"),
      // no terminator -> sentence floor 1; 2 words, 2 runs
      (2L, "hi there"),
      (3L, "123 456 ...")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert((r(1L).getLong(1), r(1L).getLong(2), r(1L).getLong(3)) ==
      ((2L, 6L, 7L)))
    assert(r(1L).getDouble(4) ==
      206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0))
    assert((r(2L).getLong(1), r(2L).getLong(2), r(2L).getLong(3)) ==
      ((1L, 2L, 3L)))
    assert(r(3L).isNullAt(4), "wordless document must score NULL")
  }

  test("gopherGates: each rule isolated by a targeted fixture doc, " +
    "conjunction only passes the clean one") {
    // doc 1 passes everything (60 words, mean len in [3,10], 2 stopwords);
    // doc 2 fails word count (3 words); doc 3 fails mean word length
    // (one 60-char word... padded to clear the word-count gate);
    // doc 4 fails alpha fraction + stopwords (numbers)
    val clean = (Seq.fill(29)("the cats") :+ "of does").mkString(" ")
    val longw = (Seq.fill(60)("a" * 20) ++ Seq.fill(0)("x")).mkString(" ")
    val nums = (1 to 60).map(_.toString).mkString(" ")
    val df = Seq((1L, clean), (2L, "too few words"), (3L, longw),
      (4L, nums)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherGates(df).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("1_word_count") == ((3L, 1L)), s"got $r")
    assert(r("2_mean_word_len")._2 >= 1L, s"got $r") // longw fails
    assert(r("3_alpha_word_frac") == ((3L, 1L)), s"got $r") // nums fail
    assert(r("4_stopword_hits")._1 == 1L, s"got $r") // only clean has 2
    assert(r("6_all") == ((1L, 3L)), s"got $r")
  }

  test("pii scrub: case-insensitive, hex ids redacted before digit runs") {
    val df = Seq(
      (1L, "mail Alice.Smith@Example.COM now"),
      (2L, "id deadbeef00001111cafe ok"),
      (3L, "HEX DEADBEEF00001111CAFE ok"),
      (4L, "pin 1234")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(df).as[(Long, String, Long)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r(1L) == "mail <EMAIL> now")
    assert(r(2L) == "id <HEX> ok")   // not fragmented by the digit rule
    assert(r(3L) == "HEX <HEX> ok")  // uppercase hex caught
    assert(r(4L) == "pin <NUM>")     // tag longer than input → delta -1 ok
  }

  test("tokenizerFertility: hand counts exact — punctuation splits " +
    "raise fertility, truncating x1000 ratios") {
    // "ab cd": 2 words, 2 subwords → fertility 1000
    // "a-b x1": 2 words, 5 subwords (a,-,b,x,1) → 2500
    val df = Seq(("en", "ab cd"), ("de", "a-b x1")).toDF("lang", "text")
    val out = TextAnalysis.tokenizerFertility(df).collect().toSeq
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(out == Seq(("de", 2L, 5L, 2500L), ("en", 2L, 2L, 1000L)),
      s"got $out")
  }

  test("htmlStripRoundTrip: text containing & < > and tag-like spans " +
    "survives the wire exactly; every doc recovers") {
    val df = Seq(
      ("a", "plain words"),
      ("a", "math: 1 < 2 && 3 > 2"),
      ("a", "literal <b>not a tag</b> & &amp; already-escaped"),
      ("b", "x")).toDF("source", "text")
    val out = TextAnalysis.htmlStripRoundTrip(df).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out == Seq(("a", 3L, 3L), ("b", 1L, 1L)), s"got $out")
  }

  test("piiReport: counts ride the scrub cascade — digits inside a hex " +
    "id never double-book as a digit run; flagged share exact ppm") {
    val df = Seq(
      ("a", "mail bob@x.com and carol@y.org plus id deadbeef00001111cafe"),
      ("a", "pin 1234 and 5678"),
      ("a", "all clean here"),
      ("b", "nothing to see")).toDF("source", "text")
    val out = TextAnalysis.piiReport(df).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // source a: 2 emails, 1 hex (its 00001111 must NOT count as a
    // digit run), 2 digit runs, 2 of 3 docs flagged
    assert(out == Seq(
      ("a", 3L, 2L, 1L, 2L, 2L, 666666L),
      ("b", 1L, 0L, 0L, 0L, 0L, 0L)), s"got $out")
  }

  test("groupQuantiles: every group's quartiles equal a local type-7 " +
    "replay on the sorted cents, fractional positions included") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf0)
    val out = graft.operators.Relational.groupQuantiles(orders).collect()
    val local = orders
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.map(_.getString(0)).toSeq == local.keys.toSeq.sorted)
    def q7(vs: Array[Long], num: Long, den: Long): Double = {
      val pos = (vs.length - 1) * num
      val k = (pos / den).toInt; val rem = pos % den
      (vs(k) * (den - rem) +
        vs(math.min(k + 1, vs.length - 1)) * rem).toDouble / den
    }
    out.foreach { r =>
      val vs = local(r.getString(0))
      assert(r.getLong(1) == vs.length)
      Seq((2, 1L, 4L), (3, 1L, 2L), (4, 3L, 4L), (5, 9L, 10L))
        .foreach { case (i, num, den) =>
          assert(r.getDouble(i) == q7(vs, num, den),
            s"grp ${r.getString(0)} q$num/$den")
        }
      assert(r.getLong(6) == vs.head && r.getLong(7) == vs.last)
    }
  }

  test("fuzzyJoin bounded buckets: Fail aborts naming the op on a hot " +
    "segment bucket; Drop completes with bounded work") {
    import graft.operators.BucketOverflow
    // 70 names sharing every segment shape ("prefixNN" differ only in
    // the last 2 chars → identical first segment) overflow maxBucket=8
    val names = (0 until 70).map(i => f"commonprefix$i%02d")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
    val ex = intercept[Exception] {
      graft.operators.Relational.fuzzyJoin(df, d = 2, maxBucket = 8,
        overflow = BucketOverflow.Fail).collect()
    }
    assert(ex.getMessage != null || ex.getCause != null) // job-level abort
    val dropped = graft.operators.Relational.fuzzyJoin(df, d = 2,
      maxBucket = 8, overflow = BucketOverflow.Drop).collect()
    // Drop keeps only pairs whose SOME shared bucket stayed under cap —
    // bounded work; with every bucket hot the result may be empty, but
    // the query must complete
    assert(dropped.length >= 0)
  }

  test("scd2: change points open versions, NULL attr is a real state " +
    "(NULL→NULL does not re-open), valid_to chains to the next " +
    "valid_from, last version is current") {
    import org.apache.spark.sql.functions._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      (1L, ts(1), 10L, Some("a")),
      (1L, ts(2), 11L, Some("a")),   // same state — no new version
      (1L, ts(3), 12L, None),        // a → NULL opens v2
      (1L, ts(4), 13L, None),        // NULL → NULL must NOT open
      (1L, ts(5), 14L, Some("a")),   // NULL → a opens v3
      (2L, ts(1), 20L, None)         // head with NULL attr opens v1
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Relational.scd2(df).collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
    assert(u1.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("a"), None, Some("a")))
    // half-open chaining: each valid_to equals the next valid_from
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(3) == b.getTimestamp(2))
    }
    assert(u1.last.getTimestamp(3) == null && u1.last.getBoolean(5))
    assert(u1.init.forall(!_.getBoolean(5)))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getString(1) == null &&
      u2.head.getBoolean(5))
  }

  test("priceHistogram: buckets partition the rows, every row's bucket " +
    "replays locally, bounds nest inside bucket edges") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf0)
    val out = graft.operators.Relational.priceHistogram(orders, nb = 16)
      .collect()
    val cents = orders
      .select((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(_.getLong(0))
    assert(out.map(_.getLong(1)).sum == cents.length)
    val lo = cents.min; val hi = cents.max
    val local = cents.groupBy(c => (c - lo) * 16 / (hi - lo + 1))
    assert(out.map(_.getLong(0)).toSet == local.keySet)
    out.foreach { r =>
      val b = r.getLong(0); val vs = local(b)
      assert(r.getLong(1) == vs.length)
      assert(r.getLong(2) == vs.min && r.getLong(3) == vs.max)
    }
  }

  test("searchRank: scores replay locally (linear idf, fixed-order FP), " +
    "rare terms dominate, top-k ordered by (score desc, doc_id)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0)
    val terms = Seq("data", "line", "dup")
    val out = graft.operators.Corpus.searchRank(docs, terms, k = 20).collect()
    assert(out.length == 20)
    // local replay
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = rows.length.toDouble
    val df = terms.map(t => t -> rows.count(_._2.contains(t)).toDouble).toMap
    val scores = rows.map { case (id, toks) =>
      val tf = terms.map(t => t -> toks.count(_ == t).toLong).toMap
      val s = terms.map(t => tf(t) * n / df(t)).reduce(_ + _)
      (id, tf, s)
    }
    val topLocal = scores.sortBy { case (id, _, s) => (-s, id) }.take(20)
    out.zip(topLocal).foreach { case (r, (id, tf, s)) =>
      assert(r.getLong(0) == id)
      terms.zipWithIndex.foreach { case (t, i) =>
        assert(r.getLong(1 + i) == tf(t), s"tf_$t of doc $id")
      }
      assert(r.getDouble(1 + terms.length) == s, s"score of doc $id")
    }
    // the rare term must dominate: every top-20 doc contains 'dup'
    // (df 25 vs ~380 — one dup occurrence outweighs any tf of the rest)
    assert(out.forall(_.getLong(3) > 0),
      "a dup-free doc cracked the top-20 — idf weighting is broken")
  }

  test("fuzzyJoin: PassJoin candidates are COMPLETE vs naive all-pairs " +
    "levenshtein — substitutions, indels (which break naive half-split " +
    "blocking), short names, and no false pairs") {
    import org.apache.spark.sql.functions._
    // local DP levenshtein as independent ground truth
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    // indel pairs shift all downstream positions — the cases a naive
    // per-string half-split equi-join misses; plus short names (< d+1
    // chars, the fallback bucket) and deliberate non-matches
    val names = Seq("abcdefgh", "abdefgh", "xabcdefgh", "abcdefzh",
      "hello there", "hello theer", "ab", "b", "zzzzzzzz",
      "completely different")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
    val out = graft.operators.Relational.fuzzyJoin(df, d = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val expect = (for {
      a <- names; b <- names if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd.toLong)).toSet
    assert(out == expect,
      s"missing=${expect -- out} spurious=${out -- expect}")
    // duplicate-name rows roll up into the dictionary counts
    val dup = (df.as[(Long, String)].collect().toSeq ++
      Seq((99L, "abcdefgh"))).toDF("p_partkey", "p_name")
    val withCounts = graft.operators.Relational.fuzzyJoin(dup, d = 2)
      .filter(col("name_a") === "abcdefgh" || col("name_b") === "abcdefgh")
      .collect()
    assert(withCounts.nonEmpty)
    withCounts.foreach { r =>
      val nA = r.getLong(3); val nB = r.getLong(4)
      if (r.getString(0) == "abcdefgh") assert(nA == 2L) else assert(nB == 2L)
    }
  }

  test("sampleWeighted: the exact integer threshold decides membership, " +
    "long docs oversampled vs short, repartition-stable") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0)
    val out = graft.operators.Corpus.sampleWeighted(docs, denom = 400)
      .collect()
    // replay the threshold per doc: md5_28(id)*400 < n_tokens << 28
    val expect = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (id, n) =>
        java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            id.toString).substring(0, 7), 16) * 400L < (n << 28)
      }.map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet == expect)
    assert(out.nonEmpty && out.length < docs.count())
    out.foreach { r =>
      assert(r.getLong(2) == math.min(r.getLong(1), 400L)) // p_num
      assert(r.getLong(3) == 400L)
    }
    // size bias: the mean token count of sampled docs must exceed the
    // corpus mean (that is the point of weighting by length)
    val allN = docs.select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0))
    val sampleMean = out.map(_.getLong(1)).sum.toDouble / out.length
    assert(sampleMean > allN.sum.toDouble / allN.length)
    val reparted = graft.operators.Corpus
      .sampleWeighted(docs.repartition(11), denom = 400).collect()
    assert(reparted.toSeq == out.toSeq)
  }

  test("invertedIndex: rarest-k selection, exact df/tf, and the digest " +
    "matches a locally rebuilt doc-ordered posting list") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0)
    val out = graft.operators.Corpus.invertedIndex(docs, k = 5).collect()
    assert(out.length == 5)
    // ground truth postings from a local replay
    val toks = docs.select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (t, r.getLong(0))))
    val tf = toks.groupBy(identity).view.mapValues(_.length).toMap
    val byTok = tf.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val dfMap = byTok.view.mapValues(_.length).toMap
    val rarest = dfMap.toSeq.sortBy { case (t, d) => (d, t) }.take(5)
    // selection is rarest-(df, tok); presentation order is tok
    assert(out.map(_.getString(0)).toSeq == rarest.map(_._1).sorted)
    out.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == dfMap(t).toLong, s"df of $t")
      assert(r.getLong(2) ==
        byTok(t).map(d => tf((t, d)).toLong).sum, s"tf_total of $t")
      val csv = byTok(t).map(d => s"$d:${tf((t, d))}").mkString(",")
      assert(r.getString(3) ==
        org.apache.commons.codec.digest.DigestUtils.md5Hex(csv),
        s"postings digest of $t")
    }
  }

  test("priceNtiles: bands partition each flag (extras in the first " +
    "n mod k bands), ranges tile the price axis in order") {
    val li = Tables.lineitem(spark, sf0)
    val out = Relational.priceNtiles(li).collect()
    val totals = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (flag, rows) =>
      val byTile = rows.sortBy(_.getLong(1))
      val sizes = byTile.map(_.getAs[Long]("n_rows"))
      assert(sizes.sum == totals(flag), s"$flag bands lost rows")
      assert(sizes.max - sizes.min <= 1, s"$flag bands unbalanced: ${sizes.toSeq}")
      assert(sizes.sameElements(sizes.sortBy(-_)),
        s"$flag extras not in the leading bands: ${sizes.toSeq}")
      // bands are contiguous price ranges in tile order
      byTile.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("max_price") <= b.getAs[Double]("min_price"),
            s"$flag bands overlap: $a vs $b")
        case _ => ()
      }
    }
  }

  test("sliding windows: every event lands in exactly size/slide " +
    "windows, totals reconcile 3x against tumbling, sums decimal-exact") {
    import graft.operators.Sessionize
    val events = Tables.events(spark, sf0)
    val out = Sessionize.sliding(events).collect()
    // global reconciliation: each event counted once per covering
    // window — exactly 3 for 15min/5min
    assert(out.map(_.getAs[Long]("n_events")).sum == 3 * events.count())
    // every window is 15 min wide and 5-min aligned
    out.foreach { r =>
      val s = r.getAs[java.sql.Timestamp]("win_start").getTime
      val e = r.getAs[java.sql.Timestamp]("win_end").getTime
      assert(e - s == 15 * 60 * 1000L && s % (5 * 60 * 1000L) == 0,
        s"bad window [$s, $e)")
    }
    // hand check: one event at 00:07:30 covers starts 00:05, 00:00, 23:55
    import spark.implicits._
    val one = Sessionize.sliding(Seq(
        (1L, "click", java.sql.Timestamp.valueOf("2024-01-02 00:07:30"), 2.5))
      .toDF("event_id", "event_type", "ts", "value")).collect()
    assert(one.map(_.getAs[java.sql.Timestamp]("win_start").toString).toSet ==
      Set("2024-01-01 23:55:00.0", "2024-01-02 00:00:00.0",
        "2024-01-02 00:05:00.0"))
    assert(one.forall(r => r.getAs[Double]("sum_value") == 2.5))
  }

  test("intervalOverlapJoin: end-exclusive touching excluded, multi-cell " +
    "pairs emitted EXACTLY once (overlap-start-cell rule, no DISTINCT), " +
    "equals the naive inequality join") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, "error", ts(0)),      // A1 [0, 600)
      (2L, "error", ts(250)),    // A2 [250, 850) — spans 3 cells
      (10L, "purchase", ts(590)),// B1 [590, 890) — overlaps A1 by 10s, A2 by 260s (2 shared cells)
      (11L, "purchase", ts(600)),// B2 [600, 900) — touches A1 exactly: NO overlap
      (12L, "purchase", ts(2000))) // B3 far away
      .toDF("event_id", "event_type", "ts")
    val out = Relational.intervalOverlapJoin(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, 10L) -> 10000000L,   // [590, 600)
      (2L, 10L) -> 260000000L,  // [590, 850) — exactly once despite 2 shared cells
      (2L, 11L) -> 250000000L), // [600, 850)
      s"got $out")
    // ≡ the naive inequality join on a bigger surface (sf0 events)
    val events = Tables.events(spark, sf0)
    val fast = Relational.intervalOverlapJoin(events).collect().toSeq
    def iv(t: String, dur: Long) = events
      .filter(col("event_type") === t)
      .select(col("event_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + dur).as("e"))
    val naive = iv("error", 600000000L).as("a")
      .join(iv("purchase", 300000000L).as("b"),
        col("a.s") < col("b.e") && col("b.s") < col("a.e"))
      .select(col("a.event_id").as("a_id"), col("b.event_id").as("b_id"),
        (least(col("a.e"), col("b.e")) -
          greatest(col("a.s"), col("b.s"))).as("overlap_us"))
      .orderBy(col("a_id"), col("b_id")).collect().toSeq
    assert(fast == naive,
      s"bucketed overlap join diverged from naive (${fast.length} vs ${naive.length} rows)")
  }

  test("profileTable: nulls counted, exact distincts, typed min/max " +
    "lanes — and ALL columns profile in ONE scan (Expand, not " +
    "scan-per-distinct)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val li = Seq(
      (1L, 10.0, 100.0, Some(0.1), ts, "A", "F"),
      (2L, 10.0, 200.0, None, ts, "A", "O"),
      (3L, 30.0, 200.0, Some(0.2), ts, "R", "F"))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_shipdate", "l_returnflag", "l_linestatus")
    val out = Relational.profileTable(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate", "l_returnflag", "l_linestatus"))
    val disc = out("l_discount")
    assert(disc.getLong(1) == 3 && disc.getLong(2) == 1 &&
      disc.getLong(3) == 2, "null/distinct accounting broke")
    assert(disc.getDouble(4) == 0.1 && disc.getDouble(5) == 0.2)
    assert(disc.isNullAt(6) && disc.isNullAt(7), "numeric column leaked strings")
    val rf = out("l_returnflag")
    assert(rf.getLong(2) == 0 && rf.getLong(3) == 2)
    assert(rf.isNullAt(4) && rf.isNullAt(5))
    assert(rf.getString(6) == "A" && rf.getString(7) == "R")
    val qty = out("l_quantity")
    assert(qty.getLong(3) == 2 && qty.getDouble(4) == 10.0 &&
      qty.getDouble(5) == 30.0)
    // the scale property: exactly TWO passes — one streaming
    // counts/min/max aggregate, one shared Expand pass for ALL seven
    // exact distincts (hash-aggregated: long-only buffers) — never a
    // per-column re-read, never a sort of the expanded relation
    val plan = Relational.profileTable(Tables.lineitem(spark, sf0))
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.length == 2, s"expected 2 passes, got ${scans.length} scans")
    val planStr = plan.toString
    assert(planStr.contains("Expand"),
      "multi-distinct lost its shared Expand pass")
    assert("Sort \\[gid".r.findFirstIn(planStr).isEmpty &&
      !planStr.contains("SortAggregate(key=[gid"),
      s"expanded relation is being sorted again:\n$planStr")
  }

  test("trailingRangeSum: value-range frames include same-day bursts " +
    "and exclude past-horizon orders — semantics ROWS frames lack") {
    import java.sql.Timestamp
    def o(k: Long, c: Long, d: String, p: Double) =
      (k, c, Timestamp.valueOf(s"$d 00:00:00"), p)
    val fix = Seq(
      o(1L, 7L, "2024-01-01", 10.0),
      o(2L, 7L, "2024-01-01", 20.0),  // same day: shares ONE frame slot
      o(3L, 7L, "2024-01-20", 5.0),   // within 30d of both
      o(4L, 7L, "2024-03-01", 1.0))   // horizon passed: alone
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.trailingRangeSum(fix).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    // RANGE: orders 1 and 2 occupy the same day VALUE, so each sees both
    assert(out(1L) == ((3000L, 2L)) && out(2L) == ((3000L, 2L)),
      s"same-day burst must share a frame: $out")
    assert(out(3L) == ((3500L, 3L)))
    assert(out(4L) == ((100L, 1L)), "past-horizon order must stand alone")
    // corpus: trailing sum ≥ own cents, and the window stays per-customer
    val rows = Relational.trailingRangeSum(Tables.orders(spark, sf0))
      .collect()
    assert(rows.forall(r => r.getLong(4) >= r.getLong(3) &&
      r.getLong(5) >= 1))
  }

  test("activityHeatmap: ISO day-of-week convention pinned (Monday=1), " +
    "cells reconcile to the event count, users deduped per cell") {
    import java.sql.Timestamp
    // 2024-01-01 is a MONDAY; 2024-01-06 a Saturday
    val fix = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:15:00")),
      (1L, Timestamp.valueOf("2024-01-01 09:45:00")), // same user+cell
      (2L, Timestamp.valueOf("2024-01-01 09:59:00")),
      (3L, Timestamp.valueOf("2024-01-06 23:00:00")))
      .toDF("user_id", "ts")
    val out = Relational.activityHeatmap(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map((1L, 9L) -> ((3L, 2L)), (6L, 23L) -> ((1L, 1L))),
      s"got $out")
    val ev = Tables.events(spark, sf0)
    val grid = Relational.activityHeatmap(ev).collect()
    assert(grid.map(_.getLong(2)).sum == ev.count())
    assert(grid.forall(r => (1L to 7L).contains(r.getLong(0)) &&
      (0L to 23L).contains(r.getLong(1)) &&
      r.getLong(3) <= r.getLong(2)))
  }

  test("dauMau: hand-computed two-day month, stickiness = avg_dau/mau, " +
    "corpus actives bounded by user universe") {
    import java.sql.Timestamp
    def t(d: Int, u: Long) = (u, Timestamp.valueOf(f"2024-02-$d%02d 10:00:00"))
    // day 1: users {1,2}; day 2: users {2}; month: mau=2, avg_dau=1.5
    val fix = Seq(t(1, 1L), t(1, 2L), t(1, 2L), t(2, 2L))
      .toDF("user_id", "ts")
    val r = Relational.dauMau(fix).collect()
    assert(r.length == 1)
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getLong(3)) ==
      ((2L, 2L, 3L)))
    assert(r.head.getDouble(4) == 1.5 && r.head.getDouble(5) == 0.75)
    val ev = Tables.events(spark, sf0)
    val out = Relational.dauMau(ev).collect()
    val users = ev.select("user_id").distinct().count()
    out.foreach { row =>
      assert(row.getLong(1) <= users)
      assert(row.getDouble(5) > 0 && row.getDouble(5) <= 1.0,
        "stickiness must be a ratio in (0, 1]")
    }
  }

  test("tfidfKeywords: stopwords self-suppress at df = N, rare tokens " +
    "outrank frequent-but-common ones, rank caps at 3") {
    // "the" in every doc → idf+ 0, never surfaces; "rare" in 1 of 4
    // docs → idf+ bitlen(4)-1 = 2; "mid" in 2 of 4 → idf+ 1
    val fix = Seq(
      (1L, "the the the rare mid"), (2L, "the mid"),
      (3L, "the the"), (4L, "the"))
      .toDF("doc_id", "text")
    val out = graft.operators.Corpus.tfidfKeywords(fix).collect()
      .map(r => (r.getLong(0), r.getString(2)) -> (r.getLong(1), r.getLong(5)))
      .toMap
    assert(!out.keys.exists(_._2 == "the"), "df=N token must score 0")
    // doc 1: rare tf=1 score 2 beats mid tf=1 score 1
    assert(out((1L, "rare")) == ((1L, 2L)) && out((1L, "mid")) == ((2L, 1L)))
    assert(out((2L, "mid")) == ((1L, 1L)))
    val corpus = graft.operators.Corpus
      .tfidfKeywords(Tables.documents(spark, sf0)).collect()
    corpus.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.forall(_.getLong(5) > 0))
    }
  }

  test("markovTransitions: hand-counted journey, conditionals sum to 1 " +
    "per prev state, pair count reconciles to events minus users") {
    import java.sql.Timestamp
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    // user 7: a->b->a->c  ⇒ (a,b) (b,a) (a,c); prev a splits 1/2 1/2
    val fix = Seq((1L, 7L, t(1), "a"), (2L, 7L, t(2), "b"),
      (3L, 7L, t(3), "a"), (4L, 7L, t(4), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Relational.markovTransitions(fix).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))), s"got $out")
    val ev = Tables.events(spark, sf0)
    val m = Relational.markovTransitions(ev).collect()
    val expectedPairs = ev.count() - ev.select("user_id").distinct().count()
    assert(m.map(_.getLong(2)).sum == expectedPairs,
      "transitions must be events minus one per user")
    m.groupBy(_.getString(0)).values.foreach { rows =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9,
        "conditionals must sum to 1 per prev state")
    }
  }

  test("asofJoinTolerance: fresh matches carry, stale NULL like " +
    "no-match but the row stays; reconciles against the ungated as-of") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val fix = Seq(
      (1L, 7L, t("2024-01-01 00:00:00"), "click", 0.0, ""),
      (2L, 7L, t("2024-01-01 02:00:00"), "purchase", 1.0, ""), // fresh 2h
      (3L, 7L, t("2024-01-03 00:00:00"), "purchase", 1.0, ""), // stale 2d
      (4L, 8L, t("2024-01-01 00:00:00"), "purchase", 1.0, "")) // no click
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = Relational.asofJoinTolerance(fix).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(4)), r.getBoolean(5)))).toMap
    assert(out(2L)._3 && out(2L)._2.contains(7200000000L))
    assert(!out(3L)._3 && out(3L)._1.isEmpty && out(3L)._2.isEmpty,
      "stale match must NULL out")
    assert(!out(4L)._3 && out(4L)._1.isEmpty)
    // corpus: gated rows ⊆ ungated as-of rows with staleness ≤ tolerance
    val ev = Tables.events(spark, sf0)
    val gated = Relational.asofJoinTolerance(ev).collect()
    val raw = Relational.asofJoin(ev).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(gated.length == raw.size, "every purchase row must stay")
    gated.foreach { r =>
      val id = r.getLong(0)
      if (r.getBoolean(5)) {
        assert(raw(id).contains(r.getTimestamp(3)))
        assert(r.getLong(4) <= 86400000000L)
      }
    }
    assert(gated.exists(_.getBoolean(5)) && gated.exists(!_.getBoolean(5)),
      "tolerance must split the corpus, not rubber-stamp it")
  }

  test("activityStreaks: gaps break islands, same-day repeats fold, " +
    "histogram tiles the user universe") {
    import java.sql.Timestamp
    def e(u: Long, d: Int) =
      (u, Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"))
    // user 1: days 1,2,3 + 5 (streak 3); user 2: days 1,1,1 (streak 1);
    // user 3: days 2,3 (streak 2)
    val fix = Seq(e(1L, 1), e(1L, 2), e(1L, 3), e(1L, 5),
      e(2L, 1), e(2L, 1), e(2L, 1), e(3L, 2), e(3L, 3))
      .toDF("user_id", "ts")
    val out = Relational.activityStreaks(fix).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $out")
    val ev = Tables.events(spark, sf0)
    val hist = Relational.activityStreaks(ev).collect()
    assert(hist.map(_.getLong(1)).sum ==
      ev.select("user_id").distinct().count())
    assert(hist.forall(_.getLong(0) >= 1L))
  }

  test("chiSquare: independent 2x2 scores zero, a deterministic " +
    "dependence scores the hand value, cells reconcile") {
    // perfectly independent: each (type, arm) cell = 1
    val ind = Seq((0L, "a"), (1L, "a"), (0L, "b"), (1L, "b"))
      .toDF("user_id", "event_type")
    val z = Relational.chiSquare(ind).collect()
    assert(z.forall(_.getDouble(5) == 0.0), "independent table must be 0")
    // complete dependence: type a only arm 0, type b only arm 1 → for
    // a 2x2 with all margins 2 and n=4, chi2 = 4
    val dep = Seq((0L, "a"), (2L, "a"), (1L, "b"), (3L, "b"))
      .toDF("user_id", "event_type")
    val d = Relational.chiSquare(dep).collect()
    assert(d.head.getDouble(5) == 4.0, s"got ${d.head.getDouble(5)}")
    val out = Relational.chiSquare(Tables.events(spark, sf0)).collect()
    assert(out.map(_.getLong(2)).sum == Tables.events(spark, sf0).count())
    assert(out.forall(_.getDouble(5) >= 0))
  }

  test("madOutliers: a gross outlier flags under MAD but drags the " +
    "mean — the robustness the z-score lacks; exact medians in-sample") {
    // values 10.00 ×5 and one 10000.00: median 1000c, MAD 0 → the
    // outlier (ad > 0) flags; median/MAD untouched by the outlier
    val fix = ((1L to 5L).map(i => (i, "x", 10.0)) :+ ((6L, "x", 10000.0)))
      .toDF("event_id", "event_type", "value")
    val r = Relational.madOutliers(fix).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((6L, 1000L, 0L, 1L)), s"got $r")
    val out = Relational.madOutliers(Tables.events(spark, sf0)).collect()
    out.foreach { row =>
      assert(row.getLong(2) > 0 && row.getLong(3) >= 0)
      assert(row.getLong(4) < row.getLong(1) / 2,
        "a robust flag must never mark half the data")
    }
  }

  test("convertingPaths: ordered history with '-' padding, counts " +
    "reconcile to target events") {
    import java.sql.Timestamp
    def e(id: Long, u: Long, s: Int, ty: String) =
      (id, u, Timestamp.valueOf(f"2024-01-01 00:00:$s%02d"), ty)
    val fix = Seq(
      e(1L, 7L, 1, "view"), e(2L, 7L, 2, "click"),
      e(3L, 7L, 3, "purchase"),           // path -:view:click
      e(4L, 8L, 1, "purchase"))           // no history: -:-:-
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Relational.convertingPaths(fix).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("->view>click" -> 1L, "->->-" -> 1L), s"got $out")
    val ev = Tables.events(spark, sf0)
    val paths = Relational.convertingPaths(ev, k = 1000000).collect()
    val purchases = ev.filter(col("event_type") === "purchase").count()
    assert(paths.map(_.getLong(1)).sum == purchases,
      "every purchase must land in exactly one path")
  }

  test("asofNearest: picks the closer side, backward wins ties, no " +
    "match at all reports none; gaps reconcile with the backward as-of") {
    import java.sql.Timestamp
    def e(id: Long, u: Long, t: String, ty: String) =
      (id, u, Timestamp.valueOf(t), ty)
    val fix = Seq(
      e(1L, 7L, "2024-01-01 00:00:00", "click"),
      e(2L, 7L, "2024-01-01 00:00:10", "purchase"), // back 10s, fwd 5s → fwd
      e(3L, 7L, "2024-01-01 00:00:15", "click"),
      e(4L, 7L, "2024-01-01 00:00:25", "purchase"), // back 10s, fwd 10s → back
      e(5L, 7L, "2024-01-01 00:00:35", "click"),
      e(6L, 8L, "2024-01-01 00:00:00", "purchase")) // no click: none
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Relational.asofNearest(fix).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(4)).map(_.toString.toLong), r.getString(5)))).toMap
    assert(out(2L) == ((Some(5000000L), "fwd")), s"got ${out(2L)}")
    assert(out(4L) == ((Some(10000000L), "back")), "ties must go backward")
    assert(out(6L) == ((None, "none")))
    // corpus: every backward match is reachable, so nearest gap ≤ the
    // pure-backward staleness wherever both exist
    val near = Relational.asofNearest(Tables.events(spark, sf0)).collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.toString.toLong)).toMap
    val backOnly = Relational.asofJoinTolerance(Tables.events(spark, sf0),
        toleranceSec = Long.MaxValue / 2000000).collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.toString.toLong)).toMap
    backOnly.foreach { case (id, bg) =>
      (bg, near(id)) match {
        case (Some(b), Some(n)) => assert(n <= b,
          s"event $id: nearest gap $n exceeds backward staleness $b")
        case (Some(_), None) => fail(s"event $id lost its match")
        case _ => ()
      }
    }
  }

  test("snapshotAt: exactly one open version per alive entity, state " +
    "matches replaying events up to T, later-born entities absent") {
    import java.sql.Timestamp
    def e(id: Long, u: Long, d: String, a: String) =
      (id, u, Timestamp.valueOf(s"$d 00:00:00"), a)
    val fix = Seq(
      e(1L, 1L, "2024-01-01", "a"), e(2L, 1L, "2024-01-10", "b"),
      e(3L, 1L, "2024-01-20", "c"),  // after T: must not show
      e(4L, 2L, "2024-01-16", "x"))  // born after T: absent
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Relational.snapshotAt(fix, at = "2024-01-15 00:00:00")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3))))
      .toMap
    assert(out == Map(1L -> (("b", 2L))), s"got $out")
    // corpus: at most one row per user, all versions positive
    val snap = Relational.snapshotAt(Tables.events(spark, sf0)).collect()
    assert(snap.map(_.getLong(0)).distinct.length == snap.length,
      "an entity has two simultaneous versions")
    assert(snap.forall(_.getLong(3) >= 1L))
  }

  test("cohortLtv: hand-computed two-cohort matrix, offset-0 cells " +
    "cover every customer once, corpus cents reconcile") {
    import java.sql.Timestamp
    def o(c: Long, d: String, p: Double) =
      (c, Timestamp.valueOf(s"$d 00:00:00"), p)
    // cust 1: Jan + Mar (offsets 0, 2); cust 2: Mar only (offset 0 of
    // the Mar cohort)
    val fix = Seq(o(1L, "2024-01-05", 10.0), o(1L, "2024-03-01", 5.0),
      o(2L, "2024-03-10", 7.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.cohortLtv(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val jan = 2024L * 12 + 1; val mar = 2024L * 12 + 3
    assert(out == Map((jan, 0L) -> ((1L, 1000L)), (jan, 2L) -> ((1L, 500L)),
      (mar, 0L) -> ((1L, 700L))), s"got $out")
    val ord = Tables.orders(spark, sf0)
    val grid = Relational.cohortLtv(ord).collect()
    // offset-0 actives = distinct customers (everyone starts somewhere)
    assert(grid.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum ==
      ord.select("o_custkey").distinct().count())
    val cents = ord.select(sum((col("o_totalprice")
        .cast("decimal(12,2)") * 100).cast("long"))).collect().head.getLong(0)
    assert(grid.map(_.getLong(3)).sum == cents)
    assert(grid.forall(_.getLong(1) >= 0L))
  }

  test("modeByFlag: ties break toward the smaller value, share exact; " +
    "powerUserShare: hand fixture concentration + corpus bounds") {
    // flag A: 5 appears 2x, 3 appears 2x (tie → 3 wins), 9 once
    val fix = Seq(("A", 5.0), ("A", 5.0), ("A", 3.0), ("A", 3.0),
      ("A", 9.0)).toDF("l_returnflag", "l_quantity")
    val r = Relational.modeByFlag(fix).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 2L, 5L)),
      s"got ${(r.getLong(1), r.getLong(2), r.getLong(3))}")
    assert(r.getDouble(4) == 0.4)
    val corpus = Relational.modeByFlag(Tables.lineitem(spark, sf0)).collect()
    corpus.foreach(row => assert(row.getLong(2) <= row.getLong(3) &&
      row.getDouble(4) > 0))
    // power users: 3 users with 3/2/1 events; top-2 share = 5/6
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"),
      (3L, "a")).toDF("user_id", "event_type")
    val p = Relational.powerUserShare(ev, k = 2).collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) ==
      ((3L, 6L, 2L, 5L)))
    assert(p.getDouble(4) == 5.0 / 6)
    val cp = Relational.powerUserShare(Tables.events(spark, sf0))
      .collect().head
    assert(cp.getLong(2) <= 100L && cp.getLong(3) <= cp.getLong(1))
    assert(cp.getDouble(4) > 0 && cp.getDouble(4) <= 1.0)
  }

  test("conversionLag: pre-signup purchases never convert, unconverted " +
    "users counted, exact 5-second lag recovered") {
    import java.sql.Timestamp
    def e(u: Long, t: String, ty: String) =
      (u, Timestamp.valueOf(t), ty)
    val fix = Seq(
      e(1L, "2024-01-01 00:00:00", "signup"),
      e(1L, "2024-01-01 00:00:05", "purchase"),   // converts, lag 5 s
      e(2L, "2024-01-01 00:00:00", "signup"),     // never buys
      e(3L, "2024-01-01 00:00:05", "purchase"),   // buys BEFORE signing up
      e(3L, "2024-01-01 00:00:10", "signup"),
      e(4L, "2024-01-01 00:00:00", "purchase"))   // never signs up
      .toDF("user_id", "ts", "event_type")
    val r = Relational.conversionLag(fix).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 1L)),
      s"got ${(r.getLong(0), r.getLong(1))}")
    assert(r.getDouble(2) == 5e6 && r.getDouble(3) == 5e6 &&
      r.getDouble(4) == 5e6)
    // corpus sanity: converted ≤ users, percentiles ordered
    val c = Relational.conversionLag(Tables.events(spark, sf0))
      .collect().head
    assert(c.getLong(1) <= c.getLong(0) && c.getLong(1) > 0)
    assert(c.getDouble(2) <= c.getDouble(3) &&
      c.getDouble(3) <= c.getDouble(4))
  }

  test("olsByFlag: a perfect line recovers slope and intercept exactly, " +
    "corpus moments reconcile and slope matches an independent fit") {
    // y = 200x + 300 cents exactly: prices 5.00, 7.00, 9.00 at x=1,2,3
    val fix = Seq(("A", 1.0, 5.0), ("A", 2.0, 7.0), ("A", 3.0, 9.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val r = Relational.olsByFlag(fix).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 6L, 2100L)))
    assert((r.getLong(4), r.getLong(5)) == ((14L, 4600L)))
    assert(r.getDouble(6) == 200.0 && r.getDouble(7) == 300.0)
    // corpus: moments reconcile against direct sums; slope finite
    val li = Tables.lineitem(spark, sf0)
    val out = Relational.olsByFlag(li).collect()
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")),
        count(org.apache.spark.sql.functions.lit(1)))
      .collect().map(r2 => r2.getString(0) -> ((r2.getLong(1), r2.getLong(2))))
      .toMap
    out.foreach { row =>
      assert((row.getLong(2), row.getLong(1)) == direct(row.getString(0)))
      assert(!row.getDouble(6).isNaN && !row.getDouble(7).isNaN)
    }
  }

  test("abTestWelch: hand-computed Welch t on a 2x2 fixture, exact " +
    "moment sums, corpus t-stats finite and arms near-balanced") {
    // arm 0 (even users): 1.00, 3.00; arm 1 (odd): 2.00, 6.00
    val fix = Seq((0L, "x", 1.0), (2L, "x", 3.0), (1L, "x", 2.0),
      (3L, "x", 6.0)).toDF("user_id", "event_type", "value")
    val r = Relational.abTestWelch(fix).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((2L, 2L)))
    assert((r.getLong(3), r.getLong(4)) == ((400L, 800L)))
    assert((r.getLong(5), r.getLong(6)) == ((100000L, 400000L)))
    // t = (400-200)/sqrt(80000/2 + 20000/2), computed the same way
    assert(r.getDouble(7) == 200.0 / math.sqrt(80000.0 / 2 + 20000.0 / 2))
    val out = Relational.abTestWelch(Tables.events(spark, sf0)).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      assert(!row.getDouble(7).isNaN && !row.getDouble(7).isInfinite)
      // parity arms on a uniform user population stay near-balanced
      val (n0, n1) = (row.getLong(1).toDouble, row.getLong(2).toDouble)
      assert(math.abs(n0 - n1) / (n0 + n1) < 0.2, s"arms skewed: $n0/$n1")
    }
  }

  test("cumeStandings: hand-computed fractions on a 3-cell flag, the " +
    "window runs over the aggregated relation, not the raw rows") {
    val fix = Seq(
      ("A", "a", 1L, 1L, 10.0), ("A", "b", 2L, 1L, 20.0),
      ("A", "c", 3L, 1L, 30.0), ("B", "x", 4L, 1L, 5.0))
      .toDF("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber",
        "l_extendedprice")
    val out = Relational.cumeStandings(fix).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    // flag A, 3 cells: pct_rank = 0, 1/2, 1; cume = 1/3, 2/3, 1
    assert(out(("A", "a")) == ((0.0, 1.0 / 3)))
    assert(out(("A", "b")) == ((0.5, 2.0 / 3)))
    assert(out(("A", "c")) == ((1.0, 1.0)))
    // a single-cell partition: percent_rank 0 by convention, cume 1
    assert(out(("B", "x")) == ((0.0, 1.0)))
    // scale shape: the Window sits ABOVE the aggregate (sorts ≤ cells),
    // so the plan has exactly one pre-window aggregation exchange
    val plan = Relational.cumeStandings(Tables.lineitem(spark, sf0))
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val win = plan.collect { case w: WindowExec => w }
    assert(win.nonEmpty, "standings lost the window")
    assert(win.head.collectFirst { case h: HashAggregateExec => h }.nonEmpty,
      "window is not running over the aggregated cell relation")
  }

  test("unpivotMeasures: every measure row-covers the relation, sums " +
    "are decimal-exact, and the reshape is one Expand with no " +
    "pre-aggregation shuffle") {
    val li = Tables.lineitem(spark, sf0)
    val out = Relational.unpivotMeasures(li).collect()
    val n = li.count()
    assert(out.map(_.getLong(2)).sum == 4 * n,
      "4 measures must cover each row exactly once")
    val qty = out.filter(_.getString(1) == "l_quantity")
    assert(qty.map(_.getLong(2)).sum == n)
    // decimal-exact: the melted sum equals the direct decimal sum
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    qty.foreach(r => assert(r.getDouble(5) == direct(r.getString(0))))
    // plan: a single Expand, and the only Exchange feeds the bounded
    // final groupBy (partial aggregation runs before it)
    val planStr = Relational.unpivotMeasures(li)
      .queryExecution.sparkPlan.toString
    assert(planStr.contains("Expand"), "unpivot lost its Expand plan")
    assert("Exchange".r.findAllIn(planStr).length <= 1,
      s"more than the one final-groupBy exchange:\n$planStr")
  }

  test("rfmSegments: reservoir-covered fixture bands exact quintiles, " +
    "grid reconciles to the customer base, repartition-invariant") {
    import java.sql.Timestamp
    // 10 customers, one order each, day i and price i → every metric's
    // sample is the full population; quintile edges are the exact p20/
    // 40/60/80 nearest-rank values (2,4,6,8) and bands are 1..5 pairs.
    // Frequency is constant 1 → every edge is 1, all in band 1.
    val fix = (1 to 10).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-$i%02d 00:00:00"), i * 100.0)
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.rfmSegments(fix).collect()
    assert(out.map(_.getLong(3)).sum == 10)
    // monetary band of customer i: 1+#edges below i*10000 cents
    val mBands = out.map(r => (r.getLong(2), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(mBands == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2),
      s"got $mBands")
    assert(out.forall(_.getLong(1) == 1L), "constant frequency must band 1")
    // recency bands mirror monetary (older = higher band) with the same
    // 2-2-2-2-2 split
    val rBands = out.map(r => (r.getLong(0), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(rBands == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2))
    // corpus: totals reconcile exactly; deterministic under partitioning
    val ord = Tables.orders(spark, sf0)
    val grid = Relational.rfmSegments(ord).collect()
    assert(grid.map(_.getLong(3)).sum ==
      ord.select(col("o_custkey")).distinct().count())
    val exactCents = ord.select(
        sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")))
      .collect().head.getLong(0)
    assert(grid.map(_.getLong(4)).sum == exactCents)
    assert(grid.forall(r => (1L to 5L).contains(r.getLong(0)) &&
      (1L to 5L).contains(r.getLong(1)) && (1L to 5L).contains(r.getLong(2))))
    assert(grid.toSeq == Relational.rfmSegments(ord.repartition(7))
      .collect().toSeq)
  }

  test("benford: structural 9 rows, exact digit counts, ppm reconciles") {
    // first digits: 1 (×2: 12.34, 199.99), 5 (×1), 9 (×1) — digit read
    // from the CENTS string, which equals the amount's first significant
    // digit for any amount >= 0.01
    val ord = Seq(12.34, 199.99, 55.00, 0.09)
      .map(v => (1L, BigDecimal(v))).toDF("o_orderkey", "o_totalprice")
    val out = Relational.benfordAudit(ord).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9))
    val byDigit = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit(1) == 2L && byDigit(5) == 1L && byDigit(9) == 1L)
    assert(out.map(_.getLong(1)).sum == 4L)
    // pct_ppm floors: Σ within 9 of exactly 1e6; dev = pct − benford
    val pctSum = out.map(_.getLong(2)).sum
    assert(pctSum > 1000000L - 9 && pctSum <= 1000000L, s"pct sum $pctSum")
    assert(out.forall(r => r.getLong(4) == r.getLong(2) - r.getLong(3)))
    // the expected table itself sums to ~1e6 (law sanity)
    val bSum = Relational.BenfordPpm.map(_._2).sum
    assert(math.abs(bSum - 1000000L) <= 2, s"benford table sum $bSum")
    // zero-mass digits keep their structural row with n = 0
    assert(byDigit(7) == 0L)
  }

  test("topBuyers: HAVING filter exact, ordering and limit hold") {
    val li = Tables.lineitem(spark, sf0)
    val out = Relational.topBuyers(li, Tables.orders(spark, sf0),
      Tables.customer(spark, sf0), minQty = 100L, topN = 10)
    val rows = out.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    assert(rows.forall(_.getLong(5) > 100L))
    // recompute one survivor's quantity sum directly
    val k = rows.head.getLong(2)
    val direct = li.filter(col("l_orderkey") === k)
      .agg(sum(col("l_quantity").cast("long"))).collect().head.getLong(0)
    assert(direct == rows.head.getLong(5))
    val prices = rows.map(_.getDouble(4))
    assert(prices.sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)), "not sorted by price desc")
  }

  test("round-13 TPC-H batch: plan shapes (semi/anti joins, no division " +
    "in q17's filter) and cross-query reconciliations hold") {
    val li = Tables.lineitem(spark, sf0)
    val ord = Tables.orders(spark, sf0)
    val cust = Tables.customer(spark, sf0)
    // q4 plans the EXISTS as a LEFT SEMI join — no duplicate explosion
    val q4 = Relational.q4OrderPriority(ord, li)
    assert(q4.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "q4's EXISTS did not plan as a semi join")
    // q22 plans the lapsed test as a LEFT ANTI join
    val q22 = Relational.q22SalesOpportunity(cust, ord)
    assert(q22.queryExecution.executedPlan.toString.contains("LeftAnti"),
      "q22's NOT IN did not plan as an anti join")
    // q1 reconciliation: per-group sum_qty / count_order recompose the
    // unfiltered-to-cutoff scan exactly; avgs are exact-quotients
    val q1 = Relational.q1PricingSummary(li).collect()
    assert(q1.nonEmpty)
    val totQty = li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .agg(sum(col("l_quantity").cast("long"))).head.getLong(0)
    assert(q1.map(_.getLong(2)).sum == totQty)
    q1.foreach { r =>
      assert(r.getDouble(7) == r.getLong(2).toDouble / r.getLong(6))
      assert(r.getDouble(8) == r.getDouble(3) / r.getLong(6))
    }
    // q12 high+low reconcile to the late-line join count
    val q12 = Relational.q12LateLines(li, ord).collect()
    val lateTotal = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(q12.map(r => r.getLong(1) + r.getLong(2)).sum == lateTotal)
    // q13 custdist sums to the customer count (left join keeps k = 0)
    val q13 = Relational.q13CustomerDistribution(cust, ord).collect()
    assert(q13.map(_.getLong(1)).sum == cust.count())
    // q8 share is the exact bp quotient and lands in [0, 1]
    Relational.q8MarketShare(li, ord, cust, Tables.supplier(spark, sf0),
      Tables.nation(spark, sf0), Tables.region(spark, sf0),
      Tables.part(spark, sf0)).collect().foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // q17's small-qty filter is the integer cross-multiplied form —
    // no division in any Filter predicate (the final avg_yearly
    // projection legitimately divides once)
    val q17 = Relational.q17SmallQtyRevenue(li, Tables.part(spark, sf0))
    val filters = q17.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString
    }
    assert(filters.nonEmpty && filters.forall(!_.contains("/")),
      s"q17's filter grew a division — cross-multiply doctrine broke:\n" +
        filters.mkString("\n"))
  }

  test("mannWhitneyU / ksTest: hand fixture with ties replays the " +
    "doubled-rank and integer-supremum arithmetic exactly") {
    import spark.implicits._
    // A = [1, 2, 2], B = [2, 3]: value 2 is a 3-way tie spanning both
    // samples — avg rank 3 → doubled 6. R_A = 1 + 3 + 3 = 7, U_A = 1.
    val ev = Seq(("click", 1.0), ("click", 2.0), ("click", 2.0),
      ("purchase", 2.0), ("purchase", 3.0)).toDF("event_type", "value")
    val mw = Relational.mannWhitneyU(ev).collect().head
    assert(mw.getLong(0) == 3L && mw.getLong(1) == 2L)
    assert(mw.getLong(2) == 14L, s"doubled rank sum ${mw.getLong(2)}")
    assert(mw.getLong(3) == 2L, s"doubled U ${mw.getLong(3)}")
    assert(mw.getDouble(4) == 2.0 / 12.0)
    // KS: grid 1,2,3 → c1·n_b − c2·n_a = 2, 3, 0 → D = 3/6 = 0.5
    val ks = Relational.ksTest(ev).collect().head
    assert(ks.getLong(2) == 3L && ks.getDouble(3) == 0.5)
    // identity: U_A + U_B = n_a·n_b (doubled: u2x_a + u2x_b = 2·n_a·n_b)
    val mwB = Relational.mannWhitneyU(ev, typeA = "purchase",
      typeB = "click").collect().head
    assert(mw.getLong(3) + mwB.getLong(3) == 2L * 3L * 2L)
  }

  test("velocityFlag: trailing-window burst counted exactly at the " +
    "boundary, spread-out user unflagged") {
    import graft.operators.Sessionize
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(u: Long, offMs: Long) =
      (new java.sql.Timestamp(t0 + offMs), u)
    // user 1: 22 events inside one 5-min window → burst 22 > 20
    // user 2: 22 events spaced 6 min apart → every window holds 1
    // boundary check: an event exactly windowUs later is OUTSIDE (t−M, t]
    val rows = (0 until 22).map(i => ev(1L, i * 1000L)) ++
      (0 until 22).map(i => ev(2L, i * 360000L)) ++
      Seq(ev(3L, 0L), ev(3L, Sessionize.VelocityWindowUs / 1000L))
    val out = Sessionize.velocityFlag(rows.toDF("ts", "user_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(out(1L) == ((22L, 22L, true)))
    assert(out(2L) == ((22L, 1L, false)))
    // the +300s event must NOT see the t=0 event in its trailing window
    assert(out(3L) == ((2L, 1L, false)), s"boundary ${out(3L)}")
  }

  test("botDetect: metronome flagged, bursty human not, thin users gated") {
    import graft.operators.Sessionize
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, u: Long, offMs: Long) =
      (id, new java.sql.Timestamp(t0 + offMs), u)
    // user 1: exactly 10s gaps ×6 → spread 0 → bot
    // user 2: gaps 1s..600s ×6 → spread huge → human
    // user 3: only 3 gaps → below minGaps, no row
    val rows =
      (0 to 6).map(i => ev(100 + i, 1L, i * 10000L)) ++
        Seq(0L, 1000L, 3000L, 30000L, 90000L, 390000L, 990000L)
          .zipWithIndex.map { case (o, i) => ev(200 + i, 2L, o) } ++
        (0 to 3).map(i => ev(300 + i, 3L, i * 5000L))
    val events = rows.toDF("event_id", "ts", "user_id")
    val out = Sessionize.botDetect(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val bot = out(1L)
    assert(bot.getLong(1) == 6L && bot.getLong(5) == 0L &&
      bot.getBoolean(6), s"bot row $bot")
    val human = out(2L)
    assert(!human.getBoolean(6) && human.getLong(5) > 1000000L,
      s"human row $human")
    // mean is the exact floor div of the µs sum
    assert(human.getLong(4) == 990000000L / 6L)
  }

  test("vocabCoverageCurve: hand-computed head coverage") {
    import graft.operators.Corpus
    // freqs: a=8 b=4 c=2 d=1 (total 15, 4 types)
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Corpus.vocabCoverageCurve(docs, ns = Seq(1, 2)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out(1L) == ((4L, 15L, 8L, 533333L)))
    assert(out(2L) == ((4L, 15L, 12L, 800000L)))
  }

  test("packEfficiency: straddle and tail-pad counted exactly") {
    import graft.operators.Corpus
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words(300), "s1"), (2L, words(300), "s1"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.packEfficiency(docs).collect().head
    // 600 tokens: 2 sequences of 512, tail pad 424, doc 2 straddles
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((2L, 600L, 1L, 2L, 424L, 585937L)), r)
  }

  test("bootstrapCi: CI brackets the mean, nested in the resample " +
    "range, repartition-invariant") {
    val ord = Tables.orders(spark, sf0)
    val r = Relational.bootstrapCi(ord).collect().head
    val (n, mo, lo, hi, mn, mx) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(n == 64L)
    assert(mn <= lo && lo < hi && hi <= mx, s"CI order broke: $r")
    assert(lo <= mo && mo <= hi,
      s"CI [$lo,$hi] does not bracket the observed mean $mo")
    val r2 = Relational.bootstrapCi(ord.repartition(7)).collect().head
    assert(r.toSeq == r2.toSeq, "bootstrap not repartition-invariant")
  }

  test("welchT2: hand-computed t-squared on equal-variance groups") {
    val ev = Seq(("click", 1.00), ("click", 3.00),
      ("purchase", 5.00), ("purchase", 7.00))
      .toDF("event_type", "value")
    val r = Relational.welchT2(ev).collect().head
    // cents: A {100,300} m=200 var=20000; B {500,700} m=600 var=20000
    // t² = 400² / (20000/2 + 20000/2) = 8.0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 400L, 1200L)))
    assert(r.getDouble(4) == -400.0)
    assert(r.getDouble(5) == 8.0, s"t2 ${r.getDouble(5)}")
  }

  test("typeRevenueShare: exact centi-cent money and scaled ppm") {
    val part = Seq((1L, "ECONOMY"), (2L, "SMALL")).toDF("p_partkey", "p_type")
    val li = Seq((1L, 100.00, 0.00), (2L, 300.00, 0.00))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val r = Relational.typeRevenueShare(li, part).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 100.0 && r.getDouble(3) == 400.0)
    // promo_ppm = 1_000_000 div (4_000_000 div 1_000_000) = 250000
    assert(r.getLong(4) == 250000L)
  }

  test("fulfillmentLag: exact lags, SLA ppm, negative-mean sign split") {
    val d = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val ord = Seq((1L, d("2024-01-01"), "1-URGENT"),
      (2L, d("2024-02-01"), "5-LOW"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, d("2024-01-11")),   // +10 (within SLA)
      (1L, d("2024-03-01")),   // +60 (outside)
      (2L, d("2024-01-02")))   // −30 (negative lag)
      .toDF("l_orderkey", "l_shipdate")
    val out = Relational.fulfillmentLag(ord, li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out("1-URGENT") == ((2L, 10L, 60L, 35L, 500000L)))
    // single −30 line: mean must be −30 (truncating sign-split)
    assert(out("5-LOW") == ((1L, -30L, -30L, -30L, 1000000L)))
  }

  test("repeatInterval: exact day gaps, single-purchase customers " +
    "excluded") {
    val d = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val ord = Seq(
      (101L, 1L, d("2024-01-01")), (102L, 1L, d("2024-01-11")),
      (103L, 1L, d("2024-01-31")),
      (201L, 2L, d("2024-03-05")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Relational.repeatInterval(ord).collect()
    assert(out.length == 1)
    val r = out.head
    // gaps 10 and 20 days: n_orders 3, min 10, max 20, span 30, mean 15
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((1L, 3L, 10L, 20L, 30L, 15L)), r)
  }

  test("paretoReport: exact top-N shares on a hand spend distribution") {
    // customers: 1→600.00, 2→300.00, 3→100.00 (total 1000.00)
    val ord = Seq((1L, 400.00), (1L, 200.00), (2L, 300.00), (3L, 100.00))
      .map { case (c, v) => (c, BigDecimal(v)) }
      .toDF("o_custkey", "o_totalprice")
    val out = Relational.paretoReport(ord).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // top-1 = 60000 cents of 100000 → 600000 ppm; top-10/100 = all
    assert(out(1L) == ((3L, 60000L, 100000L, 600000L)), s"${out(1L)}")
    assert(out(10L) == ((3L, 100000L, 100000L, 1000000L)))
    assert(out(100L) == ((3L, 100000L, 100000L, 1000000L)))
  }

  test("linearForecast: exact OLS on a perfect line, declining series " +
    "sign-splits correctly") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(
      (ts(1), "up", 1.00), (ts(2), "up", 2.00), (ts(3), "up", 3.00),
      (ts(1), "down", 3.00), (ts(2), "down", 2.00), (ts(3), "down", 1.00))
      .toDF("ts", "event_type", "value")
    val out = Relational.linearForecast(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val up = out("up")
    // x=0,1,2, y=100,200,300: num=600 den=6 slope=+100/day → forecast 400
    assert(up.getLong(2) == 600L && up.getLong(3) == 6L)
    assert(up.getLong(4) == 3L && up.getLong(5) == 100000L)
    assert(up.getLong(6) == 400L)
    val down = out("down")
    assert(down.getLong(5) == -100000L && down.getLong(6) == 0L)
  }

  test("qualityMix: bands tile each source, structural zero bands") {
    val good = ("the quick brown fox " * 20).trim  // length fine, stopword fine
    val docs = Seq((1L, good, "s1"), (2L, good, "s1"), (3L, "x", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.qualityMix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // 2 sources × 4 structural bands
    assert(out.size == 8)
    assert(out.keys.count(_._1 == "s1") == 4)
    // per-source totals reconcile to the doc counts
    assert(out.filter(_._1._1 == "s1").values.sum == 2L)
    assert(out.filter(_._1._1 == "s2").values.sum == 1L)
    // the one-char junk doc: only the trivial TTR quarter (= 0.25)
    // scores → exactly the q1 band edge (band edges are inclusive-low)
    assert(out(("s2", "q1_mid_low")) == 1L)
    assert(out(("s2", "q0_low")) == 0L)
  }

  test("charClassProfile: classes tile the text exactly, ppm floors") {
    val docs = Seq(
      (1L, "ab 12!", "s1"),   // 2 letters, 2 digits, 1 space, 1 other
      (2L, "xyz", "s1"),      // 3 letters
      (3L, "...", "s2"))      // 3 other
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.charClassProfile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3), s1.getLong(4),
      s1.getLong(5), s1.getLong(6)) == ((2L, 9L, 5L, 2L, 1L, 1L)))
    assert(s1.getLong(7) == 5L * 1000000L / 9L)
    val s2 = out("s2")
    assert(s2.getLong(6) == 3L && s2.getLong(8) == 1000000L)
  }

  test("langIdMargin: ties counted as no-signal, strict wins carry " +
    "margin mass, markerless docs route to unknown") {
    val docs = Seq(
      (1L, "the der x"),        // en/de tie → alphabetical 'de', margin 0
      (2L, "the the and y"),    // en strict: s_en=3, margin 3
      (3L, "zzz qqq"))          // no markers → unknown
      .toDF("doc_id", "text")
    val out = TextAnalysis.langIdMargin(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set("de", "en", "unknown"), out.keySet)
    assert(out("de") == ((1L, 1L, 0L, 0L)), s"de ${out("de")}")
    assert(out("en") == ((1L, 0L, 1L, 3L)), s"en ${out("en")}")
    assert(out("unknown") == ((1L, 0L, 0L, 0L)))
  }

  test("zipfFit: hand-computed bitlen regression on a known head") {
    // counts 8/4/2/1 → ranks 1..4: x = bitlen(rank) = 1,2,2,3;
    // y = bitlen(f) = 4,3,2,1 → n=4 sx=8 sy=10 sxy=17 sxx=18,
    // num = 4·17−80 = −12, den = 4·18−64 = 8, slope = −1500 milli
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 8L && r.getLong(2) == 10L)
    assert(r.getLong(3) == 17L && r.getLong(4) == 18L)
    assert(r.getLong(5) == -12L && r.getLong(6) == 8L)
    assert(r.getLong(7) == -1500L, s"slope ${r.getLong(7)}")
  }

  test("dailyEwma: hand-computed power-of-two chain, head zero-padded") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq((ts(1), "a", 1.00), (ts(2), "a", 2.00), (ts(3), "a", 4.00),
        (ts(1), "b", 7.00))
      .toDF("ts", "event_type", "value")
    val out = Relational.dailyEwma(ev, depth = 3).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getLong(3)))
    // depth 3, scale 4: day1 = 4·100; day2 = 4·200 + 2·100;
    // day3 = 4·400 + 2·200 + 1·100
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 100L, 400L),
      ("a", "2024-01-02", 200L, 1000L),
      ("a", "2024-01-03", 400L, 2100L),
      ("b", "2024-01-01", 700L, 2800L)))
  }

  test("abcClassification: hand-computed 80/95 split, crossing part " +
    "lands in the next class") {
    // one brand, revenues 80/15/5: cum_ppm hits exactly 800000 and
    // 950000 — the <= convention puts each crossing part in its class
    val li = Seq((1L, 80.00, 0.00), (2L, 15.00, 0.00), (3L, 5.00, 0.00))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val part = Seq((1L, "B1"), (2L, "B1"), (3L, "B1"))
      .toDF("p_partkey", "p_brand")
    val out = Relational.abcClassification(li, part).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("B1", "A", 1L, "800000", 800000L),
      ("B1", "B", 1L, "150000", 150000L),
      ("B1", "C", 1L, "50000", 50000L)), out.toSeq)
    // a 90% whale OVERSHOOTS the A cut: it lands in B and class A is
    // empty — the documented <=-crossing convention, not a bug
    val li2 = Seq((1L, 90.00, 0.00), (2L, 10.00, 0.00))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out2 = Relational.abcClassification(li2, part.limit(2)).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out2 == Seq(("B", 1L), ("C", 1L)), out2)
    // discount participates exactly: 100 at 20% off == 80
    val li3 = Seq((1L, 100.00, 0.20), (2L, 15.00, 0.00), (3L, 5.00, 0.00))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val a3 = Relational.abcClassification(li3, part).collect()
      .map(r => (r.getString(1), r.getString(3))).head
    assert(a3 == (("A", "800000")), a3)
  }

  test("theilSen: hand-computed lower median over a gap-filled grid") {
    val ts = (d: Int, i: Int) =>
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d 0$i:00:00")
    // daily counts [3, GAP->0, 3, 6]: slopes -3/1, 0/2, 3/3, 3/1,
    // 3/2, 3/1 — sorted rationals -3 < 0 < 1 < 3/2 < 3 = 3; lower
    // median rank (6+1) div 2 = 3 -> value 1, reported as the
    // gcd-canonical fraction (1,1) since round 15's slope dedup
    val ev = (Seq.fill(3)(1) ++ Seq.fill(3)(3) ++ Seq.fill(6)(4))
      .zipWithIndex.map { case (d, i) => (ts(d, i % 8), "t") }
      .toDF("ts", "event_type")
    val r = Relational.theilSen(ev).collect()
    assert(r.length == 1)
    assert(r.head.toSeq == Seq("t", 4L, 6L, 1L, 1L, 1000000L), r.head)
    // repartition-invariant (rank counting has no order dependence)
    val r2 = Relational.theilSen(ev.repartition(5)).collect()
    assert(r.head.toSeq == r2.head.toSeq)
  }

  test("segmentMigration: hand quartile flows incl. new and gone edges") {
    def o(rows: (Long, String, Double)*) = rows.map { case (k, d, v) =>
      (k, java.sql.Date.valueOf(d), v) }
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    // span 01..10 -> cutoff day 5; h1 spends 10..50, h2 reversed + new
    val orders = o(
      (1L, "2024-01-01", 10.00), (2L, "2024-01-01", 20.00),
      (3L, "2024-01-01", 30.00), (4L, "2024-01-01", 40.00),
      (5L, "2024-01-01", 50.00),
      (1L, "2024-01-09", 40.00), (2L, "2024-01-09", 30.00),
      (3L, "2024-01-09", 20.00), (4L, "2024-01-09", 10.00),
      (6L, "2024-01-10", 5.00))
    val out = Relational.segmentMigration(orders).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("q1", "q4") -> ((1L, 166666L)), ("q1", "q3") -> ((1L, 166666L)),
      ("q2", "q2") -> ((1L, 166666L)), ("q3", "q1") -> ((1L, 166666L)),
      ("q4", "gone") -> ((1L, 166666L)), ("new", "q1") -> ((1L, 166666L))),
      out)
  }

  test("dailyBands: nearest-rank selections over a hand 1..10 series") {
    val ev = (1 to 10).flatMap(d => (1 to d).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-05-$d%02d ${i % 24}%02d:30:00"), "t")))
      .toDF("ts", "event_type")
    val r = Relational.dailyBands(ev).collect().head
    assert(r.toSeq == Seq("t", 10L, 1L, 5L, 9L, 8L), r)
  }

  test("hourlyReach: distinct users per hour, heavy users counted once") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 07:$m%02d:00")
    val ev = Seq((ts(1), 1L), (ts(2), 1L), (ts(3), 2L))
      .toDF("ts", "user_id")
    val r = Relational.hourlyReach(ev).collect().head
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L, r)
  }

  test("errorRate: exact daily ppm, the budget splits days") {
    val ts = (d: Int, i: Int) =>
      java.sql.Timestamp.valueOf(f"2024-04-$d%02d 0$i:00:00")
    // day 1: 1 error of 4 (250000 ppm, over); day 2: 1 of 10 (under)
    val ev = (Seq((ts(1, 1), "error")) ++ (2 to 4).map(i => (ts(1, i), "click")) ++
      Seq((ts(2, 1), "error")) ++ (2 to 10).map(i => (ts(2, i % 10), "view")))
      .toDF("ts", "event_type")
    val out = Relational.errorRate(ev).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq((4L, 1L, 250000L, true),
      (10L, 1L, 100000L, false)), out.toSeq)
  }

  test("freshness: exact microsecond lags and rank, freshest reads 1") {
    val ev = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 11:59:59"), "b"))
      .toDF("ts", "event_type")
    val out = Relational.freshness(ev).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 0L, 1L), ("b", 1000000L, 2L)), out.toSeq)
  }

  test("seasonalDow: a weekly spike lands its whole effect on one dow, " +
    "flat series reads zero everywhere") {
    def ord(rows: Seq[(Int, Int)]) = rows.flatMap { case (d, c) =>
      Seq.fill(c)(Tuple1(java.sql.Date.valueOf(f"2024-01-$d%02d"))) }
      .toDF("o_orderdate")
    // baseline 1/day across Jan 1..14, +7 on the two Thursdays (4, 11):
    // every interior window covers exactly one spike -> trend7 = 14;
    // det = 42 on Thursdays, -7 elsewhere
    val spiky = ord((1 to 14).map(d => (d, 1)) ++ Seq((4, 7), (11, 7)))
    val out = Relational.seasonalDow(spiky).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // 2024-01-04 is a Thursday: Spark dayofweek Thursday = 5
    assert(out(5L) == ((2L, 84L, 6000L)), out)
    (1L to 7L).filter(_ != 5L).filter(out.contains).foreach { dow =>
      assert(out(dow) == ((1L, -7L, -1000L)), s"dow $dow: ${out(dow)}")
    }
    val flat = ord((1 to 14).map(d => (d, 2)))
    assert(Relational.seasonalDow(flat).collect()
      .forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("scd2Upsert: late batch closes currents, appends continuing " +
    "versions, leaves untouched users alone — equals the rebuild") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1 changes in the batch; user 3 does not; user 2 is NEW
    val ev = Seq(
      (ts(1), 1L, 101L, "a"), (ts(2), 1L, 102L, "a"),
      (ts(1), 3L, 301L, "a"),
      (ts(30), 1L, 103L, "b"), (ts(31), 2L, 201L, "c"),
      (ts(30), 3L, 302L, "a"))
      .toDF("ts", "user_id", "event_id", "event_type")
    val cut = ts(20)
    val up = Relational.scd2Upsert(
      Relational.scd2(ev.filter(col("ts") < cut)),
      ev.filter(col("ts") >= cut)).collect().map(_.toSeq)
    val full = Relational.scd2(ev).collect().map(_.toSeq)
    assert(up.toSeq == full.toSeq, "upsert diverged from the rebuild")
    val byUser = up.groupBy(_.head)
    assert(byUser(1L).map(r => (r(1), r(4), r(5))).toSet ==
      Set(("a", 1L, false), ("b", 2L, true)))
    assert(byUser(2L).map(r => (r(1), r(4), r(5))).toSeq ==
      Seq(("c", 1L, true)))
    assert(byUser(3L).map(r => (r(1), r(4), r(5))).toSeq ==
      Seq(("a", 1L, true)), "no-change batch must not touch the row")
  }

  test("runsTest: hand alternating series — exact runs and the shared " +
    "z tree; median ties drop and can degenerate to NULL") {
    val ts = (d: Int, i: Int) =>
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d ${i / 60}%02d:${i % 60}%02d:00")
    def ev(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (ts(d + 1, i), "t")) }.toDF("ts", "event_type")
    // daily [9,1,9,2]: med2 = 2+9 = 11, signs A,B,A,B -> 4 runs of 2/2
    val r = Relational.runsTest(ev(Seq(9, 1, 9, 2))).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("t", 4L, 2L, 2L, 4L)), r)
    // the same tree on the exact integers (n1=n2=2, n=4, runs=4)
    val mu = 1.0 + (2.0 * 2 * 2) / 4
    val vr = ((2.0 * 2 * 2) * ((2.0 * 2 * 2) - 4)) / ((4.0 * 4) * (4 - 1.0))
    assert(r.getDouble(5) == (4.0 - mu) / math.sqrt(vr), r.getDouble(5))
    // [1,3,2,2]: med2 = 4 — both y=2 days TIE and drop; the 1-vs-1
    // remainder trips the variance guard -> NULL z
    val rt = Relational.runsTest(ev(Seq(1, 3, 2, 2))).collect().head
    assert((rt.getLong(2), rt.getLong(3), rt.getLong(4)) == ((1L, 1L, 2L)))
    assert(rt.isNullAt(5), rt)
  }

  test("pkAudit: a clean key reads unique, duplicates and nulls are " +
    "counted exactly") {
    val clean = Seq(1L, 2L, 3L).toDF("id")
    val dirty = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("id")
    val out = Relational.pkAudit(Seq(
      ("a.clean", clean, "CAST(id AS STRING)"),
      ("b.dirty", dirty, "CAST(id AS STRING)"))).collect()
    assert(out(0).toSeq == Seq("a.clean", 3L, 3L, 0L, 0L, 0L, true))
    // dirty: 5 rows, 2 distinct non-null keys, key 1 dup (2 excess
    // rows), 1 null row
    assert(out(1).toSeq == Seq("b.dirty", 5L, 2L, 1L, 2L, 1L, false))
  }

  test("interpolateDaily: exact interior fill, truncating negative " +
    "slope, non-divisible steps floor toward zero") {
    def ord(rows: (String, Double)*) = rows.map { case (d, v) =>
      (java.sql.Date.valueOf(d), v) }.toDF("o_orderdate", "o_totalprice")
    // ascending 100 -> 400 over 3 days: gaps read 200, 300 exactly
    val up = Relational.interpolateDaily(ord(
      ("2024-01-01", 1.00), ("2024-01-04", 4.00))).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getBoolean(2)))
    assert(up.toSeq == Seq(
      ("2024-01-01", 100L, false), ("2024-01-02", 200L, true),
      ("2024-01-03", 300L, true), ("2024-01-04", 400L, false)), up.toSeq)
    // descending with a non-divisible step: slope -100/3 truncates
    // toward zero on both engines (sign-split): 400, 367, 334, 300
    val dn = Relational.interpolateDaily(ord(
      ("2024-01-01", 4.00), ("2024-01-04", 3.00))).collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    assert(dn.toSeq == Seq((400L, false), (367L, true), (334L, true),
      (300L, false)), dn.toSeq)
  }

  test("hourlyProfile: completed 24-hour grid, exact shares, " +
    "deterministic peak") {
    val ev = (Seq.fill(3)(1) ++ Seq(2)).map(h =>
      (java.sql.Timestamp.valueOf(f"2024-01-05 $h%02d:30:00"), "a"))
      .toDF("ts", "event_type")
    val out = Relational.hourlyProfile(ev).collect()
    assert(out.length == 24)
    val byHour = out.map(r => r.getLong(1) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(byHour(1L) == ((3L, 750000L, true)))
    assert(byHour(2L) == ((1L, 250000L, false)))
    assert(byHour(0L) == ((0L, 0L, false)))
    assert(out.count(_.getBoolean(4)) == 1, "exactly one peak hour")
  }

  test("concurrency: overlapping sessions stack, midnight crossers " +
    "re-enter the next day carrying their concurrency") {
    import graft.operators.Sessionize
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (ts("2024-01-01 10:00:00"), 1L),   // s1: [10:00, 10:30)
      (ts("2024-01-01 10:10:00"), 2L),   // s2: [10:10, 10:40) — overlap
      (ts("2024-01-01 23:50:00"), 3L))   // s3: [23:50, 00:20 next day)
      .toDF("ts", "user_id")
    val out = Sessionize.concurrency(ev).collect()
      .map(r => (r.getTimestamp(0).toString.take(10),
        r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 3L, 2L),   // s1+s2 stack to 2; s3 alone later
      ("2024-01-02", 1L, 1L)),  // s3 re-enters at midnight
      out.toSeq)
  }

  test("dispersionIndex: constant series reads 0 ppm, a bursty one the " +
    "exact hand ratio, gap days count as zeros") {
    val ts = (d: Int, i: Int) =>
      java.sql.Timestamp.valueOf(f"2024-02-$d%02d 0$i:00:00")
    // constant: 2 events/day over 3 days -> var 0
    val flat = (1 to 3).flatMap(d => Seq((ts(d, 1), "a"), (ts(d, 2), "a")))
      .toDF("ts", "event_type")
    val rf = Relational.dispersionIndex(flat).collect().head
    assert(rf.toSeq == Seq("a", 3L, 6L, 0L), rf)
    // bursty with an INTERIOR gap day (grid zero): counts [4, 0, 1]
    // -> S=5, Q=17, n=3 -> ((3*17 - 25)*1e6) div (2*5) = 2600000
    val b2 = ((1 to 4).map(i => (ts(1, i), "b")) :+ (ts(3, 5), "b"))
      .toDF("ts", "event_type")
    val rb = Relational.dispersionIndex(b2).collect().head
    assert(rb.toSeq == Seq("b", 3L, 5L, 2600000L), rb)
  }

  test("eventValueDrift: identical weeks read zero, disjoint buckets " +
    "read the exact hand TV") {
    def ev(rows: Seq[(String, Double)]) = rows.map { case (d, v) =>
      (java.sql.Timestamp.valueOf(s"$d 10:00:00"), "t", v)
    }.toDF("ts", "event_type", "value")
    // both weeks carry the global mix exactly -> TV = 0
    val same = ev(Seq(("2024-01-01", 0.01), ("2024-01-02", 0.02),
      ("2024-01-08", 0.01), ("2024-01-09", 0.02)))
    val r0 = Relational.eventValueDrift(same).collect()
    assert(r0.length == 2 && r0.forall(_.getLong(3) == 0L), r0.toSeq)
    // bucket-disjoint weeks: TV = 1/2 exactly -> 500000 ppm, and the
    // bucket the week never hit still contributes (n_buckets = 1)
    val skew = ev(Seq(("2024-01-01", 0.01), ("2024-01-02", 0.01),
      ("2024-01-08", 0.02), ("2024-01-09", 0.02)))
    val r1 = Relational.eventValueDrift(skew).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r1.toSeq == Seq((2L, 1L, 500000L), (2L, 1L, 500000L)), r1.toSeq)
  }

  test("leveneBrownForsythe: hand-computed doubled-median deviations " +
    "and F; equal-variance fixture reads F = 0") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(rows: Seq[(String, Double)]) =
      rows.map { case (t, v) => (ts, t, v) }.toDF("ts", "event_type", "value")
    // click cents [100,200,300] -> med2 400, z [200,0,200];
    // view cents [100,500] -> med2 600, z [400,400]
    val e = ev(Seq(("click", 1.00), ("click", 2.00), ("click", 3.00),
      ("view", 1.00), ("view", 5.00)))
    val r = Relational.leveneBrownForsythe(e).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
    // the same fixed tree the operator uses, on the hand z-sums
    val sb = (400.0 * 400.0) / 3 + (800.0 * 800.0) / 2 -
      (1200.0 * 1200.0) / 5
    val sw = (80000.0 + 320000.0) - ((400.0 * 400.0) / 3 + (800.0 * 800.0) / 2)
    assert(math.abs(r.getDouble(2) - sb) < 1e-9, s"ssb ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - sw) < 1e-9, s"ssw ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - (sb / 1.0) / (sw / 3.0)) < 1e-9)
    // both groups with IDENTICAL deviation profiles (and nonzero
    // within-group spread — an all-equal-z fixture reads SSW = 0 and
    // F degenerates to NULL): SSB cancels exactly, F = 0.0
    val eq = ev(Seq(("click", 1.00), ("click", 2.00), ("click", 3.00),
      ("view", 1.00), ("view", 2.00), ("view", 3.00)))
    val r2 = Relational.leveneBrownForsythe(eq).collect().head
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(4) == 0.0,
      s"SSB ${r2.getDouble(2)} F ${r2.getDouble(4)}")
  }

  test("kendallTau: perfect concordance reads tau 1, ties surface " +
    "doubled, fully-tied axis yields NULL") {
    // bitlen cells: counts 1/3/7 -> x = 1/2/3, spends 100/1000/10000
    // cents -> y = 7/10/14: three strictly concordant customers
    def orders(rows: Seq[(Long, Double)]) =
      rows.toDF("o_custkey", "o_totalprice")
    // cust1 one order of 1.00; cust2 three orders summing 10.00;
    // cust3 seven orders summing 100.00
    val conc2 = orders(Seq((1L, 1.00),
      (2L, 4.00), (2L, 3.00), (2L, 3.00),
      (3L, 20.00), (3L, 20.00), (3L, 20.00), (3L, 20.00),
      (3L, 10.00), (3L, 5.00), (3L, 5.00)))
    val r = Relational.kendallTau(conc2).collect().head
    assert(r.getLong(0) == 3L)
    // doubled pair counts: n0 = 3, C = 3, D = 0, no ties
    assert((r.getString(1), r.getString(2), r.getString(3), r.getString(4),
      r.getString(5)) == (("6", "6", "0", "0", "0")), r)
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-14)
    // a fully x-tied pair: two customers, one order each, different
    // spend magnitudes -> every pair tied in x -> tau NULL
    val tied = orders(Seq((1L, 1.00), (2L, 100.00)))
    val rt = Relational.kendallTau(tied).collect().head
    assert(rt.getString(4) == "2" && rt.isNullAt(6), rt)
  }

  test("collocations: hand-computed lift, support floor bites") {
    import graft.operators.TextAnalysis
    // "a b" x5 and "b a" x4 adjacent pairs: only "a b" clears the
    // floor of 5; lift = 5*9*1e6 div (5*5)
    val docs = Seq((1L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs).collect()
    assert(out.length == 1)
    assert(out.head.toSeq == Seq("a", "b", 5L, 5L, 5L, 9L, 1800000L),
      out.head)
  }

  test("momentsByType: a symmetric distribution reads skew 0 and the " +
    "two-point kurtosis identity holds; constant values go NULL") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(ty: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) => (i.toLong, t0, i.toLong, ty, v, "")
    }
    // sym: {1, 2, 3} — skew exactly 0; twopoint: {0, 2} — kurtosis of a
    // symmetric two-point mass is -2 exactly; const: zero variance
    val df = (ev("sym", Seq(1.0, 2.0, 3.0)) ++
      ev("twopoint", Seq(0.0, 2.0)) ++ ev("const", Seq(5.0, 5.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.momentsByType(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("sym").getDouble(3) == 0.0)
    assert(out("sym").getLong(2) == 200000000L) // mean 200 cents in ppm
    assert(out("twopoint").getDouble(4) == -2.0)
    assert(out("const").isNullAt(3) && out("const").isNullAt(4))
  }

  test("typeDiversityHist: day-grain distinct types, shares sum to 1M") {
    def e(id: Long, u: Long, day: Int, ty: String) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"),
        u, ty, 1.0, "")
    // day 1: user 1 fires a+b (2 types), user 2 fires a (1); day 2:
    // user 1 fires a (1) -> hist: 1 type x2 user-days, 2 types x1
    val df = Seq(e(1, 1, 1, "a"), e(2, 1, 1, "b"), e(3, 2, 1, "a"),
      e(4, 1, 2, "a"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.typeDiversityHist(df).collect()
    assert(out.map(_.toSeq).toSeq == Seq(
      Seq(1L, 2L, 666666L), Seq(2L, 1L, 333333L)))
  }

  test("dupRateBySource: verbatim duplicates counted per shard") {
    val docs = Seq(
      (1L, "same", "en", "s1", 4L), (2L, "same", "en", "s1", 4L),
      (3L, "other", "en", "s1", 5L), (4L, "unique", "en", "s2", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relational.dupRateBySource(docs).collect()
    assert(out.map(_.toSeq).toSeq == Seq(
      Seq("s1", 3L, 2L, 1L, 333333L), Seq("s2", 1L, 1L, 0L, 0L)))
  }

  test("reorderRate: a pair spanning two orders counts as reordered") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val orders = Seq((10L, 1L, "O", 1.0, t, "1-URGENT"),
      (11L, 1L, "O", 1.0, t, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    def li(ok: Long, pk: Long) = (ok, pk, 1L, 1, 1.0, 1.0, 0.0, 0.0,
      "N", "O", t)
    val lineitem = Seq(li(10L, 100L), li(11L, 100L), li(10L, 200L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val part = Seq((100L, "B1"), (200L, "B1"))
      .toDF("p_partkey", "p_brand")
    val out = Relational.reorderRate(orders, lineitem, part).collect()
    // B1: pairs (cust1, p100) in 2 orders + (cust1, p200) in 1 -> 1/2
    assert(out.map(_.toSeq).toSeq == Seq(Seq("B1", 2L, 1L, 500000L)))
  }

  test("cramersV: a perfectly dependent 2x2 table reads V = 1") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // arm = user_id % 2; type 'a' only on arm 0, 'b' only on arm 1 —
    // perfect association, V exactly 1
    val df = (0 until 8).map { i =>
      (i.toLong, t0, i.toLong, if (i % 2 == 0) "a" else "b", 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.cramersV(df).collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-14, r)
  }

  test("cohensD: hand arms — pooled sd exact, effect size replays") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // arm 0 (even user ids): {1.00, 2.00}; arm 1 (odd): {3.00, 4.00}
    val df = Seq(
      (1L, t0, 0L, "t", 1.0, ""), (2L, t0, 2L, "t", 2.0, ""),
      (3L, t0, 1L, "t", 3.0, ""), (4L, t0, 3L, "t", 4.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.cohensD(df).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    // sp2 = ((50000 - 300^2/2) + (250000 - 700^2/2)) / 2 = 5000/2 + 5000... 
    // q0 = 100^2+200^2 = 50000; s0 = 300; q0 - s0^2/n0 = 5000; same arm1
    // sp2 = (5000 + 5000) / 2 = 5000; d = (350-150)/sqrt(5000)
    assert(math.abs(r.getDouble(3) - 200.0 / math.sqrt(5000.0)) < 1e-12, r)
  }

  test("trimmedMean: k = n div 10 clips exactly one value off each " +
    "tail; duplicates split across the clip boundary") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val vals = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, t0, i.toLong, "t", v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.trimmedMean(df).collect().head
    // n=10, k=1: drop 0.00 and 100.00 -> mean of 100..800 cents = 450
    assert(r.getLong(1) == 10L && r.getLong(2) == 1L && r.getLong(3) == 8L)
    assert(r.getLong(4) == 450000000L, r)
    // boundary duplicates: {5 x 1.00, 5 x 2.00}, k=1 -> clip one 100
    // and one 200 -> (4*100 + 4*200)/8 = 150 cents
    val dup = (0 until 10).map { i =>
      (i.toLong, t0, i.toLong, "t", if (i < 5) 1.0 else 2.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rd = Relational.trimmedMean(dup).collect().head
    assert(rd.getLong(4) == 150000000L, rd)
  }

  test("bandJoin: only pairs within the cent band match, exactly once") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, t0, 1L, "click", 1.00, ""),    // 100 cents
      (2L, t0, 2L, "purchase", 1.20, ""), // 120: in band (|20| <= 50)
      (3L, t0, 3L, "purchase", 2.00, ""), // 200: out (|100| > 50)
      (4L, t0, 4L, "purchase", 0.50, "")) // 50: in band, cell boundary
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.bandJoin(df).collect()
    // click at 100 (cell 2, band_lo 100) pairs with 120 and 50 -> 2
    assert(out.map(_.toSeq).toSeq == Seq(Seq(100L, 2L)), out.mkString(";"))
  }

  test("permutationTest: a massive real arm gap yields a small p; the " +
    "n0/n1 census is exact and the count is B") {
    // arm = user_id % 2: evens get tiny values, odds get huge ones —
    // a real effect almost no label shuffle reproduces
    val ev = (1 to 40).map(i =>
      (i.toLong, i.toLong, "purchase", if (i % 2 == 0) 1.0 else 1000.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Relational.permutationTest(ev).collect().head
    assert(r.getString(0) == "purchase")
    assert(r.getLong(1) == 20L && r.getLong(2) == 20L) // n0, n1
    assert(r.getLong(3) == 32L)                        // n_perms = B
    // p_milli = (n_ge+1)*1000 div 33 — with a gap this extreme the
    // permutation distribution almost never reaches it
    assert(r.getLong(5) <= 200L, s"p unexpectedly large: ${r.toSeq}")
    // determinism: identical rerun, repartitioned input
    val r2 = Relational.permutationTest(ev.repartition(7)).collect().head
    assert(r.toSeq == r2.toSeq)
  }

  test("wilcoxonSignedRank: hand 14-day series — zero diffs drop, tie " +
    "group gets the doubled average rank, W⁺+W⁻ = n(n+1)") {
    // week 1: 10,20,30,40,50,60,70; week 2: 10,25,40,40,45,60,90 —
    // diffs vs day−7: 0, +5, +10, 0, −5, 0, +20 → nonzero {+5,+10,−5,+20}
    // |d| groups: 5×2 (ranks 1,2 → doubled avg 3), 10 (doubled 5... )
    val vals = Seq(10, 20, 30, 40, 50, 60, 70, 10, 25, 40, 40, 45, 60, 90)
    val orders = vals.zipWithIndex.map { case (v, i) =>
      (f"2024-03-${i + 1}%02d", v.toDouble) }
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Relational.wilcoxonSignedRank(orders).collect().head
    assert(r.getLong(0) == 14L && r.getLong(1) == 7L && r.getLong(2) == 4L)
    // |d| cents sorted: 500, 500, 1000, 2000 → average ranks
    // 1.5, 1.5, 3, 4 → doubled 3, 3, 6, 8 (group dr = 2·c_lt + m + 1:
    // 500 → 3, 1000 → 6, 2000 → 8)
    // W⁺ = 3(+500) + 6(+1000) + 8(+2000) = 17; W⁻ = 3(−500)
    assert(r.getLong(3) + r.getLong(4) == 4L * 5L,
      s"rank identity broken: ${r.toSeq}")
    assert(r.getLong(3) == 17L && r.getLong(4) == 3L, r.toSeq.toString)
  }

  test("friedmanTest: two complete weeks with identical dow ordering — " +
    "rank sums exact, partial week dropped, χ²_F at the k−1 ceiling " +
    "shape") {
    // 16 days: Mon 03-04 .. Tue 03-19. Complete Monday weeks: 03-04
    // and 03-11 (the trailing Mon+Tue form a partial block → dropped).
    // Within each week revenue strictly increases Mon→Sun, so dow j's
    // rank is identical in both blocks — the maximal-consistency case.
    val orders = (0 until 16).map { i =>
      (f"2024-03-${4 + i}%02d", 100.0 + (i % 7) * 10.0) }
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.friedmanTest(orders).collect()
    assert(out.length == 7)
    out.foreach(r => assert(r.getLong(1) == 2L, s"blocks: ${r.toSeq}"))
    // Mon(dow 2) is rank 1 in both weeks → doubled sum 2·(2·1) = 4;
    // Sun(dow 1) is rank 7 → 2·(2·7) = 28
    val sums = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sums(2L) == 4L && sums(1L) == 28L, s"got $sums")
    // χ²_F for perfectly consistent blocks = n(k−1) = 2·6 → 12000 milli
    assert(out.head.getLong(3) == 12000L, out.head.toSeq.toString)
  }

  test("revenueWaterfall: hand lines — exact scaled sums, truncation " +
    "AFTER the group sum, charged = net + tax") {
    val li = Seq(
      ("2024-03-01", 20.10, 0.05, 0.03),
      ("2024-03-01", 20.10, 0.05, 0.03),
      ("2024-04-01", 100.00, 0.10, 0.05))
      .toDF("d", "l_extendedprice", "l_discount", "l_tax")
      .select(to_date(col("d")).as("l_shipdate"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
    val out = Relational.revenueWaterfall(li).collect()
      .map(r => r.getTimestamp(0).toString.take(7) -> r.toSeq.drop(1))
      .toMap
    // March: two 2010¢ lines at 5%: disc4 = 2·10050 = 20100 → 201¢ —
    // per-row truncation would read 100 + 100 = 200
    assert(out("2024-03") == Seq(2L, 4020L, 201L, 3819L, 114L, 3933L),
      out("2024-03").toString)
    // April: 10000¢, 10%, 5%: 1000 / 9000 / 450 / 9450 exact
    assert(out("2024-04") == Seq(1L, 10000L, 1000L, 9000L, 450L, 9450L),
      out("2024-04").toString)
    // waterfall identity where no truncation bites
    assert(out("2024-04")(4).asInstanceOf[Long] +
      out("2024-04")(3).asInstanceOf[Long] ==
      out("2024-04")(5).asInstanceOf[Long])
  }

  test("signTest: hand 14-day series — signs counted, zeros dropped, " +
    "exact z²") {
    // week 1 revenue 100/day, week 2: 3 days up, 2 down, 2 equal
    val vals = Seq.fill(7)(100.0) ++
      Seq(150.0, 150.0, 150.0, 50.0, 50.0, 100.0, 100.0)
    val orders = vals.zipWithIndex.map { case (v, i) =>
      (java.time.LocalDate.of(2024, 3, 4).plusDays(i).toString, v) }
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Relational.signTest(orders).collect().head
    // 7 pairs, 3 pos, 2 neg, 2 zero → z²·1000 = (1·1·1000) div 5 = 200
    assert(r.toSeq == Seq(7L, 5L, 3L, 2L, 200L), r.toSeq.toString)
  }

  test("drawdownSeries: running peak holds through a dip and a dead " +
    "gap day reads a full-depth drawdown") {
    val orders = Seq(("2024-03-04", 100.0), ("2024-03-05", 300.0),
      ("2024-03-07", 200.0))  // 03-06 is a dead calendar day
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.drawdownSeries(orders).collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.toSeq.drop(1))
      .toMap
    assert(out.size == 4)
    assert(out("2024-03-05") == Seq(30000L, 30000L, 0L))
    assert(out("2024-03-06") == Seq(0L, 30000L, 30000L),
      "dead day must read the full-depth drawdown")
    assert(out("2024-03-07") == Seq(20000L, 30000L, 10000L))
  }

  test("mannKendall: hand 4-day series with a tie — exact S, " +
    "tie-corrected var18, continuity-corrected z²") {
    val orders = Seq(("2024-03-04", 100.0), ("2024-03-05", 200.0),
      ("2024-03-06", 200.0), ("2024-03-07", 300.0))
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Relational.mannKendall(orders).collect().head
    // 6 pairs: 5 concordant, 1 tie → S = 5; tie group m=2 → 18;
    // var18 = 4·3·13 − 18 = 138; z² = 16·18000 div 138 = 2086
    assert(r.toSeq == Seq(4L, 6L, 5L, 138L, 2086L), r.toSeq.toString)
  }

  test("dodChangeBps: sign-split truncation both ways, dead-day " +
    "prev reads NULL bps") {
    val orders = Seq(("2024-03-04", 100.0), ("2024-03-05", 150.0),
      ("2024-03-07", 50.0))  // 03-06 dead: rev 0
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.dodChangeBps(orders).collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.size == 3)  // first day has no prev
    assert(out("2024-03-05") == Some(5000L))   // +50%
    assert(out("2024-03-06") == Some(-10000L)) // to zero: −100%
    assert(out("2024-03-07") == None)          // off a dead day: NULL
  }

  test("peakDays: strict two-sided maxima only — plateaus and " +
    "endpoints never qualify") {
    val mk = (d: Int, n: Int) => Seq.fill(n)(
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:00:00"))
    // daily counts: 1, 3, 2, 2, 5, 1
    val ev = (mk(1, 1) ++ mk(2, 3) ++ mk(3, 2) ++ mk(4, 2) ++
      mk(5, 5) ++ mk(6, 1)).toDF("ts")
    val out = Relational.peakDays(ev).collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(out.toSeq == Seq(
      "2024-03-02" -> ((3L, 1L, 2L)),
      "2024-03-05" -> ((5L, 2L, 1L))), out.mkString(", "))
  }

  test("moodMedian: perfectly separated groups — grand median at the " +
    "k-th order statistic, uniform expecteds, chi2 = N") {
    val li = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("l_returnflag", "l_quantity")
    val out = Relational.moodMedian(li).collect()
    assert(out.length == 4)
    val byCell = out.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // median = 2 (cum hits (4+1) div 2 = 2 at v = 2); A fully ≤, B >
    assert(byCell(("A", "1_above")) == ((0L, 1.0, 1.0)))
    assert(byCell(("A", "2_le")) == ((2L, 1.0, 1.0)))
    assert(byCell(("B", "1_above")) == ((2L, 1.0, 1.0)))
    assert(byCell(("B", "2_le")) == ((0L, 1.0, 1.0)))
    assert(out.head.getDouble(5) == 4.0, s"chi2 ${out.head.getDouble(5)}")
  }

  test("gapCensus: maximal dead-day runs become rows — adjacent gaps " +
    "never merge across a live day") {
    val orders = Seq(("2024-03-04", 100.0), ("2024-03-08", 100.0),
      ("2024-03-11", 100.0))
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.gapCensus(orders).collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1))
    assert(out.toSeq == Seq("2024-03-05" -> 3L, "2024-03-09" -> 2L),
      out.mkString(", "))
  }

  test("ksUniformDow: all mass on one weekday — exact integer " +
    "supremum over the dense grid, zero-count dows advance the null") {
    val orders = Seq.fill(4)(("2024-03-04", 100.0))  // a Monday (dw 2)
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Relational.ksUniformDow(orders).collect().head
    // cum = (0,4,4,4,4,4,4): max |7·cum − 4·dw| = |28 − 8| = 20
    assert(r.toSeq.take(2) == Seq(4L, 20L), r.toSeq.toString)
    assert(r.getDouble(2) == 20.0 / 28.0)
  }

  test("jonckheereTerpstra: hand 2-group fixture with a cross-group " +
    "tie — doubled J, exact expectation, tie-corrected z") {
    val orders = Seq((1L, "1-URGENT"), (2L, "1-URGENT"),
      (3L, "2-HIGH"), (4L, "2-HIGH"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 3.0))
      .toDF("l_orderkey", "l_quantity")
    val r = Relational.jonckheereTerpstra(orders, li).collect().head
    // J = 3 wins + 1 tie/2 = 3.5 → j_x2 = 7; E[J]·4 = 16 − 8 = 8;
    // Var = 102/72 + (4·2)/(8·4·3) = 1.5 → z = 1.5/√1.5 = √1.5
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 7L && r.getLong(3) == 8L, r.toSeq.toString)
    assert(math.abs(r.getDouble(4) - math.sqrt(1.5)) < 1e-12,
      s"z = ${r.getDouble(4)}")
  }

  test("skyline2d: strict dominance — a lower-price smaller size " +
    "falls, an equal-price smaller size falls, ties carry multiplicity") {
    val part = Seq((1, 5.0), (2, 3.0), (3, 4.0), (3, 4.0), (3, 1.0),
      (4, 4.0))
      .toDF("p_size", "p_retailprice")
    val out = Relational.skyline2d(part).collect().map(_.toSeq)
    // size 4 @400 leads; size 3 @400 is dominated (equal price, smaller
    // size); size 2 @300 dominated; size 1 @500 survives
    assert(out.toSeq == Seq(Seq(4L, 400L, 1L), Seq(1L, 500L, 1L)),
      out.mkString(";"))
  }

  test("valueRangeAudit: violations counted on both sides, min/max " +
    "exact, clean domain reads zero violations") {
    val li = Seq((0.0, 0.05, 0.02), (5.0, 0.05, 0.02), (60.0, 0.11, 0.02))
      .toDF("l_quantity", "l_discount", "l_tax")
    val out = Relational.valueRangeAudit(li).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(out("l_quantity") == Seq(3L, 0L, 60L, 1L, 1L),
      out("l_quantity").toString)
    assert(out("l_discount_hund") == Seq(3L, 5L, 11L, 0L, 1L))
    assert(out("l_tax_hund") == Seq(3L, 2L, 2L, 0L, 0L),
      "a clean domain must read zero violations with live min/max")
  }

  test("burstiness: a clumped token reads Fano > 1, an evenly spread " +
    "one < 1 — zeros enter through N") {
    val docs = Seq((1L, "a a a"), (2L, "b"), (3L, "b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.burstiness(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))))
    // order: a (total 3) before b (total 2)
    assert(out.map(_._1).toSeq == Seq("a", "b"))
    val a = out.toMap.apply("a")
    // a: one doc with c=3 of N=3 → F = (3·9 − 9)/(3·3) = 2
    assert(a == ((3L, 1L, 3L, 9L, 2.0)), a.toString)
    val b = out.toMap.apply("b")
    // b: two docs with c=1 of N=3 → F = (3·2 − 4)/(3·2) = 1/3
    assert(b == ((3L, 2L, 2L, 2L, 2.0 / 6.0)), b.toString)
  }

  test("hodgesLehmann: hand 14-day series — Walsh census over i<=j, " +
    "even-count median via the x4 convention, zeros kept") {
    // week 1 flat 100; week 2: +50,+50,+50,−50,−50,+100,+100
    val vals = Seq.fill(7)(100.0) ++
      Seq(150.0, 150.0, 150.0, 50.0, 50.0, 200.0, 200.0)
    val orders = vals.zipWithIndex.map { case (v, i) =>
      (java.time.LocalDate.of(2024, 3, 4).plusDays(i).toString, v) }
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Relational.hodgesLehmann(orders).collect().head
    // 7 diffs → 28 Walsh sums; cum hits 14 and 15 at value 10000
    // (cents) → hl_x4 = 20000 = 4·HL, HL = 50.00
    assert(r.toSeq == Seq(7L, 28L, 20000L), r.toSeq.toString)
  }

  test("kruskalWallis: hand 2-group fixture with a cross-group tie — " +
    "doubled ranks, exact components, fixed H tree") {
    // A = [1, 2], B = [2, 3]: ranks 1, 2.5, 2.5, 4 → R_A = 3.5 (7
    // doubled), R_B = 6.5 (13 doubled); H = 0.6·(49/8 + 169/8) − 15
    val li = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("l_returnflag", "l_quantity")
    val out = Relational.kruskalWallis(li).collect()
    assert(out.length == 2)
    val byG = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(byG("A")._1 == 2L && byG("A")._2 == 7L)
    assert(byG("B")._1 == 2L && byG("B")._2 == 13L)
    assert(byG("A")._3 == 6L, "tie census m=2 -> m^3 - m = 6")
    assert(math.abs(byG("A")._4 - 1.35) < 1e-12, s"H = ${byG("A")._4}")
  }

  test("cliffsDelta: hand cross pairs — census from cumulative " +
    "counts, sign-split ppm") {
    val ev = Seq(("click", 1.0), ("click", 2.0),
      ("purchase", 1.0), ("purchase", 3.0)).toDF("event_type", "value")
    val r = Relational.cliffsDelta(ev).collect().head
    // pairs: (1,1) tie, (1,3) lt, (2,1) gt, (2,3) lt
    assert(r.toSeq == Seq(2L, 2L, 1L, 2L, 1L, -250000L), r.toSeq.toString)
  }

  test("userActivityGini: hand counts (1,1,2) — exact doubled-rank " +
    "numerator, uniform activity reads 0") {
    val ev = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 30L))
      .toDF("event_id", "user_id")
    val r = Relational.userActivityGini(ev).collect().head
    // counts {10→1, 20→1, 30→2}: sorted 1,1,2; Σi·x = 1+2+6 = 9,
    // num = 2·9 − 4·4 = 2, gini = 2/12
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L &&
      r.getLong(2) == 2L && math.abs(r.getDouble(3) - 2.0 / 12) < 1e-12,
      r.toSeq.toString)
    val uniform = Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("event_id", "user_id")
    val u = Relational.userActivityGini(uniform).collect().head
    assert(u.getLong(2) == 0L && u.getDouble(3) == 0.0, u.toSeq.toString)
  }

  test("nemenyiPairs: 4 perfectly-consistent weeks — extreme dow pair " +
    "clears the a=0.05 critical difference (ratio >= 1e6), adjacent " +
    "pair does not; mean-rank gaps exact") {
    // 28 days = 4 complete Monday weeks (03-04 Mon .. 03-31 Sun),
    // revenue = 100·dayofweek → dow d's in-block rank is d every week,
    // so r(d) = n·2d = 8d and gap_doubled(a,b) = 8|a−b|
    val orders = (0 until 28).map { i =>
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(i)
      (d.toString, 100.0 * (d.getDayOfWeek.getValue % 7 + 1)) }
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.nemenyiPairs(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.size == 21)
    // Sunday(1) vs Saturday(7): ranks 1 vs 7 → gap_doubled 48,
    // mean-rank gap 6.000, ratio 48²·6e12 div (8696601·224·4) = 1774092
    assert(out((1L, 7L)) == ((48L, 6000L, 1774092L)),
      s"extreme pair: ${out((1L, 7L))}")
    // adjacent pair: gap_doubled 8, mean gap 1.000, far below CD
    val adj = out((1L, 2L))
    assert(adj._1 == 8L && adj._2 == 1000L && adj._3 < 1000000L,
      s"adjacent pair: $adj")
    assert(out((1L, 7L))._3 >= 1000000L && adj._3 < 1000000L,
      "both CD branches must bite on this fixture")
  }

  test("pageTrend: revenue monotone in dow order — L at its maximum, " +
    "positive trend, exact z²") {
    val orders = (0 until 28).map { i =>
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(i)
      (d.toString, 100.0 * (d.getDayOfWeek.getValue % 7 + 1)) }
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Relational.pageTrend(orders).collect().head
    // r(d) = 8d → L₂ₓ = Σ d·8d = 8·140 = 1120; E = 224·4 = 896;
    // z²·1000 = 224²·3000 div (1568·4) = 24000
    assert(r.getLong(0) == 4L && r.getLong(1) == 1120L &&
      r.getLong(2) == 896L && r.getLong(3) == 1L &&
      r.getLong(4) == 24000L, r.toSeq.toString)
  }

  test("rollingWau: hand users — a user counts once per window even " +
    "with repeat activity, windows expire after 7 days, fan-out clips " +
    "at the observed max day") {
    val ts = (d: Int, u: Long) =>
      (u, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:00:00"))
    // u1 active day 1 (twice) and day 5; u2 day 1 only; u3 day 9
    val ev = Seq(ts(1, 1L), ts(1, 1L), ts(1, 2L), ts(5, 1L), ts(9, 3L))
      .toDF("user_id", "ts")
    val out = Relational.rollingWau(ev).collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size == 9, s"got ${out.keys.toSeq.sorted}")
    assert(out("2024-03-01") == ((2L, 2L, false)))  // dau 2, wau {u1,u2}
    assert(out("2024-03-05") == ((1L, 2L, false)))  // u1 dupe-window once
    assert(out("2024-03-08") == ((0L, 1L, true)))   // day-1 pairs expired
    assert(out("2024-03-09") == ((1L, 2L, true)))   // {u1 (d5), u3}
  }

  test("tsCollisionAudit: collisions appear exactly at the grain that " +
    "merges them — µs distinct, second merges the pair, minute all") {
    val ev = Seq(
      "2024-03-01 10:00:00.000001", "2024-03-01 10:00:00.000002",
      "2024-03-01 10:00:59.500000")
      .map(java.sql.Timestamp.valueOf).map(Tuple1(_)).toDF("ts")
    val out = Relational.tsCollisionAudit(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("1_microsecond") == ((3L, 0L)))
    assert(out("2_millisecond") == ((2L, 1L)))  // 1µs-apart pair merges
    assert(out("3_second") == ((2L, 1L)))
    assert(out("4_minute") == ((1L, 2L)))  // all three in minute 10:00
  }

  test("nullCensus: each missing flavor lands in its own counter") {
    val ev = Seq(
      (1L, 10L, "click", 5.0, "{}"),
      (2L, 0L, null.asInstanceOf[String], 0.0, "  "),
      (3L, 20L, "   ", 5.0, null.asInstanceOf[String]))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    val out = Relational.nullCensus(ev).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(out("event_type") == Seq(3L, 1L, 1L, null, 333333L))
    assert(out("props") == Seq(3L, 1L, 1L, null, 333333L))
    assert(out("user_id") == Seq(3L, 0L, null, 1L, 0L))
    assert(out("value") == Seq(3L, 0L, null, 1L, 0L))
  }

  test("holtWintersForecast: hand 9-day series — day-2 forecast is pure " +
    "level (zero season), and the season slot learned on day 2 feeds " +
    "day 9's forecast one week later") {
    val orders = Seq(
      ("2024-03-04", 10.00), ("2024-03-05", 20.00), ("2024-03-06", 30.00),
      ("2024-03-07", 10.00), ("2024-03-08", 10.00), ("2024-03-09", 10.00),
      ("2024-03-10", 10.00), ("2024-03-11", 10.00), ("2024-03-12", 40.00))
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.holtWintersForecast(orders).collect().toSeq
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // hand fold (α=β=γ=1/2, halve = sign-split div 2):
    // day1 x=1000: l=1000 t=0 s=0s, fc NULL
    // day2 x=2000 dw(Tue)=3: fc=1000+0+0=1000; l=h(2000+1000)=1500,
    //   t=h(500)=250, s[3]=h(2000-1500)=250
    assert(out.head == (1000L, None), s"got ${out.head}")
    assert(out(1) == (2000L, Some(1000L)), s"got ${out(1)}")
    // day 9 (next Tuesday, x=4000): its fc must include day-2's
    // learned s[3] — recompute the full fold in Scala and compare
    def h(v: Long) = if (v < 0) -((-v) / 2) else v / 2
    var l = 1000L; var t = 0L; val s = Array.fill(8)(0L)
    val xs = Seq((2000L, 3), (3000L, 4), (1000L, 5), (1000L, 6),
      (1000L, 7), (1000L, 1), (1000L, 2), (4000L, 3))
    val fcs = xs.map { case (x, dw) =>
      val fc = l + t + s(dw)
      val lN = h(x - s(dw) + l + t)
      val tN = h(lN - l + t); val sN = h(x - lN + s(dw))
      l = lN; t = tN; s(dw) = sN
      fc
    }
    assert(out.drop(1).map(_._2.get) == fcs, s"got ${out.drop(1)}")
    // season participated: day-9 fc differs from the Holt-only path
    assert(s(3) != 0L)
  }

  test("weeklyOhlc: gap day is a 0 low; open/close follow calendar " +
    "order, not value order") {
    val orders = Seq(
      // week of Mon 2024-03-04: Tue 30, Wed gap (0), Thu 10
      ("2024-03-05", 30.00), ("2024-03-07", 10.00),
      // week of Mon 2024-03-11: Mon only
      ("2024-03-11", 50.00))
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val out = Relational.weeklyOhlc(orders).collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // grid spans Tue 03-05 .. Mon 03-11: week1 has 6 days
    // (Tue..Sun), open=3000 (Tue), high=3000, low=0 (gap days),
    // close=0 (Sun); week2 is the single Monday
    assert(out == Seq(
      (6L, 3000L, 3000L, 0L, 0L),
      (1L, 5000L, 5000L, 5000L, 5000L)), s"got $out")
  }

  test("qqDeciles: hand arms — nearest-rank-low deciles off the value " +
    "grid, diff exact") {
    val ev = ((1 to 10).map(i => ("click", i.toDouble)) ++
      (1 to 5).map(i => ("purchase", i * 2.0)))
      .zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val out = Relational.qqDeciles(ev).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // n_a=10: k = (9·i) div 10 + 1 → values 100·(k)
    // n_b=5:  k = (4·i) div 10 + 1 → values 200·(k)
    val exp = (1 to 9).map { i =>
      val ka = (9 * i) / 10 + 1; val kb = (4 * i) / 10 + 1
      (i, ka * 100L, kb * 200L, ka * 100L - kb * 200L)
    }
    assert(out == exp, s"got $out")
  }
}
