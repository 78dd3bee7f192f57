package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Proves the bucketed co-location contract: two tables bucketed on the
  * join key with equal bucket counts sort-merge-join with no Exchange in
  * the plan — the write-once/join-many layout for fact-to-fact joins
  * where neither side broadcasts. (A bucket-local Sort remains: Spark
  * only consumes written sort order behind a legacy flag; the shuffle is
  * the part that matters at scale.) */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no exchange on either side") {
    val orders = Tables.orders(spark, sf0)
    val customer = Tables.customer(spark, sf0)
    Relational.writeBucketed(orders, "b_orders", "o_custkey", buckets = 8)
    Relational.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // force SMJ: broadcast would trivially avoid the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val expected = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bucketed evolution: both generation branches join exchange-free " +
    "and gen 1 reads the explicit back-fill sentinel") {
    val orders = Tables.orders(spark, sf0)
    val lineitem = Tables.lineitem(spark, sf0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Relational.bucketedEvolutionJoin(orders, lineitem, buckets = 8)
      val plan = out.queryExecution.executedPlan.toString
      // two generation branches → two SMJs, zero shuffles before the
      // final ≤(gens × priorities) aggregation's own exchange
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val joinRegion = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinRegion.contains("Exchange hashpartitioning(o_orderkey"),
        s"a bucketed generation branch shuffled on the join key:\n$plan")
      val rows = out.collect()
      val g1 = rows.filter(_.getLong(0) == 1L)
      assert(g1.length == 1 && g1.head.getString(1) == "<backfill>",
        s"gen-1 must be one back-fill row: ${rows.mkString(";")}")
      assert(rows.filter(_.getLong(0) == 2L)
        .forall(_.getString(1) != "<backfill>"),
        "gen-2 rows must carry their real priorities")
      // content parity with the plain (unbucketed) relations
      val expected = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(rows.map(_.getLong(2)).sum == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
