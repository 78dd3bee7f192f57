package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates: not oracle-comparable (engine-
  * specific sketches), so bounded-error specs against exact results. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within rsd bound of exact") {
    val ev = Tables.events(spark, sf0)
    val exact = ev.select(countDistinct(col("event_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("event_id"), rsd = 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"approx=$approx exact=$exact err=$err")
  }

  test("approx percentile brackets the exact percentile") {
    val docs = Tables.documents(spark, sf0)
    val exact = docs.selectExpr("percentile(n_chars, 0.5)").head().getDouble(0)
    val approx = docs.selectExpr("percentile_approx(n_chars, 0.5, 1000)")
      .head().getLong(0)
    assert(math.abs(approx - exact) <= 20, s"approx=$approx exact=$exact")
  }
}
