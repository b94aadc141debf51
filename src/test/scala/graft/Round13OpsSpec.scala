package graft

import org.apache.spark.sql.functions._
import graft.analytics.StatsAnalytics

/** Round-5-of-build additions: the RFM scale-path sibling. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Seq(
    // (custkey, orderdate, totalprice) — 10 customers, skewed spend
    (1L, "1995-01-01", 100.0), (1L, "1995-06-01", 150.0),
    (2L, "1995-02-01", 90.0), (2L, "1995-07-01", 60.0),
    (2L, "1995-07-15", 30.0),
    (3L, "1995-03-01", 500.0), (4L, "1995-03-15", 20.0),
    (5L, "1995-04-01", 800.0), (5L, "1995-08-01", 120.0),
    (6L, "1995-05-01", 40.0), (7L, "1995-05-15", 260.0),
    (8L, "1995-06-15", 75.0), (9L, "1995-07-01", 310.0),
    (10L, "1995-08-10", 55.0)
  ).toDF("o_custkey", "o_orderdate", "o_totalprice")

  test("rfmSegmentsScale: no single-partition ntile window in the plan") {
    val plan = StatsAnalytics.rfmSegmentsScale(orders)
      .queryExecution.executedPlan.toString
    // the exact form plans three global Window sorts; the scale form must
    // plan NONE — boundaries come from a partial-merge sketch aggregate
    // (note: "ntile" is a substring of "percentile_approx", so match the
    // operator, not the function name)
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("partial_percentile_approx"),
      s"boundary sketch must partial-aggregate map-side:\n$plan")
  }

  test("rfmSegmentsScale census is bounded against the exact form") {
    val exact = StatsAnalytics.rfmSegments(orders)
    val scale = StatsAnalytics.rfmSegmentsScale(orders)
    // same customer mass and identical total revenue — bucketing reshapes
    // cells (ties collapse into one bucket) but never drops or double-
    // counts a customer
    val nE = exact.agg(sum("n_customers")).head().getLong(0)
    val nS = scale.agg(sum("n_customers")).head().getLong(0)
    assert(nE === nS)
    val revE = exact.agg(round(sum("segment_revenue"), 2)).head().getDouble(0)
    val revS = scale.agg(round(sum("segment_revenue"), 2)).head().getDouble(0)
    assert(revE === revS)
    // every score stays in [1, 5]
    val bad = scale.filter(
      col("r_score") < 1 || col("r_score") > 5 ||
        col("f_score") < 1 || col("f_score") > 5 ||
        col("m_score") < 1 || col("m_score") > 5).count()
    assert(bad === 0L)
    // per-dimension tile masses approximate n/5: with 10 customers no
    // ascending-boundary tile may exceed the worst-case tie collapse; the
    // monetary dimension here is all-distinct, so its tiles are exact
    val mTiles = scale.groupBy("m_score").agg(sum("n_customers").as("n"))
      .orderBy("m_score").as[(Long, Long)].collect().toList
    assert(mTiles === List((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L), (5L, 2L)))
  }
}
