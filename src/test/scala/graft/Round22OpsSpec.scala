package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.analytics.StatsAnalytics
import graft.operators.Sampling

/** Round-12-of-build additions: cross-correlation (lead/lag), drawdown
  * report, mSPRT always-valid sequential test, and the equal-weight
  * forecast combination. Hand-traced fixtures. */
class Round22OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- ccfDaily ----------------------------------------------------

  test("ccfDaily: hand-traced three-day series at lags -1..1") {
    // daily x = [1,2,3] (revenue), y = [1,1,2] (event count)
    // cx = [-1,0,1], cy = [-1/3,-1/3,2/3]
    // den = sqrt(2 * 2/3) = 1.1547005
    // lag 0: Σ cx·cy = 1   → 0.866025
    // lag +1: cx1·cy2 = 1/3 → 0.288675
    // lag -1: cx3·cy2 = -1/3 → -0.288675
    val ev = Seq(
      (ts("2024-01-01 10:00:00"), 1.0),
      (ts("2024-01-02 10:00:00"), 2.0),
      (ts("2024-01-03 10:00:00"), 1.5),
      (ts("2024-01-03 11:00:00"), 1.5))
      .toDF("ts", "value")
    val r = StatsAnalytics.ccfDaily(ev, maxLag = 1).collect()
    assert(r.length == 3)
    val byLag = r.map(x => x.getAs[Long]("lag") ->
      (x.getAs[Long]("n_pairs"), x.getAs[Double]("ccf"))).toMap
    assert(byLag(0L) == ((3L, 0.866025)))
    assert(byLag(1L) == ((2L, 0.288675)))
    assert(byLag(-1L) == ((2L, -0.288675)))
  }

  // ---- drawdownReport ----------------------------------------------

  test("drawdownReport: peaks, depth, pct, and longest underwater run") {
    // x = [5,3,4,6,2]: peak = [5,5,5,6,6], dd = [0,2,1,0,4]
    // max_dd = 4 at peak 6 → pct = 0.666667; runs: {d2,d3} len 2, {d5} 1
    val ev = Seq(
      (ts("2024-01-01 00:00:00"), 5.0),
      (ts("2024-01-02 00:00:00"), 3.0),
      (ts("2024-01-03 00:00:00"), 4.0),
      (ts("2024-01-04 00:00:00"), 6.0),
      (ts("2024-01-05 00:00:00"), 2.0))
      .toDF("ts", "value")
    val r = StatsAnalytics.drawdownReport(ev).collect()(0)
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Double]("max_drawdown") == 4.0)
    assert(r.getAs[Double]("max_dd_pct") == 0.666667)
    assert(r.getAs[Long]("max_underwater_days") == 2L)
  }

  test("drawdownReport: monotone-rising series never goes underwater") {
    val ev = Seq(
      (ts("2024-01-01 00:00:00"), 1.0),
      (ts("2024-01-02 00:00:00"), 2.0),
      (ts("2024-01-03 00:00:00"), 3.0))
      .toDF("ts", "value")
    val r = StatsAnalytics.drawdownReport(ev).collect()(0)
    assert(r.getAs[Double]("max_drawdown") == 0.0)
    assert(r.getAs[Double]("max_dd_pct") == 0.0)
    assert(r.getAs[Long]("max_underwater_days") == 0L)
  }

  // ---- msprt -------------------------------------------------------

  test("msprt: cumulative counts, evidence direction, and martingale p") {
    // Find one user id per hash bucket so the variant split is pinned
    // without hard-coding md5 internals.
    val probe = (1L to 40L).toDF("user_id")
      .withColumn("v", Sampling.hashBucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val uidA = probe.find(_._2 == 0L).get._1 // variant a
    val uidB = probe.find(_._2 == 1L).get._1 // variant b
    // day1: A active no conv, B converts; day2: both active, B converts
    val ev = Seq(
      (uidA, ts("2024-01-01 08:00:00"), "view", 1.0),
      (uidB, ts("2024-01-01 09:00:00"), "purchase", 100.0),
      (uidA, ts("2024-01-02 08:00:00"), "view", 1.0),
      (uidB, ts("2024-01-02 09:00:00"), "purchase", 95.0))
      .toDF("user_id", "ts", "event_type", "value")
    val rows = StatsAnalytics.msprt(ev).orderBy("d").collect()
    assert(rows.length == 2)
    val d1 = rows(0); val d2 = rows(1)
    assert(d1.getAs[Long]("users_a") == 1L &&
      d1.getAs[Long]("conv_a") == 0L)
    assert(d1.getAs[Long]("users_b") == 1L &&
      d1.getAs[Long]("conv_b") == 1L)
    assert(d2.getAs[Long]("users_a") == 2L &&
      d2.getAs[Long]("users_b") == 2L && d2.getAs[Long]("conv_b") == 2L)
    assert(d1.getAs[Double]("theta") == 1.0)
    assert(d2.getAs[Double]("theta") == 1.0)
    // evidence accumulates: lambda grows with n at fixed theta, and the
    // always-valid p is a running min (non-increasing)
    assert(d2.getAs[Double]("lambda") > d1.getAs[Double]("lambda"))
    assert(d2.getAs[Double]("p_always_valid") <=
      d1.getAs[Double]("p_always_valid"))
    assert(d1.getAs[Double]("p_always_valid") > 0.0 &&
      d1.getAs[Double]("p_always_valid") <= 1.0)
  }

  test("msprt: a day with one populated arm carries no evidence") {
    val probe = (1L to 40L).toDF("user_id")
      .withColumn("v", Sampling.hashBucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val uidA = probe.find(_._2 == 0L).get._1
    val ev = Seq((uidA, ts("2024-01-01 08:00:00"), "view", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = StatsAnalytics.msprt(ev).collect()(0)
    assert(r.getAs[Double]("lambda") == 1.0)
    assert(r.getAs[Double]("theta") == 0.0)
    assert(r.getAs[Double]("p_always_valid") == 1.0)
    assert(r.getAs[Int]("reject") == 0)
  }

  // ---- forecastCombo -----------------------------------------------

  test("forecastCombo: linear series gives exact per-arm errors") {
    // x_t = t for t=1..10; on t≥8: naive err 1, snaive err 7,
    // ma7 = mean(t-7..t-1) = t-4 → err 4, combo = ((t-1)+(t-7)+(t-4))/3
    // = t-4 → err 4. Constant errors → MAE = RMSE.
    val ev = (1 to 10).map(t =>
      (ts(f"2024-01-$t%02d 00:00:00"), t.toDouble))
      .toDF("ts", "value")
    val rows = StatsAnalytics.forecastCombo(ev).collect()
    val m = rows.map(r => r.getAs[String]("model") ->
      (r.getAs[Long]("n_days"), r.getAs[Double]("mae"),
        r.getAs[Double]("rmse"))).toMap
    assert(m("naive") == ((3L, 1.0, 1.0)))
    assert(m("snaive") == ((3L, 7.0, 7.0)))
    assert(m("ma7") == ((3L, 4.0, 4.0)))
    assert(m("combo") == ((3L, 4.0, 4.0)))
  }
}
