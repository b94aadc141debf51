package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analytics.EventAnalytics
import graft.functions.CleanFns._

/** Windowed/rollup/percentile analytics extensions + the shape-regex
  * dispatch that backs multiFormatTs. */
class AnalyticsExtSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val ev = Seq(
    // (event_id, ts, user_id, event_type, value)
    (1L, ts("2022-01-01 10:00:00"), 1L, "purchase", Some(10.0)),
    (2L, ts("2022-01-01 11:00:00"), 2L, "purchase", Some(20.0)),
    (3L, ts("2022-01-02 10:00:00"), 1L, "purchase", None),
    (4L, ts("2022-01-03 10:00:00"), 3L, "purchase", Some(5.0)),
    (5L, ts("2022-01-03 10:00:00"), 3L, "pageview", Some(99.0))
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("rolling revenue sums the trailing window over the daily series") {
    val out = EventAnalytics.rollingRevenue(ev, days = 2)
      .select("event_date", "revenue", "rolling_2d")
      .as[(String, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("2022-01-01", 30.0, 30.0),
      ("2022-01-02", 0.0, 30.0),   // null value coalesced to 0
      ("2022-01-03", 5.0, 5.0)))   // window slid past day 1
  }

  test("revenue rollup emits leaf, per-day, and grand-total rows with gid") {
    val out = EventAnalytics.revenueRollup(ev)
      .select("event_date", "event_type", "revenue", "n_events", "gid")
      .as[(Option[String], Option[String], Double, Long, Long)]
      .collect().toSeq
    assert(out.head == (None, None, 134.0, 5L, 3L)) // grand total first
    assert(out.contains((Some("2022-01-03"), None, 104.0, 2L, 1L)))
    assert(out.contains((Some("2022-01-01"), Some("purchase"), 30.0, 2L, 0L)))
    assert(out.count(_._5 == 3L) == 1 && out.count(_._5 == 1L) == 3)
  }

  test("value percentiles interpolate exactly per type") {
    val out = EventAnalytics.valuePercentiles(ev)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // purchase values: 5, 10, 20 (null excluded) → p50 = 10
    val (p50, p90, _) = out("purchase")
    assert(p50.contains(10.0))
    assert(p90.contains(18.0)) // 0.9 * (n-1) = 1.8 → 10 + 0.8*(20-10)
  }

  test("approx DAU stays within the configured relative error of exact A1") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val exact = EventAnalytics.dau(events)
      .as[(String, Long)].collect().toMap
    val approx = EventAnalytics.dauApprox(events, rsd = 0.02)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (day, a) =>
      val e = exact(day).toDouble
      assert(math.abs(a - e) / e <= 0.10, s"$day: approx=$a exact=$e")
    }
  }

  test("approx percentiles track the exact interpolated form") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val exact = EventAnalytics.valuePercentiles(events)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val approx = EventAnalytics.valuePercentilesApprox(events)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, (_, e50, e90, _)) =>
      val (_, a50, a90, _) = approx(t)
      // approx_percentile returns a real sample; allow 5% of the p90 scale
      val tol = e90.get.abs * 0.05 + 1e-9
      assert(math.abs(a50.get - e50.get) <= tol, s"$t p50")
      assert(math.abs(a90.get - e90.get) <= tol, s"$t p90")
    }
  }

  test("formatShapeRegex translates java.time patterns to anchored shapes") {
    assert(formatShapeRegex("MM-dd-yy")
      .contains("^\\d{2}\\Q-\\E\\d{2}\\Q-\\E\\d{2}$"))
    assert(formatShapeRegex("yyyy-MM-dd'T'HH:mm:ss").contains(
      "^\\d{4}\\Q-\\E\\d{2}\\Q-\\E\\d{2}\\QT\\E\\d{2}\\Q:\\E\\d{2}\\Q:\\E\\d{2}$"))
  }

  test("unknown field letters disable the shape gate, not silently parse") {
    // 'h' (clock-hour) and 'a' (am/pm) are FIELDS the arithmetic parser
    // can't handle — the format must fall back to try_to_timestamp, not
    // treat them as literal separators (which would parse hour as 0).
    assert(formatShapeRegex("MM/dd/yyyy hh:mm a").isEmpty)
    assert(arithmeticTsParse(col("x"), "MM/dd/yyyy hh:mm a").isEmpty)
    assert(arithmeticTsParse(col("x"), "yyyy-MM-dd HH:mm:ss.SSS").isEmpty)
    val df = Seq("07/04/2022 01:30 PM", "07/04/2022").toDF("raw")
    val out = df.select(date_format(
      multiFormatTs(col("raw"), Seq("MM/dd/yyyy hh:mm a", "MM/dd/yyyy")),
      "yyyy-MM-dd HH:mm")).as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2022-07-04 13:30"),   // am/pm hour honored
      Some("2022-07-04 12:00")))                  // date-only noon-pin
  }

  test("single-letter format fields accept 1-2 digits (java.time laxity)") {
    assert(formatShapeRegex("M/d/yy")
      .contains("^\\d{1,2}\\Q/\\E\\d{1,2}\\Q/\\E\\d{2}$"))
    val df = Seq("3/4/22", "11/25/22").toDF("raw")
    val out = df.select(date_format(
      multiFormatTs(col("raw"), Seq("M/d/yy")), "yyyy-MM-dd"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2022-03-04"), Some("2022-11-25")))
  }

  test("dispatch preserves first-match-wins for shape-ambiguous formats") {
    // 03/04/2021 parses under both dd/MM and MM/dd — list order must win.
    val df = Seq("03/04/2021", "25/12/2021", "12/25/2021").toDF("raw")
    val out = df.select(date_format(
      multiFormatTs(col("raw"), Seq("dd/MM/yyyy", "MM/dd/yyyy")),
      "yyyy-MM-dd")).as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2021-04-03"), // dd/MM won the tie
      Some("2021-12-25"),                 // dd/MM parses it
      Some("2021-12-25")))                // dd/MM fails, MM/dd fallback
  }

  test("WelfordAgg matches avg/var_samp including NULL on singleton groups") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 8.0), ("b", 42.0))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(graft.functions.WelfordAgg.column(col("v")).as("mv"),
        avg(col("v")).as("mean_ref"), var_samp(col("v")).as("var_ref"))
      .select(col("g"), col("mv._1").as("mean"), col("mv._2").as("variance"),
        col("mean_ref"), col("var_ref"))
      .as[(String, Option[Double], Option[Double], Option[Double],
        Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val (am, av, amr, avr) = got("a")
    assert(math.abs(am.get - amr.get) < 1e-12)
    assert(math.abs(av.get - avr.get) < 1e-9)
    val (bm, bv, bmr, bvr) = got("b")
    assert(bm.contains(42.0) && bmr.contains(42.0))
    assert(bv.isEmpty && bvr.isEmpty) // singleton: NULL, matching var_samp
  }

  test("dispatch returns null when shape matches but the date is invalid") {
    val df = Seq("02-30-2022", "13-45-22").toDF("raw")
    val out = df.select(
      multiFormatTs(col("raw"), KaggleTsFormats)).collect().map(_.isNullAt(0))
    assert(out.forall(identity))
  }
}
