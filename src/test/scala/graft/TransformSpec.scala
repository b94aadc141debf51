package graft

import org.apache.spark.sql.functions._
import graft.functions.CleanFns._
import graft.operators.{Dedup, Quarantine}

/** Port of the reference's transform unit tests
  * (/root/reference/tests/test_transform.py:1-112) plus the coercion/
  * normalization minutiae SURVEY.md §7.6.3 calls out. */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("dedup keeps latest ts per key (test_transform.py:6-20)") {
    val df = Seq(
      ("e1", "2024-01-01 10:00:00", 1.0),
      ("e1", "2024-01-01 12:00:00", 2.0),
      ("e2", "2024-01-01 11:00:00", 3.0)
    ).toDF("event_id", "ts", "amount")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Dedup.keepLatest(df, Seq("event_id"), col("ts"), col("amount"))
      .orderBy("event_id")
      .select("event_id", "amount").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("e1", 2.0), ("e2", 3.0)))
  }

  test("dedup tie on ts resolves by tiebreak, deterministically") {
    val df = Seq(("e1", "2024-01-01 10:00:00", 1.0),
      ("e1", "2024-01-01 10:00:00", 2.0))
      .toDF("event_id", "ts", "amount")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Dedup.keepLatest(df, Seq("event_id"), col("ts"), col("amount"))
    assert(out.select("amount").as[Double].collect().toSeq == Seq(2.0))
  }

  test("numeric coercion: strings cast, garbage nulls (test_transform.py:23-35)") {
    val df = Seq("19.99", "abc", "", "42").toDF("amount")
    val out = df.select(tryDouble(col("amount"))).as[Option[Double]]
      .collect().toSeq
    assert(out == Seq(Some(19.99), None, None, Some(42.0)))
  }

  test("invalid event types quarantined with reason (test_transform.py:38-60)") {
    val df = Seq(("e1", "pageview"), ("e2", "refund_requested"), ("e3", "signup"))
      .toDF("event_id", "event")
    val (good, bad) = Quarantine.whitelistSplit(df, "event",
      Seq("pageview", "signup", "purchase"))
    assert(good.count() == 2)
    val b = bad.select("event_id", "reason").as[(String, String)].collect()
    assert(b.toSeq == Seq(("e2", "invalid_event")))
  }

  test("metrics consistency: good+bad = total (test_transform.py:81-94)") {
    val df = Seq("pageview", "signup", "bogus", "click_x").toDF("event")
    val (good, bad) = Quarantine.whitelistSplit(df, "event",
      Seq("pageview", "signup", "purchase"))
    assert(good.count() + bad.count() == df.count())
  }

  test("event-name canonicalization variants (test_transform.py:96-111)") {
    val df = Seq("Page View", "page_view", " PAGEVIEW ", "page-view", "signup")
      .toDF("event")
    val out = df.select(normalizeEventName(col("event"))).as[String]
      .collect().toSeq
    assert(out == Seq("pageview", "pageview", "pageview", "pageview", "signup"))
  }

  test("normalization is a fixpoint (applying twice = once)") {
    val df = Seq("Page View", "SIGN-UP", "ok").toDF("event")
    val once = df.select(normalizeEventName(col("event")).as("e"))
    val twice = once.select(normalizeEventName(col("e")).as("e"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("null-ish scrub: pandas artifacts become real nulls (transform.py:80-85)") {
    val df = Seq("u1", "", "nan", "None", "<NA>", " u2 ").toDF("user_id")
    val out = df.select(scrubNullish(col("user_id"))).as[Option[String]]
      .collect().toSeq
    assert(out == Seq(Some("u1"), None, None, None, None, Some("u2")))
  }

  test("multi-format ts: noon-pinning for date-only values (loader:55-57)") {
    val df = Seq("04-30-2022", "2022-04-30 13:45:00", "junk").toDF("raw")
    val out = df.select(date_format(
      multiFormatTs(col("raw"), Seq("MM-dd-yyyy", "yyyy-MM-dd HH:mm:ss")),
      "yyyy-MM-dd HH:mm:ss")).as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2022-04-30 12:00:00"),
      Some("2022-04-30 13:45:00"), None))
  }

  test("transform patches missing columns with typed nulls (schema drift)") {
    // Input lacking amount AND user_id — the reference fabricates them
    // (transform.py:49-50, 86-87); so do we, via ensureColumns.
    val ev = Seq(
      ("e1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "pageview"),
      ("e2", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "purchase"))
      .toDF("event_id", "ts", "event")
    val users = Seq(("u1", "US", "ads")).toDF(
      "user_id", "country", "signup_source")
    val r = graft.transform.CleanEvents.transform(ev, users)
    assert(r.cleaned.count() === 2)
    assert(r.cleaned.columns.contains("amount") &&
      r.cleaned.columns.contains("user_id"))
    assert(r.cleaned.filter(col("amount").isNotNull).count() === 0)
    assert(r.metrics("null_user_rows") === 2)
  }

  test("money scrub strips separators and sigils (loader:95-104)") {
    val df = Seq("$1,234.56", "₹99", "", "bad").toDF("v")
    val out = df.select(moneyScrub(col("v"))).as[Double].collect().toSeq
    assert(out == Seq(1234.56, 99.0, 0.0, 0.0))
  }
}
