package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ingest.{JsonlIngest, KaggleNormalizer}

/** Ingest + Kaggle-normalizer behavior (reference: ingest.py:28-78 and
  * kaggle_amazon_sales_loader.py — the modules the reference leaves
  * untested, SURVEY.md §5.1). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl ingest quarantines with per-cause reasons (ingest.py:45-65)") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    Files.writeString(Paths.get(dir, "ev.jsonl"), Seq(
      """{"event_id":"a","ts":"2024-01-01T00:00:00Z","event":"pageview"}""",
      """{"event_id":"b","event":"signup","ts":null}""",
      """{"event_id":"c","ts":"NOT_A_TIME","event":"purchase"}""",
      """broken{json"""
    ).mkString("\n"))
    val (good, bad) = JsonlIngest.readEvents(spark, s"$dir/ev.jsonl")
    assert(good.count() == 1)
    val reasons = bad.select("reason").as[String].collect().sorted.toSeq
    assert(reasons == Seq("invalid_timestamp", "missing_fields:ts",
      "unparseable_json"))
  }

  test("amazon normalizer: picks, money scrub, derived amount, outlier skip") {
    val raw = Seq(
      // normal row, $-decorated amount
      ("o1", "04-30-2022", "2", "$1,234.56", "", ""),
      // amount 0 → derived qty*rate (G12, loader:158-159)
      ("o2", "04-30-2022", "3", "0", "50.5", ""),
      // outlier > 250k skipped (F5)
      ("o3", "04-30-2022", "1", "999999", "", ""),
      // unparseable date skipped (F6)
      ("o4", "not-a-date", "1", "10", "", "")
    ).toDF("Order ID", "Date", "Qty", "Amount", "Rate", "currency")
    val out = KaggleNormalizer.normalizeAmazonEvents(raw)
      .orderBy("order_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("amount") == 1234.56)
    assert(out(1).getAs[Double]("amount") == 151.5)
    // noon-pinning of date-only values (loader:55-57)
    assert(out(0).getAs[java.sql.Timestamp]("ts").toString
      .contains("12:00:00"))
    // deterministic 24-hex ids (G13)
    assert(out.forall(_.getAs[String]("event_id").matches("[0-9a-f]{24}")))
  }

  test("international normalizer: strict date-token filter (F4)") {
    val raw = Seq(
      ("06-05-21", "ACME", "SKU1", "5", "100", "500"),
      ("SKU-JUNK", "ACME", "SKU2", "1", "10", "10"), // rejected by regex
      ("06-06-21", "", "SKU3", "2", "20", "40")      // blank customer → default
    ).toDF("DATE", "CUSTOMER", "SKU", "PCS", "RATE", "GROSS AMT")
    val out = KaggleNormalizer.normalizeInternationalSales(raw)
      .orderBy("date_key").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("date_key") == "2021-06-05")
    assert(out(1).getAs[String]("customer") == "unknown_customer")
  }

  test("loader stats: one-pass skip-cause accounting reconciles with the " +
    "written rows (loader:124-129, 194-199)") {
    val intlRaw = Seq(
      ("06-05-21", "ACME", "SKU1", "5", "100", "500"),       // written
      ("SKU-JUNK", "ACME", "SKU2", "1", "10", "10"),         // bad_date
      ("", "ACME", "SKU2", "1", "10", "10"),                 // blank → no_ts
      ("06-07-21", "ACME", "SKU3", "2", "20", "9999999")     // outlier
    ).toDF("DATE", "CUSTOMER", "SKU", "PCS", "RATE", "GROSS AMT")
    val s = KaggleNormalizer.intlStats(intlRaw).collect()(0)
    assert(s.getAs[Long]("rows_total") == 4)
    assert(s.getAs[Long]("written") == 1)
    assert(s.getAs[Long]("skipped_bad_date_value") == 1)
    assert(s.getAs[Long]("skipped_no_ts") == 1)
    assert(s.getAs[Long]("skipped_amount_outlier") == 1)
    // stats reconcile with what the normalizer actually writes
    assert(KaggleNormalizer.normalizeInternationalSales(intlRaw).count() ==
      s.getAs[Long]("written"))

    val amazonRaw = Seq(
      ("o1", "04-30-2022", "2", "$50", ""),       // written
      ("o2", "not a date", "1", "$10", ""),       // no_ts
      ("o3", "05-01-2022", "1", "$999999", "")    // outlier
    ).toDF("Order ID", "Date", "Qty", "Amount", "Rate")
    val a = KaggleNormalizer.amazonStats(amazonRaw).collect()(0)
    assert(a.getAs[Long]("rows_total") == 3)
    assert(a.getAs[Long]("written") == 1)
    assert(a.getAs[Long]("skipped_bad_date_value") == 0)
    assert(a.getAs[Long]("skipped_no_ts") == 1)
    assert(a.getAs[Long]("skipped_amount_outlier") == 1)
    assert(KaggleNormalizer.normalizeAmazonEvents(amazonRaw).count() ==
      a.getAs[Long]("written"))
  }

  test("pickFirst coalesces header variants, blank-aware (G9)") {
    val df = Seq(("", "fallback"), ("primary", "ignored"))
      .toDF("A", "B")
    val out = df.select(graft.functions.CleanFns.pickFirst(col("A"), col("B")))
      .as[String].collect().toSeq
    assert(out == Seq("fallback", "primary"))
  }
}
