package graft

import java.nio.file.{Files, Paths}

/** End-to-end pipeline test over reference-shaped synthetic input
  * (mirrors /root/reference/scripts/generate_events.py:23-49: invalid event
  * types, null-ish user ids, one bad timestamp, a duplicate event_id, a
  * malformed JSON line, a line missing required fields) — then the
  * idempotence invariant: running the pipeline twice leaves the warehouse
  * exactly as one run (SURVEY.md §2.9: exactly-once via deterministic
  * replay). */
class PipelineSpec extends SparkSpec {

  private def writeFixtures(dir: String): (String, String) = {
    val events = Seq(
      """{"event_id":"e1","ts":"2024-03-01T10:00:00Z","event":"pageview","user_id":"u1","amount":"10.5"}""",
      """{"event_id":"e2","ts":"2024-03-01T11:00:00Z","event":"Page View","user_id":"u2"}""",
      """{"event_id":"e3","ts":"2024-03-01T12:00:00Z","event":"signup","user_id":"u1"}""",
      """{"event_id":"e4","ts":"2024-03-02T09:00:00Z","event":"purchase","user_id":"u2","amount":"99.99"}""",
      """{"event_id":"e4","ts":"2024-03-02T10:30:00Z","event":"purchase","user_id":"u2","amount":"120.00"}""",
      """{"event_id":"e5","ts":"2024-03-02T09:30:00Z","event":"refund_requested","user_id":"u3"}""",
      """{"event_id":"e6","ts":"BAD_TIME","event":"pageview","user_id":"u1"}""",
      """{"event_id":"e7","ts":"2024-03-02T11:00:00Z","event":"purchase","user_id":"nan","amount":"5"}""",
      """{"ts":"2024-03-02T12:00:00Z","event":"pageview"}""",
      """this is not json at all"""
    ).mkString("\n")
    val users = "user_id,country,signup_source\nu1,DE,organic\nu2,US,ads\nu9,FR,organic\n"
    val ep = Paths.get(dir, "events.jsonl")
    val up = Paths.get(dir, "users.csv")
    Files.writeString(ep, events)
    Files.writeString(up, users)
    (ep.toString, up.toString)
  }

  test("pipeline end-to-end: quarantine, dedup, star load, exports") {
    val dir = Files.createTempDirectory("graft_e2e").toString
    val (ev, us) = writeFixtures(dir)
    val report = Pipeline.run(spark, ev, us, s"$dir/wh", s"$dir/out")

    // good rows: e1,e2,e3,e4(dedup→1),e7 = 5; bad: e5,e6,missing,garbage
    assert(report.metrics("rows_out") == 5L)
    assert(report.metrics("invalid_event_type") == 1L)
    assert(report.metrics("bad_records_total") == 4L)

    val wh = new graft.warehouse.StarWarehouse(spark, s"$dir/wh")
    val fact = wh.read("fact_events")
    assert(fact.count() == 5)
    // dedup kept the LATEST e4 (amount 120.00)
    val e4 = fact.filter(fact("event_id") === "e4").collect()(0)
    assert(e4.getAs[Double]("amount") == 120.0)
    // "nan" user scrubbed to null → not in dim_users; u9 has no events
    val dimUsers = wh.read("dim_users").collect().map(_.getString(0)).toSet
    assert(dimUsers == Set("u1", "u2"))
    // canonicalization: "Page View" → pageview in dim_event_types
    val types = wh.read("dim_event_types").collect()
      .map(_.getAs[String]("event")).toSet
    assert(types == Set("pageview", "signup", "purchase"))
    // exports exist with data
    assert(spark.read.option("header", "true").csv(s"$dir/out/dau")
      .count() > 0)
    assert(Files.exists(Paths.get(s"$dir/out/quality_report.json")))
  }

  private def writeIntlFixture(dir: String): String = {
    // Canonical intl-sales records (the Kaggle loader's staging output,
    // kaggle_amazon_sales_loader.py:234-246): two customers, two SKUs, one
    // duplicate sale_id (s2, later ts wins), one null-customer row that the
    // load must skip (load.py:184-186).
    val intl = Seq(
      """{"sale_id":"s1","ts":"2024-03-01T12:00:00","date_key":"2024-03-01","customer":"acme","sku":"sku_a","pcs":2,"rate":10.0,"gross_amt":20.0,"currency":"INR","source_dataset":"intl.csv"}""",
      """{"sale_id":"s2","ts":"2024-03-01T12:00:00","date_key":"2024-03-01","customer":"acme","sku":"sku_b","pcs":1,"rate":5.0,"gross_amt":5.0,"currency":"INR","source_dataset":"intl.csv"}""",
      """{"sale_id":"s2","ts":"2024-03-02T12:00:00","date_key":"2024-03-02","customer":"acme","sku":"sku_b","pcs":3,"rate":5.0,"gross_amt":15.0,"currency":"INR","source_dataset":"intl.csv"}""",
      """{"sale_id":"s3","ts":"2024-03-02T13:00:00","date_key":"2024-03-02","customer":"zenith","sku":"sku_a","pcs":4,"rate":2.5,"gross_amt":10.0,"currency":"USD","source_dataset":"intl.csv"}""",
      """{"sale_id":"s4","ts":"2024-03-02T14:00:00","date_key":"2024-03-02","customer":null,"sku":"sku_a","pcs":1,"rate":1.0,"gross_amt":1.0,"currency":"INR","source_dataset":"intl.csv"}"""
    ).mkString("\n")
    val ip = Paths.get(dir, "international_sales.jsonl")
    Files.writeString(ip, intl)
    ip.toString
  }

  test("pipeline international branch: intl fact + dims + exports") {
    val dir = Files.createTempDirectory("graft_e2e_intl").toString
    val (ev, us) = writeFixtures(dir)
    val intl = writeIntlFixture(dir)
    val report = Pipeline.run(spark, ev, us, s"$dir/wh", s"$dir/out",
      intlJsonl = Some(intl))

    // s1, s2 (deduped keep-latest), s3; s4 skipped (null customer)
    assert(report.metrics("intl_sales_rows") == 3L)
    val wh = new graft.warehouse.StarWarehouse(spark, s"$dir/wh")
    val fact = wh.read("fact_international_sales")
    assert(fact.count() == 3)
    val s2 = fact.filter(fact("sale_id") === "s2").collect()(0)
    assert(s2.getAs[Double]("gross_amt") == 15.0)
    assert(s2.getAs[String]("date_key") == "2024-03-02")
    // surrogate keys: sorted insertion order (load.py:108-131)
    val cust = wh.read("dim_customers").collect()
      .map(r => r.getAs[String]("customer_name") ->
        r.getAs[Long]("customer_id")).toMap
    assert(cust == Map("acme" -> 1L, "zenith" -> 2L))
    val prod = wh.read("dim_products").collect()
      .map(r => r.getAs[String]("sku") -> r.getAs[Long]("product_id")).toMap
    assert(prod == Map("sku_a" -> 1L, "sku_b" -> 2L))
    // dim_dates covers the intl date_keys too (load.py:158-160)
    val dates = wh.read("dim_dates").collect()
      .map(_.getAs[String]("date_key")).toSet
    assert(Set("2024-03-01", "2024-03-02").subsetOf(dates))
    // all five analytics exports + the preview exist (run_pipeline.py:82-102,
    // analytics.py:130-150)
    for (e <- Seq("dau", "revenue", "event_counts", "funnel",
        "international_revenue", "fact_events_preview"))
      assert(spark.read.option("header", "true").csv(s"$dir/out/$e")
        .columns.nonEmpty, s"export $e missing")
    val intlRev = spark.read.option("header", "true")
      .csv(s"$dir/out/international_revenue")
    assert(intlRev.columns.toSeq == Seq("event_date", "intl_revenue"))
    assert(intlRev.count() == 2) // two distinct sale dates
    val preview = spark.read.option("header", "true")
      .csv(s"$dir/out/fact_events_preview")
    assert(preview.columns.toSeq == Seq("event_id", "ts", "user_id",
      "event_type_id", "amount", "event_date", "event_hour", "country",
      "signup_source"))
    assert(preview.count() == 5) // all 5 fact rows (< LIMIT 50)
    // u1's country resolved through the dim_users left join
    val p1 = preview.filter(preview("event_id") === "e1").collect()(0)
    assert(p1.getAs[String]("country") == "DE")
  }

  test("pipeline without intl file: empty intl export, no intl tables") {
    val dir = Files.createTempDirectory("graft_e2e_noint").toString
    val (ev, us) = writeFixtures(dir)
    Pipeline.run(spark, ev, us, s"$dir/wh", s"$dir/out",
      intlJsonl = Some(s"$dir/does_not_exist.jsonl"))
    val wh = new graft.warehouse.StarWarehouse(spark, s"$dir/wh")
    assert(!wh.tableExists("fact_international_sales"))
    // the fallback export still exists with the 2-column header
    // (analytics.py:139-142)
    val intlRev = spark.read.option("header", "true")
      .csv(s"$dir/out/international_revenue")
    assert(intlRev.columns.toSeq == Seq("event_date", "intl_revenue"))
    assert(intlRev.count() == 0)
  }

  test("intl branch is idempotent: replaying the same batch is a no-op") {
    val dir = Files.createTempDirectory("graft_e2e_intl2").toString
    val (ev, us) = writeFixtures(dir)
    val intl = writeIntlFixture(dir)
    Pipeline.run(spark, ev, us, s"$dir/wh", s"$dir/out", Some(intl))
    val wh = new graft.warehouse.StarWarehouse(spark, s"$dir/wh")
    val snap1 = wh.read("fact_international_sales").orderBy("sale_id")
      .collect().toSeq
    val cust1 = wh.read("dim_customers").orderBy("customer_id")
      .collect().toSeq
    Pipeline.run(spark, ev, us, s"$dir/wh", s"$dir/out", Some(intl))
    val snap2 = wh.read("fact_international_sales").orderBy("sale_id")
      .collect().toSeq
    val cust2 = wh.read("dim_customers").orderBy("customer_id")
      .collect().toSeq
    assert(snap1 == snap2)
    assert(cust1 == cust2)
  }

  test("pipeline is idempotent: second run leaves warehouse unchanged") {
    val dir = Files.createTempDirectory("graft_e2e2").toString
    val (ev, us) = writeFixtures(dir)
    Pipeline.run(spark, ev, us, s"$dir/wh", s"$dir/out")
    val wh = new graft.warehouse.StarWarehouse(spark, s"$dir/wh")
    val snap1 = wh.read("fact_events").orderBy("event_id").collect().toSeq
    val types1 = wh.read("dim_event_types").orderBy("event_type_id")
      .collect().toSeq
    Pipeline.run(spark, ev, us, s"$dir/wh", s"$dir/out")
    val snap2 = wh.read("fact_events").orderBy("event_id").collect().toSeq
    val types2 = wh.read("dim_event_types").orderBy("event_type_id")
      .collect().toSeq
    assert(snap1 == snap2)
    assert(types1 == types2)
  }
}
