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
