package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Proves the partition-pruning claim: a date predicate over the
  * event_date-partitioned warehouse reads ONLY the matching partition
  * directories — the analog of the reference's B-tree date indexes
  * (sql/warehouse_star.sql:71-77) with zero index structures. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("date predicate prunes warehouse partitions at planning time") {
    val root = Files.createTempDirectory("graft_pruning").toString
    (1 to 300).map { i =>
      (i.toLong, f"2024-01-${i % 30 + 1}%02d", i * 1.0)
    }.toDF("event_id", "event_date", "value")
      .write.mode("overwrite").partitionBy("event_date").parquet(root)

    val q = spark.read.parquet(root)
      .filter(col("event_date") === "2024-01-07")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

    assert(scan.partitionFilters.nonEmpty,
      "date predicate must become a partition filter, not a row filter")
    // Planning-time file listing: exactly 1 of 30 partitions survives.
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum ===
      scan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum / 30)
    assert(q.count() === 10)
  }

  test("date predicate prunes the PIPELINE-WRITTEN warehouse, end to end") {
    // Not a hand-built fixture: run the real ingest→load path and prove
    // the fact table it persists carries the partition layout the scale
    // claim depends on (the analog of warehouse_star.sql:71-77's date
    // index, but enforced at storage layout level).
    val dir = Files.createTempDirectory("graft_e2e_prune").toString
    val events = Seq(
      """{"event_id":"p1","ts":"2024-03-01T10:00:00Z","event":"pageview","user_id":"u1"}""",
      """{"event_id":"p2","ts":"2024-03-01T11:00:00Z","event":"signup","user_id":"u2"}""",
      """{"event_id":"p3","ts":"2024-03-02T09:00:00Z","event":"purchase","user_id":"u1","amount":"7"}""",
      """{"event_id":"p4","ts":"2024-03-03T09:00:00Z","event":"pageview","user_id":"u2"}"""
    ).mkString("\n")
    val users = "user_id,country,signup_source\nu1,DE,organic\nu2,US,ads\n"
    Files.writeString(java.nio.file.Paths.get(dir, "events.jsonl"), events)
    Files.writeString(java.nio.file.Paths.get(dir, "users.csv"), users)
    Pipeline.run(spark, s"$dir/events.jsonl", s"$dir/users.csv",
      s"$dir/wh", s"$dir/out")

    val wh = new graft.warehouse.StarWarehouse(spark, s"$dir/wh")
    val q = wh.read("fact_events")
      .filter(col("event_date") === "2024-03-01")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "warehouse-contract read must still plan a partition filter")
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).size
    val total = scan.relation.location.listFiles(Nil, Nil).size
    assert(total === 3, s"expected one partition per event date, got $total")
    assert(selected === 1,
      s"date predicate must prune to one partition, kept $selected/$total")
    assert(q.count() === 2)
  }

  test("dim-filtered join prunes fact partitions at RUNTIME (DPP)") {
    // The 100 TB shape: the fact side is date-partitioned, the filter
    // lives on a DIMENSION (calendar) table — static pruning can't see
    // it, dynamic partition pruning must inject the dim's date set into
    // the fact scan as a runtime subquery filter.
    val root = Files.createTempDirectory("graft_dpp").toString
    (1 to 300).map { i =>
      (i.toLong, f"2024-01-${i % 30 + 1}%02d", i * 1.0)
    }.toDF("event_id", "event_date", "value")
      .write.mode("overwrite").partitionBy("event_date").parquet(root)
    // The dim must be a real source (not a LocalRelation, whose filter
    // constant-folds away) for DPP's selective-predicate check to see it.
    // (and the predicate must be a real comparison — DPP's
    // isLikelySelective check rejects a bare boolean attribute).
    val dimRoot = Files.createTempDirectory("graft_dpp_dim").toString
    (1 to 30).map(d =>
        (f"2024-01-$d%02d", if (d % 7 == 0) "special" else "normal"))
      .toDF("cal_date", "day_type")
      .write.mode("overwrite").parquet(dimRoot)
    val dim = spark.read.parquet(dimRoot)

    val q = spark.read.parquet(root)
      .join(dim.filter(col("day_type") === "special"),
        col("event_date") === col("cal_date"))
      .groupBy("event_date").agg(sum(col("value")).as("v"))
    q.collect() // finalize the adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") ||
      plan.contains("dynamicpruningexpression"),
      s"fact scan must carry a dynamic-pruning filter:\n${plan.take(800)}")
    assert(q.count() === 4) // days 7/14/21/28 only
  }
}
