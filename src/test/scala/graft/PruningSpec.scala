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
