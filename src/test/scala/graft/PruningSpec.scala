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
}
