package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.JsonlIngest
import graft.transform.CleanEvents
import graft.warehouse.StarWarehouse
import graft.export.Sinks
import graft.operators.Quarantine

/** End-to-end ETL orchestration — the analog of the reference's
  * `python -m pipeline.run_pipeline` (run_pipeline.py:29-122; lifecycle
  * traced in SURVEY.md §3.1): ingest → transform → quarantine union →
  * star-schema load → analytics exports → quality report.
  *
  * Everything between ingest and the writes is ONE lazy DAG; actions happen
  * only at the sinks and the metrics pass. Idempotence comes from keyed
  * upserts + deterministic ids, exactly as in the reference (§2.9) — run
  * the pipeline twice over the same input and the warehouse is unchanged
  * (tested in PipelineSpec).
  */
object Pipeline {

  case class RunReport(metrics: Map[String, Long])

  def run(spark: SparkSession, eventsJsonl: String, usersCsv: String,
          warehouseRoot: String, exportRoot: String): RunReport = {
    // 1. ingest (S1–S4)
    val (rawEvents, badIngest) = JsonlIngest.readEvents(spark, eventsJsonl)
    val users = JsonlIngest.readUsersCsv(spark, usersCsv)

    // 2. transform (G1–G5, F1, A5, J1, A7)
    val t = CleanEvents.transform(rawEvents, users)

    // 3. quarantine union (U1) → JSONL (K2)
    val allBad = Quarantine.unionQuarantines(Seq(
      badIngest,
      t.bad.select(to_json(struct(t.bad.columns.map(col).toSeq: _*))
        .as("raw"), col("reason"))))
    JsonlIngest.writeBadRecords(allBad, s"$exportRoot/bad_records")

    // 4. load (D1/D2/A8, J4)
    val wh = new StarWarehouse(spark, warehouseRoot)
    wh.upsertDimUsers(t.cleaned)
    wh.upsertFactEvents(t.cleaned)

    // 5. analytics read side (A1–A4) over the warehouse → CSV (K1)
    val fact = wh.read("fact_events")
    val dimTypes = wh.read("dim_event_types")
    val joined = fact.join(broadcast(dimTypes), Seq("event_type_id"))
      .withColumnRenamed("event", "event_type")
      .withColumn("user_id", col("user_id").cast("string"))
      .withColumn("value", col("amount"))
    Sinks.writeCsv(analyticsDau(joined), s"$exportRoot/dau")
    Sinks.writeCsv(analyticsRevenue(joined), s"$exportRoot/revenue")
    Sinks.writeCsv(analyticsEventCounts(joined), s"$exportRoot/event_counts")
    Sinks.writeCsv(analyticsFunnel(joined), s"$exportRoot/funnel")

    // 6. quality report (K3)
    val metrics = t.metrics ++ Map(
      "bad_records_total" -> allBad.count(),
      "fact_events_rows" -> fact.count())
    Sinks.writeQualityReport(metrics, s"$exportRoot/quality_report.json")
    RunReport(metrics)
  }

  // The four event-analytics queries over a (fact ⋈ dim) frame whose
  // column names match the fixture-facing EventAnalytics contract.
  private def analyticsDau(df: DataFrame): DataFrame =
    graft.analytics.EventAnalytics.dau(df)
  private def analyticsRevenue(df: DataFrame): DataFrame =
    graft.analytics.EventAnalytics.revenue(df)
  private def analyticsEventCounts(df: DataFrame): DataFrame =
    graft.analytics.EventAnalytics.eventCounts(df)
  private def analyticsFunnel(df: DataFrame): DataFrame =
    graft.analytics.EventAnalytics.funnel(df)
}
