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
          warehouseRoot: String, exportRoot: String,
          intlJsonl: Option[String] = None): RunReport = {
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

    // 4b. optional international-sales branch (S6; run_pipeline.py:73-79):
    // load the canonical intl JSONL into fact_international_sales +
    // dim_customers/dim_products when the file exists, else skip silently.
    val intlRows: Option[Long] = intlJsonl.filter(existsPath(spark, _)).map {
      p =>
        wh.upsertFactInternationalSales(
          JsonlIngest.readInternationalSales(spark, p))
        wh.read("fact_international_sales").count()
    }

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

    // 5b. international revenue export with the reference's missing-table
    // fallback (analytics.py:55-68, 139-142): if the intl fact is absent,
    // still export an empty 2-column CSV.
    val intlRev =
      if (wh.tableExists("fact_international_sales"))
        graft.analytics.EventAnalytics.substrRevenue(
            wh.read("fact_international_sales"),
            col("ts"), col("gross_amt"))
          .withColumnRenamed("revenue", "intl_revenue")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_date",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("intl_revenue",
            org.apache.spark.sql.types.DoubleType))))
    Sinks.writeCsv(intlRev, s"$exportRoot/international_revenue")

    // 5c. fact preview export (run_pipeline.py:82-102): ts-ordered top-50
    // with user attributes. Scale shape: TakeOrderedAndProject the fact
    // FIRST, then semi-reduce dim_users to just the previewed users and
    // broadcast that — dim_users (user-cardinality) is never shuffled or
    // broadcast whole, only scanned.
    val pv = fact.orderBy(col("ts"), col("event_id")).limit(50)
    val dimUsers = wh.read("dim_users")
    val relevantUsers = dimUsers.join(
      broadcast(pv.select("user_id").distinct()), Seq("user_id"), "left_semi")
    val preview = pv.join(broadcast(relevantUsers), Seq("user_id"), "left")
      .select("event_id", "ts", "user_id", "event_type_id", "amount",
        "event_date", "event_hour", "country", "signup_source")
      .orderBy(col("ts"), col("event_id"))
    Sinks.writeCsv(preview, s"$exportRoot/fact_events_preview")

    // 6. quality report (K3)
    val metrics = t.metrics ++ Map(
      "bad_records_total" -> allBad.count(),
      "fact_events_rows" -> fact.count()) ++
      intlRows.map("intl_sales_rows" -> _)
    Sinks.writeQualityReport(metrics, s"$exportRoot/quality_report.json")
    RunReport(metrics)
  }

  private def existsPath(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
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
