package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CleanFns._
import graft.operators.{Dedup, Upsert}

/** The star-schema load layer (reference: pipeline/load.py +
  * sql/warehouse_star.sql): dim extraction (A6), surrogate keys (D2),
  * dim_dates (A8), keyed fact upsert (D1) — persisted as parquet tables
  * under a warehouse root, partitioned by event_date (the analog of the
  * reference's B-tree date indexes, warehouse_star.sql:71-77 — gives
  * partition pruning on every date predicate at scale).
  */
class StarWarehouse(spark: SparkSession, root: String) {

  def path(table: String): String = s"$root/$table"

  /** Partition-column type inference would read the `event_date=...`
    * directory keys back as DATE; the warehouse contract is the reference's
    * 'yyyy-MM-dd' string (warehouse_star.sql:34,46), so normalize on read. */
  def read(table: String): DataFrame = {
    val df = spark.read.parquet(path(table))
    if (df.columns.contains("event_date"))
      df.withColumn("event_date",
        org.apache.spark.sql.functions.col("event_date").cast("string"))
    else df
  }

  private def exists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** dim_users from the cleaned (joined) events — the reference feeds the
    * joined frame, so users with no events never reach dim_users
    * (run_pipeline.py:65-70; SURVEY.md §3.1.4). F7: blank keys dropped. */
  def upsertDimUsers(cleaned: DataFrame): Unit = {
    val incoming = cleaned
      .filter(col("user_id").isNotNull && trim(col("user_id")) =!= "")
      .select(col("user_id"),
        defaultFill(col("country")).as("country"),
        defaultFill(col("signup_source")).as("signup_source"))
    val latest = Dedup.keepLatest(incoming, Seq("user_id"),
      lit(1), Dedup.rowHash(incoming))
    val merged = if (exists("dim_users"))
      Upsert.upsert(read("dim_users"), latest, Seq("user_id"), lit(1),
        Dedup.rowHash(latest))
    else latest
    Upsert.overwriteViaSwap(spark, merged, path("dim_users"))
  }

  /** Enum dims with deterministic surrogate keys (D2). INSERT OR IGNORE
    * semantics: existing natural keys keep their ids; new keys extend the
    * sequence in sorted order (load.py:75-79). */
  def upsertEnumDim(values: DataFrame, naturalKey: String, idCol: String,
                    table: String): DataFrame = {
    val incoming = values.select(col(naturalKey)).distinct()
    val merged = if (exists(table)) {
      val existing = read(table)
      val maxId = existing.agg(coalesce(max(col(idCol)), lit(0L)))
        .collect()(0).getLong(0)
      val fresh = incoming.join(existing, Seq(naturalKey), "left_anti")
      val freshWithIds = Upsert.withSurrogateKey(fresh, naturalKey, idCol)
        .withColumn(idCol, col(idCol) + maxId)
      existing.unionByName(freshWithIds)
    } else Upsert.withSurrogateKey(incoming, naturalKey, idCol)
    Upsert.overwriteViaSwap(spark, merged, path(table))
    read(table)
  }

  /** dim_dates (A8), INSERT OR IGNORE by date_key. */
  def upsertDimDates(dateKeys: DataFrame, keyCol: String): Unit = {
    val incoming = Upsert.dimDates(dateKeys, keyCol)
    val merged = if (exists("dim_dates"))
      read("dim_dates").unionByName(
        incoming.join(read("dim_dates"), Seq("date_key"), "left_anti"))
    else incoming
    Upsert.overwriteViaSwap(spark, merged, path("dim_dates"))
  }

  /** fact_events upsert (D1, load.py:251-297): resolves event_type_id via
    * broadcast join against the enum dim (J4), derives date/hour, keyed on
    * event_id with latest-ts-wins. Partitioned by event_date on disk. */
  def upsertFactEvents(cleaned: DataFrame): Unit = {
    val dimTypes = upsertEnumDim(cleaned.select(col("event")), "event",
      "event_type_id", "dim_event_types")
    upsertDimDates(cleaned.select(col("event_date")), "event_date")
    val incoming = cleaned
      .join(broadcast(dimTypes), Seq("event"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type_id"), col("amount"), col("event_date"),
        col("event_hour"))
    val merged = if (exists("fact_events"))
      Upsert.upsert(read("fact_events"), incoming, Seq("event_id"),
        col("ts"), Dedup.rowHash(incoming))
    else Dedup.keepLatest(incoming, Seq("event_id"), col("ts"),
      Dedup.rowHash(incoming))
    val tmp = path("fact_events") + "__tmp"
    merged.write.mode("overwrite").partitionBy("event_date").parquet(tmp)
    val hconf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path("fact_events"))
    val fs = dst.getFileSystem(hconf)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
