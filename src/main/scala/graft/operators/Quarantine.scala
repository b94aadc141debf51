package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation / quarantine splitting (reference: ingest.py:21-65 required
  * fields + ts parse, transform.py:53-70 event-type whitelist, and the
  * quarantine-stream union run_pipeline.py:57-60).
  *
  * Each split is two complementary filters over the same scan — Catalyst
  * reuses the pushed-down scan for both sides, and neither side shuffles.
  * Reasons are computed columnar (`when(...)` chains), never row loops.
  */
object Quarantine {

  /** Split `df` on validity rules: returns (good, bad-with-reason).
    * `rules` is (reason → predicate-that-flags-bad); a row is bad if ANY
    * rule flags it, and `reason` is the comma-join of all firing rules —
    * mirroring the reference's `missing_fields=[...]` multi-reason records
    * (ingest.py:51-55). */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val anyBad = rules.map(_._2).reduce(_ || _)
    val reason = concat_ws(",",
      rules.map { case (r, p) => when(p, lit(r)) }: _*)
    val good = df.filter(!coalesce(anyBad, lit(false)))
    val bad = df.filter(coalesce(anyBad, lit(false)))
      .withColumn("reason", reason)
    (good, bad)
  }

  /** F1: event-type whitelist split (transform.py:8, 53-70). */
  def whitelistSplit(df: DataFrame, column: String,
                     allowed: Seq[String]): (DataFrame, DataFrame) =
    split(df, Seq(
      s"invalid_$column" -> !col(column).isin(allowed.map(lit): _*)))

  /** U1: union heterogeneous quarantine streams (run_pipeline.py:57-60).
    * `allowMissingColumns` because bad records carry different field sets. */
  def unionQuarantines(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
}
