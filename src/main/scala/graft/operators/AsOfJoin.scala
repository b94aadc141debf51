package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single right row with the
  * greatest `rightTime` ≤ `leftTime` within the same key (inner semantics —
  * left rows with no prior right row are dropped). The operator Spark
  * doesn't ship, and the nearest-prior-snapshot primitive a training-data
  * pipeline needs (price as of event time, dimension version as of ingest
  * time, …). Semantics match DuckDB's `ASOF JOIN … ON l.k = r.k AND
  * l.t >= r.t`, which serves as the oracle.
  *
  * Scale shape — why union + running window, not a range join:
  * both sides shuffle ONCE on the key, are sorted by (time, side) within
  * the key partition, and a running `last(…, ignoreNulls)` carries the
  * most recent right payload forward onto each left row. Cost is
  * sort-merge-like: O(|L|+|R|) rows moved, one shuffle, no pair blow-up.
  * The naive alternative — `l.join(r, l.k === r.k && l.t >= r.t)` then
  * keep max — materializes every (left × earlier-right) pair before
  * pruning, which is quadratic per key at 100 TB. Right rows sort before
  * left rows at equal timestamps, so the join is inclusive (≥).
  *
  * Determinism: the right side must be unique per (key, time) — ties there
  * have no defined winner (same as DuckDB). Pre-aggregate to one row per
  * (key, time) first, as `q_asof_join` does.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    require(left.columns.forall(!_.startsWith("__asof_")),
      "left must not contain __asof_* columns")
    val payloadCols = right.columns.filter(_ != rightKey).toSeq
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right payload columns must not collide with left columns " +
        s"(rename first): ${clash.mkString(", ")}")
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType

    val rTagged = right.select(
      Seq(col(rightKey).as("__asof_k"),
        col(rightTime).cast("timestamp").as("__asof_t"),
        lit(0).as("__asof_side"), payloadStruct.as("__asof_r")) ++
        left.columns.toSeq.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(leftKey).as("__asof_k"),
        col(leftTime).cast("timestamp").as("__asof_t"),
        lit(1).as("__asof_side"),
        lit(null).cast(payloadType).as("__asof_r")) ++
        left.columns.toSeq.map(col): _*)

    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__asof_m", last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1 && col("__asof_m").isNotNull)
      .select(left.columns.toSeq.map(col) ++
        payloadCols.map(c => col(s"__asof_m.`$c`").as(c)): _*)
  }
}
