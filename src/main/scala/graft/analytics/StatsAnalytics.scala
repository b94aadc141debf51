package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Distribution / statistical analytics beyond the reference's five-query
  * contract (SURVEY.md §7.5 beyond-parity): fixed-width histograms,
  * z-score anomaly flagging, percentile winsorization, and deterministic
  * A/B lift. Each is a standard training-data-curation or product-analytics
  * primitive, expressed so the expensive part stays in one shuffle and the
  * small derived frame (per-group stats) is broadcast back.
  */
object StatsAnalytics
  extends StatsProfiling with StatsSeries with StatsCausal
  with StatsTests


/** Literal trig tables for [[StatsAnalytics.periodogram]], shared
  * verbatim between the Column expressions and the DuckDB oracle SQL:
  * cos/sin are libm-divergent across engines, so both sides multiply by
  * the SAME double literals (the adstock weight-literal discipline).
  * Scala's Double.toString is the shortest round-tripping decimal, so
  * the SQL parse recovers bit-identical values. */
object PeriodogramTables {
  val cosTab: Map[Int, Array[Double]] = (2 to 14).map(p =>
    p -> Array.tabulate(p)(r => math.cos(2.0 * math.Pi * r / p))).toMap
  val sinTab: Map[Int, Array[Double]] = (2 to 14).map(p =>
    p -> Array.tabulate(p)(r => math.sin(2.0 * math.Pi * r / p))).toMap
}
