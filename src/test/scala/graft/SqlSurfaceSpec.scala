package graft

import org.apache.spark.sql.functions._
import graft.analytics.EventAnalytics

/** The engine's second entry surface: plain Spark SQL over registered
  * views produces the same results (and substantially the same plans) as
  * the DataFrame builders — a reference user who writes SQL can keep
  * writing SQL. */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spark.sql DAU and revenue match the DataFrame builders") {
    Tables.events(spark, sf).createOrReplaceTempView("events_v")
    val sqlDau = spark.sql(
      """SELECT date_format(ts, 'yyyy-MM-dd') AS event_date,
           count(DISTINCT user_id) AS dau
         FROM events_v WHERE user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""")
    val dfDau = EventAnalytics.dau(Tables.events(spark, sf))
    assert(sqlDau.exceptAll(dfDau).isEmpty && dfDau.exceptAll(sqlDau).isEmpty)

    val sqlRev = spark.sql(
      """SELECT date_format(ts, 'yyyy-MM-dd') AS event_date,
           round(sum(coalesce(value, 0)), 2) AS revenue
         FROM events_v WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""")
    val dfRev = EventAnalytics.revenue(Tables.events(spark, sf))
    assert(sqlRev.exceptAll(dfRev).isEmpty && dfRev.exceptAll(sqlRev).isEmpty)
  }
}
