package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract validation — the expectation suite a warehouse runs
  * before publishing a snapshot: referential integrity (anti-joins, which
  * AQE plans as broadcast or shuffle semi/anti joins by side size),
  * key uniqueness (count vs distinct — one aggregate, no self-join), and
  * range/null scans (map-side predicates). Each check collapses to one
  * row before the union, so the report costs one pass per table
  * regardless of scale. Reference analog: the loader's validation stage
  * (validate.py) checks nulls and types row-by-row in Python; here the
  * checks are declarative aggregates the optimizer can fuse.
  */
object DataContract {

  private def row(name: String, viol: DataFrame,
                  total: DataFrame): DataFrame =
    viol.crossJoin(broadcast(total))
      .select(lit(name).as("check_name"), col("n_violations"),
        col("n_checked"))

  def report(orders: DataFrame, customer: DataFrame, lineitem: DataFrame,
             events: DataFrame): DataFrame = {
    val fkOrders = row("orders_customer_fk",
      orders.join(customer.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations")),
      orders.agg(count(lit(1)).as("n_checked")))
    val fkLineitem = row("lineitem_orders_fk",
      lineitem.join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations")),
      lineitem.agg(count(lit(1)).as("n_checked")))
    val dupEvents = events.agg(
      (count(col("event_id")) - countDistinct(col("event_id")))
        .as("n_violations"),
      count(lit(1)).as("n_checked"))
      .select(lit("events_id_unique").as("check_name"),
        col("n_violations"), col("n_checked"))
    val negValues = row("events_value_nonnegative",
      events.filter(col("value") < 0)
        .agg(count(lit(1)).as("n_violations")),
      events.filter(col("value").isNotNull)
        .agg(count(lit(1)).as("n_checked")))
    val nullUsers = row("events_user_present",
      events.filter(col("user_id").isNull)
        .agg(count(lit(1)).as("n_violations")),
      events.agg(count(lit(1)).as("n_checked")))
    fkOrders.unionAll(fkLineitem).unionAll(dupEvents)
      .unionAll(negValues).unionAll(nullUsers)
      .orderBy("check_name")
  }
}
