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

  /** Merkle-style table digest: per-hash-bucket row count + XOR of
    * portable row hashes — the anti-entropy primitive two replicas (or a
    * table before/after a migration, or Spark vs another engine) compare
    * to prove content equality WITHOUT moving data: equal digests ⇒ equal
    * content per bucket with hash-collision confidence; a divergent
    * bucket localizes the diff to 1/`buckets` of the keyspace for
    * row-level investigation.
    *
    * XOR specifically: commutative, associative, self-inverse — the
    * aggregate is order- and partition-independent (replay- and
    * speculation-safe) and cannot overflow. The row hash is the portable
    * md5-prefix h60 over a canonical '|'-joined string form (callers pass
    * pre-formatted columns — dates/doubles must be rendered
    * engine-portably), so ANY engine that can md5 recomputes the digest
    * bit-for-bit — cross-engine table equality as one `buckets`-row
    * compare. One scan, one `buckets`-wide aggregate with map-side
    * partials; nothing else moves. Reference analog: the row-count
    * reconciliation the loader logs after each upsert (load.py) — here
    * strengthened to content equality, not just cardinality. */
  def tableDigest(df: DataFrame, keyCols: Seq[String],
                  canonCols: Seq[org.apache.spark.sql.Column],
                  buckets: Int = 64): DataFrame = {
    import graft.ext.TextFns.portableH60
    val key = concat_ws("|", keyCols.map(col): _*)
    val rowStr = concat_ws("|", canonCols: _*)
    df.select(pmod(portableH60(key), lit(buckets.toLong)).as("bucket"),
        portableH60(rowStr).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("digest"))
      .orderBy("bucket")
  }

  /** Row-level table reconciliation — the step AFTER [[tableDigest]]
    * localizes a divergent bucket: name exactly which keys differ between
    * two replicas (or a table before/after a migration) and how —
    * `missing_right` (present only on the left), `missing_left` (present
    * only on the right), `changed` (both sides, content hash differs).
    * The same canonical '|'-joined row rendering as the digest, so a row
    * the digest calls equal is equal here too.
    *
    * Scale shape: both sides project to narrow (key, h60) rows before the
    * full-outer hash join on key — payload never moves, and the matched-
    * equal mass (in any sane replica, almost everything) is filtered out
    * immediately after the join, so only the drift survives downstream.
    * At 100 TB, bucket both sides on the key (BucketingSpec's zero-
    * shuffle join shape) or run per-digest-bucket after tableDigest has
    * narrowed the keyspace 1/`buckets`.
    *
    * Contract: `keyCols` must be unique per side (the same contract as
    * any keyed MERGE); duplicate keys would fan the full-outer join into
    * per-key pair products. The testdata lineitem fixture's
    * (l_orderkey, l_linenumber) is NOT unique — diff orders-like tables
    * on their true key, or pre-aggregate to one row per key first.
    * `canonCols` must be null-free renderings (coalesce upstream, same
    * as [[tableDigest]]): Spark's concat_ws SKIPS nulls while SQL `||`
    * propagates them, so a nullable canonical column would silently
    * diverge from any engine that concatenates strictly. */
  def tableDiff(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                canonCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import graft.ext.TextFns.portableH60
    def proj(df: DataFrame, hName: String) =
      df.select(concat_ws("|", keyCols.map(col): _*).as("row_key"),
        portableH60(concat_ws("|", canonCols: _*)).as(hName))
    proj(left, "h_l").join(proj(right, "h_r"), Seq("row_key"), "full_outer")
      .filter(col("h_l").isNull || col("h_r").isNull ||
        col("h_l") =!= col("h_r"))
      .select(col("row_key"),
        when(col("h_r").isNull, "missing_right")
          .when(col("h_l").isNull, "missing_left")
          .otherwise("changed").as("diff_type"))
      .orderBy("row_key")
  }
}
