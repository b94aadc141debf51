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

  /** Inclusion-dependency (foreign-key) discovery — the profiling pass
    * that tells a warehouse which column pairs actually join before
    * anyone declares a constraint or a join plan relies on one: for each
    * candidate (child.col ⊆ parent.col?), report both distinct
    * cardinalities, how many child values the parent covers, and the
    * containment ratio (=1 ⇒ the FK holds). Each candidate reduces both
    * sides to their DISTINCT key sets first (key-cardinality, not
    * row-cardinality — at 100 TB the semi-join probes shuffled key sets,
    * never fact rows), so the whole report costs one distinct + one
    * semi-join per candidate and collapses to one row before the union.
    * Complements [[report]]: report ENFORCES the declared contracts,
    * this DISCOVERS which contracts are declarable. */
  def inclusionDeps(cands: Seq[(String, DataFrame, String,
                                String, DataFrame, String)]): DataFrame =
    cands.map { case (ct, cdf, cc, pt, pdf, pc) =>
      val child = cdf.select(col(cc).cast("bigint").as("v"))
        .filter(col("v").isNotNull).distinct()
      val parent = pdf.select(col(pc).cast("bigint").as("v"))
        .filter(col("v").isNotNull).distinct()
      val nChild = child.agg(count(lit(1)).as("n_child_distinct"))
      val nParent = parent.agg(count(lit(1)).as("n_parent_distinct"))
      val nIn = child.join(parent, Seq("v"), "left_semi")
        .agg(count(lit(1)).as("n_contained"))
      def r6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
      nChild.crossJoin(broadcast(nParent)).crossJoin(broadcast(nIn))
        .select(lit(ct).as("child_table"), lit(cc).as("child_col"),
          lit(pt).as("parent_table"), lit(pc).as("parent_col"),
          col("n_child_distinct"), col("n_parent_distinct"),
          col("n_contained"),
          r6(col("n_contained").cast("double") /
            col("n_child_distinct").cast("double")).as("containment"),
          (col("n_contained") === col("n_child_distinct")).cast("int")
            .as("is_fk"))
    }.reduce(_ unionAll _)
      .orderBy("child_table", "child_col", "parent_table")

  /** Functional-dependency audit (A → B?) — the other half of schema
    * profiling beside [[inclusionDeps]]: per candidate, group by the
    * determinant and count distinct dependent values; the dependency
    * holds iff NO determinant value maps to more than one dependent.
    * Reports the determinant cardinality, the distinct (A,B) pair count,
    * and how many determinant values violate — the exact denormalization
    * evidence a modeler needs before collapsing B into A's dimension.
    * One groupBy per candidate over a two-column projection (the
    * aggregate collapses map-side), one row out before the union. */
  def functionalDeps(cands: Seq[(String, DataFrame, String, String)])
      : DataFrame =
    cands.map { case (t, df, a, b) =>
      val perKey = df.filter(col(a).isNotNull)
        .groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
      perKey.agg(count(lit(1)).as("n_lhs"),
          sum(col("nb")).as("n_pairs"),
          sum(when(col("nb") > 1, 1L).otherwise(0L))
            .as("n_violating_lhs"))
        .select(lit(t).as("table_name"), lit(a).as("lhs"),
          lit(b).as("rhs"), col("n_lhs"), col("n_pairs"),
          col("n_violating_lhs"),
          (col("n_violating_lhs") === 0).cast("int").as("holds"))
    }.reduce(_ unionAll _)
      .orderBy("table_name", "lhs", "rhs")

  /** Candidate-key discovery — the uniqueness census behind both schema
    * documentation and dedup-key selection: for each declared column
    * combo, |distinct| vs |rows| decides `is_key`. Combos are a FIXED
    * literal list (the profiling contract, like [[functionalDeps]]'
    * candidate pairs), so the output row set is schema-stable. Each
    * combo is its own narrow aggregate — column pruning reaches the
    * scan, so a 2-column combo reads 2 columns; the alternative
    * one-pass Expand would multiply shuffle volume by the combo count
    * instead. countDistinct here is exact (it is the VERDICT, not a
    * screen); the HLL pre-screen that skips hopeless combos at 100 TB
    * composes upstream of this operator if needed.
    *
    * NULL convention: Spark's countDistinct drops any tuple containing a
    * NULL (single- and multi-column alike), so a combo over nullable
    * columns counts only fully-non-NULL tuples as distinct values while
    * n_rows counts every row — a column set with NULLs therefore can
    * never be is_key=1, which is the SQL key semantics we want. The
    * DuckDB oracle mirrors this with an explicit all-columns-NOT-NULL
    * filter inside its composite DISTINCT subquery. */
  def candidateKeys(table: String, df: DataFrame,
                    combos: Seq[Seq[String]]): DataFrame = {
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    combos.map { combo =>
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(combo.head, combo.tail: _*).as("n_distinct"))
        .select(lit(table).as("table_name"),
          lit(combo.mkString(",")).as("columns"),
          col("n_rows"), col("n_distinct"),
          (col("n_distinct") === col("n_rows")).cast("int").as("is_key"),
          r6(col("n_distinct").cast("double") /
            col("n_rows").cast("double")).as("uniqueness"))
    }.reduce(_ unionAll _)
      .orderBy("table_name", "columns")
  }
}
