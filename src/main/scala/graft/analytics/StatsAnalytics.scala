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
object StatsAnalytics {

  /** Fixed-width histogram of a numeric column. Bucketing is a map-side
    * projection (`floor(x / width)`), so the only shuffle is the per-bucket
    * aggregate over ≤ range/width rows — at 100 TB the combine collapses
    * each input partition to the bucket count first. Static bounds keep the
    * output schema data-independent (no extra pass to find min/max, no
    * schema drift between runs — same reasoning as the explicit pivot value
    * list). */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame =
    df.select((floor(col(valueCol) / width)).cast("bigint").as("bucket"),
        col(valueCol))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col(valueCol)), 2).as("lo"),
        round(max(col(valueCol)), 2).as("hi"),
        round(avg(col(valueCol)), 6).as("mean"))
      .withColumn("bucket_lo", round(col("bucket") * width, 2))
      .orderBy("bucket")

  /** 2-D fixed-grid histogram (quantity × discount over lineitem): the
    * joint-distribution heat grid a cost model or data-viz layer feeds
    * on. Both bucket ids are map-side projections — the expression
    * `floor(x·inverseWidth)` is evaluated identically in every engine,
    * so even inexact-binary widths like 0.02 bin identically — and the
    * aggregate output is grid-sized. */
  def histogram2d(li: DataFrame,
                  qtyWidth: Double = 5.0,
                  discPerUnit: Double = 50.0): DataFrame =
    li.select(
        floor(col("l_quantity") / qtyWidth).cast("bigint").as("qty_bucket"),
        floor(col("l_discount") * discPerUnit).cast("bigint")
          .as("disc_bucket"))
      .groupBy("qty_bucket", "disc_bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("qty_bucket", "disc_bucket")

  /** Per-group z-score anomaly flags: rows whose value deviates from the
    * group mean by more than `nSigma` sample standard deviations. The
    * per-group stats frame has |groups| rows → Catalyst broadcasts it, so
    * the z computation is map-side over the raw data; nothing shuffles the
    * full table. Exactly the two-pass shape a 100 TB outlier scrub needs
    * (the single-pass alternative — a global window — would sort the whole
    * table). */
  def anomalies(ev: DataFrame, nSigma: Double = 2.5): DataFrame = {
    val stats = ev.filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mu")) / col("sd"))
      .filter(abs(col("z")) > nSigma)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 6).as("z"))
      .orderBy("event_id")
  }

  /** CUSUM change-point scan over the daily revenue series: running sum of
    * deviations from the global mean, flagging days where |S| exceeds
    * `nSigma` sample standard deviations. Everything nondeterministic
    * about float summation is forced through DECIMAL (daily totals, the
    * squared-deviation sum, the running prefix sum), so mean, sd, cusum —
    * and therefore the flag comparison — are bit-identical across
    * engines and partition orders. The global window runs over the DAILY
    * aggregate (|days| rows, already reduced), not the raw table — at
    * 100 TB the per-day reduction is the only full-data pass. */
  def cusumDays(orders: DataFrame, nSigma: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"))
    val s1 = daily
      .agg(sum(col("rev_dec")).cast("double").as("tot"),
        count(lit(1)).as("n"))
      .select((col("tot") / col("n")).as("mu"), col("n"))
    val withMu = daily.crossJoin(broadcast(s1))
      .withColumn("dev", col("rev_dec").cast("double") - col("mu"))
    val s2 = withMu
      .agg(sum((col("dev") * col("dev")).cast("decimal(38,6)"))
          .cast("double").as("ss"),
        first(col("n")).as("nn"))
      .select(sqrt(col("ss") / (col("nn") - 1)).as("sd"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withMu.crossJoin(broadcast(s2))
      .withColumn("cusum",
        sum(col("dev").cast("decimal(38,6)")).over(w).cast("double"))
      .select(col("day"),
        col("rev_dec").cast("double").as("revenue"),
        round(col("cusum"), 2).as("cusum"),
        (abs(col("cusum")) > lit(nSigma) * col("sd")).cast("int").as("flag"))
      .orderBy("day")
  }

  /** Join-key skew report: for each candidate join key of a fact table,
    * the statistics that decide a 100 TB join strategy — distinct keys,
    * rows on the hottest key, its share of the table, and the p99 of the
    * per-key frequency distribution. One aggregate per key column (counts
    * collapse map-side to ≤|keys| rows); the percentile runs over the
    * per-key COUNTS, never the raw table — and at the 100 TB design point
    * swap the exact percentile for approx_percentile (mergeable, no
    * single-reducer sort over a billion-key count frame). A max share
    * ≫ 1/parallelism says "salt this key or let AQE split it" (see
    * q_salted_join). */
  def keySkewReport(df: DataFrame, keys: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val reports = keys.map { k =>
      val counts = df.select(col(k)).groupBy(k)
        .agg(count(lit(1)).as("n"))
      counts.agg(
        lit(k).as("key_col"),
        count(lit(1)).as("n_distinct"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_key_rows"),
        round(max(col("n")) / sum(col("n")), 6).as("max_share"),
        round(percentile(col("n"), lit(0.99)), 2).as("p99_key_rows"))
    }
    reports.reduce(_.union(_)).orderBy("key_col")
  }

  /** Join-cardinality planning audit: for each named (leftKeys,
    * rightKeys) equi-join, the System-R / Catalyst-CBO uniform-frequency
    * estimate `|L|·|R| / max(ndv_L, ndv_R)` beside the EXACT output size
    * `Σ_k c_L(k)·c_R(k)` — derived from the two per-key count frames
    * joined on key, never by materializing the audited join itself. The
    * error ratio is the number a 100 TB planner acts on: ≈1 ⇒ the CBO
    * row estimate is trustworthy; ≫1 ⇒ key-frequency skew multiplies
    * the shuffle beyond what uniform stats predict (salt the hot keys —
    * see q_salted_join — or pre-aggregate before joining). Scale shape:
    * per-key counts collapse map-side to key-cardinality frames; the
    * count-frame equi-join and Σ(c_L·c_R) reduce straight to one row;
    * all sizes stay exact BIGINT (products < 2⁶³ for any real table
    * pair) with one display-time round on the ratio. Null keys are
    * dropped on both sides first — SQL joins never match them, and
    * planner NDVs exclude them. */
  def joinCardinalityAudit(
      joins: Seq[(String, DataFrame, DataFrame)]): DataFrame = {
    val rows = joins.map { case (name, lk, rk) =>
      val cl = lk.toDF("k").filter(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as("nl"))
      val cr = rk.toDF("k").filter(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as("nr"))
      val sides = cl
        .agg(sum(col("nl")).as("rows_left"),
          count(lit(1)).as("ndv_left"))
        .crossJoin(cr.agg(sum(col("nr")).as("rows_right"),
          count(lit(1)).as("ndv_right")))
      val actual = cl.join(cr, Seq("k"))
        .agg(coalesce(sum(col("nl") * col("nr")), lit(0L))
          .as("actual_rows"))
      val est = floor(col("rows_left").cast("double") * col("rows_right")
        / greatest(col("ndv_left"), col("ndv_right"))).cast("bigint")
      sides.crossJoin(actual)
        .select(lit(name).as("join_name"),
          col("rows_left"), col("ndv_left"),
          col("rows_right"), col("ndv_right"),
          est.as("est_rows"), col("actual_rows"),
          round(col("actual_rows").cast("double") / est.cast("double"), 6)
            .as("err_ratio"))
    }
    rows.reduce(_.unionAll(_)).orderBy("join_name")
  }

  /** Median-imputation report: per event type, how many null values the
    * imputation would fill and with what, plus the before/after means —
    * the data-prep audit row a feature pipeline logs before training.
    * The medians come from the non-null population; the after-mean is
    * derived arithmetically from exact counts and decimal sums (no
    * second pass over imputed data). */
  def imputationReport(ev: DataFrame): DataFrame = {
    val med = ev.filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("fill_value"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(col("value").cast("decimal(38,6)")).as("sum_dec"))
      .join(broadcast(med), Seq("event_type"), "left")
      .select(col("event_type"), col("n_rows"), col("n_null"),
        round(col("fill_value"), 6).as("fill_value"),
        round(col("sum_dec").cast("double") /
          (col("n_rows") - col("n_null")), 6).as("mean_before"),
        round((col("sum_dec").cast("double") +
          col("n_null") * col("fill_value")) / col("n_rows"), 6)
          .as("mean_after"))
      .orderBy("event_type")
  }

  /** Per-group IQR outlier fences (Tukey): [Q1 − k·IQR, Q3 + k·IQR] and
    * the count outside them — the box-plot rule, third member of the
    * robust family beside [[anomalies]] (z-score) and [[madByGroup]].
    * Same two-pass shape: exact quartiles, |groups|-row broadcast,
    * map-side flagging. */
  def iqrOutliers(ev: DataFrame, k: Double = 1.5): DataFrame = {
    val q = ev.filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(percentile(col("value"), lit(0.25)).as("q1"),
        percentile(col("value"), lit(0.75)).as("q3"))
      .select(col("event_type"), col("q1"), col("q3"),
        (col("q1") - (col("q3") - col("q1")) * k).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * k).as("hi"))
    ev.filter(col("value").isNotNull)
      .join(broadcast(q), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(first(col("lo")), 6).as("lo_fence"),
        round(first(col("hi")), 6).as("hi_fence"),
        sum(when(col("value") < col("lo") ||
          col("value") > col("hi"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  /** Per-group robust dispersion via MAD (median absolute deviation):
    * median of |x − median| with exact interpolated medians. Robust
    * counterpart of [[anomalies]]' mean/stddev — a heavy tail moves the
    * z-score cutoff but barely moves MAD. Two grouped percentile passes;
    * the |groups|-row median frame broadcasts between them, so the raw
    * table shuffles on the group key twice and nothing else. At 100 TB
    * swap exact percentile for approx_percentile (mergeable, one pass). */
  def madByGroup(ev: DataFrame): DataFrame = {
    val med = ev.filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    ev.filter(col("value").isNotNull)
      .join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 6).as("median"),
        round(percentile(abs(col("value") - col("med")), lit(0.5)), 6)
          .as("mad"))
      .orderBy("event_type")
  }

  /** Winsorization: clip values to the per-group [p_lo, p_hi] percentile
    * band (robust-scaling step for training-data value columns). Pass 1
    * computes exact percentiles per group (swap in approx_percentile at the
    * 100 TB design point — mergeable, one pass); pass 2 broadcasts the
    * |groups|-row percentile frame and clips map-side. Output is the
    * per-group before/after summary. */
  def winsorize(ev: DataFrame, lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val pct = ev.groupBy("event_type")
      .agg(expr(s"percentile(value, $lo)").as("p_lo"),
        expr(s"percentile(value, $hi)").as("p_hi"))
    ev.join(broadcast(pct), "event_type")
      .withColumn("clipped",
        least(greatest(col("value"), col("p_lo")), col("p_hi")))
      .groupBy("event_type")
      .agg(count(col("value")).as("n"),
        sum(when(col("value") < col("p_lo") || col("value") > col("p_hi"),
          1L).otherwise(0L)).as("n_clipped"),
        round(sum(col("value")), 2).as("raw_sum"),
        round(sum(col("clipped")), 2).as("winsorized_sum"))
      .orderBy("event_type")
  }

  /** Column profiling — null count and distinct cardinality per column in
    * ONE pass (the generalization of the reference's quality report): all
    * metrics land in a single aggregate row, which then explodes into the
    * long (col_name, n_null, n_distinct) layout driver-side-free. The
    * multi-countDistinct plans as one Expand; at 100 TB swap the exact
    * distinct counts for approx_count_distinct to keep the aggregate
    * buffers sketch-sized. */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      countDistinct(col(c)).as(s"__dist_$c"))) :+
      count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(
        explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"__null_$c").as("n_null"),
          col(s"__dist_$c").as("n_distinct"))): _*)).as("s"),
        col("__n").as("n_rows"))
      .select(col("s.col_name"), col("n_rows"), col("s.n_null"),
        col("s.n_distinct"))
      .orderBy("col_name")
  }

  /** Quantile treatment effects over the hash variants — the
    * DISTRIBUTIONAL A/B readout the mean-difference tests miss: a
    * treatment that helps the median but hurts the tail nets to zero in
    * [[abLift]] yet shows plainly as per-decile deltas. Exact
    * interpolating percentiles per variant (the q_value_percentiles
    * discipline — at 100 TB swap for the approx-percentile sketch
    * sibling), unpivoted to one row per decile with the B−A effect.
    * One grouped aggregate + a 9-row reshape. */
  def quantileTreatmentEffect(ev: DataFrame): DataFrame = {
    val rows = ev.filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(Sampling.hashBucket(col("user_id"), 2).as("variant"),
        col("value"))
    val ps = (1 to 9).map(_ / 10.0)
    val m = rows.groupBy("variant")
      .agg(expr(s"percentile(value, array(${ps.mkString(", ")}))")
        .as("qs"))
    val a = m.filter(col("variant") === 0)
      .select(posexplode(col("qs")).as(Seq("i", "qa")))
    val b = m.filter(col("variant") === 1)
      .select(posexplode(col("qs")).as(Seq("i", "qb")))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    a.join(b, Seq("i"))
      .select(((col("i") + 1) * 10).cast("bigint").as("pct"),
        r6(col("qa")).as("q_a"), r6(col("qb")).as("q_b"),
        r6(col("qb") - col("qa")).as("qte"))
      .orderBy("pct")
  }

  /** Covariate-balance table for the hash-split variants — the
    * diagnostic read BEFORE any causal readout ([[diffInDiff]],
    * matching, CUPED): per covariate (event value, hour-of-day, and the
    * portable epoch-day weekday), the standardized mean difference
    * SMD = (m₁−m₀)/√((v₀+v₁)/2); |SMD| ≳ 0.1 flags imbalance the
    * adjustment must carry. One stacked map-side-collapsing aggregate
    * (covariate × moment conditional DECIMAL sums) — the welchTTest fold
    * applied per covariate. */
  def covariateBalance(ev: DataFrame): DataFrame = {
    val dow = ((floor(unix_micros(col("ts")) / lit(86400000000L)) +
      lit(4)) % 7).cast("double")
    val rows = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(Sampling.hashBucket(col("user_id"), 2).as("variant"),
        explode(array(
          struct(lit("a_value").as("cname"),
            coalesce(col("value"), lit(0.0)).as("x")),
          struct(lit("b_hour").as("cname"),
            hour(col("ts")).cast("double").as("x")),
          struct(lit("c_dow").as("cname"), dow.as("x")))).as("s"))
      .select(col("variant"), col("s.cname"), col("s.x"))
    def cSum(pred: Column, v: Column) =
      sum(when(pred, v).otherwise(lit(0.0)).cast("decimal(28,12)"))
    val m = rows.groupBy("cname").agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      cSum(col("variant") === 0, col("x")).as("s_a"),
      cSum(col("variant") === 1, col("x")).as("s_b"),
      cSum(col("variant") === 0, col("x") * col("x")).as("ss_a"),
      cSum(col("variant") === 1, col("x") * col("x")).as("ss_b"))
    def d(name: String) = col(name).cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val meanA = d("s_a") / d("n_a")
    val meanB = d("s_b") / d("n_b")
    val varA = (d("ss_a") - d("s_a") * d("s_a") / d("n_a")) /
      (d("n_a") - lit(1.0))
    val varB = (d("ss_b") - d("s_b") * d("s_b") / d("n_b")) /
      (d("n_b") - lit(1.0))
    m.select(col("cname").as("covariate"), col("n_a"), col("n_b"),
        r6(meanA).as("mean_a"), r6(meanB).as("mean_b"),
        // zero-variance guard: a covariate constant in BOTH variants has
        // equal means by construction — SMD is 0, not 0/0 (ANSI division
        // would throw)
        when(varA + varB > lit(0.0),
          r6((meanB - meanA) / sqrt((varA + varB) / lit(2.0))))
          .otherwise(lit(0.0)).as("smd"))
      .orderBy("covariate")
  }

  /** Delta-method standard error for a RATIO metric (total value per
    * event, user as the i.i.d. unit) — the correction every
    * experimentation platform applies because a ratio of sums is NOT a
    * mean of ratios and the naive per-row variance understates it:
    * Var(ΣX/ΣY) ≈ (Sxx − 2r·Sxy + r²·Syy) / (n·ȳ²) with r = x̄/ȳ
    * (Deng et al., "Applying the Delta Method in Metric Analytics").
    * ONE per-user pass builds (x, y); one moment aggregate DECIMAL-sums
    * x, y, x², xy, y²; the estimate, SE, and the ±1.96 CI are scalar
    * projections — the same two-shuffle shape as [[cuped]]. */
  def deltaMethodRatio(ev: DataFrame): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(sum(coalesce(col("value"), lit(0.0)).cast("decimal(18,6)"))
          .cast("double").as("x"),
        count(lit(1)).cast("double").as("y"))
    def dsum(c: Column) = sum(c.cast("decimal(28,10)")).cast("double")
    val m = per.agg(count(lit(1)).as("n"), dsum(col("x")).as("sx"),
      dsum(col("y")).as("sy"), dsum(col("x") * col("x")).as("sxx"),
      dsum(col("x") * col("y")).as("sxy"),
      dsum(col("y") * col("y")).as("syy"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val n = col("n").cast("double")
    val mx = col("sx") / n
    val my = col("sy") / n
    val r = col("sx") / col("sy")
    val sxx = (col("sxx") - col("sx") * col("sx") / n) / (n - lit(1.0))
    val sxy = (col("sxy") - col("sx") * col("sy") / n) / (n - lit(1.0))
    val syy = (col("syy") - col("sy") * col("sy") / n) / (n - lit(1.0))
    val z = lit(1.96)
    val se = sqrt((sxx - lit(2.0) * r * sxy + r * r * syy) /
      (n * my * my))
    m.select(col("n").as("n_users"), r6(mx).as("mean_x"),
      r6(my).as("mean_y"), r6(r).as("ratio"),
      r6(se).as("se_delta"),
      r6(r - z * se).as("ci_lo"), r6(r + z * se).as("ci_hi"))
  }

  /** ANALYZE-style column statistics over the order book — the stats a
    * cost-based optimizer feeds on (and the deeper sibling of
    * [[nullProfile]]): per column, row/null counts, exact NDV, typed
    * min/max (computed in the column's own type, cast to string only
    * for the uniform report layout), and the most-common value with its
    * frequency. Shape: ONE multi-aggregate row for the typed stats (the
    * same single-Expand plan as nullProfile) plus one stacked
    * (column, value) census for the MCV — whose per-column argmax is a
    * map-side min_by on the (−count, value) total order, never a sort.
    * At 100 TB swap the exact NDVs for approx_count_distinct; the MCV
    * census is the only value-cardinality frame. */
  def analyzeStats(orders: DataFrame): DataFrame = {
    val cols = Seq("o_custkey", "o_orderpriority", "o_orderstatus",
      "o_totalprice")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      countDistinct(col(c)).as(s"__ndv_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) :+
      count(lit(1)).as("__n")
    val base = orders.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
          lit(c).as("cname"),
          col("__n").as("n_rows"),
          col(s"__null_$c").as("n_null"),
          col(s"__ndv_$c").as("ndv"),
          col(s"__min_$c").as("min_v"),
          col(s"__max_$c").as("max_v"))): _*)).as("s"))
      .select(col("s.*"))
    val census = orders.select(explode(array(cols.map(c =>
        struct(lit(c).as("cname"), col(c).cast("string").as("v"))): _*))
        .as("s"))
      .select(col("s.cname"), col("s.v"))
      .filter(col("v").isNotNull)
      .groupBy("cname", "v").agg(count(lit(1)).as("cnt"))
    val mcv = census.groupBy("cname")
      .agg(min_by(struct(col("v"), col("cnt")),
        struct((-col("cnt")).as("nc"), col("v"))).as("m"))
      .select(col("cname"), col("m.v").as("mcv_value"),
        col("m.cnt").as("mcv_count"))
    base.join(mcv, Seq("cname")).orderBy("cname")
  }

  /** Deterministic A/B conversion lift: users split into two variants by
    * the portable md5 hash bucket (cross-engine reproducible — same split
    * in the DuckDB oracle), conversion = any HIGH-VALUE purchase (every
    * fixture user has some purchase, so plain purchase would be degenerate
    * p=1 and the pooled z would hit 0/0). One grouped pass per user
    * (shuffle on user_id), then a single-row conditional aggregate; the
    * two-proportion pooled z-statistic is a scalar projection. At 100 TB
    * the per-user pass is the only data-sized stage. */
  def abLift(ev: DataFrame, minValue: Double = 90.0): DataFrame = {
    val perUser = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") > minValue, 1L).otherwise(0L))
        .as("converted"))
      .withColumn("variant", Sampling.hashBucket(col("user_id"), 2))
    val one = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("users_a"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L))
        .as("conv_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("users_b"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L))
        .as("conv_b"))
    one
      .withColumn("rate_a", col("conv_a").cast("double") / col("users_a"))
      .withColumn("rate_b", col("conv_b").cast("double") / col("users_b"))
      .withColumn("pooled",
        (col("conv_a") + col("conv_b")).cast("double") /
          (col("users_a") + col("users_b")))
      .withColumn("z_stat", round(
        (col("rate_b") - col("rate_a")) /
          sqrt(col("pooled") * (lit(1.0) - col("pooled")) *
            (lit(1.0) / col("users_a") + lit(1.0) / col("users_b"))), 6))
      .select(col("users_a"), col("conv_a"), col("users_b"), col("conv_b"),
        round(col("rate_a"), 6).as("rate_a"),
        round(col("rate_b"), 6).as("rate_b"),
        round(col("rate_b") - col("rate_a"), 6).as("lift"),
        col("z_stat"))
  }

  /** Smoothed mean target encoding — the classic categorical featurizer a
    * training pipeline applies before gradient models: each category maps
    * to (sum + m·prior)/(n + m), shrinking rare categories toward the
    * global mean. Both aggregates accumulate in DECIMAL (order-independent
    * → oracle-parity at any partition count); the one-row prior broadcasts,
    * so the only data-sized stage is the per-category pass. The derived
    * ratios are double ops on identical inputs — deterministic IEEE. */
  def targetEncoding(ev: DataFrame, m: Double = 10.0): DataFrame = {
    val nn = ev.filter(col("value").isNotNull && col("event_type").isNotNull)
    def dsum = sum(col("value").cast("decimal(18,6)")).cast("double")
    val prior = nn.agg(
      (dsum / count(lit(1)).cast("double")).as("__prior"))
    nn.groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum.as("__s"))
      .crossJoin(broadcast(prior))
      .select(col("event_type"), col("n"),
        round(col("__s") / col("n").cast("double"), 6).as("mean_value"),
        round((col("__s") + lit(m) * col("__prior")) /
          (col("n").cast("double") + lit(m)), 6).as("encoded"))
      .orderBy("event_type")
  }

  /** Kaplan–Meier survival curve over user lifetimes (days from first to
    * last event), right-censoring users still active on the fixture's
    * final day — the churn-analytics estimator, relationally: one
    * per-user pass (shuffle on user_id), a per-lifetime death/censor
    * aggregate (at most |days| rows), then the KM product Π(1−d/n) as a
    * log-space DECIMAL prefix sum over the tiny ordered frame —
    * windowed-double products would be engine-order-dependent; summed
    * logs of IEEE-identical terms are not. At-risk counts derive from an
    * exclusive integer prefix sum. */
  /** The (t, d, c) lifetime event table shared by [[survivalKm]] and
    * [[nelsonAalen]]: per-user lifetime in days, censored iff the user
    * was still active on the corpus horizon, grouped into per-lifetime
    * death/censor counts. */
  private def lifetimeTable(ev: DataFrame): DataFrame = {
    val life = ev.filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(datediff(max(col("d")), min(col("d"))).as("lifetime"),
        max(col("d")).as("last_d"))
    val horizon = life.agg(max(col("last_d")).as("h"))
    life.crossJoin(broadcast(horizon))
      .select(col("lifetime").cast("bigint").as("t"),
        when(col("last_d") === col("h"), 1L).otherwise(0L).as("censored"))
      .groupBy("t")
      .agg(sum(lit(1L) - col("censored")).as("d"),
        sum(col("censored")).as("c"))
  }

  def survivalKm(ev: DataFrame): DataFrame = {
    val perT = lifetimeTable(ev)
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = perT.agg(sum(col("d") + col("c")).as("n_total"))
    // log term only for survivable steps; a step where everyone at risk
    // dies (d = n) sends S to exactly 0 — tracked by a flag, since
    // ln(0) has no decimal representation
    val logTerm = when(col("d") > 0 && col("d") < col("n_risk"),
      log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
        .cast("decimal(28,12)")).otherwise(lit(0.0).cast("decimal(28,12)"))
    val zeroFlag = max(when(col("d") === col("n_risk"), 1L).otherwise(0L))
      .over(w)
    perT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev),
          lit(0L)))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        when(zeroFlag === 1L, lit(0.0))
          .otherwise(round(exp(sum(logTerm).over(w).cast("double")), 6))
          .as("s_km"))
      .orderBy("t")
  }

  /** Laplace-mechanism count release — differential-privacy mechanics as
    * a pure projection: noise is inverse-CDF-sampled from a uniform
    * derived deterministically from the portable 60-bit hash (no RNG
    * state, so the release is reproducible and oracle-checkable; a
    * production release would swap the hash for a real RNG, everything
    * else unchanged). Sensitivity-1 counts, b = 1/ε. The true count rides
    * along as the audit column, same pattern as the sketch audits. */
  def dpCounts(ev: DataFrame, epsilon: Double = 1.0): DataFrame = {
    import graft.ext.TextFns.portableH60
    val counts = ev.filter(col("event_type").isNotNull)
      .groupBy("event_type").agg(count(lit(1)).as("true_n"))
    val u = portableH60(concat(col("event_type"), lit("|dp1")))
      .cast("double") / lit(1152921504606846976.0) - lit(0.5)
    val sign = when(u >= 0, lit(1.0)).otherwise(lit(-1.0))
    val noise = lit(-1.0) / lit(epsilon) * sign *
      log(lit(1.0) - lit(2.0) * abs(u))
    counts.select(col("event_type"), col("true_n"),
        round(col("true_n") + noise, 4).as("released_n"),
        lit(epsilon).as("epsilon"))
      .orderBy("event_type")
  }

  /** Per-market-segment Gini coefficient of customer spend — the revenue
    * concentration audit. Per-customer spend aggregates in DECIMAL (one
    * shuffle on custkey), joins the segment label, then the rank formula
    * G = 2·Σ r·x / (n·Σx) − (n+1)/n over a window PARTITIONED by segment
    * (per-segment sort of the already-aggregated customer frame, not the
    * raw orders — the 100 TB shape). Ranks tiebreak on custkey so the
    * r·x products are IEEE-identical across engines; their sum
    * accumulates in DECIMAL. */
  def giniBySegment(orders: DataFrame, customer: DataFrame): DataFrame = {
    val spend = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("spend_d"))
      .withColumn("spend", round(col("spend_d"), 2).cast("double"))
    val seg = customer.select(col("c_custkey").as("custkey"),
      col("c_mktsegment").as("segment"))
    val w = Window.partitionBy("segment")
      .orderBy(col("spend"), col("custkey"))
    spend.join(seg, "custkey")
      .withColumn("r", row_number().over(w))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend").cast("decimal(28,6)")).as("__sx"),
        sum((col("r").cast("double") * col("spend"))
          .cast("decimal(28,6)")).as("__srx"))
      .select(col("segment"), col("n_customers"),
        round(col("__sx"), 2).cast("double").as("total_spend"),
        round(lit(2.0) * col("__srx").cast("double") /
          (col("n_customers").cast("double") * col("__sx").cast("double")) -
          (col("n_customers") + lit(1)).cast("double") /
            col("n_customers").cast("double"), 6).as("gini"))
      .orderBy("segment")
  }

  /** Population-stability index of the value distribution per event type
    * between the first and second half of the time window — the drift
    * monitor a feature store runs between training and serving periods.
    * The period split derives from the broadcast (min,max) date midpoint;
    * binning is the same map-side `floor(value·invWidth)` as [[ksTest]],
    * so the only data-sized stage is one (event_type, bucket) aggregate.
    * Laplace-smoothed shares ((c+½)/(n+½·B)) keep ln finite on one-sided
    * bins; the Σ(p−q)·ln(p/q) terms are IEEE-identical doubles summed in
    * DECIMAL. */
  def psiDrift(ev: DataFrame, invWidth: Double = 2.0): DataFrame = {
    val rows = ev.filter(col("value").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * invWidth).cast("bigint").as("bucket"))
    val span = rows.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / 2).cast("int")).as("mid"))
    val cells = rows.crossJoin(broadcast(span))
      .groupBy("event_type", "bucket")
      .agg(sum(when(col("d") <= col("mid"), 1L).otherwise(0L)).as("ce"),
        sum(when(col("d") > col("mid"), 1L).otherwise(0L)).as("cl"))
    val p = (col("ce").cast("double") + lit(0.5)) /
      (col("n_early").cast("double") + lit(0.5) * col("n_bins"))
    val q = (col("cl").cast("double") + lit(0.5)) /
      (col("n_late").cast("double") + lit(0.5) * col("n_bins"))
    cells
      .withColumn("n_early", sum(col("ce"))
        .over(Window.partitionBy("event_type")))
      .withColumn("n_late", sum(col("cl"))
        .over(Window.partitionBy("event_type")))
      .withColumn("n_bins", count(lit(1))
        .over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("n_early")).as("n_early"),
        max(col("n_late")).as("n_late"),
        max(col("n_bins")).as("n_bins"),
        sum(((p - q) * log(p / q)).cast("decimal(28,12)")).as("__psi"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        col("n_bins"), round(col("__psi").cast("double"), 6).as("psi"))
      .orderBy("event_type")
  }

  /** Chi-square test of independence between the deterministic hash
    * variant (same split as [[abLift]]) and event type. The contingency
    * table is one aggregate over the corpus; expected counts and cell
    * contributions are pure integer-derived double arithmetic, summed in
    * DECIMAL. Output is the one-row test report (k types, per-variant n,
    * dof, statistic). */
  def chiSquare(ev: DataFrame): DataFrame = {
    val cells = ev
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(Sampling.hashBucket(col("user_id"), 2).as("variant"),
        col("event_type"))
      .groupBy("event_type")
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c1"))
    val tot = cells.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
      count(lit(1)).as("k"))
    def contrib(c: Column, n: Column, nAll: Column): Column = {
      val e = (col("c0") + col("c1")).cast("double") *
        n.cast("double") / nAll.cast("double")
      (c.cast("double") - e) * (c.cast("double") - e) / e
    }
    val nAll = col("n0") + col("n1")
    cells.crossJoin(broadcast(tot))
      .groupBy("k", "n0", "n1")
      .agg(sum((contrib(col("c0"), col("n0"), nAll) +
        contrib(col("c1"), col("n1"), nAll))
        .cast("decimal(28,12)")).as("__x2"))
      .select(col("k").as("k_types"), col("n0").as("n_a"),
        col("n1").as("n_b"), (col("k") - lit(1)).cast("bigint").as("dof"),
        round(col("__x2").cast("double"), 6).as("chi2"))
  }

  /** RFM segmentation of the order book: per-customer recency (days from
    * last order to the horizon), frequency (order count), and monetary
    * (DECIMAL spend), each quintiled by ntile(5) with custkey tiebreaks
    * so the assignment is total and engine-independent. The quintile
    * windows sort the per-CUSTOMER aggregate, not raw orders; at larger
    * scale the boundaries would come from approx percentiles instead of
    * a global ntile sort — this is the exact oracle form. Output is the
    * (r,f,m) cell census with segment revenue. */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val horizon = orders.agg(max(to_date(col("o_orderdate"))).as("h"))
    val perCust = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("mon"))
      .crossJoin(broadcast(horizon))
      .withColumn("recency", datediff(col("h"), col("last_d")))
    val scored = perCust
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("recency").desc, col("custkey"))).cast("bigint"))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("freq"), col("custkey"))).cast("bigint"))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("mon"), col("custkey"))).cast("bigint"))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("mon")), 2).cast("double").as("segment_revenue"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** The 100 TB shape of [[rfmSegments]]: quintile BOUNDARIES from
    * `approx_percentile` (a mergeable sketch aggregate — map-side partials,
    * no global single-partition ntile sort anywhere in the plan), broadcast
    * back as one row, scores assigned map-side by counting boundaries
    * exceeded. Semantic delta vs the exact form, by design: equal values
    * get equal scores (a boundary cut cannot split ties the way a ranked
    * ntile does), so tile sizes are only approximately n/5 — the spec
    * bounds the census against the exact form. At fixture scale the GK
    * sketch is EXACT — but only while accuracy exceeds the customer
    * count (the sketch keeps every rank until it must compress, i.e. a
    * merged summary can drift within ±n/accuracy ranks of ceil(p·n)
    * beyond that), so the default sits at 10⁷: two orders of magnitude
    * above the sf1 customer count, far past any fixture the verify/bench
    * gates read, at ~MB of sketch state. It returns the sample at rank
    * ceil(p·n), which the DuckDB oracle reproduces with an explicit
    * row_number rank — so this query stays hash-checked while its plan
    * is the one that survives 1000 executors. Memory bound: each partial
    * GK summary retains O(min(n, accuracy)) samples before compression
    * merges anything, so accuracy IS the per-partial state budget — the
    * default stays at Spark's sketch-grade 10⁴ (~100 KB per partial);
    * the verify/bench entry passes the exact-at-fixture 10⁷ explicitly
    * because the oracle hash-checks against an exact row_number rank. */
  def rfmSegmentsScale(orders: DataFrame,
                       accuracy: Int = 10000): DataFrame = {
    val horizon = orders.agg(max(to_date(col("o_orderdate"))).as("h"))
    // per-customer aggregate feeds BOTH the boundary sketch and the scoring
    // pass — localCheckpoint so the orders scan+shuffle runs once
    val perCust = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("mon"))
      .crossJoin(broadcast(horizon))
      .withColumn("recency", datediff(col("h"), col("last_d")))
      .localCheckpoint()
    val ps = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
    val bounds = perCust.agg(
      percentile_approx(col("recency"), ps, lit(accuracy)).as("rb"),
      percentile_approx(col("freq"), ps, lit(accuracy)).as("fb"),
      percentile_approx(col("mon"), ps, lit(accuracy)).as("mb"))
    def above(v: Column, b: Column): Column =
      (lit(1) + (0 to 3).map(i => (v > b(i)).cast("int")).reduce(_ + _))
        .cast("bigint")
    val scored = perCust.crossJoin(broadcast(bounds))
      // recency quintiles are DESC in the exact form (tile 1 = least
      // recent); invert the ascending boundary count to match
      .withColumn("r_score", lit(6L) - above(col("recency"), col("rb")))
      .withColumn("f_score", above(col("freq"), col("fb")))
      .withColumn("m_score", above(col("mon"), col("mb")))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("mon")), 2).cast("double").as("segment_revenue"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Exponentially weighted moving average of daily revenue with α = ½ —
    * the smoothing a monitoring dashboard runs. The recursion unrolls to
    * ewma_t = Σ_{j≥2} x_j·2^{-(t-j+1)} + x_1·2^{-(t-1)}; with α = ½
    * every weight is an EXACT power of two built by integer bit-shift
    * (`pow` has no cross-libm rounding guarantee, shifts do), so each
    * term is an IEEE-identical double, summed in DECIMAL. The daily frame
    * is |days|-sized, so the unrolled pair join is bounded; weights
    * beyond 2⁻⁶² underflow the output rounding and are dropped, keeping
    * the shift in range. */
  def ewmaDaily(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
      .withColumn("t", row_number().over(Window.orderBy("d")))
    val terms = daily.select(col("d"), col("x"), col("t"))
      .join(daily.select(col("t").as("j"), col("x").as("xj")),
        col("j") <= col("t") && col("t") - col("j") <= lit(62))
      .withColumn("k",
        when(col("j") === 1, col("t") - lit(1))
          .otherwise(col("t") - col("j") + lit(1)))
      .withColumn("term", col("xj") /
        expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))").cast("double"))
    terms.groupBy("d", "x", "t")
      .agg(sum(col("term").cast("decimal(28,10)")).as("__e"))
      .select(col("d"), col("x").as("daily_revenue"),
        round(col("__e").cast("double"), 4).as("ewma"))
      .orderBy("d")
  }

  /** CUPED variance reduction (Deng et al., "Improving the Sensitivity of
    * Online Controlled Experiments") — the covariate-adjustment every
    * large experimentation platform applies before reading an A/B test:
    * θ = cov(x,y)/var(x) from a PRE-period covariate x (first-half spend)
    * against the outcome y (second-half spend), and the adjusted-metric
    * variance var(y) − cov²/var(x). One per-user pass builds (x, y) from
    * DECIMAL-summed period totals; the moment aggregate decimal-sums the
    * IEEE-identical products, so θ and the variance ratio are bit-stable
    * at any partition count. Output is the one-row experiment-design
    * report: how much narrower the confidence interval gets. */
  def cuped(ev: DataFrame): DataFrame = {
    val rows = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        coalesce(col("value"), lit(0.0)).as("v"))
    val span = rows.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / 2).cast("int")).as("mid"))
    val perUser = rows.crossJoin(broadcast(span))
      .groupBy("user_id")
      .agg(
        round(sum(when(col("d") <= col("mid"), col("v")).otherwise(0.0)
          .cast("decimal(18,6)")), 6).cast("double").as("x"),
        round(sum(when(col("d") > col("mid"), col("v")).otherwise(0.0)
          .cast("decimal(18,6)")), 6).cast("double").as("y"))
    val m = perUser.agg(
      count(lit(1)).as("n_users"),
      sum(col("x").cast("decimal(28,6)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(28,6)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(28,8)")).cast("double")
        .as("sxy"),
      sum((col("x") * col("x")).cast("decimal(28,8)")).cast("double")
        .as("sxx"),
      sum((col("y") * col("y")).cast("decimal(28,8)")).cast("double")
        .as("syy"))
    val nD = col("n_users").cast("double")
    val mx = col("sx") / nD
    val my = col("sy") / nD
    val varX = col("sxx") / nD - mx * mx
    val varY = col("syy") / nD - my * my
    val covXY = col("sxy") / nD - mx * my
    val varAdj = varY - covXY * covXY / varX
    m.select(col("n_users"),
      when(varX === 0.0, lit(null).cast("double"))
        .otherwise(round(covXY / varX, 6)).as("theta"),
      round(varY, 6).as("var_y"),
      when(varX === 0.0, lit(null).cast("double"))
        .otherwise(round(varAdj, 6)).as("var_adj"),
      when(varX === 0.0 || varY === 0.0, lit(null).cast("double"))
        .otherwise(round(varAdj / varY, 6)).as("var_ratio"))
  }

  /** Autocorrelation of daily revenue at lags 1..`maxLag` — the
    * seasonality probe a forecasting pipeline runs before model choice.
    * The corpus collapses to the |days|-sized daily frame first; the lag
    * window, mean-centering, and the Σ(x_t−x̄)(x_{t−k}−x̄) sums all run
    * over that tiny frame with DECIMAL accumulation of IEEE-identical
    * products. Denominator is the full-series variance sum (the standard
    * ACF normalization, shared across lags). */
  def acfDaily(ev: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
    val stats = daily.agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,6)")).cast("double").as("sx"))
      .select(col("n"), (col("sx") / col("n").cast("double")).as("mean_x"))
    val centered = daily.crossJoin(broadcast(stats))
      .select(col("d"), col("n"), (col("x") - col("mean_x")).as("c"))
    val denom = centered
      .agg(sum((col("c") * col("c")).cast("decimal(28,10)"))
        .cast("double").as("den"), max(col("n")).as("n"))
    val w = Window.orderBy("d")
    val lagged = (1 to maxLag).map { k =>
      centered
        .withColumn("cl", lag(col("c"), k).over(w))
        .filter(col("cl").isNotNull)
        .agg(sum((col("c") * col("cl")).cast("decimal(28,10)"))
          .cast("double").as("num"), count(lit(1)).as("n_pairs"))
        .select(lit(k.toLong).as("lag"), col("n_pairs"), col("num"))
    }.reduce(_.unionAll(_))
    lagged.crossJoin(broadcast(denom))
      .select(col("lag"), col("n_pairs"),
        round(col("num") / col("den"), 6).as("acf"))
      .orderBy("lag")
  }

  /** Ljung–Box portmanteau test on the daily-revenue ACF — the formal
    * "is there ANY autocorrelation" gate on top of [[acfDaily]]'s
    * per-lag probe: Q = n(n+2)·Σ_k ρ_k²/(n−k), compared against the
    * χ²(maxLag) 5% critical value (a literal constant — no CDF needed
    * cross-engine). Rides the exact machinery acfDaily publishes: ρ_k
    * re-derives from the same day frame, so the statistic is a scalar
    * fold over maxLag rows. */
  def ljungBox(ev: DataFrame, maxLag: Int = 7): DataFrame = {
    val a = acfDaily(ev, maxLag)
    def d(c: Column) = c.cast("double")
    val n = d(col("n_pairs")) + d(col("lag"))
    val m = a.select(col("lag"), col("acf"), n.as("n"))
      .select(col("n"),
        ((col("acf") * col("acf")) / (col("n") - d(col("lag"))))
          .cast("decimal(28,12)").as("term"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_lags"),
        sum(col("term")).cast("double").as("s"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    // χ²(7) 95th percentile = 14.067140 (literal; both engines compare
    // the same constant rather than evaluating a CDF)
    val crit = if (maxLag == 7) 14.06714 else Double.NaN
    val q = col("n") * (col("n") + lit(2.0)) * col("s")
    m.select(col("n").cast("bigint").as("n_days"), col("n_lags"),
      r6(q).as("lb_q"),
      (q > lit(crit)).cast("int").as("reject_iid"))
  }

  /** Nelson–Aalen cumulative hazard over the same lifetime event table
    * as [[survivalKm]] — the estimator survival analysis prefers when
    * the HAZARD (instantaneous churn intensity) is the object, plus
    * the Breslow survival exp(−H) as the KM cross-check: at every
    * death time, H accumulates d/n_risk exactly (each ratio quantized
    * through DECIMAL, cumulative-summed over the day-bounded lifetime
    * frame — partition-order-independent). Censoring enters through
    * n_risk, identically to KM.
    *
    * Scale shape: one user aggregate, then everything runs on the
    * lifetime census (≤ horizon-days rows). */
  def nelsonAalen(ev: DataFrame): DataFrame = {
    val perT = lifetimeTable(ev)
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = perT.agg(sum(col("d") + col("c")).as("n_total"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val hTerm = when(col("d") > 0L,
      (col("d").cast("double") / col("n_risk").cast("double"))
        .cast("decimal(28,12)"))
      .otherwise(lit(0).cast("decimal(28,12)"))
    perT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev),
          lit(0L)))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        r6(sum(hTerm).over(w).cast("double")).as("h_na"),
        r6(exp(-sum(hTerm).over(w).cast("double"))).as("s_breslow"))
      .orderBy("t")
  }

  /** Lag-1 Granger causality test: do daily CLICKS help predict daily
    * REVENUE beyond revenue's own lag? Unrestricted
    * y_t = a + b·y_{t−1} + c·x_{t−1} vs restricted y_t = a + b·y_{t−1};
    * F = (RSS_r − RSS_u)·(n−3)/RSS_u with both regressions solved
    * CLOSED-FORM from centered second moments (Cramer on the 2×2
    * normal equations — the grouped-OLS discipline, every moment a
    * DECIMAL fold). The reject flag compares against the literal 4.20
    * (≈ F(1, 25) at 5% — a fixed constant both engines compare, no CDF;
    * stated in the column name, calibrated to the fixture's ~30-day
    * series). Degenerate moments (D = 0, RSS_u = 0) report 0 with the
    * structurally-nonzero sentinel divisors (waldIv discipline).
    *
    * Scale shape: one day aggregate; lags, moments, and the F fold all
    * run on the day-bounded frame. */
  def grangerLag1(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(when(col("event_type") === "purchase",
          coalesce(col("value"), lit(0.0))).otherwise(lit(0.0))
          .cast("decimal(18,6)")), 2).cast("double").as("y"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .cast("double").as("x"))
    val w = Window.orderBy("d")
    val rows = daily
      .withColumn("yl", lag(col("y"), 1).over(w))
      .withColumn("xl", lag(col("x"), 1).over(w))
      .filter(col("yl").isNotNull)
    def dec(c: Column) = c.cast("decimal(38,12)")
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m0 = rows.agg(count(lit(1)).as("n"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum(dec(col("yl"))).cast("double").as("su"),
      sum(dec(col("xl"))).cast("double").as("sv"))
    val cm = rows.crossJoin(broadcast(m0))
      .select(
        (col("y") - col("sy") / d(col("n"))).as("cy"),
        (col("yl") - col("su") / d(col("n"))).as("cu"),
        (col("xl") - col("sv") / d(col("n"))).as("cv"),
        col("n"))
      .agg(max(col("n")).as("n"),
        sum(dec(col("cu") * col("cu"))).cast("double").as("suu"),
        sum(dec(col("cv") * col("cv"))).cast("double").as("svv"),
        sum(dec(col("cu") * col("cv"))).cast("double").as("suv"),
        sum(dec(col("cu") * col("cy"))).cast("double").as("suy"),
        sum(dec(col("cv") * col("cy"))).cast("double").as("svy"),
        sum(dec(col("cy") * col("cy"))).cast("double").as("syy"))
    val det = col("suu") * col("svv") - col("suv") * col("suv")
    val detDiv = when(det =!= 0.0, det).otherwise(lit(1.0))
    val suuDiv = when(col("suu") =!= 0.0, col("suu")).otherwise(lit(1.0))
    val b = (col("svv") * col("suy") - col("suv") * col("svy")) / detDiv
    val c = (col("suu") * col("svy") - col("suv") * col("suy")) / detDiv
    val rssU = col("syy") - b * col("suy") - c * col("svy")
    val rssR = col("syy") - col("suy") * col("suy") / suuDiv
    val rssUDiv = when(rssU =!= 0.0, rssU).otherwise(lit(1.0))
    val ok = det =!= 0.0 && col("suu") =!= 0.0 && col("n") > 3L
    val f = (rssR - rssU) * (d(col("n")) - lit(3.0)) / rssUDiv
    cm.select(col("n").as("n_obs"),
      r6(when(ok, b).otherwise(lit(0.0))).as("beta_y_lag"),
      r6(when(ok, c).otherwise(lit(0.0))).as("beta_x_lag"),
      r6(when(ok, rssU).otherwise(lit(0.0))).as("rss_unrestricted"),
      r6(when(ok, rssR).otherwise(lit(0.0))).as("rss_restricted"),
      r6(when(ok && rssU =!= 0.0, f).otherwise(lit(0.0))).as("f_stat"),
      when(ok && rssU =!= 0.0 && f > lit(4.20), 1).otherwise(0)
        .cast("int").as("granger_at_f420"))
  }

  /** Exact periodogram of the daily-revenue series at candidate integer
    * periods — "WHICH cycle does this series carry" (the spectral
    * generalization of [[graft.analytics.EventAnalytics
    * .seasonalStrength]]'s fixed weekday question): for each period p,
    * power_p = (Σ c_t·cos(2πt_p/p))² + (Σ c_t·sin(2πt/p))² over the
    * mean-centered series, normalized by n. The trig values come from
    * LITERAL tables generated once in Scala and interpolated into BOTH
    * the Column expressions and the oracle SQL (cos/sin are
    * libm-divergent across engines — the adstock weight-literal
    * discipline), keyed by t mod p, so the expression is a bounded CASE
    * and every product is the same IEEE double on both engines.
    *
    * Scale shape: one day aggregate; each period arm is one fold over
    * the day-bounded centered frame (arms unioned, the acfDaily
    * shape). */
  def periodogram(ev: DataFrame,
                  periods: Seq[Int] = (2 to 14)): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
    val m0 = daily.agg(count(lit(1)).as("n"), min(col("d")).as("d0"),
      sum(col("x").cast("decimal(28,6)")).cast("double").as("sx"))
    val centered = daily.crossJoin(broadcast(m0))
      .select(datediff(col("d"), col("d0")).cast("bigint").as("t"),
        (col("x") - col("sx") / col("n").cast("double")).as("c"),
        col("n"))
      .localCheckpoint() // every period arm folds it
    def dec(c: Column) = c.cast("decimal(38,12)")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val arms = periods.map { p =>
      def trig(table: Int => Double): Column =
        (1 until p).foldLeft(lit(table(0))) { (acc, r) =>
          when(col("t") % p === r.toLong, lit(table(r))).otherwise(acc)
        }
      val cosC = trig(r => PeriodogramTables.cosTab(p)(r))
      val sinC = trig(r => PeriodogramTables.sinTab(p)(r))
      centered.agg(max(col("n")).as("n"),
          sum(dec(col("c") * cosC)).cast("double").as("sc"),
          sum(dec(col("c") * sinC)).cast("double").as("ss"))
        .select(lit(p.toLong).as("period"), col("n"),
          ((col("sc") * col("sc") + col("ss") * col("ss")) /
            col("n").cast("double")).as("pw"))
    }
    arms.reduce(_ unionAll _)
      .select(col("period"), col("n").cast("bigint").as("n_days"),
        r6(col("pw")).as("power"))
      .orderBy("period")
  }

  /** STL-lite additive decomposition of the daily-revenue series:
    * trend = centered 7-day moving average (shrinking at the edges),
    * seasonal = weekday mean of the detrended series, residual = the
    * rest — the per-day table behind
    * [[graft.analytics.EventAnalytics.seasonalStrength]]'s scalar. All
    * three components derive from the day frame (one corpus aggregate;
    * centered window and weekday means are calendar-bounded); window
    * sums accumulate DECIMAL so the moving average is order-exact. */
  def stlLite(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("event_type") === "purchase" &&
        col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      // series values round to 2dp IN DECIMAL (portable) before any
      // double arithmetic — double round() semantics differ per engine
      .agg(round(sum(col("value").cast("decimal(28,12)")), 2)
        .cast("double").as("v"))
      .localCheckpoint() // trend window + weekday means share one pass
    val w = Window.orderBy(col("d")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend", sum(col("v").cast("decimal(28,12)")).over(w)
        .cast("double") / count(lit(1)).over(w).cast("double"))
      .withColumn("det", col("v") - col("trend"))
      .withColumn("wd", dayofweek(col("d")))
    val wk = trended.groupBy("wd")
      .agg((sum(col("det").cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("seasonal"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    trended.join(broadcast(wk), Seq("wd"))
      .select(col("d"), col("v"),
        r6(col("trend")).as("trend"),
        r6(col("seasonal")).as("seasonal"),
        r6(col("det") - col("seasonal")).as("residual"))
      .orderBy("d")
  }

  /** Partial autocorrelation at lags 1–3 via the Durbin–Levinson
    * recursion in CLOSED FORM over [[acfDaily]]'s published ρ values —
    * the third leg of the Box–Jenkins identification triad (ACF shape,
    * PACF cutoff, Ljung–Box significance): an AR(p) process shows PACF
    * cutting off after lag p, which the raw ACF cannot reveal. The
    * recursion runs on the r6-ROUNDED ρ₁..ρ₃ (three numbers — scalar
    * algebra, no data pass beyond the ACF's own), so both engines fold
    * identical inputs; denominators guard the |ρ|=1 degenerate case. */
  def pacfDaily(ev: DataFrame): DataFrame = {
    val a = acfDaily(ev, 3)
    def at(k: Int) = max(when(col("lag") === k, col("acf")))
    val m = a.agg(at(1).as("r1"), at(2).as("r2"), at(3).as("r3"),
      max(col("n_pairs") + col("lag")).as("n_days"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val p11 = col("r1")
    val den2 = lit(1.0) - col("r1") * col("r1")
    val p22 = when(den2 =!= lit(0.0),
      (col("r2") - col("r1") * col("r1")) / den2).otherwise(lit(0.0))
    val p21 = p11 * (lit(1.0) - p22)
    val den3 = lit(1.0) - p21 * col("r1") - p22 * col("r2")
    val p33 = when(den3 =!= lit(0.0),
      (col("r3") - p21 * col("r2") - p22 * col("r1")) / den3)
      .otherwise(lit(0.0))
    m.select(col("n_days"), r6(p11).as("pacf_1"), r6(p22).as("pacf_2"),
      r6(p33).as("pacf_3"))
  }

  /** Cohort LTV triangle: users cohort by FIRST-SEEN day; per (cohort,
    * day-offset) the value contribution accumulates into the running
    * lifetime value — the growth-analytics curve beside the retention
    * matrix. Two bounded aggregates (per-user first day, then per-cell
    * DECIMAL sums) and a cumulative window PARTITIONED by cohort over the
    * ≤ |days|² triangle. Offsets are capped at `maxOffset` to keep the
    * report scannable. */
  def ltvCohorts(ev: DataFrame, maxOffset: Int = 7): DataFrame = {
    val rows = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        coalesce(col("value"), lit(0.0)).as("v"))
    val first = rows.groupBy("user_id").agg(min(col("d")).as("cohort"))
    val cells = rows.join(first, "user_id")
      .select(col("cohort"),
        datediff(col("d"), col("cohort")).cast("bigint").as("day_offset"),
        col("v"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("cohort", "day_offset")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v").cast("decimal(18,6)")).as("__s"))
    val w = Window.partitionBy("cohort").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("period_value", round(col("__s"), 2).cast("double"))
      .withColumn("cum_ltv", round(sum(col("__s")).over(w), 2)
        .cast("double"))
      .select("cohort", "day_offset", "n_events", "period_value",
        "cum_ltv")
      .orderBy("cohort", "day_offset")
  }

  /** Robust trend report over daily revenue: the Theil–Sen slope (median
    * of all pairwise slopes — 29.3% breakdown point, vs 0 for OLS) and
    * the Mann–Kendall monotone-trend statistic S = Σ sign(x_j − x_i) with
    * its no-ties normal approximation z = (S − sgn S)/√(n(n−1)(2n+5)/18).
    * The corpus collapses to the |days| frame first, so the O(days²) pair
    * join is bounded (≤ ~66k pairs/year) and never touches raw rows. The
    * median is an explicit two-middle-ranks average — IEEE addition of
    * two doubles is commutative, so the even-n average is order-safe —
    * matching DuckDB's interpolated `median` exactly. */
  def robustTrend(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
      .withColumn("t", row_number().over(Window.orderBy("d")))
    val pairs = daily.select(col("t").as("ta"), col("x").as("xa"))
      .join(daily.select(col("t").as("tb"), col("x").as("xb")),
        col("tb") > col("ta"))
      .select(col("ta"), col("tb"),
        ((col("xb") - col("xa")) /
          (col("tb") - col("ta")).cast("double")).as("slope"),
        signum(col("xb") - col("xa")).as("sgn"))
    val agg = pairs.agg(count(lit(1)).as("n_pairs"),
      sum(col("sgn").cast("bigint")).as("mk_s"))
    val nDays = daily.agg(count(lit(1)).as("n_days"))
    val ranked = pairs
      .withColumn("rn", row_number().over(
        Window.orderBy(col("slope"), col("ta"), col("tb"))))
    val med = ranked.crossJoin(broadcast(agg.select(col("n_pairs"))))
      .filter(col("rn") >= floor((col("n_pairs") + 1) / 2) &&
        col("rn") <= floor(col("n_pairs") / 2) + 1)
      .agg(avg(col("slope")).as("ts_slope"))
    val nD = col("n_days").cast("double")
    val varS = nD * (nD - 1.0) * (lit(2.0) * nD + 5.0) / 18.0
    nDays.crossJoin(broadcast(agg)).crossJoin(broadcast(med))
      .select(col("n_days"), col("n_pairs"),
        round(col("ts_slope"), 6).as("theil_sen_slope"),
        col("mk_s"),
        when(col("n_days") < 3, lit(null).cast("double"))
          .otherwise(round((col("mk_s").cast("double") -
            signum(col("mk_s").cast("double"))) / sqrt(varS), 6))
          .as("mk_z"))
  }

  /** Minimum-detectable-effect report (the experiment-design companion to
    * [[abLift]] and [[cuped]]): per-variant user counts from the hash
    * split, pooled variance of per-user outcome totals, and the absolute
    * / relative MDE at α=0.05 two-sided, 80% power —
    * (z₀.₉₇₅+z₀.₈)·√(varₚ·(1/nₐ+1/n_b)). The z quantiles are fixed
    * decimal literals (identical doubles in both engines); all moment
    * sums accumulate in DECIMAL. One per-user pass + a two-row variant
    * aggregate. */
  def mdeReport(ev: DataFrame): DataFrame = {
    val perUser = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(round(sum(coalesce(col("value"), lit(0.0))
        .cast("decimal(18,6)")), 6).cast("double").as("y"))
      .withColumn("variant", graft.operators.Sampling
        .hashBucket(col("user_id"), 2))
    val m = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum(col("y").cast("decimal(28,6)")).cast("double").as("sy"),
        sum((col("y") * col("y")).cast("decimal(28,8)")).cast("double")
          .as("syy"))
      .select(col("variant"), col("n"), col("sy"), col("syy"),
        ((col("syy") - col("sy") * col("sy") / col("n").cast("double")) /
          (col("n") - lit(1)).cast("double")).as("s2"))
    val a = m.filter(col("variant") === 0)
      .select(col("n").as("n_a"), col("sy").as("sy_a"),
        col("s2").as("s2_a"))
    val b = m.filter(col("variant") === 1)
      .select(col("n").as("n_b"), col("sy").as("sy_b"),
        col("s2").as("s2_b"))
    val zSum = lit(1.959964) + lit(0.841621)
    a.crossJoin(b).select(
        col("n_a"), col("n_b"),
        round((col("sy_a") + col("sy_b")) /
          (col("n_a") + col("n_b")).cast("double"), 6).as("mean_y"),
        (((col("n_a") - lit(1)).cast("double") * col("s2_a") +
          (col("n_b") - lit(1)).cast("double") * col("s2_b")) /
          (col("n_a") + col("n_b") - lit(2)).cast("double")).as("var_p"))
      .select(col("n_a"), col("n_b"), col("mean_y"),
        round(col("var_p"), 6).as("var_pooled"),
        round(zSum * sqrt(col("var_p") *
          (lit(1.0) / col("n_a").cast("double") +
           lit(1.0) / col("n_b").cast("double"))), 6).as("mde_abs"))
  }

  /** k-anonymity audit over the (event type, day, value bucket)
    * quasi-identifier: how many equivalence groups fall below `k` members
    * and how many rows they expose — the privacy pre-release gate. One
    * map-side projection + one group-sized aggregate; the report is a
    * single row. */
  def kAnonymity(ev: DataFrame, k: Long = 5L): DataFrame = {
    val quasi = ev.filter(col("event_type").isNotNull &&
        col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") / 50.0).cast("bigint").as("vb"))
    quasi.groupBy("event_type", "d", "vb")
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_unsafe_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"),
        min(col("n")).as("min_group_size"))
      .withColumn("k", lit(k))
  }

  /** Lorenz curve over customer lifetime spend: customers sorted into
    * spend deciles (deterministic tiebreak on the key), reporting each
    * decile's customer count, spend, and the cumulative share of total
    * revenue — the "top decile is X% of revenue" concentration table
    * behind [[giniBySegment]]'s scalar.
    *
    * Scale shape: orders collapse to one row per customer (decimal
    * sums) BEFORE any ordering, so the ntile ranks a customer-
    * cardinality frame, not orders (same global-window precedent as
    * q_value_deciles — at the 100 TB design point swap ntile for
    * percentile-boundary bucketing to avoid the single-partition sort).
    * The cumulative share runs over exactly 10 decile rows; shares are
    * decimal/decimal rationals → portable floor rounds. */
  def lorenzDeciles(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("spend"))
    val d = per.select(col("o_custkey"), col("spend"),
      ntile(10).over(Window.orderBy(col("spend"), col("o_custkey")))
        .cast("bigint").as("decile"))
    val byDecile = d.groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum(col("spend")).as("dspend"))
    val tot = byDecile.agg(sum(col("dspend")).as("total"))
    byDecile.crossJoin(tot)
      .select(col("decile"), col("n_customers"),
        round(col("dspend"), 2).cast("double").as("spend"),
        (floor(sum(col("dspend"))
            .over(Window.orderBy("decile")
              .rowsBetween(Window.unboundedPreceding, 0))
            .cast("double") / col("total").cast("double")
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("cum_share"))
      .orderBy("decile")
  }

  /** The 100 TB shape of [[lorenzDeciles]] (same pattern as
    * rfmSegmentsScale): decile BOUNDARIES from `percentile_approx` over
    * per-customer spend — a mergeable sketch with map-side partials,
    * broadcast back as one row — and deciles assigned map-side as
    * 1 + Σ(spend > bᵢ), so NO single-partition ntile sort ever ranks the
    * customer frame. The only remaining window is the cumulative-share
    * sum over the ≤10 decile rows — domain-bounded, never data-scale.
    * Semantic delta, by design: equal spends share a decile (a boundary
    * cut cannot split ties the way a ranked ntile does). Default accuracy
    * is sketch-grade 10⁴; the verify/bench entry passes the
    * exact-at-fixture 10⁷ because the oracle reproduces the sketch's
    * rank-ceil(p·n) boundary with an explicit row_number rank. */
  def lorenzDecilesScale(orders: DataFrame,
                         accuracy: Int = 10000): DataFrame = {
    // the per-customer aggregate feeds BOTH the boundary sketch and the
    // scoring pass — localCheckpoint so the orders scan+shuffle runs once
    val per = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("spend"))
      .localCheckpoint()
    val ps = array((1 to 9).map(i => lit(i / 10.0)): _*)
    val bounds = per.agg(
      percentile_approx(col("spend"), ps, lit(accuracy)).as("sb"))
    val above = (0 to 8)
      .map(i => (col("spend") > col("sb")(i)).cast("int")).reduce(_ + _)
    val byDecile = per.crossJoin(broadcast(bounds))
      .withColumn("decile", (lit(1) + above).cast("bigint"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum(col("spend")).as("dspend"))
    val tot = byDecile.agg(sum(col("dspend")).as("total"))
    byDecile.crossJoin(broadcast(tot))
      .select(col("decile"), col("n_customers"),
        round(col("dspend"), 2).cast("double").as("spend"),
        (floor(sum(col("dspend"))
            .over(Window.orderBy("decile")
              .rowsBetween(Window.unboundedPreceding, 0))
            .cast("double") / col("total").cast("double")
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("cum_share"))
      .orderBy("decile")
  }

  /** Burstiness (Fano factor) of daily event arrivals per type: the
    * variance-to-mean ratio of the per-day counts — 1 is Poisson,
    * above is bursty, below is regular. Bursty types need time-salted
    * partitioning; regular ones can stream through fixed shards — the
    * dispersion diagnostic behind that choice.
    *
    * Counts are integers, so mean and sample variance come from the
    * exact sums `(D·Σc² − (Σc)²) / (D·(D−1))`; every output is a
    * rational of integers → portable floor rounds. Two nested
    * map-side-combined aggregates, nothing else. */
  def burstiness(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    def r6(c: Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
    val dd = col("n_days").cast("double")
    val mean = col("sc").cast("double") / dd
    val variance = (dd * col("scc").cast("double") -
      col("sc").cast("double") * col("sc").cast("double")) /
      (dd * (dd - lit(1.0)))
    m.filter(col("n_days") > 1)
      .select(col("event_type"), col("n_days"),
        r6(mean).as("mean_daily"), r6(variance).as("var_daily"),
        r6(variance / mean).as("fano"))
      .orderBy("event_type")
  }

  /** l-diversity audit — the companion to [[kAnonymity]]: a group of
    * identical quasi-identifiers (event type, day, value bucket) is safe
    * only if its SENSITIVE attribute (user_id here) takes at least `l`
    * distinct values; a large group whose rows all belong to one user
    * still leaks (the homogeneity attack k-anonymity misses). One
    * quasi-key aggregate with an exact distinct; the rollup is a one-row
    * second pass over group-cardinality data. At the 100 TB design point
    * swap the exact distinct for HLL only if the audit is advisory —
    * a compliance gate needs the exact count. */
  def lDiversity(ev: DataFrame, l: Long = 3L): DataFrame = {
    val quasi = ev.filter(col("event_type").isNotNull &&
        col("ts").isNotNull && col("value").isNotNull &&
        col("user_id").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") / 50.0).cast("bigint").as("vb"), col("user_id"))
    quasi.groupBy("event_type", "d", "vb")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("ldiv"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("ldiv") < l, 1L).otherwise(0L)).as("n_low_div_groups"),
        sum(when(col("ldiv") < l, col("n")).otherwise(0L)).as("rows_at_risk"),
        min(col("ldiv")).as("min_l"))
      .withColumn("l", lit(l))
  }

  /** Late-arrival backfill planner: per-date row counts of the previous
    * snapshot (simulated here as the deterministic subset missing
    * event_id % 97 == 0 — the "late" rows a daily load hadn't seen yet)
    * against today's, flagging the dates whose partitions must be
    * recomputed. The real pipeline would read yesterday's manifest
    * instead of the simulation predicate; the diff plan — one per-date
    * aggregate, no joins — is the part that scales. */
  def backfillPlan(ev: DataFrame): DataFrame =
    ev.filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("d"), col("event_id"))
      .groupBy("d")
      .agg(sum(when(col("event_id") % 97 =!= 0, 1L).otherwise(0L))
          .as("n_old"),
        count(lit(1)).as("n_new"))
      .withColumn("needs_backfill",
        (col("n_old") =!= col("n_new")).cast("int"))
      .orderBy("d")

  /** Incremental aggregate maintenance: the merged-partials form of the
    * per-type (count, decimal sum) report. The corpus splits into a
    * "base" and a "delta" period (broadcast midpoint, as [[psiDrift]]),
    * each aggregates independently, and the partials MERGE by addition —
    * count and DECIMAL-sum are commutative monoids, so the merge equals
    * the flat recompute bit-for-bit, which is exactly what the flat-SQL
    * oracle checks. This is the contract that lets a 100 TB pipeline
    * maintain its aggregates from deltas instead of rescanning history;
    * the per-period audit columns expose the partials' provenance. */
  def incrementalAgg(ev: DataFrame): DataFrame = {
    val rows = ev.filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        coalesce(col("value"), lit(0.0)).as("v"))
    val span = rows.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / 2).cast("int")).as("mid"))
    val partials = rows.crossJoin(broadcast(span))
      .withColumn("part",
        when(col("d") <= col("mid"), lit("base")).otherwise(lit("delta")))
      .groupBy("event_type", "part")
      .agg(count(lit(1)).as("pn"),
        sum(col("v").cast("decimal(18,6)")).as("ps"))
    partials.groupBy("event_type")
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("ps")), 2).cast("double").as("total_value"),
        sum(when(col("part") === "base", col("pn")).otherwise(0L))
          .as("n_base"),
        sum(when(col("part") === "delta", col("pn")).otherwise(0L))
          .as("n_delta"))
      .orderBy("event_type")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the deterministic
    * hash-split variants (same split as [[abLift]]), on ecdfs over
    * VALUE BINS: the per-bin counts collapse the corpus map-side, the
    * cumulative window then runs over the bin frame (bounded by the value
    * range — a window over raw distinct values would funnel the corpus
    * through one partition, the classic 100 TB non-shape; binned KS is
    * standard at scale). Counts stay integers through the prefix sums, so
    * the ecdf ratios are exact-input doubles and the max/argmax is
    * engine-independent. */
  def ksTest(ev: DataFrame, invWidth: Double = 4.0): DataFrame = {
    val rows = ev.filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(Sampling.hashBucket(col("user_id"), 2).as("variant"),
        floor(col("value") * invWidth).cast("bigint").as("bucket"))
    val cells = rows.groupBy("bucket")
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = cells
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .crossJoin(broadcast(cells.agg(sum(col("ca")).as("n_a"),
        sum(col("cb")).as("n_b"))))
      .withColumn("diff",
        abs(col("cum_a").cast("double") / col("n_a").cast("double") -
          col("cum_b").cast("double") / col("n_b").cast("double")))
    val best = Window.orderBy(col("diff").desc, col("bucket"))
    scored.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("n_a"), col("n_b"),
        round(col("bucket") / lit(invWidth), 2).as("d_at_value"),
        round(col("diff"), 6).as("d_stat"),
        round(col("diff") *
          sqrt(col("n_a").cast("double") * col("n_b").cast("double") /
            (col("n_a") + col("n_b")).cast("double")), 6).as("ks_scaled"))
  }

  /** Mean with a 95% CI by DETERMINISTIC Poisson bootstrap — the
    * resampling scheme that actually works on a cluster (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams": per-row
    * independent Poisson(1) multiplicities instead of a global n-draw,
    * so each of the B resamples is one map-side projection). The
    * multiplicity comes from the portable 60-bit hash of (row, replica)
    * pushed through the Poisson(1) inverse CDF as a literal threshold
    * ladder — no RNG state, bit-identical in the DuckDB oracle. Weighted
    * sums route through DECIMAL; the B resample means are a B-row frame
    * whose exact percentiles give the CI. */
  def bootstrapCi(ev: DataFrame, b: Int = 32): DataFrame = {
    import graft.ext.TextFns.portableH60
    val rows = ev.filter(col("value").isNotNull)
      .select(col("event_id"), col("value"))
    val u = portableH60(concat(col("event_id").cast("string"), lit(":"),
      col("rep").cast("string"))).cast("double") /
      lit(1152921504606846976.0) // 2^60
    val mult = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L).otherwise(5L)
    val means = rows
      .select(col("event_id"), col("value"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .select(col("rep"), col("value"), mult.as("m"))
      .groupBy("rep")
      // empty-resample guard: a resample whose every multiplicity is 0
      // (probability e^-n) has no mean; NULL drops out of the percentiles
      .agg((sum((col("value") * col("m").cast("double"))
        .cast("decimal(28,12)")).cast("double") /
        when(sum(col("m")) > 0L, sum(col("m")).cast("double"))
          .otherwise(lit(null))).as("mean_b"))
    val full = rows.agg(
      (sum(col("value").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("mean_full"))
    means.agg(count(lit(1)).as("n_resamples"),
        expr("percentile(mean_b, 0.025)").as("__lo"),
        expr("percentile(mean_b, 0.975)").as("__hi"))
      .crossJoin(broadcast(full))
      .select(round(col("mean_full"), 6).as("mean_full"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"),
        col("n_resamples"))
  }

  /** Cluster (user-level) bootstrap CI for the per-event mean value —
    * the resampling unit [[bootstrapCi]] gets WRONG for A/B-style data:
    * events within a user are correlated, so row-level resampling
    * understates variance; the honest draw resamples USERS and carries
    * each user's whole event mass. Same deterministic Poisson(1) scheme
    * (portable-hash inverse-CDF ladder, no RNG state), but over the
    * user frame: the corpus pre-aggregates to (user, Σvalue, n) ONCE,
    * so the B-fold explode fans out user-cardinality rows, not events —
    * at 100 TB that is the difference between 32× users and 32× corpus.
    * Each resample mean is the ratio of weighted sums (DECIMAL). */
  def clusterBootstrap(ev: DataFrame, b: Int = 32): DataFrame = {
    import graft.ext.TextFns.portableH60
    val users = ev.filter(col("value").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(28,12)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .localCheckpoint() // resample fan-out and full mean share one pass
    val u = portableH60(concat(col("user_id").cast("string"), lit(":"),
      col("rep").cast("string"))).cast("double") /
      lit(1152921504606846976.0) // 2^60
    val mult = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L).otherwise(5L)
    val means = users
      .select(col("user_id"), col("s"), col("n"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .select(col("rep"), col("s"), col("n"), mult.as("m"))
      .groupBy("rep")
      .agg((sum((col("s") * col("m").cast("double"))
        .cast("decimal(28,12)")).cast("double") /
        when(sum(col("m") * col("n")) > 0L,
          sum(col("m") * col("n")).cast("double"))
          .otherwise(lit(null))).as("mean_b"))
    val full = users.agg(
      (sum(col("s").cast("decimal(28,12)")).cast("double") /
        sum(col("n")).cast("double")).as("mean_full"),
      count(lit(1)).as("n_users"))
    means.agg(count(lit(1)).as("n_resamples"),
        expr("percentile(mean_b, 0.025)").as("__lo"),
        expr("percentile(mean_b, 0.975)").as("__hi"))
      .crossJoin(broadcast(full))
      .select(round(col("mean_full"), 6).as("mean_full"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"),
        col("n_resamples"), col("n_users"))
  }

  /** Two-component 1-D Gaussian-mixture EM over event values, three
    * unrolled iterations — the third iterative-ML-as-relational anchor
    * beside kmeans and the Newton logistic step: each EM round is ONE
    * map-side-collapsing aggregate (responsibilities are a per-row
    * projection against the broadcast single-row parameter frame;
    * γ-weighted sums go DECIMAL), so a round costs exactly one corpus
    * pass and the 3-round plan is the classic unrolled-lineage shape.
    * Deterministic init (μ = exact p25/p75, shared σ, π = ½) keeps the
    * trajectory engine-reproducible; σ floors at 1e-6 against
    * degenerate collapse. The constant 1/√2π cancels in γ and is
    * applied only in the final log-likelihood. */
  def gmmEm(ev: DataFrame, iterations: Int = 3): DataFrame = {
    val xs = ev.filter(col("value").isNotNull)
      .select(col("value").as("x")).localCheckpoint()
    val init = xs.agg(
      expr("percentile(x, 0.25)").as("mu1"),
      expr("percentile(x, 0.75)").as("mu2"),
      count(lit(1)).as("n"),
      sqrt(sum((col("x") * col("x")).cast("decimal(28,12)"))
        .cast("double") / count(lit(1)) -
        (sum(col("x").cast("decimal(28,12)")).cast("double") /
          count(lit(1))) *
        (sum(col("x").cast("decimal(28,12)")).cast("double") /
          count(lit(1)))).as("sd"))
      .select(lit(0.5).as("p1"), col("mu1"),
        greatest(col("sd"), lit(1.0e-6)).as("s1"), col("mu2"),
        greatest(col("sd"), lit(1.0e-6)).as("s2"), col("n"))
    def phi(mu: Column, s: Column): Column =
      exp(-(col("x") - mu) * (col("x") - mu) / (lit(2.0) * s * s)) / s
    def step(params: DataFrame): DataFrame = {
      val a = col("p1") * phi(col("mu1"), col("s1"))
      val b = (lit(1.0) - col("p1")) * phi(col("mu2"), col("s2"))
      // both densities can underflow for far-tail x: 0/0 would be NaN —
      // split the responsibility evenly instead (same guard in the oracle)
      val g = when(a + b > lit(0.0), a / (a + b)).otherwise(lit(0.5))
      def dec(c: Column) = c.cast("decimal(28,12)")
      xs.crossJoin(broadcast(params))
        .select(g.as("g"), col("x"), col("n"))
        .groupBy(col("n"))
        .agg(sum(dec(col("g"))).cast("double").as("sg"),
          sum(dec(col("g") * col("x"))).cast("double").as("sgx"),
          sum(dec(col("g") * col("x") * col("x"))).cast("double")
            .as("sgxx"),
          sum(dec((lit(1.0) - col("g")) * col("x"))).cast("double")
            .as("shx"),
          sum(dec((lit(1.0) - col("g")) * col("x") * col("x")))
            .cast("double").as("shxx"))
        .select((col("sg") / col("n").cast("double")).as("p1"),
          (col("sgx") / col("sg")).as("mu1"),
          greatest(sqrt(col("sgxx") / col("sg") -
            (col("sgx") / col("sg")) * (col("sgx") / col("sg"))),
            lit(1.0e-6)).as("s1"),
          (col("shx") / (col("n").cast("double") - col("sg"))).as("mu2"),
          greatest(sqrt(col("shxx") / (col("n").cast("double") -
            col("sg")) - (col("shx") / (col("n").cast("double") -
            col("sg"))) * (col("shx") / (col("n").cast("double") -
            col("sg")))), lit(1.0e-6)).as("s2"),
          col("n"))
    }
    val fitted = (1 to iterations).foldLeft(init)((p, _) =>
      step(p).localCheckpoint(false))
    // final pass: average log-likelihood under the fitted mixture
    val ll = xs.crossJoin(broadcast(fitted))
      // floor the mixture density away from 0 so an underflowing tail
      // row contributes a large-negative FINITE term, not log(0) = -Inf
      .select(log(greatest((col("p1") * phi(col("mu1"), col("s1")) +
        (lit(1.0) - col("p1")) * phi(col("mu2"), col("s2"))) /
        lit(math.sqrt(2.0 * math.Pi)), lit(1.0e-300)))
        .cast("decimal(28,12)").as("l"))
      .agg(sum(col("l")).cast("double").as("sll"),
        count(lit(1)).as("n2"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    fitted.crossJoin(broadcast(ll))
      .select(col("n"), r6(col("p1")).as("pi1"),
        r6(col("mu1")).as("mu1"), r6(col("s1")).as("sigma1"),
        r6(col("mu2")).as("mu2"), r6(col("s2")).as("sigma2"),
        r6(col("sll") / col("n2").cast("double")).as("avg_loglik"))
  }

  /** Benford first-digit audit over order totals — the classic
    * fabricated-data screen: observed first-significant-digit frequencies
    * against Benford's log-law expectation. The digit comes from an
    * explicit power-of-ten CASE ladder (threshold compares + one exact
    * division), NOT floor(log10(x)) — log10 at exact powers of ten can
    * round to either side depending on the libm, which would misfile
    * boundary values differently per engine. One map-side projection, one
    * 9-row aggregate. */
  def benford(orders: DataFrame, valueCol: String = "o_totalprice")
      : DataFrame = {
    val x = col(valueCol)
    val mag = when(x >= 1e8, 1e8).when(x >= 1e7, 1e7).when(x >= 1e6, 1e6)
      .when(x >= 1e5, 1e5).when(x >= 1e4, 1e4).when(x >= 1e3, 1e3)
      .when(x >= 1e2, 1e2).when(x >= 1e1, 1e1).otherwise(1.0)
    val digits = orders.filter(x > 0)
      .select(floor(x / mag).cast("bigint").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("n_total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("n_total").cast("double"), 6)
          .as("observed"),
        round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)), 6).as("benford"))
      .orderBy("digit")
  }

  /** Mutual information between a bucketed numeric feature and a label —
    * the feature-selection score, relationally: the contingency table is
    * ONE (bucket,label) aggregate (map-side combined, so cells not rows
    * shuffle), the two marginals reaggregate the tiny cell frame, and
    * each cell's (n_xy/N)·ln(n_xy·N/(n_x·n_y)) term is a double over
    * exact integer counts — deterministic everywhere. Output is the
    * per-bucket MI contribution (DECIMAL-summed over labels) so the
    * informative range of the feature is visible, not just the scalar. */
  def mutualInfo(li: DataFrame, bucketWidth: Double = 5.0): DataFrame = {
    val cells = li.select(
        floor(col("l_quantity") / bucketWidth).cast("bigint").as("bucket"),
        col("l_returnflag"))
      .groupBy("bucket", "l_returnflag")
      .agg(count(lit(1)).as("n_xy"))
    val nx = cells.groupBy("bucket").agg(sum(col("n_xy")).as("n_x"))
    val ny = cells.groupBy("l_returnflag").agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n_t"))
    val term = (col("n_xy").cast("double") / col("n_t").cast("double")) *
      log((col("n_xy").cast("double") * col("n_t").cast("double")) /
        (col("n_x").cast("double") * col("n_y").cast("double")))
    cells.join(nx, Seq("bucket")).join(ny, Seq("l_returnflag"))
      .crossJoin(broadcast(tot))
      .groupBy("bucket")
      .agg(sum(col("n_xy")).as("n_x"),
        sum(term.cast("decimal(28,12)")).cast("double").as("mi_part"))
      .select(col("bucket"), col("n_x"),
        round(col("mi_part"), 6).as("mi_contribution"))
      .orderBy("bucket")
  }

  /** Histogram-based best-split search for a regression stump — the inner
    * loop of gradient-boosted-tree training, relationally: bucket the
    * feature (map-side projection), aggregate per-bucket target sums in
    * DECIMAL (n, Σy — one shuffle of ≤ groups·buckets cells thanks to the
    * map-side combine), then score every bucket boundary with prefix sums
    * over the TINY histogram via a per-group window. Gain is the classic
    * SSE decomposition Σ²L/nL + Σ²R/nR − Σ²T/nT (the Σy² terms cancel),
    * so only exact decimal-derived doubles enter the argmax; ties break
    * to the lowest boundary. At 100 TB the corpus is touched exactly
    * once — split scoring runs on histogram cells, the same reason
    * LightGBM/XGBoost bin first. */
  def gbdtSplit(li: DataFrame, bucketWidth: Double = 2.0): DataFrame = {
    val hist = li
      .select(col("l_returnflag"),
        floor(col("l_quantity") / bucketWidth).cast("bigint").as("bucket"),
        col("l_extendedprice").as("y"))
      .groupBy("l_returnflag", "bucket")
      .agg(count(lit(1)).as("n"),
        // stays DECIMAL through the window prefix sums: a windowed DOUBLE
        // sum accumulates in engine-specific order (segment trees in some
        // engines) and would break cross-engine parity
        sum(col("y").cast("decimal(18,6)")).as("sy"))
    val w = Window.partitionBy("l_returnflag").orderBy("bucket")
    val wAll = Window.partitionBy("l_returnflag")
    val syL = col("__sy_l").cast("double")
    val syT = col("__sy_t").cast("double")
    val syR = syT - syL
    val scored = hist
      .withColumn("n_l", sum(col("n")).over(w))
      .withColumn("__sy_l", sum(col("sy")).over(w))
      .withColumn("n_t", sum(col("n")).over(wAll))
      .withColumn("__sy_t", sum(col("sy")).over(wAll))
      .filter(col("n_l") < col("n_t")) // a split must leave a right side
      .select(col("l_returnflag"), col("bucket"),
        col("n_l"), (col("n_t") - col("n_l")).as("n_r"),
        (syL * syL / col("n_l") +
          syR * syR / (col("n_t") - col("n_l")) -
          syT * syT / col("n_t")).as("gain"))
    val best = Window.partitionBy("l_returnflag")
      .orderBy(round(col("gain"), 6).desc, col("bucket"))
    scored.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"),
        round((col("bucket") + 1) * bucketWidth, 2).as("split_value"),
        col("n_l"), col("n_r"), round(col("gain"), 4).as("gain"))
      .orderBy("l_returnflag")
  }

  /** Per-group ordinary least squares (y = l_extendedprice on
    * x = l_quantity) via the normal equations — regression as ONE grouped
    * pass: the five moment sums (Σx, Σy, Σx², Σxy, Σy²) accumulate in
    * DECIMAL inside the same map-side combine as any aggregate, and
    * slope/intercept/R² are scalar projections of the moments. No second
    * pass, no driver-side math — the 100 TB shape for fitting millions of
    * per-group models is exactly this one shuffle. Per-row double products
    * are IEEE-deterministic; the decimal cast then makes the SUM
    * order-independent (the q_nation_volume discipline). */
  def linreg(li: DataFrame): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    def dsum(c: Column) = sum(c.cast("decimal(18,6)")).cast("double")
    val n = col("__n")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val den = n * col("__sxx") - col("__sx") * col("__sx")
    // zero-guards (G16): degenerate groups (constant x, or constant y in
    // the R² denominator) yield NULL, not a runtime 0-divide
    val slope = when(den === 0.0, lit(null)).otherwise(num / den)
    val r2den = den * (n * col("__syy") - col("__sy") * col("__sy"))
    li.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("double").as("__n"),
        dsum(x).as("__sx"), dsum(y).as("__sy"),
        dsum(x * x).as("__sxx"), dsum(x * y).as("__sxy"),
        dsum(y * y).as("__syy"))
      .select(col("l_returnflag"), n.cast("bigint").as("n"),
        round(slope, 6).as("slope"),
        round((col("__sy") - slope * col("__sx")) / n, 6).as("intercept"),
        round(when(r2den === 0.0, lit(null))
          .otherwise((num * num) / r2den), 6).as("r2"))
      .orderBy("l_returnflag")
  }

  /** Week-over-week revenue growth: ISO-week revenue (decimal sums)
    * with the lag-1 relative change — the weekly business-review table.
    * The lag window runs over the bounded week domain (a few hundred
    * rows), not orders; the growth ratio is a rational of exact
    * decimals → portable floor round (first week NULL). */
  def wowGrowth(orders: DataFrame): DataFrame = {
    val weekly = orders
      .groupBy(trunc(col("o_orderdate").cast("date"), "week").as("week"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
    val prev = lag(col("rev"), 1).over(Window.orderBy("week"))
    weekly.select(col("week"), col("rev"), prev.as("prev"))
      .select(col("week"),
        round(col("rev"), 2).cast("double").as("revenue"),
        (floor((col("rev").cast("double") - col("prev").cast("double")) /
          col("prev").cast("double") * lit(1000000.0) + lit(0.5))
          / lit(1000000.0)).as("wow_growth"))
      .orderBy("week")
  }

  /** Exact single change-point detection on the daily order-revenue
    * series (binary-segmentation step 1): the split maximizing the
    * between-segment sum of squares `B(t) = n₁n₂/D·(m₁−m₂)²` — the
    * largest mean shift, the question CUSUM ([[cusumDays]]) flags
    * online and this answers offline. Ties break to the earliest day.
    *
    * Scale shape: the corpus collapses to one row per day (bounded
    * domain, ≤ a few thousand rows) in a map-side-combined groupBy;
    * the prefix sums, the per-split statistic, and the argmax all run
    * on that tiny frame (the single-partition window is bounded by the
    * date domain, not the data — same argument as [[ewmaDaily]]).
    * Prefix revenue accumulates DECIMAL (order-independent); B(t) is
    * then pure IEEE-double arithmetic on exact inputs, identical in
    * any engine, so the argmax is deterministic. */
  def changePoint(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
    val w = Window.orderBy("day")
    val cum = daily.select(col("day"),
      row_number().over(w).cast("bigint").as("t"),
      sum(col("rev")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)).as("s1"))
    val tot = daily.agg(count(lit(1)).as("dd"),
      sum(col("rev")).as("ss"))
    val b = cum.crossJoin(tot).filter(col("t") < col("dd"))
      .select(col("day"), col("t"), col("dd"),
        (col("s1").cast("double") / col("t")).as("m1"),
        ((col("ss") - col("s1")).cast("double") / (col("dd") - col("t")))
          .as("m2"))
      .withColumn("b_stat",
        (col("t") * (col("dd") - col("t"))).cast("double") / col("dd") *
          (col("m1") - col("m2")) * (col("m1") - col("m2")))
    // the means are rationals (decimal/int) that CAN land exactly on a
    // .xx5 boundary — use the portable floor(z·100+0.5) round, not
    // round() (engines disagree on the half mode for doubles)
    def r2(c: Column) = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)
    b.orderBy(col("b_stat").desc, col("day")).limit(1)
      .select(col("day").as("split_day"), col("t").as("n_days_before"),
        (col("dd") - col("t")).as("n_days_after"),
        r2(col("m1")).as("mean_before"),
        r2(col("m2")).as("mean_after"),
        r2(col("b_stat")).as("b_stat"))
  }

  /** Welch's unequal-variance t-test between the deterministic hash-split
    * variants (same split as [[abLift]]/[[ksTest]]) on event value — the
    * parametric companion to the chi-square and KS gates. The whole test
    * is ONE map-side-collapsing aggregate: per-variant n/Σv/Σv² fold as
    * conditional sums into a single row (CASE-guarded DECIMAL sums, so
    * the partials merge order-independently at any executor count), and
    * mean/variance/t/df are scalar projections of those moments —
    * `var = (Σv² − (Σv)²/n)/(n−1)`, Welch–Satterthwaite df. Per-row v²
    * is an IEEE-deterministic double; every later op (−, ×, /, sqrt) is
    * correctly rounded, so the statistic is bit-equal cross-engine and
    * the portable floor round is cosmetic. */
  def welchTTest(ev: DataFrame): DataFrame = {
    val rows = ev.filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(Sampling.hashBucket(col("user_id"), 2).as("variant"),
        col("value"))
    def cSum(pred: Column, v: Column) =
      sum(when(pred, v).otherwise(lit(0.0)).cast("decimal(28,12)"))
    val m = rows.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      cSum(col("variant") === 0, col("value")).as("s_a"),
      cSum(col("variant") === 1, col("value")).as("s_b"),
      cSum(col("variant") === 0, col("value") * col("value")).as("ss_a"),
      cSum(col("variant") === 1, col("value") * col("value")).as("ss_b"))
    def d(name: String) = col(name).cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val meanA = d("s_a") / d("n_a")
    val meanB = d("s_b") / d("n_b")
    val varA = (d("ss_a") - d("s_a") * d("s_a") / d("n_a")) /
      (d("n_a") - lit(1.0))
    val varB = (d("ss_b") - d("s_b") * d("s_b") / d("n_b")) /
      (d("n_b") - lit(1.0))
    val seA = varA / d("n_a")
    val seB = varB / d("n_b")
    val se2 = seA + seB
    m.select(col("n_a"), col("n_b"),
      r6(meanA).as("mean_a"), r6(meanB).as("mean_b"),
      r6(varA).as("var_a"), r6(varB).as("var_b"),
      r6((meanA - meanB) / sqrt(se2)).as("t_stat"),
      r6(se2 * se2 / (seA * seA / (d("n_a") - lit(1.0)) +
        seB * seB / (d("n_b") - lit(1.0)))).as("df_welch"))
  }

  /** t-closeness audit — the third leg of the k-anonymity / l-diversity
    * release gate: a quasi-identifier group whose SENSITIVE-attribute
    * distribution sits far from the corpus-wide one leaks membership
    * signal even when it is large (k-safe) and diverse (l-safe). Quasi
    * key is (day, value bucket); the sensitive attribute is event_type —
    * categorical, so the Earth-Mover distance reduces to total variation
    * ½·Σ|pᵢ−qᵢ|. Types ABSENT from a group still contribute their global
    * mass qᵢ, folded in closed form: Σ|p−q| = 1 + Σ_{i∈group}(|pᵢ−qᵢ|−qᵢ),
    * so the per-group pass only touches cells that exist. Shape: one
    * corpus aggregate to (quasi × type) cells, a group-cardinality join
    * for group totals, the type-cardinality global frame broadcast; the
    * report is one row. Per-term rationals go double → DECIMAL so the
    * group sum merges order-independently. */
  def tCloseness(ev: DataFrame, tMax: Double = 0.2): DataFrame = {
    val rows = ev.filter(col("event_type").isNotNull &&
        col("ts").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts")).as("d"),
        floor(col("value") / 50.0).cast("bigint").as("vb"),
        col("event_type"))
    val cells = rows.groupBy("d", "vb", "event_type")
      .agg(count(lit(1)).as("c"))
    val grpTot = cells.groupBy("d", "vb").agg(sum(col("c")).as("ng"))
    val glob = cells.groupBy("event_type").agg(sum(col("c")).as("g"))
      .crossJoin(broadcast(cells.agg(sum(col("c")).as("n_all"))))
    val term = abs(col("c").cast("double") / col("ng").cast("double") -
        col("g").cast("double") / col("n_all").cast("double")) -
      col("g").cast("double") / col("n_all").cast("double")
    val perGroup = cells
      .join(grpTot, Seq("d", "vb"))
      .join(broadcast(glob), Seq("event_type"))
      .groupBy("d", "vb")
      .agg(max(col("ng")).as("n"),
        sum(term.cast("decimal(28,12)")).as("ts"))
      .withColumn("tvd",
        lit(0.5) * (lit(1.0) + col("ts").cast("double")))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    perGroup.agg(count(lit(1)).as("n_groups"),
        r6(max(col("tvd"))).as("max_tvd"),
        sum(when(col("tvd") > tMax, 1L).otherwise(0L)).as("n_wide_groups"),
        sum(when(col("tvd") > tMax, col("n")).otherwise(0L))
          .as("rows_at_risk"))
      .withColumn("t_max", lit(tMax))
  }

  /** Data-freshness / staleness SLO report: per event type, the last
    * observed day, its lag behind the corpus horizon, and the trailing
    * 7-day volume — the monitoring table a pipeline owner pages on when
    * a source silently stops emitting. One corpus aggregate collapses to
    * the (type × day) frame map-side; the horizon is a one-row broadcast;
    * everything after runs on day-cardinality data. */
  def stalenessReport(ev: DataFrame, maxLagDays: Int = 3): DataFrame = {
    val daily = ev.filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    val hor = daily.agg(max(col("d")).as("horizon"))
    daily.crossJoin(broadcast(hor))
      .groupBy("event_type")
      .agg(max(col("d")).as("last_day"),
        sum(col("c")).as("n_rows"),
        sum(when(col("d") >= date_sub(col("horizon"), 6), col("c"))
          .otherwise(0L)).as("n_last7"),
        datediff(max(col("horizon")), max(col("d"))).cast("bigint")
          .as("lag_days"))
      .withColumn("is_stale", (col("lag_days") > maxLagDays).cast("int"))
      .select(col("event_type"), col("n_rows"), col("last_day"),
        col("lag_days"), col("n_last7"), col("is_stale"))
      .orderBy("event_type")
  }

  /** Brown's double exponential smoothing (α = ½) of daily revenue —
    * level, trend, and the one-step forecast a monitoring dashboard
    * projects forward: s2 = EWMA(EWMA(x)), level = 2s1 − s2,
    * trend = s1 − s2 (α/(1−α) = 1), forecast = level + trend. Both
    * smoothing passes reuse [[ewmaDaily]]'s exact dyadic kernel (weights
    * are integer bit-shifts — `pow` has no cross-libm guarantee, shifts
    * do; per-term doubles go DECIMAL before the sum). The convolutions
    * run on the DAY frame — domain-bounded, never data-scale — behind
    * one corpus aggregate; weights beyond 2⁻⁶² underflow the rounding
    * and are dropped. */
  /** [[ewmaDaily]]'s exact dyadic α=½ smoothing kernel over a (d, t,
    * valCol) day frame — shared by [[brownTrend]] (twice) and
    * [[forecastEval]]. Bit-shift weights, per-term doubles into DECIMAL;
    * the pair join is day-frame-bounded. */
  private def dyadicSmooth(src: DataFrame, valCol: String,
                           outCol: String): DataFrame =
    src.select(col("d"), col("t"))
      // broadcast: the (t, x) side is the DAY frame — domain-bounded at
      // any corpus size — and the non-equi band join must not fall back
      // to a CartesianProduct when its input hides behind a checkpoint
      // with unknown stats
      .join(broadcast(src.select(col("t").as("j"), col(valCol).as("xj"))),
        col("j") <= col("t") && col("t") - col("j") <= lit(62))
      .withColumn("k",
        when(col("j") === 1, col("t") - lit(1))
          .otherwise(col("t") - col("j") + lit(1)))
      .withColumn("term", col("xj") /
        expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))")
          .cast("double"))
      .groupBy("d", "t")
      .agg(sum(col("term").cast("decimal(28,10)")).cast("double")
        .as(outCol))

  def brownTrend(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
      .withColumn("t", row_number().over(Window.orderBy("d")))
      // day-frame barrier: both convolution passes and the final join
      // read this ≤|days| frame, not the corpus
      .localCheckpoint()
    val withS1 = daily.join(dyadicSmooth(daily, "x", "v1"), Seq("d", "t"))
    val out = withS1.join(dyadicSmooth(withS1, "v1", "v2"), Seq("d", "t"))
    def r4(c: Column) = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    out.select(col("d"), col("x").as("daily_revenue"),
        r4(col("v1")).as("s1"), r4(col("v2")).as("s2"),
        r4(lit(2.0) * col("v1") - col("v2")).as("level"),
        r4(col("v1") - col("v2")).as("trend"),
        r4((lit(2.0) * col("v1") - col("v2")) +
          (col("v1") - col("v2"))).as("forecast_next"))
      .orderBy("d")
  }

  /** Rolling-origin one-step forecast backtest: for every day t ≥ 2,
    * score yesterday's two forecasters against today's actual — the
    * NAIVE carry-forward x_{t−1} and the EWMA level s1_{t−1} (the exact
    * dyadic smoother of [[ewmaDaily]]) — and report MAE / RMSE / MAPE
    * per model. This is the eval loop that decides whether the smoother
    * earns its keep before anyone trusts [[brownTrend]]'s projections.
    * One corpus aggregate builds the day frame; the backtest itself is
    * day-frame-bounded (lag window + two one-row aggregates). Error
    * terms are IEEE-deterministic doubles folded through DECIMAL, so
    * every metric is engine-exact. */
  /** Consensus anomaly report over the daily-revenue series: a day is
    * surfaced only when at least two of three INDEPENDENT detectors
    * agree — z-score (mean/σ), Tukey fences (quartiles/IQR), and
    * modified z (median/MAD) — the standard false-positive reducer for
    * paging: each detector alone has a known failure mode (z is dragged
    * by the outliers themselves, fences go degenerate on tiny IQR, MAD
    * dies on over-50% flat series), and their intersection pages far
    * less. All thresholds derive from ONE day-frame stats pass
    * broadcast back; the flags are integer comparisons of
    * engine-identical doubles. */
  def anomalyConsensus(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("event_type") === "purchase" &&
        col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("v"))
      .localCheckpoint() // the stats pass and the flag pass share it
    def dec(c: Column) = c.cast("decimal(28,10)")
    val stats = daily.agg(count(lit(1)).as("n"),
        sum(dec(col("v"))).cast("double").as("s"),
        sum(dec(col("v") * col("v"))).cast("double").as("ss"),
        expr("percentile(v, 0.25)").as("q1"),
        expr("percentile(v, 0.5)").as("med"),
        expr("percentile(v, 0.75)").as("q3"))
      .select(
        (col("s") / col("n").cast("double")).as("mu"),
        sqrt(greatest(col("ss") / col("n").cast("double") -
          (col("s") / col("n").cast("double")) *
          (col("s") / col("n").cast("double")), lit(0.0))).as("sd"),
        col("q1"), col("med"), col("q3"))
    val mad = daily.crossJoin(broadcast(stats))
      .select(abs(col("v") - col("med")).as("ad"))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    val iqr = col("q3") - col("q1")
    val zFlag = (col("sd") > 0.0 &&
      abs(col("v") - col("mu")) > lit(2.0) * col("sd")).cast("int")
    val fenceFlag = (col("v") < col("q1") - lit(1.5) * iqr ||
      col("v") > col("q3") + lit(1.5) * iqr).cast("int")
    val madFlag = (col("mad") > 0.0 &&
      abs(col("v") - col("med")) > lit(2.0) * lit(1.4826) * col("mad"))
      .cast("int")
    // the full per-day flag table ships (a quiet month legitimately has
    // zero consensus rows — the report should still show the votes);
    // the paging rule is the n_methods >= 2 filter downstream
    daily.crossJoin(broadcast(stats)).crossJoin(broadcast(mad))
      .select(col("d"), col("v"), zFlag.as("z_flag"),
        fenceFlag.as("fence_flag"), madFlag.as("mad_flag"))
      .withColumn("n_methods",
        (col("z_flag") + col("fence_flag") + col("mad_flag"))
          .cast("bigint"))
      .orderBy("d")
  }

  /** Seasonal-naive one-step backtest — the third arm beside
    * [[forecastEval]]'s naive and EWMA: forecast each day with the
    * value from SEVEN days earlier (the weekly cycle
    * [[graft.analytics.EventAnalytics.seasonalStrength]] found is
    * real), scored with the same MAE/RMSE/MAPE. If this beats plain
    * naive, every monitor baseline should be seasonal. Day-frame lag
    * window only; error terms in DECIMAL. */
  def forecastSeasonalNaive(ev: DataFrame, season: Int = 7): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
    val w = Window.orderBy(col("d"))
    val scored = daily
      .withColumn("fc", lag(col("x"), season).over(w))
      .filter(col("fc").isNotNull)
    def dec(c: Column) = c.cast("decimal(28,10)")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m = scored.agg(count(lit(1)).as("n_days"),
      sum(dec(abs(col("x") - col("fc")))).cast("double").as("sae"),
      sum(dec((col("x") - col("fc")) * (col("x") - col("fc"))))
        .cast("double").as("sse"),
      sum((abs(col("x") - col("fc")) / col("x")).cast("decimal(28,12)"))
        .cast("double").as("sape"))
    m.select(lit("seasonal_naive").as("model"), col("n_days"),
      r6(col("sae") / col("n_days").cast("double")).as("mae"),
      r6(sqrt(col("sse") / col("n_days").cast("double"))).as("rmse"),
      r6(col("sape") / col("n_days").cast("double") * lit(100.0))
        .as("mape_pct"))
  }

  /** One-day Value-at-Risk / CVaR of the daily-revenue CHANGE series —
    * the risk summary a revenue monitor quotes ("with 95% confidence,
    * tomorrow loses at most X; when it breaches, the expected loss is
    * Y"): exact 5th percentile of day-over-day deltas, and the mean of
    * the deltas at or below it. Day-frame lag + two aggregates; the
    * CVaR mass selects on the r6-ROUNDED VaR so both engines cut the
    * identical tail. */
  def revenueVar(ev: DataFrame, q: Double = 0.05): DataFrame = {
    val daily = ev.filter(col("event_type") === "purchase" &&
        col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
    val w = Window.orderBy(col("d"))
    val deltas = daily
      .withColumn("dx", col("x") - lag(col("x"), 1).over(w))
      .filter(col("dx").isNotNull)
      .select(col("dx")).localCheckpoint()
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val v = deltas.agg(count(lit(1)).as("n_days"),
        expr(s"percentile(dx, $q)").as("var_raw"))
      .select(col("n_days"), r6(col("var_raw")).as("var_95"))
    val cvar = deltas.crossJoin(broadcast(v))
      .filter(col("dx") <= col("var_95"))
      .agg(count(lit(1)).as("n_tail"),
        (sum(col("dx").cast("decimal(28,10)")).cast("double") /
          count(lit(1))).as("cvar_raw"))
    v.crossJoin(broadcast(cvar))
      .select(col("n_days"), col("var_95"), col("n_tail"),
        r6(col("cvar_raw")).as("cvar_95"))
  }

  def forecastEval(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
      .withColumn("t", row_number().over(Window.orderBy("d")))
      .localCheckpoint()
    val w = Window.orderBy("t")
    val base = daily.join(dyadicSmooth(daily, "x", "s1"), Seq("d", "t"))
      .withColumn("naive_fc", lag(col("x"), 1).over(w))
      .withColumn("ewma_fc", lag(col("s1"), 1).over(w))
      .filter(col("t") >= 2)
      .localCheckpoint()
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    def report(fcCol: String, name: String): DataFrame = {
      val err = col("x") - col(fcCol)
      base.agg(count(lit(1)).as("n_days"),
          sum(abs(err).cast("decimal(28,10)")).cast("double").as("sae"),
          sum((err * err).cast("decimal(28,10)")).cast("double").as("sse"),
          sum((abs(err) / col("x")).cast("decimal(28,12)")).cast("double")
            .as("sape"))
        .select(lit(name).as("model"), col("n_days"),
          r6(col("sae") / col("n_days").cast("double")).as("mae"),
          r6(sqrt(col("sse") / col("n_days").cast("double"))).as("rmse"),
          r6(col("sape") / col("n_days").cast("double") * lit(100.0))
            .as("mape_pct"))
    }
    report("naive_fc", "naive").unionAll(report("ewma_fc", "ewma"))
      .orderBy("model")
  }

  /** Cochran–Mantel–Haenszel test of variant × conversion association
    * STRATIFIED by day — the Simpson's-paradox-safe companion to the
    * marginal [[chiSquare]]: pooling days can manufacture or hide an
    * association when traffic mix shifts; CMH sums each day's 2×2
    * evidence (aₖ − Eₖ) and variance before squaring. Per-stratum cells
    * are exact integers over (day, user) units (a user converts on a day
    * iff any purchase event lands there); Eₖ and Vₖ are rationals of
    * those integers, folded through DECIMAL so the stratum sum is
    * order-independent. Shape: one corpus aggregate to (day, user)
    * units, one to day strata, one to the scalar — no joins, no
    * windows. */
  def cmhTest(ev: DataFrame): DataFrame = {
    val units = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"),
        Sampling.hashBucket(col("user_id"), 2).as("variant"),
        col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("conv"))
    val strata = units.groupBy("d")
      .agg(
        sum(when(col("variant") === 0 && col("conv") === 1, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("r1"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("r2"),
        sum(col("conv").cast("long")).as("c1"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
    def dd(c: Column) = c.cast("double")
    val e = dd(col("r1")) * dd(col("c1")) / dd(col("n"))
    val v = dd(col("r1")) * dd(col("r2")) * dd(col("c1")) *
      (dd(col("n")) - dd(col("c1"))) /
      (dd(col("n")) * dd(col("n")) * (dd(col("n")) - lit(1.0)))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    strata.agg(count(lit(1)).as("n_strata"),
        sum(col("a")).as("sum_a"),
        sum(e.cast("decimal(28,12)")).as("__se"),
        sum(v.cast("decimal(28,12)")).as("__sv"))
      .select(col("n_strata"), col("sum_a"),
        r6(col("__se").cast("double")).as("sum_expected"),
        r6((col("sum_a").cast("double") - col("__se").cast("double")) *
          (col("sum_a").cast("double") - col("__se").cast("double")) /
          col("__sv").cast("double")).as("cmh_stat"))
  }

  /** Difference-in-differences over the deterministic hash variants and
    * the corpus time halves: DiD = (treat_post − treat_pre) −
    * (ctrl_post − ctrl_pre) on mean event value — the quasi-experimental
    * readout when randomized exposure is unavailable and both groups
    * share a pre-period trend. The four cell means come from ONE
    * map-side-collapsing aggregate (DECIMAL sums, exact counts); the
    * midpoint is a one-row broadcast. */
  def diffInDiff(ev: DataFrame): DataFrame = {
    val rows = ev.filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(Sampling.hashBucket(col("user_id"), 2).as("variant"),
        to_date(col("ts")).as("d"), col("value"))
    val span = rows.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      // floor() explicitly: Spark's double→int cast truncates but
      // DuckDB's rounds — floor is the one half-mode both share
      .select(date_add(col("d0"),
        floor(datediff(col("d1"), col("d0")) / 2).cast("int")).as("mid"))
    val m = rows.crossJoin(broadcast(span))
      .withColumn("post", (col("d") > col("mid")).cast("int"))
    def cell(vr: Int, po: Int) = {
      val p = col("variant") === vr && col("post") === po
      (sum(when(p, col("value")).otherwise(lit(0.0))
        .cast("decimal(28,12)")),
        sum(when(p, 1L).otherwise(0L)))
    }
    val ((s00, n00), (s01, n01)) = (cell(0, 0), cell(0, 1))
    val ((s10, n10), (s11, n11)) = (cell(1, 0), cell(1, 1))
    val agg = m.agg(s00.as("s00"), n00.as("n00"), s01.as("s01"),
      n01.as("n01"), s10.as("s10"), n10.as("n10"), s11.as("s11"),
      n11.as("n11"))
    def mean(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    agg.select(col("n00"), col("n01"), col("n10"), col("n11"),
      r6(mean("s00", "n00")).as("ctrl_pre"),
      r6(mean("s01", "n01")).as("ctrl_post"),
      r6(mean("s10", "n10")).as("treat_pre"),
      r6(mean("s11", "n11")).as("treat_post"),
      r6((mean("s11", "n11") - mean("s10", "n10")) -
        (mean("s01", "n01") - mean("s00", "n00"))).as("did"))
  }

  /** Sample-ratio-mismatch guardrail: the first check every A/B readout
    * runs BEFORE looking at any metric — if the observed variant split
    * deviates from the designed 50/50 beyond chance, the assignment
    * path is broken and the experiment is invalid regardless of lift.
    * One-dof chi-square against the expected half-half counts, flagged
    * at the conventional χ² > 10.83 (p < 0.001) bar. One map-side-
    * collapsing aggregate; every output is a rational of exact
    * integers. */
  def srmCheck(ev: DataFrame): DataFrame = {
    val m = ev.filter(col("user_id").isNotNull)
      .select(Sampling.hashBucket(col("user_id"), 2).as("variant"))
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val n = d(col("n_a")) + d(col("n_b"))
    val e = n / lit(2.0)
    val chi2 = (d(col("n_a")) - e) * (d(col("n_a")) - e) / e +
      (d(col("n_b")) - e) * (d(col("n_b")) - e) / e
    m.select(col("n_a"), col("n_b"),
      r6(d(col("n_a")) / n).as("ratio_a"),
      r6(chi2).as("chi2"),
      (chi2 > lit(10.83)).cast("int").as("srm_flag"))
  }

  /** Randomized-response local-DP audit (Warner's mechanism): each row
    * reports its true bit ("is a purchase") with probability ¾ and the
    * flipped bit with probability ¼, and the aggregator debiases the
    * observed rate: π̂ = (p_obs − ¼) / ½. The flip is the DETERMINISTIC
    * portable hash of the row key (the [[bootstrapCi]] discipline: no RNG
    * state, bit-identical in the oracle), so the audit can also report
    * the true rate and the mechanism's actual estimation error — the
    * utility-vs-privacy table a release gate reads. One map-side-
    * collapsing aggregate; every output is a rational of exact integers. */
  def randomizedResponse(ev: DataFrame): DataFrame = {
    val bit = (col("event_type") === "purchase").cast("int")
    val flip = (Sampling.hashBucket(col("event_id"), 4) === 0).cast("int")
    val rows = ev.filter(col("event_type").isNotNull)
      .select(bit.as("b"), flip.as("f"))
      .withColumn("r", col("b") + col("f") - lit(2) * col("b") * col("f"))
    val m = rows.agg(count(lit(1)).as("n"),
      sum(col("b").cast("long")).as("sb"),
      sum(col("r").cast("long")).as("sr"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val pTrue = d(col("sb")) / d(col("n"))
    val pObs = d(col("sr")) / d(col("n"))
    val pEst = (pObs - lit(0.25)) / lit(0.5)
    m.select(col("n"), col("sb").as("n_true_pos"),
      col("sr").as("n_reported_pos"),
      r6(pTrue).as("p_true"), r6(pObs).as("p_observed"),
      r6(pEst).as("p_estimated"), r6(abs(pEst - pTrue)).as("abs_err"))
  }

  /** Mann–Whitney rank-sum test — the distribution-free sibling of
    * [[welchTTest]], on the same deterministic hash-split A/B variants:
    * does per-user activity DISTRIBUTION differ between the two arms,
    * with NO normality assumption (counts are right-skewed, so Welch's
    * t alone over-trusts its tails)? The ranked variable is the
    * per-user event count — a small integer, so the rank computation
    * runs over its VALUE CENSUS (one row per distinct count — bounded
    * by the busiest user, not by user cardinality), never over the user
    * frame: average ranks come from an exclusive cumulative sum over
    * the census, tie correction Σ(t³−t) from the same census in exact
    * integers, and the rank-sum R_a is a DECIMAL sum of .5-grain
    * rationals (order-independent partial merges). Reports U for both
    * arms and the tie-corrected normal z. */
  def mannWhitney(ev: DataFrame): DataFrame =
    mannWhitneyOnGroups(ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"))
      .withColumn("g", Sampling.hashBucket(col("user_id"), 2)))

  /** [[mannWhitney]] over a prebuilt (x, g ∈ {0,1}) unit frame — the
    * hand-traceable core. */
  private[graft] def mannWhitneyOnGroups(per: DataFrame): DataFrame = {
    val census = per.groupBy("x")
      .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("cb"))
    // global window, but over the value census (distinct per-user event
    // counts — domain-bounded), never the user frame: see PLANS.md's
    // global-window index
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = census
      .withColumn("t", col("ca") + col("cb"))
      .withColumn("below", coalesce(sum(col("ca") + col("cb")).over(w),
        lit(0L)))
      .withColumn("avg_rank", col("below").cast("double") +
        (col("t").cast("double") + lit(1.0)) / lit(2.0))
    val m = ranked.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      sum((col("ca").cast("double") * col("avg_rank"))
        .cast("decimal(28,12)")).as("ra"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val nA = d(col("n_a")); val nB = d(col("n_b")); val n = nA + nB
    val uA = d(col("ra")) - nA * (nA + lit(1.0)) / lit(2.0)
    val mu = nA * nB / lit(2.0)
    val sigma = sqrt(nA * nB / lit(12.0) *
      ((n + lit(1.0)) - d(col("tsum")) / (n * (n - lit(1.0)))))
    m.select(col("n_a"), col("n_b"),
      r6(uA).as("u_a"), r6(nA * nB - uA).as("u_b"),
      r6(mu).as("mu_u"), r6(sigma).as("sigma_u"),
      // sigma = 0 ⇔ one arm is empty or every unit ties — z = 0, not ÷0
      r6(when(sigma > lit(0.0), (uA - mu) / sigma).otherwise(lit(0.0)))
        .as("z"))
  }

  /** Instrumental-variable Wald estimator — the causal family's answer
    * when treatment is self-selected but an as-if-random INSTRUMENT
    * shifts it: here Z = "user's first event fell in the morning"
    * (hour < 12 — first-touch timing is plausibly exogenous to later
    * spend), treatment T = heavy clicker (≥ 14 clicks, the corpus
    * median split), outcome Y = total purchase value. LATE =
    * (Ȳ_{Z=1} − Ȳ_{Z=0}) / (T̄_{Z=1} − T̄_{Z=0}) — the effect of heavy
    * clicking for instrument-compliers, immune to the confounding that
    * biases the naive heavy-vs-light contrast. The first stage ships
    * beside the estimate with a weak-instrument flag (empty arm OR
    * |first stage| < 0.01): a Wald ratio over a null first stage is
    * noise, and the flag says so instead of letting the ratio explode
    * (0-guarded). On the fixtures both paths run: sf0.01's first stage
    * clears the gate (LATE reported), sf0.1's does not (flag = 1).
    *
    * Scale shape: one user aggregate (shuffle on user, map-side
    * combined), then a one-row conditional fold — nothing else moves.
    * Per-user revenue folds through DECIMAL(18,6) (the revenue
    * discipline), so Y is bit-stable across engines. */
  def waldIv(ev: DataFrame, clickSplit: Long = 14L): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"),
        (sum(when(col("event_type") === "click", 1L).otherwise(0L)) >=
          clickSplit).cast("long").as("t"),
        sum(when(col("event_type") === "purchase",
            coalesce(col("value"), lit(0.0))).otherwise(lit(0.0))
          .cast("decimal(18,6)")).as("yd"))
      .select((hour(col("first_ts")) < 12).cast("int").as("z"), col("t"),
        col("yd").cast("double").as("y"))
    def dec(c: Column) = c.cast("decimal(28,12)")
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m = per.agg(
      sum(when(col("z") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("z") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("z") === 1, dec(col("y")))
        .otherwise(lit(0).cast("decimal(28,12)"))).cast("double")
        .as("sy1"),
      sum(when(col("z") === 0, dec(col("y")))
        .otherwise(lit(0).cast("decimal(28,12)"))).cast("double")
        .as("sy0"),
      sum(when(col("z") === 1, col("t")).otherwise(0L)).as("st1"),
      sum(when(col("z") === 0, col("t")).otherwise(0L)).as("st0"))
    val ok = col("n1") > 0L && col("n0") > 0L
    // divisors are STRUCTURALLY nonzero (greatest / sentinel), with the
    // `when(ok, …)` gates supplying the semantics: codegen's common-
    // subexpression elimination hoists shared subexpressions OUT of
    // CASE branches, so under ANSI mode a guarded-but-shared x/n with
    // n = 0 still throws DIVIDE_BY_ZERO — the divisor itself must never
    // be zero. (Empty-arm case: st1 = sy1 = 0, so /1 yields 0 anyway.)
    val y1 = d(col("sy1")) / d(greatest(col("n1"), lit(1L)))
    val y0 = d(col("sy0")) / d(greatest(col("n0"), lit(1L)))
    val t1 = d(col("st1")) / d(greatest(col("n1"), lit(1L)))
    val t0 = d(col("st0")) / d(greatest(col("n0"), lit(1L)))
    val fs = t1 - t0
    val fsDiv = when(abs(fs) >= lit(0.01), fs).otherwise(lit(1.0))
    m.select(col("n1").as("n_z1"), col("n0").as("n_z0"),
      r6(when(ok, y1).otherwise(lit(0.0))).as("y_mean_z1"),
      r6(when(ok, y0).otherwise(lit(0.0))).as("y_mean_z0"),
      r6(when(ok, fs).otherwise(lit(0.0))).as("first_stage"),
      // 1 = do NOT trust wald_late: empty arm OR null first stage
      when(ok && abs(fs) >= lit(0.01), 0).otherwise(1)
        .cast("int").as("weak_instrument"),
      r6(when(ok && abs(fs) >= lit(0.01), (y1 - y0) / fsDiv)
        .otherwise(lit(0.0))).as("wald_late"))
  }

  /** Sharp regression-discontinuity estimate at an order-price cutoff:
    * does the average line-item discount JUMP as orders cross the
    * threshold? Local linear fits on each side of the cutoff within a
    * bandwidth (the standard RDD estimator): per side, OLS of per-order
    * mean discount on the centered running variable u = price − cutoff;
    * τ = α_right − α_left is the discontinuity at u = 0. Closed-form
    * OLS over conditional sums (the [[grouped-OLS|discount-elasticity]]
    * discipline), every fold through DECIMAL; degenerate sides (n < 2
    * or zero variance) report 0 with the n columns saying why.
    *
    * Scale shape: the band filter prunes orders FIRST (pushdown-able
    * predicate), the banded keys join lineitem (AQE broadcasts the
    * small banded side at any scale where RDD is meaningful), one
    * per-order aggregate, one one-row conditional fold. */
  def rdd(orders: DataFrame, lineitem: DataFrame,
          cutoff: Double = 150000.0, bandwidth: Double = 30000.0)
      : DataFrame = {
    val band = orders.select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("x"))
      .filter(abs(col("x") - lit(cutoff)) <= lit(bandwidth))
    def dec(c: Column) = c.cast("decimal(28,12)")
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val perOrder = lineitem
      .join(band, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("x"))
      .agg((sum(col("l_discount").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("y"))
      .select((col("x") - lit(cutoff)).as("u"), col("y"),
        (col("x") >= lit(cutoff)).cast("int").as("side"))
    def side(s: Int, c: Column) =
      sum(when(col("side") === s, dec(c))
        .otherwise(lit(0).cast("decimal(28,12)"))).cast("double")
    def sideN(s: Int) = sum(when(col("side") === s, 1L).otherwise(0L))
    val m = perOrder.agg(
      sideN(0).as("nl"), sideN(1).as("nr"),
      side(0, col("u")).as("sul"), side(1, col("u")).as("sur"),
      side(0, col("y")).as("syl"), side(1, col("y")).as("syr"),
      side(0, col("u") * col("y")).as("suyl"),
      side(1, col("u") * col("y")).as("suyr"),
      side(0, col("u") * col("u")).as("suul"),
      side(1, col("u") * col("u")).as("suur"))
    def alpha(n: Column, su: Column, sy: Column, suy: Column,
              suu: Column): (Column, Column) = {
      val den = d(n) * suu - su * su
      // sentinel divisor: the shared den subexpression gets hoisted out
      // of the CASE branches by codegen CSE, so under ANSI the divisor
      // itself must be structurally nonzero (the waldIv discipline)
      val denDiv = when(den =!= 0.0, den).otherwise(lit(1.0))
      (when(n >= 2L && den =!= 0.0,
        (sy * suu - su * suy) / denDiv).otherwise(lit(0.0)),
        when(n >= 2L && den =!= 0.0,
          (d(n) * suy - su * sy) / denDiv).otherwise(lit(0.0)))
    }
    val (al, bl) = alpha(col("nl"), col("sul"), col("syl"),
      col("suyl"), col("suul"))
    val (ar, br) = alpha(col("nr"), col("sur"), col("syr"),
      col("suyr"), col("suur"))
    m.select(col("nl").as("n_left"), col("nr").as("n_right"),
      r6(al).as("alpha_left"), r6(ar).as("alpha_right"),
      r6(bl).as("slope_left"), r6(br).as("slope_right"),
      r6(ar - al).as("tau_jump"))
  }

  /** Per-segment overdispersion check of per-customer order counts —
    * the "is Poisson even plausible" gate before any count model
    * (negative-binomial vs Poisson is THE first modeling fork):
    * dispersion D = s²/x̄ per market segment, with the index-of-
    * dispersion statistic (n−1)·D ~ χ²(n−1) under Poisson. D ≫ 1 means
    * clumping (model with NB), D ≪ 1 regularity. The flag compares D
    * against a stated literal 1.5. Variance via the exact sums
    * (Σx, Σx² are integers — no cancellation), divisors structurally
    * guarded (waldIv discipline).
    *
    * Scale shape: one customer aggregate, one segment-bounded fold. */
  def overdispersion(orders: DataFrame, customer: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("x"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("x"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m = per.groupBy("segment")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val ok = col("n") > 1L && col("sx") > 0L
    val mean = d(col("sx")) / d(greatest(col("n"), lit(1L)))
    val variance = (d(col("sxx")) - d(col("sx")) * d(col("sx")) /
      d(greatest(col("n"), lit(1L)))) /
      d(greatest(col("n") - 1L, lit(1L)))
    val meanDiv = when(mean =!= 0.0, mean).otherwise(lit(1.0))
    val disp = variance / meanDiv
    m.select(col("segment"), col("n"),
      r6(mean).as("mean_count"),
      r6(when(ok, variance).otherwise(lit(0.0))).as("var_count"),
      r6(when(ok, disp).otherwise(lit(0.0))).as("dispersion"),
      r6(when(ok, (d(col("n")) - lit(1.0)) * disp).otherwise(lit(0.0)))
        .as("chi2_stat"),
      when(ok && disp > lit(1.5), 1).otherwise(0).cast("int")
        .as("overdispersed_at_1_5"))
      .orderBy("segment")
  }

  /** Two-round iterative proportional fitting (raking) of the
    * weekday × event-type cell counts to UNIFORM target margins — the
    * survey-weighting step that rebalances a logged sample to known
    * population margins: round 1 scales every cell so each weekday row
    * sums to total/7, round 2 rescales so each event-type column sums
    * to total/|types|. Reports per-cell raw counts, the raked weight,
    * and the post-fit row/column margin residuals (column margins fit
    * exactly after round 2; row margins show the classic one-round
    * drift that further IPF rounds would shrink). Bounded cells (≤ 7 ×
    * |types|), all ratios double with DECIMAL margin folds, divisors
    * structurally nonzero.
    *
    * Scale shape: one corpus aggregate into the bounded cell census;
    * both IPF rounds are cell-frame algebra. */
  def raking(ev: DataFrame): DataFrame = {
    val cells = ev.filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(((floor(unix_micros(col("ts")) / lit(86400000000L)) +
        lit(4)) % 7).cast("int").as("dow"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // both rounds and the total read it
    def dec(c: Column) = c.cast("decimal(28,12)")
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val tot = cells.agg(sum(col("n")).as("nt"),
      countDistinct(col("dow")).as("n_rows"),
      countDistinct(col("event_type")).as("n_cols"))
    val base = cells.crossJoin(broadcast(tot))
      .select(col("dow"), col("event_type"), col("n"),
        (d(col("nt")) / d(col("n_rows"))).as("t_row"),
        (d(col("nt")) / d(col("n_cols"))).as("t_col"))
    // round 1: fit row (dow) margins
    val rowSum = base.groupBy("dow")
      .agg(sum(dec(col("n"))).cast("double").as("rs"))
    val w1 = base.join(broadcast(rowSum), Seq("dow"))
      .select(col("dow"), col("event_type"), col("n"), col("t_row"),
        col("t_col"),
        (d(col("n")) * col("t_row") /
          when(col("rs") =!= 0.0, col("rs")).otherwise(lit(1.0)))
          .as("w"))
    // round 2: fit column (event_type) margins
    val colSum = w1.groupBy("event_type")
      .agg(sum(dec(col("w"))).cast("double").as("cs"))
    val w2 = w1.join(broadcast(colSum), Seq("event_type"))
      .select(col("dow"), col("event_type"), col("n"), col("t_row"),
        (col("w") * col("t_col") /
          when(col("cs") =!= 0.0, col("cs")).otherwise(lit(1.0)))
          .as("w"))
    // residual: how far each dow row still is from its target margin
    val rowResid = w2.groupBy("dow")
      .agg(sum(dec(col("w"))).cast("double").as("rs2"),
        max(col("t_row")).as("tr"))
      .select(col("dow"), (col("rs2") - col("tr")).as("row_resid"))
    w2.join(broadcast(rowResid), Seq("dow"))
      .select(col("dow"), col("event_type"), col("n"),
        r6(col("w")).as("raked_weight"),
        r6(col("row_resid")).as("row_margin_residual"))
      .orderBy("dow", "event_type")
  }

  /** VanderWeele–Ding E-value for unmeasured confounding — the
    * sensitivity number every observational contrast in this family
    * ([[ipwAte]], [[waldIv]], the naive heavy-vs-light split) should
    * ship with: how strong would an unmeasured confounder have to be
    * (on the risk-ratio scale, with BOTH exposure and outcome) to
    * explain the observed association away? E = RR* + √(RR*·(RR*−1))
    * with RR* = max(RR, 1/RR); E = 1 means "any confounding at all
    * could do it". Exposure: heavy clicker (≥ `clickSplit` clicks);
    * outcome: purchased. Degenerate margins (an empty arm or a zero
    * outcome rate) report E = 1 with the count columns saying why —
    * divisors are structurally nonzero (waldIv discipline).
    *
    * Scale shape: one user aggregate, one 2×2 fold. */
  def eValue(ev: DataFrame, clickSplit: Long = 14L): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L)) >=
        clickSplit).cast("long").as("e"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val m = per.agg(
      sum(when(col("e") === 1L && col("y") === 1L, 1L).otherwise(0L))
        .as("a"),
      sum(when(col("e") === 1L && col("y") === 0L, 1L).otherwise(0L))
        .as("b"),
      sum(when(col("e") === 0L && col("y") === 1L, 1L).otherwise(0L))
        .as("c"),
      sum(when(col("e") === 0L && col("y") === 0L, 1L).otherwise(0L))
        .as("dd"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val n1 = col("a") + col("b")
    val n0 = col("c") + col("dd")
    val ok = n1 > 0L && n0 > 0L && col("a") > 0L && col("c") > 0L
    val p1 = d(col("a")) / d(greatest(n1, lit(1L)))
    val p0 = d(col("c")) / d(greatest(n0, lit(1L)))
    val p0Div = when(p0 =!= 0.0, p0).otherwise(lit(1.0))
    val p1Div = when(p1 =!= 0.0, p1).otherwise(lit(1.0))
    val rr = p1 / p0Div
    val rrStar = when(rr >= lit(1.0), rr).otherwise(p0 / p1Div)
    m.select(col("a").as("n_exp_pos"), col("b").as("n_exp_neg"),
      col("c").as("n_unexp_pos"), col("dd").as("n_unexp_neg"),
      r6(when(ok, rr).otherwise(lit(1.0))).as("risk_ratio"),
      r6(when(ok, rrStar + sqrt(rrStar * (rrStar - lit(1.0))))
        .otherwise(lit(1.0))).as("e_value"))
  }

  /** Information-gain ranking of candidate event features against the
    * is-purchase label — the feature-selection screen a training-set
    * builder runs before committing columns: for each feature
    * (hour-of-day quartered, portable weekday, value band, has-value),
    * IG = H(label) − H(label | feature) over the event frame, plus the
    * normalized IG/H(label). All entropies fold p·ln p terms through
    * DECIMAL over CATEGORY-BOUNDED censuses; the label entropy is
    * shared by every arm. Zero-entropy labels (all one class) report
    * 0s (sentinel divisor — waldIv discipline).
    *
    * Scale shape: one aggregate per feature arm into a ≤|cells| census
    * (map-side combined), unioned; nothing data-scale moves twice. */
  def infoGainRanking(ev: DataFrame): DataFrame = {
    val base = ev.filter(col("ts").isNotNull)
      .select(
        (col("event_type") === "purchase").cast("int").as("label"),
        (hour(col("ts")) / 6).cast("int").as("hour_q"),
        ((floor(unix_micros(col("ts")) / lit(86400000000L)) + lit(4)) % 7)
          .cast("int").as("dow"),
        when(col("value").isNull, -1)
          .otherwise(least(floor(col("value") / 100.0), lit(9.0)))
          .cast("int").as("value_band"),
        col("value").isNotNull.cast("int").as("has_value"))
      .localCheckpoint() // every feature arm scans it
    def dec(c: Column) = c.cast("decimal(28,12)")
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    // H(label): binary entropy from the label census
    val hLabel = base.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("nt"),
        sum(dec(d(col("n")) * log(d(col("n"))))).cast("double").as("snln"))
      .select(col("nt"),
        (log(d(col("nt"))) - col("snln") / d(col("nt"))).as("h_label"))
      .localCheckpoint()
    val arms = Seq("hour_q", "dow", "value_band", "has_value").map { f =>
      // H(label|feature) = Σ_v p(v)·H(label|v), from the (v, label)
      // census: Σ_v,l −(n_vl/N)·ln(n_vl/n_v)
      val cells = base.groupBy(col(f).as("v"), col("label"))
        .agg(count(lit(1)).as("nvl"))
      val perV = cells.groupBy("v").agg(sum(col("nvl")).as("nv"))
      cells.join(perV, Seq("v"))
        .agg(count(lit(1)).as("n_cells"),
          sum(dec(d(col("nvl")) * log(d(col("nvl")) / d(col("nv")))))
            .cast("double").as("s"))
        .select(lit(f).as("feature"), col("n_cells"), col("s"))
    }
    arms.reduce(_ unionAll _)
      .crossJoin(broadcast(hLabel))
      .select(col("feature"), col("n_cells"),
        r6(col("h_label")).as("h_label"),
        r6(col("h_label") + col("s") / d(col("nt"))).as("info_gain"),
        r6(when(col("h_label") > 0.0,
          (col("h_label") + col("s") / d(col("nt"))) /
            when(col("h_label") > 0.0, col("h_label")).otherwise(lit(1.0)))
          .otherwise(lit(0.0))).as("ig_ratio"))
      .orderBy("feature")
  }

  /** Qini uplift curve at score-census thresholds — the uplift-model
    * eval between the hash-assigned variants ([[mannWhitney]]'s
    * instrument): targeting score s = per-user click count, outcome =
    * purchased ever. For every distinct score cutoff (descending), the
    * treated-vs-control conversion contrast among users scoring ≥ s:
    * uplift_rate = convT/nT − convC/nC and the Qini number
    * qini = convT − convC·nT/nC (Radcliffe's absolute formulation).
    * Thresholding on the VALUE CENSUS keeps the curve exact and the
    * window domain-bounded — the decile formulation would need a
    * global rank over USERS, the very anti-pattern the census
    * discipline exists to avoid; census cutoffs are a superset of any
    * decile grid anyway.
    *
    * Scale shape: one user aggregate, one census aggregate, cumulative
    * windows over the census. */
  def qiniCurve(ev: DataFrame): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("s"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("g", Sampling.hashBucket(col("user_id"), 2))
    val census = per.groupBy("s").agg(
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("nt"),
      sum(when(col("g") === 0, 1L).otherwise(0L)).as("nc"),
      sum(when(col("g") === 1, col("y")).otherwise(0L)).as("ct"),
      sum(when(col("g") === 0, col("y")).otherwise(0L)).as("cc"))
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val cum = census
      .withColumn("cnt", sum(col("nt")).over(w))
      .withColumn("cnc", sum(col("nc")).over(w))
      .withColumn("cct", sum(col("ct")).over(w))
      .withColumn("ccc", sum(col("cc")).over(w))
    val ok = col("cnt") > 0L && col("cnc") > 0L
    // structurally-nonzero divisors (codegen CSE hoists shared
    // subexpressions out of the CASE branches — see waldIv)
    val dnt = d(greatest(col("cnt"), lit(1L)))
    val dnc = d(greatest(col("cnc"), lit(1L)))
    cum.select(col("s").as("score_cutoff"),
      col("cnt").as("n_treated"), col("cnc").as("n_control"),
      col("cct").as("conv_treated"), col("ccc").as("conv_control"),
      r6(when(ok, d(col("cct")) / dnt -
        d(col("ccc")) / dnc).otherwise(lit(0.0)))
        .as("uplift_rate"),
      r6(when(ok, d(col("cct")) -
        d(col("ccc")) * d(col("cnt")) / dnc)
        .otherwise(lit(0.0))).as("qini"))
      .orderBy(col("score_cutoff").desc)
  }

  /** Exact 1-Wasserstein (earth-mover) distance between the two
    * hash-cohort distributions of per-user event counts — the
    * magnitude-aware companion to [[mannWhitney]] (which only ranks)
    * and [[ksTest]] (which takes the sup): W₁ = ∫|F_A − F_B| dx,
    * evaluated exactly on the merged VALUE CENSUS as
    * Σᵢ |cumA_i/n_A − cumB_i/n_B| · (x_{i+1} − x_i). The cumulative
    * counts are integers, the gap is an integer, and each term folds
    * through DECIMAL — bit-identical across engines. Also reports W₁
    * normalized by the observed range (scale-free [0, 1] drift score).
    *
    * Scale shape: one user-frame aggregate (shuffle on user), one
    * census aggregate, then the global window runs over the CENSUS
    * (distinct count values — domain-bounded, the mannWhitney
    * discipline), never the user frame. */
  def wasserstein1(ev: DataFrame): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"))
      .withColumn("g", Sampling.hashBucket(col("user_id"), 2))
    val census = per.groupBy("x")
      .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("x"))
    val wTot = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stepped = census
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(wTot))
      .withColumn("nb", sum(col("cb")).over(wTot))
      .withColumn("gap", lead(col("x"), 1).over(wAll) - col("x"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m = stepped.agg(
      max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      // empty-cohort guard: with n_a or n_b = 0 the CDF ratio is
      // undefined — every term drops and W₁ reports 0. Divisors are
      // greatest-guarded so the guarded branch never divides by zero
      // even if codegen CSE hoists it (ANSI mode; see waldIv).
      sum(when(col("gap").isNotNull && col("na") > 0L && col("nb") > 0L,
          (abs(d(col("cuma")) / d(greatest(col("na"), lit(1L))) -
            d(col("cumb")) / d(greatest(col("nb"), lit(1L)))) *
            d(col("gap")))
            .cast("decimal(28,12)"))
        .otherwise(lit(0).cast("decimal(28,12)"))).cast("double")
        .as("w1"))
    m.select(col("n_a"), col("n_b"), r6(col("w1")).as("w1"),
      r6(when(col("xmax") > col("xmin"),
        col("w1") / d(greatest(col("xmax") - col("xmin"), lit(1L))))
        .otherwise(lit(0.0)))
        .as("w1_normalized"))
  }

  /** Spearman rank correlation between per-customer order count and
    * per-customer distinct-part breadth — "do frequent buyers buy more
    * WIDELY?" robust to the heavy right tail that drags Pearson around.
    * Both variables are small integers, so ranking is census-based like
    * [[mannWhitney]]: each variable's average-rank map is built from its
    * value census (bounded by max orders / max distinct parts per
    * customer) and BROADCAST back onto the customer frame — the
    * customer-cardinality frame itself is never globally sorted. ρ is
    * Pearson over the tie-averaged ranks (the exact tie-correct form);
    * rank products are .25-grain rationals summed in DECIMAL. The raw
    * Pearson r ships alongside so the report shows what the rank
    * transform absorbed. */
  def spearmanBreadth(orders: DataFrame, lineitem: DataFrame): DataFrame =
    // materialized: both rank maps and the ranked join reuse this frame
    spearmanOnPairs(orderBreadthFrame(orders, lineitem).localCheckpoint())

  private[graft] def spearmanOnPairs(pc: DataFrame): DataFrame = {
    def rankMap(v: String): DataFrame = {
      val census = pc.groupBy(col(v)).agg(count(lit(1)).as("t"))
      val w = Window.orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, -1)
      census.withColumn("below", coalesce(sum(col("t")).over(w), lit(0L)))
        .select(col(v), (col("below").cast("double") +
          (col("t").cast("double") + lit(1.0)) / lit(2.0)).as(s"r_$v"))
    }
    val ranked = pc.join(broadcast(rankMap("x")), Seq("x"))
      .join(broadcast(rankMap("y")), Seq("y"))
    def dec(c: Column) = c.cast("decimal(28,12)")
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(dec(col("r_x"))).as("sx"), sum(dec(col("r_y"))).as("sy"),
      sum(dec(col("r_x") * col("r_x"))).as("sxx"),
      sum(dec(col("r_y") * col("r_y"))).as("syy"),
      sum(dec(col("r_x") * col("r_y"))).as("sxy"),
      sum(col("x")).as("rsx"), sum(col("y")).as("rsy"),
      sum(col("x") * col("x")).as("rsxx"),
      sum(col("y") * col("y")).as("rsyy"),
      sum(col("x") * col("y")).as("rsxy"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val n = d(col("n"))
    def pearson(sx: Column, sy: Column, sxx: Column, syy: Column,
                sxy: Column): Column =
      (n * d(sxy) - d(sx) * d(sy)) /
        sqrt((n * d(sxx) - d(sx) * d(sx)) * (n * d(syy) - d(sy) * d(sy)))
    m.select(col("n").as("n_customers"),
      r6(pearson(col("sx"), col("sy"), col("sxx"), col("syy"),
        col("sxy"))).as("rho_spearman"),
      r6(pearson(col("rsx"), col("rsy"), col("rsxx"), col("rsyy"),
        col("rsxy"))).as("r_pearson"))
  }

  /** Memo for [[orderBreadthFrame]]: `q_spearman` and `q_kendall_tau`
    * both consume it in one Bench run — the coPurchaseCounts sharing
    * policy (keyed on session identity + fixture dir, materialized via
    * localCheckpoint so the second consumer reads shuffle-free). */
  private val breadthMemo = scala.collection.concurrent.TrieMap
    .empty[(Int, String), DataFrame]

  private[graft] def orderBreadthAt(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    breadthMemo.getOrElseUpdate(
      (System.identityHashCode(spark), sfDir),
      orderBreadthFrame(graft.Tables.orders(spark, sfDir),
        graft.Tables.lineitem(spark, sfDir)).localCheckpoint())

  /** [[spearmanBreadth]] / [[kendallTau]] on the memoized fixture frame. */
  def spearmanBreadthAt(spark: org.apache.spark.sql.SparkSession,
                        sfDir: String): DataFrame =
    spearmanOnPairs(orderBreadthAt(spark, sfDir))

  def kendallTauAt(spark: org.apache.spark.sql.SparkSession,
                   sfDir: String): DataFrame =
    kendallOnPairs(orderBreadthAt(spark, sfDir))

  /** Shared unit frame for the rank-correlation family: per customer,
    * x = order count, y = distinct-part breadth. */
  private def orderBreadthFrame(orders: DataFrame,
                                lineitem: DataFrame): DataFrame = {
    val nOrd = orders.groupBy(col("o_custkey").as("cust"))
      .agg(count(lit(1)).as("x"))
    val nParts = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"))
      .agg(countDistinct(col("l_partkey")).as("y"))
    nOrd.join(nParts, Seq("cust"))
  }

  /** Kendall τ-b over the same (order count, part breadth) pairs as
    * [[spearmanBreadth]] — the concordance-based rank correlation whose
    * sampling behavior under ties is better understood than Spearman's.
    * The O(n²) pair enumeration NEVER touches units: both variables are
    * small integers, so all pair counting runs on the JOINT VALUE CENSUS
    * (one row per distinct (x,y) cell — domain-bounded): concordant /
    * discordant masses are Σ n₁·n₂ over cell pairs with strict agreement
    * / reversal, a broadcast nested-loop join of the census with itself
    * (cells² comparisons is a CONSTANT wrt corpus size — the 100 TB cost
    * lives entirely in the one aggregate that builds the census). Tie
    * terms come from the marginal censuses in exact integers; products
    * go DECIMAL before the sum. */
  def kendallTau(orders: DataFrame, lineitem: DataFrame): DataFrame =
    kendallOnPairs(orderBreadthFrame(orders, lineitem))

  private[graft] def kendallOnPairs(pc: DataFrame): DataFrame = {
    val cells = pc
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("nc"))
      .localCheckpoint()
    val c2 = cells.select(col("x").as("x2"), col("y").as("y2"),
      col("nc").as("nc2"))
    val pairs = cells.join(broadcast(c2),
        col("x") < col("x2") && col("y") =!= col("y2"))
      .select((col("nc") * col("nc2")).cast("decimal(38,0)").as("m"),
        (col("y") < col("y2")).as("conc"))
    val cd = pairs.agg(
      sum(when(col("conc"), col("m")).otherwise(lit(0))).as("nc_sum"),
      sum(when(!col("conc"), col("m")).otherwise(lit(0))).as("nd_sum"))
    def ties(key: String) = cells.groupBy(col(key))
      .agg(sum(col("nc")).as("t"))
      .agg(sum((col("t") * (col("t") - 1) / 2).cast("decimal(38,0)"))
        .as(s"t_$key"),
        sum(col("t")).as(s"n_$key"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    cd.crossJoin(broadcast(ties("x"))).crossJoin(broadcast(ties("y")))
      .select(col("n_x").as("n_customers"),
        col("nc_sum").cast("bigint").as("n_concordant"),
        col("nd_sum").cast("bigint").as("n_discordant"),
        col("t_x").cast("bigint").as("ties_x"),
        col("t_y").cast("bigint").as("ties_y"),
        r6((d(col("nc_sum")) - d(col("nd_sum"))) /
          sqrt((d(col("n_x")) * (d(col("n_x")) - lit(1.0)) / lit(2.0) -
            d(col("t_x"))) *
            (d(col("n_x")) * (d(col("n_x")) - lit(1.0)) / lit(2.0) -
              d(col("t_y"))))).as("tau_b"))
  }

  /** Theil T inequality index of customer spend, decomposed by market
    * segment — the additive complement to [[giniBySegment]]: unlike
    * Gini, Theil splits EXACTLY into between-segment and within-segment
    * components (T = T_between + Σ share_g·T_g), so the report says how
    * much of total spend concentration is segment mix vs within-segment
    * dispersion. Everything reduces to three per-segment sums (n, Σx,
    * Σx·ln x — the x·ln x terms go double → DECIMAL so partials merge
    * order-independently): T_g = Σx ln x / X_g − ln μ_g, no window, no
    * second pass over customers. Output is the per-segment 'within'
    * rows plus 'between' and 'total' decomposition rows. */
  def theilIndex(orders: DataFrame, customer: DataFrame): DataFrame = {
    val spend = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(28,12)"))
        .cast("double").as("s"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    // materialized: three consumers (within/between/total) must not
    // re-run the customer aggregate
    val seg = spend.groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("s").cast("decimal(28,12)")).as("sx"),
        sum((col("s") * log(col("s"))).cast("decimal(28,12)")).as("sxlnx"))
      .localCheckpoint()
    def d(c: Column) = c.cast("double")
    val glob = seg.agg(sum(col("n")).as("n_all"),
      sum(col("sx")).as("x_all"), sum(col("sxlnx")).as("xlnx_all"))
    val j = seg.crossJoin(broadcast(glob))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val muG = d(col("sx")) / d(col("n"))
    val mu = d(col("x_all")) / d(col("n_all"))
    val share = d(col("sx")) / d(col("x_all"))
    val within = j.select(lit("within").as("component"), col("segment"),
      col("n").as("n_customers"), r6(share).as("spend_share"),
      r6(d(col("sxlnx")) / d(col("sx")) - log(muG)).as("theil"))
    val between = j
      .select((share * log(muG / mu)).cast("decimal(28,12)").as("term"),
        col("n"))
      .agg(sum(col("n")).as("n_customers"),
        sum(col("term")).cast("double").as("tb"))
      .select(lit("between").as("component"), lit("__ALL__").as("segment"),
        col("n_customers"), r6(lit(1.0)).as("spend_share"),
        r6(col("tb")).as("theil"))
    val total = glob.select(lit("total").as("component"),
      lit("__ALL__").as("segment"), col("n_all").as("n_customers"),
      r6(lit(1.0)).as("spend_share"),
      r6(d(col("xlnx_all")) / d(col("x_all")) -
        log(d(col("x_all")) / d(col("n_all")))).as("theil"))
    within.unionAll(between).unionAll(total)
      .orderBy(col("component"), col("segment"))
  }

  /** Wald–Wolfowitz runs test on the daily-revenue series — the
    * randomness audit under [[cusum]] and [[changepoint]]: if the signs
    * of daily revenue around its median cluster into fewer runs than
    * chance allows, the series has serial structure (trend, regime,
    * weekly cycle) and every i.i.d.-assuming monitor upstream is
    * miscalibrated. The series is the DAY frame (one corpus aggregate;
    * day-ordered windows are calendar-bounded), the median is the exact
    * interpolated 0.5-quantile of ≤ a few thousand day values, ties at
    * the median drop (the standard convention), and runs count via one
    * lag over the day frame. Normal approximation mean/sigma/z from the
    * exact integer run and sign counts. */
  def runsTest(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("event_type") === "purchase" &&
        col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(28,12)")).cast("double").as("v"))
      .localCheckpoint() // reused by the median scalar and the sign pass
    val med = daily.agg(
      expr("percentile(v, 0.5)").as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("v") =!= col("med"))
      .select(col("d"), (col("v") > col("med")).cast("int").as("s"))
    val w = Window.orderBy(col("d"))
    val runs = signed
      .withColumn("brk",
        when(lag(col("s"), 1).over(w).isNull ||
          lag(col("s"), 1).over(w) =!= col("s"), 1).otherwise(0))
    val m = runs.agg(count(lit(1)).as("n_days"),
      sum(col("s").cast("long")).as("n_above"),
      sum((lit(1) - col("s")).cast("long")).as("n_below"),
      sum(col("brk").cast("long")).as("n_runs"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val n1 = d(col("n_above")); val n2 = d(col("n_below"))
    val n = n1 + n2
    val mu = lit(2.0) * n1 * n2 / n + lit(1.0)
    val sigma = sqrt(lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) /
      (n * n * (n - lit(1.0))))
    m.select(col("n_days"), col("n_above"), col("n_below"), col("n_runs"),
      r6(mu).as("mu_runs"), r6(sigma).as("sigma_runs"),
      // degenerate series (a single day per sign) has sigma = 0 —
      // report z = 0 rather than divide
      r6(when(sigma > lit(0.0),
        (d(col("n_runs")) - mu) / sigma).otherwise(lit(0.0))).as("z"))
  }

  /** Rescaled-range (R/S) Hurst exponent of the daily-revenue series —
    * the long-memory audit beside [[runsTest]]'s serial-structure check:
    * H ≈ 0.5 is a memoryless walk, H > 0.5 persistent trending, H < 0.5
    * mean reversion — the one-number answer to "does today's revenue
    * anomaly predict tomorrow's". Classic Mandelbrot–Wallis R/S: for
    * each window size w, split the day series into ⌊n/w⌋ complete
    * blocks; per block, range of the cumulative mean-deviations over
    * the population σ; H is the least-squares slope of ln(R/S) on ln(w).
    * Everything after the one corpus aggregate runs on the DAY frame ×
    * 3 window sizes (calendar-bounded; the cumulative-deviation window
    * partitions by (w, block)); per-day deviation sums go DECIMAL. */
  def hurstRS(ev: DataFrame, sizes: Seq[Int] = Seq(5, 10, 15)): DataFrame = {
    val daily = ev.filter(col("event_type") === "purchase" &&
        col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(28,12)")).cast("double").as("v"))
      .withColumn("t",
        row_number().over(Window.orderBy(col("d"))).cast("long"))
      .localCheckpoint() // the size fan-out and n_days both reuse it
    val ws = daily.sparkSession.createDataFrame(
      sizes.map(Tuple1(_))).toDF("w")
    val blocked = daily.crossJoin(broadcast(ws))
      .withColumn("b", ((col("t") - 1) / col("w")).cast("long"))
    val full = blocked.groupBy(col("w"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") === col("w"))
      .select(col("w"), col("b"))
    val rows = blocked.join(full, Seq("w", "b"))
    val m = rows.groupBy(col("w"), col("b"))
      .agg((sum(col("v").cast("decimal(28,12)")).cast("double") /
        col("w")).as("mean_v"),
        (sum((col("v") * col("v")).cast("decimal(28,12)")).cast("double"))
          .as("svv"))
    val wcum = Window.partitionBy(col("w"), col("b")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dev = rows.join(m, Seq("w", "b"))
      .withColumn("cum", sum((col("v") - col("mean_v"))
        .cast("decimal(28,12)")).over(wcum).cast("double"))
    val rs = dev.groupBy(col("w"), col("b"))
      .agg((max(col("cum")) - min(col("cum"))).as("r"),
        // svv/mean_v are group constants (joined from m) — max is the
        // deterministic pick
        sqrt(max(col("svv")) / col("w") -
          max(col("mean_v")) * max(col("mean_v"))).as("s"))
      .filter(col("s") > 0.0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_blocks"),
        (sum((col("r") / col("s")).cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("rs"))
    // least-squares slope of ln(rs) on ln(w) over the (tiny) size frame
    def dec(c: Column) = c.cast("decimal(28,12)")
    val fit = rs.select(col("w"), col("rs"),
        log(col("w").cast("double")).as("lx"), log(col("rs")).as("ly"))
      .agg(count(lit(1)).as("k"),
        sum(dec(col("lx"))).cast("double").as("sx"),
        sum(dec(col("ly"))).cast("double").as("sy"),
        sum(dec(col("lx") * col("lx"))).cast("double").as("sxx"),
        sum(dec(col("lx") * col("ly"))).cast("double").as("sxy"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val n = daily.agg(count(lit(1)).as("n_days"))
    def rsAt(w: Int) = max(when(col("w") === w, col("rs")))
    val wide = rs.agg(rsAt(sizes(0)).as("rs_a"), rsAt(sizes(1)).as("rs_b"),
      rsAt(sizes(2)).as("rs_c"))
    n.crossJoin(broadcast(wide)).crossJoin(broadcast(fit))
      .select(col("n_days"),
        r6(col("rs_a")).as(s"rs_${sizes(0)}"),
        r6(col("rs_b")).as(s"rs_${sizes(1)}"),
        r6(col("rs_c")).as(s"rs_${sizes(2)}"),
        r6((d(col("k")) * col("sxy") - col("sx") * col("sy")) /
          (d(col("k")) * col("sxx") - col("sx") * col("sx")))
          .as("hurst"))
  }

  /** SAX symbolization of the daily-revenue series (Lin et al.):
    * z-normalize the day series, Piecewise-Aggregate-Approximate it into
    * `segDays`-day segments, and map each segment mean to a 4-letter
    * alphabet at the standard normal quartile breakpoints ±0.674490 —
    * the discretized fingerprint that makes time-series motif/anomaly
    * matching a string problem. Everything after the one corpus
    * aggregate runs on the day frame (the index window is
    * calendar-bounded); μ/σ broadcast back; PAA means sum in DECIMAL.
    * Breakpoints are literal constants, so the output schema and symbol
    * mapping are data-independent. */
  def saxDaily(ev: DataFrame, segDays: Int = 5): DataFrame = {
    val daily = ev.filter(col("event_type") === "purchase" &&
        col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(28,12)")).cast("double").as("v"))
      .withColumn("t",
        row_number().over(Window.orderBy(col("d"))).cast("long"))
      .localCheckpoint() // μ/σ scalar and the z projection both reuse it
    def dec(c: Column) = c.cast("decimal(28,12)")
    val m = daily.agg(count(lit(1)).as("n"), sum(dec(col("v"))).as("sv"),
      sum(dec(col("v") * col("v"))).as("svv"))
    def d(c: Column) = c.cast("double")
    val mu = d(col("sv")) / d(col("n"))
    val sigma = sqrt(d(col("svv")) / d(col("n")) - mu * mu)
    val z = daily.crossJoin(broadcast(
        m.select(mu.as("mu"), sigma.as("sigma"))))
      .select((((col("t") - 1) / segDays).cast("long")).as("segment"),
        when(col("sigma") > 0.0, (col("v") - col("mu")) / col("sigma"))
          .otherwise(lit(0.0)).as("z"))
    val bp = 0.6744897501960817
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    z.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_days"),
        (sum(dec(col("z"))).cast("double") / count(lit(1))).as("paa_raw"))
      .select(col("segment"), col("n_days"), r6(col("paa_raw")).as("paa"),
        when(col("paa_raw") < -bp, "a")
          .when(col("paa_raw") < 0.0, "b")
          .when(col("paa_raw") < bp, "c")
          .otherwise("d").as("symbol"))
      .orderBy("segment")
  }

  /** Cramér's V association between event type and day-of-week — the
    * effect-SIZE companion to the χ² machinery [[mutualInfo]] and the
    * CMH test read in bits and evidence: V normalizes χ² to [0,1] so
    * "is the weekly mix shift big enough to matter" has a scale-free
    * answer. One corpus aggregate to the (type × weekday) contingency
    * cells; margins join back onto the cell frame (broadcast — both are
    * category-bounded); χ² terms go double → DECIMAL for
    * order-independent merge. Cells with zero observations never
    * materialize, but their χ² contribution is exactly their expected
    * count, and Σ_all e = N — so the absent mass folds in closed form
    * as N − Σ_observed e (the [[tCloseness]] absent-cell trick): only
    * existing cells are ever touched. */
  def cramersV(ev: DataFrame): DataFrame = {
    val cells = ev.filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // four consumers; never re-run the corpus pass
    val rowTot = cells.groupBy("event_type").agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy("dow").agg(sum(col("o")).as("ct"))
    val glob = cells.agg(sum(col("o")).as("n_all"),
      countDistinct(col("event_type")).as("k"),
      countDistinct(col("dow")).as("r"))
    def d(c: Column) = c.cast("double")
    val e = d(col("rt")) * d(col("ct")) / d(col("n_all"))
    val m = cells.join(broadcast(rowTot), Seq("event_type"))
      .join(broadcast(colTot), Seq("dow"))
      .crossJoin(broadcast(glob))
      .select(((d(col("o")) - e) * (d(col("o")) - e) / e)
        .cast("decimal(28,12)").as("term"),
        e.cast("decimal(28,12)").as("e"),
        col("n_all"), col("k"), col("r"))
      .groupBy(col("n_all"), col("k"), col("r"))
      .agg((sum(col("term")).cast("double") +
        (d(col("n_all")) - sum(col("e")).cast("double"))).as("chi2"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    m.select(col("n_all").as("n"), col("k").as("n_types"),
      col("r").as("n_dows"), r6(col("chi2")).as("chi2"),
      r6(sqrt(col("chi2") / (d(col("n_all")) *
        least(d(col("k")) - lit(1.0), d(col("r")) - lit(1.0)))))
        .as("cramers_v"))
  }

  /** Cross-correlation function between daily revenue and daily event
    * volume at lags −maxLag..maxLag — the lead/lag probe [[acfDaily]]
    * cannot answer (does activity LEAD spend, or trail it?). Standard
    * CCF normalization: r_k = Σ_t (x_t−x̄)(y_{t+k}−ȳ) / √(Σ(x−x̄)²·
    * Σ(y−ȳ)²) with full-series denominators, so |r_k| ≤ 1 and lags are
    * comparable. Both series come out of ONE corpus aggregate (revenue
    * and count are two measures of the same day group); everything after
    * is |days|-sized — the lag joins are window `lag/lead` over the day
    * frame, never a self-join of raw rows. Moment sums accumulate in
    * DECIMAL (order-independent merge → oracle parity at any partition
    * count); the final ratio is one IEEE division, rounded to 6dp. */
  def ccfDaily(ev: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = ev.filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(coalesce(col("value"), lit(0.0))
          .cast("decimal(18,6)")), 2).cast("double").as("x"),
        count(lit(1)).cast("double").as("y"))
      .localCheckpoint() // one corpus pass feeds stats + every lag arm
    val stats = daily.agg(count(lit(1)).as("n"),
        (sum(col("x").cast("decimal(28,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mx"),
        (sum(col("y").cast("decimal(28,6)")).cast("double") /
          count(lit(1)).cast("double")).as("my"))
    val c = daily.crossJoin(broadcast(stats))
      .select(col("d"), (col("x") - col("mx")).as("cx"),
        (col("y") - col("my")).as("cy"))
    val den = c.agg(
      sqrt(sum((col("cx") * col("cx")).cast("decimal(28,10)"))
          .cast("double") *
        sum((col("cy") * col("cy")).cast("decimal(28,10)"))
          .cast("double")).as("den"))
    val w = Window.orderBy("d")
    def r6(cc: Column) = floor(cc * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val arms = (-maxLag to maxLag).map { k =>
      // r_k pairs x_t with y_{t+k}: k>0 → y shifted forward (lead),
      // k<0 → y lagged (explicit lag keeps the offset non-negative for
      // engines that reject negative lead offsets — the oracle mirrors).
      val yk = if (k >= 0) lead(col("cy"), k) else lag(col("cy"), -k)
      c.withColumn("yk", yk.over(w))
        .filter(col("yk").isNotNull)
        .agg(sum((col("cx") * col("yk")).cast("decimal(28,10)"))
          .cast("double").as("num"), count(lit(1)).as("n_pairs"))
        .select(lit(k.toLong).as("lag"), col("n_pairs"), col("num"))
    }.reduce(_.unionAll(_))
    arms.crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        r6(col("num") / col("den")).as("ccf"))
      .orderBy("lag")
  }

  /** Drawdown report over the DAILY revenue series (depth below the
    * running record, not below cumulative — cumulative revenue is
    * monotone, so its drawdown is identically zero): running peak via
    * an expanding `max` window, per-day drawdown = peak − x, and the
    * longest underwater streak by the gaps-and-islands rank difference
    * (rn_all − rn_underwater is constant within a maximal run). The
    * whole computation lives on the |days| frame after one corpus
    * aggregate; every window is ORDER BY over that bounded frame.
    * max_dd_pct guards peak=0 (first day defines the record, dd=0). */
  def drawdownReport(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
    val w = Window.orderBy("d")
    val dd = daily
      .withColumn("peak", max(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("dd", col("peak") - col("x"))
      .withColumn("rn", row_number().over(w))
      .localCheckpoint() // |days| rows; three scalar consumers below
    val uw = dd.filter(col("dd") > 0.0)
      .withColumn("grp", col("rn") - row_number().over(Window.orderBy("rn")))
      .groupBy("grp").agg(count(lit(1)).as("len"))
      .agg(coalesce(max(col("len")), lit(0L)).as("max_underwater_days"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val worst = dd
      .agg(count(lit(1)).as("n_days"),
        round(max(col("dd")), 2).as("max_drawdown"),
        max_by(struct(col("dd"), col("peak")),
          struct(col("dd"), col("rn"))).as("m"))
      .select(col("n_days"), col("max_drawdown"),
        r6(when(col("m.peak") > 0.0, col("m.dd") / col("m.peak"))
          .otherwise(lit(0.0))).as("max_dd_pct"))
    worst.crossJoin(broadcast(uw))
  }

  /** Mixture sequential probability ratio test (mSPRT) — the
    * always-valid p-value stream that makes DAILY peeking at the
    * [[abLift]] experiment legitimate (a fixed-horizon z re-tested every
    * day inflates false positives; the mSPRT martingale does not). Same
    * portable-hash variant split and high-value-purchase conversion as
    * abLift; per (day × variant) the user/conversion counts are exact
    * integers, cumulated by window sums over the day frame. With normal
    * mixture variance τ: Λ_n = √(σ²ₙ/(σ²ₙ+τ))·exp(θ̂ₙ²τ/(2σ²ₙ(σ²ₙ+τ)))
    * where θ̂ₙ = p̂_b−p̂_a and σ²ₙ the pooled two-proportion variance;
    * the always-valid p is the RUNNING MIN of 1/Λ (a supermartingale
    * inverse stays valid under optional stopping). `reject` compares the
    * ROUNDED p to α so a last-ulp exp() disagreement between engines
    * cannot flip the flag (the q_jaro_linkage lesson). Shape: one
    * per-(user,day) corpus pass, then |days|-frame windows — nothing
    * data-sized after the first shuffle. */
  def msprt(ev: DataFrame, tau: Double = 0.0001,
            minValue: Double = 90.0, alpha: Double = 0.05): DataFrame = {
    val perUserDay = ev.filter(col("user_id").isNotNull &&
        col("ts").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") > minValue, 1L).otherwise(0L)).as("conv"))
      .withColumn("variant", Sampling.hashBucket(col("user_id"), 2))
    val byDay = perUserDay.groupBy("d").agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ua"),
      sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("ca"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("ub"),
      sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("cb"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: Column) = c.cast("double")
    val cum = byDay
      .withColumn("na", sum(col("ua")).over(w))
      .withColumn("ka", sum(col("ca")).over(w))
      .withColumn("nb", sum(col("ub")).over(w))
      .withColumn("kb", sum(col("cb")).over(w))
    val bothArms = col("na") > 0L && col("nb") > 0L
    val theta = when(bothArms,
      d(col("kb")) / d(col("nb")) - d(col("ka")) / d(col("na")))
      .otherwise(lit(0.0))
    val pool = (d(col("ka")) + d(col("kb"))) / (d(col("na")) + d(col("nb")))
    val sig2 = pool * (lit(1.0) - pool) *
      (lit(1.0) / d(col("na")) + lit(1.0) / d(col("nb")))
    // Degenerate early frames (a variant unpopulated, or zero pooled
    // variance before the first conversion) carry no evidence: Λ = 1.
    val lam = when(bothArms && sig2 > 0.0,
      sqrt(sig2 / (sig2 + lit(tau))) *
        exp(theta * theta * lit(tau) /
          (lit(2.0) * sig2 * (sig2 + lit(tau)))))
      .otherwise(lit(1.0))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val scored = cum
      .withColumn("lambda", lam)
      .withColumn("p_av", r6(least(lit(1.0),
        min(lit(1.0) / col("lambda")).over(w))))
    scored.select(col("d"), col("na").as("users_a"), col("ka").as("conv_a"),
        col("nb").as("users_b"), col("kb").as("conv_b"),
        r6(theta).as("theta"), r6(col("lambda")).as("lambda"),
        col("p_av").as("p_always_valid"),
        (col("p_av") <= alpha).cast("int").as("reject"))
      .orderBy("d")
  }

  /** Equal-weight forecast-combination arm over the three established
    * backtests — naive lag-1, seasonal lag-7, and the trailing-7 moving
    * average — evaluated on the COMMON day set (t ≥ 8, where every arm
    * has a forecast) so the comparison is honest: [[forecastEval]] and
    * the snaive arm score on their own maximal windows, which are not
    * the same days. The combination forecast is the plain mean of the
    * three member forecasts (the hardest-to-beat baseline in the
    * forecast-combination literature — "forecast combination puzzle").
    * One corpus pass to the day frame; every arm is a window expression
    * over it; error sums fold through DECIMAL. */
  def forecastCombo(ev: DataFrame): DataFrame = {
    val daily = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))
      .withColumn("t", row_number().over(Window.orderBy("d")))
    val w = Window.orderBy("t")
    val ma7 = (1 to 7).map(k => lag(col("x"), k).over(w))
      .reduce(_ + _) / lit(7.0)
    val base = daily
      .withColumn("fc_naive", lag(col("x"), 1).over(w))
      .withColumn("fc_snaive", lag(col("x"), 7).over(w))
      .withColumn("fc_ma7", ma7)
      .filter(col("t") >= 8)
      .withColumn("fc_combo",
        (col("fc_naive") + col("fc_snaive") + col("fc_ma7")) / lit(3.0))
      .localCheckpoint() // |days| rows; four scoring consumers
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    def report(fcCol: String, name: String): DataFrame = {
      val err = col("x") - col(fcCol)
      base.agg(count(lit(1)).as("n_days"),
          sum(abs(err).cast("decimal(28,10)")).cast("double").as("sae"),
          sum((err * err).cast("decimal(28,10)")).cast("double").as("sse"))
        .select(lit(name).as("model"), col("n_days"),
          r6(col("sae") / col("n_days").cast("double")).as("mae"),
          r6(sqrt(col("sse") / col("n_days").cast("double"))).as("rmse"))
    }
    report("fc_naive", "naive").unionAll(report("fc_snaive", "snaive"))
      .unionAll(report("fc_ma7", "ma7"))
      .unionAll(report("fc_combo", "combo"))
      .orderBy("model")
  }

  /** Weight-of-evidence / information-value screen — the classical
    * credit-scoring featurizer: per feature bin, WoE = ln of the
    * smoothed good/bad density ratio, and the feature's IV = Σ (g% −
    * b%)·WoE says whether the feature separates the target at all
    * (IV < 0.02 = useless, > 0.5 = suspicious). Target: customer ever
    * placed a 1-URGENT order; features: market segment and a fixed-width
    * account-balance band (map-side projection — no quantile pass, no
    * global window). Empty-cell guard is the standard +0.5 Laplace
    * numerator. Shape: one orders aggregate (shuffle on custkey), one
    * dim-sized join, one bin census; totals broadcast back; the
    * per-feature IV folds over the category-bounded bin frame. */
  def woeIv(customer: DataFrame, orders: DataFrame): DataFrame = {
    val target = orders.groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L)
        .otherwise(0L)).as("y"))
    val base = customer.join(target, Seq("c_custkey"), "left")
      .select(col("c_mktsegment"), col("c_acctbal"),
        coalesce(col("y"), lit(0L)).as("y"))
    // NULL bins fold to a sentinel string: Spark sorts NULLS FIRST where
    // DuckDB defaults NULLS LAST, so a raw NULL bin would break row-order
    // parity on nullable data; the sentinel keeps ordering engine-neutral.
    // The sentinel is \u0001-prefixed so it cannot collide with a genuine
    // domain value that is literally the string "NULL" (which would
    // silently merge two distinct bins); the oracle builds the same token
    // with chr(1) || 'NULL'.
    val nullBin = lit("\u0001NULL")
    val feats = base.select(lit("mktsegment").as("feature"),
        coalesce(col("c_mktsegment"), nullBin).as("bin"), col("y"))
      .unionAll(base.select(lit("acctbal_band").as("feature"),
        coalesce(floor(col("c_acctbal") / 2000.0).cast("bigint")
          .cast("string"), nullBin).as("bin"), col("y")))
    val cells = feats.groupBy("feature", "bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("goods"))
      .withColumn("bads", col("n") - col("goods"))
    val tot = cells.groupBy("feature")
      .agg(sum(col("goods")).as("g_tot"), sum(col("bads")).as("b_tot"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val woe = log(((d(col("goods")) + lit(0.5)) / d(col("g_tot"))) /
      ((d(col("bads")) + lit(0.5)) / d(col("b_tot"))))
    val ivTerm = (d(col("goods")) / d(col("g_tot")) -
      d(col("bads")) / d(col("b_tot"))) * woe
    val scored = cells.join(broadcast(tot), Seq("feature"))
      .withColumn("woe_raw", woe)
      .withColumn("iv_term", ivTerm.cast("decimal(28,12)"))
    val w = Window.partitionBy("feature")
    scored.select(col("feature"), col("bin"), col("n"), col("goods"),
        col("bads"), r6(col("woe_raw")).as("woe"),
        r6(sum(col("iv_term")).over(w).cast("double")).as("iv_feature"))
      .orderBy("feature", "bin")
  }

  /** Stratified inverse-propensity-weighted average treatment effect
    * (Hájek estimator) — the causal contrast the naive treated-vs-
    * control mean difference gets wrong whenever treatment assignment
    * correlates with the strata (here: order priority vs market
    * segment). Propensity per stratum is the exact treated share (no
    * model — this is the coarsened-exact-matching limit); weights 1/e
    * and 1/(1−e) re-balance each stratum to the full population;
    * strata with degenerate propensity (e ∈ {0,1}) are excluded — the
    * positivity violation has no defined counterfactual. Per-term
    * weighted sums fold double products through DECIMAL so the
    * estimate is partition-order-independent. Shape: one dim join, one
    * stratum census (broadcast back), one scalar aggregate. */
  def ipwAte(orders: DataFrame, customer: DataFrame): DataFrame = {
    val units = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select(col("c_mktsegment").as("stratum"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0).as("t"),
        col("o_totalprice").cast("double").as("y"))
    val strata = units.groupBy("stratum")
      .agg(count(lit(1)).as("n_s"), sum(col("t")).as("nt_s"))
      .withColumn("e", col("nt_s").cast("double") / col("n_s"))
      .filter(col("e") > 0.0 && col("e") < 1.0)
    def dec(c: Column) = c.cast("decimal(28,10)")
    val wt = units.join(broadcast(strata.select("stratum", "e")),
      Seq("stratum"))
    val agg = wt.agg(count(lit(1)).as("n_units"),
      sum(col("t").cast("bigint")).as("n_treated"),
      sum(dec(col("t") * col("y") / col("e"))).cast("double").as("swy_t"),
      sum(dec(col("t") / col("e"))).cast("double").as("sw_t"),
      sum(dec((lit(1) - col("t")) * col("y") / (lit(1.0) - col("e"))))
        .cast("double").as("swy_c"),
      sum(dec((lit(1) - col("t")) / (lit(1.0) - col("e"))))
        .cast("double").as("sw_c"),
      sum(dec(when(col("t") === 1, col("y")).otherwise(lit(0.0))))
        .cast("double").as("sy_t"),
      sum(dec(when(col("t") === 0, col("y")).otherwise(lit(0.0))))
        .cast("double").as("sy_c"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    agg.select(col("n_units"), col("n_treated"),
      r6(col("sy_t") / col("n_treated").cast("double") -
        col("sy_c") / (col("n_units") - col("n_treated")).cast("double"))
        .as("naive_diff"),
      r6(col("swy_t") / col("sw_t") - col("swy_c") / col("sw_c"))
        .as("ate_ipw"))
  }

  /** Ridge regression in correlation space — the L2-regularized sibling
    * of [[linreg]], solved closed-form for two standardized features
    * (order line count, total quantity → order value): b₁(λ) =
    * ((1+λ)r₁y − r₁₂r₂y)/((1+λ)² − r₁₂²), symmetric for b₂. Working in
    * correlation space makes λ scale-free (the textbook standardized
    * ridge) and the whole solve a scalar projection over ONE moment
    * aggregate — nine DECIMAL sums, no iteration, no matrix library.
    * The λ grid is a fixed literal; shrinkage is monotone in λ, which
    * the spec pins. At 100 TB: one lineitem shuffle on orderkey, one
    * fact join, one scalar fold. */
  def ridgeCorr(orders: DataFrame, lineitem: DataFrame,
                lambdas: Seq[Double] = Seq(0.0, 0.1, 1.0)): DataFrame = {
    val perOrder = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast("double").as("x1"),
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
          .as("x2"))
    val units = perOrder.join(orders,
        perOrder("l_orderkey") === orders("o_orderkey"))
      .select(col("x1"), col("x2"), col("o_totalprice").cast("double")
        .as("y"))
    def dec(c: Column) = c.cast("decimal(28,8)")
    val m = units.agg(count(lit(1)).as("n"),
      sum(dec(col("x1"))).cast("double").as("s1"),
      sum(dec(col("x2"))).cast("double").as("s2"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum(dec(col("x1") * col("x1"))).cast("double").as("s11"),
      sum(dec(col("x2") * col("x2"))).cast("double").as("s22"),
      sum(dec(col("y") * col("y"))).cast("double").as("syy"),
      sum(dec(col("x1") * col("x2"))).cast("double").as("s12"),
      sum(dec(col("x1") * col("y"))).cast("double").as("s1y"),
      sum(dec(col("x2") * col("y"))).cast("double").as("s2y"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n"))
    def corr(sab: Column, sa: Column, sb: Column,
             saa: Column, sbb: Column): Column =
      (n * sab - sa * sb) /
        sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    val base = m
      .withColumn("r12", corr(col("s12"), col("s1"), col("s2"),
        col("s11"), col("s22")))
      .withColumn("r1y", corr(col("s1y"), col("s1"), col("sy"),
        col("s11"), col("syy")))
      .withColumn("r2y", corr(col("s2y"), col("s2"), col("sy"),
        col("s22"), col("syy")))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    lambdas.map { lam =>
      val opl = lit(1.0 + lam)
      val det = opl * opl - col("r12") * col("r12")
      base.select(lit(lam).as("lambda"), col("n"),
        r6(col("r12")).as("r12"),
        r6((opl * col("r1y") - col("r12") * col("r2y")) / det)
          .as("beta1_std"),
        r6((opl * col("r2y") - col("r12") * col("r1y")) / det)
          .as("beta2_std"))
    }.reduce(_.unionAll(_)).orderBy("lambda")
  }

  /** Hill tail-index estimator (Hill 1975) over the order-value
    * distribution — the heavy-tail diagnostic behind capacity planning
    * and VaR model choice: over the k largest values,
    * H = (1/k)·Σ ln x₍ᵢ₎ − ln x₍ₖ₊₁₎ and α̂ = 1/H; α̂ ≲ 2 means infinite
    * variance (plan for whales), large α̂ means the tail is
    * exponential-ish. Σ over the k+1 frame minus one boundary term, so
    * ties at the boundary cannot change the value multiset.
    *
    * Scale shape: the k+1 largest values come from TakeOrderedAndProject
    * (bounded heap per partition, never a global sort); all arithmetic
    * runs on that k+1-row frame with DECIMAL-folded log terms. */
  def hillTail(orders: DataFrame, k: Int = 100): DataFrame = {
    val top = orders.select(col("o_totalprice").cast("double").as("x"))
      .orderBy(col("x").desc).limit(k + 1)
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    top.agg(sum(log(col("x")).cast("decimal(28,12)")).cast("double")
          .as("s"),
        min(col("x")).as("xb"))
      .select(lit(k.toLong).as("k"),
        round(col("xb"), 2).as("x_boundary"),
        r6((col("s") - log(col("xb"))) / lit(k.toDouble) - log(col("xb")))
          .as("hill_h"),
        r6(lit(1.0) / ((col("s") - log(col("xb"))) / lit(k.toDouble) -
          log(col("xb")))).as("tail_alpha"))
  }

  /** Generalized-Pareto tail fit over peaks-over-threshold excesses via
    * probability-weighted moments (Hosking & Wallis 1987) — the
    * two-parameter companion to [[hillTail]]'s single index: threshold
    * u = the (k+1)-th largest order price, excesses y = x − u over the
    * whole top-(k+1) frame (boundary ties contribute zero excesses — a
    * stated convention, deterministic because TakeOrdered returns a
    * deterministic VALUE multiset even when boundary rows tie). PWM is
    * closed-form over order statistics: a₀ = Σy/n,
    * a₁ = Σ(n−r)·y₍ᵣ₎ / (n(n−1)) with r the ascending rank (rank
    * assignment inside a tied block cannot change the sum — tied y are
    * equal), then ξ = 2 − a₀/(a₀ − 2a₁), σ = 2·a₀·a₁/(a₀ − 2a₁); both
    * 0-guarded when a₀ − 2a₁ degenerates (all excesses equal). ξ > 0
    * means a genuinely heavy (Pareto-like) tail; ξ ≈ 0 exponential.
    *
    * Scale shape: hillTail's — the k+1 extremes come from
    * TakeOrderedAndProject (bounded heap per partition, never a global
    * sort); ranking and both PWM folds run on that k+1-row frame with
    * DECIMAL sums. */
  def gpdTail(orders: DataFrame, k: Int = 100): DataFrame = {
    val top = orders.select(col("o_totalprice").cast("double").as("x"))
      .orderBy(col("x").desc).limit(k + 1)
    val u = top.agg(min(col("x")).as("u"))
    val n = (k + 1).toLong
    def dec(c: Column) = c.cast("decimal(28,12)")
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val ranked = top.crossJoin(broadcast(u))
      .select(col("u"), (col("x") - col("u")).as("y"))
      .withColumn("r", row_number().over(Window.orderBy(col("y")))
        .cast("bigint"))
    val m = ranked.agg(max(col("u")).as("u"),
      (sum(dec(col("y"))).cast("double") / lit(n.toDouble)).as("a0"),
      (sum(dec(col("y") * (lit(n.toDouble) - d(col("r")))))
        .cast("double") / lit((n * (n - 1)).toDouble)).as("a1"))
    val den = col("a0") - lit(2.0) * col("a1")
    // sentinel divisor (codegen CSE + ANSI; see waldIv)
    val denDiv = when(den =!= 0.0, den).otherwise(lit(1.0))
    m.select(lit(n).as("n_excesses"), round(col("u"), 2).as("threshold"),
      r6(col("a0")).as("mean_excess"),
      r6(when(den =!= 0.0, lit(2.0) - col("a0") / denDiv)
        .otherwise(lit(0.0))).as("shape_xi"),
      r6(when(den =!= 0.0, lit(2.0) * col("a0") * col("a1") / denDiv)
        .otherwise(lit(0.0))).as("scale_sigma"))
  }

  /** Kruskal–Wallis rank ANOVA of per-customer order counts across
    * market segments — "does purchase frequency DIFFER by segment"
    * without normality assumptions (the k-group extension of
    * [[mannWhitney]]). H = 12/(N(N+1))·Σ R²_g/n_g − 3(N+1) with the
    * standard tie correction C = 1 − Σ(t³−t)/(N³−N); reported both raw
    * and corrected, df = groups−1. Under H₀, H ~ χ²(df) — the statistic
    * ships and the caller brings the CDF (no special functions, so both
    * engines agree bit-for-bit). Degenerate guard: if every value is
    * identical, C = 0 and H/C is undefined — h_corrected reports 0.0
    * (H itself is 0 there, so 0 is the right limit), mirrored by a CASE
    * in the oracle; the sibling degenerate-denominator discipline of
    * [[ebShrinkage]] and [[mcnemarBaselines]].
    *
    * Scale shape: the global rank window runs over the VALUE CENSUS
    * (distinct per-customer order counts — domain-bounded, the
    * mannWhitney discipline), never the customer frame; everything else
    * is map-side-combined aggregates and one segment-bounded fold. */
  def kruskalWallis(orders: DataFrame, customer: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("x"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("x"))
    val cells = per.groupBy("x", "g").agg(count(lit(1)).as("nxg"))
    val census = cells.groupBy("x").agg(sum(col("nxg")).as("t"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = census
      .withColumn("below", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("avg_rank", col("below").cast("double") +
        (col("t").cast("double") + lit(1.0)) / lit(2.0))
    val groups = cells.join(ranked.select("x", "avg_rank"), "x")
      .groupBy("g")
      .agg(sum(col("nxg")).as("n_g"),
        sum((col("nxg").cast("double") * col("avg_rank"))
          .cast("decimal(28,12)")).as("r_g"))
    val ties = census.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    def d(c: Column) = c.cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m = groups.agg(sum(col("n_g")).as("n"),
        count(lit(1)).as("n_groups"),
        sum((d(col("r_g")) * d(col("r_g")) / d(col("n_g")))
          .cast("decimal(28,12)")).cast("double").as("rr"))
      .crossJoin(broadcast(ties))
    val n = d(col("n"))
    val h = lit(12.0) / (n * (n + lit(1.0))) * col("rr") -
      lit(3.0) * (n + lit(1.0))
    val c = lit(1.0) - d(col("tsum")) / (n * n * n - n)
    m.select(col("n"), (col("n_groups") - 1L).as("df"),
      r6(h).as("h"), r6(c).as("tie_correction"),
      r6(when(c > lit(0.0), h / c).otherwise(lit(0.0)))
        .as("h_corrected"))
  }

  /** One-way ANOVA F over per-customer order counts across market
    * segments — the parametric companion to [[kruskalWallis]] on the
    * same design: SSB = Σ n_g(x̄_g − x̄)², SSW = Σ_g(Σx² − (Σx)²/n_g),
    * F = (SSB/(k−1))/(SSW/(N−k)). Counts are integers, so every group
    * sum is exact; the k-bounded between/within folds go through
    * DECIMAL. F ~ F(k−1, N−k) under H₀ — statistic ships, caller brings
    * the CDF (no special functions, both engines bit-agree).
    *
    * Scale shape: one corpus aggregate to the customer frame, one
    * map-side-combined aggregate to the segment-bounded group frame,
    * then one-row folds. */
  def anovaF(orders: DataFrame, customer: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("x"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("x"))
    val gstats = per.groupBy("g")
      .agg(count(lit(1)).as("n_g"),
        sum(col("x")).cast("double").as("s_g"),
        sum(col("x") * col("x")).cast("double").as("ss_g"))
    fFold(gstats)
  }

  /** Levene's variance-homogeneity test (mean-centered original form)
    * on the same per-customer-order-count design as [[anovaF]]: the
    * ANOVA F recomputed over z = |x − x̄_g| answers "do segments differ
    * in SPREAD" — the assumption check before trusting anovaF's pooled
    * within-group variance. Group means broadcast back for the centering
    * pass; z moments fold through DECIMAL (z is a double).
    *
    * Scale shape: the [[anovaF]] passes plus one broadcast join of the
    * segment-bounded means frame — still two corpus-scale aggregates. */
  def levene(orders: DataFrame, customer: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("x"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("x"))
      .localCheckpoint() // the means pass and the centering pass share it
    val means = per.groupBy("g")
      .agg((sum(col("x")).cast("double") /
        count(lit(1)).cast("double")).as("m_g"))
    val z = per.join(broadcast(means), Seq("g"))
      .select(col("g"), abs(col("x").cast("double") - col("m_g")).as("z"))
    def dec(c: Column) = c.cast("decimal(38,12)")
    val gstats = z.groupBy("g")
      .agg(count(lit(1)).as("n_g"),
        sum(dec(col("z"))).cast("double").as("s_g"),
        sum(dec(col("z") * col("z"))).cast("double").as("ss_g"))
    fFold(gstats)
  }

  /** Post-hoc pairwise contrasts after [[anovaF]] — every segment pair's
    * mean difference standardized by the pooled within-group variance:
    * t_ij = (x̄_i − x̄_j) / √(MSW·(1/n_i + 1/n_j)) (the Tukey-HSD
    * statistic; the studentized-range CDF is the caller's, like every
    * other distribution here). The omnibus F says "something differs";
    * this table says WHICH pairs. MSW comes from the same DECIMAL
    * within-group fold as [[anovaF]], so the two reports cannot drift.
    *
    * Scale shape: the [[anovaF]] aggregates plus a k²-bounded self-join
    * of the segment frame — nothing data-scale after the group pass. */
  def pairwiseContrasts(orders: DataFrame,
                        customer: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("x"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("x"))
    val gstats = per.groupBy("g")
      .agg(count(lit(1)).as("n_g"),
        sum(col("x")).cast("double").as("s_g"),
        sum(col("x") * col("x")).cast("double").as("ss_g"))
      .localCheckpoint() // the MSW fold and the pair join both read it
    def d(c: Column) = c.cast("double")
    def dec(c: Column) = c.cast("decimal(38,12)")
    val msw = gstats
      .select(col("n_g"),
        dec(col("ss_g") - col("s_g") * col("s_g") / d(col("n_g")))
          .as("ssw_t"))
      .agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
        sum(col("ssw_t")).cast("double").as("ssw"))
      .select((col("ssw") / d(col("n") - col("k"))).as("msw"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val a = gstats.select(col("g").as("g_a"), col("n_g").as("n_a"),
      col("s_g").as("s_a"))
    val b = gstats.select(col("g").as("g_b"), col("n_g").as("n_b"),
      col("s_g").as("s_b"))
    val diff = col("s_a") / d(col("n_a")) - col("s_b") / d(col("n_b"))
    val se = sqrt(col("msw") *
      (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    a.join(b, col("g_a") < col("g_b"))
      .crossJoin(broadcast(msw))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        r6(col("s_a") / d(col("n_a"))).as("mean_a"),
        r6(col("s_b") / d(col("n_b"))).as("mean_b"),
        r6(diff).as("diff"), r6(se).as("se"),
        r6(diff / se).as("t"))
      .orderBy("g_a", "g_b")
  }

  /** Shared one-way-ANOVA fold over a (g, n_g, s_g, ss_g) group frame:
    * grand totals broadcast back, per-group between/within terms
    * DECIMAL-summed, one output row. */
  private def fFold(gstats: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    def dec(c: Column) = c.cast("decimal(38,12)")
    val tot = gstats.agg(sum(col("n_g")).as("n"),
      count(lit(1)).as("k"),
      sum(dec(col("s_g"))).cast("double").as("s"))
    val terms = gstats.crossJoin(broadcast(tot))
      .select(col("n"), col("k"),
        dec(d(col("n_g")) *
          (col("s_g") / d(col("n_g")) - col("s") / d(col("n"))) *
          (col("s_g") / d(col("n_g")) - col("s") / d(col("n"))))
          .as("ssb_t"),
        dec(col("ss_g") - col("s_g") * col("s_g") / d(col("n_g")))
          .as("ssw_t"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val m = terms.groupBy("n", "k")
      .agg(sum(col("ssb_t")).cast("double").as("ssb"),
        sum(col("ssw_t")).cast("double").as("ssw"))
    m.select(col("n"), (col("k") - 1L).as("df_between"),
      (col("n") - col("k")).as("df_within"),
      r6(col("ssb")).as("ss_between"), r6(col("ssw")).as("ss_within"),
      r6((col("ssb") / d(col("k") - 1L)) /
        (col("ssw") / d(col("n") - col("k")))).as("f"))
  }

  /** Simpson's-paradox screen: the pooled OLS slope of extended price
    * on quantity against the same slope WITHIN each return-flag stratum
    * — the aggregation-reversal audit every metrics team needs before
    * trusting a pooled trend (pooled and stratified slopes disagreeing
    * in sign means the stratum mix, not the relationship, drives the
    * pooled number). Slopes are (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from
    * DECIMAL-folded sums; the flip flag compares the UNROUNDED signs.
    *
    * Scale shape: one map-side-combined aggregate per stratum plus the
    * same aggregate unpartitioned (broadcast back onto the bounded
    * stratum frame) — two corpus passes, no window, no join on data. */
  def simpsonCheck(lineitem: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,10)")
    val base = lineitem.select(col("l_returnflag").as("g"),
      col("l_quantity").cast("double").as("x"),
      col("l_extendedprice").cast("double").as("y"))
    def sums(df: org.apache.spark.sql.RelationalGroupedDataset) =
      df.agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x") * col("x"))).cast("double").as("sxx"),
        sum(dec(col("x") * col("y"))).cast("double").as("sxy"))
    def d(c: Column) = c.cast("double")
    def slope = (d(col("n")) * col("sxy") - col("sx") * col("sy")) /
      (d(col("n")) * col("sxx") - col("sx") * col("sx"))
    val perG = sums(base.groupBy("g"))
      .select(col("g"), col("n"), slope.as("slope_g"))
    val pooled = sums(base.groupBy())
      .select(slope.as("slope_pooled"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    perG.crossJoin(broadcast(pooled))
      .select(col("g").as("stratum"), col("n"),
        r6(col("slope_g")).as("slope_stratum"),
        r6(col("slope_pooled")).as("slope_pooled"),
        (signum(col("slope_g")) =!= signum(col("slope_pooled")))
          .cast("int").as("sign_flip"))
      .orderBy("stratum")
  }

  /** Empirical-Bayes beta-binomial shrinkage of per-user purchase rates
    * (Robbins; the "add the prior you ESTIMATED" fix for small-n rate
    * rankings): method-of-moments α̂, β̂ from the observed per-user rate
    * moments — M = μ(1−μ)/v − 1, α̂ = μM, β̂ = (1−μ)M — then every user's
    * rate shrinks to (x+α̂)/(n+α̂+β̂). Low-n flukes collapse toward the
    * prior mean while high-n users keep their data; the top-k by shrunk
    * rate is the ranking a naive raw-rate sort gets wrong. Sample
    * variance (n−1); degenerate v = 0 yields no defined prior — guarded
    * to NULL α/β and shrunk = raw so the operator stays total.
    *
    * Scale shape: one corpus aggregate to the user frame, one one-row
    * moment aggregate broadcast back, TakeOrderedAndProject for the
    * top-k — no global sort, nothing collected. */
  def ebShrinkage(ev: DataFrame, k: Int = 20): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("x"))
      .withColumn("p", col("x").cast("double") / col("n").cast("double"))
      .localCheckpoint() // moments and scoring both read it
    def dec(c: Column) = c.cast("decimal(28,12)")
    val mom = per.agg(count(lit(1)).as("nu"),
      sum(dec(col("p"))).cast("double").as("sp"),
      sum(dec(col("p") * col("p"))).cast("double").as("spp"))
    def d(c: Column) = c.cast("double")
    val mu = col("sp") / d(col("nu"))
    val v = (col("spp") - d(col("nu")) * mu * mu) / (d(col("nu")) - lit(1.0))
    val mm = mu * (lit(1.0) - mu) / v - lit(1.0)
    val prior = mom.select(
      when(v > lit(0.0) && mm > lit(0.0), mu * mm).as("alpha"),
      when(v > lit(0.0) && mm > lit(0.0), (lit(1.0) - mu) * mm).as("beta"))
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val shrunk = when(col("alpha").isNotNull,
      (col("x").cast("double") + col("alpha")) /
        (col("n").cast("double") + col("alpha") + col("beta")))
      .otherwise(col("p"))
    per.crossJoin(broadcast(prior))
      .select(col("user_id"), col("n").as("n_events"),
        col("x").as("n_purchases"), r6(col("p")).as("raw_rate"),
        r6(shrunk).as("shrunk_rate"),
        r6(col("alpha")).as("alpha"), r6(col("beta")).as("beta"))
      .orderBy(col("shrunk_rate").desc, col("user_id"))
      .limit(k)
  }
}

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
