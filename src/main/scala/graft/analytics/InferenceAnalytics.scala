package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sequential-monitoring, survival-contrast, and randomization-inference
  * analytics — the statistical layer a pipeline owner leans on once the
  * descriptive stats (StatsAnalytics) say "something moved": did the daily
  * mean actually shift (Page–Hinkley), what does next week look like
  * (Theta forecast), is the series cyclic or noisy (spectral entropy), do
  * two user cohorts churn at different rates (log-rank, RMST), do raters /
  * repeated measures agree (Cochran's Q, Friedman, Krippendorff's α), and
  * what is the effect once confounding cells are balanced (AIPW).
  *
  * House determinism rules apply throughout: every sum that feeds a
  * rounded, hashed double folds through DECIMAL; divisors are structurally
  * nonzero (greatest / CASE sentinels) with when() gates carrying only the
  * semantics; libm-divergent constants are Scala-side literals shared
  * verbatim with the oracle SQL; decision flags compare against fixed
  * literal critical values (no CDFs — the grangerLag1 convention).
  */
object InferenceAnalytics {

  private def r6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** The daily total-value series every monitoring op in this module
    * watches: one day aggregate, 2dp-rounded through DECIMAL (the
    * periodogram construction, shared so the ops agree on their input). */
  private def dailySeries(ev: DataFrame): DataFrame =
    ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2)
        .cast("double").as("x"))

  /** Page–Hinkley mean-shift monitor over the daily value series (Page
    * 1954; the sequential drift detector stream-training pipelines run
    * beside PSI): m_t = Σ_{i≤t} (x_i − x̄_i), where x̄_i is the running
    * mean through day i, and PH_t = m_t − min_{s≤t} m_s. A mean that
    * drifts UP makes the recent deviations positive, m climbs away from
    * its historical minimum, and PH crosses the alarm band — here the
    * fixed 2σ of the whole series (a literal-free, scale-free band; the
    * classic δ drift allowance is 0 so the statistic stays exact integer
    * day arithmetic + one running ratio). Both the running mean and the
    * cumulative deviation fold through DECIMAL inside their window
    * frames, so partition order never reaches the last ulp.
    *
    * Scale shape: one day aggregate, then three window passes over the
    * day-bounded frame (≤ horizon rows at any corpus size). */
  def pageHinkley(ev: DataFrame): DataFrame = {
    val daily = dailySeries(ev)
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runMean = sum(col("x").cast("decimal(28,6)")).over(w)
      .cast("double") / count(lit(1)).over(w).cast("double")
    val sd0 = daily.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(28,6)")).cast("double").as("sx"),
      sum((col("x") * col("x")).cast("decimal(38,12)")).cast("double")
        .as("sxx"))
    val varD = (col("sxx") - col("sx") * col("sx") /
      col("n").cast("double")) /
      greatest(col("n") - 1L, lit(1L)).cast("double")
    val sd = sd0.select(col("n"),
      when(col("n") > 1L, sqrt(greatest(varD, lit(0.0))))
        .otherwise(lit(0.0)).as("sd"))
    daily
      .withColumn("run_mean", runMean)
      .withColumn("dev", col("x") - col("run_mean"))
      .withColumn("m_stat",
        sum(col("dev").cast("decimal(28,12)")).over(w).cast("double"))
      .withColumn("ph_stat", col("m_stat") - min(col("m_stat")).over(w))
      .crossJoin(broadcast(sd))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("x"),
        r6(col("run_mean")).as("run_mean"),
        r6(col("m_stat")).as("m_stat"), r6(col("ph_stat")).as("ph_stat"),
        r6(lit(2.0) * col("sd")).as("band_2sd"),
        when(col("ph_stat") > lit(2.0) * col("sd"), 1).otherwise(0)
          .cast("int").as("alarm_2sd"))
      .orderBy("d")
  }

  /** Theta-method forecast (Assimakopoulos & Nikolopoulos 2000) of the
    * daily value series, the M3-winning two-line decomposition: average
    * the θ=0 line (the OLS linear trend, extrapolated) with SES over the
    * θ=2 line z_t = 2·x_t − (a + b·t), α = 0.5. SES has the closed form
    * s_T = Σ_i w_i·z_i with w_i = α(1−α)^{T−i} (and the initial state
    * carrying (1−α)^{T−1}), so no sequential fold is needed: the weights
    * are the exact powers of two in [[ThetaTables.pow05]], shared
    * verbatim with the oracle (weights beyond 2⁻⁶³ are dropped on BOTH
    * engines — far below the output rounding). One row per horizon day.
    *
    * Scale shape: one day aggregate; the trend moments, the weighted SES
    * fold, and the 7 horizon arms all run on the day-bounded frame. */
  def thetaForecast(ev: DataFrame, horizon: Int = 7): DataFrame = {
    val daily = dailySeries(ev)
    val idx = daily
      .withColumn("t", row_number().over(Window.orderBy("d"))
        .cast("bigint"))
    def dc(c: Column) = c.cast("decimal(38,12)")
    val m = idx.agg(count(lit(1)).as("n"),
      sum(dc(col("t"))).cast("double").as("st"),
      sum(dc(col("x"))).cast("double").as("sx"),
      sum(dc(col("t") * col("t"))).cast("double").as("stt"),
      sum(dc(col("t").cast("double") * col("x"))).cast("double")
        .as("stx"))
    val nD = col("n").cast("double")
    val det = nD * col("stt") - col("st") * col("st")
    val detDiv = when(det =!= 0.0, det).otherwise(lit(1.0))
    val ab = m.select(col("n"),
      when(det =!= 0.0,
        (nD * col("stx") - col("st") * col("sx")) / detDiv)
        .otherwise(lit(0.0)).as("b"),
      when(det =!= 0.0,
        (col("sx") * col("stt") - col("st") * col("stx")) / detDiv)
        .otherwise(col("sx") / greatest(col("n"), lit(1L)).cast("double"))
        .as("a"))
    // SES weight: k = n − t (0 for the last observation);
    // w = 0.5^(k+1) for t > 1 (α·(1−α)^k at α = 0.5), 0.5^k for t = 1
    // (the initial state's (1−α)^(n−1)). Exact powers of two — the CASE
    // table is bit-identical on both engines.
    val kCol = col("n") - col("t")
    def powCase(k: Column): Column =
      (0 until ThetaTables.maxPow).foldLeft(lit(0.0)) { (acc, i) =>
        when(k === i.toLong, lit(ThetaTables.pow05(i))).otherwise(acc)
      }
    val wgt = when(col("t") === 1L, powCase(kCol))
      .otherwise(powCase(kCol + 1L))
    val z = lit(2.0) * col("x") - (col("a") + col("b") *
      col("t").cast("double"))
    val ses = idx.crossJoin(broadcast(ab))
      .agg(sum((wgt * z).cast("decimal(38,12)")).cast("double").as("ses"),
        max(col("n")).as("n"), max(col("a")).as("a"), max(col("b")).as("b"))
    val hs = (1 to horizon).map(h => lit(h.toLong))
    ses.select(explode(array(hs: _*)).as("h"), col("n").as("n_days"),
        col("a"), col("b"), col("ses"))
      .select(col("h"), col("n_days"),
        r6(col("a") + col("b") *
          (col("n_days") + col("h")).cast("double")).as("trend_part"),
        r6(col("ses")).as("ses_part"),
        r6((col("a") + col("b") *
          (col("n_days") + col("h")).cast("double") + col("ses")) /
          lit(2.0)).as("forecast"))
      .orderBy("h")
  }

  /** Normalized spectral entropy of the daily series — "is this series
    * CYCLIC or NOISY", folded from [[StatsAnalytics.periodogram]]'s
    * power census at its own 6dp reporting boundary (so this summary and
    * that report can never disagree): H = −Σ p·ln p over the power
    * shares, normalized by ln(K); near 0 means one period owns the
    * spectrum (strong seasonality), near 1 means white noise. The
    * dominant period is the deterministic argmax (power DESC, period
    * ASC). ln(K) is a Scala-side literal shared with the oracle.
    *
    * Scale shape: everything after the day aggregate runs on the
    * 13-row period census. */
  def spectralEntropy(ev: DataFrame): DataFrame = {
    val pg = StatsAnalytics.periodogram(ev)
    val tot = pg.agg(count(lit(1)).as("n_periods"),
      max(col("n_days")).as("nd"),
      sum(col("power").cast("decimal(28,12)")).cast("double").as("sp"),
      max(col("power")).as("pmax"))
    val spDiv = when(col("sp") =!= 0.0, col("sp")).otherwise(lit(1.0))
    val share = col("power") / spDiv
    val ranked = pg.crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("power").desc, col("period"))))
    val ent = ranked.agg(
      max(col("n_periods")).as("n_periods"),
      max(col("nd")).as("n_days"),
      max(col("sp")).as("sp"), max(col("pmax")).as("pmax"),
      sum(when(share > 0.0, (-share * log(share)).cast("decimal(28,12)"))
        .otherwise(lit(0).cast("decimal(28,12)"))).cast("double")
        .as("h"),
      max(when(col("rnk") === 1, col("period"))).as("dominant_period"))
    val ok = col("sp") =!= 0.0
    ent.select(col("n_periods"), col("n_days"),
      r6(col("sp")).as("total_power"),
      r6(when(ok, col("h")).otherwise(lit(0.0))).as("spectral_entropy"),
      r6(when(ok, col("h") / lit(ThetaTables.lnPeriods))
        .otherwise(lit(0.0))).as("spectral_entropy_norm"),
      col("dominant_period"),
      r6(when(ok, col("pmax") / spDiv).otherwise(lit(0.0)))
        .as("max_share"))
  }

  /** Two-cohort log-rank test (Mantel 1966) on user lifetime — "do the
    * A and B populations CHURN at different rates", the hypothesis test
    * [[StatsAnalytics.survivalKm]]'s two curves only eyeball. Cohorts
    * are the deterministic md5 split (the abLift convention); censoring
    * is last-day-equals-horizon, exactly as the KM/Nelson–Aalen
    * lifetime table builds it. At every event time: E₁ = d·n₁/n and the
    * hypergeometric variance d·(n₁/n)(1−n₁/n)(n−d)/(n−1); the statistic
    * (ΣO₁−ΣE₁)²/ΣV is χ²(1) under H₀ and the flag compares the literal
    * 3.841 (5%). Per-time ratios fold through DECIMAL; divisors are
    * structurally nonzero with when() gates carrying the semantics.
    *
    * Scale shape: one user aggregate, then everything runs on the
    * day-bounded risk table. */
  def logRank(ev: DataFrame): DataFrame = {
    val life = ev.filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(datediff(max(col("d")), min(col("d"))).cast("bigint").as("t"),
        max(col("d")).as("last_d"))
      .withColumn("g", Sampling.hashBucket(col("user_id"), 2))
    val horizon = life.agg(max(col("last_d")).as("h"))
    val pt = life.crossJoin(broadcast(horizon))
      .select(col("t"), col("g"),
        when(col("last_d") === col("h"), 1L).otherwise(0L).as("cen"))
      .groupBy("t")
      .agg(
        sum(when(col("g") === 0L && col("cen") === 0L, 1L).otherwise(0L))
          .as("d0"),
        sum(when(col("g") === 0L && col("cen") === 1L, 1L).otherwise(0L))
          .as("c0"),
        sum(when(col("g") === 1L && col("cen") === 0L, 1L).otherwise(0L))
          .as("d1"),
        sum(when(col("g") === 1L && col("cen") === 1L, 1L).otherwise(0L))
          .as("c1"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = pt.agg(sum(col("d0") + col("c0")).as("n0t"),
      sum(col("d1") + col("c1")).as("n1t"))
    val risk = pt.crossJoin(broadcast(tot))
      .withColumn("n0", col("n0t") -
        coalesce(sum(col("d0") + col("c0")).over(wPrev), lit(0L)))
      .withColumn("n1", col("n1t") -
        coalesce(sum(col("d1") + col("c1")).over(wPrev), lit(0L)))
      .withColumn("nr", col("n0") + col("n1"))
      .withColumn("dd", col("d0") + col("d1"))
    val frac1 = col("n1").cast("double") /
      greatest(col("nr"), lit(1L)).cast("double")
    val e1 = col("dd").cast("double") * frac1
    val v = col("dd").cast("double") * frac1 * (lit(1.0) - frac1) *
      (col("nr") - col("dd")).cast("double") /
      greatest(col("nr") - 1L, lit(1L)).cast("double")
    def dz(c: Column) = c.cast("decimal(28,12)")
    val agg = risk.agg(
      max(col("n0t")).as("n_users_a"), max(col("n1t")).as("n_users_b"),
      sum(col("d1")).as("o1"),
      sum(when(col("dd") > 0L, dz(e1)).otherwise(dz(lit(0.0))))
        .cast("double").as("e1"),
      sum(when(col("dd") > 0L && col("nr") > 1L, dz(v))
        .otherwise(dz(lit(0.0)))).cast("double").as("vsum"))
    val vDiv = when(col("vsum") =!= 0.0, col("vsum")).otherwise(lit(1.0))
    val chi2 = (col("o1").cast("double") - col("e1")) *
      (col("o1").cast("double") - col("e1")) / vDiv
    agg.select(col("n_users_a"), col("n_users_b"), col("o1"),
      r6(col("e1")).as("e1"), r6(col("vsum")).as("var_sum"),
      r6(when(col("vsum") =!= 0.0, chi2).otherwise(lit(0.0)))
        .as("chi2_stat"),
      when(col("vsum") =!= 0.0 && chi2 > lit(3.841), 1).otherwise(0)
        .cast("int").as("reject_at_3841"))
  }

  /** Restricted mean survival time — ∫₀^τ S(t)dt from the KM curve, the
    * "average days retained within the first τ" number product reviews
    * quote because, unlike the median, it exists even when the curve
    * never crosses 0.5. Integrates the step function exactly: S = 1 on
    * [0, t_min), then s_km(t_k) over [t_k, t_{k+1} ∧ τ). Reuses
    * [[StatsAnalytics.survivalKm]] AT its own 6dp rounding boundary, so
    * this summary and the published curve can never disagree. One row
    * per horizon τ, plus the share of τ retained.
    *
    * Scale shape: the KM fold is one user aggregate; the integral arms
    * run on the day-bounded (checkpointed) curve. */
  def rmst(ev: DataFrame, taus: Seq[Int] = Seq(7, 14, 21, 28)): DataFrame = {
    val w = Window.orderBy("t")
    val km = StatsAnalytics.survivalKm(ev)
      .withColumn("t_next", coalesce(lead(col("t"), 1).over(w),
        lit(1000000L)))
      .localCheckpoint() // every τ arm folds the same curve
    val tmin = km.agg(min(col("t")).as("t_min"))
    val arms = taus.map { tau =>
      val tl = lit(tau.toLong)
      val seg = greatest(least(col("t_next"), tl) - least(col("t"), tl),
        lit(0L))
      km.agg(sum((col("s_km") * seg.cast("double"))
          .cast("decimal(28,12)")).cast("double").as("auc"))
        .crossJoin(broadcast(tmin))
        .select(tl.as("tau"),
          (least(col("t_min"), tl).cast("double") + col("auc"))
            .as("rmst_raw"))
        .select(col("tau"), r6(col("rmst_raw")).as("rmst"),
          r6(col("rmst_raw") / lit(tau.toDouble)).as("rmst_share"))
    }
    arms.reduce(_ unionAll _).orderBy("tau")
  }

  /** Cochran's Q test (Cochran 1950) across the five canonical event
    * types: blocks are users, the binary outcome is "did this user ever
    * emit the type" — DID the k funnel surfaces reach the same share of
    * the population, the k-treatment generalization of [[StatsAnalytics
    * .mcnemar]]. Algebraically reduced to pure integers: Q = (k−1)·
    * (k·ΣC_j² − N²) / (k·N − ΣR_i²), with the single division the only
    * double (structurally-nonzero sentinel; the denominator vanishes
    * iff every user hit all-or-none of the types). Flag at the literal
    * χ²(4) 5% value 9.488.
    *
    * Scale shape: one user aggregate, then one scalar fold. */
  def cochranQ(ev: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val k = types.size
    val flags = types.map(t =>
      max(when(col("event_type") === t, 1L).otherwise(0L)).as(s"x_$t"))
    val per = ev.filter(col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .groupBy("user_id")
      .agg(flags.head, flags.tail: _*)
      .withColumn("r", types.map(t => col(s"x_$t")).reduce(_ + _))
    val aggs: Seq[Column] = count(lit(1)).as("n_blocks") +:
      (types.map(t => sum(col(s"x_$t")).as(s"c_$t")) ++
        Seq(sum(col("r")).as("nn"), sum(col("r") * col("r")).as("r2")))
    val m = per.agg(aggs.head, aggs.tail: _*)
    val sumC2 = types.map(t => col(s"c_$t") * col(s"c_$t")).reduce(_ + _)
    val num = lit((k - 1).toLong) *
      (lit(k.toLong) * sumC2 - col("nn") * col("nn"))
    val den = lit(k.toLong) * col("nn") - col("r2")
    val q = num.cast("double") / greatest(den, lit(1L)).cast("double")
    val outCols: Seq[Column] =
      (col("n_blocks") +: types.map(t => col(s"c_$t"))) ++ Seq(
        col("nn").as("n_total"),
        lit(k).cast("int").as("k"),
        lit(k - 1).cast("int").as("df"),
        r6(when(den > 0L, q).otherwise(lit(0.0))).as("q_stat"),
        when(den > 0L && q > lit(9.488), 1).otherwise(0).cast("int")
          .as("reject_at_9488"))
    m.select(outCols: _*)
  }

  /** Friedman rank test (Friedman 1937) — blocks are nations, the k
    * repeated measures are the five order priorities, the response is
    * each cell's mean order value: DO priorities rank consistently
    * across nations, the nonparametric two-way ANOVA. Cells are
    * 6dp-rounded means (identical doubles on both engines), so the
    * within-block MIDRANKS — min-rank + (ties−1)/2 — are engine-stable;
    * only blocks holding all k cells enter. Tie-corrected statistic
    * with the kruskalWallis zero-guard discipline; flag at the literal
    * χ²(4) 5% value 9.488.
    *
    * Scale shape: one fact-dim join into the ≤ |nations|×k cell census;
    * ranks and the fold run on cells. */
  def friedman(orders: DataFrame, customer: DataFrame): DataFrame = {
    val k = 5
    val cells = orders.join(
        customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("block"),
        col("o_orderpriority").as("treat"))
      .agg((sum(col("o_totalprice").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("v_raw"))
      .select(col("block"), col("treat"), r6(col("v_raw")).as("v"))
    val complete = cells
      .withColumn("kc", count(lit(1)).over(
        Window.partitionBy("block")))
      .filter(col("kc") === k)
    val ranked = complete
      .withColumn("minrank", rank().over(
        Window.partitionBy("block").orderBy("v")).cast("double"))
      .withColumn("ties", count(lit(1)).over(
        Window.partitionBy("block", "v")))
      .withColumn("midrank", col("minrank") +
        (col("ties") - 1L).cast("double") / lit(2.0))
    def dc(c: Column) = c.cast("decimal(28,12)")
    val rj = ranked.groupBy("treat")
      .agg(count(lit(1)).as("nb"),
        sum(dc(col("midrank"))).cast("double").as("rsum"))
    // Σ(t³−t) over tie groups, for the correction factor
    val tieSum = ranked.groupBy("block", "v")
      .agg(count(lit(1)).as("tt"))
      .agg(coalesce(sum(col("tt") * col("tt") * col("tt") - col("tt")),
        lit(0L)).as("ts"))
    val m = rj.agg(max(col("nb")).as("n_blocks"),
      sum(dc(col("rsum") * col("rsum"))).cast("double").as("sr2"))
    val nD = col("n_blocks").cast("double")
    val qRaw = lit(12.0) / (nD * lit(k.toDouble) * lit((k + 1).toDouble)) *
      col("sr2") - lit(3.0) * nD * lit((k + 1).toDouble)
    val corr = lit(1.0) - col("ts").cast("double") /
      (nD * lit(k.toDouble) * lit((k * k - 1).toDouble))
    val out = m.crossJoin(broadcast(tieSum))
    val ok = col("n_blocks") > 0L
    val cDiv = when(corr =!= 0.0, corr).otherwise(lit(1.0))
    val qc = qRaw / cDiv
    out.select(col("n_blocks"), lit(k).cast("int").as("k"),
      lit(k - 1).cast("int").as("df"),
      r6(when(ok, qRaw).otherwise(lit(0.0))).as("q_stat"),
      r6(when(ok && corr =!= 0.0, qc).otherwise(lit(0.0)))
        .as("q_corrected"),
      when(ok && corr =!= 0.0 && qc > lit(9.488), 1).otherwise(0)
        .cast("int").as("reject_at_9488"))
  }

  /** Krippendorff's α (nominal metric) over order line return flags —
    * units are orders, the "raters" are their line items, the category
    * is l_returnflag: DO the lines of one order agree on return
    * behavior more than chance, the inter-annotator-agreement statistic
    * label pipelines publish because (unlike Fleiss) it is defined for
    * VARYING raters per unit and missing data. Coincidence-matrix form:
    * observed disagreement D_o = 1 − Σ_c Σ_u n_uc(n_uc−1)/(m_u−1) / n,
    * expected D_e = 1 − Σ_c n_c(n_c−1)/(n(n−1)), α = 1 − D_o/D_e.
    * Units with one rating carry no coincidence and are excluded, as
    * the estimator requires. All counts are exact integers; per-unit
    * ratios fold through DECIMAL; flag at Krippendorff's customary
    * α ≥ 0.8 reliability bar.
    *
    * Scale shape: one (order, flag) count aggregate, one order-keyed
    * join, two scalar folds — nothing leaves order granularity. */
  def krippendorffAlpha(lineitem: DataFrame): DataFrame = {
    val nuc = lineitem
      .groupBy(col("l_orderkey").as("u"), col("l_returnflag").as("c"))
      .agg(count(lit(1)).as("nuc"))
    val mu = nuc.groupBy("u").agg(sum(col("nuc")).as("m"))
      .filter(col("m") >= 2L)
    val kept = nuc.join(mu, "u")
    def dc(c: Column) = c.cast("decimal(28,12)")
    val occ = kept.agg(
      sum(dc((col("nuc") * (col("nuc") - 1L)).cast("double") /
        greatest(col("m") - 1L, lit(1L)).cast("double")))
        .cast("double").as("o_agree"),
      sum(col("nuc")).as("n"),
      countDistinct(col("u")).as("n_units"),
      countDistinct(col("c")).as("n_categories"))
    val nc = kept.groupBy("c").agg(sum(col("nuc")).as("ncat"))
      .agg(sum(col("ncat") * (col("ncat") - 1L)).as("sne"))
    val j = occ.crossJoin(broadcast(nc))
    val nD = col("n").cast("double")
    val dO = lit(1.0) - col("o_agree") / greatest(col("n"), lit(1L))
      .cast("double")
    val dE = lit(1.0) - col("sne").cast("double") /
      (nD * greatest(col("n") - 1L, lit(1L)).cast("double"))
    val dEDiv = when(dE =!= 0.0, dE).otherwise(lit(1.0))
    val ok = col("n") > 1L && dE =!= 0.0
    val alpha = lit(1.0) - dO / dEDiv
    j.select(col("n_units"), col("n").as("n_ratings"),
      col("n_categories"),
      r6(when(col("n") > 1L, dO).otherwise(lit(0.0))).as("d_observed"),
      r6(when(col("n") > 1L, dE).otherwise(lit(0.0))).as("d_expected"),
      r6(when(ok, alpha).otherwise(lit(0.0))).as("alpha"),
      when(ok && alpha >= lit(0.8), 1).otherwise(0).cast("int")
        .as("reliable_at_0_8"))
  }

  /** Mann–Kendall trend test + Sen's slope on the daily value series —
    * the nonparametric "is this metric drifting, and how fast" pair
    * operations dashboards run because neither needs the residuals to
    * be normal: S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected
    * variance [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, continuity-corrected
    * Z against the literal 1.96, and the Theil–Sen slope (the exact
    * median of all pairwise slopes — robust where [[StatsAnalytics
    * .linreg]]'s OLS slope chases outliers). The pair frame is the
    * day-bounded self-join (≤ horizon² rows at ANY corpus size — this
    * never touches row granularity), and the median is the
    * deterministic sorted-middle average, not an engine quantile.
    *
    * Scale shape: one day aggregate; pairs, ranks, and folds all run on
    * the day-bounded frame. */
  def mannKendall(ev: DataFrame): DataFrame = {
    val daily = dailySeries(ev)
    val idx = daily
      .withColumn("t", row_number().over(Window.orderBy("d"))
        .cast("bigint"))
      .select(col("t"), col("x"))
      .localCheckpoint() // both self-join sides + the tie census read it
    val pairs = idx.select(col("t").as("ta"), col("x").as("xa"))
      .join(idx.select(col("t").as("tb"), col("x").as("xb")),
        col("tb") > col("ta"))
      .select(col("ta"), col("tb"),
        when(col("xb") > col("xa"), 1L)
          .when(col("xb") < col("xa"), -1L).otherwise(0L).as("sgn"),
        ((col("xb") - col("xa")) /
          (col("tb") - col("ta")).cast("double")).as("slope"))
      .localCheckpoint() // the S fold and the median walk both read it
    val sFold = pairs.agg(count(lit(1)).as("n_pairs"),
      sum(col("sgn")).as("s"))
    val ties = daily.groupBy("x").agg(count(lit(1)).as("tt"))
      .agg(count(lit(1)).as("n_days"),
        coalesce(sum(col("tt") * (col("tt") - 1L) *
          (lit(2L) * col("tt") + 5L)), lit(0L)).as("tsum"))
    val ranked = pairs
      .withColumn("rn", row_number().over(
        Window.orderBy(col("slope"), col("ta"), col("tb"))))
    val med = ranked.crossJoin(broadcast(sFold.select(col("n_pairs"))))
      .filter(col("rn") === (col("n_pairs") + 1L) / 2L ||
        col("rn") === (col("n_pairs") + 2L) / 2L)
      .agg((sum(col("slope").cast("decimal(28,12)")).cast("double") /
        count(lit(1)).cast("double")).as("sen_slope"))
    val m = sFold.crossJoin(broadcast(ties)).crossJoin(broadcast(med))
    val nD = col("n_days").cast("double")
    val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      col("tsum").cast("double")) / lit(18.0)
    val sD = col("s").cast("double")
    val sdDiv = sqrt(when(varS > 0.0, varS).otherwise(lit(1.0)))
    val z = when(col("s") > 0L, (sD - lit(1.0)) / sdDiv)
      .when(col("s") < 0L, (sD + lit(1.0)) / sdDiv)
      .otherwise(lit(0.0))
    val ok = varS > 0.0
    m.select(col("n_days"), col("n_pairs"), col("s").as("s_stat"),
      r6(when(ok, varS).otherwise(lit(0.0))).as("var_s"),
      r6(when(ok, z).otherwise(lit(0.0))).as("z_stat"),
      r6(col("sen_slope")).as("sen_slope"),
      when(ok && abs(z) > lit(1.96),
        when(col("s") > 0L, 1).otherwise(-1)).otherwise(0)
        .cast("int").as("trend_at_196"))
  }

  /** TOST equivalence test (Schuirmann 1987) on per-user spend across
    * the md5 A/B split — the inference a rollout gate actually needs:
    * not "is there a difference" but "is any difference SMALLER than
    * the margin we care about". Two one-sided Welch statistics against
    * a ±5%-of-grand-mean margin; equivalence is declared when BOTH
    * clear the literal one-sided 5% normal value 1.645 (large per-arm
    * counts make the t quantile indistinguishable — stated, the
    * grangerLag1 fixed-critical-value convention). Moments fold through
    * DECIMAL; the single se division is sentinel-guarded.
    *
    * Scale shape: one user aggregate, one two-row arm fold. */
  def tost(ev: DataFrame, marginFrac: Double = 0.05): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(round(sum(when(col("event_type") === "purchase",
          coalesce(col("value"), lit(0.0))).otherwise(lit(0.0))
          .cast("decimal(18,6)")), 2).cast("double").as("spend"))
      .withColumn("variant", Sampling.hashBucket(col("user_id"), 2))
    def dc(c: Column) = c.cast("decimal(38,12)")
    def arm(v: Int, suffix: String) = Seq(
      sum(when(col("variant") === v, 1L).otherwise(0L)).as(s"n$suffix"),
      sum(when(col("variant") === v, dc(col("spend")))
        .otherwise(dc(lit(0.0)))).cast("double").as(s"sx$suffix"),
      sum(when(col("variant") === v, dc(col("spend") * col("spend")))
        .otherwise(dc(lit(0.0)))).cast("double").as(s"sxx$suffix"))
    val aggs = arm(0, "a") ++ arm(1, "b")
    val m = per.agg(aggs.head, aggs.tail: _*)
    def nD(s: String) = greatest(col(s"n$s"), lit(1L)).cast("double")
    def mean(s: String) = col(s"sx$s") / nD(s)
    def variance(s: String) =
      (col(s"sxx$s") - col(s"sx$s") * col(s"sx$s") / nD(s)) /
        greatest(col(s"n$s") - 1L, lit(1L)).cast("double")
    val diff = mean("b") - mean("a")
    val delta = lit(marginFrac) *
      ((col("sxa") + col("sxb")) /
        greatest(col("na") + col("nb"), lit(1L)).cast("double"))
    val se2 = variance("a") / nD("a") + variance("b") / nD("b")
    val se = sqrt(when(se2 > 0.0, se2).otherwise(lit(1.0)))
    val ok = col("na") > 1L && col("nb") > 1L && se2 > 0.0
    val tLower = (diff + delta) / se
    val tUpper = (delta - diff) / se
    m.select(col("na").as("users_a"), col("nb").as("users_b"),
      r6(mean("a")).as("mean_a"), r6(mean("b")).as("mean_b"),
      r6(diff).as("diff"), r6(delta).as("margin"),
      r6(when(ok, se).otherwise(lit(0.0))).as("se"),
      r6(when(ok, tLower).otherwise(lit(0.0))).as("t_lower"),
      r6(when(ok, tUpper).otherwise(lit(0.0))).as("t_upper"),
      when(ok && tLower > lit(1.645) && tUpper > lit(1.645), 1)
        .otherwise(0).cast("int").as("equivalent_at_1645"))
  }

  /** Doubly-robust (AIPW) average treatment effect of heavy clicking on
    * purchase — the estimator that stays consistent if EITHER the
    * propensity model OR the outcome model is right, where
    * [[StatsAnalytics.ipwAte]] bets everything on the propensity.
    * Treatment is the eValue convention (≥ 14 clicks); the confounding
    * cells are active-day buckets (1, 2, 3+); both nuisance models are
    * the cell means, so every "model" is a count ratio and the whole
    * estimator is exact-integer inputs + per-user ratios folded through
    * DECIMAL. Cells without overlap (no treated or no control user)
    * have no defined counterfactual and are excluded, with the drop
    * accounted in the report — the ipwAte positivity discipline. The
    * plain regression (cell-mean) and IPW estimates ship alongside for
    * the classic triangulation.
    *
    * Scale shape: one user aggregate → ≤ 3-row cell frame (broadcast
    * back) → one user-frame fold. */
  def aipwAte(ev: DataFrame): DataFrame = {
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"),
        countDistinct(to_date(col("ts"))).as("days"))
      .select(col("user_id"),
        when(col("clicks") >= 14L, 1L).otherwise(0L).as("t"), col("y"),
        least(col("days"), lit(3L)).as("x"))
    val cells = per.groupBy("x")
      .agg(count(lit(1)).as("nx"), sum(col("t")).as("n1"),
        sum(col("t") * col("y")).as("s1y"),
        sum((lit(1L) - col("t")) * col("y")).as("s0y"))
      .withColumn("keep", col("n1") > 0L && col("n1") < col("nx"))
    val nCells = cells.agg(count(lit(1)).as("n_cells"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_cells_kept"),
      sum(col("nx")).as("n_users"))
    val keptCells = cells.filter(col("keep"))
      .withColumn("m1", col("s1y").cast("double") /
        greatest(col("n1"), lit(1L)).cast("double"))
      .withColumn("m0", col("s0y").cast("double") /
        greatest(col("nx") - col("n1"), lit(1L)).cast("double"))
    val j = per.join(broadcast(keptCells), "x")
    val tD = col("t").cast("double")
    val yD = col("y").cast("double")
    // T(y−m1)/e with e = n1/nx  ⇒  T(y−m1)·nx/n1 — integer-ratio form
    val wx1 = col("nx").cast("double") /
      greatest(col("n1"), lit(1L)).cast("double")
    val wx0 = col("nx").cast("double") /
      greatest(col("nx") - col("n1"), lit(1L)).cast("double")
    val psi = col("m1") - col("m0") + tD * (yD - col("m1")) * wx1 -
      (lit(1.0) - tD) * (yD - col("m0")) * wx0
    val ipw = tD * yD * wx1 - (lit(1.0) - tD) * yD * wx0
    def dc(c: Column) = c.cast("decimal(28,12)")
    val folds = j.agg(count(lit(1)).as("n_kept"),
      sum(dc(psi)).cast("double").as("spsi"),
      sum(dc(ipw)).cast("double").as("sipw"),
      sum(dc(col("m1") - col("m0"))).cast("double").as("sreg"))
    val nk = greatest(col("n_kept"), lit(1L)).cast("double")
    val ok = col("n_kept") > 0L
    folds.crossJoin(broadcast(nCells))
      .select(col("n_users"), col("n_kept").as("n_users_kept"),
        (col("n_users") - col("n_kept")).as("n_users_dropped"),
        col("n_cells"), col("n_cells_kept"),
        r6(when(ok, col("sreg") / nk).otherwise(lit(0.0))).as("ate_reg"),
        r6(when(ok, col("sipw") / nk).otherwise(lit(0.0))).as("ate_ipw"),
        r6(when(ok, col("spsi") / nk).otherwise(lit(0.0))).as("ate_aipw"))
  }
}

/** Literal weight/constant tables for [[InferenceAnalytics]], shared
  * verbatim between the Column expressions and the DuckDB oracle SQL
  * (the PeriodogramTables discipline). The 0.5 powers are exact binary
  * doubles, so the SQL literal round-trip is bit-identical by
  * construction. */
object ThetaTables {
  val maxPow = 64
  val pow05: Array[Double] = Array.tabulate(maxPow)(k => math.pow(0.5, k))
  /** ln(13) — the [[InferenceAnalytics.spectralEntropy]] normalizer for
    * the 13-period periodogram census. */
  val lnPeriods: Double = math.log(13.0)
}
