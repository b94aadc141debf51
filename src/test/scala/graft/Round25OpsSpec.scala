package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.InferenceAnalytics

/** Round-25-of-build additions: Page–Hinkley drift monitor, Theta-method
  * forecast, spectral entropy, log-rank + RMST survival contrasts,
  * Cochran's Q / Friedman / Krippendorff agreement tests, AIPW doubly
  * robust ATE, Jelinek–Mercer perplexity, and the Hilbert-curve
  * data-skipping arm. */
class Round25OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def ev(rows: (Long, String, String, java.lang.Double)*) =
    rows.zipWithIndex.map { case ((uid, et, t, v), i) =>
      (i.toLong, uid, et, ts(t), v)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")

  // ---- pageHinkley ----------------------------------------------------

  test("pageHinkley: a level shift drives PH up and fires the 2sd alarm") {
    // 6 days at 10, then 6 days at 100: the running mean trails the
    // shifted level, deviations go positive, PH must strictly grow
    // through the post-shift days and end above the 2sd band
    val rows = (1 to 6).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(10.0))) ++
      (7 to 12).map(d => (1L, "view",
        f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(100.0)))
    val out = InferenceAnalytics.pageHinkley(ev(rows: _*)).collect()
    assert(out.length == 12)
    val ph = out.map(_.getAs[Double]("ph_stat"))
    assert(ph.take(6).forall(_ == 0.0)) // constant prefix: no drift
    assert(ph.slice(7, 12).zip(ph.slice(6, 11)).forall { case (b, a) =>
      b > a }) // post-shift PH strictly increasing
    assert(out.last.getAs[Int]("alarm_2sd") == 1)
    // m_stat identity on day 7: sum of (x_i - runmean_i); prefix terms
    // are 0, day 7 contributes 90*6/7
    assert(out(6).getAs[Double]("m_stat") ==
      r6(100.0 - (6 * 10.0 + 100.0) / 7.0))
  }

  test("pageHinkley: constant series never alarms") {
    val rows = (1 to 9).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(42.0)))
    val out = InferenceAnalytics.pageHinkley(ev(rows: _*)).collect()
    assert(out.forall(_.getAs[Double]("ph_stat") == 0.0))
    assert(out.forall(_.getAs[Int]("alarm_2sd") == 0))
  }

  // ---- thetaForecast --------------------------------------------------

  test("thetaForecast: constant series forecasts the constant at every " +
    "horizon") {
    // x = c: trend is (a=c, b=0), theta2 line is c, SES of a constant
    // is the constant, so trend, SES, and the combination all equal c
    val rows = (1 to 10).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(55.25)))
    val out = InferenceAnalytics.thetaForecast(ev(rows: _*)).collect()
    assert(out.length == 7)
    out.foreach { r =>
      assert(r.getAs[Double]("trend_part") == 55.25)
      assert(r.getAs[Double]("ses_part") == 55.25)
      assert(r.getAs[Double]("forecast") == 55.25)
    }
  }

  test("thetaForecast: linear series extrapolates the trend line " +
    "exactly in the trend part") {
    // x_t = 10t: OLS recovers a=0, b=10 exactly; SES lags the theta2
    // line (which equals the trend line), so the forecast sits between
    // the flat SES level and the extrapolated trend
    val rows = (1 to 10).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(10.0 * d)))
    val out = InferenceAnalytics.thetaForecast(ev(rows: _*)).collect()
      .sortBy(_.getAs[Long]("h"))
    out.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      assert(math.abs(r.getAs[Double]("trend_part") - 10.0 * (10 + h))
        < 1e-6)
      assert(r.getAs[Double]("forecast") < r.getAs[Double]("trend_part"))
      assert(r.getAs[Double]("forecast") > r.getAs[Double]("ses_part"))
    }
  }

  // ---- spectralEntropy ------------------------------------------------

  test("spectralEntropy: a pure 7-day cycle concentrates the spectrum " +
    "on period 7") {
    // 28 days of a period-7 two-level square wave: the periodogram must
    // put its max at p=7 and the normalized entropy well below 1
    val rows = (1 to 28).map { d =>
      val v = if (d % 7 < 2) 1000.0 else 10.0
      (1L, "view", f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(v))
    }
    val out = InferenceAnalytics.spectralEntropy(ev(rows: _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("dominant_period") == 7L)
    assert(r.getAs[Long]("n_periods") == 13L)
    assert(r.getAs[Double]("spectral_entropy_norm") < 0.8)
    assert(r.getAs[Double]("max_share") > 0.3)
  }

  test("spectralEntropy: a constant series has zero power everywhere " +
    "and reports the guarded zeros") {
    val rows = (1 to 20).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(5.0)))
    val r = InferenceAnalytics.spectralEntropy(ev(rows: _*)).collect().head
    assert(r.getAs[Double]("total_power") == 0.0)
    assert(r.getAs[Double]("spectral_entropy") == 0.0)
    assert(r.getAs[Double]("max_share") == 0.0)
  }

  // ---- logRank --------------------------------------------------------

  /** The Sampling.hashBucket split, recomputed independently so the
    * fixture can build per-group truth. */
  private def bucket(uid: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(uid.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 2
  }

  test("logRank: hand-folded statistic matches on a mixed fixture") {
    // users 1..12: half live 1 day (die at t=0... they span to their own
    // last day), horizon carriers censored. Build: users with lifetimes
    // 0 or 2 days; user 99 extends the horizon so nobody else is
    // censored except the t=2 group's horizon-day members.
    val horizon = "2024-01-05 00:00:00"
    val rows = (1L to 12L).flatMap { u =>
      if (u % 3 == 0L)
        Seq((u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)),
          (u, "view", "2024-01-03 00:00:00",
            java.lang.Double.valueOf(1.0)))
      else
        Seq((u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)))
    } :+ ((99L, "view", horizon, java.lang.Double.valueOf(1.0)))
    val out = InferenceAnalytics.logRank(ev(rows: _*)).collect().head
    // brute-force the same statistic from the known buckets
    val lifes = (1L to 12L).map(u =>
      (bucket(u), if (u % 3 == 0L) 2L else 0L, false)) :+
      ((bucket(99L), 0L, true)) // 99 is the horizon carrier: censored
    val times = lifes.map(_._2).distinct.sorted
    var (o1, e1, v) = (0.0, 0.0, 0.0)
    var at = lifes
    for (t <- times) {
      val n1 = at.count(_._1 == 1L).toDouble
      val n = at.length.toDouble
      val deaths = at.filter(x => x._2 == t && !x._3)
      val d = deaths.length.toDouble
      if (d > 0) {
        o1 += deaths.count(_._1 == 1L)
        e1 += d * n1 / n
        if (n > 1) v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
      }
      at = at.filter(_._2 > t)
    }
    assert(out.getAs[Long]("o1") == o1.toLong)
    assert(out.getAs[Double]("e1") == r6(e1))
    assert(out.getAs[Double]("var_sum") == r6(v))
    assert(out.getAs[Double]("chi2_stat") ==
      r6((o1 - e1) * (o1 - e1) / v))
  }

  test("logRank: no deaths (everyone censored on the horizon) reports " +
    "the guarded zeros") {
    val rows = (1L to 6L).map(u => (u, "view", "2024-01-03 00:00:00",
      java.lang.Double.valueOf(1.0)))
    val out = InferenceAnalytics.logRank(ev(rows: _*)).collect().head
    assert(out.getAs[Long]("o1") == 0L)
    assert(out.getAs[Double]("chi2_stat") == 0.0)
    assert(out.getAs[Int]("reject_at_3841") == 0)
  }

  // ---- rmst -----------------------------------------------------------

  test("rmst: all-censored population retains everyone — RMST equals " +
    "tau at every horizon") {
    // every user spans day 1..day 1 and the horizon is day 1: all
    // censored at t=0, S=1 forever, so the integral is exactly tau
    val rows = (1L to 5L).map(u => (u, "view", "2024-01-01 00:00:00",
      java.lang.Double.valueOf(1.0)))
    val out = InferenceAnalytics.rmst(ev(rows: _*)).collect()
    assert(out.map(_.getAs[Long]("tau")).toSeq == Seq(7L, 14L, 21L, 28L))
    out.foreach { r =>
      assert(r.getAs[Double]("rmst") == r.getAs[Long]("tau").toDouble)
      assert(r.getAs[Double]("rmst_share") == 1.0)
    }
  }

  test("rmst: a single death step integrates the two-level curve " +
    "exactly") {
    // 4 users: 2 die at t=2 (last event day 3), 2 censored at t=4 (the
    // horizon, day 5). KM: S=1 on [0,2), drops to 0.5 at t=2.
    // RMST(7) = min(t_min,7) + S(2)*(4-2) + S(4)*(7-4)
    //   t_min=2 → 2*1 is the initial segment via least(t_min,tau)=2
    //           + 0.5*2 + 0.5*3 = 2 + 1 + 1.5 = 4.5
    val rows = Seq(
      (1L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (1L, "view", "2024-01-03 00:00:00", java.lang.Double.valueOf(1.0)),
      (2L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (2L, "view", "2024-01-03 00:00:00", java.lang.Double.valueOf(1.0)),
      (3L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (3L, "view", "2024-01-05 00:00:00", java.lang.Double.valueOf(1.0)),
      (4L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (4L, "view", "2024-01-05 00:00:00", java.lang.Double.valueOf(1.0)))
    val out = InferenceAnalytics.rmst(ev(rows: _*)).collect()
      .map(r => r.getAs[Long]("tau") -> r.getAs[Double]("rmst")).toMap
    assert(out(7L) == 4.5)
    assert(out(14L) == 2.0 + 0.5 * 2 + 0.5 * 10) // 2 + 1 + 5
  }

  // ---- cochranQ -------------------------------------------------------

  test("cochranQ: hand-computed statistic on a 4-user fixture") {
    // flags per user over (click,error,purchase,signup,view):
    // u1: click+view, u2: click, u3: click+purchase+view, u4: all five
    val rows = Seq(
      (1L, "click"), (1L, "view"),
      (2L, "click"),
      (3L, "click"), (3L, "purchase"), (3L, "view"),
      (4L, "click"), (4L, "error"), (4L, "purchase"), (4L, "signup"),
      (4L, "view"))
      .map { case (u, t) => (u, t, "2024-01-01 00:00:00",
        java.lang.Double.valueOf(1.0)) }
    val out = InferenceAnalytics.cochranQ(ev(rows: _*)).collect().head
    // C = (4,1,2,1,3), N=11, R=(2,1,3,5), ΣR²=39
    // Q = 4*(5*(16+1+4+1+9) − 121)/(5*11 − 39) = 4*(155−121)/16 = 8.5
    assert(out.getAs[Long]("n_blocks") == 4L)
    assert(out.getAs[Long]("c_click") == 4L)
    assert(out.getAs[Long]("n_total") == 11L)
    assert(out.getAs[Double]("q_stat") == 8.5)
    assert(out.getAs[Int]("reject_at_9488") == 0)
  }

  test("cochranQ: all-or-none users make the denominator vanish and " +
    "the guard reports 0") {
    val rows = (1L to 3L).flatMap(u => Seq("click", "error", "purchase",
      "signup", "view").map(t => (u, t, "2024-01-01 00:00:00",
      java.lang.Double.valueOf(1.0))))
    val out = InferenceAnalytics.cochranQ(ev(rows: _*)).collect().head
    assert(out.getAs[Double]("q_stat") == 0.0)
    assert(out.getAs[Int]("reject_at_9488") == 0)
  }

  // ---- friedman -------------------------------------------------------

  test("friedman: perfectly consistent priority ranking maximizes the " +
    "statistic") {
    // 4 nations × 5 priorities, order value strictly increasing in the
    // priority index in every nation: rank matrix is identical rows, so
    // R_j = n·j and Q hits its maximum n(k−1) = 16; no ties → corr = 1
    val cust = (1L to 4L).map(c => (c, c)).toDF("c_custkey", "c_nationkey")
    val orders = (1L to 4L).flatMap { n =>
      (1 to 5).map(p => (n * 10 + p, n,
        s"$p-PRIO", 100.0 * p + n)) // distinct values, same ordering
    }.toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    val out = InferenceAnalytics.friedman(orders, cust).collect().head
    assert(out.getAs[Long]("n_blocks") == 4L)
    assert(out.getAs[Double]("q_stat") == 16.0)
    assert(out.getAs[Double]("q_corrected") == 16.0)
    assert(out.getAs[Int]("reject_at_9488") == 1)
  }

  test("friedman: incomplete blocks are excluded") {
    val cust = Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey")
    // nation 1 has all 5 priorities, nation 2 only 2
    val orders = ((1 to 5).map(p => (10L + p, 1L, s"$p-P", p * 10.0)) ++
      (1 to 2).map(p => (20L + p, 2L, s"$p-P", p * 10.0)))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    val out = InferenceAnalytics.friedman(orders, cust).collect().head
    assert(out.getAs[Long]("n_blocks") == 1L)
  }

  // ---- krippendorffAlpha ----------------------------------------------

  test("krippendorffAlpha: perfect within-order agreement gives " +
    "alpha = 1") {
    val li = Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "B"), (2L, "B"),
      (3L, "A"), (3L, "A"))
      .toDF("l_orderkey", "l_returnflag")
    val out = InferenceAnalytics.krippendorffAlpha(li).collect().head
    assert(out.getAs[Long]("n_units") == 3L)
    assert(out.getAs[Long]("n_ratings") == 7L)
    assert(out.getAs[Double]("d_observed") == 0.0)
    assert(out.getAs[Double]("alpha") == 1.0)
    assert(out.getAs[Int]("reliable_at_0_8") == 1)
  }

  test("krippendorffAlpha: hand-computed mixed fixture, and " +
    "single-rating units are excluded") {
    // units: (A,A), (A,B), plus a 1-rating unit that must not count
    val li = Seq(
      (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "B"),
      (3L, "B"))
      .toDF("l_orderkey", "l_returnflag")
    val out = InferenceAnalytics.krippendorffAlpha(li).collect().head
    assert(out.getAs[Long]("n_units") == 2L)
    assert(out.getAs[Long]("n_ratings") == 4L)
    // o_agree = unit1: 2·1/1 = 2 (A); unit2: 0 → D_o = 1 − 2/4 = 0.5
    // n_A=3, n_B=1 → D_e = 1 − (3·2 + 1·0)/(4·3) = 0.5
    // alpha = 1 − 0.5/0.5 = 0
    assert(out.getAs[Double]("d_observed") == 0.5)
    assert(out.getAs[Double]("d_expected") == 0.5)
    assert(out.getAs[Double]("alpha") == 0.0)
  }

  // ---- aipwAte --------------------------------------------------------

  test("aipwAte: constant unit effect is recovered exactly by all three " +
    "estimators") {
    // one active-day cell (everyone 1 day), treated users (≥14 clicks)
    // purchase, controls don't: m1=1, m0=0, psi = 1 identically
    val rows = (1L to 10L).flatMap { u =>
      val treated = u <= 4
      val clicks = if (treated) (1 to 14).map(_ => (u, "click",
        "2024-01-01 00:10:00", java.lang.Double.valueOf(0.0))) else Seq()
      val base = Seq((u, "view", "2024-01-01 00:00:00",
        java.lang.Double.valueOf(0.0)))
      val buy = if (treated) Seq((u, "purchase", "2024-01-01 01:00:00",
        java.lang.Double.valueOf(9.0))) else Seq()
      base ++ clicks ++ buy
    }
    val out = InferenceAnalytics.aipwAte(ev(rows: _*)).collect().head
    assert(out.getAs[Long]("n_users") == 10L)
    assert(out.getAs[Long]("n_users_kept") == 10L)
    assert(out.getAs[Double]("ate_reg") == 1.0)
    assert(out.getAs[Double]("ate_ipw") == 1.0)
    assert(out.getAs[Double]("ate_aipw") == 1.0)
  }

  test("aipwAte: a no-overlap cell is dropped and accounted") {
    // cell x=1 (1 active day): mixed treated/control → kept;
    // cell x=2 (2 active days): all treated → dropped
    val rows =
      (1L to 4L).flatMap { u =>
        val treated = u <= 2
        Seq((u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(0.0))) ++
          (if (treated) (1 to 14).map(_ => (u, "click",
            "2024-01-01 00:10:00", java.lang.Double.valueOf(0.0)))
          else Seq())
      } ++
      (5L to 6L).flatMap { u =>
        Seq((u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(0.0)),
          (u, "view", "2024-01-02 00:00:00",
            java.lang.Double.valueOf(0.0))) ++
          (1 to 14).map(_ => (u, "click", "2024-01-01 00:10:00",
            java.lang.Double.valueOf(0.0)))
      }
    val out = InferenceAnalytics.aipwAte(ev(rows: _*)).collect().head
    assert(out.getAs[Long]("n_cells") == 2L)
    assert(out.getAs[Long]("n_cells_kept") == 1L)
    assert(out.getAs[Long]("n_users_kept") == 4L)
    assert(out.getAs[Long]("n_users_dropped") == 2L)
  }

  // ---- jelinekMercer ----------------------------------------------------

  test("jelinekMercer: hand-computed perplexity on a two-doc corpus, " +
    "nothing skipped") {
    // train doc 0: "a b a b" → c(a b)=2, c(b a)=1, c1(a)=2, c1(b)=1;
    // unigrams a:2 b:2, N=4. eval doc 9: "a b" → p = 0.7·(2/2) +
    // 0.3·(2/4) = 0.85
    val docs = Seq(
      (0L, "a b a b", "en", "s0", 7L),
      (9L, "a b", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ext.TextAnalysis.jelinekMercer(docs).collect().head
    assert(out.getAs[Long]("n_eval_bigrams") == 1L)
    assert(out.getAs[Long]("n_unseen_heads") == 0L)
    assert(out.getAs[Double]("avg_logprob") == r6(math.log(0.85)))
    assert(out.getAs[Double]("perplexity") ==
      r6(math.exp(-math.log(0.85))))
  }

  test("jelinekMercer: unseen head backs off to the train unigram " +
    "instead of being skipped") {
    // eval bigram "z b": head z unseen in training → p = 0.3·P_uni(b)
    val docs = Seq(
      (0L, "a b a b", "en", "s0", 7L),
      (9L, "z b", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ext.TextAnalysis.jelinekMercer(docs).collect().head
    assert(out.getAs[Long]("n_eval_bigrams") == 1L)
    assert(out.getAs[Long]("n_unseen_heads") == 1L)
    assert(out.getAs[Double]("avg_logprob") ==
      r6(math.log(0.3 * 0.5)))
  }

  // ---- Hilbert ----------------------------------------------------------

  test("Hilbert.withHilbert: order-1 curve visits the four quadrants in " +
    "the canonical order") {
    val df = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("xg", "yg")
    val out = graft.operators.Hilbert.withHilbert(df, "xg", "yg", 1, "h")
      .collect().map(r => (r.getAs[Long]("xg"), r.getAs[Long]("yg")) ->
        r.getAs[Long]("h")).toMap
    assert(out((0L, 0L)) == 0L)
    assert(out((0L, 1L)) == 1L)
    assert(out((1L, 1L)) == 2L)
    assert(out((1L, 0L)) == 3L)
  }

  test("Hilbert.withHilbert: bijective and neighbor-contiguous on the " +
    "full 16x16 grid") {
    val pts = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)
    val df = pts.toDF("xg", "yg")
    val out = graft.operators.Hilbert.withHilbert(df, "xg", "yg", 4, "h")
      .collect().map(r => r.getAs[Long]("h") ->
        (r.getAs[Long]("xg"), r.getAs[Long]("yg"))).toMap
    assert(out.keySet == (0L until 256L).toSet) // bijection onto 0..255
    // the defining Hilbert property: consecutive indices are GRID
    // NEIGHBORS (L1 distance exactly 1) — any rotation/reflection bug
    // in the walk breaks this within the first few steps
    (0L until 255L).foreach { d =>
      val (x1, y1) = out(d); val (x2, y2) = out(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  // ---- mannKendall ------------------------------------------------------

  test("mannKendall: strictly increasing series gives the closed-form " +
    "S, variance, Z, and a unit Sen slope") {
    val rows = (1 to 10).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(d.toDouble)))
    val out = InferenceAnalytics.mannKendall(ev(rows: _*)).collect().head
    assert(out.getAs[Long]("n_days") == 10L)
    assert(out.getAs[Long]("n_pairs") == 45L)
    assert(out.getAs[Long]("s_stat") == 45L)
    // no ties: Var = 10·9·25/18 = 125; Z = 44/sqrt(125)
    assert(out.getAs[Double]("var_s") == 125.0)
    assert(out.getAs[Double]("z_stat") == r6(44.0 / math.sqrt(125.0)))
    assert(out.getAs[Double]("sen_slope") == 1.0)
    assert(out.getAs[Int]("trend_at_196") == 1)
  }

  test("mannKendall: constant series is all ties — zero variance, " +
    "guarded zeros, no trend") {
    val rows = (1 to 8).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(7.0)))
    val out = InferenceAnalytics.mannKendall(ev(rows: _*)).collect().head
    assert(out.getAs[Long]("s_stat") == 0L)
    assert(out.getAs[Double]("var_s") == 0.0)
    assert(out.getAs[Double]("z_stat") == 0.0)
    assert(out.getAs[Double]("sen_slope") == 0.0)
    assert(out.getAs[Int]("trend_at_196") == 0)
  }

  // ---- tost -------------------------------------------------------------

  test("tost: hand-folded Welch machinery on known md5 buckets") {
    val uids = (1L to 20L)
    val rows = uids.map(u => (u, "purchase", "2024-01-01 00:00:00",
      java.lang.Double.valueOf(u.toDouble)))
    val out = InferenceAnalytics.tost(ev(rows: _*)).collect().head
    val arms = uids.groupBy(bucket)
    val a = arms(0L).map(_.toDouble); val b = arms(1L).map(_.toDouble)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    def variance(xs: Seq[Double]) = {
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      (sxx - sx * sx / xs.size) / (xs.size - 1)
    }
    val diff = mean(b) - mean(a)
    val delta = 0.05 * ((a.sum + b.sum) / uids.size)
    val se = math.sqrt(variance(a) / a.size + variance(b) / b.size)
    assert(out.getAs[Long]("users_a") == a.size.toLong)
    assert(out.getAs[Long]("users_b") == b.size.toLong)
    assert(out.getAs[Double]("diff") == r6(diff))
    assert(out.getAs[Double]("margin") == r6(delta))
    assert(out.getAs[Double]("t_lower") == r6((diff + delta) / se))
    assert(out.getAs[Double]("t_upper") == r6((delta - diff) / se))
  }

  test("tost: zero-variance arms take the guard path, not a division") {
    val rows = (1L to 8L).map(u => (u, "purchase", "2024-01-01 00:00:00",
      java.lang.Double.valueOf(10.0)))
    val out = InferenceAnalytics.tost(ev(rows: _*)).collect().head
    assert(out.getAs[Double]("se") == 0.0)
    assert(out.getAs[Int]("equivalent_at_1645") == 0)
  }

  // ---- chao1 / distributionDistances / charEntropy -----------------------

  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, txt, src) => (id, txt, "en", src, txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("chao1: count-of-count arithmetic on two hand fixtures") {
    val out = graft.ext.Curation.chao1(
      docs((1L, "a a b b c", "s1"), (2L, "a b c", "s2")))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // s1: counts a:2 b:2 c:1 → V=3 F1=1 F2=2 → chao1 = 3 + 0/6 = 3
    assert(out("s1").getAs[Long]("vocab") == 3L)
    assert(out("s1").getAs[Long]("f1") == 1L)
    assert(out("s1").getAs[Long]("f2") == 2L)
    assert(out("s1").getAs[Double]("chao1") == 3.0)
    // s2: all singletons → V=3 F1=3 F2=0 → chao1 = 3 + 6/2 = 6
    assert(out("s2").getAs[Double]("chao1") == 6.0)
    assert(out("s2").getAs[Double]("unseen_frac") == 0.5)
  }

  test("distributionDistances: a lone source equals the corpus — every " +
    "distance is zero and coverage is 1") {
    val out = graft.ext.Curation.distributionDistances(
      docs((1L, "a b b c", "only"))).collect().head
    assert(out.getAs[Double]("js_divergence") == 0.0)
    assert(out.getAs[Double]("hellinger") == 0.0)
    assert(out.getAs[Double]("total_variation") == 0.0)
    assert(out.getAs[Double]("coverage_q") == 1.0)
  }

  test("distributionDistances: disjoint equal halves hit the " +
    "closed-form TV and Hellinger") {
    val out = graft.ext.Curation.distributionDistances(
      docs((1L, "a a", "sa"), (2L, "b b", "sb")))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // p = {a:1}, q = {a:.5, b:.5}: TV = 0.5(|1-.5| + (1-.5)) = 0.5;
    // BC = sqrt(.5) → H = sqrt(1 - sqrt(.5)); covq = .5
    Seq("sa", "sb").foreach { s =>
      assert(out(s).getAs[Double]("total_variation") == 0.5)
      assert(out(s).getAs[Double]("hellinger") ==
        r6(math.sqrt(1.0 - math.sqrt(1.0 * 0.5))))
      assert(out(s).getAs[Double]("coverage_q") == 0.5)
      val js = out(s).getAs[Double]("js_divergence")
      assert(js > 0.0 && js < math.log(2.0))
    }
  }

  test("charEntropy: alternating two-char text matches the hand fold; " +
    "single-char text is zero everywhere") {
    val out = graft.ext.TextAnalysis.charEntropy(
      docs((1L, "abab", "alt"), (2L, "aaaa", "mono")))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val mono = out("mono")
    assert(mono.getAs[Long]("alphabet") == 1L)
    assert(mono.getAs[Double]("h_unigram") == 0.0)
    assert(mono.getAs[Double]("cond_entropy") == 0.0)
    assert(mono.getAs[Double]("redundancy") == 0.0) // guarded |Σ|=1
    val alt = out("alt")
    // unigrams a:2 b:2 → H1 = ln4 − (4·ln2)/4 = ln2;
    // bigrams ab:2 ba:1 → H2 = ln3 − (2·ln2)/3
    val h1 = math.log(4.0) - 4.0 * math.log(2.0) / 4.0
    val h2 = math.log(3.0) - 2.0 * math.log(2.0) / 3.0
    assert(alt.getAs[Double]("h_unigram") == r6(h1))
    assert(alt.getAs[Double]("h_bigram") == r6(h2))
    assert(alt.getAs[Double]("cond_entropy") == r6(h2 - h1))
  }

  test("char_ngrams: native expression emits overlapping grams in " +
    "order, empty under length n") {
    graft.plans.TextSketches.register(spark)
    val out = Seq(("abcd", 1L), ("x", 2L)).toDF("t", "id")
      .select(col("id"), graft.plans.TextSketches.char_ngrams(col("t"), 2)
        .as("g")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("ab", "bc", "cd"))
    assert(out(2L) == Seq())
  }

  // ---- mauveFrontier ------------------------------------------------------

  test("mauveFrontier: identical parity cohorts pin the frontier at " +
    "(1,1) for every lambda") {
    // vectors come in identical (even, odd) pairs → the two cohorts'
    // cluster histograms are equal → both KLs are exactly 0
    val rnd = new scala.util.Random(25002)
    val emb = (0L until 80L by 2L).flatMap { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat)
      Seq((i, v, 0), (i + 1L, v, 0))
    }.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.mauveFrontier(emb).collect()
    assert(out.length == 9)
    out.foreach { r =>
      assert(r.getAs[Double]("kl_p_m") == 0.0)
      assert(r.getAs[Double]("kl_q_m") == 0.0)
      assert(r.getAs[Double]("frontier_x") == 1.0)
      assert(r.getAs[Double]("frontier_y") == 1.0)
      assert(r.getAs[Long]("n_a") == 40L)
      assert(r.getAs[Long]("n_b") == 40L)
    }
  }

  test("mauveFrontier: divergent cohorts bend the frontier off the " +
    "corner, monotonically in lambda") {
    // even ids cluster near +e1, odd ids near -e1 → histograms disjoint
    val rnd = new scala.util.Random(25003)
    val emb = (0L until 80L).map { i =>
      val base = Array.fill(8)(0.05f * rnd.nextGaussian().toFloat)
      base(0) = if (i % 2 == 0) 1.0f else -1.0f
      (i, base, 0)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.mauveFrontier(emb).collect()
      .sortBy(_.getAs[Double]("lambda"))
    assert(out.forall(_.getAs[Double]("kl_p_m") > 0.0))
    // KL(p ‖ λp+(1−λ)q) shrinks as λ→1 (mixture approaches p)
    val klps = out.map(_.getAs[Double]("kl_p_m"))
    assert(klps.zip(klps.tail).forall { case (a, b) => b < a })
    val klqs = out.map(_.getAs[Double]("kl_q_m"))
    assert(klqs.zip(klqs.tail).forall { case (a, b) => b > a })
  }

  // ---- bhFdr --------------------------------------------------------------

  test("bhFdr: null data discovers nothing — every p is 1 and kmax " +
    "is 0") {
    val rows = (1L to 30L).flatMap(u => Seq("click", "error", "purchase",
      "signup", "view").map(t => (u, t, "2024-01-01 00:00:00",
      java.lang.Double.valueOf(1.0))))
    val out = InferenceAnalytics.bhFdr(ev(rows: _*)).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Double]("diff_obs") == 0.0)
      assert(r.getAs[Double]("p_value") == 1.0)
      assert(r.getAs[Int]("discovery_at_q10") == 0)
    }
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("bhFdr: a planted single-metric effect is the only discovery") {
    // clicks follow the REAL variant split exactly; other metrics are
    // constant → click's permutation tail is minimal, rest are p = 1
    val uids = (1L to 40L)
    val rows = uids.flatMap { u =>
      val heavy = bucket(u) == 1L
      Seq((u, "view", "2024-01-01 00:00:00",
        java.lang.Double.valueOf(1.0))) ++
        (if (heavy) (1 to 10).map(_ => (u, "click",
          "2024-01-01 00:05:00", java.lang.Double.valueOf(1.0)))
        else Seq())
    }
    val out = InferenceAnalytics.bhFdr(ev(rows: _*)).collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    assert(out("click").getAs[Double]("p_value") < 0.1)
    assert(out("click").getAs[Int]("discovery_at_q10") == 1)
    Seq("error", "purchase", "signup", "view").foreach { t =>
      assert(out(t).getAs[Int]("discovery_at_q10") == 0)
    }
  }

  // ---- PortableGamma / bayesAb / GEV / Greenwood / GST / AD ------------

  test("PortableGamma.lgamma: matches reference lgamma values to 1e-12") {
    import graft.analytics.PortableGamma
    // reference values from an independent libm (CPython math.lgamma)
    val ref = Seq(
      1.0 -> 0.0, 2.0 -> 0.0,
      0.9953 -> 0.0027311236547027384,
      5.5 -> 3.9578139676187165,
      10.0 -> 12.801827480081467)
    val df = ref.map(_._1).toDF("z")
      .select(col("z"), PortableGamma.lgamma(col("z")).as("lg"))
      .collect().map(r => r.getAs[Double]("z") -> r.getAs[Double]("lg"))
      .toMap
    ref.foreach { case (z, expect) =>
      assert(math.abs(df(z) - expect) < 1e-12, s"lgamma($z)")
    }
  }

  test("bayesAb: Beta(2,1) vs Beta(1,2) closed form P = 5/6") {
    // one non-converting user in arm A, one converting in arm B →
    // posteriors Beta(1,2) and Beta(2,1); P(B>A) integrates to 5/6
    val aUser = (1L to 50L).find(bucket(_) == 0L).get
    val bUser = (1L to 50L).find(bucket(_) == 1L).get
    val rows = Seq(
      (aUser, "purchase", "2024-01-01 00:00:00",
        java.lang.Double.valueOf(10.0)), // below the 90 threshold
      (bUser, "purchase", "2024-01-01 00:00:00",
        java.lang.Double.valueOf(100.0)))
    val out = InferenceAnalytics.bayesAb(ev(rows: _*)).collect().head
    assert(out.getAs[Long]("users_a") == 1L)
    assert(out.getAs[Long]("conv_a") == 0L)
    assert(out.getAs[Long]("conv_b") == 1L)
    assert(math.abs(out.getAs[Double]("prob_b_beats_a") - 5.0 / 6.0)
      < 1e-6)
  }

  test("bayesAb: a one-sided landslide is detected with high " +
    "probability") {
    val uids = (1L to 40L)
    val rows = uids.map { u =>
      val v = if (bucket(u) == 1L) 100.0 else 10.0
      (u, "purchase", "2024-01-01 00:00:00", java.lang.Double.valueOf(v))
    }
    val out = InferenceAnalytics.bayesAb(ev(rows: _*)).collect().head
    assert(out.getAs[Double]("prob_b_beats_a") > 0.999)
    assert(out.getAs[Int]("decide_b_at_95") == 1)
  }

  test("kmGreenwood: two-level curve carries the closed-form Greenwood " +
    "band") {
    // 4 users: 2 die at t=2, 2 censored at the t=4 horizon →
    // S(2) = 0.5, Var = S²·(2/(4·2)) → se = 0.25
    val rows = Seq(
      (1L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (1L, "view", "2024-01-03 00:00:00", java.lang.Double.valueOf(1.0)),
      (2L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (2L, "view", "2024-01-03 00:00:00", java.lang.Double.valueOf(1.0)),
      (3L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (3L, "view", "2024-01-05 00:00:00", java.lang.Double.valueOf(1.0)),
      (4L, "view", "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)),
      (4L, "view", "2024-01-05 00:00:00", java.lang.Double.valueOf(1.0)))
    val out = InferenceAnalytics.kmGreenwood(ev(rows: _*)).collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    val at2 = out(2L)
    assert(at2.getAs[Double]("s_km") == 0.5)
    assert(at2.getAs[Double]("se_greenwood") == 0.25)
    assert(at2.getAs[Double]("ci_lo") == r6(0.5 - 1.96 * 0.25))
    assert(at2.getAs[Double]("ci_hi") == r6(0.5 + 1.96 * 0.25))
    // censoring-only step: survival and band unchanged
    val at4 = out(4L)
    assert(at4.getAs[Double]("s_km") == 0.5)
    assert(at4.getAs[Double]("se_greenwood") == 0.25)
  }

  test("groupSequential: an overwhelming arm difference crosses the " +
    "first OBF boundary and latches the stop flag") {
    val uids = (1L to 40L)
    val rows = uids.zipWithIndex.map { case (u, i) =>
      val spend = if (bucket(u) == 1L) 1000.0 + (i % 2) else 1.0 + (i % 2)
      (u, "purchase", "2024-01-01 12:00:00",
        java.lang.Double.valueOf(spend))
    }
    val out = InferenceAnalytics.groupSequential(ev(rows: _*)).collect()
      .sortBy(_.getAs[Long]("week"))
    assert(out.length == 4)
    out.zipWithIndex.foreach { case (r, i) =>
      val k = i + 1
      assert(r.getAs[Double]("obf_bound") ==
        graft.analytics.ObfTables.boundary(4, k))
      assert(r.getAs[Int]("crossed") == 1)
      assert(r.getAs[Int]("stopped_by_now") == 1)
    }
    // non-default K values resolve their own tabled constant (the
    // round-9 ADVICE API fix: looks used to throw for anything but 4)
    val out3 = InferenceAnalytics
      .groupSequential(ev(rows: _*), looks = 3).collect()
      .sortBy(_.getAs[Long]("week"))
    assert(out3.length == 3)
    assert(out3.head.getAs[Double]("obf_bound") ==
      2.004 * math.sqrt(3.0))
    intercept[IllegalArgumentException] {
      graft.analytics.ObfTables.boundary(7, 1)
    }
  }

  test("andersonDarling: brute-force fold agrees, and separated " +
    "distributions reject") {
    // weekdays at ~10, weekends at ~1000 over 4 weeks: the pooled-rank
    // walk puts all weekday days first, which the brute force below
    // reproduces exactly
    val rows = (1 to 28).map { dd =>
      val date = java.time.LocalDate.of(2024, 1, dd)
      val wknd = date.getDayOfWeek.getValue >= 6
      val v = (if (wknd) 1000.0 else 10.0) + dd * 0.01 // unique values
      (1L, "view", f"2024-01-$dd%02d 00:00:00",
        java.lang.Double.valueOf(v))
    }
    val out = InferenceAnalytics.andersonDarling(ev(rows: _*))
      .collect().head
    // brute force on the same daily series
    val daily = rows.map { case (_, _, t, v) =>
      (t.take(10), math.floor(v.doubleValue * 100 + 0.5) / 100) }
    val wk = daily.map { case (dstr, x) =>
      val dow = java.time.LocalDate.parse(dstr).getDayOfWeek.getValue
      (x, if (dow >= 6) 1L else 0L)
    }.sortBy(_._1)
    val nn = wk.length; val m = wk.count(_._2 == 1L)
    val n = nn - m
    var mi = 0L; var ad = 0.0; var cvm = 0.0
    wk.zipWithIndex.foreach { case ((_, g), idx) =>
      val i = idx + 1
      mi += g
      if (i < nn)
        ad += math.pow(mi * nn - m.toLong * i, 2).toDouble /
          (i.toLong * (nn - i))
      val f = mi.toDouble / m - (i - mi).toDouble / n
      cvm += f * f
    }
    assert(out.getAs[Long]("n_weekday") == n.toLong)
    assert(out.getAs[Long]("n_weekend") == m.toLong)
    assert(math.abs(out.getAs[Double]("ad_stat") - ad / (n.toDouble * m))
      < 1e-6)
    assert(math.abs(out.getAs[Double]("cvm_stat") -
      cvm * (n.toDouble * m) / (nn.toDouble * nn)) < 1e-6)
    assert(out.getAs[Int]("ad_reject_at_2492") == 1)
    assert(out.getAs[Int]("cvm_reject_at_0461") == 1)
  }

  test("gevMaxima: PWM moments match a plain-Scala fold and the " +
    "fitted location sits near the block-maxima mass") {
    val rnd = new scala.util.Random(25004)
    val vals = (1 to 30).map(_ => 100.0 + rnd.nextDouble() * 50.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (1L, "view", f"2024-01-${i + 1}%02d 00:00:00",
        java.lang.Double.valueOf(v))
    }
    val out = InferenceAnalytics.gevMaxima(ev(rows: _*)).collect().head
    val xs = vals.sorted
    val n = xs.length
    val b0 = xs.sum / n
    val b1 = xs.zipWithIndex.map { case (x, j0) =>
      x * j0 / (n - 1.0) }.sum / n
    val b2 = xs.zipWithIndex.map { case (x, j0) =>
      x * (j0.toLong * (j0 - 1L)) / ((n - 1.0) * (n - 2.0)) }.sum / n
    assert(math.abs(out.getAs[Double]("b0") - b0) < 1e-4)
    assert(math.abs(out.getAs[Double]("b1") - b1) < 1e-4)
    assert(math.abs(out.getAs[Double]("b2") - b2) < 1e-4)
    val mu = out.getAs[Double]("mu")
    val sigma = out.getAs[Double]("sigma")
    assert(sigma > 0.0)
    assert(mu > xs.head && mu < xs.last) // location inside the sample
    assert(out.getAs[Double]("return_level_30") > mu)
  }

  test("gevMaxima: pinned return levels (independent libm-lgamma PWM " +
    "reference) on heavy- and bounded-tail fixtures") {
    // Reference values computed by an independent Python implementation
    // of the Hosking PWM fit + Hosking quantile x(F) = mu + s(1-y^k)/k
    // using math.lgamma (libm), NOT the shared Lanczos path. The
    // round-9 ADVICE bug (modern-xi quantile form with Hosking k)
    // yields 174.04 / 203.62 instead — far outside tolerance.
    def fixture(vals: Seq[Double]) = ev(vals.zipWithIndex.map {
      case (v, i) => (1L, "view", f"2024-01-${i + 1}%02d 00:00:00",
        java.lang.Double.valueOf(v))
    }: _*)
    // heavy tail: Frechet-ish inverse CDF (xi ~ 0.4, Hosking k < 0)
    val heavy = (1 to 30).map(i =>
      100.0 * math.pow(1.0 - i / 31.0, -0.4))
    val h = InferenceAnalytics.gevMaxima(fixture(heavy)).collect().head
    assert(math.abs(h.getAs[Double]("shape_k") - (-0.391541)) < 1e-4)
    assert(math.abs(h.getAs[Double]("sigma") - 27.317259) < 1e-3)
    assert(math.abs(h.getAs[Double]("mu") - 122.814042) < 1e-3)
    assert(math.abs(h.getAs[Double]("return_level_30") - 315.551287)
      < 1e-3)
    // bounded tail: uniform quantiles (Hosking k > 0) — the return
    // level must stay BELOW the finite upper endpoint mu + sigma/k
    // (171.542); the flipped form diverges past it (203.62).
    val bnd = (1 to 30).map(i => 100.0 + 50.0 * (i / 31.0))
    val b = InferenceAnalytics.gevMaxima(fixture(bnd)).collect().head
    val bk = b.getAs[Double]("shape_k")
    val bs = b.getAs[Double]("sigma")
    val bm = b.getAs[Double]("mu")
    assert(math.abs(bk - 0.284631) < 1e-4)
    assert(math.abs(b.getAs[Double]("return_level_30") - 151.804710)
      < 1e-3)
    assert(b.getAs[Double]("return_level_30") < bm + bs / bk)
  }

  // ---- wave 5: hazardRatio / nbFit / partialCorr / linCcc / enrichment --

  /** Plain-Scala Lanczos lgamma (same published coefficients, separate
    * code path through scala.math) for brute-force expectations. */
  private def lgRef(z: Double): Double = {
    val c = graft.analytics.PortableGamma.coefs
    var x = c(0)
    for (i <- 1 until c.length) x += c(i) / (z + i - 1)
    val t = z + 6.5
    0.5 * math.log(2 * math.Pi) + (z - 0.5) * math.log(t) - t +
      math.log(x)
  }

  test("hazardRatio: brute-force O/E fold on known buckets") {
    val horizon = "2024-01-05 00:00:00"
    val rows = (1L to 12L).flatMap { u =>
      if (u % 3 == 0L)
        Seq((u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)),
          (u, "view", "2024-01-03 00:00:00",
            java.lang.Double.valueOf(1.0)))
      else
        Seq((u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)))
    } :+ ((99L, "view", horizon, java.lang.Double.valueOf(1.0)))
    val out = InferenceAnalytics.hazardRatio(ev(rows: _*)).collect().head
    val lifes = (1L to 12L).map(u =>
      (bucket(u), if (u % 3 == 0L) 2L else 0L, false)) :+
      ((bucket(99L), 0L, true))
    var (o1, o0, e1, e0) = (0L, 0L, 0.0, 0.0)
    var at = lifes
    for (t <- lifes.map(_._2).distinct.sorted) {
      val n1 = at.count(_._1 == 1L).toDouble
      val n0 = at.count(_._1 == 0L).toDouble
      val deaths = at.filter(x => x._2 == t && !x._3)
      val d = deaths.length.toDouble
      if (d > 0) {
        o1 += deaths.count(_._1 == 1L); o0 += deaths.count(_._1 == 0L)
        e1 += d * n1 / (n1 + n0); e0 += d * n0 / (n1 + n0)
      }
      at = at.filter(_._2 > t)
    }
    assert(out.getAs[Long]("o1") == o1)
    assert(out.getAs[Long]("o0") == o0)
    assert(out.getAs[Double]("e1") == r6(e1))
    val hr = (o1 / e1) / (o0 / e0)
    assert(out.getAs[Double]("hazard_ratio") == r6(hr))
    val se = math.sqrt(1 / e1 + 1 / e0)
    assert(out.getAs[Double]("ci_lo") ==
      r6(math.exp(math.log(hr) - 1.96 * se)))
  }

  test("nbFit: overdispersed counts recover the MoM r/p and the " +
    "likelihoods match a plain-Scala fold") {
    // counts {1,1,5,5}: m = 3, v = 16/3 > m
    val orders = Seq(1L -> 1, 2L -> 1, 3L -> 5, 4L -> 5).flatMap {
      case (c, k) => (1 to k).map(i => (c * 100 + i, c)) }
      .toDF("o_orderkey", "o_custkey")
    val out = InferenceAnalytics.nbFit(orders).collect().head
    val m = 3.0; val v = 16.0 / 3.0
    assert(out.getAs[Double]("mean_count") == r6(m))
    assert(out.getAs[Double]("var_count") == r6(v))
    val r = m * m / (v - m); val p = r / (r + m)
    assert(out.getAs[Double]("nb_r") == r6(r))
    assert(out.getAs[Double]("nb_p") == r6(p))
    val counts = Seq(1.0, 1.0, 5.0, 5.0)
    val llp = counts.map(k =>
      k * math.log(m) - m - lgRef(k + 1)).sum
    val lln = counts.map(k => lgRef(k + r) - lgRef(r) - lgRef(k + 1) +
      r * math.log(p) + k * math.log(1 - p)).sum
    assert(math.abs(out.getAs[Double]("ll_poisson") - llp) < 1e-6)
    assert(math.abs(out.getAs[Double]("ll_nb") - lln) < 1e-6)
    assert(out.getAs[Int]("equidispersed") == 0)
  }

  test("nbFit: constant counts are equidispersed and take the guard " +
    "path") {
    val orders = (1L to 6L).flatMap(c => (1 to 3).map(i =>
      (c * 100 + i, c))).toDF("o_orderkey", "o_custkey")
    val out = InferenceAnalytics.nbFit(orders).collect().head
    assert(out.getAs[Double]("var_count") == 0.0)
    assert(out.getAs[Int]("equidispersed") == 1)
    assert(out.getAs[Double]("ll_nb") == 0.0)
    assert(out.getAs[Int]("prefer_nb_at_3841") == 0)
  }

  test("partialCorr: constant view counts make the partial collapse " +
    "to the raw correlation") {
    // y == x exactly, z constant: r_xy = 1, the z legs guard to 0,
    // partial = r_xy
    val rows = (1L to 10L).flatMap { u =>
      val k = (u % 5 + 1).toInt
      (1 to k).flatMap(_ => Seq(
        (u, "click", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)),
        (u, "purchase", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)))) ++
        Seq((u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)))
    }
    val out = InferenceAnalytics.partialCorr(ev(rows: _*)).collect().head
    assert(out.getAs[Double]("r_click_purchase") == 1.0)
    assert(out.getAs[Double]("r_click_view") == 0.0)
    assert(out.getAs[Double]("r_purchase_view") == 0.0)
    assert(out.getAs[Double]("r_partial_given_view") == 1.0)
  }

  test("partialCorr: clicks identical to views make the z-leg " +
    "degenerate and the guard reports 0") {
    // x == z: r_xz = 1 → pden = 0 → guarded partial
    val rnd = new scala.util.Random(25005)
    val rows = (1L to 10L).flatMap { u =>
      val k = (u % 4 + 1).toInt
      (1 to k).flatMap(_ => Seq(
        (u, "click", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)),
        (u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)))) ++
        (1 to rnd.nextInt(3)).map(_ => (u, "purchase",
          "2024-01-01 00:00:00", java.lang.Double.valueOf(1.0)))
    }
    val out = InferenceAnalytics.partialCorr(ev(rows: _*)).collect().head
    assert(out.getAs[Double]("r_click_view") == 1.0)
    assert(out.getAs[Double]("r_partial_given_view") == 0.0)
  }

  test("linCcc: a perfectly periodic week scores CCC = 1; a level " +
    "shift keeps Pearson at 1 but drops CCC") {
    def series(shift: Double) = (1 to 21).map { dd =>
      val base = 100.0 + 10.0 * (dd % 7)
      val v = if (dd > 14) base + shift else base
      (1L, "view", f"2024-01-$dd%02d 00:00:00",
        java.lang.Double.valueOf(v))
    }
    val perfect = InferenceAnalytics.linCcc(ev(series(0.0): _*))
      .collect().head
    assert(perfect.getAs[Double]("pearson") == 1.0)
    assert(perfect.getAs[Double]("lin_ccc") == 1.0)
    assert(perfect.getAs[Int]("substantial_at_0_9") == 1)
    val shifted = InferenceAnalytics.linCcc(ev(series(50.0): _*))
      .collect().head
    assert(shifted.getAs[Double]("lin_ccc") <
      shifted.getAs[Double]("pearson"))
  }

  test("termEnrichment: a term concentrated in one source tops the " +
    "report with the exact hypergeometric tail") {
    // corpus 10000 tokens across 20 docs in 10 sources; the rare term
    // 'zq' (10 occurrences) lives entirely in source s0 (1000 tokens)
    val filler = (1 to 490).map(i => s"w${i % 37}").mkString(" ")
    val docs = (0 until 20).map { i =>
      val src = s"s${i / 2}"
      val text =
        if (i == 0) (Seq.fill(10)("zq") ++ Seq.fill(490)("f")).mkString(" ")
        else filler + " " + (1 to 10).map(_ => "f").mkString(" ")
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ext.Curation.termEnrichment(docs).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("source") == "s0")
    assert(top.getAs[String]("token") == "zq")
    assert(top.getAs[Long]("k_obs") == 10L)
    assert(top.getAs[Long]("corpus_count") == 10L)
    assert(top.getAs[Double]("expected") == r6(1000.0 * 10.0 / 10000.0))
    // exact P(X ≥ 10) = Π_{j<10} (1000−j)/(10000−j) ≈ 1e-10 — below
    // the 6dp report rounding (p_enrich legitimately reports 0), which
    // is exactly what the −log10 column is for
    val pExact = (0 until 10).map(j =>
      (1000.0 - j) / (10000.0 - j)).product
    assert(top.getAs[Double]("p_enrich") == 0.0)
    assert(math.abs(top.getAs[Double]("neg_log10_p") -
      (-math.log10(pExact))) < 1e-4)
  }

  test("whiteningIsotropy: an anisotropic cloud is cured, and both " +
    "cosines match the brute-force pairwise mean") {
    // every vector = common direction + small noise → raw mean pairwise
    // cosine near 1; whitening subtracts the shared mean and rescales
    val rnd = new scala.util.Random(25006)
    val vecs = (0L until 24L).map { i =>
      val v = Array.tabulate(8)(d =>
        (2.0 + 0.05 * rnd.nextGaussian()) * (if (d == 0) 1.0f else 0.1f))
      (i, v.map(_.toFloat), 0)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.whiteningIsotropy(emb, dim = 8)
      .collect().head
    // brute force with the SAME conventions (population sd with the
    // 1e-12 floor; unnormalized pairwise mean over ordered pairs)
    val xs = vecs.map(_._2.map(_.toDouble))
    def meanCos(vs: Seq[Array[Double]]): Double = {
      val us = vs.map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
      val pairs = for (a <- us.indices; b <- us.indices if a < b)
        yield us(a).zip(us(b)).map { case (x, y) => x * y }.sum
      pairs.sum / pairs.size
    }
    val rawBf = meanCos(xs)
    assert(math.abs(out.getAs[Double]("mean_cosine_raw") - rawBf) < 1e-4)
    assert(rawBf > 0.9)
    val dimn = 8
    val mu = Array.tabulate(dimn)(d => xs.map(_(d)).sum / xs.size)
    val sd = Array.tabulate(dimn) { d =>
      val m2 = xs.map(v => v(d) * v(d)).sum / xs.size
      math.sqrt(math.max(m2 - mu(d) * mu(d), 1e-12))
    }
    val wBf = xs.map(v => Array.tabulate(dimn)(d => (v(d) - mu(d)) / sd(d)))
    val whiteBf = meanCos(wBf)
    assert(math.abs(out.getAs[Double]("mean_cosine_whitened") - whiteBf)
      < 1e-4)
    assert(out.getAs[Int]("whitening_helps") == 1)
  }

  test("tailDependence: comonotone tails are fully dependent, " +
    "antithetic tails are empty") {
    // y = x: both exceed together → lambda 1; y = -x: never joint
    val n = 100
    val co = (1 to n).map(i => (i.toLong, 1, i.toDouble, i.toDouble))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity")
    val outCo = InferenceAnalytics.tailDependence(co).collect().head
    assert(outCo.getAs[Double]("lambda_upper") == 1.0)
    assert(outCo.getAs[Int]("tail_dependent_at_2x") == 1)
    // threshold = 95th order stat = 95 → 5 exceedances
    assert(outCo.getAs[Long]("n_price_exceed") == 5L)
    assert(outCo.getAs[Long]("n_joint_exceed") == 5L)
    val anti = (1 to n).map(i => (i.toLong, 1, i.toDouble, -i.toDouble))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity")
    val outAnti = InferenceAnalytics.tailDependence(anti).collect().head
    assert(outAnti.getAs[Long]("n_joint_exceed") == 0L)
    assert(outAnti.getAs[Double]("lambda_upper") == 0.0)
  }

  test("recordCounts: a strictly increasing series is all records; a " +
    "constant one has exactly one") {
    val up = (1 to 12).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(d.toDouble)))
    val outUp = InferenceAnalytics.recordCounts(ev(up: _*)).collect().head
    assert(outUp.getAs[Long]("n_records") == 12L)
    val h1 = (1 to 12).map(1.0 / _).sum
    val h2 = (1 to 12).map(i => 1.0 / (i.toLong * i)).sum
    assert(outUp.getAs[Double]("expected_records") == r6(h1))
    assert(outUp.getAs[Double]("z_stat") ==
      r6((12.0 - h1) / math.sqrt(h1 - h2)))
    assert(outUp.getAs[Int]("drift_at_196") == 1)
    val flat = (1 to 12).map(d => (1L, "view",
      f"2024-01-$d%02d 00:00:00", java.lang.Double.valueOf(3.0)))
    val outFlat = InferenceAnalytics.recordCounts(ev(flat: _*))
      .collect().head
    assert(outFlat.getAs[Long]("n_records") == 1L)
    assert(outFlat.getAs[Int]("drift_at_196") == 0)
  }

  test("dieboldMariano: a perfectly periodic week makes snaive win " +
    "decisively") {
    // period-7 series: snaive error is 0 every day, naive error varies
    val rows = (1 to 28).map { dd =>
      (1L, "view", f"2024-01-$dd%02d 00:00:00",
        java.lang.Double.valueOf(100.0 + 10.0 * (dd % 7)))
    }
    val out = InferenceAnalytics.dieboldMariano(ev(rows: _*))
      .collect().head
    assert(out.getAs[Double]("mse_snaive") == 0.0)
    assert(out.getAs[Double]("mse_naive") > 0.0)
    assert(out.getAs[Double]("dm_stat") < -1.96)
    assert(out.getAs[Int]("snaive_better_at_196") == 1)
  }

  test("pinballLoss: constant positive error prices each tau linearly " +
    "and tau=0.5 is MAE/2") {
    // second week = first week + 5: err = +5 on every scored day
    val rows = (1 to 14).map { dd =>
      val v = 100.0 + (if (dd > 7) 5.0 else 0.0)
      (1L, "view", f"2024-01-$dd%02d 00:00:00",
        java.lang.Double.valueOf(v))
    }
    val out = InferenceAnalytics.pinballLoss(ev(rows: _*)).collect()
      .map(r => r.getAs[Double]("tau") -> r).toMap
    assert(out(0.1).getAs[Double]("pinball") == 0.5)
    assert(out(0.5).getAs[Double]("pinball") == 2.5)
    assert(out(0.9).getAs[Double]("pinball") == 4.5)
    assert(out(0.5).getAs[Double]("mae") == 5.0)
  }

  test("clusterValidity: two tight separated clusters match the " +
    "brute-force CH and DB") {
    // seeds 0 and 40 anchor opposite clusters; members hug their seed
    val rnd = new scala.util.Random(25007)
    val pts = (0L until 80L).map { i =>
      val side = if (i < 40L) 1.0 else -1.0
      val v = Array.tabulate(8)(d =>
        (if (d == 0) 10.0 * side else 0.0) + 0.1 * rnd.nextGaussian())
      (i, v)
    }
    val emb = pts.map { case (i, v) => (i, v.map(_.toFloat), 0) }
      .toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.clusterValidity(emb).collect().head
    // brute force with the same assignment rule (cosine argmax to seeds
    // 0 and 40) and the same W/B/s_k formulas
    val seeds = Seq(0L, 40L).map(i => pts(i.toInt)._2)
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val byC = pts.map { case (_, v) =>
      val sims = seeds.map(s => math.floor(cos(v, s) * 1e6 + 0.5) / 1e6)
      (if (sims(0) >= sims(1)) 0 else 1, v)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = pts.size
    def ssq(vs: Seq[Array[Double]]) = vs.map(_.map(x => x * x).sum).sum
    def sumv(vs: Seq[Array[Double]]) =
      Array.tabulate(8)(d => vs.map(_(d)).sum)
    val wks = byC.values.map { vs =>
      ssq(vs) - sumv(vs).map(x => x * x).sum / vs.size }.toSeq
    val w = wks.sum
    val gsum = sumv(pts.map(_._2))
    val bplus = byC.values.map(vs =>
      sumv(vs).map(x => x * x).sum / vs.size).sum
    val b = bplus - gsum.map(x => x * x).sum / n
    val ch = (b / (2 - 1)) / (w / (n - 2))
    assert(math.abs(out.getAs[Double]("calinski_harabasz") - ch) <
      1e-3 * ch)
    val sks = byC.values.map(vs => math.sqrt((ssq(vs) -
      sumv(vs).map(x => x * x).sum / vs.size) / vs.size)).toSeq
    val mus = byC.values.map(vs => sumv(vs).map(_ / vs.size)).toSeq
    val dij = math.sqrt(mus(0).zip(mus(1))
      .map { case (x, y) => (x - y) * (x - y) }.sum)
    val db = (sks(0) + sks(1)) / dij // both clusters share the one pair
    assert(math.abs(out.getAs[Double]("davies_bouldin") - db) <
      1e-3 * db + 1e-6)
    assert(out.getAs[Long]("n_clusters") == 2L)
    assert(out.getAs[Double]("calinski_harabasz") > 100.0) // separated
    assert(out.getAs[Long]("degenerate_pairs") == 0L)
  }

  test("clusterValidity: a single occupied cluster yields a guarded 0 " +
    "Davies-Bouldin, not null") {
    // only vec_ids 0..39 exist so seed 0 is the only centroid: the
    // pair frame is empty and the round-9 ADVICE null path is hit
    val rnd = new scala.util.Random(25008)
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d =>
        (1.0 + 0.01 * rnd.nextGaussian()).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.clusterValidity(emb).collect().head
    assert(out.getAs[Long]("n_clusters") == 1L)
    assert(!out.isNullAt(out.fieldIndex("davies_bouldin")))
    assert(out.getAs[Double]("davies_bouldin") == 0.0)
    assert(out.getAs[Long]("degenerate_pairs") == 0L)
  }

  test("Hilbert.skipStats3: equal file counts, and the curve layouts " +
    "dominate natural on the y-only predicate") {
    val rnd = new scala.util.Random(25001)
    val df = (1 to 4000).map(_ => (rnd.nextInt(10000).toLong,
      rnd.nextInt(500).toLong)).toDF("pk", "sk")
    val out = graft.operators.Hilbert
      .skipStats3(df, "pk", "sk", gridBits = 8, rowsPerFile = 256L)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val nf = out.values.map(_.getAs[Long]("n_files")).toSet
    assert(nf.size == 1) // same size-bounded cut for all three arms
    val natY = out("natural_x").getAs[Double]("skip_frac_y")
    assert(out("zorder").getAs[Double]("skip_frac_y") > natY)
    assert(out("hilbert").getAs[Double]("skip_frac_y") > natY)
    // the Hilbert walk never jumps, so its total envelope is no wider
    // than Morton's on the same cut
    assert(out("hilbert").getAs[Long]("sum_envelope_span") <=
      out("zorder").getAs[Long]("sum_envelope_span"))
  }
}
