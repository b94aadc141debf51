package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.{EventAnalytics, GraphAnalytics, StatsAnalytics}

/** Round-24-of-build additions: the LSH-bucketed bitext-mining scale
  * sibling + recall audit, deflated top-2 PCA, exact 1-Wasserstein
  * drift, GPD tail fit, Wald IV, sharp RDD, the Qini uplift curve,
  * position-based attribution, and closeness centrality. */
class Round24OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("bitextMineLsh: nBits=0 degenerates to the exact miner with " +
    "recall 1") {
    // zero hyperplanes -> every vector lands in bucket 0 -> the candidate
    // frame IS the full A×B frame -> mined pairs, sims, and margins must
    // equal bitextMine's bit-for-bit, and the audit must report itself
    // as perfect
    val rnd = new scala.util.Random(24001)
    val emb = (0L until 40L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val exact = graft.ext.Similarity.bitextMine(emb).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Double]("sim"), r.getAs[Double]("margin")))
    val lsh = graft.ext.Similarity.bitextMineLsh(emb, nBits = 0).collect()
    assert(lsh.nonEmpty)
    assert(lsh.map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
      r.getAs[Double]("sim"), r.getAs[Double]("margin"))).toSeq ==
      exact.toSeq)
    lsh.foreach { r =>
      assert(r.getAs[Long]("n_exact_pairs") == exact.length.toLong)
      assert(r.getAs[Double]("recall_vs_exact") == 1.0)
    }
  }

  test("bitextMineLsh: bucketing keeps sides/injectivity and the audit " +
    "columns are consistent with the exact miner") {
    val rnd = new scala.util.Random(24002)
    val emb = (0L until 60L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val exactPairs = graft.ext.Similarity.bitextMine(emb).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"))).toSet
    val out = graft.ext.Similarity.bitextMineLsh(emb, nBits = 2).collect()
    assert(out.nonEmpty)
    val srcs = out.map(_.getAs[Long]("src_id"))
    val dsts = out.map(_.getAs[Long]("dst_id"))
    assert(srcs.distinct.length == srcs.length)
    assert(dsts.distinct.length == dsts.length)
    assert(srcs.forall(_ % 2 == 0) && dsts.forall(_ % 2 == 1))
    val mined = out.map(r => (r.getAs[Long]("src_id"),
      r.getAs[Long]("dst_id"))).toSet
    val hits = mined.intersect(exactPairs).size
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact_pairs") == exactPairs.size.toLong)
      assert(r.getAs[Double]("recall_vs_exact") ==
        r6(hits.toDouble / exactPairs.size))
      assert(r.getAs[Double]("margin") > 0.0)
    }
  }

  // ---- pcaTop2 --------------------------------------------------------

  test("pcaTop2: axis-separable fixture recovers both principal axes") {
    // gram of {(±3,0), (0,±2)} is diag(18, 8): top eigenpair is axis 0
    // at λ=18, the deflated top is axis 1 at λ=8
    val emb = Seq(
      (1L, Array(3.0f, 0.0f)), (2L, Array(-3.0f, 0.0f)),
      (3L, Array(0.0f, 2.0f)), (4L, Array(0.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val r = graft.ext.Similarity.pcaTop2(emb, dim = 2).collect()
      .map(x => x.getAs[Long]("dim_id") -> x).toMap
    assert(r.size == 2)
    // first component concentrates on dim 0 (4 iters from all-ones
    // leave a tiny dim-1 residue), second on dim 1
    // 4 iterations from the all-ones start leave a small residue on
    // the off-axis (ratio contracts by λ1/λ2 = 2.25 per round)
    assert(math.abs(r(0L).getAs[Double]("loading_1")) > 0.98)
    assert(math.abs(r(1L).getAs[Double]("loading_2")) > 0.98)
    assert(math.abs(r(0L).getAs[Double]("eigenvalue_1") - 18.0) < 0.3)
    assert(math.abs(r(0L).getAs[Double]("eigenvalue_2") - 8.0) < 0.3)
    // near-orthogonality of the recovered pair
    val dot = (0L to 1L).map(j => r(j).getAs[Double]("loading_1") *
      r(j).getAs[Double]("loading_2")).sum
    assert(math.abs(dot) < 0.1)
    val ratio = r(0L).getAs[Double]("lambda_ratio")
    assert(ratio > 0.0 && ratio < 1.0)
  }

  // ---- wasserstein1 ---------------------------------------------------

  test("wasserstein1: degenerate single-value census is zero") {
    // every user has exactly 2 events -> one census row, no gap term
    val ev = (1L to 20L).flatMap(u => Seq(
      (u, ts("2024-01-01 10:00:00"), "view"),
      (u, ts("2024-01-01 11:00:00"), "click")))
      .toDF("user_id", "ts", "event_type")
    val r = StatsAnalytics.wasserstein1(ev).collect()(0)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 20L)
    assert(r.getAs[Double]("w1") == 0.0)
    assert(r.getAs[Double]("w1_normalized") == 0.0)
  }

  test("wasserstein1 == scala recompute over the hashed cohorts") {
    val ev = (1L to 40L).flatMap { u =>
      (0 until (1 + (u % 5)).toInt).map(i =>
        (u, ts(f"2024-01-01 ${10 + i}%02d:00:00"), "view")) }
      .toDF("user_id", "ts", "event_type")
    val per = ev.groupBy("user_id").agg(count(lit(1)).as("x"))
      .withColumn("g",
        graft.operators.Sampling.hashBucket(col("user_id"), 2)
          .cast("int"))
      .as[(Long, Long, Int)].collect().map { case (_, x, g) => (x, g) }
    val na = per.count(_._2 == 0).toDouble
    val nb = per.count(_._2 == 1).toDouble
    val xs = per.map(_._1).distinct.sorted
    var (cuma, cumb, w1) = (0.0, 0.0, BigDecimal(0))
    for (i <- xs.indices) {
      cuma += per.count(p => p._1 == xs(i) && p._2 == 0)
      cumb += per.count(p => p._1 == xs(i) && p._2 == 1)
      if (i + 1 < xs.length)
        w1 += BigDecimal(math.abs(cuma / na - cumb / nb) *
          (xs(i + 1) - xs(i)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val r = StatsAnalytics.wasserstein1(ev).collect()(0)
    assert(r.getAs[Long]("n_a") == na.toLong)
    assert(r.getAs[Long]("n_b") == nb.toLong)
    assert(r.getAs[Double]("w1") == r6(w1.toDouble))
  }

  // ---- gpdTail --------------------------------------------------------

  test("gpdTail: hand-traced PWM fit (xi = 0.2, sigma = 12)") {
    // top-4 of {100,90,80,70,60,50}: u = 70, excesses {0,10,20,30}
    // a0 = 15, a1 = (3·0 + 2·10 + 1·20 + 0·30)/12 = 10/3
    // xi = 2 − 15/(15 − 20/3) = 0.2; sigma = 2·15·(10/3)/(25/3) = 12
    val orders = Seq(100.0, 90.0, 80.0, 70.0, 60.0, 50.0)
      .toDF("o_totalprice")
    val r = StatsAnalytics.gpdTail(orders, k = 3).collect()(0)
    assert(r.getAs[Long]("n_excesses") == 4L)
    assert(r.getAs[Double]("threshold") == 70.0)
    assert(r.getAs[Double]("mean_excess") == 15.0)
    assert(r.getAs[Double]("shape_xi") == 0.2)
    assert(r.getAs[Double]("scale_sigma") == 12.0)
  }

  // ---- waldIv ---------------------------------------------------------

  test("waldIv: hand-traced LATE with a real first stage") {
    // z = morning-first; t = clicks >= 2
    //   u1 z=1 t=1 y=100 ; u2 z=1 t=0 y=0
    //   u3 z=0 t=1 y=40  ; u4 z=0 t=1 y=20
    // ybar: 50 vs 30; tbar: 0.5 vs 1.0 -> fs = −0.5, late = 20/−0.5
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), "click", None),
      (1L, ts("2024-01-01 08:10:00"), "click", None),
      (1L, ts("2024-01-01 12:00:00"), "purchase", Some(100.0)),
      (2L, ts("2024-01-01 09:00:00"), "view", None),
      (3L, ts("2024-01-01 15:00:00"), "click", None),
      (3L, ts("2024-01-01 15:10:00"), "click", None),
      (3L, ts("2024-01-01 16:00:00"), "purchase", Some(40.0)),
      (4L, ts("2024-01-01 16:00:00"), "click", None),
      (4L, ts("2024-01-01 16:10:00"), "click", None),
      (4L, ts("2024-01-01 17:00:00"), "purchase", Some(20.0)))
      .toDF("user_id", "ts", "event_type", "value")
    val r = StatsAnalytics.waldIv(ev, clickSplit = 2L).collect()(0)
    assert(r.getAs[Long]("n_z1") == 2L && r.getAs[Long]("n_z0") == 2L)
    assert(r.getAs[Double]("y_mean_z1") == 50.0)
    assert(r.getAs[Double]("y_mean_z0") == 30.0)
    assert(r.getAs[Double]("first_stage") == -0.5)
    assert(r.getAs[Int]("weak_instrument") == 0)
    assert(r.getAs[Double]("wald_late") == -40.0)
  }

  test("waldIv: degenerate instrument arm reports zeros and the flag") {
    // every user is morning-first -> z = 0 arm empty
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), "click", Some(1.0)),
      (2L, ts("2024-01-01 09:00:00"), "view", None))
      .toDF("user_id", "ts", "event_type", "value")
    val r = StatsAnalytics.waldIv(ev, clickSplit = 1L).collect()(0)
    assert(r.getAs[Long]("n_z0") == 0L)
    assert(r.getAs[Int]("weak_instrument") == 1)
    assert(r.getAs[Double]("wald_late") == 0.0)
    assert(r.getAs[Double]("first_stage") == 0.0)
  }

  // ---- rdd ------------------------------------------------------------

  test("rdd: hand-traced two-point local lines and jump") {
    // left (−40, .10), (−10, .04): alpha .02, slope −.002
    // right (10, .05), (40, .08): alpha .04, slope .001 -> tau .02
    val orders = Seq((1L, 60.0), (2L, 90.0), (3L, 110.0), (4L, 140.0),
      (5L, 500.0)).toDF("o_orderkey", "o_totalprice")
    val lineitem = Seq((1L, 0.10), (2L, 0.04), (3L, 0.05), (4L, 0.08),
      (5L, 0.99)).toDF("l_orderkey", "l_discount")
    val r = StatsAnalytics.rdd(orders, lineitem,
      cutoff = 100.0, bandwidth = 50.0).collect()(0)
    assert(r.getAs[Long]("n_left") == 2L && r.getAs[Long]("n_right") == 2L)
    assert(r.getAs[Double]("alpha_left") == 0.02)
    assert(r.getAs[Double]("alpha_right") == 0.04)
    assert(r.getAs[Double]("slope_left") == -0.002)
    assert(r.getAs[Double]("slope_right") == 0.001)
    assert(r.getAs[Double]("tau_jump") == 0.02)
  }

  // ---- qiniCurve ------------------------------------------------------

  test("qiniCurve == scala recompute over the hashed variants") {
    val ev = (1L to 30L).flatMap { u =>
      val clicks = (0 until (u % 4).toInt).map(i =>
        (u, ts(f"2024-01-02 ${10 + i}%02d:00:00"), "click"))
      val buy = if (u % 3 == 0)
        Seq((u, ts("2024-01-02 20:00:00"), "purchase")) else Nil
      clicks ++ buy ++ Seq((u, ts("2024-01-02 09:00:00"), "view")) }
      .toDF("user_id", "ts", "event_type")
    val per = ev.groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("s"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("g",
        graft.operators.Sampling.hashBucket(col("user_id"), 2)
          .cast("int"))
      .as[(Long, Long, Long, Int)].collect()
      .map { case (_, s, y, g) => (s, y, g) }
    val out = StatsAnalytics.qiniCurve(ev).collect()
    val cutoffs = per.map(_._1).distinct.sorted.reverse
    assert(out.map(_.getAs[Long]("score_cutoff")).toSeq == cutoffs.toSeq)
    for (row <- out) {
      val c = row.getAs[Long]("score_cutoff")
      val above = per.filter(_._1 >= c)
      val nt = above.count(_._3 == 1).toLong
      val nc = above.count(_._3 == 0).toLong
      val ct = above.filter(_._3 == 1).map(_._2).sum
      val cc = above.filter(_._3 == 0).map(_._2).sum
      assert(row.getAs[Long]("n_treated") == nt)
      assert(row.getAs[Long]("n_control") == nc)
      if (nt > 0 && nc > 0) {
        assert(row.getAs[Double]("uplift_rate") ==
          r6(ct.toDouble / nt - cc.toDouble / nc))
        assert(row.getAs[Double]("qini") ==
          r6(ct.toDouble - cc.toDouble * nt / nc))
      } else {
        assert(row.getAs[Double]("qini") == 0.0)
      }
    }
  }

  // ---- positionAttribution -------------------------------------------

  test("positionAttribution: hand-traced U-shape, single, and direct") {
    // u1: view, click, view -> purchase 100: 40/20/40 -> view 80, click 20
    // u2: touchless purchase 50 -> direct
    // u3: single click -> purchase 10: click takes all 10
    val ev = Seq(
      (1L, "e1", ts("2024-01-01 10:00:00"), "view", None),
      (1L, "e2", ts("2024-01-01 10:05:00"), "click", None),
      (1L, "e3", ts("2024-01-01 10:10:00"), "view", None),
      (1L, "p1", ts("2024-01-01 11:00:00"), "purchase", Some(100.0)),
      (2L, "p2", ts("2024-01-01 10:00:00"), "purchase", Some(50.0)),
      (3L, "e4", ts("2024-01-01 09:00:00"), "click", None),
      (3L, "p3", ts("2024-01-01 09:30:00"), "purchase", Some(10.0)))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = EventAnalytics.positionAttribution(ev).collect()
      .map(x => x.getAs[String]("channel") ->
        (x.getAs[Long]("n_purchases"), x.getAs[Long]("n_touches"),
          x.getAs[Double]("credit"))).toMap
    assert(r == Map(
      "view" -> ((1L, 2L, 80.0)),
      "click" -> ((2L, 2L, 30.0)),
      "direct" -> ((1L, 1L, 50.0))))
  }

  test("positionAttribution: two-touch path splits 50/50") {
    val ev = Seq(
      (1L, "e1", ts("2024-01-01 10:00:00"), "view", None),
      (1L, "e2", ts("2024-01-01 10:05:00"), "click", None),
      (1L, "p1", ts("2024-01-01 11:00:00"), "purchase", Some(100.0)))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = EventAnalytics.positionAttribution(ev).collect()
      .map(x => x.getAs[String]("channel") -> x.getAs[Double]("credit"))
      .toMap
    assert(r == Map("view" -> 50.0, "click" -> 50.0))
  }

  // ---- nelsonAalen ----------------------------------------------------

  test("nelsonAalen: hand-traced hazard accumulation and censoring") {
    // horizon = day2. u1: day1 only -> death at t=0; u3: day2 only ->
    // censored at t=0; u2: day1..day2 -> censored at t=1
    // t=0: n_risk 3, d 1, c 1 -> H = 1/3 ; t=1: n_risk 1, d 0, c 1
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-02 10:00:00")))
      .toDF("user_id", "ts")
    val r = StatsAnalytics.nelsonAalen(ev).collect()
      .map(x => x.getAs[Long]("t") ->
        (x.getAs[Long]("n_risk"), x.getAs[Long]("d"), x.getAs[Long]("c"),
          x.getAs[Double]("h_na"), x.getAs[Double]("s_breslow"))).toMap
    val h = BigDecimal(1.0 / 3)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0L) == ((3L, 1L, 1L, r6(h), r6(math.exp(-h)))))
    assert(r(1L) == ((1L, 0L, 1L, r6(h), r6(math.exp(-h)))))
  }

  // ---- grangerLag1 ----------------------------------------------------

  test("grangerLag1 == scala recompute on a seeded series") {
    val rnd = new scala.util.Random(24003)
    val days = (0 until 20).map { t =>
      val clicks = 1 + rnd.nextInt(5)
      val value = 50.0 + 10.0 * rnd.nextInt(8)
      (t, clicks, value)
    }
    val ev = days.flatMap { case (t, clicks, value) =>
      val day = f"2024-01-${t + 1}%02d"
      (0 until clicks).map(i =>
        (1L + i, ts(s"$day 10:0$i:00"), "click", None)) :+
        ((99L, ts(s"$day 12:00:00"), "purchase", Some(value)))
    }.toDF("user_id", "ts", "event_type", "value")
    // recompute with the engine's quantization: per-day y is the 2dp
    // rounded decimal sum (exact here), lags on the day order, moments
    // as 12dp-quantized products summed exactly
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val y = days.map(_._3)
    val x = days.map(_._2.toDouble)
    val yy = y.drop(1); val u = y.dropRight(1); val v = x.dropRight(1)
    val n = yy.length
    val sy = yy.map(q12).sum.toDouble / n
    val su = u.map(q12).sum.toDouble / n
    val sv = v.map(q12).sum.toDouble / n
    def mom(a: Seq[Double], am: Double, b: Seq[Double], bm: Double) =
      a.zip(b).map { case (ai, bi) => q12((ai - am) * (bi - bm)) }
        .sum.toDouble
    val (suu, svv, suv) = (mom(u, su, u, su), mom(v, sv, v, sv),
      mom(u, su, v, sv))
    val (suy, svy, syy) = (mom(u, su, yy, sy), mom(v, sv, yy, sy),
      mom(yy, sy, yy, sy))
    val det = suu * svv - suv * suv
    val b = (svv * suy - suv * svy) / det
    val c = (suu * svy - suv * suy) / det
    val rssU = syy - b * suy - c * svy
    val rssR = syy - suy * suy / suu
    val f = (rssR - rssU) * (n - 3.0) / rssU
    val r = StatsAnalytics.grangerLag1(ev).collect()(0)
    assert(r.getAs[Long]("n_obs") == n.toLong)
    assert(r.getAs[Double]("beta_y_lag") == r6(b))
    assert(r.getAs[Double]("beta_x_lag") == r6(c))
    assert(r.getAs[Double]("f_stat") == r6(f))
    assert(r.getAs[Int]("granger_at_f420") == (if (f > 4.20) 1 else 0))
  }

  test("grangerLag1: constant regressor degenerates to zeros") {
    // x constant -> svv = 0 -> det = 0 -> ok false
    val ev = (0 until 6).flatMap { t =>
      val day = f"2024-01-${t + 1}%02d"
      Seq((1L, ts(s"$day 10:00:00"), "click", None),
        (2L, ts(s"$day 12:00:00"), "purchase", Some(10.0 * (t + 1))))
    }.toDF("user_id", "ts", "event_type", "value")
    val r = StatsAnalytics.grangerLag1(ev).collect()(0)
    assert(r.getAs[Double]("f_stat") == 0.0)
    assert(r.getAs[Int]("granger_at_f420") == 0)
    assert(r.getAs[Double]("beta_x_lag") == 0.0)
  }

  // ---- periodogram ----------------------------------------------------

  test("periodogram: a planted weekly cycle dominates every other " +
    "period") {
    // 28 days of v(t) = 100 + 50·cos(2πt/7): four exact weekly cycles
    val ev = (0 until 28).map { t =>
      val day = t + 1
      (1L, ts(f"2024-01-$day%02d 12:00:00"), "purchase",
        Some(100.0 + 50.0 * math.cos(2.0 * math.Pi * t / 7.0)))
    }.toDF("user_id", "ts", "event_type", "value")
    val r = StatsAnalytics.periodogram(ev).collect()
      .map(x => x.getAs[Long]("period") -> x.getAs[Double]("power"))
      .toMap
    assert(r.size == 13)
    val p7 = r(7L)
    // analytic power: (50·n/2)²/n = 2500·28/4 = 17500
    assert(math.abs(p7 - 17500.0) < 1.0)
    // incommensurate periods carry real spectral leakage over a 28-day
    // window (measured max ≈ p7/2.7) — assert dominance, not silence
    r.filter(_._1 != 7L).values.foreach(p => assert(p7 > 2.0 * p))
  }

  // ---- doremiStep -----------------------------------------------------

  test("doremiStep: high-excess source upweights; weights renormalize") {
    // source A "a a b" (n=3), source B "a b b b" (n=4);
    // corpus a:3 b:4 total 7 — recompute with the engine quantization
    val docs = Seq((1L, "A", "a a b"), (2L, "B", "a b b b"))
      .toDF("doc_id", "source", "text")
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def kl(terms: Seq[(Long, Long)], ns: Long): Double = {
      val raw = terms.map { case (n, ct) =>
        q12((n.toDouble / ns) *
          math.log((n.toDouble * 7) / (ns.toDouble * ct))) }.sum.toDouble
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val klA = kl(Seq((2L, 3L), (1L, 4L)), 3L)
    val klB = kl(Seq((1L, 3L), (3L, 4L)), 4L)
    val w0A = 3.0 / 7; val w0B = 4.0 / 7
    val rawA = w0A * math.exp(1.0 * klA)
    val rawB = w0B * math.exp(1.0 * klB)
    val z = (q12(rawA) + q12(rawB)).toDouble
    val r = graft.ext.Curation.doremiStep(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Double]("excess_loss"), x.getAs[Double]("weight_before"),
          x.getAs[Double]("weight_after"))).toMap
    assert(r("A") == ((klA, r6(w0A), r6(rawA / z))))
    assert(r("B") == ((klB, r6(w0B), r6(rawB / z))))
    // a proper distribution, and the higher-excess source gained share
    assert(math.abs(r("A")._3 + r("B")._3 - 1.0) < 2e-6)
    val gained = if (klA > klB) "A" else "B"
    assert(r(gained)._3 > r(gained)._2 - 1e-9)
  }

  // ---- dirichletQL ----------------------------------------------------

  test("dirichletQL: hand-traced smoothing, ranking, and zero-hit doc") {
    // mu=8; collection: table:3 join:1 spark:1, total 8 tokens
    // d1 "table join": ln(.4)+ln(.2)+ln(.1)
    // d2 "table table spark x": ln(5/12)+ln(1/12)+ln(2/12)
    // d3 "nothing here": ln(.3)+ln(.1)+ln(.1), zero hits
    val docs = Seq((1L, "table join"), (2L, "table table spark x"),
      (3L, "nothing here")).toDF("doc_id", "text")
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def score(parts: Seq[Double]): Double = BigDecimal(
      parts.map(p => q12(math.log(p))).sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = score(Seq((1 + 8.0 * 3 / 8) / 10, (1 + 8.0 * 1 / 8) / 10,
      (0 + 8.0 * 1 / 8) / 10))
    val s2 = score(Seq((2 + 8.0 * 3 / 8) / 12, (0 + 8.0 * 1 / 8) / 12,
      (1 + 8.0 * 1 / 8) / 12))
    val s3 = score(Seq((0 + 8.0 * 3 / 8) / 10, (0 + 8.0 * 1 / 8) / 10,
      (0 + 8.0 * 1 / 8) / 10))
    val r = graft.ext.TextAnalysis.dirichletQL(docs, mu = 8.0)
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Double]("ql_score"),
        x.getAs[Long]("n_terms_hit")))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(r(0)._2 == s1 && r(1)._2 == s2 && r(2)._2 == s3)
    assert(r(0)._3 == 2L && r(1)._3 == 2L && r(2)._3 == 0L)
  }

  // ---- eValue ---------------------------------------------------------

  test("eValue: hand-traced 2x2 risk ratio and E-value") {
    // exposed (clicked): 3 purchasers + 1 not; unexposed: 1 + 3
    // p1 = 3/4, p0 = 1/4 -> RR = 3, E = 3 + sqrt(6)
    val ev = (Seq(
      (1L, "click"), (1L, "purchase"), (2L, "click"), (2L, "purchase"),
      (3L, "click"), (3L, "purchase"), (4L, "click"),
      (5L, "purchase"), (6L, "view"), (7L, "view"), (8L, "view"))
      .map { case (u, t) => (u, ts("2024-01-01 10:00:00"), t) })
      .toDF("user_id", "ts", "event_type")
    val r = StatsAnalytics.eValue(ev, clickSplit = 1L).collect()(0)
    assert(r.getAs[Long]("n_exp_pos") == 3L)
    assert(r.getAs[Long]("n_exp_neg") == 1L)
    assert(r.getAs[Long]("n_unexp_pos") == 1L)
    assert(r.getAs[Long]("n_unexp_neg") == 3L)
    assert(r.getAs[Double]("risk_ratio") == 3.0)
    assert(r.getAs[Double]("e_value") == r6(3.0 + math.sqrt(6.0)))
  }

  test("eValue: protective exposure inverts the ratio for E") {
    // exposed purchase LESS: p1 = 1/4, p0 = 3/4 -> RR = 1/3,
    // RR* = 3 -> same E as the harmful direction
    val ev = (Seq(
      (1L, "click"), (1L, "purchase"), (2L, "click"), (3L, "click"),
      (4L, "click"),
      (5L, "purchase"), (6L, "purchase"), (7L, "purchase"), (8L, "view"))
      .map { case (u, t) => (u, ts("2024-01-01 10:00:00"), t) })
      .toDF("user_id", "ts", "event_type")
    val r = StatsAnalytics.eValue(ev, clickSplit = 1L).collect()(0)
    assert(r.getAs[Double]("risk_ratio") == r6((1.0 / 4) / (3.0 / 4)))
    assert(r.getAs[Double]("e_value") == r6(3.0 + math.sqrt(6.0)))
  }

  // ---- infoGainRanking ------------------------------------------------

  test("infoGainRanking: perfect and useless features rank correctly") {
    // purchases at hour 13 with value 150; views at hour 2, no value;
    // all on one day: hour_q / value_band / has_value are PERFECT
    // (ig_ratio 1), dow is useless (single cell, ig 0)
    val ev = Seq(
      (1L, ts("2024-01-01 13:00:00"), "purchase", Some(150.0)),
      (2L, ts("2024-01-01 13:30:00"), "purchase", Some(150.0)),
      (3L, ts("2024-01-01 02:00:00"), "view", None),
      (4L, ts("2024-01-01 02:30:00"), "view", None))
      .toDF("user_id", "ts", "event_type", "value")
    val r = StatsAnalytics.infoGainRanking(ev).collect()
      .map(x => x.getAs[String]("feature") ->
        (x.getAs[Double]("h_label"), x.getAs[Double]("info_gain"),
          x.getAs[Double]("ig_ratio"))).toMap
    assert(r.keySet ==
      Set("hour_q", "dow", "value_band", "has_value"))
    r.values.foreach(v => assert(math.abs(v._1 - math.log(2.0)) < 1e-6))
    assert(r("dow")._2 == 0.0 && r("dow")._3 == 0.0)
    for (f <- Seq("hour_q", "value_band", "has_value")) {
      assert(r(f)._2 == r(f)._1, f) // IG = H(label): fully informative
      assert(r(f)._3 == 1.0, f)
    }
  }

  // ---- overdispersion -------------------------------------------------

  test("overdispersion: flat segment vs clumped segment") {
    // S: counts 1,1,1,1 -> var 0, disp 0; T: counts 1,9 -> mean 5,
    // var 32, disp 6.4, chi2 6.4, flagged
    val orders = (Seq.fill(1)(1L) ++ Seq.fill(1)(2L) ++ Seq.fill(1)(3L) ++
      Seq.fill(1)(4L) ++ Seq.fill(1)(5L) ++ Seq.fill(9)(6L))
      .toDF("o_custkey")
    val customer = Seq((1L, "S"), (2L, "S"), (3L, "S"), (4L, "S"),
      (5L, "T"), (6L, "T")).toDF("c_custkey", "c_mktsegment")
    val r = StatsAnalytics.overdispersion(orders, customer).collect()
      .map(x => x.getAs[String]("segment") ->
        (x.getAs[Long]("n"), x.getAs[Double]("mean_count"),
          x.getAs[Double]("var_count"), x.getAs[Double]("dispersion"),
          x.getAs[Double]("chi2_stat"),
          x.getAs[Int]("overdispersed_at_1_5"))).toMap
    assert(r("S") == ((4L, 1.0, 0.0, 0.0, 0.0, 0)))
    assert(r("T") == ((2L, 5.0, 32.0, 6.4, 6.4, 1)))
  }

  // ---- raking ---------------------------------------------------------

  test("raking: round 2 fits column margins exactly; residuals " +
    "reconcile") {
    // two days (different weekdays), two types, skewed counts
    val ev = (Seq.fill(30)(("2024-01-01", "view")) ++
      Seq.fill(10)(("2024-01-01", "click")) ++
      Seq.fill(10)(("2024-01-02", "view")) ++
      Seq.fill(10)(("2024-01-02", "click")))
      .zipWithIndex
      .map { case ((day, t), i) => (i.toLong, ts(s"$day 10:00:00"), t) }
      .toDF("user_id", "ts", "event_type")
    val out = StatsAnalytics.raking(ev).collect()
      .map(x => (x.getAs[Int]("dow"), x.getAs[String]("event_type"),
        x.getAs[Long]("n"), x.getAs[Double]("raked_weight"),
        x.getAs[Double]("row_margin_residual")))
    assert(out.length == 4)
    val total = 60.0
    // column margins exact after the column-fitting round
    for (t <- Seq("view", "click")) {
      val cs = out.filter(_._2 == t).map(_._4).sum
      assert(math.abs(cs - total / 2) < 1e-5, s"$t -> $cs")
    }
    // weights stay a reweighting of the same mass
    assert(math.abs(out.map(_._4).sum - total) < 1e-5)
    // published row residual equals the recomputed row drift
    for (dw <- out.map(_._1).distinct) {
      val rs = out.filter(_._1 == dw).map(_._4).sum
      val resid = out.filter(_._1 == dw).map(_._5).head
      assert(math.abs((rs - total / 2) - resid) < 1e-5)
    }
  }

  // ---- luhnAudit ------------------------------------------------------

  test("luhnAudit: known-valid and corrupted card numbers") {
    // 4539148803436467 is Luhn-valid; flipping the last digit breaks it
    val rows = Seq(
      ("A", "card 4539148803436467 end"),
      ("A", "id 4539148803436468"),
      ("B", "no digits here"))
      .toDF("source", "text")
    val r = graft.ext.Curation.luhnAudit(rows).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_candidates"), x.getAs[Long]("n_luhn_valid"),
          x.getAs[Double]("valid_rate"))).toMap
    assert(r == Map("A" -> ((2L, 1L, 0.5))))
  }

  // ---- closeness ------------------------------------------------------

  test("closenessOf: hand graph distances, closeness, harmonic") {
    // edges: 0-1, 0-2, 0-3, 3-4, 4-5; degrees 0:3, 3:2, 4:2, rest 1
    // seeds (k=2, deg desc then id): {0, 3}
    // from 0: d = 1,1,1,2,3 -> sum 8, harmonic 1+1+1+1/2+1/3
    // from 3: d = 1,1,2,2,2 -> sum 8, harmonic 1+1+3/2
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val sym = pairs.unionAll(pairs.select(col("b").as("a"),
      col("a").as("b")))
    val r = GraphAnalytics.closenessOf(sym, k = 2, rounds = 4).collect()
      .map(x => x.getAs[Long]("src") ->
        (x.getAs[Long]("n_reached"), x.getAs[Long]("sum_dist"),
          x.getAs[Double]("closeness"),
          x.getAs[Double]("harmonic_centrality"))).toMap
    assert(r.keySet == Set(0L, 3L))
    assert(r(0L)._1 == 5L && r(0L)._2 == 8L)
    assert(r(0L)._3 == 0.625)
    assert(r(0L)._4 == r6(BigDecimal(1).setScale(12).toDouble * 3 +
      BigDecimal(0.5).setScale(12).toDouble +
      BigDecimal(1.0 / 3).setScale(12,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(r(3L)._1 == 5L && r(3L)._2 == 8L)
    assert(r(3L)._3 == 0.625)
    assert(r(3L)._4 == 3.5)
  }

  test("exact all-pairs baselines refuse to schedule past the pair " +
    "budget, naming the LSH sibling") {
    val rnd = new scala.util.Random(24099)
    val emb = (0L until 10L).map { i =>
      (i, Array.fill(4)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    // 10 vectors: C(10,2)=45 unordered pairs; 5 even × 5 odd = 25 A×B
    val exNd = intercept[IllegalArgumentException] {
      graft.ext.Similarity.embeddingNearDup(emb, 0.3, maxPairs = 44L)
    }
    assert(exNd.getMessage.contains("embeddingNearDupLSH"))
    assert(exNd.getMessage.contains("45 pairs"))
    val exBm = intercept[IllegalArgumentException] {
      graft.ext.Similarity.bitextMine(emb, maxPairs = 24L)
    }
    assert(exBm.getMessage.contains("bitextMineLsh"))
    assert(exBm.getMessage.contains("25 pairs"))
    // at budget == pair count both still run
    assert(graft.ext.Similarity.embeddingNearDup(emb, -1.0,
      maxPairs = 45L).count() == 45L)
    assert(graft.ext.Similarity.bitextMine(emb, maxPairs = 25L)
      .count() >= 1L)
    // the guard must mirror the A/B parity filters exactly: a null
    // vec_id (% 2 → null) and a negative one (% 2 → −1) belong to
    // NEITHER side, so they inflate neither budget factor — still
    // 5 × 5 = 25 pairs, and budget 25 still passes
    val dirty = (0L until 10L).map { i =>
      (Option(i), Array.fill(4)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
      .unionAll(Seq(
        (Option(-3L), Array.fill(4)(rnd.nextGaussian().toFloat)),
        (Option.empty[Long], Array.fill(4)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding"))
    val exDirty = intercept[IllegalArgumentException] {
      graft.ext.Similarity.bitextMine(dirty, maxPairs = 24L)
    }
    assert(exDirty.getMessage.contains("25 pairs"))
    assert(graft.ext.Similarity.bitextMine(dirty, maxPairs = 25L)
      .count() >= 1L)
  }
}
