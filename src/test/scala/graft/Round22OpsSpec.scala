package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.analytics.StatsAnalytics
import graft.operators.Sampling

/** Round-22-of-build additions: cross-correlation (lead/lag), drawdown
  * report, mSPRT sequential test, forecast combination, WoE/IV screen,
  * stratified IPW ATE, MCC scorecard, ridge path, Dunning-G2
  * collocations, segmented TTR, RAKE keywords, candidate-key discovery,
  * mix variance, Markov attribution, PQ recall, and the stream-stream
  * interval join. Hand-traced fixtures. */
class Round22OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- ccfDaily ----------------------------------------------------

  test("ccfDaily: hand-traced three-day series at lags -1..1") {
    // daily x = [1,2,3] (revenue), y = [1,1,2] (event count)
    // cx = [-1,0,1], cy = [-1/3,-1/3,2/3]
    // den = sqrt(2 * 2/3) = 1.1547005
    // lag 0: Σ cx·cy = 1   → 0.866025
    // lag +1: cx1·cy2 = 1/3 → 0.288675
    // lag -1: cx3·cy2 = -1/3 → -0.288675
    val ev = Seq(
      (ts("2024-01-01 10:00:00"), 1.0),
      (ts("2024-01-02 10:00:00"), 2.0),
      (ts("2024-01-03 10:00:00"), 1.5),
      (ts("2024-01-03 11:00:00"), 1.5))
      .toDF("ts", "value")
    val r = StatsAnalytics.ccfDaily(ev, maxLag = 1).collect()
    assert(r.length == 3)
    val byLag = r.map(x => x.getAs[Long]("lag") ->
      (x.getAs[Long]("n_pairs"), x.getAs[Double]("ccf"))).toMap
    assert(byLag(0L) == ((3L, 0.866025)))
    assert(byLag(1L) == ((2L, 0.288675)))
    assert(byLag(-1L) == ((2L, -0.288675)))
  }

  // ---- drawdownReport ----------------------------------------------

  test("drawdownReport: peaks, depth, pct, and longest underwater run") {
    // x = [5,3,4,6,2]: peak = [5,5,5,6,6], dd = [0,2,1,0,4]
    // max_dd = 4 at peak 6 → pct = 0.666667; runs: {d2,d3} len 2, {d5} 1
    val ev = Seq(
      (ts("2024-01-01 00:00:00"), 5.0),
      (ts("2024-01-02 00:00:00"), 3.0),
      (ts("2024-01-03 00:00:00"), 4.0),
      (ts("2024-01-04 00:00:00"), 6.0),
      (ts("2024-01-05 00:00:00"), 2.0))
      .toDF("ts", "value")
    val r = StatsAnalytics.drawdownReport(ev).collect()(0)
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Double]("max_drawdown") == 4.0)
    assert(r.getAs[Double]("max_dd_pct") == 0.666667)
    assert(r.getAs[Long]("max_underwater_days") == 2L)
  }

  test("drawdownReport: monotone-rising series never goes underwater") {
    val ev = Seq(
      (ts("2024-01-01 00:00:00"), 1.0),
      (ts("2024-01-02 00:00:00"), 2.0),
      (ts("2024-01-03 00:00:00"), 3.0))
      .toDF("ts", "value")
    val r = StatsAnalytics.drawdownReport(ev).collect()(0)
    assert(r.getAs[Double]("max_drawdown") == 0.0)
    assert(r.getAs[Double]("max_dd_pct") == 0.0)
    assert(r.getAs[Long]("max_underwater_days") == 0L)
  }

  // ---- msprt -------------------------------------------------------

  test("msprt: cumulative counts, evidence direction, and martingale p") {
    // Find one user id per hash bucket so the variant split is pinned
    // without hard-coding md5 internals.
    val probe = (1L to 40L).toDF("user_id")
      .withColumn("v", Sampling.hashBucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val uidA = probe.find(_._2 == 0L).get._1 // variant a
    val uidB = probe.find(_._2 == 1L).get._1 // variant b
    // day1: A active no conv, B converts; day2: both active, B converts
    val ev = Seq(
      (uidA, ts("2024-01-01 08:00:00"), "view", 1.0),
      (uidB, ts("2024-01-01 09:00:00"), "purchase", 100.0),
      (uidA, ts("2024-01-02 08:00:00"), "view", 1.0),
      (uidB, ts("2024-01-02 09:00:00"), "purchase", 95.0))
      .toDF("user_id", "ts", "event_type", "value")
    val rows = StatsAnalytics.msprt(ev).orderBy("d").collect()
    assert(rows.length == 2)
    val d1 = rows(0); val d2 = rows(1)
    assert(d1.getAs[Long]("users_a") == 1L &&
      d1.getAs[Long]("conv_a") == 0L)
    assert(d1.getAs[Long]("users_b") == 1L &&
      d1.getAs[Long]("conv_b") == 1L)
    assert(d2.getAs[Long]("users_a") == 2L &&
      d2.getAs[Long]("users_b") == 2L && d2.getAs[Long]("conv_b") == 2L)
    assert(d1.getAs[Double]("theta") == 1.0)
    assert(d2.getAs[Double]("theta") == 1.0)
    // evidence accumulates: lambda grows with n at fixed theta, and the
    // always-valid p is a running min (non-increasing)
    assert(d2.getAs[Double]("lambda") > d1.getAs[Double]("lambda"))
    assert(d2.getAs[Double]("p_always_valid") <=
      d1.getAs[Double]("p_always_valid"))
    assert(d1.getAs[Double]("p_always_valid") > 0.0 &&
      d1.getAs[Double]("p_always_valid") <= 1.0)
  }

  test("msprt: a day with one populated arm carries no evidence") {
    val probe = (1L to 40L).toDF("user_id")
      .withColumn("v", Sampling.hashBucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val uidA = probe.find(_._2 == 0L).get._1
    val ev = Seq((uidA, ts("2024-01-01 08:00:00"), "view", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = StatsAnalytics.msprt(ev).collect()(0)
    assert(r.getAs[Double]("lambda") == 1.0)
    assert(r.getAs[Double]("theta") == 0.0)
    assert(r.getAs[Double]("p_always_valid") == 1.0)
    assert(r.getAs[Int]("reject") == 0)
  }

  // ---- forecastCombo -----------------------------------------------

  test("forecastCombo: linear series gives exact per-arm errors") {
    // x_t = t for t=1..10; on t≥8: naive err 1, snaive err 7,
    // ma7 = mean(t-7..t-1) = t-4 → err 4, combo = ((t-1)+(t-7)+(t-4))/3
    // = t-4 → err 4. Constant errors → MAE = RMSE.
    val ev = (1 to 10).map(t =>
      (ts(f"2024-01-$t%02d 00:00:00"), t.toDouble))
      .toDF("ts", "value")
    val rows = StatsAnalytics.forecastCombo(ev).collect()
    val m = rows.map(r => r.getAs[String]("model") ->
      (r.getAs[Long]("n_days"), r.getAs[Double]("mae"),
        r.getAs[Double]("rmse"))).toMap
    assert(m("naive") == ((3L, 1.0, 1.0)))
    assert(m("snaive") == ((3L, 7.0, 7.0)))
    assert(m("ma7") == ((3L, 4.0, 4.0)))
    assert(m("combo") == ((3L, 4.0, 4.0)))
  }

  // ---- woeIv -------------------------------------------------------

  test("woeIv: hand-traced WoE and IV with Laplace numerators") {
    // customers: (seg, bal, y) = (A,0,1),(A,0,0),(B,0,0),(B,5000,1)
    // mktsegment: both bins g=1,b=1 → woe=0, IV=0
    // acctbal_band 0: g=1,b=2 → woe=ln((1.5/2)/(2.5/2))=ln(0.6)
    // acctbal_band 2: g=1,b=0 → woe=ln((1.5/2)/(0.5/2))=ln(3)
    // IV = (.5-1)ln(.6) + (.5-0)ln(3) = 0.804719
    val cust = Seq(
      (1L, "A", 0.0), (2L, "A", 0.0), (3L, "B", 0.0), (4L, "B", 5000.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val orders = Seq(
      (10L, 1L, "1-URGENT"), (11L, 2L, "5-LOW"), (12L, 4L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val rows = StatsAnalytics.woeIv(cust, orders).collect()
    val m = rows.map(r => (r.getAs[String]("feature"),
      r.getAs[String]("bin")) ->
      (r.getAs[Long]("goods"), r.getAs[Long]("bads"),
        r.getAs[Double]("woe"), r.getAs[Double]("iv_feature"))).toMap
    assert(m(("mktsegment", "A")) == ((1L, 1L, 0.0, 0.0)))
    assert(m(("mktsegment", "B")) == ((1L, 1L, 0.0, 0.0)))
    assert(m(("acctbal_band", "0")) ==
      ((1L, 2L, -0.510826, 0.804719)))
    assert(m(("acctbal_band", "2")) ==
      ((1L, 0L, 1.098612, 0.804719)))
  }

  // ---- ipwAte ------------------------------------------------------

  test("ipwAte: unbalanced strata re-weight to ATE 10, naive 13.33") {
    // stratum X (e=1/3): T y=10; C y=0, y=0
    // stratum Y (e=2/3): T y=20, y=20; C y=10
    // stratum Z (e=1): excluded by the positivity guard
    // naive = (10+20+20)/3 − (0+0+10)/3 = 13.333333
    // IPW: t-arm 90/6 = 15, c-arm 30/6 = 5 → ATE = 10
    val orders = Seq(
      (1L, 1L, "1-URGENT", 10.0), (2L, 2L, "5-LOW", 0.0),
      (3L, 3L, "5-LOW", 0.0),
      (4L, 4L, "2-HIGH", 20.0), (5L, 5L, "1-URGENT", 20.0),
      (6L, 6L, "3-MEDIUM", 10.0),
      (7L, 7L, "1-URGENT", 99.0))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    val cust = Seq(
      (1L, "X"), (2L, "X"), (3L, "X"),
      (4L, "Y"), (5L, "Y"), (6L, "Y"),
      (7L, "Z"))
      .toDF("c_custkey", "c_mktsegment")
    val r = StatsAnalytics.ipwAte(orders, cust).collect()(0)
    assert(r.getAs[Long]("n_units") == 6L)
    assert(r.getAs[Long]("n_treated") == 3L)
    assert(r.getAs[Double]("naive_diff") == 13.333333)
    assert(r.getAs[Double]("ate_ipw") == 10.0)
  }

  // ---- mccReport ---------------------------------------------------

  test("mccReport: one user per confusion cell gives MCC 0") {
    // cutoff = 2024-01-30 − 14 = 2024-01-16
    // u1: pre 01-15 (rec 1 → pred 1), post → TP
    // u2: pre 01-16 (rec 0 → pred 1), none → FP
    // u3: pre 01-01 (rec 15 → pred 0), post → FN
    // u4: pre 01-02 (rec 14 → pred 0), none → TN
    val ev = Seq(
      (1L, ts("2024-01-15 08:00:00"), 1.0),
      (1L, ts("2024-01-30 08:00:00"), 1.0),
      (2L, ts("2024-01-16 08:00:00"), 1.0),
      (3L, ts("2024-01-01 08:00:00"), 1.0),
      (3L, ts("2024-01-25 08:00:00"), 1.0),
      (4L, ts("2024-01-02 08:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val r = graft.analytics.EventAnalytics.mccReport(ev).collect()(0)
    assert(r.getAs[Long]("tp") == 1L && r.getAs[Long]("fp") == 1L &&
      r.getAs[Long]("fn") == 1L && r.getAs[Long]("tn") == 1L)
    assert(r.getAs[Double]("mcc") == 0.0)
    assert(r.getAs[Double]("balanced_accuracy") == 0.5)
    assert(r.getAs[Double]("youden_j") == 0.0)
  }

  // ---- ridgeCorr ---------------------------------------------------

  test("ridgeCorr: exact-fit fixture, hand-traced shrinkage path") {
    // (x1,x2,y): (1,2,1),(2,1,2),(3,3,3) → r12=.5, r1y=1, r2y=.5
    // λ=0: β=(1,0); λ=.1: (.885417,.052083); λ=1: (.466667,.133333)
    val li = Seq(
      (1L, 2.0),
      (2L, 0.5), (2L, 0.5),
      (3L, 1.0), (3L, 1.0), (3L, 1.0))
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))
      .toDF("o_orderkey", "o_totalprice")
    val rows = StatsAnalytics.ridgeCorr(orders, li).collect()
    val m = rows.map(r => r.getAs[Double]("lambda") ->
      (r.getAs[Double]("r12"), r.getAs[Double]("beta1_std"),
        r.getAs[Double]("beta2_std"))).toMap
    assert(m(0.0) == ((0.5, 1.0, 0.0)))
    assert(m(0.1) == ((0.5, 0.885417, 0.052083)))
    assert(m(1.0) == ((0.5, 0.466667, 0.133333)))
    // shrinkage is monotone in lambda
    assert(m(0.0)._2 > m(0.1)._2 && m(0.1)._2 > m(1.0)._2)
  }

  // ---- llrCollocations ---------------------------------------------

  test("llrCollocations: hand-traced 2x2 G-squared on a b a b") {
    // bigrams: (a,b)x2, (b,a)x1; N=3; margins c1(a)=2, c2(b)=2
    // G2((a,b)) = 2·(2·ln(6/4) + 1·ln(3/1)) = 3.819085
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val rows = graft.ext.TextAnalysis
      .llrCollocations(docs, minPair = 2L).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("bigram") == "a b")
    assert(r.getAs[Long]("n_pair") == 2L)
    assert(r.getAs[Int]("positive") == 1)
    assert(r.getAs[Double]("llr") == 3.819085)
  }

  // ---- segmentTtr --------------------------------------------------

  test("segmentTtr: tail segment counts, STTR is the segment mean") {
    // 5 tokens, segment size 3: [w1,w2,w1] ttr 2/3, [w3,w3] ttr 1/2
    // STTR = 7/12 = 0.583333; overall TTR = 3/5
    val docs = Seq((1L, "w1 w2 w1 w3 w3")).toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.segmentTtr(docs, segTokens = 3)
      .collect()(0)
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("n_segments") == 2L)
    assert(r.getAs[Double]("ttr") == 0.6)
    assert(r.getAs[Double]("sttr") == 0.583333)
  }

  // ---- rakeKeywords ------------------------------------------------

  test("rakeKeywords: degree/freq word scores sum per phrase") {
    // stopwords is/the/of split: "deep learning"x2, "machine learning"x1
    // deep: 4/2=2, learning: 6/3=2, machine: 2/1=2 → both phrases 4.0
    val docs = Seq(
      (1L, "deep learning is the deep learning of machine learning"))
      .toDF("doc_id", "text")
    val rows = graft.ext.TextAnalysis
      .rakeKeywords(docs, minCount = 1L).collect()
    val m = rows.map(r => r.getAs[String]("phrase") ->
      (r.getAs[Long]("n"), r.getAs[Long]("n_words"),
        r.getAs[Double]("rake_score"))).toMap
    assert(m("deep learning") == ((2L, 2L, 4.0)))
    assert(m("machine learning") == ((1L, 2L, 4.0)))
    assert(rows.length == 2)
  }

  // ---- candidateKeys -----------------------------------------------

  test("candidateKeys: single columns vs the composite that is a key") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("a", "b")
    val rows = graft.operators.DataContract
      .candidateKeys("t", df, Seq(Seq("a"), Seq("b"), Seq("a", "b")))
      .collect()
    val m = rows.map(r => r.getAs[String]("columns") ->
      (r.getAs[Long]("n_distinct"), r.getAs[Int]("is_key"),
        r.getAs[Double]("uniqueness"))).toMap
    assert(m("a") == ((2L, 0, 0.666667)))
    assert(m("b") == ((2L, 0, 0.666667)))
    assert(m("a,b") == ((3L, 1, 1.0)))
  }

  // ---- mixVariance -------------------------------------------------

  test("mixVariance: effects reconcile to delta on a flat-volume split") {
    // X: p1 2x10, p2 1x30 → price 20, volume 0, mix -10, delta 10
    // Y: p1 2x20, p2 3x10 → price -30, volume 0, mix 20, delta -10
    val orders = Seq(
      (1L, 1L, "1997-06-01", 10.0), (2L, 1L, "1997-06-02", 10.0),
      (3L, 1L, "1998-06-01", 30.0),
      (4L, 2L, "1997-06-01", 20.0), (5L, 2L, "1997-06-02", 20.0),
      (6L, 2L, "1998-06-01", 10.0), (7L, 2L, "1998-06-02", 10.0),
      (8L, 2L, "1998-06-03", 10.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val cust = Seq((1L, "X"), (2L, "Y")).toDF("c_custkey", "c_mktsegment")
    val rows = graft.analytics.StarAnalytics.mixVariance(orders, cust)
      .collect()
    val m = rows.map(r => r.getAs[String]("segment") ->
      (r.getAs[Double]("price_effect"), r.getAs[Double]("volume_effect"),
        r.getAs[Double]("mix_effect"), r.getAs[Double]("delta"))).toMap
    assert(m("X") == ((20.0, 0.0, -10.0, 10.0)))
    assert(m("Y") == ((-30.0, 0.0, 20.0, -10.0)))
  }

  // ---- markovAttribution -------------------------------------------

  test("markovAttribution: removal effect lands on the converting path") {
    // u1: view -> purchase; u2: click -> (null)
    // base P(conv) = 0.5; removing view kills it, removing click doesn't
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2024-01-01 10:05:00"), "purchase", 50.0),
      (3L, 2L, ts("2024-01-01 11:00:00"), "click", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = graft.analytics.EventAnalytics.markovAttribution(ev)
      .collect()
    val m = rows.map(r => r.getAs[String]("channel") ->
      (r.getAs[Double]("p_conv_base"), r.getAs[Double]("p_conv_removed"),
        r.getAs[Double]("removal_effect"), r.getAs[Double]("share")))
      .toMap
    assert(m("view") == ((0.5, 0.0, 0.5, 1.0)))
    assert(m("click") == ((0.5, 0.5, 0.0, 0.0)))
    assert(m("error") == ((0.5, 0.5, 0.0, 0.0)))
    assert(m("signup") == ((0.5, 0.5, 0.0, 0.0)))
  }

  test("markovAttribution: purchase splits journeys, terminal goes null") {
    // one user: view, purchase, click (trailing journey ends in null)
    // journeys: [view -> conv], [click -> null]
    // start row: start->view 1, start->click 1 → base = 0.5 again
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2024-01-01 10:05:00"), "purchase", 50.0),
      (3L, 1L, ts("2024-01-01 10:10:00"), "click", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = graft.analytics.EventAnalytics.markovAttribution(ev)
      .collect()
    val m = rows.map(r => r.getAs[String]("channel") ->
      r.getAs[Double]("removal_effect")).toMap
    assert(m("view") == 0.5 && m("click") == 0.0)
  }

  // ---- pqRecall ----------------------------------------------------

  test("pqRecall: corpus drawn from the codebook reconstructs exactly") {
    // vecs 0..15 ARE the codebook; 16..19 duplicate 0..3 → every
    // reconstruction is exact, ADC ranking == exact ranking, recall 1
    val rows = (0 until 20).map { i =>
      val src = if (i < 16) i else i - 16
      (i.toLong, (0 until 64).map(d => (src * 101 + d).toFloat).toArray)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val r = graft.ext.Similarity.pqRecall(emb).collect()(0)
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Long]("n_hits") == 20L)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  // ---- streamIntervalJoin (batch semantics) ------------------------

  test("streamIntervalJoin: only in-window same-user pairs survive") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (2L, 1L, ts("2024-01-01 10:15:00"), "purchase", 9.0),
      (3L, 1L, ts("2024-01-01 11:00:00"), "purchase", 9.0),
      (4L, 2L, ts("2024-01-01 10:10:00"), "purchase", 9.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = graft.streaming.EventStream.streamIntervalJoin(ev)
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("user_id") == 1L)
    assert(r.getAs[Long]("click_id") == 1L)
    assert(r.getAs[Long]("purchase_id") == 2L)
    assert(r.getAs[Long]("gap_sec") == 900L)
  }
}
