package graft

import org.apache.spark.sql.functions._
import graft.analytics.{GraphAnalytics, StatsAnalytics}
import graft.ext.{EvalOps, TextAnalysis}

/** Round-10-of-build additions: Welch's t-test, t-closeness, staleness
  * SLO, Cohen/Fleiss kappa, Adamic-Adar link prediction, HITS, and
  * tokenizer fertility. Hand-traced fixtures plus plan-shape pins. */
class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(String, String, String, String, Long)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- Cohen's kappa ------------------------------------------------

  test("cohenKappa: hand-traced 2x2 cells and chance-corrected kappa") {
    val many = Array.fill(60)("w").mkString(" ") // 60 words → rb = 1
    val few = "just a few words here"           // 5 words  → rb = 0
    val docs = docsDf(Seq(
      ("d1", many, "en", "s", 300L), // ra=1 rb=1
      ("d2", many, "en", "s", 400L), // ra=1 rb=1
      ("d3", few, "en", "s", 100L),  // ra=0 rb=0
      ("d4", few, "en", "s", 200L),  // ra=0 rb=0
      ("d5", few, "en", "s", 350L))) // ra=1 rb=0
    val r = EvalOps.cohenKappa(docs).collect()(0)
    // n11=2 n00=2 n10=1 n01=0; po=0.8; pe=(3·2+2·3)/25=0.48
    // kappa=0.32/0.52=0.6153846… → floor-round 0.615385
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Long]("n11") == 2L && r.getAs[Long]("n00") == 2L &&
      r.getAs[Long]("n10") == 1L && r.getAs[Long]("n01") == 0L)
    assert(r.getAs[Double]("p_observed") == 0.8)
    assert(r.getAs[Double]("p_expected") == 0.48)
    assert(r.getAs[Double]("kappa") == 0.615385)
  }

  test("cohenKappa plan: one aggregate, no window, no shuffle of docs") {
    val docs = docsDf(Seq(("d1", "a b", "en", "s", 10L)))
    val plan = EvalOps.cohenKappa(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // ---- Fleiss' kappa ------------------------------------------------

  test("fleissKappa: agreement sums match the closed-form trace") {
    // rc threshold: non-space density ≥ 82.2%. "xxxxx" (no spaces) → 1;
    // "a b c d e" (4 spaces / 9 chars → 55.6%) → 0.
    val dense = Array.fill(60)("xxxxx").mkString("") // rb=0 (1 word), rc=1
    val sparse = Array.fill(60)("w").mkString(" ")   // rb=1, rc: 60w/119ch → 50.4% → 0
    val docs = docsDf(Seq(
      ("d1", dense, "en", "s", 300L),  // ra=1 rb=0 rc=1 → n1=2
      ("d2", sparse, "en", "s", 100L), // ra=0 rb=1 rc=0 → n1=1
      ("d3", dense, "en", "s", 100L),  // ra=0 rb=0 rc=1 → n1=1
      ("d4", sparse, "en", "s", 400L))) // ra=1 rb=1 rc=0 → n1=2
    val r = EvalOps.fleissKappa(docs).collect()(0)
    // n=4, s1=6, sq per doc n1²+(3-n1)²: {2→5, 1→5, 1→5, 2→5} → 20
    // pbar=(20-12)/24=1/3 → floor(333333.83)/1e6 = 0.333333; p1=0.5;
    // pe=0.5; kappa=(1/3-1/2)/(1/2) = -1/3 → floor(-333332.83)/1e6
    //   = -0.333333
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Double]("p_positive") == 0.5)
    assert(r.getAs[Double]("p_bar") == 0.333333)
    assert(r.getAs[Double]("p_expected") == 0.5)
    assert(r.getAs[Double]("kappa") == -0.333333)
  }

  // ---- Welch's t-test ----------------------------------------------

  test("welchTTest: moments match direct per-variant computation") {
    val ev = Seq.tabulate(200)(i =>
      (i.toLong, "2024-01-01 00:00:00", s"u$i", "view",
        Some((i % 13).toDouble * 1.5 + 2.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = StatsAnalytics.welchTTest(ev).collect()(0)
    // independent recomputation from the same deterministic split
    val vs = ev.select(graft.operators.Sampling
        .hashBucket(col("user_id"), 2).cast("long").as("v"), col("value"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    def stats(g: Long) = {
      val xs = vs.filter(_._1 == g).map(_._2)
      val n = xs.length.toDouble
      val m = xs.sum / n
      (xs.length.toLong, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(0); val (nb, mb, vb) = stats(1)
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-5)
    assert(math.abs(r.getAs[Double]("mean_b") - mb) < 1e-5)
    assert(math.abs(r.getAs[Double]("var_a") - va) < 1e-4)
    assert(math.abs(r.getAs[Double]("var_b") - vb) < 1e-4)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-5)
  }

  test("welchTTest plan: single-pass — one aggregate, no join, no window") {
    val ev = Seq((1L, "u1", Some(1.0)))
      .toDF("event_id", "user_id", "value")
    val plan = StatsAnalytics.welchTTest(ev)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("Join"), plan)
  }

  // ---- t-closeness --------------------------------------------------

  test("tCloseness: hand-traced TVD on two quasi-groups") {
    // same day; vb 0 vs 1. g1: 4×A. g2: 1×A + 3×B.
    // global: A 5/8, B 3/8.
    // g1 TVD = ½(|1−5/8| + 3/8) = 0.375; g2 TVD = ½(|¼−⅝|+|¾−⅜|) = 0.375
    val rows =
      Seq.fill(4)(("A", 10.0)) ++ Seq(("A", 60.0)) ++ Seq.fill(3)(("B", 60.0))
    val ev = rows.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, "2024-01-01 00:00:00", s"u$i", t, Some(v), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = StatsAnalytics.tCloseness(ev).collect()(0)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Double]("max_tvd") == 0.375)
    assert(r.getAs[Long]("n_wide_groups") == 2L)
    assert(r.getAs[Long]("rows_at_risk") == 8L)
  }

  // ---- staleness ----------------------------------------------------

  test("stalenessReport: lag, trailing-7d volume, and the stale flag") {
    val rows = (1 to 10).map(d => ("A", f"2024-01-$d%02d 08:00:00")) ++
      (1 to 5).map(d => ("B", f"2024-01-$d%02d 08:00:00"))
    val ev = rows.zipWithIndex.map { case ((t, ts), i) =>
      (i.toLong, ts, s"u$i", t, Some(1.0), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = StatsAnalytics.stalenessReport(ev).collect()
    val a = out.find(_.getString(0) == "A").get
    val b = out.find(_.getString(0) == "B").get
    // horizon = Jan 10. A: lag 0, last-7 window Jan 4-10 → 7 rows.
    assert(a.getAs[Long]("n_rows") == 10L &&
      a.getAs[Long]("lag_days") == 0L &&
      a.getAs[Long]("n_last7") == 7L && a.getAs[Int]("is_stale") == 0)
    // B: last day Jan 5 → lag 5 (> 3 → stale); Jan 4-10 → 2 rows.
    assert(b.getAs[Long]("n_rows") == 5L &&
      b.getAs[Long]("lag_days") == 5L &&
      b.getAs[Long]("n_last7") == 2L && b.getAs[Int]("is_stale") == 1)
  }

  // ---- Adamic-Adar --------------------------------------------------

  test("adamicAdarOnEdges: square graph — two predicted diagonals at " +
    "2/ln(2), existing edges excluded") {
    // cycle 1-2-3-4-1: every node has deg 2; wedges predict (1,3), (2,4)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val out = GraphAnalytics.adamicAdarOnEdges(e, limit = 10).collect()
    assert(out.length == 2)
    val exp = math.floor(2.0 / math.log(2.0) * 1e6 + 0.5) / 1e6 // 2.885390
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 4L)))
    out.foreach { r =>
      assert(r.getAs[Long]("common_neighbors") == 2L)
      assert(r.getAs[Double]("adamic_adar") == exp)
    }
  }

  test("adamicAdarOnEdges: path graph scores the endpoints once and " +
    "never proposes an existing edge") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = GraphAnalytics.adamicAdarOnEdges(e, limit = 10).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L)
    assert(out(0).getAs[Double]("adamic_adar") ==
      math.floor(1.0 / math.log(2.0) * 1e6 + 0.5) / 1e6) // 1.442695
  }

  test("uncapped wedge enumerators refuse to schedule past the wedge " +
    "budget, fail-fast, naming the capped sibling") {
    // star on center 9: deg(9)=4 → C(4,2)=6 wedges; budget 5 trips
    // BEFORE any action on the result frame (the guard is eager).
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 10L)).toDF("a", "b")
    val exAa = intercept[IllegalArgumentException] {
      GraphAnalytics.adamicAdarOnEdges(e, limit = 10, maxWedges = 5L)
    }
    assert(exAa.getMessage.contains("adamicAdarCapped"))
    assert(exAa.getMessage.contains("6 wedges"))
    val exLj = intercept[IllegalArgumentException] {
      GraphAnalytics.linkJaccardOnEdges(e, limit = 10, maxWedges = 5L)
    }
    assert(exLj.getMessage.contains("linkJaccardCapped"))
    // at budget == wedge count both run: 6 predicted pairs among the
    // 4 leaves of the star, minus the existing (none of the leaf pairs
    // are edges) → C(4,2) = 6 rows each.
    assert(GraphAnalytics.adamicAdarOnEdges(e, 10, maxWedges = 6L)
      .count() == 6L)
    assert(GraphAnalytics.linkJaccardOnEdges(e, 10, maxWedges = 6L)
      .count() == 6L)
  }

  // ---- HITS ---------------------------------------------------------

  test("hitsOnEdges: L1-normalized authorities sum to ~1 and rank by " +
    "in-link mass") {
    // c1-{p1,p2}, c2-{p1}: p1 must out-rank p2 at every iteration
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("c", "p")
    val out = GraphAnalytics.hitsOnEdges(e, iterations = 2, limit = 10)
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("part") == 101L) // top authority
    val s = out.map(_.getAs[Double]("authority")).sum
    assert(math.abs(s - 1.0) < 1e-6, s.toString)
    assert(out(0).getAs[Double]("authority") >
      out(1).getAs[Double]("authority"))
    // hand value: authorities converge to (13/21, 8/21) at iteration 2
    assert(math.abs(out(0).getAs[Double]("authority") - 13.0 / 21.0) < 1e-3)
  }

  test("hitsOnEdges: partitioning-invariant (decimal sums leave no " +
    "float order to the scheduler)") {
    val e = Seq.tabulate(40)(i => (i.toLong % 7, 100L + i % 11)).toDF("c", "p")
      .distinct()
    val a = GraphAnalytics.hitsOnEdges(e, 2, 20).collect().toSeq
    val b = GraphAnalytics.hitsOnEdges(e.repartition(13), 2, 20)
      .collect().toSeq
    assert(a == b)
  }

  // ---- tokenizer fertility -----------------------------------------

  test("tokenizerFertility: hand-counted subword/word ratios per lang") {
    val docs = docsDf(Seq(
      ("d1", "ab cd", "en", "s", 5L),   // 2 words, 2 subwords, 5 chars
      ("d2", "a-b x", "en", "s", 5L),   // 2 words, 4 subwords (a,-,b,x)
      ("d3", "hello", "fr", "s", 5L)))  // 1 word, 1 subword
    val out = TextAnalysis.tokenizerFertility(docs).collect()
    val en = out.find(_.getString(0) == "en").get
    val fr = out.find(_.getString(0) == "fr").get
    assert(en.getAs[Long]("n_words") == 4L &&
      en.getAs[Long]("n_subwords") == 6L)
    assert(en.getAs[Double]("fertility") == 1.5)
    assert(en.getAs[Double]("chars_per_subword") ==
      math.floor(10.0 / 6.0 * 1e6 + 0.5) / 1e6) // 1.666667
    assert(fr.getAs[Double]("fertility") == 1.0)
  }

  // ---- Brown's double smoothing ------------------------------------

  test("brownTrend: hand-traced s1/s2/level/trend on x = [8, 4, 6]") {
    // s1 = [8, 6, 6]; s2 = EWMA(s1) = [8, 7, 6.5];
    // level = 2s1-s2 = [8, 5, 5.5]; trend = [0, -1, -0.5];
    // forecast = level + trend = [8, 4, 5]
    val ev = Seq((1L, "2024-01-01 08:00:00", 8.0),
      (2L, "2024-01-02 08:00:00", 4.0), (3L, "2024-01-03 08:00:00", 6.0))
      .map { case (i, ts, v) => (i, ts, s"u$i", "view", Some(v), "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = StatsAnalytics.brownTrend(ev).collect()
    assert(out.map(_.getAs[Double]("s1")).toSeq == Seq(8.0, 6.0, 6.0))
    assert(out.map(_.getAs[Double]("s2")).toSeq == Seq(8.0, 7.0, 6.5))
    assert(out.map(_.getAs[Double]("level")).toSeq == Seq(8.0, 5.0, 5.5))
    assert(out.map(_.getAs[Double]("trend")).toSeq == Seq(0.0, -1.0, -0.5))
    assert(out.map(_.getAs[Double]("forecast_next")).toSeq ==
      Seq(8.0, 4.0, 5.0))
  }

  // ---- randomized response -----------------------------------------

  test("randomizedResponse: debias algebra inverts the observed rate") {
    val ev = Seq.tabulate(400)(i =>
      (i.toLong, "2024-01-01 00:00:00", s"u$i",
        if (i % 4 == 0) "purchase" else "view", Some(1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = StatsAnalytics.randomizedResponse(ev).collect()(0)
    assert(r.getAs[Long]("n") == 400L)
    assert(r.getAs[Long]("n_true_pos") == 100L)
    assert(r.getAs[Double]("p_true") == 0.25)
    // debias identity: p_est = 2·(p_obs − ¼), up to the 1e-6 rounds
    assert(math.abs(r.getAs[Double]("p_estimated") -
      2.0 * (r.getAs[Double]("p_observed") - 0.25)) < 2e-6)
    // the mechanism's reported count differs from truth (some flips)
    assert(r.getAs[Long]("n_reported_pos") != r.getAs[Long]("n_true_pos"))
  }

  // ---- forecast backtest -------------------------------------------

  test("forecastEval: hand-traced naive vs EWMA backtest on [8, 4, 6]") {
    // naive errs: |4-8|, |6-4| → MAE 3, RMSE √10, MAPE (1 + 1/3)/2
    // ewma (s1=[8,6,6]) errs: |4-8|, |6-6| → MAE 2, RMSE √8, MAPE 50%
    val ev = Seq((1L, "2024-01-01 08:00:00", 8.0),
      (2L, "2024-01-02 08:00:00", 4.0), (3L, "2024-01-03 08:00:00", 6.0))
      .map { case (i, ts, v) => (i, ts, s"u$i", "view", Some(v), "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = StatsAnalytics.forecastEval(ev).collect()
    val e = out.find(_.getString(0) == "ewma").get
    val n = out.find(_.getString(0) == "naive").get
    assert(n.getAs[Long]("n_days") == 2L)
    assert(n.getAs[Double]("mae") == 3.0)
    assert(n.getAs[Double]("rmse") == 3.162278) // √10 floor-rounded
    assert(n.getAs[Double]("mape_pct") == 66.666667)
    assert(e.getAs[Double]("mae") == 2.0)
    assert(e.getAs[Double]("rmse") == 2.828428 ||
      e.getAs[Double]("rmse") == 2.828427) // √8
    assert(e.getAs[Double]("mape_pct") == 50.0)
  }

  // ---- mean average precision --------------------------------------

  test("mapAtK: hand-ranked hits at ranks 1 and 3 give AP = 5/6") {
    // query 0 (A); ranking v1(A) v2(B) v3(A) v4(B); R = 2
    // AP = (1/1 + 2/3)/2 = 5/6 → 0.833333
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0L), (1L, Array(1.0f, 0.0f), 0L),
      (2L, Array(0.7f, 0.714f), 1L), (3L, Array(0.5f, 0.866f), 0L),
      (4L, Array(0.0f, 1.0f), 1L))
      .toDF("vec_id", "embedding", "label")
    val r = graft.ext.Similarity.mapAtK(emb).collect()(0)
    assert(r.getAs[Long]("n_queries") == 1L)
    assert(r.getAs[Long]("n_with_hit") == 1L)
    assert(r.getAs[Double]("map") == 0.833333)
  }

  // ---- DBSCAN core census ------------------------------------------

  test("dbscanCore: hand geometry — one core, two border, one noise") {
    // threshold 0.7 (~45°), minPts 2: v1=(1,0) sees v2,v3 (sim .92) →
    // core; v2,v3 see only v1 (sim(v2,v3)=.695 < .7) → border; v4=(0,1)
    // sees nobody → noise. No core-core pair → 0 core edges.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0L), (2L, Array(0.92f, 0.39f), 0L),
      (3L, Array(0.92f, -0.39f), 0L), (4L, Array(0.0f, 1.0f), 1L))
      .toDF("vec_id", "embedding", "label")
    val r = graft.ext.Similarity.dbscanCore(emb, threshold = 0.7,
      minPts = 2L).collect()(0)
    assert(r.getAs[Long]("n_points") == 4L)
    assert(r.getAs[Long]("n_core") == 1L)
    assert(r.getAs[Long]("n_border") == 2L)
    assert(r.getAs[Long]("n_noise") == 1L)
    assert(r.getAs[Long]("n_core_edges") == 0L)
  }

  test("dbscanClusters: two orthogonal triads resolve to two clusters; " +
    "borders attach to the min adjacent core label") {
    // triads of identical vectors: all deg-2 cores at minPts=2 → two
    // clusters labelled by their min ids (1 and 4)
    val twoTriads = Seq(
      (1L, Array(1.0f, 0.0f), 0L), (2L, Array(1.0f, 0.0f), 0L),
      (3L, Array(1.0f, 0.0f), 0L), (4L, Array(0.0f, 1.0f), 1L),
      (5L, Array(0.0f, 1.0f), 1L), (6L, Array(0.0f, 1.0f), 1L))
      .toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.dbscanClusters(twoTriads,
      threshold = 0.7, minPts = 2L).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet == Set((1L, 3L, 0L, 3L), (4L, 3L, 0L, 3L)))
    // the dbscanCore hand-geometry fixture: v1 core, v2/v3 border → one
    // cluster of 3; the noise point never appears
    val star = Seq(
      (1L, Array(1.0f, 0.0f), 0L), (2L, Array(0.92f, 0.39f), 0L),
      (3L, Array(0.92f, -0.39f), 0L), (4L, Array(0.0f, 1.0f), 1L))
      .toDF("vec_id", "embedding", "label")
    val s = graft.ext.Similarity.dbscanClusters(star, threshold = 0.7,
      minPts = 2L).collect()
    assert(s.length == 1)
    assert(s(0).getLong(0) == 1L && s(0).getLong(1) == 1L &&
      s(0).getLong(2) == 2L && s(0).getLong(3) == 3L)
  }

  // ---- point-in-time training set ----------------------------------

  test("trainingSet: features stop at the cutoff, label starts after, " +
    "future-only users are excluded") {
    // max day Jan 20 → cutoff Jan 6. A: pre days 1,2 + post day 20;
    // B: pre days 1,5 only; C: post day 19 only (must not appear).
    val rows = Seq(("A", 1), ("A", 2), ("A", 20), ("B", 1), ("B", 5),
      ("C", 19))
    val ev = rows.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, f"2024-01-$day%02d 08:00:00", u, "view", Some(2.5), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = graft.analytics.EventAnalytics.trainingSet(ev).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("n_events") == 2L &&
      a.getAs[Double]("total_value") == 5.0 &&
      a.getAs[Long]("days_active") == 2L &&
      a.getAs[Long]("recency_days") == 4L &&
      a.getAs[Int]("label_active") == 1)
    assert(b.getAs[Long]("n_events") == 2L &&
      b.getAs[Long]("recency_days") == 1L &&
      b.getAs[Int]("label_active") == 0)
  }

  // ---- recommender coverage ----------------------------------------

  test("recCoverage: accounting closure and bounds on the fixture") {
    val r = graft.ext.EvalOps.recCoverage(spark, "/root/testdata/sf0.001")
      .collect()(0)
    val cat = r.getAs[Long]("catalog_size")
    val nRec = r.getAs[Long]("n_recommended")
    val slots = r.getAs[Long]("total_slots")
    assert(cat > 0 && nRec > 0 && nRec <= cat)
    assert(slots >= nRec) // every recommended item fills ≥1 slot
    val cov = r.getAs[Double]("coverage")
    val head = r.getAs[Double]("head20_share")
    assert(cov > 0.0 && cov <= 1.0)
    assert(head > 0.0 && head <= 1.0)
    // top-20 share can never be below 20/n_recommended of the mass
    assert(head >= 20.0 / nRec.toDouble - 1e-6 || nRec <= 20)
  }

  // ---- media near-dup ----------------------------------------------

  test("mediaNearDup: identical payloads collide at Hamming 0; a " +
    "disjoint payload never pairs") {
    val txt = "the quick brown fox jumps over the lazy dog " * 4
    val other = "0123456789" * 18
    val docs = docsDf(Seq(("1", txt, "en", "s", 10L),
      ("2", txt, "en", "s", 10L), ("3", other, "en", "s", 10L)))
      .withColumn("doc_id", col("doc_id").cast("long"))
    val out = graft.ext.Multimodal.mediaNearDup(docs).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L &&
      out(0).getInt(2) == 0)
  }

  // ---- LSH tuning sweep --------------------------------------------

  test("lshTuning: candidates/found/recall are monotone non-increasing " +
    "in nBits (coarser buckets are supersets) and bounded by exact") {
    val rows = graft.ext.Similarity.lshTuning(
      Tables.embeddings(spark, "/root/testdata/sf0.001")).collect()
    assert(rows.map(_.getAs[Long]("n_bits")).toSeq == Seq(4L, 8L, 12L))
    val cand = rows.map(_.getAs[Long]("n_candidates"))
    val found = rows.map(_.getAs[Long]("n_found"))
    val rec = rows.map(_.getAs[Double]("recall"))
    assert(cand(0) >= cand(1) && cand(1) >= cand(2))
    assert(found(0) >= found(1) && found(1) >= found(2))
    assert(rec(0) >= rec(1) && rec(1) >= rec(2))
    val exact = rows.head.getAs[Long]("n_exact_pairs")
    assert(found.forall(_ <= exact))
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
  }

  // ---- SRM guardrail -----------------------------------------------

  test("srmCheck: accounting closes and chi2 recomputes from the counts") {
    val ev = Seq.tabulate(300)(i =>
      (i.toLong, "2024-01-01 00:00:00", s"user$i", "view", Some(1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = StatsAnalytics.srmCheck(ev).collect()(0)
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    assert(na + nb == 300L)
    val e = 150.0
    val chi2 = (na - e) * (na - e) / e + (nb - e) * (nb - e) / e
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5)
    // a fair hash split of 300 users must not trip the p<0.001 gate
    assert(r.getAs[Int]("srm_flag") == 0)
  }

  // ---- temporal leakage audit --------------------------------------

  test("temporalLeakage: spanning / train-only / cold-start census and " +
    "the seen-event share") {
    // cutoff = Jan 20 - 14 = Jan 6. A: Jan 2 + Jan 20 (spanning);
    // B: Jan 1 (train-only); C: Jan 19, Jan 20 (test-only, 2 events)
    val rows = Seq(("A", 2), ("A", 20), ("B", 1), ("C", 19), ("C", 20))
    val ev = rows.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, f"2024-01-$day%02d 08:00:00", u, "view", Some(1.0), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = graft.analytics.EventAnalytics.temporalLeakage(ev).collect()(0)
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("n_train_only") == 1L)
    assert(r.getAs[Long]("n_test_only") == 1L)
    assert(r.getAs[Long]("n_spanning") == 1L)
    assert(r.getAs[Long]("n_test_events") == 3L)
    assert(r.getAs[Double]("seen_share") == 0.333333)
  }

  // ---- delta-method ratio SE ---------------------------------------

  test("deltaMethodRatio: SE recomputes from the per-user moments") {
    val ev = Seq.tabulate(90)(i =>
      (i.toLong, "2024-01-01 00:00:00", s"u${i % 19}", "view",
        Some((i % 5) * 2.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = StatsAnalytics.deltaMethodRatio(ev).collect()(0)
    val per = (0 until 90).groupBy(i => i % 19).toSeq.map { case (_, is) =>
      (is.map(i => (i % 5) * 2.0).sum, is.size.toDouble)
    }
    val n = per.size.toDouble
    val (sx, sy) = (per.map(_._1).sum, per.map(_._2).sum)
    val ratio = sx / sy
    val vxx = per.map(p => math.pow(p._1 - sx / n, 2)).sum / (n - 1)
    val vyy = per.map(p => math.pow(p._2 - sy / n, 2)).sum / (n - 1)
    val vxy = per.map(p => (p._1 - sx / n) * (p._2 - sy / n)).sum / (n - 1)
    val se = math.sqrt((vxx - 2 * ratio * vxy + ratio * ratio * vyy) /
      (n * (sy / n) * (sy / n)))
    assert(r.getAs[Long]("n_users") == 19L)
    assert(math.abs(r.getAs[Double]("ratio") - ratio) < 1e-5)
    assert(math.abs(r.getAs[Double]("se_delta") - se) < 1e-5)
    assert(r.getAs[Double]("ci_lo") < ratio && ratio <
      r.getAs[Double]("ci_hi"))
  }

  // ---- churn baseline ----------------------------------------------

  test("churnBaseline: confusion cells and F1 from the hand training " +
    "set") {
    // cutoff Jan 6, recency cut 7 → every pre-cutoff user predicts
    // ACTIVE iff last pre-event within [cutoff-7, cutoff].
    // A: pre Jan 5 (recency 1 → pred 1), post → label 1: TP
    // B: pre Jan 5 (pred 1), no post: FP
    // C: pre Jan 2 (recency 4 → pred 1), post: TP
    val rows = Seq(("A", 5), ("A", 20), ("B", 5), ("C", 2), ("C", 19))
    val ev = rows.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, f"2024-01-$day%02d 08:00:00", u, "view", Some(1.0), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = graft.analytics.EventAnalytics.churnBaseline(ev).collect()(0)
    // A: TP, C: TP, B: FP → precision 2/3, recall 1, f1 = 0.8
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L &&
      r.getAs[Long]("fn") == 0L && r.getAs[Long]("tn") == 0L)
    assert(r.getAs[Double]("precision") == 0.666667)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Double]("f1") == 0.8)
  }

  // ---- per-source duplication accounting ---------------------------

  test("dupBySource: exact dups flag on the keep-smallest side; " +
    "near-dups flag the larger id of each colliding pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 3
    // same token multiset, different order: identical SimHash (near dup,
    // Hamming 0) but a different normalized fingerprint (not exact)
    val shuffled = "beta alpha delta gamma zeta epsilon theta eta " * 3
    val docs = docsDf(Seq(
      ("1", base, "en", "s1", 10L),
      ("2", base, "en", "s2", 10L),      // exact dup of 1 (s2)
      ("3", shuffled, "en", "s2", 10L),  // near dup of 1/2, not exact
      ("4", "utterly different content here entirely", "en", "s1", 10L)))
      .withColumn("doc_id", col("doc_id").cast("long"))
    val out = graft.ext.DedupExt.dupBySource(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // doc 1 is the keeper: s1 has no dups; s2 carries the exact dup (2)
    // and both 2 and 3 flag as near (larger side of their pairs)
    assert(out("s1").getAs[Long]("n_exact_dup") == 0L)
    assert(out("s2").getAs[Long]("n_exact_dup") == 1L)
    assert(out("s1").getAs[Long]("n_near_dup") == 0L)
    assert(out("s2").getAs[Long]("n_near_dup") == 2L)
    assert(out("s2").getAs[Double]("near_dup_rate") == 1.0)
  }

  // ---- gains curve -------------------------------------------------

  test("gainsCurve: perfect separation doubles early lift; tied zero " +
    "scores merge the bottom deciles at the full-corpus cut") {
    // 5 en docs with distinct positive stopword ratios, 5 fr docs at 0:
    // deciles 1..5 keep exactly k docs (all positive, lift 2), deciles
    // 6..10 can only cut at the tied sri=0 block → full corpus, lift 1
    val docs = docsDf(
      (0 until 5).map(i => (s"e$i", "the " * (i + 1) + "qq", "en", "s",
        10L)) ++
      (0 until 5).map(i => (s"f$i", "qq zz", "fr", "s", 10L)))
      .withColumn("doc_id", monotonically_increasing_id())
    val out = graft.ext.EvalOps.gainsCurve(docs).collect()
    assert(out.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    for (r <- out) {
      val k = r.getAs[Long]("decile")
      if (k <= 5) {
        assert(r.getAs[Long]("n_kept") == k)
        assert(r.getAs[Long]("pos_kept") == k)
        assert(r.getAs[Double]("lift") == 2.0)
      } else {
        assert(r.getAs[Long]("n_kept") == 10L)
        assert(r.getAs[Double]("recall") == 1.0)
        assert(r.getAs[Double]("lift") == 1.0)
      }
    }
  }

  // ---- seasonal anomaly --------------------------------------------

  test("seasonalAnomaly: a planted burst flags against its same-" +
    "weekday-hour LOO baseline; the baseline days do not") {
    // five consecutive same-weekday days at hour 8 with counts
    // [10, 11, 9, 10, 50]: LOO baseline of the burst = mean 10,
    // var 2/3 → z = 40/√(2/3) = 48.989795
    val days = Seq(1, 8, 15, 22, 29)
    val counts = Seq(10, 11, 9, 10, 50)
    val rows = days.zip(counts).flatMap { case (day, n) =>
      (0 until n).map(j => (day, j))
    }
    val ev = rows.zipWithIndex.map { case ((day, _), i) =>
      (i.toLong, f"2024-01-$day%02d 08:15:00", s"u$i", "view",
        Some(1.0), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = graft.analytics.EventAnalytics.seasonalAnomaly(ev).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out(0)
    assert(r.getAs[java.sql.Date]("d").toString == "2024-01-29")
    assert(r.getAs[Long]("c") == 50L)
    assert(r.getAs[Double]("cell_mean") == 10.0)
    assert(r.getAs[Double]("z") == 48.989795)
  }

  // ---- quantile treatment effects ----------------------------------

  test("quantileTreatmentEffect: deciles are monotone, the effect " +
    "column closes, and the result is partitioning-invariant") {
    val ev = Seq.tabulate(200)(i =>
      (i.toLong, "2024-01-01 00:00:00", s"u$i", "view",
        Some((i % 31) * 0.7), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = StatsAnalytics.quantileTreatmentEffect(ev).collect()
    assert(out.map(_.getAs[Long]("pct")).toSeq ==
      (1 to 9).map(_ * 10L))
    val qa = out.map(_.getAs[Double]("q_a"))
    assert(qa.sliding(2).forall(p => p(0) <= p(1))) // monotone deciles
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("qte") -
        (r.getAs[Double]("q_b") - r.getAs[Double]("q_a"))) < 2e-6)
    }
    val again = StatsAnalytics.quantileTreatmentEffect(ev.repartition(11))
      .collect().toSeq
    assert(again == out.toSeq)
  }

  // ---- covariate balance -------------------------------------------

  test("covariateBalance: the value covariate's SMD recomputes from " +
    "the split moments") {
    val ev = Seq.tabulate(160)(i =>
      (i.toLong, f"2024-01-01 ${i % 24}%02d:00:00", s"u$i", "view",
        Some((i % 9) * 1.5), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = StatsAnalytics.covariateBalance(ev).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("a_value", "b_hour", "c_dow"))
    val vs = ev.select(graft.operators.Sampling
        .hashBucket(col("user_id"), 2).cast("long").as("v"), col("value"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    def stats(g: Long) = {
      val xs = vs.filter(_._1 == g).map(_._2)
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (ma, va) = stats(0); val (mb, vb) = stats(1)
    val smd = (mb - ma) / math.sqrt((va + vb) / 2.0)
    val row = out.find(_.getString(0) == "a_value").get
    assert(math.abs(row.getAs[Double]("smd") - smd) < 1e-5)
  }

  // ---- effective sample size ---------------------------------------

  test("essReport: capped flat weights give ESS = n; a dominant weight " +
    "halves the ratio") {
    val docs = docsDf(Seq(
      ("1", "x", "en", "s1", 800L), ("2", "x", "en", "s1", 800L),
      ("3", "x", "en", "s2", 800L), ("4", "x", "en", "s2", 80L)))
      .withColumn("doc_id", col("doc_id").cast("long"))
    val out = graft.ext.Curation.essReport(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // s1: both weights cap at 1e6 → ESS = 2, ratio 1
    assert(out("s1").getAs[Double]("ess") == 2.0)
    assert(out("s1").getAs[Double]("ess_ratio") == 1.0)
    // s2: w = (1e6, 1e5) → ESS = 1.21e12/1.01e12 = 1.19802
    assert(out("s2").getAs[Double]("ess") == 1.19802)
    assert(out("s2").getAs[Double]("ess_ratio") == 0.59901)
  }

  // ---- ANALYZE column stats ----------------------------------------

  test("analyzeStats: typed min/max, exact ndv, null count, and the " +
    "(count desc, value) MCV per column") {
    val orders = Seq(
      (Some(1L), "1-URGENT", "O", 10.5), (Some(2L), "2-HIGH", "F", 20.0),
      (Some(2L), "1-URGENT", "O", 10.5), (None, "1-URGENT", "O", 10.5))
      .toDF("o_custkey", "o_orderpriority", "o_orderstatus",
        "o_totalprice")
    val out = StatsAnalytics.analyzeStats(orders).collect()
      .map(r => r.getString(0) -> r).toMap
    val ck = out("o_custkey")
    assert(ck.getAs[Long]("n_rows") == 4L &&
      ck.getAs[Long]("n_null") == 1L && ck.getAs[Long]("ndv") == 2L)
    assert(ck.getAs[String]("min_v") == "1" &&
      ck.getAs[String]("max_v") == "2")
    assert(ck.getAs[String]("mcv_value") == "2" &&
      ck.getAs[Long]("mcv_count") == 2L)
    val tp = out("o_totalprice")
    assert(tp.getAs[String]("min_v") == "10.5" &&
      tp.getAs[String]("max_v") == "20.0")
    assert(tp.getAs[String]("mcv_value") == "10.5" &&
      tp.getAs[Long]("mcv_count") == 3L)
    assert(out("o_orderstatus").getAs[String]("mcv_value") == "O")
    assert(out("o_orderpriority").getAs[Long]("ndv") == 2L)
  }

  // ---- CMH stratified test -----------------------------------------

  test("cmhTest: statistic recomputes from the per-day 2x2 tables") {
    val ev = Seq.tabulate(60)(i =>
      (i.toLong, f"2024-01-${i % 3 + 1}%02d 08:00:00", s"u$i",
        if (i % 5 == 0) "purchase" else "view", Some(1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = StatsAnalytics.cmhTest(ev).collect()(0)
    // independent recomputation from the same deterministic pieces
    val vmap = ev.select(col("user_id"), graft.operators.Sampling
        .hashBucket(col("user_id"), 2).cast("long").as("v"))
      .distinct().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val units = (0 until 60).map(i =>
      (i % 3, vmap(s"u$i"), if (i % 5 == 0) 1 else 0))
    var (sumA, sumE, sumV) = (0.0, 0.0, 0.0)
    for (day <- 0 until 3) {
      val u = units.filter(_._1 == day)
      val n = u.size.toDouble
      val r1 = u.count(_._2 == 0L).toDouble
      val c1 = u.count(_._3 == 1).toDouble
      sumA += u.count(x => x._2 == 0L && x._3 == 1)
      sumE += r1 * c1 / n
      sumV += r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1.0))
    }
    assert(r.getAs[Long]("n_strata") == 3L)
    assert(r.getAs[Long]("sum_a") == sumA.toLong)
    assert(math.abs(r.getAs[Double]("cmh_stat") -
      (sumA - sumE) * (sumA - sumE) / sumV) < 2e-5)
  }

  // ---- difference-in-differences -----------------------------------

  test("diffInDiff: DiD recomputes from the four cell means") {
    val ev = Seq.tabulate(100)(i =>
      (i.toLong, f"2024-01-${i % 10 + 1}%02d 08:00:00", s"u${i % 23}",
        "view", Some((i % 7) * 1.5), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = StatsAnalytics.diffInDiff(ev).collect()(0)
    val vmap = ev.select(col("user_id"), graft.operators.Sampling
        .hashBucket(col("user_id"), 2).cast("long").as("v"))
      .distinct().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // d0=Jan1, d1=Jan10 → mid = Jan1 + floor(9/2) = Jan 5; post = d > 5
    val cells = (0 until 100).map { i =>
      ((vmap(s"u${i % 23}"), if (i % 10 + 1 > 5) 1 else 0),
        (i % 7) * 1.5)
    }.groupBy(_._1).view.mapValues(xs =>
      xs.map(_._2).sum / xs.size).toMap
    val did = (cells((1L, 1)) - cells((1L, 0))) -
      (cells((0L, 1)) - cells((0L, 0)))
    assert(r.getAs[Long]("n00") + r.getAs[Long]("n01") +
      r.getAs[Long]("n10") + r.getAs[Long]("n11") == 100L)
    assert(math.abs(r.getAs[Double]("did") - did) < 2e-5)
  }

  // ---- Wilson funnel CI --------------------------------------------

  test("funnelCi: hand-recomputed Wilson bounds bracket the rate") {
    val rows = (1 to 4).map(i => (s"u$i", "signup")) :+ (("u1", "purchase"))
    val ev = rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, "2024-01-01 00:00:00", u, t, Some(1.0), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = graft.analytics.EventAnalytics.funnelCi(ev).collect()(0)
    assert(r.getAs[Long]("n_signup") == 4L &&
      r.getAs[Long]("n_purchase") == 1L)
    assert(r.getAs[Double]("rate") == 0.25)
    val (z, n, p) = (1.96, 4.0, 0.25)
    val denom = 1.0 + z * z / n
    val center = (p + z * z / (2.0 * n)) / denom
    val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)) /
      denom
    assert(math.abs(r.getAs[Double]("wilson_lo") - (center - half)) < 1e-5)
    assert(math.abs(r.getAs[Double]("wilson_hi") - (center + half)) < 1e-5)
    assert(r.getAs[Double]("wilson_lo") <= 0.25 &&
      0.25 <= r.getAs[Double]("wilson_hi"))
    assert(r.getAs[Double]("wilson_lo") >= 0.0 &&
      r.getAs[Double]("wilson_hi") <= 1.0)
  }

  // ---- partitioning invariance + plan pins -------------------------

  test("welchTTest / tCloseness / mediaNearDup: partitioning-invariant " +
    "(decimal folds leave nothing to the scheduler)") {
    val ev = Seq.tabulate(120)(i =>
      (i.toLong, "2024-01-01 00:00:00", s"u${i % 37}", "view",
        Some((i % 11) * 1.25), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    assert(StatsAnalytics.welchTTest(ev).collect().toSeq ==
      StatsAnalytics.welchTTest(ev.repartition(13)).collect().toSeq)
    assert(StatsAnalytics.tCloseness(ev).collect().toSeq ==
      StatsAnalytics.tCloseness(ev.repartition(13)).collect().toSeq)
    val txt = "the quick brown fox jumps over the lazy dog " * 4
    val docs = docsDf(Seq(("1", txt, "en", "s", 10L),
      ("2", txt, "en", "s", 10L), ("3", "0123456789" * 18, "en", "s", 10L)))
      .withColumn("doc_id", col("doc_id").cast("long"))
    assert(graft.ext.Multimodal.mediaNearDup(docs).collect().toSeq ==
      graft.ext.Multimodal.mediaNearDup(docs.repartition(7))
        .collect().toSeq)
  }

  test("hitsOnEdges plan: id-keyed hash joins only — no cartesian, no " +
    "window, no per-round sort of the edge frame") {
    val e = Seq.tabulate(40)(i => (i.toLong % 7, 100L + i % 11))
      .toDF("c", "p").distinct()
    val plan = GraphAnalytics.hitsOnEdges(e, 2, 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("WindowExec"), plan)
  }

  test("fertility/kappa plans stay map-side: no window, no join") {
    val docs = docsDf(Seq(("d1", "a b", "en", "s", 10L)))
    for (df <- Seq(TextAnalysis.tokenizerFertility(docs),
        EvalOps.fleissKappa(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec"), plan)
      assert(!plan.contains("Join"), plan)
    }
  }
}
