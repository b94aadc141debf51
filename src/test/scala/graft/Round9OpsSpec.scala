package graft

import org.apache.spark.sql.functions.col
import graft.analytics.StatsAnalytics

/** Round-9 additions: concentration (Gini), drift (PSI), independence
  * (chi-square), RFM segmentation, and exact-weight EWMA. Hand-built
  * fixtures with answers computed by hand. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDf(rows: Seq[(Long, Double, String)]) =
    rows.toDF("o_custkey", "o_totalprice", "s")
      .select(col("o_custkey"), col("o_totalprice"),
        col("s").cast("timestamp").as("o_orderdate"))

  test("giniBySegment: equal spends give 0, a 10/30 split gives 0.25") {
    // A: four customers at 100 each → perfect equality, G = 0.
    // B: spends 10 and 30 → G = 2·(1·10+2·30)/(2·40) − 3/2 = 0.25.
    val orders = ordersDf(Seq(
      (1L, 100.0, "2024-01-01 00:00:00"), (2L, 100.0, "2024-01-01 00:00:00"),
      (3L, 100.0, "2024-01-01 00:00:00"), (4L, 100.0, "2024-01-01 00:00:00"),
      (5L, 10.0, "2024-01-01 00:00:00"), (6L, 30.0, "2024-01-01 00:00:00")))
    val customer = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"), (5L, "B"), (6L, "B")
    ).toDF("c_custkey", "c_mktsegment")
    val out = StatsAnalytics.giniBySegment(orders, customer)
      .select("segment", "n_customers", "total_spend", "gini")
      .as[(String, Long, Double, Double)].collect().toList
    assert(out == List(("A", 4L, 400.0, 0.0), ("B", 2L, 40.0, 0.25)))
  }

  test("psiDrift: identical per-half distributions have zero drift") {
    // days Jan 1..3 → mid = Jan 2; the same {1.0, 2.0} multiset lands in
    // each half, so every smoothed share pair is equal and PSI = 0.
    val ev = Seq(
      ("a", 1.0, "2024-01-01 10:00:00"), ("a", 2.0, "2024-01-01 11:00:00"),
      ("a", 1.0, "2024-01-03 10:00:00"), ("a", 2.0, "2024-01-03 11:00:00")
    ).toDF("event_type", "value", "s")
      .select(col("event_type"), col("value"),
        col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.psiDrift(ev)
      .select("event_type", "n_early", "n_late", "n_bins", "psi")
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(out == List(("a", 2L, 2L, 2L, 0.0)))
  }

  test("chiSquare: report shape is (k-1 dof, full n split) and chi2 >= 0") {
    val ev = (1L to 40L).map(u =>
      (u, if (u % 2 == 0) "click" else "view")).toDF("user_id", "event_type")
    val out = StatsAnalytics.chiSquare(ev)
      .select("k_types", "n_a", "n_b", "dof", "chi2")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(out._1 == 2L && out._4 == 1L)
    assert(out._2 + out._3 == 40L)
    assert(out._5 >= 0.0)
  }

  test("rfmSegments: monotone customers land on the quintile diagonal") {
    // customer i has i orders of 100 each on day i → recency, frequency,
    // and monetary all rank i, so each lands in cell (i,i,i) alone.
    val rows = for {
      i <- 1 to 5
      _ <- 1 to i
    } yield (i.toLong, 100.0, f"2024-01-0$i 00:00:00")
    val out = StatsAnalytics.rfmSegments(ordersDf(rows))
      .select("r_score", "f_score", "m_score", "n_customers",
        "segment_revenue")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(out == (1 to 5).map(i =>
      (i.toLong, i.toLong, i.toLong, 1L, 100.0 * i)).toList)
  }

  test("bpeLearn: greedy leftmost merges, including overlapping runs") {
    // words: "aaa"×2, "ab"×3.
    // r1: (a,a) count 4 beats (a,b) 3; in "aaa" only pos 1 merges
    //     (leftmost-greedy) → "aa"+"a"; tokens after = 2·2 + 2·3 = 10
    // r2: (a,b) count 3 beats (aa,a) 2; "ab" collapses → after = 4+3 = 7
    // r3: (aa,a) count 2; "aaa" collapses → after = 2+3 = 5
    val docs = Seq((1L, "aaa aaa ab ab ab")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bpeLearn(docs)
      .select("merge_rank", "lsym", "rsym", "pair_count",
        "corpus_tokens_after")
      .as[(Long, String, String, Long, Long)].collect().toList
    assert(out == List(
      (1L, "a", "a", 4L, 10L),
      (2L, "a", "b", 3L, 7L),
      (3L, "aa", "a", 2L, 5L)))
  }

  test("bpeVocab: the census reflects the fully merged words") {
    // after the three merges above both words collapse to single tokens
    val docs = Seq((1L, "aaa aaa ab ab ab")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bpeVocab(docs)
      .select("sym", "weighted_freq", "n_positions")
      .as[(String, Long, Long)].collect().toList
    assert(out == List(("ab", 3L, 1L), ("aaa", 2L, 1L)))
  }

  test("silhouette: perfect members score 1, a 0.6/0.8 straddler 0.5") {
    // centroids: vec 0 = x-axis, vec 40 = y-axis. vec 1 sits on x (sil 1);
    // vec 2 = (0.6, 0.8) → own sim .8, other .6 → (.8−.6)/(1−.6) = 0.5.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.6f, 0.8f)), (40L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.silhouette(emb)
      .select("centroid_id", "n_members", "mean_silhouette")
      .as[(Long, Long, Double)].collect().toList
    assert(out == List((0L, 2L, 1.0), (40L, 2L, 0.75)))
  }

  test("bfsHops: a path graph expands one hop per round, tail unreached") {
    // path 1-2-3-4-5, 3 rounds from seed 1 → hops 0..3 reach 1..4; node 5
    // stays outside the census.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val sym = pairs.unionAll(pairs.select(col("b").as("a"),
      col("a").as("b")))
    val out = graft.analytics.GraphAnalytics.bfsHops(sym, 3)
      .select("hop", "n_nodes", "min_node", "max_node")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (0L, 1L, 1L, 1L), (1L, 1L, 2L, 2L),
      (2L, 1L, 3L, 3L), (3L, 1L, 4L, 4L)))
  }

  test("incrementalAgg: merged base+delta partials equal the flat totals") {
    // days Jan 1..3 → mid Jan 2: base = {1.0, 2.0}, delta = {4.0}
    val ev = Seq(
      ("a", 1.0, "2024-01-01 10:00:00"), ("a", 2.0, "2024-01-02 10:00:00"),
      ("a", 4.0, "2024-01-03 10:00:00")
    ).toDF("event_type", "value", "s")
      .select(col("event_type"), col("value"),
        col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.incrementalAgg(ev)
      .select("event_type", "n_events", "total_value", "n_base", "n_delta")
      .as[(String, Long, Double, Long, Long)].collect().toList
    assert(out == List(("a", 3L, 7.0, 2L, 1L)))
  }

  test("rrfFusion: both-modality docs outrank single-modality docs, and " +
    "missing ranks stay NULL") {
    // vec 0 is the query; vec 1 is identical (semantic rank 1), vec 2
    // orthogonal. Lexically only docs 0 and 1 contain query terms.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val docs = Seq(
      (0L, "table join"), (1L, "table table spark"), (2L, "nothing here")
    ).toDF("doc_id", "text")
    val out = graft.ext.Similarity.rrfFusion(docs, emb)
      .select("id", "r_sem", "r_lex", "rrf")
      .as[(Long, Option[Long], Option[Long], Double)].collect().toList
    val byId = out.map(r => r._1 -> r).toMap
    // doc 1 is ranked by both modalities and fuses to the top
    assert(out.head._1 == 1L)
    assert(byId(1L)._2.isDefined && byId(1L)._3.isDefined)
    // the query doc is excluded semantically but may rank lexically
    assert(byId(0L)._2.isEmpty && byId(0L)._3.isDefined)
    // vec 2 has no query terms: semantic-only
    assert(byId(2L)._2.isDefined && byId(2L)._3.isEmpty)
    // the fused score is exactly the two reciprocal terms
    val r1 = byId(1L)
    val expect = BigDecimal(1.0 / (60.0 + r1._2.get) +
      1.0 / (60.0 + r1._3.get)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(r1._4 == expect.toDouble)
  }

  test("cuped: a perfectly predictive covariate removes all variance") {
    // y = 2x per user → theta 2, var_adj 0, ratio 0
    val ev = Seq(
      (1L, 1.0, "2024-01-01 09:00:00"), (1L, 2.0, "2024-01-03 09:00:00"),
      (2L, 2.0, "2024-01-01 09:00:00"), (2L, 4.0, "2024-01-03 09:00:00"),
      (3L, 3.0, "2024-01-01 09:00:00"), (3L, 6.0, "2024-01-03 09:00:00")
    ).toDF("user_id", "value", "s")
      .select(col("user_id"), col("value"),
        col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.cuped(ev)
      .select("n_users", "theta", "var_y", "var_adj", "var_ratio")
      .as[(Long, Option[Double], Double, Option[Double], Option[Double])]
      .collect().head
    assert(out == ((3L, Some(2.0), 2.666667, Some(0.0), Some(0.0))))
  }

  test("mmrSelect: the third pick pays the redundancy penalty") {
    // q=[1,0]; a=[1,0] rel 1; b=[.8,.6] rel .8 (psim a·b=.8, b·c=.96);
    // c=[.6,.8] rel .6. Picks: a (mmr 1), b (.7·.8−.3·.8=.32),
    // c (maxsim .96 → .7·.6−.3·.96=.132).
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.8f, 0.6f)), (3L, Seq(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.mmrSelect(emb)
      .select("sel_rank", "id", "rel", "mmr")
      .as[(Long, Long, Double, Double)].collect().toList
    assert(out == List(
      (1L, 1L, 1.0, 1.0),
      (2L, 2L, 0.8, 0.32),
      (3L, 3L, 0.6, 0.132)))
  }

  test("acfDaily: an alternating series has the alternating-sign ACF") {
    // x = 0,2,0,2,0,2 → centered ±1, den 6; lag k sums (6−k) products of
    // sign (−1)^k; empty lags keep (0, NULL) on both engines.
    val ev = (1 to 6).map(i =>
      (if (i % 2 == 1) 0.0 else 2.0, f"2024-01-0$i 09:00:00"))
      .toDF("value", "s")
      .select(col("value"), col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.acfDaily(ev)
      .select("lag", "n_pairs", "acf")
      .as[(Long, Long, Option[Double])].collect().toList
    assert(out == List(
      (1L, 5L, Some(-0.833333)), (2L, 4L, Some(0.666667)),
      (3L, 3L, Some(-0.5)), (4L, 2L, Some(0.333333)),
      (5L, 1L, Some(-0.166667)), (6L, 0L, None), (7L, 0L, None)))
  }

  test("mdeReport: constant outcomes give zero variance and zero MDE") {
    val ev = (1L to 40L).map(u => (u, 5.0)).toDF("user_id", "value")
    val out = StatsAnalytics.mdeReport(ev)
      .select("n_a", "n_b", "mean_y", "var_pooled", "mde_abs")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(out._1 + out._2 == 40L && out._1 > 0 && out._2 > 0)
    assert(out._3 == 5.0 && out._4 == 0.0 && out._5 == 0.0)
  }

  test("DataContract: each planted violation is counted exactly once") {
    val orders = Seq((1L, 10L, "1995-01-01 00:00:00"),
      (2L, 99L, "1995-01-02 00:00:00")) // custkey 99 is the orphan
      .toDF("o_orderkey", "o_custkey", "s")
      .select(col("o_orderkey"), col("o_custkey"),
        col("s").cast("timestamp").as("o_orderdate"))
    val customer = Seq((10L, "A")).toDF("c_custkey", "c_mktsegment")
    val lineitem = Seq((1L, 100L), (2L, 200L), (3L, 300L))
      .toDF("l_orderkey", "l_partkey") // orderkey 3 is the orphan
    val events = Seq(
      (1L, Some(1L), Some(1.0)), (1L, Some(2L), Some(-3.0)), // dup id, neg
      (2L, None, None)                                       // null user
    ).toDF("event_id", "user_id", "value")
    val out = graft.operators.DataContract
      .report(orders, customer, lineitem, events)
      .select("check_name", "n_violations", "n_checked")
      .as[(String, Long, Long)].collect().toList
    assert(out == List(
      ("events_id_unique", 1L, 3L),
      ("events_user_present", 1L, 3L),
      ("events_value_nonnegative", 1L, 2L),
      ("lineitem_orders_fk", 1L, 3L),
      ("orders_customer_fk", 1L, 2L)))
  }

  test("curriculumSchedule: distinct quality scores stage one doc each") {
    val docs = Seq(
      (1L, "the the a in"), (2L, "the and x y"),
      (3L, "the x y z"), (4L, "x y z w")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.curriculumSchedule(docs)
      .select("stage", "n_docs", "total_tokens", "mean_quality")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (1L, 1L, 4L, 1.0), (2L, 1L, 4L, 0.5),
      (3L, 1L, 4L, 0.25), (4L, 1L, 4L, 0.0)))
  }

  test("kAnonymity: a 2-member quasi-identifier group is flagged") {
    val ev = (Seq.fill(6)(("a", 10.0, "2024-01-01 09:00:00")) ++
      Seq.fill(2)(("b", 10.0, "2024-01-01 09:00:00")))
      .toDF("event_type", "value", "s")
      .select(col("event_type"), col("value"),
        col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.kAnonymity(ev)
      .select("n_groups", "n_unsafe_groups", "rows_at_risk",
        "min_group_size", "k")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((2L, 1L, 2L, 2L, 5L)))
  }

  test("backfillPlan: only dates holding late rows need recompute") {
    val ev = Seq(
      (1L, "2024-01-01 09:00:00"), (2L, "2024-01-01 10:00:00"),
      (97L, "2024-01-01 11:00:00"), // the late row
      (3L, "2024-01-02 09:00:00"), (4L, "2024-01-02 10:00:00")
    ).toDF("event_id", "s")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.backfillPlan(ev)
      .select("n_old", "n_new", "needs_backfill")
      .as[(Long, Long, Int)].collect().toList
    assert(out == List((2L, 3L, 1), (2L, 2L, 0)))
  }

  test("robustTrend: even pair count averages the two middle slopes") {
    // x = 1,2,4,8 → slopes {1, 1.5, 7/3, 2, 3, 4}; middles 2 and 7/3 →
    // Theil-Sen 13/6; all pairs increase → S = 6.
    val ev = Seq(
      (1.0, "2024-01-01 09:00:00"), (2.0, "2024-01-02 09:00:00"),
      (4.0, "2024-01-03 09:00:00"), (8.0, "2024-01-04 09:00:00")
    ).toDF("value", "s")
      .select(col("value"), col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.robustTrend(ev)
      .select("n_days", "n_pairs", "theil_sen_slope", "mk_s", "mk_z")
      .as[(Long, Long, Double, Long, Option[Double])].collect().head
    assert(out._1 == 4L && out._2 == 6L && out._3 == 2.166667 &&
      out._4 == 6L)
    val expZ = BigDecimal((6.0 - 1.0) /
      math.sqrt(4.0 * 3.0 * 13.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._5.contains(expZ))
  }

  test("ltvCohorts: cumulative value accrues per cohort and offset") {
    // u1 cohorts Jan1 (spends 1 then 2 on day 1); u2 cohorts Jan2
    // (spends 10 on day 0). Cells: (Jan1,0,1.0), (Jan1,1,2.0 cum 3.0),
    // (Jan2,0,10.0).
    val ev = Seq(
      (1L, 1.0, "2024-01-01 09:00:00"), (1L, 2.0, "2024-01-02 09:00:00"),
      (2L, 10.0, "2024-01-02 10:00:00")
    ).toDF("user_id", "value", "s")
      .select(col("user_id"), col("value"),
        col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.ltvCohorts(ev)
      .select("day_offset", "n_events", "period_value", "cum_ltv")
      .as[(Long, Long, Double, Double)].collect().toList
    assert(out == List(
      (0L, 1L, 1.0, 1.0), (1L, 1L, 2.0, 3.0), (0L, 1L, 10.0, 10.0)))
  }

  test("ewmaDaily: alpha=1/2 recursion matches the hand-unrolled values") {
    // x = 2, 4, 8 → ewma = 2, 3, 5.5
    val ev = Seq(
      (2.0, "2024-01-01 09:00:00"), (4.0, "2024-01-02 09:00:00"),
      (8.0, "2024-01-03 09:00:00")
    ).toDF("value", "s")
      .select(col("value"), col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.ewmaDaily(ev)
      .select("daily_revenue", "ewma")
      .as[(Double, Double)].collect().toList
    assert(out == List((2.0, 2.0), (4.0, 3.0), (8.0, 5.5)))
  }
}
