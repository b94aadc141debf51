package graft

import java.sql.Timestamp

import graft.analytics.{EventAnalytics, StatsAnalytics}
import graft.ext.EvalOps

/** Round-11 additions: linear multi-touch attribution, exact single
  * change-point detection, isotonic (PAV-minimax) calibration, and
  * co-purchase degree assortativity. Hand-built fixtures with answers
  * computed by hand. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attribution: linear split, window exclusion, direct fallback") {
    // User 1: view+click inside the 7-day window of both purchases (the
    // second view is 8 days out — excluded); each purchase splits evenly.
    // User 2 purchases with no touches — full value to 'direct'.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00"), 1L, "view", None: Option[Double]),
      (2L, ts("2024-01-09 09:00:00"), 1L, "view", None),
      (3L, ts("2024-01-09 10:00:00"), 1L, "click", None),
      (4L, ts("2024-01-10 10:00:00"), 1L, "purchase", Some(100.0)),
      (5L, ts("2024-01-10 11:00:00"), 1L, "purchase", Some(10.0)),
      (6L, ts("2024-01-10 12:00:00"), 2L, "purchase", Some(40.0))
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.attribution(ev)
      .as[(String, Long, Double)].collect().toList
    assert(out == List(
      ("click", 2L, 55.0), ("direct", 1L, 40.0), ("view", 2L, 55.0)))
  }

  test("changePoint: the 10,10,50,50 series splits after day 2") {
    val orders = Seq(
      (1L, ts("2024-03-01 00:00:00"), 10.0),
      (2L, ts("2024-03-02 00:00:00"), 10.0),
      (3L, ts("2024-03-03 00:00:00"), 50.0),
      (4L, ts("2024-03-04 00:00:00"), 50.0)
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = StatsAnalytics.changePoint(orders)
      .select("split_day", "n_days_before", "n_days_after",
        "mean_before", "mean_after", "b_stat")
      .as[(java.sql.Date, Long, Long, Double, Double, Double)]
      .collect().toList
    // B(2) = 2·2/4·(10−50)² = 1600, strictly above B(1) = B(3) ≈ 533.3
    assert(out == List(
      (java.sql.Date.valueOf("2024-03-02"), 2L, 2L, 10.0, 50.0, 1600.0)))
  }

  test("isotonicCalibration: pools the violating bins to the PAV fit") {
    // Bin rates (weight): 0.5 (2 docs), 0.0 (1), 1.0 (1) — the first two
    // violate monotonicity and pool to 1/3; the last stays at 1.
    val docs = Seq(
      (1L, "x y", "en"), (2L, "z w", "de"),
      (3L, "the x x x", "de"), (4L, "the the", "en")
    ).toDF("doc_id", "text", "lang")
    val out = EvalOps.isotonicCalibration(docs)
      .as[(Long, Long, Long, Double, Double)].collect().toList
    assert(out == List(
      (0L, 2L, 1L, 0.5, 0.333333),
      (25L, 1L, 0L, 0.0, 0.333333),
      (100L, 1L, 1L, 1.0, 1.0)))
    // the fitted curve is monotone even where the raw rates are not
    val iso = out.map(_._5)
    assert(iso == iso.sorted)
  }

  test("kCorePeel: path peels inward round by round, triangle survives") {
    // Path 1-2-3-4-5 + triangle 6-7-8: round 1 removes the path's
    // endpoints, round 2 its new endpoints, round 3 the isolated middle
    // (a node with NO remaining edges must still be peeled); the
    // triangle is the 2-core.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L)).toDF("a", "b")
    val sym = und.unionAll(und.select($"b".as("a"), $"a".as("b")))
    val out = graft.analytics.GraphAnalytics.kCorePeel(sym, k = 2, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (1L, 2L, 1L, 5L), (2L, 2L, 2L, 4L), (3L, 1L, 3L, 3L),
      (4L, 3L, 6L, 8L)))
  }

  test("cfHitRate: counts bounded, ratio matches the portable round") {
    val out = graft.ext.EvalOps.cfHitRate(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect().toList
    assert(out.size == 1)
    val (nEval, nHits, rate) = out.head
    assert(nEval > 0L && nHits >= 0L && nHits <= nEval)
    assert(rate == math.floor(
      nHits.toDouble / nEval.toDouble * 1000000.0 + 0.5) / 1000000.0)
  }

  test("cfHitRate: the corpus never re-shuffles — the one keyed exchange " +
    "sits ABOVE the partial per-order aggregate (pre-reduced hit bits), " +
    "and the neighbour probe broadcasts") {
    val df = graft.ext.EvalOps.cfHitRate(spark, "/root/testdata/sf0.001")
    df.collect()
    // AdaptiveSparkPlan's toString repeats the tree under "== Initial
    // Plan ==" — inspect only the executed (final) section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val keyed = "Exchange hashpartitioning\\(l_orderkey".r
      .findAllMatchIn(plan).size
    assert(keyed == 1, s"expected 1 l_orderkey exchange, got $keyed:\n" +
      plan.take(1200))
    // ...and that exchange must move the PRE-REDUCED per-order bits: the
    // partial max must appear below it (later in toString), so the
    // exploded/probed basket rows collapse map-side before any shuffle
    val exIdx = plan.indexOf("Exchange hashpartitioning(l_orderkey")
    val partialIdx = plan.indexOf("partial_max")
    assert(partialIdx > exIdx && exIdx >= 0,
      s"partial_max should sit below the exchange:\n" + plan.take(1200))
    // the neighbour probe must be a broadcast hash join, never a shuffle
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("lDiversity: homogeneous group flagged even though it is large") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 10.0),
      (2L, ts("2024-01-01 11:00:00"), 2L, "view", 12.0),
      (3L, ts("2024-01-01 12:00:00"), 3L, "view", 14.0),
      (4L, ts("2024-01-01 13:00:00"), 1L, "click", 10.0),
      (5L, ts("2024-01-01 14:00:00"), 1L, "click", 12.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = StatsAnalytics.lDiversity(ev)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // the 3-user view group is safe; the 2-row click group is all one
    // user — low diversity despite being a multi-row group
    assert(out == List((2L, 1L, 2L, 1L, 3L)))
  }

  test("lorenzDeciles: 1..10 spends give the triangular cumulative shares") {
    val orders = (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("o_custkey", "o_totalprice")
    val out = StatsAnalytics.lorenzDeciles(orders)
      .as[(Long, Long, Double, Double)].collect().toList
    val cum = List(0.018182, 0.054545, 0.109091, 0.181818, 0.272727,
      0.381818, 0.509091, 0.654545, 0.818182, 1.0)
    assert(out == (1 to 10).map(i =>
      (i.toLong, 1L, i.toDouble, cum(i - 1))).toList)
  }

  test("burstiness: constant arrivals give fano 0, dispersed give 1") {
    val ev = Seq(
      // type a: 2,2,2 per day — variance 0
      (1L, ts("2024-01-01 01:00:00"), "a"), (2L, ts("2024-01-01 02:00:00"), "a"),
      (3L, ts("2024-01-02 01:00:00"), "a"), (4L, ts("2024-01-02 02:00:00"), "a"),
      (5L, ts("2024-01-03 01:00:00"), "a"), (6L, ts("2024-01-03 02:00:00"), "a"),
      // type b: 1,3 per day — mean 2, sample variance 2, fano 1
      (7L, ts("2024-01-01 03:00:00"), "b"),
      (8L, ts("2024-01-02 03:00:00"), "b"), (9L, ts("2024-01-02 04:00:00"), "b"),
      (10L, ts("2024-01-02 05:00:00"), "b"),
      // type c: a single day — dropped (variance undefined)
      (11L, ts("2024-01-01 06:00:00"), "c")
    ).toDF("event_id", "ts", "event_type")
    val out = StatsAnalytics.burstiness(ev)
      .as[(String, Long, Double, Double, Double)].collect().toList
    assert(out == List(("a", 3L, 2.0, 0.0, 0.0), ("b", 2L, 2.0, 2.0, 1.0)))
  }

  test("brandModularity: contributions sum to Q, accounting closes") {
    val out = graft.analytics.GraphAnalytics
      .brandModularity(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Double, Double)].collect().toList
    assert(out.nonEmpty && out.size <= 25)
    val q = out.map(_._6).distinct
    assert(q.size == 1, s"q_modularity must repeat identically: $q")
    assert(q.head >= -0.5 && q.head <= 1.0)
    // per-brand contributions re-aggregate to Q (within the 6dp rounds)
    assert(math.abs(out.map(_._5).sum - q.head) < out.size * 1e-6)
    // degree accounting: Σ d_c = 2m and Σ e_c ≤ m
    val m2 = out.map(_._4).sum
    assert(m2 % 2 == 0 && out.map(_._3).sum <= m2 / 2)
  }

  test("refIntegrity: all six star edges audited, fixture has no orphans") {
    val out = graft.analytics.StarAnalytics
      .refIntegrity(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double)].collect().toList
    assert(out.map(_._1) == List("customer->nation", "lineitem->orders",
      "lineitem->part", "lineitem->supplier", "orders->customer",
      "supplier->nation"))
    out.foreach { case (rel, nKeys, nOrph, pct) =>
      assert(nKeys > 0L, rel)
      assert(nOrph == 0L && pct == 0.0, s"$rel has orphans")
    }
  }

  test("degreeDistribution: histogram closes over 2m, alpha above 1") {
    val out = graft.analytics.GraphAnalytics
      .degreeDistribution(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out.nonEmpty && out.map(_._1) == out.map(_._1).sorted)
    // sum of degree·count is the directed edge count — always even
    assert(out.map(t => t._1 * t._2).sum % 2 == 0)
    val (nTail, alpha) = (out.head._3, out.head._4)
    assert(out.forall(t => t._3 == nTail && t._4 == alpha))
    // every tail node contributes ln(deg/1.5) ≥ ln(4/3) > 0
    assert(nTail > 0L && alpha > 1.0)
  }

  test("audienceOverlap: set algebra by hand, zero-overlap pairs absent") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "view"),
      (3L, ts("2024-01-01 12:00:00"), 2L, "click"),
      (4L, ts("2024-01-01 13:00:00"), 3L, "click"),
      (5L, ts("2024-01-01 14:00:00"), 1L, "purchase"),
      (6L, ts("2024-01-01 15:00:00"), 2L, "view") // dup (view, 2) — distinct
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.audienceOverlap(ev)
      .as[(String, String, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      ("click", "view", 2L, 2L, 1L, 0.333333),
      ("purchase", "view", 1L, 2L, 1L, 0.5)))
  }

  test("stickiness: avg DAU over MAU per month") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "view"),
      (3L, ts("2024-01-02 10:00:00"), 1L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.stickiness(ev)
      .as[(java.sql.Date, Long, Long, Double, Double)].collect().toList
    assert(out == List(
      (java.sql.Date.valueOf("2024-01-01"), 2L, 2L, 1.5, 0.75)))
  }

  test("supplierHhi: bounds 1/n <= HHI <= 1, equivalent_n <= n_suppliers") {
    val out = graft.analytics.StarAnalytics
      .supplierHhi(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double, Double, Double)].collect().toList
    assert(out.nonEmpty)
    out.foreach { case (nation, n, total, hhi, eqN) =>
      assert(total > 0.0, nation)
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6, s"$nation hhi $hhi")
      assert(eqN <= n + 1e-6, s"$nation equivalent_n $eqN > $n")
    }
  }

  test("wowGrowth: hand-built two-week series gives 0.5 growth") {
    val orders = Seq(
      (1L, ts("2024-01-01 00:00:00"), 40.0),
      (2L, ts("2024-01-03 00:00:00"), 60.0),
      (3L, ts("2024-01-10 00:00:00"), 150.0)
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = StatsAnalytics.wowGrowth(orders)
      .as[(java.sql.Date, Double, Option[Double])].collect().toList
    assert(out == List(
      (java.sql.Date.valueOf("2024-01-01"), 100.0, None),
      (java.sql.Date.valueOf("2024-01-08"), 150.0, Some(0.5))))
  }

  test("coldStartParts: per-brand accounting closes, pct is the portable round") {
    val out = graft.analytics.StarAnalytics
      .coldStartParts(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double)].collect().toList
    assert(out.nonEmpty)
    out.foreach { case (brand, nParts, nCold, pct) =>
      assert(nCold >= 0L && nCold <= nParts, brand)
      assert(pct == math.floor(
        nCold.toDouble / nParts * 1000000.0 + 0.5) / 1000000.0, brand)
    }
  }

  test("assortativity: directed edge count is even, r stays in [-1, 1]") {
    val out = graft.analytics.GraphAnalytics
      .assortativity(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Double)].collect().toList
    assert(out.size == 1)
    val (nEdges, meanDeg, r) = out.head
    // both directions of every undirected edge are present
    assert(nEdges > 0L && nEdges % 2 == 0)
    assert(meanDeg >= 1.0)
    assert(r >= -1.0 && r <= 1.0)
  }
}
