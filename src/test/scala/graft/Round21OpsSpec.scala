package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.analytics.StatsAnalytics

/** Round-11-of-build additions: Mann–Whitney rank-sum, Spearman rank
  * correlation, Theil inequality decomposition, Wald–Wolfowitz runs
  * test, and Cramér's V. Hand-traced fixtures plus plan pins. */
class Round21OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Mann–Whitney ------------------------------------------------

  test("mannWhitney: hand-traced ranks, ties, U, and tie-corrected z") {
    // A: x = 1,2,2   B: x = 2,3
    // avg ranks: 1→1, 2→3 (ranks 2,3,4), 3→5
    // R_a = 1+3+3 = 7 → U_a = 7 − 3·4/2 = 1; U_b = 6−1 = 5
    // mu = 3; tsum = 3³−3 = 24
    // sigma² = (6/12)·((5+1) − 24/20) = 0.5·4.8 = 2.4 → sigma ≈ 1.549193
    // z = (1−3)/1.549193 = −1.290994
    val per = Seq((1L, 0), (2L, 0), (2L, 0), (2L, 1), (3L, 1))
      .toDF("x", "g")
    val r = StatsAnalytics.mannWhitneyOnGroups(per).collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_a") == 1.0)
    assert(r.getAs[Double]("u_b") == 5.0)
    assert(r.getAs[Double]("mu_u") == 3.0)
    assert(r.getAs[Double]("sigma_u") == 1.549193)
    assert(r.getAs[Double]("z") == -1.290994) // floor(−1290994.44+.5)/1e6
  }

  // ---- Spearman ----------------------------------------------------

  test("spearmanBreadth: monotone fixture gives rho = 1") {
    val orders = Seq(
      (10L, 1L), (20L, 2L), (21L, 2L), (30L, 3L), (31L, 3L), (32L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (10L, 100L),
      (20L, 100L), (21L, 101L),
      (30L, 100L), (31L, 101L), (32L, 102L))
      .toDF("l_orderkey", "l_partkey")
    val r = StatsAnalytics.spearmanBreadth(orders, li).collect()(0)
    assert(r.getAs[Long]("n_customers") == 3L)
    assert(r.getAs[Double]("rho_spearman") == 1.0)
    assert(r.getAs[Double]("r_pearson") == 1.0)
  }

  test("spearmanBreadth: tie-averaged ranks, hand-traced rho") {
    // customers: (x, y) = (1,1), (1,2), (2,2)
    // rx: value 1 → (0+ (2+1)/2)=1.5, value 2 → 3
    // ry: value 1 → 1, value 2 → (1 + (2+1)/2) = 2.5
    // ranks: (1.5,1), (1.5,2.5), (3,2.5)
    // n=3 Σrx=6 Σry=6 Σrx²=13.5 Σry²=13.5 Σrxry=13.125... compute:
    // 1.5·1 + 1.5·2.5 + 3·2.5 = 1.5+3.75+7.5 = 12.75
    // num = 3·12.75 − 36 = 2.25; den = sqrt((3·13.5−36)²) = 4.5
    // rho = 0.5
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 3L), (31L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (10L, 100L),
      (20L, 100L), (20L, 101L),
      (30L, 100L), (31L, 101L))
      .toDF("l_orderkey", "l_partkey")
    val r = StatsAnalytics.spearmanBreadth(orders, li).collect()(0)
    assert(r.getAs[Double]("rho_spearman") == 0.5)
  }

  // ---- Theil -------------------------------------------------------

  test("theilIndex: equal within-segment spends decompose to between only") {
    val orders = Seq(
      (1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 3L, 2.0), (4L, 4L, 2.0))
      .map { case (k, c, p) => (k, c, p, "O") }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val cust = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val rows = StatsAnalytics.theilIndex(orders, cust).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // within each segment spends are equal → T_g = 0
    assert(byKey(("within", "A")).getAs[Double]("theil") == 0.0)
    assert(byKey(("within", "B")).getAs[Double]("theil") == 0.0)
    // X=6, shares 1/3 and 2/3; μ=1.5, μ_A=1, μ_B=2
    // T_b = (1/3)ln(2/3) + (2/3)ln(4/3) = 0.056633
    assert(byKey(("between", "__ALL__")).getAs[Double]("theil") == 0.056633)
    assert(byKey(("total", "__ALL__")).getAs[Double]("theil") == 0.056633)
    assert(byKey(("within", "A")).getAs[Double]("spend_share") == 0.333333)
    assert(byKey(("total", "__ALL__")).getAs[Long]("n_customers") == 4L)
  }

  // ---- Runs test ---------------------------------------------------

  test("runsTest: hand-traced runs, mean, sigma, z") {
    // daily values 10,20,10,20,20,10 → median 15
    // signs B A B A A B → 5 runs, n1=n2=3
    // mu = 2·9/6+1 = 4; sigma² = 2·9·(18−6)/(36·5) = 1.2 → 1.095445
    // z = (5−4)/1.095445 = 0.912871
    val ev = (1 to 6).map { i =>
      (i.toLong, ts(f"2024-03-0$i%d 12:00:00"), 1L, "purchase",
        if (Set(2, 4, 5).contains(i)) 20.0 else 10.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = StatsAnalytics.runsTest(ev).collect()(0)
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("n_above") == 3L && r.getAs[Long]("n_below") == 3L)
    assert(r.getAs[Long]("n_runs") == 5L)
    assert(r.getAs[Double]("mu_runs") == 4.0)
    assert(r.getAs[Double]("sigma_runs") == 1.095445)
    assert(r.getAs[Double]("z") == 0.912871)
  }

  test("runsTest: ties at the median drop (odd count keeps median out)") {
    // values 10,20,30 → median 20 dropped → signs B A → 2 runs, n1=n2=1
    val ev = Seq(
      (1L, ts("2024-03-01 12:00:00"), 1L, "purchase", 10.0),
      (2L, ts("2024-03-02 12:00:00"), 1L, "purchase", 20.0),
      (3L, ts("2024-03-03 12:00:00"), 1L, "purchase", 30.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = StatsAnalytics.runsTest(ev).collect()(0)
    assert(r.getAs[Long]("n_days") == 2L)
    assert(r.getAs[Long]("n_runs") == 2L)
  }

  // ---- Cramér's V --------------------------------------------------

  test("cramersV: perfect 2x2 association gives V = 1 (absent cells fold)") {
    // type X only on Mon 2024-03-04, type Y only on Tue 2024-03-05,
    // two events each. Observed cells contribute (2−1)²/1 = 1 each;
    // the two ABSENT cells contribute their expected count 1 each via
    // the N − Σe fold → chi2 = 4, V = sqrt(4/(4·1)) = 1.
    val ev = Seq(
      (1L, ts("2024-03-04 10:00:00"), 1L, "X", 1.0),
      (2L, ts("2024-03-04 11:00:00"), 2L, "X", 1.0),
      (3L, ts("2024-03-05 10:00:00"), 3L, "Y", 1.0),
      (4L, ts("2024-03-05 11:00:00"), 4L, "Y", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = StatsAnalytics.cramersV(ev).collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_types") == 2L && r.getAs[Long]("n_dows") == 2L)
    assert(r.getAs[Double]("chi2") == 4.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  test("cramersV: independent layout gives chi2 = 0") {
    // both types appear equally on both days → e = o for every cell
    val ev = Seq(
      (1L, ts("2024-03-04 10:00:00"), 1L, "X", 1.0),
      (2L, ts("2024-03-05 10:00:00"), 2L, "X", 1.0),
      (3L, ts("2024-03-04 11:00:00"), 3L, "Y", 1.0),
      (4L, ts("2024-03-05 11:00:00"), 4L, "Y", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = StatsAnalytics.cramersV(ev).collect()(0)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  // ---- schema profiling --------------------------------------------

  test("inclusionDeps: containment ratio, FK flag, null exclusion") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L, 9L).toDF("pk")
    val r = graft.operators.DataContract.inclusionDeps(Seq(
      ("c", child, "ck", "p", parent, "pk"))).collect()(0)
    assert(r.getAs[Long]("n_child_distinct") == 3L) // null drops, 3 dedups
    assert(r.getAs[Long]("n_parent_distinct") == 3L)
    assert(r.getAs[Long]("n_contained") == 2L)      // 1,2 ⊆ parent; 3 not
    assert(r.getAs[Double]("containment") == 0.666667)
    assert(r.getAs[Int]("is_fk") == 0)
  }

  test("inclusionDeps: full containment flags the FK") {
    val child = Seq(1L, 2L, 2L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.operators.DataContract.inclusionDeps(Seq(
      ("c", child, "ck", "p", parent, "pk"))).collect()(0)
    assert(r.getAs[Double]("containment") == 1.0)
    assert(r.getAs[Int]("is_fk") == 1)
  }

  test("functionalDeps: violating determinant counted, holds flag") {
    // a=1 → {x}; a=2 → {y,z}: FD fails with exactly one violating key
    val df = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "z"))
      .toDF("a", "b")
    val rows = graft.operators.DataContract.functionalDeps(Seq(
      ("t", df, "a", "b"), ("t2", df, "b", "a")))
    val r = rows.collect()
    val t = r.find(_.getString(0) == "t").get
    assert(t.getAs[Long]("n_lhs") == 2L)
    assert(t.getAs[Long]("n_pairs") == 3L)
    assert(t.getAs[Long]("n_violating_lhs") == 1L)
    assert(t.getAs[Int]("holds") == 0)
    // b → a holds: x→1, y→2, z→2
    val t2 = r.find(_.getString(0) == "t2").get
    assert(t2.getAs[Long]("n_violating_lhs") == 0L)
    assert(t2.getAs[Int]("holds") == 1)
  }

  // ---- OHLC candles ------------------------------------------------

  test("ohlcDaily: open/close by time, high/low, totals, vwap") {
    val ev = Seq(
      (1L, ts("2024-03-01 09:00:00"), 1L, "purchase", 5.0),
      (2L, ts("2024-03-01 12:00:00"), 1L, "purchase", 9.0),
      (3L, ts("2024-03-01 17:00:00"), 1L, "purchase", 3.0),
      (4L, ts("2024-03-01 10:00:00"), 1L, "view", 99.0)) // non-purchase
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.EventAnalytics.ohlcDaily(ev).collect()(0)
    assert(r.getAs[Double]("open") == 5.0)
    assert(r.getAs[Double]("close") == 3.0)
    assert(r.getAs[Double]("high") == 9.0)
    assert(r.getAs[Double]("low") == 3.0)
    assert(r.getAs[Long]("n_trades") == 3L)
    assert(r.getAs[Double]("total") == 17.0)
    assert(r.getAs[Double]("vwap") == 5.666667)
  }

  test("ohlcDaily: same-timestamp ties resolve by event_id, both levels") {
    // two events at the SAME first instant: open must be the lower
    // event_id's value; same at the last instant for close
    val ev = Seq(
      (10L, ts("2024-03-01 09:00:00"), 1L, "purchase", 7.0),
      (11L, ts("2024-03-01 09:00:00"), 1L, "purchase", 2.0),
      (20L, ts("2024-03-01 18:00:00"), 1L, "purchase", 4.0),
      (21L, ts("2024-03-01 18:00:00"), 1L, "purchase", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.EventAnalytics.ohlcDaily(ev).collect()(0)
    assert(r.getAs[Double]("open") == 7.0)  // min event_id at first ts
    assert(r.getAs[Double]("close") == 6.0) // max event_id at last ts
  }

  // ---- Jaccard link prediction -------------------------------------

  test("linkJaccardOnEdges: path graph, hand-traced scores") {
    // path 1-2-3-4: candidates (1,3) and (2,4), both one wedge
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rows = graft.analytics.GraphAnalytics.linkJaccardOnEdges(e, 20)
      .collect()
    assert(rows.length == 2)
    val r13 = rows(0) // jaccard ties → part_a ascending
    assert(r13.getAs[Long]("part_a") == 1L &&
      r13.getAs[Long]("part_b") == 3L)
    assert(r13.getAs[Long]("common_neighbors") == 1L)
    assert(r13.getAs[Long]("deg_u") == 1L && r13.getAs[Long]("deg_v") == 2L)
    assert(r13.getAs[Double]("jaccard") == 0.5)
    assert(rows(1).getAs[Long]("part_a") == 2L &&
      rows(1).getAs[Long]("part_b") == 4L)
  }

  test("linkJaccardOnEdges: adjacent pairs are anti-joined away") {
    // triangle 1-2-3 plus spur 3-4: pair (1,2) shares neighbor 3 but IS
    // an edge → excluded; (1,4)/(2,4) via 3 survive
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rows = graft.analytics.GraphAnalytics.linkJaccardOnEdges(e, 20)
      .collect()
    val pairs = rows.map(r => (r.getAs[Long]("part_a"),
      r.getAs[Long]("part_b"))).toSet
    assert(pairs == Set((1L, 4L), (2L, 4L)))
  }

  // ---- recommendation novelty --------------------------------------

  test("recNovelty: internal consistency on the smallest fixture") {
    val r = graft.ext.EvalOps.recNovelty(spark, "/root/testdata/sf0.001")
      .collect()(0)
    val n = r.getAs[Long]("n_slots")
    val mi = r.getAs[Double]("mean_rec_info")
    val h = r.getAs[Double]("purchase_entropy")
    val lift = r.getAs[Double]("novelty_lift")
    assert(n > 0L)
    assert(mi > 0.0 && h > 0.0)
    // entropy is bounded by log2(catalog distinct items)
    val nItems = graft.analytics.StarAnalytics
      .partFreq(spark, "/root/testdata/sf0.001").count()
    assert(h <= math.log(nItems.toDouble) / math.log(2.0) + 1e-9)
    // the published lift is the r6 difference of the published terms
    assert(math.abs(lift - (mi - h)) < 2e-6)
  }

  // ---- Jaro-Winkler ------------------------------------------------

  test("JaroWinklerSim: battery pinned to DuckDB jaro_winkler_similarity") {
    // expected values captured from DuckDB 'SELECT
    // jaro_winkler_similarity(a, b)' — the oracle's comparator
    val cases = Seq(
      ("", "", 0.0), ("a", "", 0.0), ("x", "y", 0.0),
      ("abc", "abc", 1.0), ("ab", "ba", 0.0),
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("abcdefgh", "abcdefxx", 0.9),          // prefix capped at 4
      ("crate", "trace", 0.7333333333333334), // J>0.7 but prefix 0
      ("aXXXX", "aYYYY", 0.4666666666666666), // below boost threshold
      ("abXXX", "abYYY", 0.6),
      ("abcdXYZ", "abcdQRS", 0.8285714285714286),
      ("prefixxxxlong", "prefixyyylong", 0.9076923076923077))
    cases.foreach { case (a, b, want) =>
      val got = graft.plans.JaroWinklerSim.similarity(a, b)
      assert(got == want, s"similarity($a, $b) = $got, want $want")
    }
  }

  test("jaro_winkler: codegen path agrees with the interpreted reference") {
    graft.plans.JaroWinklerSim.register(spark)
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("aXXXX", "aYYYY"), ("", ""))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        graft.plans.JaroWinklerSim.jaro_winkler(col("a"), col("b"))
          .as("s"))
    df.collect().foreach { r =>
      assert(r.getAs[Double]("s") ==
        graft.plans.JaroWinklerSim.similarity(r.getString(0),
          r.getString(1)))
    }
    // and it is available from plain SQL
    val sql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").collect()(0)
    assert(sql.getAs[Double]("s") == 0.9611111111111111)
  }

  test("jaro_winkler: SQL misuse fails at analysis with a named error") {
    graft.plans.JaroWinklerSim.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler('a')").collect()
    }
    assert(e.getMessage.contains("jaro_winkler"))
  }

  test("jaroLinkage: length-ratio band keeps the exact-name self match") {
    val parts = Seq(
      (10L, "amber linen socks"), (11L, "amber linen sock"),
      (12L, "amber wool plate"), (20L, "navy steel mug"))
      .toDF("p_partkey", "p_name")
    // probe 10: name truncated to "amber linen sock" — exact match with
    // part 11 (sim 1.0) beats the near-match with its own full name
    val r = graft.ext.DedupExt.jaroLinkage(parts, probeMod = 10)
      .collect()
    val p10 = r.find(_.getAs[Long]("probe_id") == 10L).get
    assert(p10.getAs[Long]("matched_id") == 11L)
    assert(p10.getAs[Double]("sim") == 1.0)
    assert(p10.getAs[Long]("n_match") >= 2L) // 11 exact + 10's own name
  }

  // ---- Kendall tau-b -----------------------------------------------

  test("kendallTau: hand-traced concordant/discordant/tie census") {
    // customers (x=orders, y=breadth): (1,1), (2,2), (2,1), (3,3)
    // C=4, D=0, ties_x=1 (x=2 pair), ties_y=1 (y=1 pair)
    // tau_b = 4 / sqrt((6-1)(6-1)) = 0.8
    val orders = Seq(
      (10L, 1L), (20L, 2L), (21L, 2L), (30L, 3L), (31L, 3L),
      (40L, 4L), (41L, 4L), (42L, 4L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (10L, 100L),                             // c1: y=1
      (20L, 100L), (21L, 101L),                // c2: y=2
      (30L, 100L), (31L, 100L),                // c3: y=1
      (40L, 100L), (41L, 101L), (42L, 102L))   // c4: y=3
      .toDF("l_orderkey", "l_partkey")
    val r = graft.analytics.StatsAnalytics.kendallTau(orders, li)
      .collect()(0)
    assert(r.getAs[Long]("n_customers") == 4L)
    assert(r.getAs[Long]("n_concordant") == 4L)
    assert(r.getAs[Long]("n_discordant") == 0L)
    assert(r.getAs[Long]("ties_x") == 1L && r.getAs[Long]("ties_y") == 1L)
    assert(r.getAs[Double]("tau_b") == 0.8)
  }

  // ---- Hurst -------------------------------------------------------

  private def dailySeries(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(f"2024-03-${i + 1}%02d 12:00:00"), 1L, "purchase", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("hurstRS: alternating series is anti-persistent, trend persists") {
    val alt = dailySeries((1 to 30).map(i =>
      if (i % 2 == 0) 20.0 else 10.0))
    val rAlt = graft.analytics.StatsAnalytics.hurstRS(alt).collect()(0)
    assert(rAlt.getAs[Long]("n_days") == 30L)
    assert(rAlt.getAs[Double]("rs_5") > 0.0)
    assert(rAlt.getAs[Double]("hurst") < 0.5,
      s"alternating series should mean-revert: $rAlt")
    val trend = dailySeries((1 to 30).map(i => i * 10.0))
    val rTr = graft.analytics.StatsAnalytics.hurstRS(trend).collect()(0)
    assert(rTr.getAs[Double]("hurst") > 0.7,
      s"linear trend should persist: $rTr")
  }

  test("hurstRS: R/S and H are scale-invariant in the series") {
    val vals = (1 to 30).map(i =>
      10.0 + (i * 2654435761L % 97).toDouble)
    val a = graft.analytics.StatsAnalytics.hurstRS(dailySeries(vals))
      .collect()(0)
    val b = graft.analytics.StatsAnalytics
      .hurstRS(dailySeries(vals.map(_ * 4.0))).collect()(0)
    assert(a.getAs[Double]("hurst") == b.getAs[Double]("hurst"))
    assert(a.getAs[Double]("rs_10") == b.getAs[Double]("rs_10"))
  }

  // ---- readability -------------------------------------------------

  test("readability: vowel groups, sentence floor, vowel-less words") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!", "en", "s", 25L),
      (2L, "grr 123", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.ext.TextAnalysis.readability(docs).collect()
    val r1 = rows(0)
    assert(r1.getAs[Long]("n_words") == 6L)
    assert(r1.getAs[Long]("n_sentences") == 2L)
    assert(r1.getAs[Long]("n_syllables") == 6L)
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    assert(r1.getAs[Double]("flesch") == 119.19)
    val r2 = rows(1)
    assert(r2.getAs[Long]("n_sentences") == 1L) // floor at one
    assert(r2.getAs[Long]("n_syllables") == 2L) // two vowel-less words
  }

  // ---- PR-AUC and Brier decomposition ------------------------------

  private def docsDf2(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, text, lang) => (id, text, lang, "s", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("prAuc: perfect separation scores 1") {
    val docs = docsDf2(Seq(
      (1L, "the and of is to", "en"), (2L, "the of a in and", "en"),
      (3L, "zzz qqq www", "de"), (4L, "xxx yyy zzz", "de")))
    val r = graft.ext.EvalOps.prAuc(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L && r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Double]("pr_auc") == 1.0)
  }

  test("brierDecomp: perfect binned forecasts decompose to res == unc") {
    // sri=10000/y=1 and sri=0/y=0 in equal mass: rel=0, wbv=0,
    // res = unc = 0.25, brier_binned = brier_raw = 0
    val docs = docsDf2(Seq(
      (1L, "the and the", "en"), (2L, "of is a", "en"),
      (3L, "zzz qqq", "de"), (4L, "xxx yyy", "de")))
    val r = graft.ext.EvalOps.brierDecomp(docs).collect()(0)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("within_bin_var") == 0.0)
    assert(r.getAs[Double]("resolution") == 0.25)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    assert(r.getAs[Double]("brier_binned") == 0.0)
    assert(r.getAs[Double]("brier_raw") == 0.0)
  }

  test("brierDecomp: published identity brier_binned = rel - res + unc") {
    val r = graft.ext.EvalOps
      .brierDecomp(Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()(0)
    val lhs = r.getAs[Double]("brier_binned")
    val rhs = r.getAs[Double]("reliability") -
      r.getAs[Double]("resolution") + r.getAs[Double]("uncertainty")
    assert(math.abs(lhs - rhs) < 3e-6)
  }

  // ---- Markov entropy ----------------------------------------------

  test("markovEntropy: deterministic chain has zero rate, full gain") {
    // one user, A→B→A→B: transitions AB,BA,AB — each state fully
    // determines the next → h_rate = 0; marginal = H(2/3, 1/3)
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "A", 1.0),
      (2L, ts("2024-03-01 11:00:00"), 1L, "B", 1.0),
      (3L, ts("2024-03-01 12:00:00"), 1L, "A", 1.0),
      (4L, ts("2024-03-01 13:00:00"), 1L, "B", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.EventAnalytics.markovEntropy(ev).collect()(0)
    assert(r.getAs[Long]("n_transitions") == 3L)
    assert(r.getAs[Long]("n_states") == 2L)
    assert(r.getAs[Double]("h_rate") == 0.0)
    // −(2/3)log2(2/3) − (1/3)log2(1/3) = 0.918296
    assert(r.getAs[Double]("h_marginal") == 0.918296)
    assert(r.getAs[Double]("info_gain") == 0.918296)
  }

  // ---- out-of-order audit ------------------------------------------

  test("oooAudit: backward arrivals counted and measured in seconds") {
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "A", 1.0),
      (2L, ts("2024-03-01 09:59:00"), 1L, "A", 1.0), // 60 s backward
      (3L, ts("2024-03-01 10:05:00"), 1L, "A", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.EventAnalytics.oooAudit(ev).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 2L)
    assert(r.getAs[Long]("n_backward") == 1L)
    assert(r.getAs[Double]("backward_rate") == 0.5)
    assert(r.getAs[Double]("mean_backward_s") == 60.0)
    assert(r.getAs[Double]("max_backward_s") == 60.0)
  }

  // ---- seasonal strength -------------------------------------------

  test("seasonalStrength: pure weekday signal scores 1, flat scores 0") {
    val pure = (1 to 14).map { i =>
      val d = ts(f"2024-03-$i%02d 12:00:00")
      val wd = java.time.LocalDate.of(2024, 3, i).getDayOfWeek.getValue
      (i.toLong, d, 1L, "purchase", wd * 10.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.EventAnalytics.seasonalStrength(pure)
      .collect()(0)
    assert(r.getAs[Long]("n_days") == 14L)
    assert(r.getAs[Double]("var_resid") == 0.0)
    assert(r.getAs[Double]("strength") == 1.0)
    val flat = (1 to 14).map { i =>
      (i.toLong, ts(f"2024-03-$i%02d 12:00:00"), 1L, "purchase", 5.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val rf = graft.analytics.EventAnalytics.seasonalStrength(flat)
      .collect()(0)
    assert(rf.getAs[Double]("strength") == 0.0) // explicit 0/0 guard
  }

  // ---- SAX ---------------------------------------------------------

  test("saxDaily: alternating series symbolizes b/c around the mean") {
    // 30 days of 10/20 alternating: z = ∓1, 5-day PAA = ∓0.2 → b,c,…
    val ev = dailySeries((1 to 30).map(i =>
      if (i % 2 == 0) 20.0 else 10.0))
    val rows = graft.analytics.StatsAnalytics.saxDaily(ev).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[String]("symbol")).mkString ==
      "bcbcbc")
    assert(rows(0).getAs[Double]("paa") == -0.2)
    assert(rows(1).getAs[Double]("paa") == 0.2)
    assert(rows.forall(_.getAs[Long]("n_days") == 5L))
  }

  // ---- cluster bootstrap -------------------------------------------

  test("clusterBootstrap: single-cluster corpus has zero-width CI") {
    // one user → every non-empty resample mean IS the full mean
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "purchase", 2.0),
      (2L, ts("2024-03-01 11:00:00"), 1L, "purchase", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.StatsAnalytics.clusterBootstrap(ev)
      .collect()(0)
    assert(r.getAs[Double]("mean_full") == 3.0)
    assert(r.getAs[Double]("ci_lo") == 3.0)
    assert(r.getAs[Double]("ci_hi") == 3.0)
    assert(r.getAs[Long]("n_users") == 1L)
  }

  test("clusterBootstrap: CI ordered and wider than trivial on fixture") {
    val r = graft.analytics.StatsAnalytics
      .clusterBootstrap(Tables.events(spark, "/root/testdata/sf0.001"))
      .collect()(0)
    assert(r.getAs[Long]("n_resamples") == 32L)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
  }

  // ---- HLL intersection --------------------------------------------

  test("hllIntersect: exact sets and inclusion-exclusion bound") {
    val ev = Seq(
      (1L, 1L, "purchase"), (2L, 2L, "purchase"), (3L, 3L, "purchase"),
      (4L, 2L, "error"), (5L, 3L, "error"), (6L, 4L, "error"))
      .map { case (e, u, t) =>
        (e, ts("2024-03-01 10:00:00"), u, t, 1.0)
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.EventAnalytics.hllIntersect(ev).collect()(0)
    assert(r.getAs[Long]("exact_a") == 3L)
    assert(r.getAs[Long]("exact_b") == 3L)
    assert(r.getAs[Long]("exact_intersect") == 2L)
    assert(r.getAs[Long]("exact_union") == 4L)
    assert(r.getAs[Boolean]("est_within_10pct"))
  }

  // ---- stats drift -------------------------------------------------

  test("statsDrift: halves split at calendar midpoint, metrics traced") {
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "A", Some(10.0)),
      (2L, ts("2024-03-02 10:00:00"), 1L, "A", None),
      (3L, ts("2024-03-03 10:00:00"), 2L, "B", Some(30.0)),
      (4L, ts("2024-03-04 10:00:00"), 2L, "B", Some(50.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = graft.analytics.EventAnalytics.statsDrift(ev).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val rc = byKey(("*", "row_count"))
    assert(rc.getAs[Double]("first_half") == 2.0 &&
      rc.getAs[Double]("second_half") == 2.0)
    val nr = byKey(("value", "null_rate"))
    assert(nr.getAs[Double]("first_half") == 0.5 &&
      nr.getAs[Double]("second_half") == 0.0)
    val mn = byKey(("value", "mean"))
    assert(mn.getAs[Double]("first_half") == 10.0)
    assert(mn.getAs[Double]("second_half") == 40.0)
    assert(mn.getAs[Double]("delta") == 30.0)
  }

  // ---- ABC / Pareto ------------------------------------------------

  test("abcClassification: exact class edges via cross-multiplication") {
    // revenues 80/15/5 → cum shares exactly 0.80, 0.95, 1.00: the A and
    // B edges are INCLUSIVE (5·cum ≤ 4·total), which only decimal
    // arithmetic can decide reliably
    val li = Seq(
      (1L, 100L, 1.0, 80.0, 0.0), (2L, 200L, 1.0, 15.0, 0.0),
      (3L, 300L, 1.0, 5.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
    val rows = graft.analytics.StarAnalytics.abcClassification(li)
      .collect()
    val byCls = rows.map(r => r.getString(0) -> r).toMap
    assert(byCls("A").getAs[Long]("n_parts") == 1L)
    assert(byCls("A").getAs[Double]("revenue_share") == 0.8)
    assert(byCls("B").getAs[Double]("revenue_share") == 0.15)
    assert(byCls("C").getAs[Double]("revenue_share") == 0.05)
  }

  // ---- revenue bridge ----------------------------------------------

  test("revenueBridge: symmetric decomposition reconciles exactly") {
    val orders = Seq(
      (1L, ts("2024-03-01 00:00:00")), (2L, ts("2024-03-04 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      // part P both halves: p 10→12, q 2→3
      (1L, 10L, 2.0, 20.0, 0.0), (2L, 10L, 3.0, 36.0, 0.0),
      // part L only h1 (rev 4), part N only h2 (rev 7)
      (1L, 20L, 1.0, 4.0, 0.0), (2L, 30L, 1.0, 7.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
    val r = graft.analytics.StarAnalytics.revenueBridge(li, orders)
      .collect()(0)
    assert(r.getAs[Double]("total_h1") == 24.0)
    assert(r.getAs[Double]("total_h2") == 43.0)
    assert(r.getAs[Double]("delta") == 19.0)
    assert(r.getAs[Double]("price_effect") == 5.0)   // (12−10)·2.5
    assert(r.getAs[Double]("volume_effect") == 11.0) // (3−2)·11
    assert(r.getAs[Double]("new_parts_effect") == 7.0)
    assert(r.getAs[Double]("lost_parts_effect") == -4.0)
    // exact reconciliation: delta = price + volume + new + lost
    assert(r.getAs[Double]("delta") ==
      r.getAs[Double]("price_effect") + r.getAs[Double]("volume_effect") +
        r.getAs[Double]("new_parts_effect") +
        r.getAs[Double]("lost_parts_effect"))
  }

  // ---- discount elasticity -----------------------------------------

  test("discountElasticity: grouped OLS slope and intercept") {
    val li = Seq((1L, 100L, 1.0, 0.0), (2L, 100L, 2.0, 0.1))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_discount")
    val part = Seq((100L, "BrandX")).toDF("p_partkey", "p_brand")
    val r = graft.analytics.StarAnalytics.discountElasticity(li, part)
      .collect()(0)
    assert(r.getAs[String]("p_brand") == "BrandX")
    assert(r.getAs[Double]("slope") == 10.0)
    assert(r.getAs[Double]("intercept") == 1.0)
  }

  // ---- length sweep ------------------------------------------------

  test("lengthSweep: one pass prices every cutoff") {
    val docs = Seq(
      (1L, "t", "en", "s", 60L), (2L, "t", "en", "s", 150L),
      (3L, "t", "de", "s", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.ext.Curation.lengthSweep(docs).collect()
    val byCut = rows.map(r => r.getAs[Long]("cutoff") -> r).toMap
    assert(byCut(50L).getAs[Long]("n_kept") == 3L)
    assert(byCut(50L).getAs[Double]("precision_en") == 0.666667)
    assert(byCut(50L).getAs[Double]("recall_en") == 1.0)
    assert(byCut(200L).getAs[Long]("n_kept") == 1L)
    assert(byCut(200L).getAs[Double]("precision_en") == 0.0)
    assert(byCut(800L).getAs[Long]("n_kept") == 0L)
    assert(byCut(800L).getAs[Double]("precision_en") == 0.0) // guard
  }

  test("lengthSweep plan: the cutoff rows never re-aggregate the corpus") {
    val docs = Seq((1L, "t", "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val plan = graft.ext.Curation.lengthSweep(docs)
      .queryExecution.optimizedPlan.toString
    // the single corpus aggregate ran EAGERLY at the localCheckpoint;
    // the returned plan is five projections over the materialized row —
    // any Aggregate here would mean a per-cutoff rescan
    assert(!plan.contains("Aggregate"), plan)
  }

  // ---- Ljung-Box ---------------------------------------------------

  test("ljungBox: alternating series rejects the iid null") {
    val ev = dailySeries((1 to 30).map(i =>
      if (i % 2 == 0) 20.0 else 10.0))
    val r = graft.analytics.StatsAnalytics.ljungBox(ev).collect()(0)
    assert(r.getAs[Long]("n_days") == 30L)
    assert(r.getAs[Long]("n_lags") == 7L)
    assert(r.getAs[Double]("lb_q") > 14.06714)
    assert(r.getAs[Int]("reject_iid") == 1)
  }

  // ---- STL-lite ----------------------------------------------------

  test("stlLite: additive identity v = trend + seasonal + residual") {
    val rows = graft.analytics.StatsAnalytics
      .stlLite(Tables.events(spark, "/root/testdata/sf0.001")).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val v = r.getAs[Double]("v")
      val sumParts = r.getAs[Double]("trend") +
        r.getAs[Double]("seasonal") + r.getAs[Double]("residual")
      assert(math.abs(v - sumParts) < 3e-6, s"row $r")
    }
  }

  // ---- rich club ---------------------------------------------------

  test("richClub: densities consistent and bounded on the fixture") {
    val r = graft.analytics.GraphAnalytics
      .richClub(spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getAs[Long]("k") == 20L)
    val cd = r.getAs[Double]("club_density")
    val gd = r.getAs[Double]("graph_density")
    assert(cd >= 0.0 && cd <= 1.0)
    assert(gd > 0.0)
    assert(math.abs(r.getAs[Double]("rich_club_ratio") - cd / gd) < 2e-5)
  }

  // ---- GMM EM ------------------------------------------------------

  test("gmmEm: symmetric bimodal data keeps pi = 0.5 and separates means") {
    val ev = ((1 to 100).map(i => (i.toLong, 10.0)) ++
      (101 to 200).map(i => (i.toLong, 50.0))).map { case (id, v) =>
      (id, ts("2024-03-01 10:00:00"), 1L, "purchase", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.StatsAnalytics.gmmEm(ev).collect()(0)
    // perfectly symmetric responsibilities: sg = n/2 every round
    assert(r.getAs[Double]("pi1") == 0.5)
    val (m1, m2) = (r.getAs[Double]("mu1"), r.getAs[Double]("mu2"))
    assert(m1 < m2)
    assert(m1 >= 9.0 && m1 < 25.0, s"mu1=$m1")
    assert(m2 > 35.0 && m2 <= 51.0, s"mu2=$m2")
    assert(r.getAs[Double]("sigma1") < 20.0)
    assert(r.getAs[Double]("avg_loglik") > -100.0)
  }

  test("gmmEm: shift equivariance — means move with the data") {
    def ev(shift: Double) = (1 to 60).map { i =>
      val v = if (i % 3 == 0) 40.0 else 12.0
      (i.toLong, ts("2024-03-01 10:00:00"), 1L, "purchase", v + shift)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r0 = graft.analytics.StatsAnalytics.gmmEm(ev(0.0)).collect()(0)
    val r5 = graft.analytics.StatsAnalytics.gmmEm(ev(5.0)).collect()(0)
    assert(math.abs(r5.getAs[Double]("mu1") -
      (r0.getAs[Double]("mu1") + 5.0)) < 1e-3)
    assert(math.abs(r5.getAs[Double]("mu2") -
      (r0.getAs[Double]("mu2") + 5.0)) < 1e-3)
    assert(math.abs(r5.getAs[Double]("sigma1") -
      r0.getAs[Double]("sigma1")) < 1e-3)
  }

  // ---- ALS half-step -----------------------------------------------

  test("alsUserStep: published factors satisfy the normal equations") {
    import graft.ext.TextFns.portableH60
    val sf = "/root/testdata/sf0.001"
    val out = graft.ext.EvalOps.alsUserStep(spark, sf)
      .limit(20).collect()
    // recompute the per-user sums with the same portable hash factors
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
      .distinct()
    def factor(tag: String) =
      ((portableH60(concat(col("item").cast("string"), lit(tag)))
        % 2001L).cast("double") - lit(1000.0)) / lit(1000.0)
    val sums = pairs
      .select(col("cust"), factor(":f1").as("x1"), factor(":f2").as("x2"))
      .groupBy("cust")
      .agg(sum(col("x1") * col("x1")).as("a"),
        sum(col("x1") * col("x2")).as("b"),
        sum(col("x2") * col("x2")).as("d"),
        sum(col("x1")).as("e"), sum(col("x2")).as("f"))
      .collect().map(r => r.getAs[Long]("cust") -> r).toMap
    out.foreach { r =>
      val s = sums(r.getAs[Long]("cust"))
      val (w1, w2) = (r.getAs[Double]("w1"), r.getAs[Double]("w2"))
      val lhs1 = (s.getAs[Double]("a") + 0.1) * w1 +
        s.getAs[Double]("b") * w2
      val lhs2 = s.getAs[Double]("b") * w1 +
        (s.getAs[Double]("d") + 0.1) * w2
      assert(math.abs(lhs1 - s.getAs[Double]("e")) < 1e-3, s"u=$r")
      assert(math.abs(lhs2 - s.getAs[Double]("f")) < 1e-3, s"u=$r")
    }
  }

  // ---- ABC-XYZ -----------------------------------------------------

  test("abcXyz: stable demand is X, erratic is Z; ABC classes join in") {
    val orders = Seq(
      (1L, ts("2024-03-01 00:00:00")), (2L, ts("2024-03-08 00:00:00")),
      (3L, ts("2024-03-15 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      // part 1: qty 10 every week, revenue 80 total → A, CV 0 → X
      (1L, 1L, 10.0, 20.0, 0.0), (2L, 1L, 10.0, 30.0, 0.0),
      (3L, 1L, 10.0, 30.0, 0.0),
      // part 2: qty 30 in week 1 only, revenue 20 → C, CV √2 → Z
      (1L, 2L, 30.0, 20.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
    val rows = graft.analytics.StarAnalytics.abcXyz(li, orders).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byKey.contains(("A", "X")) && byKey.contains(("C", "Z")),
      rows.mkString(", "))
    assert(byKey(("A", "X")).getAs[Long]("n_parts") == 1L)
    assert(byKey(("A", "X")).getAs[Double]("revenue_share") == 0.8)
    assert(byKey(("C", "Z")).getAs[Double]("revenue_share") == 0.2)
  }

  // ---- PACF --------------------------------------------------------

  test("pacfDaily: lag-1 PACF equals lag-1 ACF by definition") {
    val ev = dailySeries((1 to 30).map(i =>
      10.0 + (i * 2654435761L % 89).toDouble))
    val acf1 = graft.analytics.StatsAnalytics
      .acfDaily(ev, 3).collect().find(_.getAs[Long]("lag") == 1L).get
      .getAs[Double]("acf")
    val r = graft.analytics.StatsAnalytics.pacfDaily(ev).collect()(0)
    assert(r.getAs[Long]("n_days") == 30L)
    assert(math.abs(r.getAs[Double]("pacf_1") - acf1) < 2e-6)
  }

  // ---- content census ----------------------------------------------

  test("contentCensus: hand-counted urls/emails/numbers/code/digits") {
    val text = "go https://x.io mail a@b.com price 3.14 or 42 {};; ok =="
    val docs = Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.ext.TextAnalysis.contentCensus(docs).collect()(0)
    assert(r.getAs[Long]("n_urls") == 1L)
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_numbers") == 2L)   // 3.14 counts once
    assert(r.getAs[Long]("n_code_runs") == 2L) // {};; and ==
    val want = math.floor(5.0 / text.length * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("digit_ratio") == want)
  }

  // ---- fulfillment lag ---------------------------------------------

  test("fulfillmentLag: first-ship lags with exact percentiles") {
    val orders = Seq(
      (1L, ts("2024-03-01 00:00:00"), "1-URGENT"),
      (2L, ts("2024-03-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts("2024-03-03 00:00:00")), (1L, ts("2024-03-09 00:00:00")),
      (2L, ts("2024-03-05 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val r = graft.analytics.StarAnalytics.fulfillmentLag(li, orders)
      .collect()(0)
    // order 1 first ship day 3 (lag 2, later shipment ignored);
    // order 2 lag 4 → mean 3, p50 3, p95 = 2 + 0.95·2 = 3.9
    assert(r.getAs[Long]("n_orders") == 2L)
    assert(r.getAs[Double]("mean_days") == 3.0)
    assert(r.getAs[Double]("p50_days") == 3.0)
    assert(r.getAs[Double]("p95_days") == 3.9)
  }

  // ---- Croston -----------------------------------------------------

  test("crostonForecast: hand-unrolled EWMA of sizes and intervals") {
    // nonzero weeks 0,2,3 with z = 10,20,30 (alpha 0.3):
    // z_hat = 10·0.49 + 20·0.21 + 30·0.3 = 18.1
    // gaps [2,1]: g_hat = 2·0.7 + 1·0.3 = 1.7 → rate 10.647059
    val orders = Seq(
      (1L, ts("2024-03-01 00:00:00")), (2L, ts("2024-03-15 00:00:00")),
      (3L, ts("2024-03-22 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val r = graft.analytics.StarAnalytics.crostonForecast(li, orders)
      .collect()(0)
    assert(r.getAs[Long]("n_periods") == 3L)
    assert(r.getAs[Double]("z_hat") == 18.1)
    assert(r.getAs[Double]("g_hat") == 1.7)
    assert(r.getAs[Double]("demand_rate") == 10.647059)
  }

  // ---- price indices -----------------------------------------------

  test("priceIndex: matched-model scope, hand-traced Fisher") {
    val orders = Seq(
      (1L, ts("2024-03-01 00:00:00")), (2L, ts("2024-03-04 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      // part 10 both halves: p 10→12
      (1L, 10L, 2.0, 20.0, 0.0), (2L, 10L, 3.0, 36.0, 0.0),
      // part 20 only h1 → excluded from the matched set
      (1L, 20L, 1.0, 4.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
    val r = graft.analytics.StarAnalytics.priceIndex(li, orders)
      .collect()(0)
    assert(r.getAs[Long]("n_common_parts") == 1L)
    assert(r.getAs[Double]("laspeyres") == 1.2)
    assert(r.getAs[Double]("paasche") == 1.2)
    assert(r.getAs[Double]("fisher") == 1.2)
  }

  // ---- retention half-life -----------------------------------------

  test("retentionHalfLife: geometric retention fits half-life 1 day") {
    // single cohort; actives halve daily: r_k = 2^-k → slope −ln2
    val rows = Seq(
      (1 to 8).map(u => (u.toLong, 1)),
      (1 to 4).map(u => (u.toLong, 2)),
      (1 to 2).map(u => (u.toLong, 3)),
      Seq((1L, 4))).flatten
    val ev = rows.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, ts(f"2024-03-0$day%d 10:00:00"), u, "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.analytics.EventAnalytics.retentionHalfLife(ev)
      .collect()(0)
    assert(r.getAs[Long]("n_offsets") == 3L)
    assert(r.getAs[Double]("slope") == -0.693147)
    assert(r.getAs[Double]("half_life_days") == 1.0)
  }

  // ---- uncertainty batch / knee / Neyman ---------------------------

  test("uncertaintyBatch: boundary-nearest docs first, deterministic") {
    // sri: d1 = 5000 (margin 0), d2 = 10000, d3 = 0, d4 ~ 3333
    val docs = Seq(
      (1L, "the cat", "en", "s", 7L),     // 1/2 stopwords → 5000
      (2L, "the and of", "en", "s", 10L), // all stopwords → 10000
      (3L, "zzz qqq", "de", "s", 7L),     // none → 0
      (4L, "the cat sat", "en", "s", 11L)) // 1/3 → 3333
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.ext.EvalOps.uncertaintyBatch(docs, k = 2).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 4L))
    assert(rows(0).getAs[Double]("uncertainty") == 0.0)
    // d4 margin |3333-5000| = 1667 → 0.1667
    assert(rows(1).getAs[Double]("uncertainty") == 0.1667)
  }

  test("gainsKnee: perfect separation puts the knee at full recall") {
    val docs = docsDf2(Seq(
      (1L, "the and of is to", "en"), (2L, "the of a in and", "en"),
      (3L, "zzz qqq www", "de"), (4L, "xxx yyy zzz", "de")))
    val r = graft.ext.EvalOps.gainsKnee(docs).collect()(0)
    assert(r.getAs[Long]("pos_captured") == 2L)
    assert(r.getAs[Double]("frac_pos") == 1.0)
    assert(r.getAs[Double]("frac_kept") == 0.5)
    assert(r.getAs[Double]("separation") == 0.5)
  }

  test("neymanAllocation: variable stratum gets the budget, flat gets 0") {
    val docs = (
      (1 to 10).map(i => (i.toLong, "t", "en", "flat", 100L)) ++
      (11 to 20).map(i =>
        (i.toLong, "t", "en", "wild", if (i % 2 == 0) 50L else 950L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.ext.Curation.neymanAllocation(docs, budget = 10)
      .collect()
    val byS = rows.map(r => r.getString(0) -> r).toMap
    assert(byS("flat").getAs[Double]("sigma") == 0.0)
    assert(byS("flat").getAs[Long]("alloc_neyman") == 0L)
    // all weight on 'wild', capped at the stratum size
    assert(byS("wild").getAs[Double]("neyman_share") == 1.0)
    assert(byS("wild").getAs[Long]("alloc_neyman") == 10L)
    // proportional split ignores variance: 5 / 5
    assert(byS("flat").getAs[Long]("alloc_proportional") == 5L)
  }

  // ---- layout / bloom ----------------------------------------------

  test("skipStats: z-order prunes y-only predicates, x-major cannot") {
    // full uniform 256x256 grid → exact envelope arithmetic
    val grid = spark.range(256).selectExpr("id as x")
      .crossJoin(spark.range(256).selectExpr("id as y"))
    val rows = graft.operators.ZOrder.skipStats(grid, "x", "y")
      .collect()
    val byL = rows.map(r => r.getString(0) -> r).toMap
    val nat = byL("natural_x")
    assert(nat.getAs[Long]("n_files") == 256L)
    assert(nat.getAs[Double]("skip_frac_y") == 0.0)   // x-major: never
    assert(nat.getAs[Double]("skip_frac_box") == 0.9375)
    val zo = byL("zorder")
    assert(zo.getAs[Long]("n_files") == 256L)
    assert(zo.getAs[Double]("skip_frac_y") == 0.9375) // 16x16 tiles
    assert(zo.getAs[Long]("skip_corner_box") == 255L) // all but 1 tile
  }

  test("compactionPlan: cumulative next-fit packs to the target") {
    // three "files" of 60k/60k/30k chars, target 100k:
    // bin 0 = {60k, 60k} (fill 1.2), bin 1 = {30k} (fill 0.3)
    val docs = (
      (0 until 50).map(i => (i.toLong, 1200L)) ++
      (50 until 100).map(i => (i.toLong, 1200L)) ++
      (100 until 150).map(i => (i.toLong, 600L)))
      .map { case (id, ch) => (id, "t", "en", "s", ch) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.operators.ZOrder.compactionPlan(docs).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("bin") == 0L &&
      rows(0).getAs[Long]("n_files") == 2L &&
      rows(0).getAs[Long]("bytes") == 120000L &&
      rows(0).getAs[Double]("fill_ratio") == 1.2)
    assert(rows(1).getAs[Long]("bin") == 1L &&
      rows(1).getAs[Long]("n_files") == 1L &&
      rows(1).getAs[Double]("fill_ratio") == 0.3)
  }

  test("fprAudit: cohorts partition the catalog; bound holds") {
    val r = graft.operators.BloomPrefilter
      .fprAudit(Tables.part(spark, "/root/testdata/sf0.001"))
      .collect()(0)
    val total = Tables.part(spark, "/root/testdata/sf0.001").count()
    assert(r.getAs[Long]("n_build") + r.getAs[Long]("n_probe") == total)
    assert(r.getAs[Boolean]("fp_within_bound"))
  }

  // ---- watermark sweep / top-k drift -------------------------------

  test("watermarkSweep: late events counted against each delay") {
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "A", 1.0),
      (2L, ts("2024-03-01 09:58:30"), 1L, "A", 1.0), // 90 s late
      (3L, ts("2024-03-01 10:00:10"), 1L, "A", 1.0)) // on time
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = graft.analytics.EventAnalytics.watermarkSweep(ev)
      .collect()
    val byD = rows.map(r => r.getAs[Long]("delay_s") -> r).toMap
    assert(byD(0L).getAs[Long]("n_events") == 2L)
    assert(byD(0L).getAs[Long]("n_dropped") == 1L)
    assert(byD(60L).getAs[Long]("n_dropped") == 1L)  // 90 > 60
    assert(byD(600L).getAs[Long]("n_dropped") == 0L)
    assert(byD(0L).getAs[Double]("drop_rate") == 0.5)
  }

  test("topkDrift: hand-traced overlap, rank shift, and leaders") {
    val orders = Seq(
      (1L, ts("2024-03-01 00:00:00")), (2L, ts("2024-03-04 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      // h1: P1 100 > P2 50 > P3 10 ; h2: P3 100 > P1 40
      (1L, 1L, 1.0, 100.0, 0.0), (1L, 2L, 1.0, 50.0, 0.0),
      (1L, 3L, 1.0, 10.0, 0.0),
      (2L, 3L, 1.0, 100.0, 0.0), (2L, 1L, 1.0, 40.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
    val r = graft.analytics.StarAnalytics.topkDrift(li, orders, k = 2)
      .collect()(0)
    // A = {P1(1), P2(2)}, B = {P3(1), P1(2)} → common {P1}
    assert(r.getAs[Long]("n_common") == 1L)
    assert(r.getAs[Double]("jaccard") == 0.333333)
    assert(r.getAs[Double]("mean_rank_shift") == 1.0)
    assert(r.getAs[Long]("top1_h1") == 1L)
    assert(r.getAs[Long]("top1_h2") == 3L)
  }

  // ---- seasonal naive / VaR ----------------------------------------

  test("forecastSeasonalNaive: perfect weekly cycle scores zero error") {
    // period-7 series: lag-7 forecast is exact → MAE = RMSE = MAPE = 0
    val ev = dailySeries((1 to 28).map(i => 10.0 + (i % 7)))
    val r = graft.analytics.StatsAnalytics.forecastSeasonalNaive(ev)
      .collect()(0)
    assert(r.getAs[Long]("n_days") == 21L)
    assert(r.getAs[Double]("mae") == 0.0)
    assert(r.getAs[Double]("rmse") == 0.0)
    assert(r.getAs[Double]("mape_pct") == 0.0)
  }

  test("revenueVar: hand-traced tail on a small delta series") {
    // deltas: +10, −20, +10, −20, ... (alternating series 10/30):
    // values 10,30,10,30.. → dx = +20,−20,+20,...
    val ev = dailySeries((1 to 9).map(i =>
      if (i % 2 == 0) 30.0 else 10.0))
    val r = graft.analytics.StatsAnalytics.revenueVar(ev).collect()(0)
    assert(r.getAs[Long]("n_days") == 8L)
    // deltas: 4×(+20), 4×(−20); p05 interpolates within the −20 block
    assert(r.getAs[Double]("var_95") == -20.0)
    assert(r.getAs[Long]("n_tail") == 4L)
    assert(r.getAs[Double]("cvar_95") == -20.0)
  }

  // ---- split contamination / anomaly consensus ---------------------

  test("splitContamination: duplicated corpus fully contaminates") {
    val dup = (1L to 50L).map(i => (i, "same text", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.ext.DedupExt.splitContamination(dup).collect()
    rows.foreach { r =>
      if (r.getAs[Long]("n_docs") > 0)
        assert(r.getAs[Double]("contamination_rate") == 1.0, s"$r")
    }
    val uniq = (1L to 50L).map(i => (i, s"text $i", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.ext.DedupExt.splitContamination(uniq).collect().foreach { r =>
      assert(r.getAs[Long]("n_contaminated") == 0L, s"$r")
    }
  }

  test("anomalyConsensus: planted spike trips all three detectors") {
    // wiggly baseline keeps MAD > 0 (a flat one is MAD's documented
    // failure mode — the reason the consensus exists)
    val ev = dailySeries((1 to 30).map(i =>
      if (i == 15) 10000.0 else 100.0 + (i % 5)))
    val rows = graft.analytics.StatsAnalytics.anomalyConsensus(ev)
      .collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val want = if (r.getAs[Double]("v") == 10000.0) 3L else 0L
      assert(r.getAs[Long]("n_methods") == want, s"$r")
    }
  }

  // ---- plan pins ---------------------------------------------------

  test("mannWhitney plan: the only window runs over the value census") {
    // the census aggregate must sit BELOW the window in the plan — the
    // user frame is never globally sorted
    val per = Seq((1L, 0), (2L, 1)).toDF("x", "g")
    val plan = StatsAnalytics.mannWhitneyOnGroups(per)
      .queryExecution.optimizedPlan.toString
    val winIdx = plan.indexOf("Window")
    val aggBelow = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      s"expected census Aggregate below Window:\n$plan")
  }

  test("theilIndex plan: no window anywhere — pure aggregates") {
    val orders = Seq((1L, 1L, 1.0, "O"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val cust = Seq((1L, "A")).toDF("c_custkey", "c_mktsegment")
    val plan = StatsAnalytics.theilIndex(orders, cust)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"unexpected window:\n$plan")
  }
}
