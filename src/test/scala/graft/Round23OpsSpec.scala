package graft

import java.sql.Timestamp

import graft.analytics.{EventAnalytics, StatsAnalytics}
import graft.ext.TextAnalysis

/** Round-23-of-build additions: exact Shapley channel attribution,
  * Kneser–Ney bigram perplexity, the Gopher n-gram repetition gates,
  * the Hill tail-index estimator, Kruskal–Wallis rank ANOVA,
  * empirical-Bayes beta-binomial shrinkage, and Church–Gale term
  * burstiness. Hand-traced fixtures. */
class Round23OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- shapleyAttribution -------------------------------------------

  test("shapleyAttribution: hand-traced HOLEY coalition lattice " +
    "(full-lattice zero-fill convention, both legs)") {
    // units (user, day): masks click=1 error=2 signup=4 view=8
    //   u1 d1: click + purchase          -> mask 1, y 1
    //   u2 d1: click                      -> mask 1, y 0
    //   u3 d1: view, click + purchase     -> mask 9, y 1
    //   u4 d1: purchase only              -> mask 0, y 1 (v(∅) = 1)
    // census: v(1)=0.5 (n=2), v(9)=1 (n=1), v(0)=1 (n=1) — 3 of 16
    // masks observed, so the lattice is holey and BOTH term legs fire.
    // φ·24(click) = legA[6·(v(1)−v(0)) + 2·(v(9)−v(8)→0)] = −3+2 = −1
    //               legB: only observed S∌click is 0, and 0∪click = 1
    //               IS observed -> no legB term.
    // φ·24(view)  = legA[2·(v(9)−v(1))] = 1
    //               legB: S=0 with 0∪view = 8 UNOBSERVED -> −6·v(0) = −6
    //               (S=1's superset 9 is observed) -> total 1−6 = −5
    // φ·24(error) = legA: none (no observed mask contains error)
    //               legB: S=0 -> −6·1; S=1 -> −2·0.5; S=9 -> −2·1 = −9
    // φ·24(signup) = same shape as error = −9
    // Efficiency check on the zero-filled game:
    //   Σφ = (−1−5−9−9)/24 = −1 = v(1111₂→0) − v(∅→1) ✓
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "click"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:30:00"), "click"),
      (3L, ts("2024-01-01 11:00:00"), "purchase"),
      (4L, ts("2024-01-01 09:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.shapleyAttribution(ev).collect()
      .map(x => x.getAs[String]("channel") ->
        (x.getAs[Long]("n_units"), x.getAs[Double]("shapley"))).toMap
    assert(r.keySet == Set("click", "view", "error", "signup"))
    assert(r("click") == ((3L, -0.041667)))
    assert(r("view") == ((1L, -0.208333)))
    assert(r("error") == ((0L, -0.375)))
    assert(r("signup") == ((0L, -0.375)))
    // efficiency on the holey lattice: Σφ = v(full) − v(∅) = 0 − 1
    val total = r.values.map(_._2).sum
    assert(math.abs(total - (-1.0)) < 1e-9)
  }

  test("shapleyAttribution: symmetric channels split credit equally") {
    // one unit touching both click and view, converted; v({c,v})=1 and
    // both singletons unobserved -> legA gives φ(click)=φ(view)=2·1/24.
    // Under the full-lattice zero-fill convention error/signup also get
    // legB terms: S=9 with superset 11 (resp. 13) unobserved
    // -> −2·v(9)/24 = −1/12 each; Σφ = 0 = v(full→0) − v(∅→0) ✓
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.shapleyAttribution(ev).collect()
      .map(x => x.getAs[String]("channel") -> x.getAs[Double]("shapley"))
      .toMap
    assert(r == Map("click" -> 0.083333, "view" -> 0.083333,
      "error" -> -0.083333, "signup" -> -0.083333))
  }

  // ---- kneserNey -----------------------------------------------------

  test("kneserNey: hand-traced discount and continuation mass") {
    // train (doc 1): "a b a b" -> bc (a,b):2, (b,a):1
    //   heads: a (c1=2, N1+=1), b (c1=1, N1+=1); cont: a:1, b:1; B=2
    // eval (doc 9): "a b c"
    //   (a,b): (2−.75)/2 + .75·(1/2)·(1/2) = 0.8125
    //   (b,c): 0 + .75·(1/1)·(0/2) = 0 -> floored at 1e-12
    val docs = Seq((1L, "a b a b"), (9L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.kneserNey(docs).collect()(0)
    assert(r.getAs[Long]("n_eval_bigrams") == 2L)
    assert(r.getAs[Long]("n_scored") == 2L)
    assert(r.getAs[Long]("n_skipped") == 0L)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // per-term logs fold through DECIMAL(28,12) (the engine's order-
    // independence contract) — replicate the 12dp per-term rounding
    def d12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val avg = (d12(math.log(0.8125)) + d12(math.log(1.0e-12)))
      .toDouble / 2.0
    assert(r.getAs[Double]("avg_logprob") == r6(avg))
    assert(r.getAs[Double]("perplexity") == r6(math.exp(-avg)))
  }

  test("kneserNey: eval bigram with unseen head is skipped, not scored") {
    // train: "a b"; eval doc 9: "x y a b" -> (x,y) and (y,a) have unseen
    // heads x,y; (a,b) scores. n_eval=3, scored=1, skipped=2.
    val docs = Seq((1L, "a b"), (9L, "x y a b")).toDF("doc_id", "text")
    val r = TextAnalysis.kneserNey(docs).collect()(0)
    assert(r.getAs[Long]("n_eval_bigrams") == 3L)
    assert(r.getAs[Long]("n_scored") == 1L)
    assert(r.getAs[Long]("n_skipped") == 2L)
    // (a,b): (1−.75)/1 + .75·1·(1/1) = 1.0 -> avg_logprob 0, ppl 1
    assert(r.getAs[Double]("avg_logprob") == 0.0)
    assert(r.getAs[Double]("perplexity") == 1.0)
  }

  // ---- gopherRepetition ----------------------------------------------

  test("gopherRepetition: hand-traced dup/top shares and gates") {
    // doc 1 "x x x": 2-grams {x x}×2 -> dup .5, top 1, keep 0
    //                3-grams {x x x}×1 -> dup 0, top 1 > .18, keep 0
    // doc 2 "a b a c a d a e": 7 distinct 2-grams -> dup 0,
    //                top 1/7 = .142857 ≤ .2 -> keep 1
    // doc 3 "solo": no n-gram rows at all
    val docs = Seq((1L, "x x x"), (2L, "a b a c a d a e"), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(docs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n")) ->
        (x.getAs[Long]("n_grams"), x.getAs[Double]("dup_frac"),
          x.getAs[Double]("top_share"), x.getAs[Int]("keep"))).toMap
    assert(!r.keySet.exists(_._1 == 3L))
    assert(r((1L, 2L)) == ((2L, 0.5, 1.0, 0)))
    assert(r((1L, 3L)) == ((1L, 0.0, 1.0, 0)))
    assert(r((2L, 2L)) == ((7L, 0.0, 0.142857, 1)))
    // doc 2 3-grams: 6 distinct of 6 -> top 1/6 = .166667 ≤ .18, keep 1
    assert(r((2L, 3L)) == ((6L, 0.0, 0.166667, 1)))
  }

  private def d12(x: Double) = BigDecimal(x)
    .setScale(12, BigDecimal.RoundingMode.HALF_UP)
  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  // ---- hillTail -------------------------------------------------------

  test("hillTail: hand-traced top-3 (k=2) estimator") {
    // top k+1 = [1000, 100, 10]: H = (ln1000 + ln100)/2 − ln10,
    // boundary term dropped from the sum exactly once
    val orders = Seq(1000.0, 100.0, 10.0, 1.0).zipWithIndex
      .map { case (p, i) => (i.toLong, BigDecimal(p)) }
      .toDF("o_orderkey", "o_totalprice")
    val r = StatsAnalytics.hillTail(orders, k = 2).collect()(0)
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("x_boundary") == 10.0)
    val s = (d12(math.log(1000.0)) + d12(math.log(100.0)) +
      d12(math.log(10.0))).toDouble
    val h = (s - math.log(10.0)) / 2.0 - math.log(10.0)
    assert(r.getAs[Double]("hill_h") == r6(h))
    assert(r.getAs[Double]("tail_alpha") == r6(1.0 / h))
  }

  // ---- kruskalWallis --------------------------------------------------

  test("kruskalWallis: hand-traced two-segment rank ANOVA with ties") {
    // per-customer order counts: A:[1,2], B:[2,3]
    // avg ranks: 1→1, 2→2.5 (tie pair), 3→4; R_A=3.5, R_B=6.5
    // H = 12/(4·5)·(3.5²/2 + 6.5²/2) − 3·5 = 1.35
    // ties: Σ(t³−t) = 6 → C = 1 − 6/60 = 0.9 → H/C = 1.5
    val orders = Seq(
      (1L, 10L), (2L, 20L), (2L, 21L),
      (3L, 30L), (3L, 31L), (4L, 40L), (4L, 41L), (4L, 42L))
      .toDF("o_custkey", "o_orderkey")
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val r = StatsAnalytics.kruskalWallis(orders, customer).collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("df") == 1L)
    assert(r.getAs[Double]("h") == 1.35)
    assert(r.getAs[Double]("tie_correction") == 0.9)
    assert(r.getAs[Double]("h_corrected") == 1.5)
  }

  // ---- ebShrinkage ----------------------------------------------------

  test("ebShrinkage: hand-traced method-of-moments prior and shrinkage") {
    // rates [.25, .5, .75]: μ=.5, v=.0625, M=3 → α=β=1.5
    // shrunk: u1 (1+1.5)/7, u2 (1+1.5)/5, u3 (3+1.5)/7
    def evRows(u: Long, n: Int, x: Int) =
      (1 to n).map(i => (u, if (i <= x) "purchase" else "view"))
    val ev = (evRows(1L, 4, 1) ++ evRows(2L, 2, 1) ++ evRows(3L, 4, 3))
      .toDF("user_id", "event_type")
    val r = StatsAnalytics.ebShrinkage(ev).collect()
    assert(r.map(_.getAs[Long]("user_id")).toSeq == Seq(3L, 2L, 1L))
    val byU = r.map(x => x.getAs[Long]("user_id") ->
      (x.getAs[Double]("raw_rate"), x.getAs[Double]("shrunk_rate"),
        x.getAs[Double]("alpha"), x.getAs[Double]("beta"))).toMap
    assert(byU(1L) == ((0.25, r6(2.5 / 7.0), 1.5, 1.5)))
    assert(byU(2L) == ((0.5, 0.5, 1.5, 1.5)))
    assert(byU(3L) == ((0.75, r6(4.5 / 7.0), 1.5, 1.5)))
  }

  test("ebShrinkage: degenerate variance keeps raw rates, NULL prior") {
    // both users at p = .5 -> v = 0 -> no prior, shrunk == raw
    val ev = Seq((1L, "purchase"), (1L, "view"),
      (2L, "purchase"), (2L, "view")).toDF("user_id", "event_type")
    val r = StatsAnalytics.ebShrinkage(ev).collect()
    assert(r.forall(x => x.getAs[Double]("shrunk_rate") == 0.5))
    assert(r.forall(x => x.isNullAt(x.fieldIndex("alpha"))))
  }

  // ---- termBurstiness -------------------------------------------------

  test("termBurstiness: hand-traced burstiness vs Poisson expectation") {
    // term a: df 2, cf 6 over N=4 docs -> burst 3, λ=1.5
    // term b: df 1 below minDf=2 -> excluded
    val docTf = Seq((1L, "a", 2L), (2L, "a", 4L), (1L, "b", 1L))
      .toDF("doc_id", "term", "tf")
    val nDocs = Seq(4L).toDF("nd")
    val r = TextAnalysis.termBurstinessOf(docTf, nDocs, minDf = 2L, k = 5)
      .collect()
    assert(r.length == 1)
    val lam = 6.0 / 4.0
    val pois = lam / (1.0 - math.exp(-lam))
    assert(r(0).getAs[String]("term") == "a")
    assert(r(0).getAs[Long]("df") == 2L && r(0).getAs[Long]("cf") == 6L)
    assert(r(0).getAs[Double]("burstiness") == 3.0)
    assert(r(0).getAs[Double]("poisson_expected") == r6(pois))
    assert(r(0).getAs[Double]("burst_ratio") == r6(3.0 / pois))
  }

  // ---- heapsLaw -------------------------------------------------------

  test("heapsLaw: hand-traced two-bucket curve and log-log fit") {
    // docs 0..3, 2 buckets -> bucket = floor(id·2/4): {0,1}→0, {2,3}→1
    // tokens: b0 = 3, b1 = 6; first-bucket vocab: a,b → b0; c → b1
    // curve: (T,V) = (3,2), (9,3)
    val docTf = Seq((0L, "a", 2L), (1L, "b", 1L), (2L, "a", 1L),
      (2L, "c", 3L), (3L, "b", 2L)).toDF("doc_id", "term", "tf")
    val maxId = Seq(3L).toDF("max_id")
    val r = TextAnalysis.heapsLawOf(docTf, maxId, buckets = 2).collect()
    assert(r.length == 2)
    val b0 = r(0); val b1 = r(1)
    assert(b0.getAs[Long]("tokens_cum") == 3L &&
      b0.getAs[Long]("vocab_cum") == 2L)
    assert(b1.getAs[Long]("tokens_cum") == 9L &&
      b1.getAs[Long]("vocab_cum") == 3L)
    // two points -> exact fit through both, with per-term 12dp folds
    val (lt1, lv1) = (math.log(3.0), math.log(2.0))
    val (lt2, lv2) = (math.log(9.0), math.log(3.0))
    val st = (d12(lt1) + d12(lt2)).toDouble
    val sv = (d12(lv1) + d12(lv2)).toDouble
    val stt = (d12(lt1 * lt1) + d12(lt2 * lt2)).toDouble
    val stv = (d12(lt1 * lv1) + d12(lt2 * lv2)).toDouble
    val beta = (2.0 * stv - st * sv) / (2.0 * stt - st * st)
    val k = math.exp(sv / 2.0 - beta * (st / 2.0))
    assert(b0.getAs[Double]("heaps_beta") == r6(beta))
    assert(b0.getAs[Double]("heaps_k") == r6(k))
  }

  // ---- simpsonCheck ---------------------------------------------------

  test("simpsonCheck: hand-traced stratum-vs-pooled sign reversal") {
    // A: (1,1),(2,2) slope 1; B: (1,10),(2,8) slope −2
    // pooled slope = (4·31 − 6·21)/(4·10 − 36) = −0.5 → A flips, B not
    val li = Seq(("A", 1.0, 1.0), ("A", 2.0, 2.0),
      ("B", 1.0, 10.0), ("B", 2.0, 8.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val r = StatsAnalytics.simpsonCheck(li).collect()
      .map(x => x.getAs[String]("stratum") ->
        (x.getAs[Double]("slope_stratum"), x.getAs[Double]("slope_pooled"),
          x.getAs[Int]("sign_flip"))).toMap
    assert(r("A") == ((1.0, -0.5, 1)))
    assert(r("B") == ((-2.0, -0.5, 0)))
  }

  // ---- anovaF / levene -----------------------------------------------

  private def orderFixture(counts: Map[Long, Int]) = {
    val rows = counts.toSeq.flatMap { case (c, n) =>
      (1 to n).map(i => (c, c * 100L + i)) }
    rows.toDF("o_custkey", "o_orderkey")
  }

  test("anovaF: hand-traced two-segment F") {
    // A: counts [1,2], B: [2,3] -> SSB = 1, SSW = 1, F = (1/1)/(1/2) = 2
    val orders = orderFixture(Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3))
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val r = StatsAnalytics.anovaF(orders, customer).collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("df_between") == 1L)
    assert(r.getAs[Long]("df_within") == 2L)
    assert(r.getAs[Double]("ss_between") == 1.0)
    assert(r.getAs[Double]("ss_within") == 1.0)
    assert(r.getAs[Double]("f") == 2.0)
  }

  test("levene: hand-traced spread difference") {
    // A: counts [1,1,4] -> z = [1,1,2]; B: [2,2] -> z = [0,0]
    // ANOVA on z: SSB ≈ 2.133333, SSW = 2/3, W = 9.6
    val orders = orderFixture(Map(1L -> 1, 2L -> 1, 3L -> 4,
      4L -> 2, 5L -> 2))
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B")).toDF("c_custkey", "c_mktsegment")
    val r = StatsAnalytics.levene(orders, customer).collect()(0)
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("df_between") == 1L &&
      r.getAs[Long]("df_within") == 3L)
    // replicate the engine's IEEE/decimal sequence exactly
    val (n, k) = (5.0, 2.0)
    val (nA, sA, ssA) = (3.0, 4.0, 6.0)
    val (nB, sB, ssB) = (2.0, 0.0, 0.0)
    val s = (d12(sA) + d12(sB)).toDouble
    def ssbT(ng: Double, sg: Double) =
      d12(ng * (sg / ng - s / n) * (sg / ng - s / n))
    def sswT(ng: Double, sg: Double, ssg: Double) =
      d12(ssg - sg * sg / ng)
    val ssb = (ssbT(nA, sA) + ssbT(nB, sB)).toDouble
    val ssw = (sswT(nA, sA, ssA) + sswT(nB, sB, ssB)).toDouble
    assert(r.getAs[Double]("ss_between") == r6(ssb))
    assert(r.getAs[Double]("ss_within") == r6(ssw))
    assert(r.getAs[Double]("f") == r6((ssb / (k - 1)) / (ssw / (n - k))))
  }

  // ---- bitextMine -----------------------------------------------------

  test("bitextMine: hand-traced mutual pairs and ratio margins") {
    // A = even ids {0:[1,0], 2:[0,1]}, B = odd {1:[1,0], 3:[.6,.8]}
    // sims: (0,1)=1, (0,3)=.6, (2,1)=0, (2,3)=.8
    // fwd dens: id0 (1+.6)/2=.8, id2 (.8+0)/2=.4
    // bwd dens: id1 (1+0)/2=.5, id3 (.8+.6)/2=.7
    // mutual: (0,1) margin 1/.65, (2,3) margin .8/.55
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val r = graft.ext.Similarity.bitextMine(emb).collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("src_id") == 0L &&
      r(0).getAs[Long]("dst_id") == 1L)
    assert(r(0).getAs[Double]("sim") == 1.0)
    assert(r(0).getAs[Double]("margin") == r6(1.0 / ((0.8 + 0.5) / 2.0)))
    assert(r(1).getAs[Long]("src_id") == 2L &&
      r(1).getAs[Long]("dst_id") == 3L)
    assert(r(1).getAs[Double]("sim") == 0.8)
    assert(r(1).getAs[Double]("margin") == r6(0.8 / ((0.4 + 0.7) / 2.0)))
  }

  // ---- tfidfPairs -----------------------------------------------------

  test("tfidfPairs: hand-traced inverted-index cosine") {
    // N = 4 (one doc empty); idf: b = ln(4/3), c = ln(4/2)
    // d1: b tf2, c tf1; d2: b tf1, c tf2; d3: b tf1
    val docTf = Seq((1L, "b", 2L), (1L, "c", 1L), (2L, "b", 1L),
      (2L, "c", 2L), (3L, "b", 1L)).toDF("doc_id", "term", "tf")
    val nDocs = Seq(4L).toDF("n_docs")
    val r = TextAnalysis.tfidfPairsOf(docTf, nDocs, maxDf = 3L, k = 10)
      .collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b")) ->
        (x.getAs[Long]("n_shared_terms"), x.getAs[Double]("cosine")))
      .toMap
    // replicate the engine arithmetic
    def w(tf: Long, df: Long) =
      (1.0 + math.log(tf.toDouble)) * math.log(4.0 / df.toDouble)
    val (w1b, w1c) = (w(2, 3), w(1, 2))
    val (w2b, w2c) = (w(1, 3), w(2, 2))
    val w3b = w(1, 3)
    def nrm(ws: Double*) =
      math.sqrt(ws.map(x => d12(x * x)).reduce(_ + _).toDouble)
    val (n1, n2, n3) = (nrm(w1b, w1c), nrm(w2b, w2c), nrm(w3b))
    def cos(ps: (Double, Double)*) =
      r6(ps.map { case (a, b) => d12(a * b) }.reduce(_ + _).toDouble)
    assert(r.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(r((1L, 2L)) ==
      ((2L, cos((w1b / n1, w2b / n2), (w1c / n1, w2c / n2)))))
    assert(r((1L, 3L)) == ((1L, cos((w1b / n1, w3b / n3)))))
    assert(r((2L, 3L)) == ((1L, cos((w2b / n2, w3b / n3)))))
  }

  // ---- adstockSweep ---------------------------------------------------

  test("adstockSweep: hand-traced decay-0.5 carryover correlation") {
    // clicks [2,0,1], revenue [10,20,40]
    // adstock(.5) = [2, 1, 1.5]; corr = −15/sqrt(1.5·1400)
    val ev = Seq(
      (ts("2024-01-01 10:00:00"), "click", null.asInstanceOf[java.lang.Double]),
      (ts("2024-01-01 11:00:00"), "click", null.asInstanceOf[java.lang.Double]),
      (ts("2024-01-01 12:00:00"), "purchase", java.lang.Double.valueOf(10.0)),
      (ts("2024-01-02 10:00:00"), "purchase", java.lang.Double.valueOf(20.0)),
      (ts("2024-01-03 10:00:00"), "click", null.asInstanceOf[java.lang.Double]),
      (ts("2024-01-03 11:00:00"), "purchase", java.lang.Double.valueOf(40.0)))
      .toDF("ts", "event_type", "value")
    val r = EventAnalytics.adstockSweep(ev, decays = Seq(0.5)).collect()(0)
    assert(r.getAs[Double]("decay") == 0.5)
    assert(r.getAs[Long]("n_days") == 3L)
    val corr = -15.0 / math.sqrt(1.5 * 1400.0)
    assert(r.getAs[Double]("corr_revenue") == r6(corr))
  }

  // ---- mcnemarBaselines ------------------------------------------------

  test("mcnemarBaselines: hand-traced discordant cells") {
    // cutoff = 2024-01-06 (max day 01-20 − 14)
    // u1 right/right, u2 right/right, u3 b, u4 wrong/wrong, u5 c, u6 b
    def day(u: Long, ds: Seq[String]) =
      ds.map(s => (u, ts(s + " 10:00:00"), "view",
        null.asInstanceOf[java.lang.Double]))
    val ev = (
      day(1L, Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
        "2024-01-05", "2024-01-10")) ++
      day(2L, Seq("2023-12-20")) ++
      day(3L, Seq("2024-01-05", "2024-01-10")) ++
      day(4L, Seq("2023-12-25", "2023-12-26", "2023-12-27", "2023-12-28",
        "2023-12-29", "2023-12-30")) ++
      day(5L, Seq("2023-12-20", "2023-12-21", "2023-12-22", "2023-12-23",
        "2023-12-24", "2024-01-15")) ++
      day(6L, Seq("2024-01-02", "2024-01-20")))
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventAnalytics.mcnemarBaselines(ev).collect()(0)
    assert(r.getAs[Long]("n_users") == 6L)
    assert(r.getAs[Long]("both_right") == 2L)
    assert(r.getAs[Long]("b") == 2L)
    assert(r.getAs[Long]("c") == 1L)
    assert(r.getAs[Long]("both_wrong") == 1L)
    assert(r.getAs[Double]("acc_recency") == r6(4.0 / 6.0))
    assert(r.getAs[Double]("acc_frequency") == 0.5)
    assert(r.getAs[Double]("chi2") == r6(1.0 / 3.0))
    assert(r.getAs[Double]("chi2_cc") == 0.0)
  }

  test("mcnemarBaselines: no disagreement yields chi2 = 0 by convention") {
    // one recent-AND-frequent active user: both rules right -> b = c = 0
    val ev = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
      "2024-01-05", "2024-01-20")
      .map(s => (1L, ts(s + " 10:00:00"), "view",
        null.asInstanceOf[java.lang.Double]))
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventAnalytics.mcnemarBaselines(ev).collect()(0)
    assert(r.getAs[Long]("b") == 0L && r.getAs[Long]("c") == 0L)
    assert(r.getAs[Double]("chi2") == 0.0 &&
      r.getAs[Double]("chi2_cc") == 0.0)
  }

  // ---- pairwiseContrasts -----------------------------------------------

  test("pairwiseContrasts: hand-traced post-hoc t on the ANOVA design") {
    // A: [1,2], B: [2,3] -> means 1.5/2.5, MSW = 0.5
    // se = sqrt(.5·(1/2+1/2)) = sqrt(.5), t = −1/sqrt(.5) = −√2
    val orders = orderFixture(Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3))
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val r = StatsAnalytics.pairwiseContrasts(orders, customer)
      .collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[String]("g_a") == "A" &&
      row.getAs[String]("g_b") == "B")
    assert(row.getAs[Double]("mean_a") == 1.5 &&
      row.getAs[Double]("mean_b") == 2.5)
    assert(row.getAs[Double]("diff") == -1.0)
    val se = math.sqrt(0.5 * (0.5 + 0.5))
    assert(row.getAs[Double]("se") == r6(se))
    assert(row.getAs[Double]("t") == r6(-1.0 / se))
  }

  // ---- langVocabOverlap --------------------------------------------------

  test("langVocabOverlapOf: hand-traced vocabulary Jaccard") {
    // en vocab {a,b,c}, de vocab {b,c,d,e}: shared 2, union 5
    val docTf = Seq(("en", "a"), ("en", "b"), ("en", "c"),
      ("de", "b"), ("de", "c"), ("de", "d"), ("de", "e"),
      ("en", "a")) // duplicate (lang, term) row must not double-count
      .toDF("lang", "term")
    val r = TextAnalysis.langVocabOverlapOf(docTf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[String]("lang_a") == "de" &&
      row.getAs[String]("lang_b") == "en")
    assert(row.getAs[Long]("v_a") == 4L && row.getAs[Long]("v_b") == 3L)
    assert(row.getAs[Long]("n_shared") == 2L)
    assert(row.getAs[Double]("vocab_jaccard") == 0.4)
  }

  // ---- embeddingIsotropy -----------------------------------------------

  test("embeddingIsotropy: hand-traced zero-pair mean cosine") {
    // u = {[1,0], [0,1], [1,0]}: Σu = [2,1], ‖Σu‖² = 5
    // mean cosine = (5 − 3)/(3·2) = 1/3; center share = (5/9)/(3/3)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = graft.ext.Similarity.embeddingIsotropy(emb, dim = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_vectors") == 3L && r.getAs[Long]("dim") == 2L)
    assert(r.getAs[Double]("mean_norm") == 1.0)
    assert(r.getAs[Double]("mean_cosine") == r6(2.0 / 6.0))
    assert(r.getAs[Double]("center_mass_share") == r6(5.0 / 9.0))
    // mean cosine is invariant under per-vector scaling
    val scaled = Seq(
      (1L, Array(2.0f, 0.0f)), (2L, Array(0.0f, 4.0f)),
      (3L, Array(8.0f, 0.0f))).toDF("vec_id", "embedding")
    val r2 = graft.ext.Similarity.embeddingIsotropy(scaled, dim = 2)
      .collect()(0)
    assert(r2.getAs[Double]("mean_cosine") == r6(2.0 / 6.0))
  }

  // ---- newsvendor -------------------------------------------------------

  test("newsvendor: zero weeks shift the critical fractile") {
    // 5-week calendar, target rank ⌈4·5/5⌉ = 4
    // part 100: demand {3,10} + 3 zero weeks -> rank 4 picks min obs = 3
    // part 200: demand {1..5} -> rank 4 picks 4
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq((1L, d("2024-01-01")), (2L, d("2024-01-08")),
      (3L, d("2024-01-15")), (4L, d("2024-01-22")),
      (5L, d("2024-01-29"))).toDF("o_orderkey", "o_orderdate")
    val li = Seq((1L, 100L, 3.0), (2L, 100L, 10.0),
      (1L, 200L, 1.0), (2L, 200L, 2.0), (3L, 200L, 3.0),
      (4L, 200L, 4.0), (5L, 200L, 5.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val r = graft.analytics.StarAnalytics.newsvendor(li, orders)
      .collect()
      .map(x => x.getAs[Long]("l_partkey") ->
        (x.getAs[Long]("n_weeks"), x.getAs[Long]("n_active_weeks"),
          x.getAs[Double]("mean_weekly"), x.getAs[Double]("q_star"),
          x.getAs[Double]("safety_stock"))).toMap
    assert(r(100L) == ((5L, 2L, 2.6, 3.0, r6(3.0 - 2.6))))
    assert(r(200L) == ((5L, 5L, 3.0, 4.0, 1.0)))
  }

  test("newsvendor: all-zero-dominated part stocks zero") {
    // 10-week calendar (target ⌈8⌉ = 8), part seen in 1 week only:
    // n_zero = 9 >= 8 -> q* = 0
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = (0 until 10).map(w =>
      ((w + 1).toLong, java.sql.Date.valueOf(
        java.time.LocalDate.parse("2024-01-01").plusDays(7L * w))))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq((1L, 100L, 42.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val r = graft.analytics.StarAnalytics.newsvendor(li, orders)
      .collect()(0)
    assert(r.getAs[Long]("n_weeks") == 10L)
    assert(r.getAs[Double]("q_star") == 0.0)
    assert(r.getAs[Double]("safety_stock") == r6(-4.2))
  }

  // ---- embeddingDrift ----------------------------------------------------

  test("embeddingDrift: hand-traced zero-pair linear MMD") {
    // A (label<5): [1,0],[3,0] -> μA=[2,0]; B: [0,2] -> μB=[0,2]
    // MMD² = 4 + 4 = 8
    val emb = Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(3.0f, 0.0f), 1),
      (3L, Array(0.0f, 2.0f), 9)).toDF("vec_id", "embedding", "label")
    val r = graft.ext.Similarity.embeddingDrift(emb).collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 1L)
    assert(r.getAs[Double]("mmd2_linear") == 8.0)
    assert(r.getAs[Double]("mean_shift") == r6(math.sqrt(8.0)))
    assert(r.getAs[Double]("mean_norm_a") == 2.0)
    assert(r.getAs[Double]("mean_norm_b") == 2.0)
  }

  // ---- effectiveRank -------------------------------------------------------

  test("effectiveRank: isotropic = dim, collapsed = 1") {
    val iso = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r1 = graft.ext.Similarity.effectiveRank(iso, dim = 2).collect()(0)
    assert(r1.getAs[Double]("trace") == 1.0)
    assert(r1.getAs[Double]("effective_rank") == 2.0)
    val flat = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(3.0f, 0.0f)), (4L, Array(4.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r2 = graft.ext.Similarity.effectiveRank(flat, dim = 2).collect()(0)
    assert(r2.getAs[Double]("trace") == 1.25)
    assert(r2.getAs[Double]("effective_rank") == 1.0)
  }

  // ---- clusterLabelAgreement ---------------------------------------------

  test("clusterLabelAgreement: perfect clustering scores purity=NMI=1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (40L, Array(0.0f, 1.0f), 1), (41L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.ext.Similarity.clusterLabelAgreement(emb).collect()(0)
    assert(r.getAs[Long]("n_vectors") == 4L)
    assert(r.getAs[Double]("purity") == 1.0)
    assert(r.getAs[Double]("nmi") == 1.0)
    // H(C) = H(L) = ln 2; MI = ln 2 (12dp per-term folds)
    val term = d12(0.5 * math.log(2.0))
    assert(r.getAs[Double]("h_cluster") == r6((term + term).toDouble))
    assert(r.getAs[Double]("mutual_info") ==
      r6((d12(0.5 * math.log(2.0)) + d12(0.5 * math.log(2.0))).toDouble))
  }

  // ---- permutationTest -------------------------------------------------

  test("permutationTest: invariants and observed-diff cross-check") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val r = EventAnalytics.permutationTest(ev, nPerms = 16).collect()(0)
    assert(r.getAs[Long]("n_perms") == 16L)
    val p = r.getAs[Double]("p_value")
    assert(p >= r6(1.0 / 17.0) && p <= 1.0)
    val ex = r.getAs[Long]("n_exceed")
    assert(ex >= 0L && ex <= 16L)
    // observed diff recomputed independently through hashBucket
    import org.apache.spark.sql.functions._
    val per = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("x"))
      .withColumn("g",
        graft.operators.Sampling.hashBucket(col("user_id"), 2))
    val arms = per.groupBy("g")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect().map(x => x.getAs[Long]("g") ->
        (x.getAs[Long]("s"), x.getAs[Long]("n"))).toMap
    val (s0, n0) = arms(0L); val (s1, n1) = arms(1L)
    val expObs = s0.toDouble / n0.toDouble - s1.toDouble / n1.toDouble
    assert(r.getAs[Double]("diff_obs") == r6(expObs))
    // deterministic: a second run returns the identical row
    val r2 = EventAnalytics.permutationTest(ev, nPerms = 16).collect()(0)
    assert(r.toSeq == r2.toSeq)
  }
}
