package graft

import java.sql.Timestamp

import graft.analytics.EventAnalytics
import graft.ext.TextAnalysis

/** Round-23-of-build additions: exact Shapley channel attribution,
  * Kneser–Ney bigram perplexity, and the Gopher n-gram repetition
  * gates. Hand-traced fixtures. */
class Round23OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- shapleyAttribution -------------------------------------------

  test("shapleyAttribution: hand-traced 4-unit coalition lattice") {
    // units (user, day): masks click=1 error=2 signup=4 view=8
    //   u1 d1: click + purchase          -> mask 1, y 1
    //   u2 d1: click                      -> mask 1, y 0
    //   u3 d1: view, click + purchase     -> mask 9, y 1
    //   u4 d1: purchase only              -> mask 0, y 1 (v(∅) = 1)
    // census: v(1)=0.5 (n=2), v(9)=1 (n=1), v(0)=1 (n=1)
    // φ(click) = [6·(v(1)−v(0)) + 2·(v(9)−v(8)=0)]/24 = (−3+2)/24 = −1/24
    // φ(view)  = [2·(v(9)−v(1))]/24 = 1/24
    // error/signup: never touched -> no output row (observed lattice only)
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
    assert(r.keySet == Set("click", "view"))
    assert(r("click") == ((3L, -0.041667)))
    assert(r("view") == ((1L, 0.041667)))
  }

  test("shapleyAttribution: symmetric channels split credit equally") {
    // one unit touching both click and view, converted; v({c,v})=1 and
    // both singletons unobserved -> φ(click)=φ(view)=2·1/24 each
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.shapleyAttribution(ev).collect()
      .map(x => x.getAs[String]("channel") -> x.getAs[Double]("shapley"))
      .toMap
    assert(r == Map("click" -> 0.083333, "view" -> 0.083333))
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
}
