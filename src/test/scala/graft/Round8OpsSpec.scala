package graft

import org.apache.spark.sql.functions.{col, lit}
import graft.analytics.StatsAnalytics

/** Round-8 additions: smoothed target encoding and per-group OLS via
  * decimal-summed normal equations. Hand-built fixtures with answers
  * computed by hand. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncoding shrinks rare categories toward the global prior") {
    // prior = (1+2+3+10)/4 = 4; m = 10
    // a: n=3 sum=6  → encoded = (6 + 40) / 13 = 3.538462
    // b: n=1 sum=10 → encoded = (10 + 40) / 11 = 4.545455
    val ev = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(10.0)), ("b", None) // null value excluded everywhere
    ).toDF("event_type", "value")
    val out = StatsAnalytics.targetEncoding(ev)
      .select("event_type", "n", "mean_value", "encoded")
      .as[(String, Long, Double, Double)].collect().toList
    assert(out == List(
      ("a", 3L, 2.0, 3.538462),
      ("b", 1L, 10.0, 4.545455)))
    // the rare category is pulled 4.5× closer to the prior than its raw mean
    assert(math.abs(4.545455 - 4.0) < math.abs(10.0 - 4.0))
  }

  test("linreg recovers an exact line (R²=1) and a flat group (slope 0)") {
    // group A: y = 2x + 1 exactly; group B: constant y → slope 0 and a
    // zero-variance R² denominator, which the guard turns into NULL.
    val li = Seq(
      ("A", 1.0, 3.0), ("A", 2.0, 5.0), ("A", 3.0, 7.0), ("A", 4.0, 9.0),
      ("B", 1.0, 4.0), ("B", 2.0, 4.0), ("B", 3.0, 4.0)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = StatsAnalytics.linreg(li)
      .select("l_returnflag", "n", "slope", "intercept", "r2")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toList
    val a = out.find(_._1 == "A").get
    assert(a._2 == 4L && a._3.contains(2.0) && a._4.contains(1.0) &&
      a._5.contains(1.0))
    val b = out.find(_._1 == "B").get
    assert(b._2 == 3L && b._3.contains(0.0) && b._5.isEmpty)
  }

  test("invertedIndex: exact df/total_tf, doc-ordered postings, capped " +
    "posting string") {
    // "w" in docs 1,2,3 (tf 2,1,1); "x" only in doc 3. dfFloor=2 keeps w.
    val docs = Seq(
      (1L, "w w"), (2L, "w"), (3L, "x w")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .invertedIndex(docs, dfFloor = 2L, postingCap = 2, k = 10)
      .select("term", "df", "total_tf", "postings")
      .as[(String, Long, Long, String)].collect().toList
    // df counts ALL docs (3) even though the posting string caps at 2
    assert(out == List(("w", 3L, 4L, "1:2,2:1")))
  }

  test("featureHashing: weights are signed token counts; bucket/sign " +
    "derive from independent hash bits") {
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.featureHashing(docs)
      .select("doc_id", "bucket", "weight", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toList
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def row(t: String, n: Long) = {
      val h = h60(t)
      (1L, h & 15L, (if (((h >> 4) & 1L) == 0L) 1L else -1L) * n, n)
    }
    val expect = List(row("a", 2L), row("b", 1L))
      .groupBy(r => (r._1, r._2))
      .map { case ((d, b), rs) =>
        (d, b, rs.map(_._3).sum, rs.map(_._4).sum) }
      .toList.sortBy(r => (r._1, r._2))
    assert(out == expect)
  }

  test("gbdtSplit finds the boundary separating two value plateaus") {
    // quantities 0-1 carry y=10, quantities 4-5 carry y=100: the best
    // stump split is at the gap. bucketWidth=2 → buckets 0 and 2; the
    // winning boundary is after bucket 0 → split_value 2.0.
    val li = Seq(
      ("A", 0.0, 10.0), ("A", 1.0, 10.0), ("A", 1.5, 10.0),
      ("A", 4.0, 100.0), ("A", 5.0, 100.0)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = StatsAnalytics.gbdtSplit(li)
      .select("l_returnflag", "split_value", "n_l", "n_r", "gain")
      .as[(String, Double, Long, Long, Double)].collect().toList
    assert(out.size == 1)
    val (_, split, nL, nR, gain) = out.head
    assert(split == 2.0 && nL == 3L && nR == 2L)
    // SSE decomposition: 30²/3 + 200²/2 - 230²/5 = 300 + 20000 - 10580
    assert(gain == 9720.0)
  }

  test("naiveBayes separates two languages with disjoint vocabularies") {
    val docs = Seq(
      (1L, "aa aa bb", "en"), (2L, "aa bb", "en"),
      (3L, "zz yy", "de"), (4L, "zz zz", "de"),
      (5L, "aa bb bb", "en") // classified en: its tokens never occur in de
    ).toDF("doc_id", "text", "lang")
    val out = graft.ext.TextAnalysis.naiveBayes(docs)
      .select("actual", "predicted", "n_docs")
      .as[(String, String, Long)].collect().toList
    assert(out == List(("de", "de", 2L), ("en", "en", 3L)))
  }

  test("ndcgAtK: perfect ranking scores 1, hits match same-label " +
    "neighbors in the top k") {
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // query 0 (label 1): both same-label vectors are its nearest
    // neighbors, so DCG = IDCG (n_class-1 = 2 ≤ k) → ndcg 1.0.
    val emb = Seq(
      (0L, vec(1, 0, 0, 0), 1), (1L, vec(0.99, 0.1, 0, 0), 1),
      (2L, vec(0.98, 0.2, 0, 0), 1),
      (3L, vec(0, 1, 0, 0), 2), (4L, vec(0, 0.9, 0.1, 0), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.ndcgAtK(emb, k = 4)
      .select("query_id", "hits", "n_class", "ndcg")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out == List((0L, 2L, 3L, 1.0)))
  }

  test("benford extracts first significant digits without log10") {
    val o = Seq(123.45, 4500.0, 7.2, 1.0, 99999.99).toDF("o_totalprice")
    val out = StatsAnalytics.benford(o)
      .select("digit", "n").as[(Long, Long)].collect().toList
    assert(out == List((1L, 2L), (4L, 1L), (7L, 1L), (9L, 1L)))
  }

  test("mutualInfo: a perfectly dependent pair carries ln2/2 per bucket") {
    // bucket 0 (qty<5) always A, bucket 1 always B → MI = ln 2, split
    // evenly across the two buckets (each term (2/4)·ln(2·4/(2·2))).
    val li = Seq(
      (1.0, "A"), (2.0, "A"), (6.0, "B"), (7.0, "B")
    ).toDF("l_quantity", "l_returnflag")
    val out = StatsAnalytics.mutualInfo(li)
      .select("bucket", "n_x", "mi_contribution")
      .as[(Long, Long, Double)].collect().toList
    assert(out == List((0L, 2L, 0.346574), (1L, 2L, 0.346574)))
  }

  test("ksTest: disjoint variant distributions reach D = 1") {
    // assign each user's value by its ACTUAL hash bucket so the two
    // variants' value distributions are fully separated
    val users = (1L to 20L).toList
    val ev = users.map { u =>
      val b = spark.range(1).select(
        graft.operators.Sampling.hashBucket(lit(u), 2))
        .as[Long].head()
      (u, if (b == 0L) 1.0 else 9.0)
    }.toDF("user_id", "value")
    val out = StatsAnalytics.ksTest(ev)
      .select("n_a", "n_b", "d_at_value", "d_stat")
      .as[(Long, Long, Double, Double)].collect().head
    assert(out._1 + out._2 == 20L)
    assert(out._3 == 1.0 && out._4 == 1.0) // ecdfs separate fully at 1.0
  }

  test("bootstrapCi: constant values give a degenerate CI at the mean") {
    val ev = (1L to 40L).map(i => (i, 5.0)).toDF("event_id", "value")
    val out = StatsAnalytics.bootstrapCi(ev)
      .select("mean_full", "ci_lo", "ci_hi", "n_resamples")
      .as[(Double, Double, Double, Long)].collect().head
    assert(out == ((5.0, 5.0, 5.0, 32L)))
  }

  test("survivalKm: censored users hold the at-risk set without dying") {
    // days 1-3; users 1,2 die at lifetime 1 (last event day 2 < horizon 3);
    // user 3 dies at lifetime 0 (only day 1); user 4 survives to the
    // horizon (censored, lifetime 2).
    // t=0: n=4 d=1 → S=0.75; t=1: n=3 d=2 → S=0.25; t=2: n=1 c=1 → S=0.25
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (2L, "2024-01-01 11:00:00"), (2L, "2024-01-02 11:00:00"),
      (3L, "2024-01-01 12:00:00"),
      (4L, "2024-01-01 13:00:00"), (4L, "2024-01-03 13:00:00")
    ).toDF("user_id", "s").select(col("user_id"),
      col("s").cast("timestamp").as("ts"))
    val out = StatsAnalytics.survivalKm(ev)
      .select("t", "n_risk", "d", "c", "s_km")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (0L, 4L, 1L, 0L, 0.75),
      (1L, 3L, 2L, 0L, 0.25),
      (2L, 1L, 0L, 1L, 0.25)))
  }

  test("dpCounts: released counts differ from true by Laplace(1) noise " +
    "and the release is deterministic") {
    val ev = Seq.fill(100)("purchase").toDF("event_type")
    val r1 = StatsAnalytics.dpCounts(ev)
      .select("true_n", "released_n").as[(Long, Double)].collect().head
    val r2 = StatsAnalytics.dpCounts(ev)
      .select("true_n", "released_n").as[(Long, Double)].collect().head
    assert(r1 == r2) // same hash → same noise, reproducible release
    assert(r1._1 == 100L && r1._2 != 100.0)
    // ε=1 noise is almost surely within ±15 (P ≈ 3e-7 otherwise)
    assert(math.abs(r1._2 - 100.0) < 15.0)
  }

  test("powerIteration converges to the dominant axis of an axis-aligned " +
    "cloud with the eigenvalue as the Rayleigh estimate") {
    // Gram = diag(3, 1, 0, 0): top eigenvector (1,0,0,0), eigenvalue 3.
    // Four iterations from all-ones leave a ~1e-4 residual on dim 1.
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val emb = Seq(
      (0L, vec(1, 0, 0, 0)), (1L, vec(1, 0, 0, 0)), (2L, vec(1, 0, 0, 0)),
      (3L, vec(0, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.powerIteration(emb, dim = 4)
      .select("dim_id", "loading", "eigenvalue")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(math.abs(out(0)._2 - 1.0) < 0.001)
    assert(math.abs(out(1)._2) < 0.05 && out(1)._2 > 0.0)
    assert(out(2)._2 == 0.0 && out(3)._2 == 0.0)
    assert(math.abs(out(0)._3 - 3.0) < 0.01)
  }
}
