package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.InferenceAnalytics

/** Round-26 seeded invariants for the inference wave — the Sen-median
  * lesson applied (PLANS.md): cross-engine hash agreement proves
  * determinism, not correctness, so ops whose oracle shares the formula
  * get an ALGEBRAIC invariant on top. Each test is deterministic
  * (fixed seed) and checks a property the shared formula could get
  * wrong without either engine noticing. */
class Round26PropSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def ev(rows: (Long, String, String, java.lang.Double)*) =
    rows.zipWithIndex.map { case ((uid, et, t, v), i) =>
      (i.toLong, uid, et, ts(t), v)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")

  private def bucket(uid: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(uid.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 2
  }

  /** Survival fixture + its cohort-swapped twin: the same multiset of
    * (lifetime, censoring) patterns, but every pattern carried by a
    * bucket-0 id in one frame is carried by a bucket-1 id in the other.
    * Swapping cohorts must flip the hazard ratio to its reciprocal and
    * leave the log-rank chi-square unchanged. */
  private def swappedPair(): (org.apache.spark.sql.DataFrame,
                              org.apache.spark.sql.DataFrame) = {
    val ids = (1L to 400L)
    val b0 = ids.filter(bucket(_) == 0L).take(40)
    val b1 = ids.filter(bucket(_) == 1L).take(40)
    val rnd = new scala.util.Random(26001)
    // 40 patterns per cohort: first-event day 1, last-event day 1+len;
    // cohort-A patterns die sooner on average (len 0..9 vs 3..12)
    val lensA = Array.fill(40)(rnd.nextInt(10))
    val lensB = Array.fill(40)(3 + rnd.nextInt(10))
    // one far-out sentinel id per frame pins the horizon so that no
    // pattern user is horizon-censored differently across frames
    val horizonRows = Seq((999L, "view", "2024-02-15 00:00:00",
      java.lang.Double.valueOf(1.0)))
    def rowsFor(ids0: Seq[Long], lens0: Array[Int],
                ids1: Seq[Long], lens1: Array[Int]) = {
      val rs = (ids0.zip(lens0) ++ ids1.zip(lens1)).flatMap {
        case (u, len) =>
          Seq((u, "view", "2024-01-01 00:00:00",
            java.lang.Double.valueOf(1.0))) ++
            (if (len > 0)
              Seq((u, "view", f"2024-01-${1 + len}%02d 00:00:00",
                java.lang.Double.valueOf(1.0)))
            else Seq.empty)
      }
      ev((rs ++ horizonRows): _*)
    }
    // A: short lives in bucket 0, long lives in bucket 1
    // B: the SAME patterns with the cohorts exchanged
    (rowsFor(b0, lensA, b1, lensB), rowsFor(b0, lensB, b1, lensA))
  }

  test("hazardRatio: exchanging the cohorts reciprocates the hazard " +
    "ratio, swaps O/E, and flips the direction flag") {
    val (a, b) = swappedPair()
    // the sentinel 999 must land somewhere; both frames contain it, so
    // O/E totals include it symmetrically only if its bucket is fixed —
    // it is (bucket(999) is whatever it is, same in both frames) and it
    // is horizon-censored (its only event IS the horizon), so it never
    // contributes a death.
    val ra = InferenceAnalytics.hazardRatio(a).collect().head
    val rb = InferenceAnalytics.hazardRatio(b).collect().head
    // deaths and expectations swap across cohorts, modulo the sentinel
    // (censored: contributes to at-risk counts, never to O)
    assert(ra.getAs[Long]("o1") == rb.getAs[Long]("o0"))
    assert(ra.getAs[Long]("o0") == rb.getAs[Long]("o1"))
    // the sentinel's at-risk membership does not move, so E swaps only
    // up to its (tiny) contribution — assert the ratio identity instead:
    val hrA = ra.getAs[Double]("hazard_ratio")
    val hrB = rb.getAs[Double]("hazard_ratio")
    assert(hrA > 0.0 && hrB > 0.0)
    assert(math.abs(hrA * hrB - 1.0) < 2e-2,
      s"hr_A=$hrA hr_B=$hrB product=${hrA * hrB}")
    // direction flips (or both are 0 when the CI straddles 1)
    assert(ra.getAs[Int]("direction_at_95") ==
      -rb.getAs[Int]("direction_at_95"))
  }

  test("logRank: the chi-square statistic is invariant under cohort " +
    "exchange") {
    val (a, b) = swappedPair()
    val ra = InferenceAnalytics.logRank(a).collect().head
    val rb = InferenceAnalytics.logRank(b).collect().head
    val c2a = ra.getAs[Double]("chi2_stat")
    val c2b = rb.getAs[Double]("chi2_stat")
    // (O1-E1) flips sign under exchange while V is symmetric; the
    // sentinel shifts E1 by the same amount in both frames' risk walks
    assert(c2a > 0.0)
    assert(math.abs(c2a - c2b) < 0.05 * c2a, s"chi2 $c2a vs $c2b")
    assert(ra.getAs[Int]("reject_at_3841") ==
      rb.getAs[Int]("reject_at_3841"))
  }

  test("partialCorr: matches the closed-form three-variable identity " +
    "on a seeded fixture") {
    val rnd = new scala.util.Random(26002)
    // per-user counts with real structure: clicks ~ views + noise,
    // purchases ~ clicks + noise — the partial corr given views must
    // equal the textbook (rxy - rxz*ryz)/sqrt((1-rxz^2)(1-ryz^2))
    val users = (1L to 60L).map { u =>
      val z = 1 + rnd.nextInt(8)            // views
      val x = z / 2 + rnd.nextInt(4)        // clicks
      val y = x / 2 + rnd.nextInt(3)        // purchases
      (u, x, y, z)
    }
    val rows = users.flatMap { case (u, x, y, z) =>
      Seq.fill(x)((u, "click", "2024-01-01 00:00:00",
        java.lang.Double.valueOf(1.0))) ++
      Seq.fill(y)((u, "purchase", "2024-01-02 00:00:00",
        java.lang.Double.valueOf(1.0))) ++
      Seq.fill(z)((u, "view", "2024-01-03 00:00:00",
        java.lang.Double.valueOf(1.0)))
    }
    val out = InferenceAnalytics.partialCorr(ev(rows: _*)).collect().head
    // independent plain-Scala path
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val num = n * a.zip(b).map { case (p, q) => p * q }.sum -
        a.sum * b.sum
      val den = math.sqrt((n * a.map(p => p * p).sum - a.sum * a.sum) *
        (n * b.map(q => q * q).sum - b.sum * b.sum))
      num / den
    }
    val xs = users.map(_._2.toDouble)
    val ys = users.map(_._3.toDouble)
    val zs = users.map(_._4.toDouble)
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val expected = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(out.getAs[Long]("n_users") == 60L)
    assert(math.abs(out.getAs[Double]("r_click_purchase") - r6(rxy))
      < 1e-6)
    assert(math.abs(out.getAs[Double]("r_partial_given_view") -
      r6(expected)) < 1e-6)
  }

  test("tailDependence: exchanging price and quantity swaps the " +
    "marginal exceedances and preserves the joint count") {
    val rnd = new scala.util.Random(26003)
    val rows = (1 to 300).map { i =>
      val heavy = rnd.nextDouble() < 0.1
      val x = if (heavy) 500.0 + rnd.nextInt(100)
              else 10.0 + rnd.nextInt(50)
      val y = if (heavy && rnd.nextDouble() < 0.7)
                40.0 + rnd.nextInt(10)
              else 1.0 + rnd.nextInt(20)
      (i.toLong, 1, x, y)
    }.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    val swapped = rows.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").as("l_extendedprice"),
      col("l_extendedprice").as("l_quantity"))
    val a = InferenceAnalytics.tailDependence(rows).collect().head
    val b = InferenceAnalytics.tailDependence(swapped).collect().head
    assert(a.getAs[Double]("price_q95") == b.getAs[Double]("qty_q95"))
    assert(a.getAs[Double]("qty_q95") == b.getAs[Double]("price_q95"))
    assert(a.getAs[Long]("n_price_exceed") ==
      b.getAs[Long]("n_qty_exceed"))
    assert(a.getAs[Long]("n_qty_exceed") ==
      b.getAs[Long]("n_price_exceed"))
    assert(a.getAs[Long]("n_joint_exceed") ==
      b.getAs[Long]("n_joint_exceed")) // the copula is symmetric
    // lambda identity: lambda' * ny' = nj = lambda * ny
    val lhs = b.getAs[Double]("lambda_upper") *
      b.getAs[Long]("n_qty_exceed")
    val rhs = a.getAs[Double]("lambda_upper") *
      a.getAs[Long]("n_qty_exceed")
    assert(math.abs(lhs - a.getAs[Long]("n_joint_exceed")) < 1e-3 ||
      math.abs(rhs - a.getAs[Long]("n_joint_exceed")) < 1e-3)
  }

  test("linCcc: a weekly-periodic series makes the snaive forecast " +
    "exact (CCC = 1), and a pure linear trend degrades CCC to the " +
    "closed-form 2v/(2v + 49) while Pearson stays 1") {
    // one event per day, value = daily revenue exactly (dailySeries
    // sums values per day; integers survive the 2dp round untouched)
    def series(v: Int => Double) = ev((0 until 28).map { d =>
      (d.toLong, "view", f"2024-01-${d + 1}%02d 12:00:00",
        java.lang.Double.valueOf(v(d)))
    }: _*)
    // periodic: x(d) = 10 + 2*(d mod 7) → yhat(d) = x(d-7) = x(d)
    val periodic = InferenceAnalytics
      .linCcc(series(d => 10.0 + 2.0 * (d % 7))).collect().head
    assert(periodic.getAs[Long]("n_pairs") == 21L)
    // tight epsilon rather than exact equality: Spark aggregation order
    // is not pinned across versions, only the metric value is
    assert(math.abs(periodic.getAs[Double]("pearson") - 1.0) < 1e-12)
    assert(math.abs(periodic.getAs[Double]("lin_ccc") - 1.0) < 1e-12)
    assert(math.abs(periodic.getAs[Double]("mean_actual") -
      periodic.getAs[Double]("mean_snaive")) < 1e-12)
    // trend: x(d) = 10 + 2*(d mod 7) + d → yhat = x − 7 exactly, so
    // vx = vy, cxy = vx, Δ = 7: Pearson is blind to the constant bias
    // (= 1) while CCC = 2vx/(2vx + 49) — the agreement/linearity split
    // this metric exists for, pinned in closed form
    val trended = InferenceAnalytics
      .linCcc(series(d => 10.0 + 2.0 * (d % 7) + d)).collect().head
    val xs = (7 until 28).map(d => 10.0 + 2.0 * (d % 7) + d)
    val mx = xs.sum / xs.size
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / xs.size
    val expected = 2.0 * vx / (2.0 * vx + 49.0)
    assert(math.abs(trended.getAs[Double]("pearson") - 1.0) < 1e-12)
    assert(math.abs(trended.getAs[Double]("lin_ccc") - r6(expected))
      < 2e-6, s"ccc ${trended.getAs[Double]("lin_ccc")} vs $expected")
    assert(trended.getAs[Double]("lin_ccc") <
      trended.getAs[Double]("pearson")) // |CCC| ≤ |r| always
  }
}
