package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.InferenceAnalytics

/** Seeded property invariants for the round-25 operators — the algebraic
  * identities that survive any fixture: antisymmetry, shift/scale/affine
  * equivariance, duplication invariance, probability complements, and
  * the BH prefix property. Each would catch a formula bug that a single
  * hand-computed fixture can miss (the PortableGamma lesson: both
  * engines can agree on the wrong number). */
class Round25PropSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String, java.lang.Double)*) =
    rows.zipWithIndex.map { case ((uid, et, t, v), i) =>
      (i.toLong, uid, et, ts(t), v)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")

  private def series(vals: Seq[Double]) = ev(vals.zipWithIndex.map {
    case (v, i) => (1L, "view", f"2024-01-${i + 1}%02d 00:00:00",
      java.lang.Double.valueOf(v))
  }: _*)

  private val rnd = new scala.util.Random(25100)
  private val base = (1 to 24).map(_ => 100.0 + rnd.nextInt(500))

  test("mannKendall: reversing the series in time negates S, Z, and " +
    "the Sen slope") {
    val fwd = InferenceAnalytics.mannKendall(series(base)).collect().head
    val rev = InferenceAnalytics.mannKendall(series(base.reverse))
      .collect().head
    assert(rev.getAs[Long]("s_stat") == -fwd.getAs[Long]("s_stat"))
    assert(rev.getAs[Double]("var_s") == fwd.getAs[Double]("var_s"))
    assert(math.abs(rev.getAs[Double]("z_stat") +
      fwd.getAs[Double]("z_stat")) < 2e-6)
    assert(math.abs(rev.getAs[Double]("sen_slope") +
      fwd.getAs[Double]("sen_slope")) < 2e-6)
  }

  test("pageHinkley: the drift statistic is invariant to a level " +
    "shift of the whole series") {
    def phCols(vals: Seq[Double]) = InferenceAnalytics
      .pageHinkley(series(vals)).collect()
      .map(r => (r.getAs[String]("d"), r.getAs[Double]("m_stat"),
        r.getAs[Double]("ph_stat"), r.getAs[Double]("band_2sd"),
        r.getAs[Int]("alarm_2sd")))
    val a = phCols(base)
    val b = phCols(base.map(_ + 1000.0))
    a.zip(b).foreach { case ((d1, m1, p1, s1, f1), (d2, m2, p2, s2, f2)) =>
      assert(d1 == d2)
      assert(math.abs(m1 - m2) < 2e-6)
      assert(math.abs(p1 - p2) < 2e-6)
      assert(math.abs(s1 - s2) < 2e-6)
      assert(f1 == f2)
    }
  }

  test("thetaForecast: doubling the series doubles every forecast " +
    "component") {
    val one = InferenceAnalytics.thetaForecast(series(base)).collect()
      .sortBy(_.getAs[Long]("h"))
    val two = InferenceAnalytics.thetaForecast(series(base.map(_ * 2.0)))
      .collect().sortBy(_.getAs[Long]("h"))
    one.zip(two).foreach { case (o, t) =>
      Seq("trend_part", "ses_part", "forecast").foreach { c =>
        assert(math.abs(t.getAs[Double](c) - 2.0 * o.getAs[Double](c))
          < 2e-5, c)
      }
    }
  }

  test("gevMaxima: affine transform x -> 100 + 2x leaves the shape, " +
    "scales sigma, shifts mu") {
    val one = InferenceAnalytics.gevMaxima(series(base)).collect().head
    val two = InferenceAnalytics
      .gevMaxima(series(base.map(x => 100.0 + 2.0 * x))).collect().head
    assert(math.abs(two.getAs[Double]("shape_k") -
      one.getAs[Double]("shape_k")) < 2e-6)
    assert(math.abs(two.getAs[Double]("sigma") -
      2.0 * one.getAs[Double]("sigma")) < 1e-3)
    assert(math.abs(two.getAs[Double]("mu") -
      (100.0 + 2.0 * one.getAs[Double]("mu"))) < 1e-3)
  }

  test("charEntropy: duplicating every document leaves the per-source " +
    "entropies unchanged") {
    val docs0 = Seq(
      (1L, "the quick brown fox jumps", "en", "sA", 25L),
      (2L, "pack my box with five dozen", "en", "sA", 27L),
      (3L, "zz top zz bottom", "en", "sB", 16L))
    val docs = docs0.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dup = (docs0 ++ docs0.map { case (id, t, l, s, n) =>
      (id + 100L, t, l, s, n) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = graft.ext.TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val b = graft.ext.TextAnalysis.charEntropy(dup).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    a.keys.foreach { s =>
      Seq("h_unigram", "h_bigram", "cond_entropy", "redundancy")
        .foreach { c =>
          assert(math.abs(a(s).getAs[Double](c) - b(s).getAs[Double](c))
            < 2e-6, s"$s/$c")
        }
      assert(b(s).getAs[Long]("n_chars") == 2 * a(s).getAs[Long]("n_chars"))
    }
  }

  test("bayesAb: mirrored experiments have complementary win " +
    "probabilities") {
    // same counts with the arms' conversions swapped: since ties have
    // measure zero under continuous posteriors, P(B>A) + P(A>B) = 1
    def buckets(want: Long, k: Int): Seq[Long] =
      (1L to 500L).filter(u => {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(u.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16) % 2 == want
      }).take(k)
    val a = buckets(0L, 8); val b = buckets(1L, 8)
    def data(convA: Int, convB: Int) = ev(
      (a.take(convA).map(u => (u, "purchase", "2024-01-01 00:00:00",
        java.lang.Double.valueOf(100.0))) ++
        a.drop(convA).map(u => (u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0))) ++
        b.take(convB).map(u => (u, "purchase", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(100.0))) ++
        b.drop(convB).map(u => (u, "view", "2024-01-01 00:00:00",
          java.lang.Double.valueOf(1.0)))): _*)
    val p1 = InferenceAnalytics.bayesAb(data(2, 6)).collect().head
      .getAs[Double]("prob_b_beats_a")
    val p2 = InferenceAnalytics.bayesAb(data(6, 2)).collect().head
      .getAs[Double]("prob_b_beats_a")
    assert(math.abs(p1 + p2 - 1.0) < 1e-5)
  }

  test("bhFdr: the discovery set is always a prefix of the p-ranked " +
    "metric list") {
    val rnd2 = new scala.util.Random(25101)
    val rows = (1L to 60L).flatMap { u =>
      val heavy = u % 2 == 0
      Seq((u, "view", "2024-01-01 00:00:00",
        java.lang.Double.valueOf(1.0))) ++
        (if (heavy) (1 to 14).map(_ => (u, "click",
          "2024-01-01 00:05:00", java.lang.Double.valueOf(1.0)))
        else Seq()) ++
        (1 to rnd2.nextInt(3)).map(_ => (u, "purchase",
          "2024-01-01 00:06:00", java.lang.Double.valueOf(5.0)))
    }
    val out = InferenceAnalytics.bhFdr(ev(rows: _*)).collect()
    val disc = out.filter(_.getAs[Int]("discovery_at_q10") == 1)
      .map(_.getAs[Long]("rank"))
    val non = out.filter(_.getAs[Int]("discovery_at_q10") == 0)
      .map(_.getAs[Long]("rank"))
    if (disc.nonEmpty && non.nonEmpty)
      assert(disc.max < non.min)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to out.length).toSeq)
  }
}
