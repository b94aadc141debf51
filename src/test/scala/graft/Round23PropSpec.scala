package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.analytics.{EventAnalytics, StatsAnalytics}
import graft.ext.TextAnalysis

/** Seeded property invariants for the round-23 operators — randomized
  * fixtures with FIXED seeds (deterministic CI), checking the algebraic
  * identities the hand-traced Round23OpsSpec fixtures cannot: Shapley
  * efficiency on a complete lattice, Hill scale invariance, rank-test
  * relabeling invariance, shrinkage contraction, mutual-NN injectivity,
  * and Cauchy–Schwarz bounds. */
class Round23PropSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("shapleyAttribution: efficiency on a fully-observed lattice") {
    // one (user, day) unit per coalition mask 0..15 with a seeded random
    // conversion -> every v(S) observed, so Σφ = v(full) − v(∅) exactly
    val rnd = new scala.util.Random(23001)
    val chans = Seq("click", "error", "signup", "view")
    val y = Array.fill(16)(rnd.nextBoolean())
    val rows = (0 until 16).flatMap { m =>
      val u = (m + 1).toLong
      val touches = chans.zipWithIndex.collect {
        case (c, i) if ((m >> i) & 1) == 1 => c }
      val evs = touches ++ (if (y(m)) Seq("purchase") else Nil)
      // a mask-0 non-converter unit needs at least one event row: give
      // it an out-of-whitelist type (counts toward mask 0, y 0)
      val evs2 = if (evs.isEmpty) Seq("error_page") else evs
      evs2.map(t => (u, Timestamp.valueOf("2024-01-01 10:00:00"), t))
    }
    val ev = rows.toDF("user_id", "ts", "event_type")
    val phis = EventAnalytics.shapleyAttribution(ev).collect()
      .map(_.getAs[Double]("shapley"))
    val lhs = phis.sum
    val rhs = (if (y(15)) 1.0 else 0.0) - (if (y(0)) 1.0 else 0.0)
    assert(math.abs(lhs - rhs) < 4e-6, s"sum=$lhs expected=$rhs")
  }

  test("hillTail: scale invariance of the tail index") {
    val rnd = new scala.util.Random(23002)
    val xs = Seq.fill(200)(BigDecimal(50.0 + rnd.nextDouble() * 1e5)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val base = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("o_orderkey", "o_totalprice")
    val scaled = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, (x * 7).setScale(2, BigDecimal.RoundingMode.HALF_UP)) }
      .toDF("o_orderkey", "o_totalprice")
    val a1 = StatsAnalytics.hillTail(base, k = 50).collect()(0)
      .getAs[Double]("tail_alpha")
    val a2 = StatsAnalytics.hillTail(scaled, k = 50).collect()(0)
      .getAs[Double]("tail_alpha")
    // ln(7x) − ln(x) cancellation is exact up to float noise + the 2dp
    // re-quantization of the scaled prices
    assert(math.abs(a1 - a2) < 1e-3, s"$a1 vs $a2")
  }

  test("kruskalWallis and anovaF: group-relabel invariance, H,F >= 0") {
    val rnd = new scala.util.Random(23003)
    val custSeg = (1L to 60L).map(c =>
      (c, Seq("A", "B", "C")(rnd.nextInt(3))))
    val orders = custSeg.flatMap { case (c, _) =>
      (1 to (1 + rnd.nextInt(6))).map(i => (c, c * 100 + i)) }
      .toDF("o_custkey", "o_orderkey")
    val cust = custSeg.toDF("c_custkey", "c_mktsegment")
    val relabeled = custSeg.map { case (c, s) =>
      (c, Map("A" -> "B", "B" -> "C", "C" -> "A")(s)) }
      .toDF("c_custkey", "c_mktsegment")
    val kw1 = StatsAnalytics.kruskalWallis(orders, cust).collect()(0)
    val kw2 = StatsAnalytics.kruskalWallis(orders, relabeled).collect()(0)
    assert(kw1.getAs[Double]("h_corrected") ==
      kw2.getAs[Double]("h_corrected"))
    assert(kw1.getAs[Double]("h") >= 0.0)
    val f1 = StatsAnalytics.anovaF(orders, cust).collect()(0)
    val f2 = StatsAnalytics.anovaF(orders, relabeled).collect()(0)
    assert(f1.getAs[Double]("f") == f2.getAs[Double]("f"))
    assert(f1.getAs[Double]("f") >= 0.0)
    assert(f1.getAs[Double]("ss_between") >= 0.0 &&
      f1.getAs[Double]("ss_within") >= 0.0)
  }

  test("ebShrinkage: shrunk rates contract toward the prior mean") {
    val rnd = new scala.util.Random(23004)
    val rows = (1L to 40L).flatMap { u =>
      val n = 1 + rnd.nextInt(8)
      (1 to n).map(i =>
        (u, if (rnd.nextInt(4) == 0) "purchase" else "view"))
    }
    val ev = rows.toDF("user_id", "event_type")
    val out = StatsAnalytics.ebShrinkage(ev, k = 40).collect()
    if (!out.head.isNullAt(out.head.fieldIndex("alpha"))) {
      val alpha = out.head.getAs[Double]("alpha")
      val beta = out.head.getAs[Double]("beta")
      val mu = alpha / (alpha + beta)
      out.foreach { r =>
        val raw = r.getAs[Double]("raw_rate")
        val sh = r.getAs[Double]("shrunk_rate")
        // contraction: shrunk is between raw and the prior mean
        // (allow r6 rounding slack at the boundaries)
        assert(sh >= math.min(raw, mu) - 2e-6 &&
          sh <= math.max(raw, mu) + 2e-6,
          s"raw=$raw shrunk=$sh mu=$mu")
      }
    }
  }

  test("bitextMine: mutual pairs are injective both ways, margins > 0") {
    val rnd = new scala.util.Random(23005)
    val emb = (0L until 60L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.bitextMine(emb).collect()
    assert(out.nonEmpty)
    val srcs = out.map(_.getAs[Long]("src_id"))
    val dsts = out.map(_.getAs[Long]("dst_id"))
    assert(srcs.distinct.length == srcs.length)
    assert(dsts.distinct.length == dsts.length)
    assert(srcs.forall(_ % 2 == 0) && dsts.forall(_ % 2 == 1))
    out.foreach { r =>
      assert(r.getAs[Double]("margin") > 0.0)
      assert(r.getAs[Double]("sim") <= 1.000001)
    }
  }

  test("tfidfPairs: Cauchy-Schwarz bound and canonical pair order") {
    val rnd = new scala.util.Random(23006)
    val vocab = ('a' to 'p').map(_.toString)
    val docTf = (1L to 30L).flatMap { d =>
      rnd.shuffle(vocab).take(3 + rnd.nextInt(8))
        .map(t => (d, t, (1 + rnd.nextInt(4)).toLong)) }
      .toDF("doc_id", "term", "tf")
    val nDocs = Seq(30L).toDF("n_docs")
    val out = TextAnalysis.tfidfPairsOf(docTf, nDocs, maxDf = 20L, k = 50)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("cosine") <= 1.000001)
      assert(r.getAs[Double]("cosine") > 0.0)
    }
  }

  test("adstockSweep: decay-0 arm equals the plain click correlation") {
    val rnd = new scala.util.Random(23007)
    val days = (1 to 20).map(d => f"2024-01-$d%02d")
    val rows = days.flatMap { d =>
      val clicks = (1 to 1 + rnd.nextInt(5)).map(_ =>
        (Timestamp.valueOf(s"$d 10:00:00"), "click",
          null.asInstanceOf[java.lang.Double]))
      val buys = (1 to 1 + rnd.nextInt(3)).map(_ =>
        (Timestamp.valueOf(s"$d 12:00:00"), "purchase",
          java.lang.Double.valueOf(5.0 + rnd.nextInt(50))))
      clicks ++ buys
    }
    val ev = rows.toDF("ts", "event_type", "value")
    val sweep = EventAnalytics.adstockSweep(ev, decays = Seq(0.0))
      .collect()(0).getAs[Double]("corr_revenue")
    // direct Pearson over the daily frame
    val daily = ev.groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("event_type") === "click", 1.0).otherwise(0.0))
          .as("x"),
        round(sum(when(col("event_type") === "purchase",
          coalesce(col("value"), lit(0.0))).otherwise(lit(0.0))
          .cast("decimal(18,6)")), 2).cast("double").as("y"))
    val m = daily.agg(count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy")).collect()(0)
    val (n, sx, sy) = (m.getAs[Double]("n"), m.getAs[Double]("sx"),
      m.getAs[Double]("sy"))
    val corr = (n * m.getAs[Double]("sxy") - sx * sy) /
      math.sqrt((n * m.getAs[Double]("sxx") - sx * sx) *
        (n * m.getAs[Double]("syy") - sy * sy))
    assert(math.abs(sweep - corr) < 1e-5, s"$sweep vs $corr")
    // any decay's correlation is a correlation
    EventAnalytics.adstockSweep(ev).collect().foreach { r =>
      val c = r.getAs[Double]("corr_revenue")
      assert(c >= -1.000001 && c <= 1.000001)
    }
  }

  test("heapsLaw: cumulative columns are consistent and beta positive " +
    "for growing vocabulary") {
    val rnd = new scala.util.Random(23008)
    val vocab = (1 to 400).map(i => s"w$i")
    val docTf = (0L until 40L).flatMap { d =>
      rnd.shuffle(vocab).take(20)
        .map(t => (d, t, (1 + rnd.nextInt(3)).toLong)) }
      .toDF("doc_id", "term", "tf")
    val maxId = Seq(39L).toDF("max_id")
    val out = TextAnalysis.heapsLawOf(docTf, maxId, buckets = 8)
      .collect()
    val tokCum = out.map(_.getAs[Long]("tokens_cum"))
    val vocCum = out.map(_.getAs[Long]("vocab_cum"))
    assert(tokCum.zip(tokCum.tail).forall { case (a, b) => b > a })
    assert(vocCum.zip(vocCum.tail).forall { case (a, b) => b >= a })
    assert(out.head.getAs[Long]("tokens_cum") ==
      out.head.getAs[Long]("n_tokens"))
    assert(out.head.getAs[Double]("heaps_beta") > 0.0)
  }
}
