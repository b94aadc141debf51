package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.analytics.{EventAnalytics, GraphAnalytics, StarAnalytics,
  StatsAnalytics}

/** Property tests for the round-11 operators: algebraic invariants over
  * ScalaCheck-generated inputs with fixed seeds (the PropertySpec
  * discipline — deterministic CI, no flaky shrink paths). */
class Round21PropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val seeds = Seq(11L, 77L, 1234L)

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mannWhitney: U_a + U_b = n_a*n_b and group swap flips z") {
    for (seed <- seeds) {
      val xs = sample(Gen.listOfN(40, for {
        x <- Gen.choose(1L, 12L); g <- Gen.choose(0, 1)
      } yield (x, g)), seed)
      // ensure both groups populated
      val per = ((5L, 0) +: (6L, 1) +: xs).toDF("x", "g")
      val r = StatsAnalytics.mannWhitneyOnGroups(per).collect()(0)
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(r.getAs[Double]("u_a") + r.getAs[Double]("u_b") ==
        (na * nb).toDouble)
      val swapped = ((5L, 0) +: (6L, 1) +: xs)
        .map { case (x, g) => (x, 1 - g) }.toDF("x", "g")
      val r2 = StatsAnalytics.mannWhitneyOnGroups(swapped).collect()(0)
      assert(r2.getAs[Double]("u_a") == r.getAs[Double]("u_b"))
      assert(math.abs(r2.getAs[Double]("z") + r.getAs[Double]("z")) <
        3e-6, s"seed=$seed")
    }
  }

  test("spearman and kendall both score 1 on strictly monotone pairs") {
    for (seed <- seeds) {
      // customer i gets k_i orders and k_i distinct parts, k_i distinct
      val ks = sample(Gen.pick(6, 1 to 12), seed).toList.sorted
      val orders = ks.zipWithIndex.flatMap { case (k, ci) =>
        (1 to k).map(j => ((ci * 100 + j).toLong, ci.toLong))
      }.toDF("o_orderkey", "o_custkey")
      val li = ks.zipWithIndex.flatMap { case (k, ci) =>
        (1 to k).map(j => ((ci * 100 + j).toLong, j.toLong))
      }.toDF("l_orderkey", "l_partkey")
      val rs = StatsAnalytics.spearmanBreadth(orders, li).collect()(0)
      assert(rs.getAs[Double]("rho_spearman") == 1.0, s"seed=$seed")
      val rk = StatsAnalytics.kendallTau(orders, li).collect()(0)
      assert(rk.getAs[Double]("tau_b") == 1.0, s"seed=$seed")
      assert(rk.getAs[Long]("n_discordant") == 0L)
    }
  }

  test("theil decomposition: total = between + share-weighted within") {
    for (seed <- seeds) {
      val rows = sample(Gen.listOfN(30, for {
        c <- Gen.choose(1L, 12L); p <- Gen.choose(100, 99999)
        s <- Gen.oneOf("A", "B", "C")
      } yield (c, p / 100.0, s)), seed)
      val orders = rows.zipWithIndex.map { case ((c, p, _), i) =>
        (i.toLong, c, p)
      }.toDF("o_orderkey", "o_custkey", "o_totalprice")
      val cust = rows.map { case (c, _, s) => (c, s) }.distinct
        .groupBy(_._1).map { case (c, g) => (c, g.head._2) }.toSeq
        .toDF("c_custkey", "c_mktsegment")
      val out = StatsAnalytics.theilIndex(orders, cust).collect()
      val total = out.find(_.getString(0) == "total").get
        .getAs[Double]("theil")
      val between = out.find(_.getString(0) == "between").get
        .getAs[Double]("theil")
      val withinSum = out.filter(_.getString(0) == "within")
        .map(r => r.getAs[Double]("spend_share") * r.getAs[Double]("theil"))
        .sum
      assert(math.abs(total - (between + withinSum)) < 1e-4,
        s"seed=$seed total=$total betw=$between within=$withinSum")
    }
  }

  test("cramersV is invariant under duplicating every row") {
    for (seed <- seeds) {
      val rows = sample(Gen.listOfN(40, for {
        t <- Gen.oneOf("X", "Y", "Z"); day <- Gen.choose(1, 7)
      } yield (t, day)), seed)
      def df(mult: Int) = rows.flatMap(r => Seq.fill(mult)(r))
        .zipWithIndex.map { case ((t, day), i) =>
          (i.toLong, ts(f"2024-03-0$day%d 10:00:00"), 1L, t, 1.0)
        }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val v1 = StatsAnalytics.cramersV(df(1)).collect()(0)
      val v2 = StatsAnalytics.cramersV(df(2)).collect()(0)
      assert(math.abs(v1.getAs[Double]("cramers_v") -
        v2.getAs[Double]("cramers_v")) < 3e-6, s"seed=$seed")
      assert(math.abs(v2.getAs[Double]("chi2") -
        2.0 * v1.getAs[Double]("chi2")) < 1e-4)
    }
  }

  test("JaroWinklerSim: symmetric, bounded, 1 iff equal (random ASCII)") {
    for (seed <- seeds) {
      val strs = sample(Gen.listOfN(30,
        Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)), seed)
      for (a <- strs.take(10); b <- strs.take(10)) {
        val s1 = graft.plans.JaroWinklerSim.similarity(a, b)
        val s2 = graft.plans.JaroWinklerSim.similarity(b, a)
        assert(s1 == s2, s"asym: $a $b")
        assert(s1 >= 0.0 && s1 <= 1.0)
        if (a == b) assert(s1 == 1.0)
      }
    }
  }

  test("ohlcDaily: low <= open/close <= high; volume counts rows") {
    for (seed <- seeds) {
      val rows = sample(Gen.listOfN(50, for {
        day <- Gen.choose(1, 5); hr <- Gen.choose(0, 23)
        v <- Gen.choose(1, 9999)
      } yield (day, hr, v / 100.0)), seed)
      val ev = rows.zipWithIndex.map { case ((day, hr, v), i) =>
        (i.toLong, ts(f"2024-03-0$day%d $hr%02d:30:00"), 1L, "purchase", v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = EventAnalytics.ohlcDaily(ev).collect()
      assert(out.map(_.getAs[Long]("n_trades")).sum == rows.length)
      out.foreach { r =>
        val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"))
        assert(l <= math.min(o, c) && math.max(o, c) <= h, s"row $r")
      }
    }
  }

  test("revenueBridge reconciles exactly on random data") {
    for (seed <- seeds) {
      val rows = sample(Gen.listOfN(40, for {
        part <- Gen.choose(1L, 8L); day <- Gen.choose(1, 9)
        q <- Gen.choose(1, 9); p <- Gen.choose(100, 9999)
      } yield (part, day, q.toDouble, p / 100.0)), seed)
      val orders = rows.map(_._2).distinct.map(d =>
        (d.toLong, ts(f"2024-03-0$d%d 00:00:00")))
        .toDF("o_orderkey", "o_orderdate")
      val li = rows.zipWithIndex.map { case ((part, day, q, p), i) =>
        (day.toLong, part, q, q * p, 0.0)
      }.toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
      val r = StarAnalytics.revenueBridge(li, orders).collect()(0)
      val recon = r.getAs[Double]("price_effect") +
        r.getAs[Double]("volume_effect") +
        r.getAs[Double]("new_parts_effect") +
        r.getAs[Double]("lost_parts_effect")
      assert(math.abs(r.getAs[Double]("delta") - recon) < 5e-5,
        s"seed=$seed $r")
    }
  }

  test("linkJaccardOnEdges: only non-edges, jaccard in (0,1]") {
    for (seed <- seeds) {
      val raw = sample(Gen.listOfN(50, for {
        a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
      } yield (math.min(a, b), math.max(a, b))), seed)
        .filter(p => p._1 != p._2).distinct
      val out = GraphAnalytics
        .linkJaccardOnEdges(raw.toDF("a", "b"), 1000).collect()
      val edges = raw.toSet
      out.foreach { r =>
        val pair = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
        assert(!edges.contains(pair), s"edge proposed: $pair")
        val j = r.getAs[Double]("jaccard")
        assert(j > 0.0 && j <= 1.0)
        assert(r.getAs[Long]("common_neighbors") >= 1L)
      }
    }
  }

  test("abcClassification: shares sum to 1, classes ordered A>=B>=C") {
    for (seed <- seeds) {
      val rows = sample(Gen.listOfN(30, for {
        part <- Gen.choose(1L, 20L); p <- Gen.choose(100, 99999)
      } yield (part, p / 100.0)), seed)
      val li = rows.zipWithIndex.map { case ((part, p), i) =>
        (i.toLong, part, 1.0, p, 0.0)
      }.toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount")
      val out = StarAnalytics.abcClassification(li).collect()
      val shareSum = out.map(_.getAs[Double]("revenue_share")).sum
      assert(math.abs(shareSum - 1.0) < 5e-6, s"seed=$seed")
      // mean revenue per part must be non-increasing A → B → C
      val byCls = out.map(r => r.getString(0) ->
        (r.getAs[Double]("revenue") / r.getAs[Long]("n_parts"))).toMap
      for (pair <- Seq(("A", "B"), ("B", "C"))
           if byCls.contains(pair._1) && byCls.contains(pair._2))
        assert(byCls(pair._1) >= byCls(pair._2), s"seed=$seed $byCls")
    }
  }
}
