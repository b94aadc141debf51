package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.analytics.{GraphAnalytics, StatsAnalytics}

/** Property tests for the round-10 operators: algebraic invariants over
  * ScalaCheck-generated inputs with fixed seeds (the PropertySpec
  * discipline — deterministic CI, no flaky shrink paths). */
class Round20PropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val seeds = Seq(7L, 99L, 4242L)

  test("brownTrend s1 satisfies the EWMA recursion s1_t = (x_t + " +
    "s1_{t-1})/2 within the 4dp round") {
    for (seed <- seeds) {
      val xs = sample(Gen.listOfN(25, Gen.choose(0, 40000)), seed)
        .map(_ / 100.0)
      val ev = xs.zipWithIndex.map { case (v, i) =>
        (i.toLong, f"2024-01-${i + 1}%02d 08:00:00", s"u$i", "view",
          Some(v), "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", to_timestamp(col("ts")))
      val out = StatsAnalytics.brownTrend(ev).orderBy("d").collect()
      val s1 = out.map(_.getAs[Double]("s1"))
      val x = out.map(_.getAs[Double]("daily_revenue"))
      assert(math.abs(s1.head - x.head) < 2e-4)
      for (t <- 1 until s1.length)
        assert(math.abs(s1(t) - (x(t) + s1(t - 1)) / 2.0) < 2e-3,
          s"t=$t seed=$seed")
    }
  }

  test("adamicAdarOnEdges never proposes an existing edge, scores are " +
    "positive, and every pair shares >= 1 neighbor (random graphs)") {
    for (seed <- seeds) {
      val raw = sample(Gen.listOfN(60, for {
        a <- Gen.choose(1L, 15L); b <- Gen.choose(1L, 15L)
      } yield (math.min(a, b), math.max(a, b))), seed)
        .filter(p => p._1 != p._2).distinct
      val e = raw.toDF("a", "b")
      val out = GraphAnalytics.adamicAdarOnEdges(e, limit = 1000).collect()
      val edges = raw.toSet
      out.foreach { r =>
        val (u, v) = (r.getLong(0), r.getLong(1))
        assert(u < v)
        assert(!edges.contains((u, v)), s"($u,$v) seed=$seed")
        assert(r.getAs[Long]("common_neighbors") >= 1L)
        assert(r.getAs[Double]("adamic_adar") > 0.0)
      }
    }
  }

  test("dbscanCore accounting closes: core + border + noise = points " +
    "(random embeddings)") {
    for (seed <- seeds) {
      val vecs = sample(Gen.listOfN(30, Gen.listOfN(4,
        Gen.choose(-1000, 1000))), seed)
      val emb = vecs.zipWithIndex.map { case (v, i) =>
        (i.toLong, v.map(_ / 1000.0f).toArray, i.toLong % 3)
      }.toDF("vec_id", "embedding", "label")
      val r = graft.ext.Similarity.dbscanCore(emb, threshold = 0.5,
        minPts = 2L).collect()(0)
      assert(r.getAs[Long]("n_core") + r.getAs[Long]("n_border") +
        r.getAs[Long]("n_noise") == r.getAs[Long]("n_points"))
      assert(r.getAs[Long]("n_points") == 30L)
    }
  }

  test("tCloseness: TVD in [0,1], flagged groups and rows bounded by " +
    "totals (random events)") {
    for (seed <- seeds) {
      val rows = sample(Gen.listOfN(200, for {
        t <- Gen.oneOf("A", "B", "C")
        day <- Gen.choose(1, 5)
        v <- Gen.choose(0, 199)
      } yield (t, day, v)), seed)
      val ev = rows.zipWithIndex.map { case ((t, day, v), i) =>
        (i.toLong, f"2024-01-$day%02d 00:00:00", s"u$i", t,
          Some(v.toDouble), "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", to_timestamp(col("ts")))
      val r = StatsAnalytics.tCloseness(ev).collect()(0)
      val tvd = r.getAs[Double]("max_tvd")
      assert(tvd >= 0.0 && tvd <= 1.0, s"tvd=$tvd seed=$seed")
      assert(r.getAs[Long]("n_wide_groups") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("rows_at_risk") <= 200L)
    }
  }

  test("essReport: 1 <= ESS <= n and ratio in (0,1] (random doc sizes)") {
    for (seed <- seeds) {
      val sizes = sample(Gen.listOfN(40, Gen.choose(1L, 2000L)), seed)
      val docs = sizes.zipWithIndex.map { case (nc, i) =>
        (i.toLong, "x", "en", s"s${i % 4}", nc)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      graft.ext.Curation.essReport(docs).collect().foreach { r =>
        val n = r.getAs[Long]("n_docs").toDouble
        val ess = r.getAs[Double]("ess")
        assert(ess >= 1.0 - 1e-6 && ess <= n + 1e-6, s"ess=$ess seed=$seed")
        val ratio = r.getAs[Double]("ess_ratio")
        assert(ratio > 0.0 && ratio <= 1.0 + 1e-6)
      }
    }
  }

  test("mapAtK stays in [0,1] and n_with_hit <= n_queries (random " +
    "embeddings and labels)") {
    for (seed <- seeds) {
      val vecs = sample(Gen.listOfN(40, Gen.listOfN(4,
        Gen.choose(-1000, 1000))), seed)
      val emb = vecs.zipWithIndex.map { case (v, i) =>
        (i.toLong, v.map(_ / 1000.0f).toArray, i.toLong % 2)
      }.toDF("vec_id", "embedding", "label")
      val r = graft.ext.Similarity.mapAtK(emb, k = 5, queryMod = 7)
        .collect()(0)
      val m = r.getAs[Double]("map")
      assert(m >= 0.0 && m <= 1.0 + 1e-6, s"map=$m seed=$seed")
      assert(r.getAs[Long]("n_with_hit") <= r.getAs[Long]("n_queries"))
    }
  }
}
