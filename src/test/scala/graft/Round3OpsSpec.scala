package graft

import org.apache.spark.sql.functions._
import graft.analytics.{EventAnalytics, StarAnalytics}
import graft.ext.TextAnalysis
import graft.operators.Sampling

/** Round-3 coverage additions: deterministic stratified sampling, cohort
  * retention, transition matrix, min_by/max_by first-last, TF-IDF,
  * quality gate, semi/anti star joins. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val ev = Tables.events(spark, sf)
    val rates = Map("purchase" -> 1000, "view" -> 100)
    val s1 = Sampling.stratifiedSample(ev, col("event_type"),
      col("event_id"), rates).select("event_id")
      .as[Long].collect().sorted.toSeq
    val s2 = Sampling.stratifiedSample(ev, col("event_type"),
      col("event_id"), rates).select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(s1 == s2) // same subset on re-execution
    val byType = Sampling.stratifiedSample(ev, col("event_type"),
      col("event_id"), rates)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    val totals = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("purchase") == totals("purchase")) // rate 1000‰ keeps all
    assert(!byType.contains("signup")) // default rate 0 drops the stratum
    // 100‰ keeps roughly 10%; allow generous tolerance at fixture scale
    val frac = byType("view").toDouble / totals("view")
    assert(frac > 0.03 && frac < 0.25, s"view fraction $frac")
  }

  test("retention cohorts: offset-0 row equals cohort size, counts shrink") {
    val ev = Seq(
      (1L, ts("2022-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2022-01-02 10:00:00"), 1L, "view"),
      (3L, ts("2022-01-01 11:00:00"), 2L, "view"),
      (4L, ts("2022-01-03 10:00:00"), 2L, "view"),
      (5L, ts("2022-01-02 09:00:00"), 3L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.retentionCohorts(ev)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2022-01-01", 0L, 2L), // users 1,2 first seen day 1
      ("2022-01-01", 1L, 1L), // user 1 back on day 2
      ("2022-01-01", 2L, 1L), // user 2 back on day 3
      ("2022-01-02", 0L, 1L))) // user 3 cohort of one
  }

  test("transition matrix: per-user ordered pairs, probabilities sum to 1") {
    val ev = Seq(
      (1L, ts("2022-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2022-01-01 10:01:00"), 1L, "view"),
      (3L, ts("2022-01-01 10:02:00"), 1L, "purchase"),
      (4L, ts("2022-01-01 10:00:00"), 2L, "view"),
      (5L, ts("2022-01-01 10:01:00"), 2L, "signup")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.transitionMatrix(ev)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("view", "purchase", 1L, 0.333333),
      ("view", "signup", 1L, 0.333333),
      ("view", "view", 1L, 0.333333)))
  }

  test("first/last per type agrees with an explicit sort") {
    val ev = Tables.events(spark, sf)
    val out = EventAnalytics.firstLastEvents(ev)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, firstId, lastId, n) =>
      val sorted = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("ts"))
        .orderBy(col("ts"), col("event_id"))
        .as[(Long, java.sql.Timestamp)].collect()
      assert(sorted.length == n)
      assert(sorted.head._1 == firstId, s"$t first")
      assert(sorted.last._1 == lastId, s"$t last")
    }
  }

  test("tfidf ranks distinctive terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ran in the park"),
      (3L, "the cat and the dog")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTop(docs, k = 2)
      .as[(Long, String, Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._6).map(_._2).toSeq).toMap
    // 'the' appears in every doc → idf = ln(1) = 0 → never top-ranked
    assert(!out.values.flatten.toSet.contains("the"))
    // doc 1's distinctive terms beat shared ones
    assert(out(1L).toSet.subsetOf(Set("cat", "sat", "on", "mat")))
  }

  test("quality gate flags short, stopword-free, and repetitive docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog and then the fox " +
        "rests in the shade of a tall tree for a while today"), // keep
      (2L, "tiny doc"), // too_short (+ low_stopword)
      (3L, Seq.fill(30)("spam").mkString(" ")), // repetitive + low_stopword
      (4L, (1 to 30).map(i => s"w$i").mkString(" ")) // low_stopword
    ).toDF("doc_id", "text")
    val m = TextAnalysis.qualityGate(docs)
      .as[(Long, Long, Double, Double, Boolean, String)]
      .collect().map(r => r._1 -> (r._5, r._6)).toMap
    assert(m(1L)._1, m(1L)._2)
    assert(!m(2L)._1 && m(2L)._2.contains("too_short"))
    assert(!m(3L)._1 && m(3L)._2.contains("repetitive"))
    assert(!m(4L)._1 && m(4L)._2 == "low_stopword")
  }

  test("scd2History builds half-open versioned intervals per key") {
    val feed = Seq(
      (1L, "2022-01-01", "view"),
      (1L, "2022-01-02", "view"),     // same state → same version
      (1L, "2022-01-05", "purchase"), // change (gap days roll into v1)
      (1L, "2022-01-06", "view"),     // change back → NEW version, not v1
      (2L, "2022-01-03", "signup")
    ).toDF("user_id", "day", "state")
    val out = graft.operators.Upsert
      .scd2History(feed, "user_id", "day", "state")
      .orderBy("user_id", "valid_from")
      .as[(Long, Long, String, String, Option[String], Boolean, Long)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 1L, "view", "2022-01-01", Some("2022-01-05"), false, 2L),
      (1L, 2L, "purchase", "2022-01-05", Some("2022-01-06"), false, 1L),
      (1L, 3L, "view", "2022-01-06", None, true, 1L),
      (2L, 1L, "signup", "2022-01-03", None, true, 1L)))
  }

  test("scd2History handles NULL attribute values as real versions") {
    val feed = Seq(
      (1L, "2022-01-01", None: Option[String]), // first value NULL
      (1L, "2022-01-02", Some("a")),
      (1L, "2022-01-03", None),                 // transition TO null
      (1L, "2022-01-04", None)                  // consecutive nulls merge
    ).toDF("user_id", "day", "state")
    val out = graft.operators.Upsert
      .scd2History(feed, "user_id", "day", "state")
      .orderBy("valid_from")
      .as[(Long, Long, Option[String], String, Option[String], Boolean,
        Long)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 1L, None, "2022-01-01", Some("2022-01-02"), false, 1L),
      (1L, 2L, Some("a"), "2022-01-02", Some("2022-01-03"), false, 1L),
      (1L, 3L, None, "2022-01-03", None, true, 2L)))
  }

  test("minhash estimate tracks exact Jaccard on candidate pairs") {
    // Planted near-dups guarantee LSH candidates regardless of fixture.
    val base = (1 to 25).map(i => s"token$i").mkString(" ")
    val other = (30 to 55).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extra tail words"), // near-dup of 1, J ≈ 0.85
      (3L, other),
      (4L, other + " slightly different"), // near-dup of 3
      (5L, (60 to 90).map(i => s"unrelated$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.ext.DedupExt.minhashEstimateVsExact(docs)
      .as[(Long, Long, Double, Double, Double)].collect()
    val pairs = out.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)), pairs)
    out.foreach { case (a, b, est, exact, err) =>
      assert(a < b)
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(err - math.abs(est - exact)) < 1e-9)
      // k=32 signature: standard error sqrt(J(1-J)/32) ≤ 0.09 — with the
      // de-correlated seed family 0.25 is a > 2.5σ bound.
      assert(err <= 0.25, s"pair ($a,$b) est=$est exact=$exact")
    }
  }

  test("percent_rank/cume_dist bounds and monotonicity per partition") {
    val out = SparkEntry.queries("q_value_ranks")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.foreach { case (_, _, _, pr, cd) =>
        assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      }
    }
  }

  test("kmeans refinement: every vector assigned once, centroids are means") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val out = graft.ext.Similarity.kmeansRefine(emb)
      .as[(Long, Long, Double, Long)].collect()
    // each (centroid, dim) row carries that centroid's member count; the
    // member counts over any one dim partition the corpus
    val membersByDim = out.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    assert(membersByDim.values.toSet == Set(n))
    // 64 dims per surviving centroid
    out.groupBy(_._1).foreach { case (c, rows) =>
      assert(rows.length == 64, s"centroid $c has ${rows.length} dims")
    }
    assert(out.forall { case (_, _, v, _) => !v.isNaN && v.abs <= 1.0 })
  }

  test("curation pipeline output is a subset of every stage's keep set") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.curationPipeline(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty && out.size < docs.count())
    val quality = TextAnalysis.qualityGate(docs).filter(col("keep"))
      .select("doc_id").as[Long].collect().toSet
    val keepers = graft.ext.DedupExt.exactDedup(docs)
      .select("keeper_doc_id").as[Long].collect().toSet
    val clean = TextAnalysis.decontaminate(docs)
      .filter(!col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(out.subsetOf(quality) && out.subsetOf(keepers) &&
      out.subsetOf(clean))
    assert(out.forall(_ % 100 != 0)) // eval docs never survive
  }

  test("semi/anti customer joins partition the customer set") {
    val c = Tables.customer(spark, sf).count()
    val active = StarAnalytics.activeCustomers(spark, sf)
    val dormant = StarAnalytics.dormantCustomers(spark, sf)
    // semi plans as a semi join (no duplication), anti as anti
    val pActive = active.queryExecution.executedPlan.toString
    val pDormant = dormant.queryExecution.executedPlan.toString
    assert(pActive.contains("LeftSemi"), pActive.take(300))
    assert(pDormant.contains("LeftAnti"), pDormant.take(300))
    val a = active.count()
    val d = dormant.count()
    assert(a > 0 && a < c)
    // dormant ∩ any-order customers = ∅
    val withOrders = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left_semi")
    assert(dormant.join(withOrders, Seq("c_custkey"), "inner").count() == 0)
    assert(d + withOrders.count() == c)
  }
}
