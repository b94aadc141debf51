package graft

import org.apache.spark.sql.functions.col
import graft.ext.EvalOps

/** Round-10 additions: AUC, calibration/ECE/Brier, leave-one-source-out
  * ablation, 2-D skyline, strict ordered funnel, item-item CF. Hand-built
  * fixtures with answers computed by hand. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  // Stopword ratios: 1.0 (en), 0.25 (en), 0.0 (de), 0.5 (fr) — the fr doc
  // is the high-scoring negative that costs one of the four pos/neg pairs.
  private def docsFixture = Seq(
    (1L, "the the the the", "en"),
    (2L, "a b c d", "en"),
    (3L, "x y", "de"),
    (4L, "the x", "fr")
  ).toDF("doc_id", "text", "lang")

  test("aucReport: 3 of 4 pos/neg pairs ranked correctly gives 0.75") {
    val out = EvalOps.aucReport(docsFixture)
      .as[(Long, Long, Double)].collect().toList
    assert(out == List((2L, 2L, 0.75)))
  }

  test("calibrationReport: per-doc buckets, ECE 0.3125, Brier 0.203125") {
    val out = EvalOps.calibrationReport(docsFixture)
      .select("bucket", "n_docs", "mean_score", "frac_pos", "abs_gap",
        "ece", "brier")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toList
    assert(out == List(
      (0L, 1L, 0.0, 0.0, 0.0, 0.3125, 0.203125),
      (2L, 1L, 0.25, 1.0, 0.75, 0.3125, 0.203125),
      (5L, 1L, 0.5, 0.0, 0.5, 0.3125, 0.203125),
      (9L, 1L, 1.0, 1.0, 0.0, 0.3125, 0.203125)))
  }

  test("sourceAblation: excluding a source shifts the leave-out means") {
    val docs = Seq(
      (1L, "en", "srcA", 10L), (2L, "de", "srcA", 20L),
      (3L, "en", "srcB", 30L), (4L, "en", "srcB", 40L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val out = EvalOps.sourceAblation(docs)
      .select("source", "n_docs", "mean_chars_all", "mean_chars_without",
        "delta_chars", "en_share_without", "delta_en_share")
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toList
    assert(out == List(
      ("srcA", 2L, 25.0, 35.0, 10.0, 1.0, 0.25),
      ("srcB", 2L, 25.0, 15.0, -10.0, 0.5, -0.25)))
  }

  test("skylineParts: dominated rows drop, equal-tradeoff ties survive") {
    val part = Seq(
      (1L, 10, 5.0), // cheapest among sizes >= 10 except p5 chain → stays
      (2L, 20, 7.0), // above its size's min price → dominated by p3
      (3L, 20, 6.0), // p4 has same price, larger size → dominated
      (4L, 30, 6.0), // largest size, min price at that size → stays
      (5L, 5, 4.0),  // globally cheapest → stays
      (6L, 30, 6.0)  // exact tie with p4: neither dominates → both stay
    ).toDF("p_partkey", "p_size", "p_retailprice")
    val out = EvalOps.skylineParts(part)
      .as[(Long, Int, Double)].collect().toList
    assert(out == List((1L, 10, 5.0), (4L, 30, 6.0), (5L, 5, 4.0),
      (6L, 30, 6.0)))
  }

  test("funnelStrict: order and the 7-day step windows both gate") {
    def ts(s: String) = s
    val events = Seq(
      // u1 completes all three steps in order, inside the windows
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-02 00:00:00"),
      (1L, "purchase", "2024-01-03 00:00:00"),
      // u2 clicks 8 days after the view — outside the 7-day window
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-09 00:00:01"),
      // u3 clicks BEFORE the first view — order matters
      (3L, "click", "2024-01-01 00:00:00"),
      (3L, "view", "2024-01-02 00:00:00"),
      // u4 reaches step 2 but purchases too late
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "click", "2024-01-02 00:00:00"),
      (4L, "purchase", "2024-01-10 00:00:01")
    ).toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"))
    val out = EvalOps.funnelStrict(events)
      .as[(Long, Long, Long, Double, Double)].collect().toList
    assert(out == List((4L, 2L, 1L, 0.5, 0.5)))
  }

  test("logregNewton: exact rational step on the binary-fraction fixture") {
    // x1 (stopword ratio) ∈ {1, .25, 0, 0}, x2 (repetition) ∈
    // {.75, 0, 0, .5}, y = (1,1,0,0): every value is a binary fraction so
    // the whole Newton step is exact — w = (−50/79, 448/79, −288/79),
    // and the fitted plane separates the fixture perfectly.
    val docs = Seq(
      (1L, "the the the the", "en"), (2L, "a b c d", "en"),
      (3L, "x y", "de"), (4L, "w w q q", "de")
    ).toDF("doc_id", "text", "lang")
    val out = EvalOps.logregNewton(docs)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toList
    assert(out == List((4L, 2L, -0.632911, 5.670886, -3.64557, 1.0, 0.5)))
  }

  test("hrwShardMove: full corpus accounted, movement stays a minority") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.ext.TextAnalysis.hrwShardMove(docs)
      .select("shard_id", "n_docs", "n_moved", "pct_moved")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out.map(_._1) == out.map(_._1).sorted && out.size <= 8)
    assert(out.map(_._2).sum == docs.count())
    // HRW moves ~1/9 of each shard to the new shard — far below the
    // ~8/9 a mod-hash reshard would move; assert a generous ceiling
    val moved = out.map(_._3).sum.toDouble / out.map(_._2).sum
    assert(moved > 0.0 && moved < 0.4, s"moved fraction $moved")
    out.foreach { case (_, n, m, p) =>
      assert(m >= 0L && m <= n)
      assert(p == BigDecimal(m.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("itemCF: cosine similarity is in (0,1], top-k per item, ordered") {
    val out = EvalOps.itemCF(spark, "/root/testdata/sf0.001")
      .select("item", "other", "n_orders", "sim", "rnk")
      .as[(Long, Long, Long, Double, Long)].collect().toList
    assert(out.nonEmpty)
    assert(out.forall { case (_, _, n, s, r) =>
      n >= 1L && s > 0.0 && s <= 1.0 && r >= 1L && r <= 5L })
    // within an item, rnk increases and sim never increases
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5) == (1L to sorted.length).toList)
      assert(sorted.map(_._4).zip(sorted.map(_._4).tail)
        .forall { case (a, b) => a >= b })
    }
  }
}
