package graft

import org.apache.spark.sql.functions._
import graft.ext.{Curation, Similarity}

/** Round-12 additions: corpus-governance operators (domain cap, blocklist
  * gate, OOV audit) and contrastive hard-negative mining. Hand-built
  * fixtures with answers computed by hand. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("domainCap: caps per source in md5-hash order, deterministically") {
    // md5 first-15-hex prefixes: '1'→c4ca4238a0b9238, '2'→c81e728d9d4c2f6,
    // '3'→eccbc87e4b5ce2f — hash order within source a is 1 < 2 < 3, so
    // cap=2 keeps docs 1 and 2. Source b has one doc; min(cap, n) applies.
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (9L, "b")
    ).toDF("doc_id", "source")
    val out = Curation.domainCap(docs, cap = 2)
      .as[(String, Long, Long)].collect().toList
    assert(out == List(("a", 1L, 1L), ("a", 2L, 2L), ("b", 9L, 1L)))
    // partitioning-independence: a different physical layout of the same
    // rows yields the identical capped set and ranks
    val out7 = Curation.domainCap(docs.repartition(7), cap = 2)
      .as[(String, Long, Long)].collect().toList
    assert(out7 == out)
  }

  test("blocklistGate: integer flag rule, integral sums, one division") {
    // src a doc1: distinct {slow,dup,fast} → 3, hits 2 → 2000 > 150: flag.
    // src a doc2: 21 distinct, 1 hit → 1000 > 1050 is false: clean.
    // src b doc3: no hits.
    val docs = Seq(
      ("a", "slow dup fast fast"),
      ("a", "x y z w v u q r s t aa bb cc dd ee ff gg hh ii jj slow"),
      ("b", "clean text only")
    ).toDF("source", "text")
    val out = Curation.blocklistGate(docs)
      .as[(String, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      ("a", 2L, 1L, 3L, 24L, 0.125),
      ("b", 1L, 0L, 0L, 3L, 0.0)))
  }

  test("oovRate: top-V vocab with (count, token) tie-break; per-source rate") {
    // counts: x=2, y=2, z=1, q=1 → top-2 = {x, y} (tie at 2 breaks to the
    // alphabetical pair). Source b's z and q are OOV: 2 of 3 tokens.
    val docs = Seq(("a", "x x y"), ("b", "y z q")).toDF("source", "text")
    val out = Curation.oovRate(docs, vocabSize = 2)
      .as[(String, Long, Long, Double)].collect().toList
    assert(out == List(("a", 3L, 0L, 0.0), ("b", 3L, 2L, 0.666667)))
  }

  test("hardNegatives: label-filtered exact ranking with id tie-break") {
    // Queries are vec_id % 10 == 0: vec 0 ([1,0], label 0) and vec 10
    // ([0,1], label 1). For q0 the label-1 candidates rank 1.0 (vec 1),
    // then the 0.0 tie (vec 2 before vec 10 by id). For q10 the label-0
    // candidates rank cos([0,1],[1,1]) = 0.707107 (vec 3), then vec 0.
    // Same-label vectors never appear, however similar (vec 3 vs q0).
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 1),
      (2L, Array(0f, 1f), 1), (3L, Array(1f, 1f), 0),
      (10L, Array(0f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, k = 5, queryMod = 10)
      .as[(Long, Int, Long, Int, Double, Long)].collect().toList
    assert(out == List(
      (0L, 0, 1L, 1, 1.0, 1L), (0L, 0, 2L, 1, 0.0, 2L),
      (0L, 0, 10L, 1, 0.0, 3L),
      (10L, 1, 3L, 0, 0.707107, 1L), (10L, 1, 0L, 0, 0.0, 2L)))
  }

  test("promoSuppliers: dominance threshold is strict-majority, per part") {
    // Hand fixture via temp parquet tables: part 1 is PROMO with supplier
    // 10 shipping 30 of 50 (dominates: 60 > 50·0.5) and supplier 20
    // shipping 20 (20·2 = 40 < 50: not dominant). Part 2 is PROMO with a
    // 50/50 split — STRICT inequality keeps both suppliers out. Part 3 is
    // ECONOMY and must never appear however dominated.
    val dir = java.nio.file.Files.createTempDirectory("promo").toString
    Seq((1L, "PROMO"), (2L, "PROMO"), (3L, "ECONOMY"))
      .toDF("p_partkey", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((10L, "S10"), (20L, "S20")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val ts = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    Seq(
      (1L, 10L, 30.0, ts), (1L, 20L, 20.0, ts),
      (2L, 10L, 10.0, ts), (2L, 20L, 10.0, ts),
      (3L, 20L, 99.0, ts)
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.analytics.StarAnalytics.promoSuppliers(spark, dir)
      .as[(String, Long, Long)].collect().toList
    assert(out == List(("S10", 1L, 30L)))
  }

  test("quantizeRecall: 2-dim vectors reconstruct exactly → recall 1.0") {
    // Every component of a 2-dim vector is its own min or max, so int8
    // dequantization is exact (code 0 or 255), the quantized ranking
    // equals the exact ranking, and recall@k must be exactly 1.
    val emb = (0L until 12L).map { i =>
      (i, Array((i % 7).toFloat + 1f, (i % 5).toFloat), i.toInt % 3)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.quantizeRecall(emb, k = 3, queryMod = 10)
      .as[(Long, Long, Double)].collect().toList
    assert(out == List((2L, 6L, 1.0)))
  }

  test("sourceKL: zero for a source matching the blend, positive else") {
    // Source a IS the corpus blend restricted to its tokens? Build the
    // degenerate case first: a single source always has KL = 0 (its
    // distribution IS the corpus distribution).
    val solo = Seq(("a", "x x y")).toDF("source", "text")
    val out0 = Curation.sourceKL(solo)
      .as[(String, Long, Double)].collect().toList
    assert(out0 == List(("a", 3L, 0.0)))
    // Two disjoint-vocabulary sources of equal mass: corpus q = p/2 on
    // each source's tokens, so KL = Σ p·ln(2) = ln 2 ≈ 0.693147 for both.
    val split = Seq(("a", "x x y"), ("b", "u v w")).toDF("source", "text")
    val out = Curation.sourceKL(split)
      .as[(String, Long, Double)].collect().toList
    assert(out == List(("a", 3L, 0.693147), ("b", 3L, 0.693147)))
  }

  test("recordLinkage: blocked match recovers the truncated name") {
    // Probes are partkeys % 10 == 0 with the last char dropped. Part 10
    // "red widget" → probe "red widge": within its "red" block, "red
    // widget" is distance 1 (parts 10 and 30 — id tie-break keeps 10)
    // and "red bolt" is distance 5 (> maxDist, counted out of n_match).
    // Part 20 "blue bolt" has no same-block sibling: it matches itself.
    // The "green gear" part is in no probe's block and never appears.
    val parts = Seq(
      (10L, "red widget"), (30L, "red widget"), (40L, "red bolt"),
      (20L, "blue bolt"), (55L, "green gear")
    ).toDF("p_partkey", "p_name")
    val out = graft.ext.DedupExt.recordLinkage(parts)
      .as[(Long, String, Long, String, Long, Long, Long)].collect().toList
    assert(out == List(
      (10L, "red widge", 10L, "red widget", 1L, 3L, 2L),
      (20L, "blue bol", 20L, "blue bolt", 1L, 1L, 1L),
      (30L, "red widge", 10L, "red widget", 1L, 3L, 2L),
      (40L, "red bol", 40L, "red bolt", 1L, 3L, 1L)))
  }

  test("domainCap plans a WindowGroupLimit (bounded per-group head)") {
    // needs > cap known rows: Spark skips the group-limit rewrite when the
    // child's maxRows already fits under the limit (nothing to bound)
    val docs = spark.range(100).select(col("id").as("doc_id"),
      (col("id") % 5).cast("string").as("source"))
    val plan = Curation.domainCap(docs).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }
}
