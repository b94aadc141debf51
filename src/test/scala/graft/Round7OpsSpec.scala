package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: SemDeDup, temperature mixture weights, incremental
  * corpus dedup. Hand-built fixtures with known answers. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("semDedup keeps the lowest id of each within-cluster duplicate " +
    "group and never drops across clusters") {
    // ids 0 and 40 are centroid seeds (vec_id % 40 == 0) pointing in
    // orthogonal directions, so they anchor two separate clusters.
    // 0, 1, 2 are identical (same cluster): keep 0, drop 1 and 2.
    // 41 duplicates 40 in the OTHER cluster: dropped within ITS cluster.
    // 3 is near-orthogonal to everything in its cluster: kept.
    val rows = Seq(
      (0L, vec(1, 0, 0, 0)),
      (1L, vec(1, 0, 0, 0)),
      (2L, vec(1, 0, 0, 0)),
      (3L, vec(0.9, 0, 0.436, 0)), // sim to cluster-0 head ≈ 0.9 — dropped
      (40L, vec(0, 1, 0, 0)),
      (41L, vec(0, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val kept = graft.ext.Similarity.semDedup(rows, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    // 3's cosine to the identical trio is 0.9 < 0.95 → kept
    assert(kept == Set(0L, 3L, 40L))
  }

  test("kmeansIterate: stable groups keep membership and means land on " +
    "the true group centers after two rounds") {
    // group A hugs [1,0,0,0] (ids 0-2), group B hugs [0,1,0,0] (ids
    // 40-42); the seeds are ids 0 and 40 (vec_id % 40 == 0).
    val rows = Seq(
      (0L, vec(1, 0, 0, 0)), (1L, vec(0.9, 0.1, 0, 0)),
      (2L, vec(0.8, 0.2, 0, 0)),
      (40L, vec(0, 1, 0, 0)), (41L, vec(0.1, 0.9, 0, 0)),
      (42L, vec(0.2, 0.8, 0, 0))
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.kmeansIterate(rows, rounds = 2).collect()
    val members = out.map(r => (r.getLong(0), r.getLong(3))).distinct.toMap
    assert(members == Map(0L -> 3L, 40L -> 3L))
    val c0d0 = out.find(r => r.getLong(0) == 0L && r.getLong(1) == 0L)
      .get.getDouble(2)
    assert(math.abs(c0d0 - 0.9) < 1e-6) // (1 + 0.9 + 0.8) / 3
    val c40d1 = out.find(r => r.getLong(0) == 40L && r.getLong(1) == 1L)
      .get.getDouble(2)
    assert(math.abs(c40d1 - 0.9) < 1e-6)
  }

  test("mixtureWeights: sqrt-temperature rebalance lifts the small source") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p", "big"),    // 16 tokens
      (2L, "a b c d e f g h i j k l m n o p", "big"),    // 16 tokens
      (3L, "a b c d e f g h", "small")                   //  8 tokens
    ).toDF("doc_id", "text", "source")
    val out = graft.ext.TextAnalysis.mixtureWeights(docs, 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("big")._1 == 32L && out("small")._1 == 8L)
    // raw proportions: 32/40 = 0.8; after sqrt: √32/(√32+√8) = 2/3
    assert(math.abs(out("big")._2 - 2.0 / 3.0) < 1e-6)
    assert(math.abs(out("small")._2 - 1.0 / 3.0) < 1e-6)
    assert(out("big")._3 == 667L && out("small")._3 == 333L)
  }

  test("shardPlan: complete, disjoint, and balanced hash sharding") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val plan = graft.ext.TextAnalysis.shardPlan(docs, nShards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.map(_._1).toSet == (0L until 16L).toSet)
    assert(plan.map(_._2).sum == docs.count())
    // portable-hash uniformity: no shard more than 2× the mean
    val counts = plan.map(_._2)
    assert(counts.max <= 2 * (counts.sum / counts.length),
      s"skewed shards: ${counts.mkString(",")}")
  }

  test("mixtureSample: greedy per-source prefixes honor the allocation") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p", "big"),  // 16 tokens, cum 16
      (2L, "a b c d e f g h i j k l m n o p", "big"),  // cum 32 > alloc 20
      (3L, "a b c d e f g h", "small")                 // 8 tokens ≤ alloc 10
    ).toDF("doc_id", "text", "source")
    // budget 30 → weights (2/3, 1/3) → allocations (20, 10)
    val kept = graft.ext.TextAnalysis.mixtureSample(docs, budgetTokens = 30L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("incrementalDedup flags batch docs whose fingerprint the corpus " +
    "already holds (whitespace/case-insensitive)") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "something else entirely"),
      (300L, "The  Quick   BROWN fox"), // normalizes to doc 1 → dup
      (301L, "genuinely new content")
    ).toDF("doc_id", "text")
    val out = graft.ext.DedupExt.incrementalDedup(docs, batchFrom = 250L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(300L -> 1, 301L -> 0))
  }
}
