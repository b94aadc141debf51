package graft

import org.apache.spark.sql.functions._
import graft.ext.{DedupExt, Multimodal, Similarity, TextFns}
import graft.plans.RollingHash

/** Extension-operator behavior on planted fixtures: near-dups must be
  * found, similarity must rank the planted neighbor first, the custom
  * expression must agree with its reference implementation. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (2L, "the quick brown fox jumps over the lazy cat again and again", "en"),
    (3L, "completely different words about spark query planning here", "en"),
    (4L, "ein ganz anderer text in einer anderen sprache", "de")
  ).toDF("doc_id", "text", "lang")

  test("exact dedup groups identical texts under one keeper") {
    val out = DedupExt.exactDedup(docs)
    assert(out.count() == 4) // docs 0 and 1 collapse
    val dup = out.filter(col("n_copies") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keeper_doc_id") == 0L)
  }

  test("jaccard: identical docs 1.0, near-dup high, unrelated low") {
    val pairs = DedupExt.jaccardPairs(docs, anchorMod = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(pairs((0L, 3L)) == 0.0)
  }

  test("minhash-LSH surfaces the identical and near-dup pairs") {
    val cands = DedupExt.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)))
    assert(cands.contains((0L, 2L)) || cands.contains((1L, 2L)))
  }

  test("simhash: identical docs identical, near-dups close in Hamming") {
    val sh = DedupExt.simhashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    val ham = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hamFar = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(ham < hamFar)
  }

  test("cosine top-1 finds the planted near-identical vector") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(0.99f, 0.05f, 0.0f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, k = 1, queryMod = 10)
      .filter(col("query_id") === 0L).collect()
    assert(top.length == 1 && top(0).getAs[Long]("neighbor_id") == 10L)
  }

  test("rolling_hash expression matches the reference implementation") {
    RollingHash.register(spark)
    val texts = Seq("", "a", "hello world", "π unicode ≠ ascii")
    val got = texts.toDF("t")
      .select(RollingHash.rolling_hash(col("t"))).as[Long].collect().toSeq
    assert(got == texts.map(RollingHash.reference))
  }

  test("multimodal: mapPartitions decode agrees with columnar metadata") {
    val viaSql = Multimodal.binaryMeta(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val viaPartitions = Multimodal.decodePartitions(spark, docs)
      .orderBy("doc_id").collect()
      .map(m => (m.doc_id, m.n_bytes, m.width, m.height, m.n_frames))
    assert(viaSql.toSeq == viaPartitions.toSeq)
  }

  test("shingles: n-gram count and distinctness") {
    val out = Seq("a b c d").toDF("text")
      .select(TextFns.shingles(TextFns.tokens(col("text")), 3))
      .as[Seq[String]].collect().head
    assert(out == Seq("a b c", "b c d"))
  }
}
