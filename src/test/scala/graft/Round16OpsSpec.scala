package graft

import org.apache.spark.sql.functions._
import graft.ext.Curation

/** Round-8-of-build additions: DSIR-style hashed-ngram importance
  * weighting (model table + deterministic resampling). */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  // doc_id 0 and 20 are the target slice (id % 20 = 0); targets are
  // saturated with "alpha beta", raw-only docs with "gamma delta" —
  // so docs echoing "alpha beta" must out-score docs echoing "gamma
  // delta" under the fitted log-ratio model.
  private def corpus = Seq(
    (0L, "alpha beta alpha beta alpha beta"),
    (20L, "alpha beta alpha beta"),
    (1L, "alpha beta alpha beta alpha"),
    (2L, "gamma delta gamma delta gamma"),
    (3L, "alpha beta"),
    (4L, "gamma delta")
  ).toDF("doc_id", "text")

  test("dsirLogRatio: bucket totals reconcile and ratios favor target grams") {
    val m = Curation.dsirLogRatio(corpus, buckets = 16).collect()
    // totals: every gram lands in exactly one bucket
    val rawTotal = m.map(_.getLong(2)).sum
    val tgtTotal = m.map(_.getLong(1)).sum
    // 6+4+5+5+2+2 tokens = 24 unigrams, (5+3+4+4+1+1) = 18 bigrams
    assert(rawTotal == 42L)
    // target docs (0, 20): 6+4 unigrams + 5+3 bigrams = 18
    assert(tgtTotal == 18L)
    // a bucket holding a target-heavy gram must carry a positive ratio,
    // and raw-only grams a negative one
    val byBucket = m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3)))
    assert(byBucket.forall { case (_, t, r, lr) =>
      if (t * 2 > r) lr > 0 else true })
    assert(byBucket.exists(_._4 > 0) && byBucket.exists(_._4 < 0))
  }

  test("dsirSample: target-like docs outrank raw-only docs; target slice excluded") {
    val s = Curation.dsirSample(corpus, buckets = 16, k = 10).collect()
    val ids = s.map(_.getLong(0)).toList
    // slice members (0, 20) never appear in the resample pool
    assert(!ids.contains(0L) && !ids.contains(20L))
    assert(ids.toSet == Set(1L, 2L, 3L, 4L))
    // ranked by importance: the "alpha beta" docs (1, 3) precede the
    // "gamma delta" docs (2, 4)
    val rankOf = ids.zipWithIndex.toMap
    assert(rankOf(1L) < rankOf(2L) && rankOf(1L) < rankOf(4L))
    assert(rankOf(3L) < rankOf(2L) && rankOf(3L) < rankOf(4L))
    // log weights are the decimal-summed products of the rounded model
    val w = s.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L))
  }

  test("clusterBalance: per-cluster cap holds and assignment is nearest-centroid") {
    // 8-dim unit-ish vectors in two obvious modes around the two
    // centroids (vec_id 0 and 40 under centroidMod=40)
    def vec(base: Float, jitter: Float): Array[Float] =
      Array(base + jitter, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val rows = Seq(
      (0L, vec(10f, 0f)), (40L, vec(-10f, 0f)),
      (1L, vec(10f, 0.1f)), (2L, vec(10f, 0.2f)), (3L, vec(10f, 0.3f)),
      (41L, vec(-10f, 0.1f)), (42L, vec(-10f, 0.2f)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = graft.ext.Similarity
      .clusterBalance(emb, centroidMod = 40, cap = 2).collect()
    val byCluster = out.groupBy(_.getLong(1))
    // cap enforced per cluster
    assert(byCluster.values.forall(_.length <= 2))
    // both modes survive the sample (diversity, not head-of-corpus)
    assert(byCluster.keySet == Set(0L, 40L))
    // membership respects nearest-centroid: positive-mode ids never land
    // in the negative-mode cluster
    val cluster0 = out.filter(_.getLong(1) == 0L).map(_.getLong(0)).toSet
    assert(cluster0.subsetOf(Set(0L, 1L, 2L, 3L)))
    // keep_rank is 1..n within each cluster
    assert(byCluster.values.forall(g =>
      g.map(_.getLong(2)).sorted.toList == (1 to g.length).map(_.toLong).toList))
  }

  test("clusterBalance plans a WindowGroupLimit (bounded per-cluster head)") {
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (40L, Array(-1f, 0f)), (41L, Array(-0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val plan = graft.ext.Similarity.clusterBalance(emb, 40, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("negativeSamples: negatives never collide with positives; rank bounded") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val neg = graft.analytics.StarAnalytics
      .negativeSamples(spark, dir, k = 3, probes = 8)
    val pos = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.analytics.StarAnalytics.orderParts(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
    // a negative that the customer actually bought is a contract violation
    assert(neg.join(pos, Seq("cust", "part")).count() == 0L)
    val rows = neg.collect()
    assert(rows.nonEmpty)
    // ≤ k per customer, ranks 1..n, draws inside the catalog id space
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.values.forall(_.length <= 3))
    assert(byCust.values.forall(g =>
      g.map(_.getLong(2)).sorted.toList ==
        (1 to g.length).map(_.toLong).toList))
    val maxPart = graft.Tables.part(spark, dir)
      .agg(max(col("p_partkey"))).collect().head.getLong(0)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= maxPart))
  }

  test("tableDigest: partition-invariant, localizes a one-row mutation") {
    import graft.operators.DataContract
    def digestOf(df: org.apache.spark.sql.DataFrame) =
      DataContract.tableDigest(df, Seq("k"),
        Seq(col("k"), col("v")), buckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toList
    val base = (1L to 100L).map(k => (k, s"val_$k"))
    val a = base.toDF("k", "v")
    // same content, different row order AND partitioning → same digest
    val b = base.reverse.toDF("k", "v").repartition(7)
    assert(digestOf(a) == digestOf(b))
    // one mutated row → exactly one bucket diverges, counts unchanged
    val mut = base.map { case (k, v) => (k, if (k == 42L) "HACKED" else v) }
      .toDF("k", "v")
    val (da, dm) = (digestOf(a), digestOf(mut))
    assert(da.map(t => (t._1, t._2)) == dm.map(t => (t._1, t._2)))
    assert(da.zip(dm).count { case (x, y) => x._3 != y._3 } == 1)
  }

  test("tableDigest: disjoint-union homomorphism (shard-wise comparability)") {
    import graft.operators.DataContract
    def digest(df: org.apache.spark.sql.DataFrame) =
      DataContract.tableDigest(df, Seq("k"), Seq(col("k"), col("v")), 8)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val a = (1L to 40L).map(k => (k, s"a$k")).toDF("k", "v")
    val b = (41L to 90L).map(k => (k, s"b$k")).toDF("k", "v")
    val u = digest(a.unionAll(b))
    val (da, db) = (digest(a), digest(b))
    // per bucket: counts add, digests xor — replicas can be compared
    // shard-by-shard and combined without touching rows
    for (bk <- u.keys) {
      val (na, xa) = da.getOrElse(bk, (0L, 0L))
      val (nb, xb) = db.getOrElse(bk, (0L, 0L))
      assert(u(bk) == (na + nb, xa ^ xb), s"bucket $bk")
    }
  }

  test("matryoshkaRecall: prefix truncation flips the hand-computed top-1") {
    // query = vec 0 (id % 10 = 0). Full-cosine top-1 is n3 (0.993);
    // prefix-2 top-1 is n2 (its tail mass vanishes under truncation,
    // prefix sim 1.0) — so recall@1 with prefixDims=2 is 0, and with the
    // full dimension kept it is 1.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.5f, 0f, 0.9f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val truncated = graft.ext.Similarity
      .matryoshkaRecall(emb, prefixDims = 2, k = 1).collect().head
    assert(truncated.getLong(0) == 1L)      // n_queries
    assert(truncated.getLong(1) == 0L)      // n_hits
    assert(truncated.getDouble(2) == 0.0)   // recall
    val full = graft.ext.Similarity
      .matryoshkaRecall(emb, prefixDims = 4, k = 1).collect().head
    assert(full.getLong(1) == 1L && full.getDouble(2) == 1.0)
  }

  // The doc-term-matrix adopters must be BIT-EQUAL between their two
  // forms: the direct corpus pass (docs path) and the reduction over the
  // shared matrix (tfOpt path). Catches any future drift in the bag
  // derivations (Σ tf vs per-occurrence counts, weighted means, …).
  private def docsFixture = Seq(
    (1L, "en", "web", "the cat sat on the mat the cat"),
    (2L, "en", "web", "spark joins tables and spark scans tables"),
    (3L, "de", "news", "der hund und der hund und der"),
    (4L, "fr", "news", "le chat le chat le"),
    (5L, "en", "wiki", "table join spark table join table")
  ).toDF("doc_id", "lang", "source", "text")

  test("doc-term-matrix adopters: tfOpt path ≡ docs path") {
    import graft.ext.{Curation, TextAnalysis => TA}
    val d = docsFixture
    val m = TA.docTermFreqOf(d)
    def eq(name: String, a: org.apache.spark.sql.DataFrame,
           b: org.apache.spark.sql.DataFrame): Unit = {
      val (ra, rb) = (a.collect().map(_.toString).sorted.toList,
        b.collect().map(_.toString).sorted.toList)
      assert(ra == rb, s"$name diverged:\n direct=$ra\n matrix=$rb")
    }
    eq("tfidf", TA.tfidfTop(d), TA.tfidfTop(d, tfOpt = Some(m)))
    eq("entropy", TA.tokenEntropy(d), TA.tokenEntropy(d, tfOpt = Some(m)))
    eq("heavy", TA.heavyHitters(d, 5), TA.heavyHitters(d, 5, Some(m)))
    eq("unigram", TA.unigramLogprob(d), TA.unigramLogprob(d, Some(m)))
    eq("zipf", TA.zipfFit(d), TA.zipfFit(d, Some(m)))
    eq("nb", TA.naiveBayes(d), TA.naiveBayes(d, tfOpt = Some(m)))
    eq("invidx", TA.invertedIndex(d, dfFloor = 1L),
      TA.invertedIndex(d, dfFloor = 1L, tfOpt = Some(m)))
    eq("feathash", TA.featureHashing(d), TA.featureHashing(d, tfOpt = Some(m)))
    eq("oov", Curation.oovRate(d, 5), Curation.oovRate(d, 5, Some(m)))
    eq("srckl", Curation.sourceKL(d), Curation.sourceKL(d, Some(m)))
  }

  test("docTermFreq memoizes per (session, dir): same reference on re-call") {
    // key on a fixture dir that exists: the smallest test data
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(dir).isDirectory) {
      val a = graft.ext.TextAnalysis.docTermFreq(spark, dir)
      val b = graft.ext.TextAnalysis.docTermFreq(spark, dir)
      assert(a eq b)
    }
  }

  test("dsirSample plans a TakeOrderedAndProject, not a global-window sort") {
    val plan = Curation.dsirSample(corpus, buckets = 16, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }
}
