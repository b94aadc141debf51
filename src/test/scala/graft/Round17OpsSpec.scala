package graft

import org.apache.spark.sql.functions._
import graft.ext.Curation

/** Round-9-of-build additions: Good–Turing unseen-mass audit, split
  * conformal intervals, k-center greedy coreset, table diff. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "en", "a", "x x y z"),
    (1L, "en", "a", "y w"),
    (2L, "en", "b", "u u u")
  ).toDF("doc_id", "lang", "source", "text")

  test("goodTuring: hand-computed frequency-of-frequencies per source") {
    val out = Curation.goodTuring(docs).collect()
    assert(out.length == 2)
    val a = out(0)
    // source a: census x=2, y=2, z=1, w=1 → N=6, V=4, N1=2, N2=2
    assert(a.getString(0) == "a")
    assert(a.getLong(1) == 6L && a.getLong(2) == 4L)
    assert(a.getLong(3) == 2L && a.getLong(4) == 2L)
    assert(a.getDouble(5) == math.rint(2.0 / 6.0 * 1e6) / 1e6) // N1/N
    assert(a.getDouble(6) == math.rint(2.0 * 2 / (2.0 * 6) * 1e6) / 1e6)
    val b = out(1)
    // source b: u=3 → no hapaxes; both estimators hit their zero guards
    assert(b.getString(0) == "b")
    assert(b.getLong(1) == 3L && b.getLong(2) == 1L)
    assert(b.getLong(3) == 0L && b.getLong(4) == 0L)
    assert(b.getDouble(5) == 0.0 && b.getDouble(6) == 0.0)
  }

  // P1: mu=100; 10 calibration residuals 1..10 → k=⌈0.9·11⌉=10, qhat=10.
  // P2: one calibration row → k=2 > n_cal=1 → infinite interval (qhat
  // NULL), everything covered.
  private def orders = {
    val p1train = (Seq(10L) ++ (1L to 5L)).map(k => (k, 100.0, "1-P1"))
    val p1cal = (1 to 10).map(i =>
      (if (i % 2 == 1) 6L + 10 * (i / 2) else 7L + 10 * ((i - 1) / 2),
        100.0 + i, "1-P1"))
    val p1test = Seq((8L, 105.0, "1-P1"), (9L, 109.0, "1-P1"),
      (18L, 111.0, "1-P1"), (19L, 90.0, "1-P1"))
    val p2 = Seq((20L, 50.0, "2-P2"), (26L, 53.0, "2-P2"),
      (28L, 1000.0, "2-P2"), (29L, 0.0, "2-P2"))
    (p1train ++ p1cal ++ p1test ++ p2)
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
  }

  test("conformalCoverage: hand-computed quantile, boundary cover, " +
    "infinite-interval arm") {
    val out = graft.ext.EvalOps.conformalCoverage(orders).collect()
    assert(out.length == 2)
    val p1 = out(0)
    assert(p1.getString(0) == "1-P1")
    assert(p1.getLong(1) == 6L && p1.getLong(2) == 10L && p1.getLong(3) == 4L)
    assert(p1.getDouble(4) == 100.0)
    assert(p1.getDouble(5) == 10.0) // k-th smallest calibration residual
    // residuals 5, 9, 11, 10 → 11 escapes, boundary 10 covers
    assert(p1.getLong(6) == 3L && p1.getDouble(7) == 0.75)
    val p2 = out(1)
    assert(p2.getString(0) == "2-P2")
    assert(p2.getLong(2) == 1L) // k=2 > n_cal=1 → no finite quantile
    assert(p2.isNullAt(5))
    assert(p2.getLong(6) == 2L && p2.getDouble(7) == 1.0)
  }

  test("kCenterGreedy: farthest-point trajectory with duplicate and tie") {
    // v0 seed; v1 duplicates the seed (mind 0, never picked); v2/v3
    // orthogonal (dist 1.0, tie broken to the smaller id); v4 diagonal
    // (dist 1 − round(1/√2, 6) to the seed AND to v2, dist 1 to v3)
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (3L, Array(0f, 0f, 1f, 0f)),
      (4L, Array(1f, 1f, 0f, 0f)))
    val out = graft.ext.Similarity
      .kCenterGreedy(rows.toDF("vec_id", "embedding"), k = 4).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (2L, 2L), (3L, 3L), (4L, 4L)))
    assert(out(0).isNullAt(2))
    assert(out(1).getDouble(2) == 1.0 && out(2).getDouble(2) == 1.0)
    // 1 − round(1/√2, 6) = 0.29289299999999996, re-rounded to 6dp at
    // the report boundary
    assert(out(3).getDouble(2) == 0.292893)
  }

  test("tableDiff: classifies added, removed, changed; equal rows drop out") {
    val left = Seq((1L, 1, 10L), (1L, 2, 20L), (2L, 1, 30L))
      .toDF("k1", "k2", "v")
    val right = Seq((1L, 2, 99L), (2L, 1, 30L), (3L, 1, 40L))
      .toDF("k1", "k2", "v")
    val canon = Seq(col("k1"), col("k2"), col("v"))
    val out = graft.operators.DataContract
      .tableDiff(left, right, Seq("k1", "k2"), canon).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("1|1", "missing_right"), ("1|2", "changed"),
      ("3|1", "missing_left")))
    // reflexive diff is empty — the matched-equal mass never survives
    assert(graft.operators.DataContract
      .tableDiff(left, left, Seq("k1", "k2"), canon).count() == 0L)
    // argument swap transposes the missing_* sides and keeps `changed`
    val swapped = graft.operators.DataContract
      .tableDiff(right, left, Seq("k1", "k2"), canon).collect()
    assert(swapped.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("1|1", "missing_left"), ("1|2", "changed"),
      ("3|1", "missing_right")))
  }

  test("textrank: symmetric terms tie, hub terms outrank the periphery") {
    // doc 0 yields edges ab/ac/bc (weight 2 each); doc 1 adds ab weight 4
    // (its offset-2 pairs are self-pairs, dropped) → a,b symmetric hubs
    // (a-b: 6, each-c: 2), c peripheral
    val corpus = Seq((0L, "b a c a b"), (1L, "a b a b a"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.textrank(corpus).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val rk = out.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rk("a") == rk("b") && rk("a") > rk("c"))
    assert(math.abs(rk.values.sum - 1.0) < 1e-6) // rank mass conserved
  }

  test("bradleyTerry: hand-computed two-round MM trajectory") {
    // pairs (1,2): 3 matches, part 1 wins 2 (incl. none by tie);
    // (2,3): 3 matches, part 2 wins 2 (one via the tie-to-smaller rule).
    // Exact rational trajectory: round 1 leaves (4/3, 1, 2/3) (sum
    // already 3); round 2 normalizes to (56/37, 35/37, 20/37).
    val li = Seq(
      (1L, 1L, 5.0), (1L, 2L, 3.0), (2L, 1L, 4.0), (2L, 2L, 6.0),
      (3L, 1L, 7.0), (3L, 2L, 2.0), (4L, 2L, 5.0), (4L, 3L, 5.0),
      (5L, 2L, 1.0), (5L, 3L, 9.0), (6L, 2L, 8.0), (6L, 3L, 1.0)
    ).toDF("l_orderkey", "l_partkey", "l_quantity")
    val out = graft.ext.EvalOps.bradleyTerry(li).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 6L, 3L))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 3L, 1L))
    val exp = Seq(56.0 / 37, 35.0 / 37, 20.0 / 37)
    out.zip(exp).foreach { case (r, e) =>
      assert(math.abs(r.getDouble(3) - e) < 1e-8) }
  }

  test("goldenRecords: survivorship over linked clusters, " +
    "self-matches excluded") {
    // probes are %10 keys; probe 10's trimmed name matches part 3 at
    // dist 0, probe 20 ties parts 7/20 at dist 1 (min cand wins), probe
    // 30 best-matches only itself (no edge). Parts 4 and 30 stay out.
    val parts = Seq(
      (3L, "alpha widget blu", "B1", 10.0),
      (4L, "alpha widget bluu", "B9", 99.0),
      (10L, "alpha widget blue", "B2", 20.0),
      (7L, "beta gadgex", "B3", 5.0),
      (20L, "beta gadget", "B3", 7.5),
      (30L, "gamma thing", "B4", 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_retailprice")
    val out = graft.ext.DedupExt.goldenRecords(parts).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getString(4), r.getDouble(5))).toSeq == Seq(
      (3L, 2L, 3L, "alpha widget blu", "B1", 20.0), // brand tie → min
      (7L, 2L, 7L, "beta gadgex", "B3", 7.5)))
  }

  test("ccnetBuckets: exact terciles per lang, short docs excluded, " +
    "head outranks tail") {
    val corpus = Seq(
      (0L, "en", "the cat sat on the mat"),
      (1L, "en", "the cat sat on a mat"),
      (2L, "en", "the dog ran in the park"),
      (3L, "en", "blue fish seven quickly lamp"),
      (4L, "en", "zebra quantum mattress violin"),
      (5L, "en", "gargle plinth oboe waffle"),
      (6L, "en", "single"), // one token → no bigram score → excluded
      (7L, "de", "der hund lief"),
      (8L, "de", "der hund schlief")
    ).toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), col("text"))
    val out = graft.ext.TextAnalysis.ccnetBuckets(corpus).collect()
    val rows = out.map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getDouble(3)))).toMap
    // en: n=6 → terciles 2/2/2; de: n=2 → head 1, middle 1, no tail
    assert(rows.keySet == Set(("de", "head"), ("de", "middle"),
      ("en", "head"), ("en", "middle"), ("en", "tail")))
    assert(rows(("en", "head"))._1 == 2L &&
      rows(("en", "middle"))._1 == 2L && rows(("en", "tail"))._1 == 2L)
    assert(rows(("de", "head"))._1 == 1L && rows(("de", "middle"))._1 == 1L)
    // ranking is by score desc, so bucket means are monotone
    assert(rows(("en", "head"))._2 >= rows(("en", "middle"))._2)
    assert(rows(("en", "middle"))._2 >= rows(("en", "tail"))._2)
  }

  test("conformalCoverageScale: sketch boundary, no data-scale window") {
    val q = graft.ext.EvalOps.conformalCoverageScale(orders)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), s"rank window survived:\n$plan")
    assert(plan.contains("partial_percentile_approx"),
      s"quantile must partial-aggregate map-side:\n$plan")
    val out = q.collect()
    // P1: sketch rank ⌈0.9·10⌉ = 9 → qhat 9.0 (one index under the
    // strict conformal k=10 — the documented sketch-boundary trade);
    // test residuals 5, 9, 11, 10 → 2 covered
    val p1 = out(0)
    assert(p1.getDouble(5) == 9.0)
    assert(p1.getLong(6) == 2L && p1.getDouble(7) == 0.5)
    // P2: one calibration row → qhat = its residual (3.0), finite where
    // the exact form went infinite; neither test residual fits
    val p2 = out(1)
    assert(p2.getDouble(5) == 3.0)
    assert(p2.getLong(6) == 0L && p2.getDouble(7) == 0.0)
  }

  test("ccnetBucketsScale: windowless plan, doc mass conserved vs exact") {
    val corpus = Seq(
      (0L, "en", "the cat sat on the mat"),
      (1L, "en", "the cat sat on a mat"),
      (2L, "en", "the dog ran in the park"),
      (3L, "en", "blue fish seven quickly lamp"),
      (4L, "en", "zebra quantum mattress violin"),
      (5L, "en", "gargle plinth oboe waffle"),
      (7L, "de", "der hund lief"),
      (8L, "de", "der hund schlief")
    ).toDF("doc_id", "lang", "text")
    val q = graft.ext.TextAnalysis.ccnetBucketsScale(corpus)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), s"rank window survived:\n$plan")
    assert(plan.contains("partial_percentile_approx"),
      s"boundary sketch must partial-aggregate map-side:\n$plan")
    val s = q.collect()
    val exact = graft.ext.TextAnalysis.ccnetBuckets(corpus).collect()
    // boundary cuts may reshape buckets on ties, never drop a doc
    assert(s.map(_.getLong(2)).sum == exact.map(_.getLong(2)).sum)
    // bucket means stay monotone head ≥ middle ≥ tail within a lang —
    // over the buckets PRESENT: boundary cuts on tied scores may
    // collapse one entirely (the documented reshape-on-ties trade)
    val en = s.filter(_.getString(0) == "en")
      .map(r => r.getString(1) -> r.getDouble(3)).toMap
    val present = Seq("head", "middle", "tail").filter(en.contains)
    assert(present.nonEmpty)
    val means = present.map(en)
    assert(means == means.sorted.reverse)
  }

  test("groupKFold: entity-exclusive folds, null entities dropped, " +
    "counts reconcile") {
    val ev = Seq(
      (1L, Option(10L), "purchase"), (2L, Option(10L), "view"),
      (3L, Option(10L), "view"), (4L, Option(20L), "purchase"),
      (5L, Option(20L), "purchase"), (6L, Option(30L), "click"),
      (7L, None, "purchase"), (8L, Option(40L), "view")
    ).toDF("event_id", "user_id", "event_type")
    val out = graft.operators.Sampling
      .groupKFold(ev, col("user_id"), col("event_type") === "purchase",
        k = 3).collect()
    // 7 non-null rows, 4 entities — all accounted for exactly once
    assert(out.map(_.getLong(1)).sum == 4L)
    assert(out.map(_.getLong(2)).sum == 7L)
    assert(out.map(_.getLong(3)).sum == 3L) // purchases (null user dropped)
    // leakage invariant: the per-(fold, entity) stage means an entity
    // cannot straddle folds — fold is a pure function of the key
    val perEntity = ev.filter(col("user_id").isNotNull)
      .select(graft.operators.Sampling
        .hashBucket(col("user_id"), 3).as("fold"), col("user_id"))
      .distinct().groupBy("user_id").count().collect()
    assert(perEntity.forall(_.getLong(1) == 1L))
  }

  test("mrrAtK: first-relevant ranks, no-hit arm, decimal mean") {
    // query 0 (A): neighbours rank 1 = B, rank 2 = A → rr 1/2
    // query 10 (B): first B sits at rank 3 → rr 1/3
    // query 20 (C): no other C anywhere → rr 0
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), "A"),
      (10L, Array(0f, 1f, 0f, 0f), "B"),
      (20L, Array(0f, 0f, 1f, 0f), "C"),
      (1L, Array(4f, 1f, 0f, 0f), "B"),
      (2L, Array(2f, 1f, 0f, 0f), "A"),
      (3L, Array(1f, 1f, 0f, 0f), "A"))
    val out = graft.ext.Similarity
      .mrrAtK(rows.toDF("vec_id", "embedding", "label")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.277778) // (1/2 + 1/3 + 0) / 3, 6dp
  }

  test("dedupSweep: cutoffs slice one verified pair frame, " +
    "boundary threshold fires") {
    // anchor doc 0: dup of doc 1 (jaccard 1.0), near-dup of doc 4
    // (3/5 = 0.6 — fires at the t=60 boundary exactly), far from 2, 3
    val docs = Seq(
      (0L, "en", "a b c d e f"), (1L, "en", "a b c d e f"),
      (2L, "en", "a b c d x y"), (3L, "en", "z z z q q q"),
      (4L, "en", "a b c d e q")
    ).toDF("doc_id", "lang", "text")
    val out = graft.ext.DedupExt
      .dedupSweep(docs, thresholdsPerMille = Seq(300, 600, 700, 1000))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      (300L, 3L, 3L, 0.6), (600L, 2L, 2L, 0.4),
      (700L, 1L, 1L, 0.2), (1000L, 1L, 1L, 0.2)))
  }

  test("goodTuring: matrix path ≡ direct path") {
    val direct = Curation.goodTuring(docs).collect().toSeq
    val viaMatrix = Curation.goodTuring(docs,
      tfOpt = Some(graft.ext.TextAnalysis.docTermFreqOf(docs)))
      .collect().toSeq
    assert(direct == viaMatrix)
  }
}
