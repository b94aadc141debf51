package graft

import org.apache.spark.sql.functions._
import graft.analytics.StarAnalytics
import graft.ext.{Similarity, TextAnalysis}

/** Round-6 coverage: k-NN label classification, BM25 retrieval scoring,
  * and the third batch of TPC-H anchors (Q9/Q11 adapted shapes). */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("knnClassify: crafted clusters vote correctly; ties break low") {
    // Two tight clusters along axes: label 0 near e1, label 1 near e2.
    // Query 0 sits in cluster 0 → all k neighbors labeled 0.
    val vecs = Seq(
      (0L, Array(1.0f, 0.05f), 0),
      (1L, Array(1.0f, 0.1f), 0),
      (2L, Array(1.0f, 0.2f), 0),
      (3L, Array(0.9f, 0.0f), 0),
      (4L, Array(0.1f, 1.0f), 1),
      (5L, Array(0.0f, 1.0f), 1),
      (6L, Array(0.2f, 1.0f), 1),
      (7L, Array(0.05f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(vecs, k = 3, queryMod = 4).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Int]("actual_label"), r.getAs[Int]("predicted_label")))
      .toMap
    assert(out(0L) == ((0, 0)))
    assert(out(4L) == ((1, 1)))
    // fixture: every prediction is a label that exists, votes ≤ k
    val fx = Similarity.knnClassify(Tables.embeddings(spark, sf)).collect()
    assert(fx.nonEmpty)
    assert(fx.forall(r => r.getAs[Long]("votes") >= 1 &&
      r.getAs[Long]("votes") <= 5))
  }

  test("bm25: a doc containing only query terms outranks one diluted " +
    "by off-terms; absent terms contribute nothing") {
    val docs = Seq(
      (0L, "table join spark table"),
      (1L, "table zzz yyy xxx www vvv uuu ttt sss rrr"),
      (2L, "no query words here at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, topK = 10).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("bm25")).toMap
    assert(byDoc(0L) > byDoc(1L))
    assert(!byDoc.contains(2L)) // no hits → no row, not a zero score
    val hits = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("n_terms_hit")).toMap
    assert(hits(0L) == 3L && hits(1L) == 1L)
  }

  test("importantParts: every kept part exceeds the global fraction") {
    val out = StarAnalytics.importantParts(spark, sf).collect()
    assert(out.nonEmpty)
    // values must be sorted descending with id tiebreak
    val vals = out.map(_.getAs[Double]("part_value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("productProfit groups cover only name-matched parts and " +
    "sum to the ungrouped total") {
    val out = StarAnalytics.productProfit(spark, sf)
    val total = out.agg(round(sum(col("sum_profit")), 2)).head().getDouble(0)
    val li = Tables.lineitem(spark, sf)
    val p = Tables.part(spark, sf)
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val expected = li.join(p, col("l_partkey") === col("p_partkey"))
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity")).cast("decimal(18,6)")), 2))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(total - expected) < 0.05, s"$total vs $expected")
  }

  test("bpePairs counts overlapping in-token character pairs") {
    val docs = Seq((0L, "abab cd x")).toDF("doc_id", "text")
    // "abab" → ab, ba, ab; "cd" → cd; "x" dropped (length 1)
    val out = TextAnalysis.bpePairs(docs).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n")).toMap
    assert(out == Map("ab" -> 2L, "ba" -> 1L, "cd" -> 1L))
  }

  test("sourceOverlap: identical sources have containment 1, " +
    "disjoint sources emit no row") {
    val docs = Seq(
      (0L, "sa", "one two three four"),
      (1L, "sb", "one two three four"),
      (2L, "sc", "five six seven eight"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceOverlap(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("source_a") == "sa" &&
      r.getAs[String]("source_b") == "sb")
    assert(r.getAs[Long]("shared_shingles") == 2L) // two 3-grams of 4 toks
    assert(r.getAs[Double]("containment") == 1.0)
  }

  test("cusum: level shift flags the drift window, ends back near zero") {
    import java.sql.Timestamp
    val orders = (1 to 20).map { d =>
      val rev = if (d <= 10) 100.0 else 200.0
      (d.toLong, Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), rev)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = graft.analytics.StatsAnalytics.cusumDays(orders, nSigma = 3.0)
      .collect()
    assert(out.length == 20)
    // mean=150: cusum walks to -500 mid-series, returns to 0 at the end
    val last = out.last
    assert(math.abs(last.getAs[Double]("cusum")) < 1e-6)
    assert(out.exists(_.getAs[Int]("flag") == 1)) // the drift is flagged
    assert(out.head.getAs[Int]("flag") == 0)      // but not day 1
  }

  test("ngramNovelty: first doc fully novel, exact copy fully stale") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon zeta eta"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_novel"), r.getAs[Long]("n_shingles"))).toMap
    assert(out(0L) == ((2L, 2L)))  // both 3-grams first seen here
    assert(out(1L) == ((0L, 2L)))  // exact copy: nothing novel
    // doc2: "alpha beta gamma" seen; 3 of its 4 shingles are new
    assert(out(2L) == ((3L, 4L)))
  }

  test("quantizeInt8: full-range vector is lossless, constant vector " +
    "degenerates to scale 0") {
    val vecs = Seq(
      (0L, Array(0.0f, 255.0f)),   // scale 1.0, codes (0,255), exact
      (1L, Array(7.5f, 7.5f)))     // constant: scale 0, code 0, exact
      .toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.quantizeInt8(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Double]("mse"))).toMap
    assert(out(0L) == ((1.0, 0.0)))
    assert(out(1L) == ((0.0, 0.0)))
    // fixture: every vector reconstructs with tiny error vs its range
    val fx = graft.ext.Similarity.quantizeInt8(Tables.embeddings(spark, sf))
      .collect()
    assert(fx.forall(r => r.getAs[Double]("mse") >= 0.0 &&
      r.getAs[Double]("mse") < 1e-4))
  }

  test("zipfFit: a 2-point power law fits slope -1 exactly") {
    val docs = Seq((0L, "a a a a b b")).toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.zipfFit(docs).head()
    assert(r.getAs[Long]("vocab") == 2L)
    // freqs (4, 2) at ranks (1, 2): slope = (ln2-ln4)/(ln2-0) = -1
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(4.0)) < 1e-6)
  }

  test("keySkewReport: crafted hot key yields the right share and p99") {
    val df = Seq(1L, 1L, 1L, 2L).toDF("k")
    val r = graft.analytics.StatsAnalytics.keySkewReport(df, Seq("k")).head()
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("max_key_rows") == 3L)
    assert(r.getAs[Double]("max_share") == 0.75)
  }

  test("madByGroup: outlier barely moves MAD (robustness vs stddev)") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 100.0))
      .map { case (id, t, v) =>
        (id, t, v, Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("event_id", "event_type", "value", "ts")
    val r = graft.analytics.StatsAnalytics.madByGroup(ev).head()
    // median of (1,2,3,100) = 2.5; |x-2.5| = (1.5,0.5,0.5,97.5) → MAD 1.0
    assert(r.getAs[Double]("median") == 2.5)
    assert(r.getAs[Double]("mad") == 1.0)
  }

  test("splitAssign: exhaustive, disjoint, stable, and roughly 80/10/10") {
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.Sampling.splitAssign(docs, col("doc_id"))
    assert(out.count() == docs.count()) // pure projection, no row loss
    val bys = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys.keySet.subsetOf(Set("train", "val", "test")))
    val n = bys.values.sum.toDouble
    assert(bys("train") / n > 0.6 && bys("train") / n < 0.95)
    // re-running yields the identical assignment (hash, not RNG)
    val again = graft.operators.Sampling.splitAssign(docs, col("doc_id"))
    assert(out.select("doc_id", "split")
      .exceptAll(again.select("doc_id", "split")).isEmpty)
  }

  test("datasetCard counts an exact duplicate and exact token totals") {
    val docs = Seq(
      (0L, "en", "s1", 7L, "one two three"),
      (1L, "en", "s2", 7L, "one two three"),  // exact dup of doc 0
      (2L, "de", "s1", 9L, "vier funf"))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val r = graft.ext.TextAnalysis.datasetCard(docs).head()
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("total_tokens") == 8L)
    assert(r.getAs[Long]("n_exact_dups") == 1L)
    assert(r.getAs[Long]("min_tokens") == 2L)
    assert(r.getAs[Long]("max_tokens") == 3L)
  }

  test("conversionTime: first-to-first delta; pre-signup purchasers drop") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 10L, "signup", ts("2024-01-01 00:00:00")),
      (2L, 10L, "purchase", ts("2024-01-01 00:01:40")), // +100 s
      (3L, 10L, "purchase", ts("2024-01-02 00:00:00")), // later: ignored
      (4L, 20L, "purchase", ts("2024-01-01 00:00:00")), // before signup
      (5L, 20L, "signup", ts("2024-01-01 01:00:00")),
      (6L, 30L, "signup", ts("2024-01-01 00:00:00")))   // never converts
      .map { case (id, u, t, tt) => (id, u, t, tt, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val r = graft.analytics.EventAnalytics.conversionTime(ev).head()
    assert(r.getAs[Long]("n_users") == 1L)
    assert(r.getAs[Double]("p50_sec") == 100.0)
  }

  test("coPurchasePairs: pair counts from crafted baskets, dup lines dedup") {
    val dir = java.nio.file.Files.createTempDirectory("graft_basket_")
    val li = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L), (1L, 101L), // dup line
      (2L, 101L), (2L, 102L),
      (3L, 105L))                                      // singleton order
      .toDF("l_orderkey", "l_partkey")
    li.write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = StarAnalytics.coPurchasePairs(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) ->
        r.getAs[Long]("n_orders")).toMap
    assert(out == Map((101L, 102L) -> 2L, (101L, 103L) -> 1L,
      (102L, 103L) -> 1L))
  }

  test("pageRank: symmetric pair splits evenly; star center dominates; " +
    "mass is conserved") {
    // path a–b–c: b receives from both leaves, leaves only from b
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w")
    val r = graft.analytics.GraphAnalytics.pageRank(edges).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Double]("rank")).toMap
    assert(r(2L) > r(1L) && r(2L) > r(3L)) // center dominates
    assert(math.abs(r(1L) - r(3L)) < 1e-12) // symmetry
    // tolerance: output ranks are rounded to 9 dp (±0.5e-9 per node)
    assert(math.abs(r.values.sum - 1.0) < 1e-8) // mass conserved
  }

  test("assocRules: crafted baskets give exact confidence and lift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rules_")
    Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L), (3L, 100L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = StarAnalytics.assocRules(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent")) ->
        (r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    // n(100)=3, n(200)=2, support=2, N=3
    assert(out((100L, 200L)) == ((0.666667, 1.0)))
    assert(out((200L, 100L)) == ((1.0, 1.0)))
  }

  test("seasonality: epoch-day arithmetic lands 2024-01-01 on Monday") {
    import java.sql.Timestamp
    val ev = Seq((1L, Timestamp.valueOf("2024-01-01 13:00:00"), 5L))
      .toDF("event_id", "ts", "user_id").withColumn("value", lit(1.0))
    val r = graft.analytics.EventAnalytics.seasonality(ev).head()
    assert(r.getAs[Int]("dow") == 1) // 0=Sunday → Monday=1
    assert(r.getAs[Int]("hr") == 13)
    assert(r.getAs[Double]("share") == 1.0)
  }

  test("histogram2d partitions every row into exactly one cell") {
    val li = Tables.lineitem(spark, sf)
    val out = graft.analytics.StatsAnalytics.histogram2d(li)
    assert(out.agg(sum(col("n"))).head().getLong(0) == li.count())
  }

  test("imputationReport: fill value is the non-null median; " +
    "after-mean derived arithmetically") {
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((1L, "a", Some(1.0)), (2L, "a", Some(3.0)),
      (3L, "a", None))
      .map { case (id, et, v) => (id, et, v.map(Double.box).orNull, t) }
      .toDF("event_id", "event_type", "value", "ts")
    val r = graft.analytics.StatsAnalytics.imputationReport(ev).head()
    assert(r.getAs[Long]("n_rows") == 3L && r.getAs[Long]("n_null") == 1L)
    assert(r.getAs[Double]("fill_value") == 2.0)
    assert(r.getAs[Double]("mean_before") == 2.0)
    assert(r.getAs[Double]("mean_after") == 2.0)
  }

  test("iqrOutliers: Tukey fences catch exactly the planted outlier") {
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v, t) }
      .toDF("event_id", "event_type", "value", "ts")
    val r = graft.analytics.StatsAnalytics.iqrOutliers(ev).head()
    // Q1=3.25, Q3=7.75 → fences [-3.5, 14.5] → only 100.0 is outside
    assert(r.getAs[Double]("lo_fence") == -3.5)
    assert(r.getAs[Double]("hi_fence") == 14.5)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("bm25 plans TakeOrderedAndProject and broadcasts the df/stats sides") {
    val plan = TextAnalysis.bm25(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    assert(plan.contains("BroadcastExchange"), plan.take(400))
  }
}
