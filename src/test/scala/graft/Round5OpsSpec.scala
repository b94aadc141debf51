package graft

import org.apache.spark.sql.functions._
import graft.analytics.{EventAnalytics, StarAnalytics}
import graft.ext.TextAnalysis

/** Round-5 coverage: token-budget sequence packing, asymmetric n-gram
  * containment, the bigram-LM fluency score, sweep-line peak concurrency,
  * the word_ngrams (multiplicity-preserving) native expression, and the
  * second batch of TPC-H anchors (Q4/Q17/Q18/Q22 shapes). */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("word_ngrams keeps order and multiplicity; word_shingles dedups") {
    graft.plans.TextSketches.register(spark)
    val df = Seq("a b a b a").toDF("text")
      .select(graft.ext.TextFns.tokens(col("text")).as("toks"))
    val grams = df.select(
        graft.plans.TextSketches.word_ngrams(col("toks"), 2).as("g"))
      .as[Seq[String]].head()
    assert(grams == Seq("a b", "b a", "a b", "b a"))
    val shingles = df.select(
        graft.plans.TextSketches.word_shingles(col("toks"), 2).as("g"))
      .as[Seq[String]].head()
    assert(shingles == Seq("a b", "b a"))
  }

  test("tokenPacking: crafted budget boundaries; pack ids monotone per source") {
    // budget 10: doc0 (4 toks, cum-before 0 → pack 0), doc2 (8, cum 4 →
    // pack 0: starts inside budget, overflows), doc4 (3, cum 12 → pack 1).
    val docs = Seq(
      (0L, "s1", "t t t t"),
      (2L, "s1", "t t t t t t t t"),
      (4L, "s1", "t t t"),
      (1L, "s2", "x x x x x x x x x x x x"), // 12 toks, cum 0 → pack 0
      (3L, "s2", "x"))                       // cum 12 → pack 1
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.tokenPacking(docs, budgetTokens = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("pack_id")).toMap
    assert(out == Map(0L -> 0L, 2L -> 0L, 4L -> 1L, 1L -> 0L, 3L -> 1L))
    // fixture invariant: within a source, pack_id is monotone in doc_id
    val fx = TextAnalysis.tokenPacking(Tables.documents(spark, sf))
    val mono = fx.withColumn("prev", lag(col("pack_id"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")))
      .filter(col("prev").isNotNull && col("pack_id") < col("prev"))
    assert(mono.isEmpty)
  }

  test("containment flags subset duplication that Jaccard under-scores") {
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, "en", small),                  // anchor (0 % 97 == 0)
      (5L, "en", s"$small $filler"))      // superset of the anchor
      .toDF("doc_id", "lang", "text")
    val cont = TextAnalysis.containmentPairs(docs)
      .collect().map(r => (r.getAs[Long]("doc_id_a"),
        r.getAs[Long]("doc_id_b"), r.getAs[Double]("containment")))
    assert(cont.toSeq == Seq((0L, 5L, 1.0)))
    val jac = graft.ext.DedupExt.jaccardPairs(docs)
      .collect().head.getAs[Double]("jaccard")
    assert(jac < 0.1, s"jaccard $jac should under-score the subset pair")
  }

  test("bigramLogprob ranks fluent repetition above word salad") {
    val fluent = "the cat sat on the mat"
    val docs = Seq(
      (1L, fluent), (2L, fluent), (3L, fluent),
      (4L, "mat the on sat cat the")) // same unigrams, scrambled order
      .toDF("doc_id", "text")
    val lp = TextAnalysis.bigramLogprob(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_bigram_logprob")).toMap
    assert(lp(1L) == lp(2L) && lp(2L) == lp(3L))
    assert(lp(1L) > lp(4L),
      s"fluent ${lp(1L)} should outscore salad ${lp(4L)}")
  }

  test("peakConcurrency: crafted overlaps, touching endpoints, singletons") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // day 1: three users, all live at 11:30
      (1L, ts("2024-03-01 10:00:00")), (1L, ts("2024-03-01 12:00:00")),
      (2L, ts("2024-03-01 11:00:00")), (2L, ts("2024-03-01 13:00:00")),
      (3L, ts("2024-03-01 11:30:00")),
      // day 2: u4 ends exactly when u5 starts → touching counts as 2
      (4L, ts("2024-03-02 10:00:00")), (4L, ts("2024-03-02 11:00:00")),
      (5L, ts("2024-03-02 11:00:00")), (5L, ts("2024-03-02 12:00:00")))
      .toDF("user_id", "ts")
    val out = EventAnalytics.peakConcurrency(ev)
      .collect().map(r => r.getAs[String]("event_date") ->
        r.getAs[Long]("peak_concurrent")).toMap
    assert(out == Map("2024-03-01" -> 3L, "2024-03-02" -> 2L))
  }

  test("zkey: bit-exact interleave; layout buckets are tight in BOTH dims") {
    val one = Seq((3L, 5L)).toDF("x", "y")
      .select(graft.operators.ZOrder.zkey(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    // x=011 → bits at 0,2,4 → 1+4+0; y=101 → bits at 1,3,5 → 2+0+32
    assert(one == (1L + 4L) + (2L + 32L))
    val li = Tables.lineitem(spark, sf)
    val stats = graft.operators.ZOrder
      .layoutStats(li, "l_partkey", "l_suppkey").collect()
    val ranges = li.agg(
      (max(col("l_partkey")) - min(col("l_partkey"))).cast("double"),
      (max(col("l_suppkey")) - min(col("l_suppkey"))).cast("double"))
      .collect().head
    val (xr, yr) = (ranges.getDouble(0), ranges.getDouble(1))
    val maxX = stats.map(_.getAs[Long]("x_span")).max.toDouble
    val maxY = stats.map(_.getAs[Long]("y_span")).max.toDouble
    // every z-bucket's envelope is a small fraction of the full range in
    // BOTH dimensions — the property single-column sorting cannot give
    assert(maxX <= xr / 8 && maxY <= yr / 8,
      s"spans $maxX/$xr, $maxY/$yr not tight")
  }

  test("latePriorityOrders ≡ join-then-distinct phrasing") {
    val viaSemi = StarAnalytics.latePriorityOrders(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate")
    val viaDistinct = o
      .join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSemi == viaDistinct && viaSemi.nonEmpty)
  }

  test("largeVolumeOrders: every row exceeds the quantity floor") {
    val rows = StarAnalytics.largeVolumeOrders(spark, sf, minQty = 250.0)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250.0))
  }

  test("smallQuantityRevenue ≡ window-function phrasing") {
    val viaJoin = StarAnalytics.smallQuantityRevenue(spark, sf)
      .collect().head.getAs[Double]("avg_yearly")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val viaWindow = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#23")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .withColumn("qty_limit", lit(0.2) * avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
      .collect().head.getAs[Double]("avg_yearly")
    // Same population: the brand join restricts PARTS only, so the window
    // still averages over every lineitem of each Brand#23 part — exactly
    // the per-part averages the aggregate-join computes.
    assert(viaJoin == viaWindow)
  }

  test("topPByMass: crafted boundary; top row of a dominant group survives") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 3L), ("g", 3L, 2L),
      ("h", 4L, 100L), ("h", 5L, 1L)).toDF("grp", "id", "mass")
    val kept = graft.operators.Sampling
      .topPByMass(df, col("grp"), col("id"), col("mass"), 0.8)
      .select("id").as[Long].collect().toSet
    // g: exclusive shares 0, 0.5, 0.8 → ids 1,2 kept, 3 dropped (0.8 !< 0.8)
    // h: id 4 is 99% of mass alone → kept; id 5 sits at share 0.99 → dropped
    assert(kept == Set(1L, 2L, 4L))
  }

  test("weightedSample: full-rate rows always kept, zero-rate never, deterministic") {
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.Sampling.weightedSample(docs, col("doc_id"),
      least(lit(1250L) * col("n_chars"), lit(1000000L)))
    val longDocs = docs.filter(col("n_chars") >= 800).count()
    val keptLong = out.filter(col("n_chars") >= 800).count()
    assert(keptLong == longDocs, "ratePpm = 1e6 rows must all survive")
    val none = graft.operators.Sampling
      .weightedSample(docs, col("doc_id"), lit(0L)).count()
    assert(none == 0L)
    val again = graft.operators.Sampling.weightedSample(docs, col("doc_id"),
      least(lit(1250L) * col("n_chars"), lit(1000000L)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("SCD2 as-of join resolves the version valid on the event day") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: state A on Jan 1-2 (v1), B on Jan 3 (v2); purchase on Jan 2
    // must see v1/A, purchase on Jan 3 must see v2/B.
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 09:00:00"), "view"),
      (1L, 11L, ts("2024-01-02 09:00:00"), "view"),
      (1L, 12L, ts("2024-01-02 10:00:00"), "purchase"),
      (1L, 13L, ts("2024-01-03 09:00:00"), "purchase"),
      (1L, 14L, ts("2024-01-03 11:00:00"), "view")) // day-3 closes as view
      .toDF("user_id", "event_id", "ts", "event_type")
    val feed = ev.groupBy(col("user_id"),
        graft.functions.CleanFns.eventDate(col("ts")).as("day"))
      .agg(max_by(col("event_type"),
        struct(col("ts"), col("event_id"))).as("state"))
    val hist = graft.operators.Upsert
      .scd2History(feed, "user_id", "day", "state")
      .select(col("user_id").as("h_user"), col("valid_from"),
        col("version"), col("state"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        graft.functions.CleanFns.eventDate(col("ts")).as("day"))
    val out = graft.operators.AsOfJoin
      .asofJoin(purchases, hist, "user_id", "h_user", "day", "valid_from")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("state"), r.getAs[Long]("version"))).toMap
    // Jan 2's daily state is "purchase" (last event of the day), so v2
    // opens on Jan 2 — the as-of lookup must pick THAT version, and Jan
    // 3's purchase the day-3 version.
    val histRows = graft.operators.Upsert
      .scd2History(feed, "user_id", "day", "state").collect()
      .map(r => r.getAs[String]("valid_from") ->
        (r.getAs[String]("state"), r.getAs[Long]("version"))).toMap
    assert(out(12L) == histRows("2024-01-02"))
    assert(out(13L) == histRows("2024-01-03"))
  }

  test("uniformKPerStratum: exact counts, deterministic, subset of input") {
    val ev = Tables.events(spark, sf).select("event_id", "event_type")
    val out = graft.operators.Sampling
      .uniformKPerStratum(ev, col("event_type"), col("event_id"), 50)
    val sizes = out.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (t, n) => assert(sizes(t) == math.min(50L, n)) }
    val a = out.select("event_id").as[Long].collect().sorted.toSeq
    val b = graft.operators.Sampling
      .uniformKPerStratum(ev, col("event_type"), col("event_id"), 50)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("cmsCounts: est ≥ exact, overcount within eps·N at fixture scale") {
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val rows = graft.analytics.EventAnalytics.cmsCounts(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_n"), r.getAs[Long]("est_n"))
      assert(est >= exact, s"CMS must never undercount: $est < $exact")
      assert(est - exact <= (0.0001 * n).ceil.toLong + 1,
        s"overcount ${est - exact} above eps*N bound")
    }
  }

  test("idleBalanceByNation: members verified row-by-row") {
    val out = StarAnalytics.idleBalanceByNation(spark, sf)
    val total = out.agg(sum(col("numcust"))).collect().head.getLong(0)
    val c = Tables.customer(spark, sf)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal"))).collect().head.getDouble(0)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val expected = c.join(recent, col("c_custkey") === col("o_custkey"),
        "left")
      .filter(col("c_acctbal") > avgBal &&
        coalesce(col("n"), lit(0L)) < 3)
      .count()
    assert(total == expected && total > 0)
  }
}
