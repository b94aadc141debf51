package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.GraphAnalytics

/** Round-27 invariants for the hub-capped wedge family (VERDICT r10
  * item 4): the cap must be a pure enumeration bound, not a scoring
  * change — capped ≡ uncapped whenever no center node exceeds the cap,
  * and on a deliberate hub the output stays pair-bounded with the
  * truncation surfaced in `n_capped_hubs`. */
class Round27PropSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical (a < b) edge list from pairs. */
  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")

  /** Seeded random sparse graph: 30 nodes, ~70 edges, max degree << 30. */
  private def randomEdges(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val pairs = Seq.fill(70) {
      val a = rnd.nextInt(30).toLong
      val b = rnd.nextInt(30).toLong
      (a, b)
    }.filter { case (a, b) => a != b }
    edges(pairs: _*)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  test("adamicAdarCapped == adamicAdar when cap >= max degree") {
    for (seed <- Seq(27001, 27002)) {
      val e = randomEdges(seed).cache()
      val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      val maxDeg = sym.groupBy("a").count().agg(max("count"))
        .head().getLong(0).toInt
      val uncapped = GraphAnalytics.adamicAdarOnEdges(e, 1000)
      val capped = GraphAnalytics
        .adamicAdarCappedOnEdges(e, maxDeg, 1000)
      // with no truncation the overflow column must be 0 on every row
      assert(capped.filter(col("n_capped_hubs") =!= 0L).count() === 0L)
      assert(sortedRows(capped.drop("n_capped_hubs"))
        === sortedRows(uncapped))
    }
  }

  test("linkJaccardCapped == linkJaccard when cap >= max degree") {
    for (seed <- Seq(27003, 27004)) {
      val e = randomEdges(seed).cache()
      val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      val maxDeg = sym.groupBy("a").count().agg(max("count"))
        .head().getLong(0).toInt
      val uncapped = GraphAnalytics.linkJaccardOnEdges(e, 1000)
      val capped = GraphAnalytics
        .linkJaccardCappedOnEdges(e, maxDeg, 1000)
      assert(capped.filter(col("n_capped_hubs") =!= 0L).count() === 0L)
      assert(sortedRows(capped.drop("n_capped_hubs"))
        === sortedRows(uncapped))
    }
  }

  test("hub truncation bounds wedges and is accounted") {
    // star: center 0 wired to 1..100, plus one ring edge 1-2 so the
    // pruned graph is not degenerate. Uncapped wedge count from center
    // 0 is C(100,2) = 4950; capped at 10 it is C(10,2) = 45.
    val star = edges((1L to 100L).map(i => (0L, i)): _*)
      .unionAll(edges((1L, 2L)).toDF("a", "b"))
    val capped = GraphAnalytics.adamicAdarCappedOnEdges(star, 10, 100000)
    val rows = capped.collect()
    // every surviving pair draws from the 10 smallest-id neighbors of
    // some center; with the star shape that is pairs within {1..10}
    // (minus the existing 1-2 edge) from center 0, plus nothing else
    assert(rows.nonEmpty)
    assert(rows.length <= 45)
    // exactly one truncated hub: node 0 (degree 100 > 10); nodes 1 and 2
    // have degree 2
    assert(rows.forall(_.getAs[Long]("n_capped_hubs") == 1L))
    // the 1/ln(deg) weight keeps the TRUE center degree (100), so every
    // capped pair through node 0 scores 1/ln(100) per wedge, never
    // 1/ln(10)
    val viaCenter = rows.filter(r => r.getAs[Long]("part_a") >= 3L)
    assert(viaCenter.forall { r =>
      math.abs(
        r.getAs[Double]("adamic_adar") - 1.0 / math.log(100.0)) < 1e-6
    })
  }

  test("GlobalRank.withRowNumber == single-partition row_number") {
    import org.apache.spark.sql.expressions.{Window => W}
    val rnd = new scala.util.Random(27005)
    val df = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextLong()))
      .zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
      .toDF("id", "k", "v")
      .repartition(7) // deliberately scattered input
    val want = df.withColumn("rn",
        row_number().over(W.orderBy(col("k").desc, col("id"))))
      .select("id", "rn").collect().map(r => (r.getLong(0),
        r.getInt(1).toLong)).toMap
    val got = graft.operators.GlobalRank.withRowNumber(df,
        Seq(col("k").desc, col("id")), "rn", numPartitions = 5)
      .select("id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("GlobalRank.withPrefixSum == single-partition running sum " +
    "(exact decimals)") {
    import org.apache.spark.sql.expressions.{Window => W}
    val rnd = new scala.util.Random(27006)
    val df = Seq.fill(300)(BigDecimal(rnd.nextInt(100000), 4))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v").cast("decimal(28,12)").as("v"))
      .repartition(6)
    val w = W.orderBy(col("v").desc, col("id"))
      .rowsBetween(W.unboundedPreceding, 0)
    val want = df.withColumn("c", sum(col("v")).over(w))
      .select("id", "c").collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).toMap
    val got = graft.operators.GlobalRank.withPrefixSum(df,
        Seq(col("v").desc, col("id")), col("v"), "c", numPartitions = 5)
      .select("id", "c").collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).toMap
    assert(got === want)
  }

  test("GlobalRank.withPrefixSum null semantics match the window form " +
    "(all-null range-partition prefix)") {
    import org.apache.spark.sql.expressions.{Window => W}
    // ids 0..299 sorted ascending; the first 130 values are NULL, so
    // with numPartitions = 5 at least the first range partition's local
    // prefix is entirely null. The window form returns null only while
    // the GLOBAL prefix is all-null, then the running sum of non-nulls;
    // a partition-local coalesce bug would instead null out (or zero
    // out) rows whose local prefix is null.
    val rnd = new scala.util.Random(27007)
    val df = (0L until 300L).map { i =>
      val v = if (i < 130) null
        else BigDecimal(rnd.nextInt(100000), 4).bigDecimal
      (i, v)
    }.toDF("id", "v")
      .select(col("id"), col("v").cast("decimal(28,12)").as("v"))
      .repartition(6)
    val w = W.orderBy(col("id")).rowsBetween(W.unboundedPreceding, 0)
    val want = df.withColumn("c", sum(col("v")).over(w))
      .select("id", "c").collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).toMap
    val got = graft.operators.GlobalRank.withPrefixSum(df,
        Seq(col("id")), col("v"), "c", numPartitions = 5)
      .select("id", "c").collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).toMap
    assert(got === want)
    assert(want(0L) == null && want(299L) != null) // fixture is live
  }

  test("GlobalRank.withGroupRowNumber == per-group row_number, null " +
    "group keys form one group, outCount == group size") {
    import org.apache.spark.sql.expressions.{Window => W}
    // 3-NDV key incl. nulls over scattered input — the low-NDV shape
    // the concentration-share lint flags; groups MUST span range
    // partitions (500 rows, 5 partitions) for the offsets to matter
    val rnd = new scala.util.Random(27013)
    val df = Seq.fill(500)((rnd.nextInt(3), rnd.nextLong()))
      .zipWithIndex.map { case ((g, v), i) =>
        (i.toLong, if (g == 2) null else s"g$g", v) }
      .toDF("id", "g", "v")
      .repartition(7)
    val w = W.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df
      .withColumn("rn", row_number().over(w))
      .withColumn("ng", count(lit(1)).over(W.partitionBy(col("g"))))
      .select("id", "rn", "ng").collect()
      .map(r => (r.getLong(0), (r.getInt(1).toLong, r.getLong(2)))).toMap
    val got = graft.operators.GlobalRank.withGroupRowNumber(df,
        Seq(col("g")), Seq(col("v").desc, col("id")), "rn", "ng",
        numPartitions = 5)
      .select("id", "rn", "ng").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    // fixture is live: the null group exists and is non-trivial
    assert(want.values.map(_._2).toSet.size == 3)
  }

  test("GlobalRank.withGroupRowNumber: expression group keys and no " +
    "outCount leave the schema clean") {
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("id", "x")
      .repartition(4)
    val out = graft.operators.GlobalRank.withGroupRowNumber(df,
      Seq(col("x") % 2), Seq(col("id")), "rn", numPartitions = 3)
    assert(out.columns.toSeq == Seq("id", "x", "rn"))
    val m = out.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // even-x group = {i : i%7 in {0,2,4,6}}, 4 per 7-cycle: id 98
    // (98%7=0) has 14 full cycles × 4 = 56 group rows below it;
    // odd-x group has 3 per cycle: id 99 (99%7=1) has 14 × 3 = 42
    assert(m(0L) == 1L && m(2L) == 2L && m(98L) == 57L)
    assert(m(1L) == 1L && m(99L) == 43L)
  }

  test("decoded-raster SimHash arm recovers every constructed true pair") {
    // ids kept by mod=10 are {0,1,10,11,20,21,30,31}; base-image pairs
    // are (0,1), (10,11), (20,21), (30,31)
    val docs = (0L until 40L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val nd = graft.ext.Multimodal.mediaNearDupSimHashPgm(docs).collect()
    val truePairs = nd.filter(_.getAs[Int]("is_true_pair") == 1)
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b")))
      .toSet
    assert(truePairs === Set((0L, 1L), (10L, 11L), (20L, 21L),
      (30L, 31L)))
    // the +8-clamp divergence stays in the moderate band the multi-probe
    // guarantee covers
    assert(nd.filter(_.getAs[Int]("is_true_pair") == 1)
      .forall(_.getAs[Int]("hamming") <= 17))
  }

  test("jaccard truncation keeps true degrees in the denominator") {
    val star = edges((1L to 50L).map(i => (0L, i)): _*)
    val capped = GraphAnalytics.linkJaccardCappedOnEdges(star, 5, 100000)
    val rows = capped.collect()
    assert(rows.nonEmpty && rows.length <= 10) // C(5,2) pairs max
    // leaves have true degree 1 even though enumeration was capped
    assert(rows.forall(r => r.getAs[Long]("deg_u") == 1L
      && r.getAs[Long]("deg_v") == 1L))
    assert(rows.forall(_.getAs[Long]("n_capped_hubs") == 1L))
  }
}
