package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics

/** Round-10-of-build additions: deterministic synchronous label
  * propagation (mode-vote communities, min-label tie-break). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  // Two triangles {1,2,3} and {10,11,12} joined by one bridge 3–10.
  // Mode-propagation must keep the sides distinct (the bridge carries a
  // single vote against each triangle's internal majority), unlike
  // min-label component propagation which would merge everything to 1.
  private def bridgedTriangles = {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
      .toDF("a", "b")
    pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
  }

  test("labelPropagation: hand-traced 3-round trajectory on the " +
    "bridged triangles — two communities, bridge does not merge them") {
    // r1: 1→2, 2→1, 3→1, 10→3, 11→10, 12→10
    // r2: 1→1, 2→1 (tie {1,2} → min), 3→1 (all-singleton votes → min),
    //     10→10, 11→3 (tie {3,10} → min), 12→3
    // r3: 1→1, 2→1, 3→1 (votes {1:2, 10:1}), 10→3 (votes {3:2, 1:1}),
    //     11→3, 12→3
    val out = GraphAnalytics.labelPropagation(bridgedTriangles, rounds = 3)
      .collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L &&
      out(0).getLong(2) == 1L && out(0).getLong(3) == 3L)
    assert(out(1).getLong(0) == 3L && out(1).getLong(1) == 3L &&
      out(1).getLong(2) == 10L && out(1).getLong(3) == 12L)
  }

  test("labelPropagation: partitioning-invariant (min_by total order " +
    "leaves no tie to the scheduler)") {
    val base = GraphAnalytics.labelPropagation(bridgedTriangles, rounds = 3)
      .collect().toSeq
    val shuffled = GraphAnalytics.labelPropagation(
      bridgedTriangles.repartition(7), rounds = 3).collect().toSeq
    assert(base == shuffled)
  }

  test("joinCardinalityAudit: uniform join exact, skewed join " +
    "under-estimated, nulls dropped") {
    import graft.analytics.StatsAnalytics
    // uniform: cl = {1→2, 2→1}, cr = {1→1, 2→2, 3→1}
    //   est = ⌊3·4/3⌋ = 4, actual = 2·1 + 1·2 = 4 → ratio 1.0
    val lu = Seq(1L, 1L, 2L).toDF("k")
    val ru = Seq(1L, 2L, 2L, 3L).toDF("k")
    // skewed self-join shape: c = {1→3, 2→1} (plus a dropped null row)
    //   est = ⌊4·4/2⌋ = 8, actual = 9 + 1 = 10 → ratio 1.25
    val sk = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("k")
    val out = StatsAnalytics.joinCardinalityAudit(Seq(
      ("a_uniform", lu, ru), ("b_skewed", sk, sk))).collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a_uniform" &&
      out(0).getLong(5) == 4L && out(0).getLong(6) == 4L &&
      out(0).getDouble(7) == 1.0)
    assert(out(1).getString(0) == "b_skewed" &&
      out(1).getLong(1) == 4L && out(1).getLong(2) == 2L &&
      out(1).getLong(5) == 8L && out(1).getLong(6) == 10L &&
      out(1).getDouble(7) == 1.25)
  }

  test("labelPropagation: census plan has no window and ends in a " +
    "bounded top-k; the vote round's argmax is a partial aggregate") {
    val census = GraphAnalytics.labelPropagation(bridgedTriangles,
      rounds = 1).queryExecution.executedPlan.toString
    assert(!census.contains("WindowExec"), census)
    assert(census.contains("TakeOrderedAndProject"), census)
    val labels0 = bridgedTriangles.select(col("a").as("node"))
      .distinct().withColumn("lbl", col("node"))
    val round = GraphAnalytics.lpaRound(bridgedTriangles, labels0)
      .queryExecution.executedPlan.toString
    assert(!round.contains("WindowExec"), round)
    assert(round.contains("partial_min_by"), round)
  }
}
