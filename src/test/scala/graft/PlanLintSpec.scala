package graft

/** Whole-registry plan lint: EVERY query in SparkEntry.queries is built
  * against the sf0.001 fixture and its physical plan is screened for the
  * two anti-patterns that kill 100 TB runs silently:
  *
  *  - `CartesianProduct` — an unbounded all-pairs join. Allowed only for
  *    the explicitly documented small-corpus oracle forms (each has a
  *    bucketed/blocked scale path beside it).
  *  - `ScalaUDF` / `BatchEvalPython` — interpreted per-row code that
  *    breaks whole-stage codegen in a hot path.
  *
  * This is the systematic form of the per-operator PlanShapeSpec pins:
  * new queries get linted automatically the moment they are registered.
  */
class PlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Documented all-pairs oracles (small-corpus forms with a scale path
    * beside them) — the only queries allowed a CartesianProduct. */
  private val cartesianAllowed = Set(
    "q_embedding_neardup", // Similarity.embeddingNearDupExact: oracle form
    "q_edit_distance",     // blocked pairs, tiny blocks by design
    "q_jaccard_pairs",     // broadcast-anchor blocking, documented
    "q_bitext_mine"        // Similarity.bitextMine: exact A×B oracle form;
                           // scale sibling REGISTERED as q_bitext_mine_lsh
                           // (LSH-bucketed candidates + recall audit)
  )

  /** Queries allowed a single-partition Window over a subtree with NO
    * grouping aggregate beneath it — each is a documented exact-oracle
    * form with a registered windowless scale sibling (see README
    * "sibling index") or a deliberately corpus-ordered export. */
  private val unboundedWindowAllowed: Set[String] = Set.empty

  /** Queries whose measured window feed grows with the FIXTURE but is
    * hard-capped by a domain bound the fixtures sit below — each entry
    * names the bound. (The measured lint sees 10× growth only because
    * the cap has not saturated at sf0.01.) */
  private val growthExempt: Map[String, String] = Map(
    "q_hilbert_skip" -> ("layout walks run over the grid-cell census, " +
      "<= 4^gridBits = 65536 rows by construction " +
      "(operators/Hilbert.skipStats3) regardless of corpus size"))

  /** Full physical traversal that descends through the AQE wrappers.
    * `SparkPlan.collect` stops at `AdaptiveSparkPlanExec` (children =
    * Nil) and `QueryStageExec`, so a naive collect over
    * `queryExecution.executedPlan` sees NOTHING inside an adaptive
    * query — which is 59/60 of this registry. The round-10 version of
    * the window lint had exactly that hole: it walked 463 wrappers,
    * found zero windows, and reported zero offenders vacuously. The
    * anti-vacuity assertion below pins the node counts so a future
    * wrapper change can't silently blind the lint again. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      // a reused exchange is a leaf wrapping the original subtree —
      // without this descent, window-over-window chains that share a
      // base exchange hide their feed (and its metrics) from the lint
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ inner ++ p.subqueries).flatMap(allNodes)
  }

  test("every single-partition Window is aggregate-bounded by structure " +
    "or MEASURED scale-invariant (the boundedness lint, r11 form)") {
    // The ~78 unpartitioned Window.orderBy sites are each justified by
    // scaladoc ("day-bounded frame", "census", "per-entity rollup") —
    // this lint turns that prose convention into a failing test in two
    // passes. Structural pass: a grouping aggregate / limit /
    // WindowGroupLimit below the window proves boundedness cheaply.
    // Measured pass (for the ~20 sites where localCheckpoint truncates
    // the plan and hides the day-grain aggregate behind an RDDScan):
    // execute the query at sf0.001 AND sf0.01 and read the rows
    // actually entering each single-partition window from the nearest
    // descendant metric — a bounded input stays flat across the 10×
    // fixture step, a corpus-linear one grows ~10× and fails here
    // before it becomes a 100 TB single-task sort.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec}
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    def boundedBelow(p: SparkPlan): Boolean = allNodes(p).exists {
      case a: BaseAggregateExec if a.groupingExpressions.nonEmpty => true
      case _: GlobalLimitExec => true
      case _: LocalLimitExec => true
      // a WindowGroupLimit below caps rows per partition-key group
      case _: WindowGroupLimitExec => true
      case _ => false
    }
    // rows entering each structurally-unproven single-partition window,
    // in traversal order (stable across scales: same plan shape)
    def windowFeeds(plan: SparkPlan): Seq[Long] =
      allNodes(plan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
          !boundedBelow(w.child) =>
          allNodes(w.child).collectFirst {
            case n if n.metrics.contains("numOutputRows") =>
              n.metrics("numOutputRows").value
            case n if n.metrics.contains("shuffleRecordsWritten") =>
              n.metrics("shuffleRecordsWritten").value
          }.getOrElse(-1L)
      }
    val structurallyUnproven =
      scala.collection.mutable.ListBuffer.empty[String]
    var windowsSeen = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.executedPlan
      windowsSeen += allNodes(plan).count(_.isInstanceOf[WindowExec])
      val bad = allNodes(plan).exists {
        case w: WindowExec
          if w.partitionSpec.isEmpty && !boundedBelow(w.child) => true
        case _ => false
      }
      if (bad && !unboundedWindowAllowed(name))
        structurallyUnproven += name
    }
    // anti-vacuity: the registry is known to plan many windows; if the
    // traversal ever reports none, the lint went blind, not clean (the
    // round-10 version collected over the AQE wrapper and saw nothing)
    assert(windowsSeen > 50,
      s"traversal saw only $windowsSeen WindowExec nodes - lint blind?")
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for (name <- structurallyUnproven if !growthExempt.contains(name)) {
      val fn = SparkEntry.queries(name)
      val feeds = Seq(sf, "/root/testdata/sf0.01").map { d =>
        val df = fn(spark, d)
        df.collect()
        windowFeeds(df.queryExecution.executedPlan)
      }
      if (feeds(0).size != feeds(1).size)
        offenders += s"$name (plan shape differs across scales)"
      else feeds(0).zip(feeds(1)).zipWithIndex.foreach {
        case ((r001, r01), i) =>
          // flag only meaningful sizes: a day-grain/census feed stays
          // well under 1k at sf0.01; corpus-linear is >= ~10k there
          if (r001 < 0 || r01 < 0)
            offenders += s"$name (window $i: feed metric unavailable)"
          else if (r01 > 1000L && r01 > 3L * math.max(r001, 1L))
            offenders += s"$name (window $i: $r001 -> $r01 rows)"
      }
    }
    assert(offenders.isEmpty,
      "single-partition Window with corpus-growing input in: " +
        offenders.mkString(", "))
  }

  test("no query plans a CartesianProduct (outside documented oracles) " +
    "or an interpreted UDF") {
    val offendersCart = scala.collection.mutable.ListBuffer.empty[String]
    val offendersUdf = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") && !cartesianAllowed(name))
        offendersCart += name
      if (plan.contains("ScalaUDF") || plan.contains("BatchEvalPython"))
        offendersUdf += name
    }
    assert(offendersCart.isEmpty,
      s"CartesianProduct in: ${offendersCart.mkString(", ")}")
    assert(offendersUdf.isEmpty,
      s"interpreted UDF in: ${offendersUdf.mkString(", ")}")
  }
}
