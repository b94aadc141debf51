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

  test("every single-partition Window consumes an aggregate-bounded " +
    "subtree (the boundedness convention, now checked)") {
    // The ~78 unpartitioned Window.orderBy sites are each justified by
    // scaladoc ("day-bounded frame", "census", "per-entity rollup") —
    // this lint turns that prose convention into a failing test: a
    // future op that windows a corpus-sized frame with no grouping
    // aggregate (or bounded limit) below it shows up as an offender
    // instead of slipping through to a 100 TB single-task sort.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec}
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    def boundedBelow(p: SparkPlan): Boolean = p.collectFirst {
      case a: BaseAggregateExec if a.groupingExpressions.nonEmpty => true
      case _: GlobalLimitExec => true
      case _: LocalLimitExec => true
      // a WindowGroupLimit below caps rows per partition-key group
      case _: WindowGroupLimitExec => true
    }.getOrElse(false)
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.executedPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
          !boundedBelow(w.child) => w
      }
      if (bad.nonEmpty && !unboundedWindowAllowed(name))
        offenders += s"$name (${bad.size} window(s))"
    }
    assert(offenders.isEmpty,
      "single-partition Window over an unbounded subtree in: " +
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
