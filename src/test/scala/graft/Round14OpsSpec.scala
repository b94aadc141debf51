package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** Round-6-of-build additions: the D2 surrogate-key scale-path sibling. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  private def keys = Seq(
    "pearl", "azure", "khaki", "maroon", "aqua", "beige", "coral",
    "denim", "ebony", "fuchsia", "gold", "hazel", "ivory", "jade",
    "lime", "navy", "olive", "plum", "quartz", "rose", "sand", "teal",
    "umber", "violet", "wheat"
  ).toDF("name")

  test("withSurrogateKeyScale: ids bit-equal to the exact dense_rank form") {
    val exact = Upsert.withSurrogateKey(keys, "name", "id")
      .orderBy("name").as[(String, Long)].collect().toList
    val scale = Upsert.withSurrogateKeyScale(keys, "name", "id")
      .orderBy("name").as[(String, Long)].collect().toList
    assert(scale == exact)
    // sanity: dense ids 1..N in sorted-key order
    assert(scale.map(_._2) == (1L to keys.count()).toList)
    assert(scale.map(_._1) == scale.map(_._1).sorted)
  }

  test("withSurrogateKeyScale: every window in the plan is partitioned") {
    // pin on the optimized logical plan: AQE wraps the physical tree, but
    // a logical Window either has a partitionSpec or it doesn't
    val df = Upsert.withSurrogateKeyScale(keys, "name", "id")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the per-partition rank window")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"single-partition window survived:\n$w")
    }
    // the rank runs under a pid-hash shuffle (parallel across partitions);
    // the range shuffle itself sits behind the localCheckpoint lineage cut,
    // so it cannot appear in this plan — equality with the exact form
    // (previous test) is what proves the range layout fed correct offsets
    val phys = df.queryExecution.executedPlan.toString.toLowerCase
    assert(phys.contains("hashpartitioning(__pid"),
      s"pid-partitioned rank shuffle missing:\n$phys")
  }

  test("withSurrogateKeyScale: empty dim yields empty ids") {
    val empty = keys.filter(lit(false))
    assert(Upsert.withSurrogateKeyScale(empty, "name", "id").count() == 0L)
  }

  test("duplicatedSpans: cross-doc windows flagged, within-doc repeats not") {
    // w=3. Docs 1 and 2 share the 4-token run "b c d e" → two shared
    // 3-gram windows ("b c d", "c d e"). Doc 3 repeats its own trigram
    // twice but shares nothing across docs → zero dup windows (the
    // ≥2-DISTINCT-docs rule). Doc 4 is under w tokens → absent.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "b c d e f"),
      (3L, "x y z x y z x y"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.duplicatedSpans(docs, w = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (1L, 3L, 2L, 2L, 0.666667),
      (2L, 3L, 2L, 2L, 0.666667),
      (3L, 6L, 0L, 0L, 0.0)))
  }
}
