package graft

import graft.ext.DedupCluster.connectedComponents

class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("chain components collapse to the minimum id") {
    // 1-2-3-4 path plus a separate 5-6 edge
    val got = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
  }

  test("long path converges within the iteration budget") {
    val path = (1L to 19L).map(i => (i, i + 1))
    val got = comps(path)
    assert(got.values.toSet == Set(1L) && got.size == 20)
  }

  test("edge direction and duplicates don't affect the result") {
    val got = comps(Seq((9L, 3L), (3L, 9L), (9L, 3L), (7L, 9L)))
    assert(got == Map(3L -> 3L, 9L -> 3L, 7L -> 3L))
  }
}
