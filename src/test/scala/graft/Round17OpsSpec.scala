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

  test("goodTuring: matrix path ≡ direct path") {
    val direct = Curation.goodTuring(docs).collect().toSeq
    val viaMatrix = Curation.goodTuring(docs,
      tfOpt = Some(graft.ext.TextAnalysis.docTermFreqOf(docs)))
      .collect().toSeq
    assert(direct == viaMatrix)
  }
}
