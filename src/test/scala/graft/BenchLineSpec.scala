package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only a 2000-char stdout TAIL and json-parses the
  * bench line out of it (with sbt's "[info] " prefix and trailing
  * "[success] ..." line eating part of the budget). These tests pin the
  * compact line inside that envelope for the FULL current query set, at
  * adversarial timing values — adding queries can never silently push the
  * line past the buffer again. */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq

  test("compact bench line fits the driver tail for every query registered") {
    // worst-case widths: large and tiny times alike print as %.3f
    for (t <- Seq(0.001, 9999.999, 123.456)) {
      val line = Bench.compactLine(names.map(_ -> t), "/root/testdata/sf0.1")
      assert(line.length <= 1800, s"line ${line.length} chars at t=$t")
      assert(!line.contains("\n"))
    }
  }

  test("compact line is valid JSON with total preserved exactly") {
    val results = names.zipWithIndex.map { case (n, i) => n -> (i * 0.017) }
    val line = Bench.compactLine(results, "sf")
    // minimal structural checks without a JSON library on the classpath
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""","sf":"sf"}"""))
    assert(line.contains(s""""n_queries":${names.length},"""))
    val total = """"value":([0-9.]+),""".r.findFirstMatchIn(line).get.group(1)
    assert(math.abs(total.toDouble - results.map(_._2).sum) < 0.01)
    // every name either appears in the line or is covered by other_sec
    assert(line.contains("\"other_sec\":"))
  }

  test("oracle and query key sets line up (no orphan oracle SQL)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // zero rows-only queries: every sketch report (HLL, CMS, t-digest)
    // ships an oracle-checked audit form
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
  }
}
