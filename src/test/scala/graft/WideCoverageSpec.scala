package graft

import org.apache.spark.sql.functions._
import graft.analytics.StarAnalytics
import graft.ext.TextAnalysis

/** Round-2 coverage additions: TPC-H Q3/Q5-shaped joins, heavy hitters,
  * salted-join equivalence, ORC roundtrip, ntile deciles. */
class WideCoverageSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("shipping priority is a true top-k: plans TakeOrderedAndProject") {
    val df = StarAnalytics.shippingPriority(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("local supplier volume matches a manually-joined recomputation") {
    val out = StarAnalytics.localSupplierVolume(spark, sf)
      .as[(String, Double)].collect().toMap
    // every returned nation must be in ASIA
    val asia = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").as[String].collect().toSet
    assert(out.keySet.subsetOf(asia))
    assert(out.values.forall(_ > 0))
  }

  test("heavy hitters ranks tokens by exact frequency") {
    val docs = Seq((1L, "a b b c c c", "en"), (2L, "c d", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.heavyHitters(docs, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("c", 4L), ("b", 2L)))
  }

  test("salted join aggregates equal the plain join") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
    val salted = graft.operators.Salt.saltedJoin(li, o, "orderkey", 8,
        xxhash64(col("orderkey"), col("l_linenumber")))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plain = li.join(o, "orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("ORC roundtrip preserves rows and schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    val src = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
    src.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty)
  }

  test("repetition ratio separates boilerplate from diverse text") {
    val docs = Seq((1L, "spam spam spam spam"), (2L, "all words differ here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionRatio(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) == 0.75 && out(2L) == 0.0 && out(3L) == 0.0)
  }

  test("PII scrub counts and redacts emails and long digit runs") {
    val docs = Seq(
      (1L, "reach me at bob.smith@corp.io or 12345678 thanks"),
      (2L, "clean text, short 123 number")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (1L, 1L) && out(2L) == (0L, 0L))
    // redaction changes the fingerprint vs the raw text
    val rawFp = docs.filter(col("doc_id") === 1L)
      .select(sha2(col("text"), 256)).as[String].collect()(0)
    val cleanFp = TextAnalysis.piiScrub(docs)
      .filter(col("doc_id") === 1L).select("clean_fp")
      .as[String].collect()(0)
    assert(rawFp != cleanFp)
  }

  test("decontamination flags only corpus docs overlapping the eval split") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // eval (id%4==0)
      (1L, "the quick brown fox jumps somewhere else entirely"), // overlaps
      (2L, "completely unrelated words about spark engines here"),
      (4L, "another eval document with its own distinct phrasing"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(docs, evalMod = 4, n = 5)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("ntile deciles partition orders into 10 near-equal buckets") {
    val out = SparkEntry.queries("q_value_deciles")(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == (1L to 10L))
    val sizes = out.map(_._2)
    assert(sizes.max - sizes.min <= 1)  // ntile remainder rule
    // decile ranges are non-overlapping and ascending
    val los = out.map(_._3); val his = out.map(_._4)
    assert(out.forall(r => r._3 <= r._4))
    assert(his.zip(los.drop(1)).forall { case (hi, nextLo) => hi <= nextLo })
  }
}
