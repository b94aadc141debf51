package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.ext.TextFns.tokens

/** The native TokenStats expression must be bit-identical to the four
  * HOF forms it replaced — checked on a fixture of adversarial strings
  * (unicode, repeated whitespace, empty, stopword-only) AND on the real
  * corpus, plus null propagation and the codegen path. */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  private def strings = Seq(
    "", "   ", "the the the", "The AND of", "a\tb\nc  d",
    "naïve Café ÜBER das ist", "le la les et est une y el los",
    "x y z x y z x", "der die das und ist ein the",
    "punct, only! tokens?", "一 二 三 一", " leading and trailing ")

  test("matches the HOF reference on adversarial strings") {
    graft.plans.TokenStats.register(spark)
    val df = strings.toDF("text")
    val toks = tokens(col("text"))
    val refCols = Seq(
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct"),
      aggregate(toks, lit(0L), (a, t) => a + length(t)).as("sum_chars")) ++
      TextAnalysis.LangProfiles.map { case (l, ws) =>
        size(filter(toks, t => t.isInCollection(ws))).cast("bigint")
          .as(s"hits_$l")
      }
    val ref = df.select(refCols: _*).collect().toList
    val native = df.select(
      graft.plans.TokenStats.token_stats(col("text")).as("s"))
      .select("s.*").collect().toList
    assert(native == ref)
  }

  test("matches the HOF reference on the whole fixture corpus") {
    graft.plans.TokenStats.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = tokens(col("text"))
    val ref = docs.select(col("doc_id"),
      size(toks).cast("bigint").as("n"),
      size(array_distinct(toks)).cast("bigint").as("nd"),
      aggregate(toks, lit(0L), (a, t) => a + length(t)).as("sc"),
      size(filter(toks, t =>
        t.isInCollection(TextAnalysis.LangProfiles.head._2)))
        .cast("bigint").as("he"))
    val nat = docs
      .select(col("doc_id"),
        graft.plans.TokenStats.token_stats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_tokens").as("n"),
        col("s.n_distinct").as("nd"), col("s.sum_chars").as("sc"),
        col("s.hits_en").as("he"))
    assert(nat.exceptAll(ref).isEmpty && ref.exceptAll(nat).isEmpty)
  }

  test("null text propagates to a null struct") {
    graft.plans.TokenStats.register(spark)
    val df = Seq(Some("the x"), None).toDF("text")
    val out = df.select(
      graft.plans.TokenStats.token_stats(col("text")).isNull.as("isnull"))
      .as[Boolean].collect().toList
    assert(out == List(false, true))
  }
}
