package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopK

/** The mergeable native top-k aggregate: bit-equality with the
  * row_number window form, partial-merge correctness across many input
  * partitions, and the bounded-buffer admission rules. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_by_score matches the row_number window form exactly") {
    TopK.register(spark)
    // 40 groups × 50 candidates with score ties (score = v % 7) so the
    // tiebreak path is exercised; spread over many partitions so partial
    // buffers must merge
    val df = spark.range(2000)
      .select((col("id") % 40).as("g"),
        (col("id") % 7).cast("double").as("score"),
        col("id").as("cand"),
        (col("id") * 3).as("payload"))
      .repartition(13)
    val viaAgg = df
      .groupBy("g")
      .agg(TopK.top_k_by_score(
        struct(col("score"), col("cand"), col("payload")), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("g"), col("t.score").as("score"),
        col("t.cand").as("cand"), col("t.payload").as("payload"),
        (col("r0") + 1).cast("bigint").as("rnk"))
      .orderBy("g", "rnk")
      .as[(Long, Double, Long, Long, Long)].collect().toList
    val w = Window.partitionBy("g")
      .orderBy(col("score").desc, col("cand").asc)
    val viaWindow = df
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 5)
      .select(col("g"), col("score"), col("cand"), col("payload"),
        col("rnk"))
      .orderBy("g", "rnk")
      .as[(Long, Double, Long, Long, Long)].collect().toList
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k keep every row; nulls are skipped") {
    TopK.register(spark)
    val df = Seq(
      (1L, Some(2.0), 10L), (1L, Some(1.0), 11L), (1L, None, 12L),
      (2L, Some(5.0), 20L)
    ).toDF("g", "score", "cand")
      .select(col("g"), col("score").cast("double").as("score"), col("cand"))
    val out = df.groupBy("g")
      .agg(TopK.top_k_by_score(struct(col("score"), col("cand")), 3)
        .as("top"))
      .select(col("g"), size(col("top")).as("n"))
      .orderBy("g").as[(Long, Int)].collect().toList
    assert(out == List((1L, 2), (2L, 1)))
  }

  test("SQL misuse fails at analysis with a named error, not a CCE/NPE") {
    TopK.register(spark)
    spark.range(10)
      .select((col("id") % 2).as("g"), col("id").cast("double").as("s"),
        col("id").as("c"))
      .createOrReplaceTempView("topk_guard_in")
    val nonLiteral = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT g, top_k_by_score(struct(s, c), CAST(c AS INT)) AS t
          |FROM topk_guard_in GROUP BY g""".stripMargin).collect()
    }
    assert(nonLiteral.getMessage.contains("top_k_by_score"))
    val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT top_k_by_score(struct(s, c)) FROM topk_guard_in").collect()
    }
    assert(wrongArity.getMessage.contains("top_k_by_score"))
  }

  test("the plan partial-aggregates map-side (ObjectHashAggregate)") {
    TopK.register(spark)
    val df = spark.range(100)
      .select((col("id") % 5).as("g"), col("id").cast("double").as("score"),
        col("id").as("cand"))
    val plan = df.groupBy("g")
      .agg(TopK.top_k_by_score(struct(col("score"), col("cand")), 3)
        .as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(600))
    assert(plan.contains("partial_top_k_by_score"), plan.take(600))
  }
}
