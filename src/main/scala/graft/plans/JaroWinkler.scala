package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native Catalyst expression — the fuzzy
  * string comparator record linkage wants where thresholded Levenshtein
  * is too coarse (it weights agreement by position and rewards shared
  * prefixes, the behavior name/address matching literature standardized
  * on). Spark ships `levenshtein` but no Jaro–Winkler; a native
  * Expression (vs a UDF) keeps the comparator inside WholeStageCodegen —
  * the generated code makes ONE static call per row, no boxing, no SerDe
  * fence (preference order per SURVEY.md §2.10).
  *
  * Semantics pinned to the standard definition (and bit-checked in
  * Round21OpsSpec against DuckDB's `jaro_winkler_similarity` outputs, so
  * oracles can mirror it): matches inside the ⌊max(|a|,|b|)/2⌋−1 window,
  * half-transpositions over the matched subsequences, Winkler prefix
  * boost `J + 0.1·min(prefix,4)·(1−J)` applied only when J > 0.7,
  * empty-side pairs score 0. Comparison runs over UTF-16 code units —
  * identical to byte comparison on the ASCII fixture domain (the
  * [[RollingHash]] caveat).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs (STRING, STRING), got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerSim.similarity(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      // one static call into the same JVM method the interpreted path
      // uses — stays inside the WholeStageCodegen product
      s"${ev.value} = graft.plans.JaroWinklerSim.similarity(" +
        s"$l.toString(), $r.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  /** Standard Jaro similarity; 0.0 when either side is empty or no
    * characters match. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - half) / md) / 3.0
  }

  /** Winkler boost: applied only above the classic 0.7 threshold, prefix
    * capped at 4, scale 0.1 — the parameterization DuckDB's
    * `jaro_winkler_similarity` uses, so oracle SQL reproduces this
    * bit-for-bit on the fixture domain. */
  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j > 0.7) {
      val maxL = math.min(4, math.min(s1.length, s2.length))
      var l = 0
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      j + 0.1 * l * (1.0 - j)
    } else j
  }

  /** Register `jaro_winkler` in the session's function registry for SQL
    * and Column-API use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`jaro_winkler`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        JaroWinklerSim(exprs(0), exprs(1))
      },
      "built-in")

  /** Column-API entry point; requires [[register]] first. */
  def jaro_winkler(l: Column, r: Column): Column =
    org.apache.spark.sql.functions.call_function("jaro_winkler", l, r)
}
