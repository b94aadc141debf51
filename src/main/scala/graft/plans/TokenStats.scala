package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token census used by the document-scoring family (AUC /
  * calibration / isotonic / logistic step / lang-ID / text stats):
  * whitespace tokens of `lower(text)` counted once, yielding
  * `(n_tokens, n_distinct, sum_chars, hits_en, hits_de, hits_fr,
  * hits_es)`.
  *
  * Bit-identical BY CONSTRUCTION to the HOF forms it replaces —
  * `filter(split(lower(text), "\\s+"), _ ≠ "")` for the token stream
  * (same `UTF8String.toLowerCase` / regex-split calls Spark's own
  * `lower`/`split` make), `size(filter(toks, isInCollection(words)))`
  * for the profile hits, `size(array_distinct(toks))` for the distinct
  * count, and `aggregate(toks, 0L, _ + length(_))` for the char sum —
  * every output is an integer count, so swapping it in cannot change
  * any oracle-matched result. It exists because each of those HOFs
  * re-tokenizes and evaluates an interpreted lambda per element
  * (CodegenFallback); this expression tokenizes ONCE and counts in a
  * tight JVM loop spliced into whole-stage codegen.
  */
object TokenStatsUtil {
  private val ws = UTF8String.fromString("\\s+")

  // materialized once per JVM from the canonical profile list
  private lazy val profiles: Array[java.util.HashSet[UTF8String]] =
    graft.ext.TextAnalysis.LangProfiles.map { case (_, words) =>
      val s = new java.util.HashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  def compute(s: UTF8String): InternalRow = {
    val parts = s.toLowerCase.split(ws, -1)
    val prof = profiles
    val hits = new Array[Long](prof.length)
    val seen = new java.util.HashSet[UTF8String]()
    var n = 0L
    var chars = 0L
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.numBytes() != 0) {
        n += 1
        chars += t.numChars()
        seen.add(t)
        var p = 0
        while (p < prof.length) {
          if (prof(p).contains(t)) hits(p) += 1
          p += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, seen.size.toLong, chars,
      hits(0), hits(1), hits(2), hits(3)))
  }
}

case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenStats.schema

  override def nullSafeEval(input: Any): Any =
    TokenStatsUtil.compute(input.asInstanceOf[UTF8String])

  // one static call per ROW inside whole-stage codegen (vs one
  // interpreted lambda tree per ELEMENT for each of the four HOFs)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenStatsUtil.compute($c);")

  override protected def withNewChildInternal(c: Expression): TokenStats =
    copy(child = c)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_chars", LongType, nullable = false),
    StructField("hits_en", LongType, nullable = false),
    StructField("hits_de", LongType, nullable = false),
    StructField("hits_fr", LongType, nullable = false),
    StructField("hits_es", LongType, nullable = false)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_stats", exprs => TokenStats(exprs.head), "built-in")

  def token_stats(text: Column): Column = call_function("token_stats", text)
}
