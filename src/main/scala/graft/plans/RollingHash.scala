package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash fingerprint: h = Σ byte_i · 31^i (mod 2^64) over
  * the UTF-8 bytes — the document-fingerprinting primitive (a Rabin-Karp
  * style hash) as a native Catalyst expression.
  *
  * Why an Expression and not a UDF: `doGenCode` splices a tight byte loop
  * into the WholeStageCodegen product — no boxing, no SerDe, no codegen
  * fence — so fingerprinting runs at scan speed inside the same generated
  * function as the surrounding projections. (Preference order per
  * SURVEY.md §2.10: built-ins > Expression > UDF.)
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var p = 1L
    var i = 0
    while (i < bytes.length) {
      h += (bytes(i) & 0xffL) * p
      p *= 31L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L; long $p = 1L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h += ($bytes[$i] & 0xffL) * $p;
         |  $p *= 31L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Register `rolling_hash` in the session's function registry so it is
    * usable from both SQL text and the Column API (via `call_function`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")

  /** Column-API entry point; requires `register(spark)` first. */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)

  /** Reference implementation for tests. */
  def reference(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 0L; var p = 1L
    bytes.foreach { b => h += (b & 0xffL) * p; p *= 31L }
    h
  }
}
