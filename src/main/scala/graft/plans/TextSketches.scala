package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for the dedup suite.
  *
  * Why native and not higher-order functions: Spark HOFs (`transform`/
  * `aggregate`) evaluate their lambdas interpreted (CodegenFallback), one
  * Expression-tree walk per element — a k×n nested fold pays that cost
  * k·n times per row (measured: 60× slowdown at sf0.1). These expressions
  * do one tight JVM loop per row over the token array instead; preference
  * order per SURVEY.md §2.10 (built-ins → Expression → UDF) lands on
  * Expression because built-ins can't express the loop efficiently.
  */

/** MinHash signature: for seeds 0..k-1, min murmur3(token, seed) over the
  * input array<string>. Returns array<int> of length k (null input → null,
  * empty array → Int.MaxValue-filled signature). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Int.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var seed = 0
        while (seed < k) {
          val h = Murmur3_x86_32.hashUnsafeBytes(base, off, len, seed)
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** 64-bit SimHash over array<string> tokens: per-bit ±1 votes of the
  * token's xxhash64-style murmur pair (two 32-bit murmurs combined),
  * sign-threshold, packed into a long. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val lo = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x9747b28c)
        val hi = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x85ebca6b)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object TextSketches {
  /** Register both sketch functions in the session registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
  }

  def minhash_sig(tokens: Column, k: Int): Column =
    call_function("minhash_sig", tokens,
      org.apache.spark.sql.functions.lit(k))

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
}
