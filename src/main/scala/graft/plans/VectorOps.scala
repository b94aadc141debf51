package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native float32-vector dot product: Σ (double)a[i] · (double)b[i],
  * summed left-to-right.
  *
  * Bit-identical to the portable HOF form
  * `aggregate(zip_with(cast(a as array<double>), cast(b as ...), *), 0d, +)`
  * — float→double casts are exact and the IEEE operation sequence is the
  * same — so swapping it in cannot change oracle-matched results. It exists
  * because HOF lambdas evaluate interpreted per element (CodegenFallback),
  * which made brute-force top-k ~6× slower than this single-node loop.
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
  // Splice the loop into whole-stage codegen: the all-pairs similarity
  // queries evaluate this millions of times per task, and the fallback
  // path boxes both arrays and the result per call.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Native float64-vector dot product — same contract as [[DotF32]] for
  * array<double> inputs (iterated centroids, mean vectors): a strict
  * left-to-right Σ a[i]·b[i], bit-identical to the HOF
  * `aggregate(zip_with(a, b, *), 0d, +)` it replaces, which is also the
  * fold DuckDB's `list_cosine_similarity` accumulates in. Exists for the
  * same reason as DotF32: HOF lambdas evaluate interpreted per element. */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket id over an array<float> embedding: bit b of
  * the result is the sign of the dot product with pseudo-random plane b.
  * Plane components are PORTABLE pseudo-randoms in [-1, 1]:
  * `(PortableHash.h60("b:d") % 2000001 - 1000000) / 1e6` — DuckDB
  * reproduces the same planes from md5, so bucket assignments (and the
  * LSH near-dup pipeline built on them) are oracle-checkable. Planes are
  * precomputed once per expression instance; the per-row cost is one
  * nBits×dims fused multiply-add loop. */
case class LshBucket(child: Expression, nBits: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits, dims) { (b, d) =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(s"$b:$d")
      (PortableHash.h60(s) % 2000001L - 1000000L) / 1.0e6
    }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      LshBucket.bucket(input.asInstanceOf[ArrayData], planes, nBits, dims))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LshBucket.bucket($c, $planesRef, " +
        s"$nBits, $dims);")
  }
  override protected def withNewChildInternal(c: Expression): LshBucket =
    copy(child = c)
}

object LshBucket {
  /** Per-row kernel shared by the interpreted and generated paths. */
  def bucket(e: ArrayData, planes: Array[Array[Double]],
             nBits: Int, dims: Int): Long = {
    val n = math.min(e.numElements(), dims)
    var out = 0L
    var b = 0
    while (b < nBits) {
      val p = planes(b)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += e.getFloat(d).toDouble * p(d); d += 1 }
      if (acc >= 0.0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object VectorOps {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", exprs => DotF32(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f64", exprs => DotF64(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket",
      exprs => LshBucket(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }

  def dot_f32(a: Column, b: Column): Column = call_function("dot_f32", a, b)

  def dot_f64(a: Column, b: Column): Column = call_function("dot_f64", a, b)

  def lsh_bucket(e: Column, nBits: Int, dims: Int = 64): Column =
    call_function("lsh_bucket", e,
      org.apache.spark.sql.functions.lit(nBits),
      org.apache.spark.sql.functions.lit(dims))
}
