package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends BinaryExpression with CodegenFallback {
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
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorOps {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", exprs => DotF32(exprs.head, exprs(1)), "built-in")

  def dot_f32(a: Column, b: Column): Column = call_function("dot_f32", a, b)
}
