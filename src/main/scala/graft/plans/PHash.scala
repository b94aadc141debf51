package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** 63-bit perceptual hash (pHash) of a binary payload: DCT-II over a
  * fixed 16×16 grayscale downsample, top-left 8×8 coefficient block,
  * bit b set where AC coefficient b+1 exceeds the block's median — the
  * classic image near-dup sketch (Zauner 2010's pHash; the DC term is
  * excluded from both the median and the bits because it only encodes
  * mean brightness). This is the REAL perceptual-hash math: swap the
  * byte-wrap downsample below for decoded pixels and nothing else
  * changes.
  *
  * Cross-engine exactness: the DCT runs entirely in INTEGER arithmetic.
  * Basis cosines are quantized once to scaled longs
  * (round(cos(π(2x+1)k/32)·1e6) — the [[LshBucket]] plane discipline),
  * pixels are exact bytes, and the separable two-stage sums stay well
  * inside Long range (|coeff| ≤ 255·1e6·16·1e6·16 ≈ 6.6e16), so DuckDB
  * reproduces every coefficient, the median pick, and therefore every
  * bit from the same literal table. Median is the LOWER median (32nd
  * smallest of the 63 AC coefficients) to stay integer-exact.
  *
  * Downsample ("decode" stand-in, same stub discipline as
  * [[graft.ext.Multimodal.binaryMeta]]): pixel i of 256 is byte
  * (i mod n) of the payload as unsigned, 0 when the payload is empty.
  * A real build replaces this one loop with a resampled grayscale
  * raster of the decoded image.
  */
case class PHash63(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val cq = PHash63.cq
    // 16×16 grayscale downsample via byte wrap (the decode seam)
    val p = new Array[Long](256)
    if (n > 0) {
      var i = 0
      while (i < 256) { p(i) = (bytes(i % n) & 0xFF).toLong; i += 1 }
    }
    // separable DCT: rows first (16 rows × 8 freqs), then columns
    val s1 = new Array[Long](16 * 8) // s1(r*8+v) = Σ_c p(r,c)·cq(v)(c)
    var r = 0
    while (r < 16) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var c = 0
        while (c < 16) { acc += p(r * 16 + c) * cq(v)(c); c += 1 }
        s1(r * 8 + v) = acc
        v += 1
      }
      r += 1
    }
    val coeffs = new Array[Long](64) // coeffs(u*8+v) = Σ_r cq(u)(r)·s1(r,v)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var rr = 0
        while (rr < 16) { acc += cq(u)(rr) * s1(rr * 8 + v); rr += 1 }
        coeffs(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    // lower median of the 63 AC coefficients; bit i-1 set iff AC_i > med
    val ac = java.util.Arrays.copyOfRange(coeffs, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var out = 0L
    var i = 1
    while (i < 64) {
      if (coeffs(i) > med) out |= (1L << (i - 1))
      i += 1
    }
    java.lang.Long.valueOf(out)
  }
  override def prettyName: String = "phash63"
  override protected def withNewChildInternal(c: Expression): PHash63 =
    copy(child = c)
}

object PHash63 {
  /** Quantized DCT-II basis, shared verbatim with the DuckDB oracle:
    * cq(k)(x) = round(cos(π·(2x+1)·k / 32) · 1e6), k < 8, x < 16. */
  val cq: Array[Array[Long]] = Array.tabulate(8, 16) { (k, x) =>
    math.round(math.cos(math.Pi * (2 * x + 1) * k / 32.0) * 1e6)
  }

  /** The cq table as a DuckDB list-of-lists literal, so the oracle SQL
    * is generated from the SAME numbers the expression multiplies by. */
  def cqSqlLiteral: String =
    cq.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "phash63", exprs => PHash63(exprs.head), "built-in")

  def phash63(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("phash63", payload)
}
