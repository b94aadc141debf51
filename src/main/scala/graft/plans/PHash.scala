package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
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
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(PHash63.hash(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PHash63.hash($c);")
  override def prettyName: String = "phash63"
  override protected def withNewChildInternal(c: Expression): PHash63 =
    copy(child = c)
}

object PHash63 {
  /** Per-row kernel shared by the interpreted and generated paths:
    * byte-wrap downsample (the decode seam) → integer DCT → lower-median
    * bit pack. [[hashRaster]] is the same math minus the seam. */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    // 16×16 grayscale downsample via byte wrap (the decode seam)
    val p = new Array[Long](256)
    if (n > 0) {
      var i = 0
      while (i < 256) { p(i) = (bytes(i % n) & 0xFF).toLong; i += 1 }
    }
    hashRaster(p)
  }

  /** DCT + median + bit-pack over an already-decoded 256-long grayscale
    * raster (row-major 16×16, values 0..255) — the entry the real-decode
    * arm uses so the perceptual math is exercised on image-shaped data. */
  def hashRaster(p: Array[Long]): Long = {
    val cq = PHash63.cq
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
    out
  }
  /** Quantized DCT-II basis, shared verbatim with the DuckDB oracle:
    * cq(k)(x) = round(cos(π·(2x+1)·k / 32) · 1e6), k < 8, x < 16. */
  val cq: Array[Array[Long]] = Array.tabulate(8, 16) { (k, x) =>
    math.round(math.cos(math.Pi * (2 * x + 1) * k / 32.0) * 1e6)
  }

  /** The cq table as a DuckDB list-of-lists literal, so the oracle SQL
    * is generated from the SAME numbers the expression multiplies by. */
  def cqSqlLiteral: String =
    cq.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "phash63", exprs => PHash63(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pgm_phash63", exprs => PgmPHash63(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pgm_grad_hex", exprs => PgmGradHex(exprs.head), "built-in")
  }

  def phash63(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("phash63", payload)

  def pgmPhash63(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("pgm_phash63", payload)

  def pgmGradHex(payload: Column): Column =
    org.apache.spark.sql.functions.call_function("pgm_grad_hex", payload)
}

/** pHash over a GENUINELY DECODED image: the payload is a binary P5 PGM
  * (the simplest real raster container — `P5 <w> <h> <maxval≤255>` header
  * then w·h raw grayscale bytes), parsed by a strict embedded decoder,
  * nearest-neighbor downsampled to the 16×16 grid
  * (p16(r,c) = img[⌊r·h/16⌋][⌊c·w/16⌋] — the floor-index map the oracle
  * reproduces), then run through the SAME [[PHash63.hashRaster]] DCT /
  * median / bit-pack as the byte-wrap arm. This closes the round-9 decode
  * seam: the perceptual math is exercised on image-shaped rasters, and a
  * header/stride/off-by-one bug in the decoder breaks the cross-engine
  * hash compare (the oracle computes the raster from the pixel formula,
  * not from the container). Malformed payloads → null, not an exception —
  * corrupt media must quarantine, not kill the scan (F1 discipline).
  * Grammar is strict by design: single-space separators, no comment
  * lines, maxval ≤ 255 — a fixture container, not a general codec. */
case class PgmPHash63(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PgmPHash63.hashPgm(v.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        java.lang.Long r = graft.plans.PgmPHash63.hashPgm(${c.value});
        if (r != null) { ${ev.isNull} = false; ${ev.value} = r.longValue(); }
      }""")
  }
  override def prettyName: String = "pgm_phash63"
  override protected def withNewChildInternal(c: Expression): PgmPHash63 =
    copy(child = c)
}

object PgmPHash63 {
  /** Strict P5 parse → 16×16 nearest-neighbor raster → [[PHash63
    * .hashRaster]]. Returns null (boxed) on any malformed input. */
  def hashPgm(bytes: Array[Byte]): java.lang.Long = {
    val n = bytes.length
    if (n < 7 || bytes(0) != 'P' || bytes(1) != '5') return null
    var pos = 2
    def readInt(): Long = {
      // exactly one whitespace byte, then 1+ digits
      if (pos >= n || !Character.isWhitespace(bytes(pos).toChar))
        return -1L
      pos += 1
      var v = 0L
      var digits = 0
      while (pos < n && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > 1000000L) return -1L // reject absurd dims early
        pos += 1
        digits += 1
      }
      if (digits == 0) -1L else v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return null
    // single whitespace byte terminates the header
    if (pos >= n || !Character.isWhitespace(bytes(pos).toChar)) return null
    pos += 1
    if (n - pos < w * h) return null
    val p = new Array[Long](256)
    var r = 0
    while (r < 16) {
      val sr = r * h / 16
      var c = 0
      while (c < 16) {
        val sc = c * w / 16
        p(r * 16 + c) = (bytes(pos + (sr * w + sc).toInt) & 0xFF).toLong
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(PHash63.hashRaster(p))
  }
}

/** Brightness-robust gradient feature over a GENUINELY DECODED P5 PGM:
  * strict parse (same grammar as [[PgmPHash63]]), then the row-major
  * byte gradient g(i) = (p(i+1) − p(i)) mod 256 rendered as a lowercase
  * hex string — the SimHash leg's raster feature. Raw byte shingles are
  * NOT brightness-robust (a +8 shift changes every shingle), while the
  * gradient is invariant under constant shifts except where clamping at
  * 255 bends it — exactly the small controlled divergence a near-dup
  * sketch should absorb. Downstream the string feeds the SAME 4-byte
  * (8-hex-char) shingle → simhash60 → 15-bit-chunk blocking pipeline as
  * the text/media SimHash arms; the oracle rebuilds the identical hex
  * from the pixel formula, so any decode/stride bug breaks the compare.
  * Malformed payloads → null (quarantine, don't kill the scan). */
case class PgmGradHex(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PgmGradHex.gradHex(v.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${c.isNull}) {
        UTF8String r = graft.plans.PgmGradHex.gradHex(${c.value});
        if (r != null) { ${ev.isNull} = false; ${ev.value} = r; }
      }""")
  }
  override def prettyName: String = "pgm_grad_hex"
  override protected def withNewChildInternal(c: Expression): PgmGradHex =
    copy(child = c)
}

object PgmGradHex {
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  /** Strict P5 parse → full-resolution row-major gradient hex. Null on
    * any malformed input (same rejection rules as [[PgmPHash63]]). */
  def gradHex(bytes: Array[Byte])
      : org.apache.spark.unsafe.types.UTF8String = {
    val n = bytes.length
    if (n < 7 || bytes(0) != 'P' || bytes(1) != '5') return null
    var pos = 2
    def readInt(): Long = {
      if (pos >= n || !Character.isWhitespace(bytes(pos).toChar))
        return -1L
      pos += 1
      var v = 0L
      var digits = 0
      while (pos < n && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > 1000000L) return -1L
        pos += 1
        digits += 1
      }
      if (digits == 0) -1L else v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return null
    if (pos >= n || !Character.isWhitespace(bytes(pos).toChar)) return null
    pos += 1
    val len = w * h
    if (len > 1000000L || n - pos < len) return null
    val m = len.toInt - 1
    if (m <= 0) return null
    val out = new Array[Byte](m * 2)
    var i = 0
    while (i < m) {
      val g = (bytes(pos + i + 1) - bytes(pos + i)) & 0xFF
      out(i * 2) = HEX(g >>> 4)
      out(i * 2 + 1) = HEX(g & 0xF)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
}
