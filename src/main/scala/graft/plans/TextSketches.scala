package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
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
  *
  * Hashing is PORTABLE by design: every hash bottoms out in
  * `PortableHash.h60` — the first 60 bits of the md5 of the UTF-8 string —
  * which DuckDB reproduces exactly as
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`. That makes the whole sketch
  * family (MinHash signatures, LSH bands, SimHash) verifiable against a
  * DuckDB oracle, not just rows-only checked. The engine-quality tradeoff
  * (md5 is ~3× slower than murmur3) is confined to one function and only
  * paid once per token/shingle.
  */
object PortableHash {
  /** Mersenne prime 2^31-1: modulus of the MinHash permutation family. */
  val P: Long = 2147483647L

  /** Affine-permutation coefficients for seed i, derived from the portable
    * hash of a per-seed tag (the same trick `LshBucket` uses for its
    * hyperplanes). They MUST be pseudo-independent across seeds: the
    * earlier `(i+1)·const mod P` family made every permutation a scalar
    * multiple of one per-element value — perm_i(h) = (i+1)·(c1·h+c2) —
    * so a single element with small (c1·h+c2) won the min for most seeds
    * at once, biasing MinHash estimates to ~20× the true Jaccard and
    * correlating every LSH band. Hash-derived coefficients restore the
    * per-seed independence the estimator's error bound assumes. Emitted as
    * literals into the DuckDB oracle SQL (SparkEntry builds the literal
    * arrays from these functions, so the two sides cannot drift). */
  def a(i: Int): Long = {
    val v = h60(UTF8String.fromString(s"minhash-a:$i")) % P
    if (v == 0L) 1L else v
  }
  def b(i: Int): Long = h60(UTF8String.fromString(s"minhash-b:$i")) % P

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes): big-endian long of the first 8 digest
    * bytes, shifted right 4 — identical to parsing the first 15 hex chars
    * of the digest. Always non-negative. */
  def h60(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, offset, len)
    val out = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def h60(s: UTF8String): Long = {
    val bytes = s.getBytes
    h60(bytes, 0, bytes.length)
  }
}

/** MinHash signature over array<string> TOKENS: word `nGram`-shingles are
  * assembled inline (space-joined, byte-level — no per-shingle Column
  * machinery), then for seeds 0..k-1 the signature is
  * min over shingles of (a_i * (h60(shingle) mod P) + b_i) mod P.
  * Returns array<bigint> of length k (null input → null, fewer than nGram
  * tokens → P-filled sentinel signature). Duplicate shingles need no
  * dedup — min() is idempotent. Portable: DuckDB computes the identical
  * value with md5 + list_min (see SparkEntry's q_minhash_signatures
  * oracle). */
case class MinHashSig(child: Expression, k: Int, nGram: Int = 3)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val as: Array[Long] = Array.tabulate(k)(PortableHash.a)
  private lazy val bs: Array[Long] = Array.tabulate(k)(PortableHash.b)
  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], k, nGram, as, bs)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // one static call per row; coefficient arrays ride along as
    // broadcast-once reference objects (the JaroWinkler discipline)
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashSig.sig($c, $k, $nGram, " +
        s"$asRef, $bsRef);")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  /** Per-row kernel shared by the interpreted and generated paths. */
  def sig(arr: ArrayData, k: Int, nGram: Int,
          as: Array[Long], bs: Array[Long]): ArrayData = {
    val P = PortableHash.P
    val n = arr.numElements()
    val mins = Array.fill(k)(P)
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      tokBytes(i) = if (s == null) Array.emptyByteArray else s.getBytes
      i += 1
    }
    i = 0
    while (i <= n - nGram) {
      var len = nGram - 1
      var j = 0
      while (j < nGram) { len += tokBytes(i + j).length; j += 1 }
      val sh = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < nGram) {
        if (j > 0) { sh(off) = ' '.toByte; off += 1 }
        val tb = tokBytes(i + j)
        System.arraycopy(tb, 0, sh, off, tb.length)
        off += tb.length
        j += 1
      }
      val base = PortableHash.h60(sh, 0, sh.length) % P
      var seed = 0
      while (seed < k) {
        val v = (as(seed) * base + bs(seed)) % P
        if (v < mins(seed)) mins(seed) = v
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Distinct word n-gram shingles over array<string> tokens, assembled in
  * one byte-level JVM loop per row. Same SET of values as the HOF
  * reference `TextFns.shingles` (array_distinct ∘ transform ∘ concat_ws),
  * which walks an interpreted expression tree per element — measured ~17 s
  * for the sf0.1 corpus on a cold JVM (the generic evaluator only becomes
  * fast once C2 happens to compile it) vs ~0.3 s here, deterministically.
  * Fewer than n tokens → empty array, matching the reference's guard.
  * `distinct = false` keeps every occurrence in order (`word_ngrams`) —
  * the multiplicity-preserving form n-gram language models need. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShingles.shingles($c, $n, $distinct);")
  override def prettyName: String =
    if (distinct) "word_shingles" else "word_ngrams"
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  /** Per-row kernel shared by the interpreted and generated paths. */
  def shingles(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = toks.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val all = if (distinct) null else new Array[Any](m - n + 1)
      val space = UTF8String.fromString(" ")
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) {
          val t = toks.getUTF8String(i + k)
          parts(k) = if (t == null) UTF8String.EMPTY_UTF8 else t
          k += 1
        }
        val gram = UTF8String.concatWs(space, parts: _*)
        if (distinct) seen.add(gram) else all(i) = gram
        i += 1
      }
      if (distinct)
        new GenericArrayData(
          seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
      else new GenericArrayData(all)
    }
  }
}

/** Every overlapping character n-gram of a string, multiplicity
  * preserved, in one JVM loop per row — the char-level sibling of
  * [[WordShingles]] for entropy-rate / language-model-over-characters
  * work, where the HOF composition `transform(sequence(1, length(s)−n+1),
  * i -> substring(s, i, n))` would walk an interpreted lambda tree per
  * character of the corpus (the exact hazard WordShingles was built to
  * kill; same cure). Positions are CODE POINTS (UTF8String.substring),
  * matching SQL substr semantics on both engines. Shorter-than-n input →
  * empty array. */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharNgrams.ngrams($c, $n);")
  override def prettyName: String = "char_ngrams"
  override protected def withNewChildInternal(c: Expression): CharNgrams =
    copy(child = c)
}

object CharNgrams {
  /** Per-row kernel shared by the interpreted and generated paths. */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val m = s.numChars()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        out(i) = s.substring(i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Non-overlapping n-token chunks, space-joined (the unit of chunk-level
  * corpus dedup). Matches the HOF composition
  * `transform(sequence(0, max(ceil(m/n)-1, 0)), i -> concat_ws(' ',
  * slice(toks, i*n+1, n)))` — including one empty chunk for empty input —
  * but in a single byte-level loop per row: HOF lambdas are interpreted
  * (non-codegen), and on a cold JVM the lambda-tree walk dominated the
  * chunk query's runtime exactly as it did for shingle assembly. */
case class TokenChunks(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenChunks.chunks(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenChunks.chunks($c, $n);")
  override def prettyName: String = "token_chunks"
  override protected def withNewChildInternal(c: Expression): TokenChunks =
    copy(child = c)
}

object TokenChunks {
  /** Per-row kernel shared by the interpreted and generated paths. */
  def chunks(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val nChunks = math.max((m + n - 1) / n, 1)
    val out = new Array[Any](nChunks)
    val space = UTF8String.fromString(" ")
    var c = 0
    while (c < nChunks) {
      val from = c * n
      val len = math.min(n, m - from)
      if (len <= 0) out(c) = UTF8String.EMPTY_UTF8
      else {
        val parts = new Array[UTF8String](len)
        var k = 0
        while (k < len) {
          val t = toks.getUTF8String(from + k)
          parts(k) = if (t == null) UTF8String.EMPTY_UTF8 else t
          k += 1
        }
        out(c) = UTF8String.concatWs(space, parts: _*)
      }
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Canonicalized co-occurrence pairs over array<string> tokens: for every
  * offset o in 1..window, the pair (t[i], t[i+o]) space-joined as
  * "min max" (binary UTF8 order, the comparison least/greatest use), with
  * self-pairs dropped — the TextRank graph unit. Value-identical to the
  * HOF reference in TextAnalysis.textrank (offset-shifted transform +
  * least/greatest + self-filter, multiplicity preserved), which walks an
  * interpreted lambda tree per element — measured ~5 s cold for the sf0.1
  * corpus vs sub-second here (same hazard, same cure as [[WordShingles]]).
  * Pair ordering in the output array is (offset, position), which is
  * irrelevant downstream: the pairs feed a commutative count aggregate. */
case class CoocPairs(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CoocPairs.pairs(input.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CoocPairs.pairs($c, $window);")
  override def prettyName: String = "cooc_pairs"
  override protected def withNewChildInternal(c: Expression): CoocPairs =
    copy(child = c)
}

object CoocPairs {
  /** Per-row kernel shared by the interpreted and generated paths. */
  def pairs(toks: ArrayData, window: Int): ArrayData = {
    val m = toks.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val space = UTF8String.fromString(" ")
    var o = 1
    while (o <= window) {
      var i = 0
      while (i < m - o) {
        val a0 = toks.getUTF8String(i)
        val b0 = toks.getUTF8String(i + o)
        val a = if (a0 == null) UTF8String.EMPTY_UTF8 else a0
        val b = if (b0 == null) UTF8String.EMPTY_UTF8 else b0
        val c = a.compareTo(b)
        if (c != 0) { // self-pairs carry no ranking signal (see textrank)
          val (lo, hi) = if (c < 0) (a, b) else (b, a)
          out += UTF8String.concatWs(space, lo, hi)
        }
        i += 1
      }
      o += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** 60-bit SimHash over array<string> tokens: per-bit ±1 votes of each
  * token's h60, bit set where votes >= 0. Portable to DuckDB bit ops. */
case class SimHash60(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash60.hash(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash60.hash($c);")
  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

object SimHash60 {
  /** Per-row kernel shared by the interpreted and generated paths. */
  def hash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = PortableHash.h60(s)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
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
      "simhash60", exprs => SimHash60(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams",
      exprs => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(), distinct = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_chunks",
      exprs => TokenChunks(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cooc_pairs",
      exprs => CoocPairs(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams",
      exprs => CharNgrams(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }

  def word_shingles(tokens: Column, n: Int): Column =
    call_function("word_shingles", tokens,
      org.apache.spark.sql.functions.lit(n))

  def word_ngrams(tokens: Column, n: Int): Column =
    call_function("word_ngrams", tokens,
      org.apache.spark.sql.functions.lit(n))

  def token_chunks(tokens: Column, n: Int): Column =
    call_function("token_chunks", tokens,
      org.apache.spark.sql.functions.lit(n))

  def char_ngrams(text: Column, n: Int): Column =
    call_function("char_ngrams", text,
      org.apache.spark.sql.functions.lit(n))

  def cooc_pairs(tokens: Column, window: Int): Column =
    call_function("cooc_pairs", tokens,
      org.apache.spark.sql.functions.lit(window))

  def minhash_sig(tokens: Column, k: Int): Column =
    call_function("minhash_sig", tokens,
      org.apache.spark.sql.functions.lit(k))

  def simhash60(tokens: Column): Column = call_function("simhash60", tokens)
}
