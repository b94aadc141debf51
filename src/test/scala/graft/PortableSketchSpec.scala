package graft

import org.apache.spark.sql.functions._
import graft.ext.TextFns
import graft.plans.{PortableHash, TextSketches, VectorOps}

/** The portability contract behind the sketch oracles: the native
  * expressions (tight JVM loops), the HOF reference formulations (Column
  * algebra), and the JVM-side PortableHash all compute the SAME values —
  * which is what lets DuckDB reproduce them from md5 in the oracle SQL. */
class PortableSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .limit(50).localCheckpoint()

  test("portableH60 column == PortableHash.h60 JVM value") {
    val samples = Seq("hello", "a b c", "", "MinHash & SimHash, portably!")
    val viaCol = samples.toDF("s")
      .select(TextFns.portableH60(col("s")).as("h"))
      .as[Long].collect().toSeq
    val viaJvm = samples.map(s =>
      PortableHash.h60(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(viaCol == viaJvm)
  }

  test("shingles yield empty for fewer than n tokens (no phantom partials)") {
    val df = Seq((1L, "a b"), (2L, "a"), (3L, ""), (4L, "a b c d"))
      .toDF("id", "text")
    val out = df.select(col("id"),
        size(TextFns.shingles(TextFns.tokens(col("text")))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 2))
  }

  test("native minhash_sig == HOF reference over explicit shingles") {
    TextSketches.register(spark)
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val native = base
      .select(col("doc_id"), TextSketches.minhash_sig(col("toks"), 16).as("sig"))
    val hof = base
      .select(col("doc_id"), TextFns.shingles(col("toks")).as("sh"))
      .select(col("doc_id"), TextFns.minhashSignature(col("sh"), 16).as("sig"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("native word_shingles == HOF shingles as a SET, incl. short docs") {
    TextSketches.register(spark)
    import org.apache.spark.sql.functions.array_sort
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    for (n <- Seq(2, 3, 5)) {
      val native = base.select(col("doc_id"),
        array_sort(TextSketches.word_shingles(col("toks"), n)).as("sh"))
      val hof = base.select(col("doc_id"),
        array_sort(TextFns.shingles(col("toks"), n)).as("sh"))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        s"n=$n")
    }
    // fewer than n tokens → empty array on both paths
    import spark.implicits._
    val tiny = Seq((1L, "only two")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val e1 = tiny.select(TextSketches.word_shingles(col("toks"), 3))
      .collect()(0).getSeq[String](0)
    val e2 = tiny.select(TextFns.shingles(col("toks"), 3))
      .collect()(0).getSeq[String](0)
    assert(e1.isEmpty && e2.isEmpty)
  }

  test("native cooc_pairs == HOF offset-pair reference as a MULTISET") {
    TextSketches.register(spark)
    // the HOF formulation textrank used before the native expression:
    // offset-o pairs via transform + element_at, self-pairs filtered,
    // least/greatest canonicalization, multiplicity preserved
    def hofPairs(window: Int) = {
      def offsetPairs(o: Int) = {
        val built = transform(sequence(lit(1), size(col("toks")) - o), i =>
          struct(element_at(col("toks"), i).as("a"),
            element_at(col("toks"), i + o).as("b")))
        when(size(col("toks")) > o, built)
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
      }
      docs.select(TextFns.tokens(col("text")).as("toks"))
        .select(explode(concat((1 to window).map(offsetPairs): _*)).as("pr"))
        .filter(col("pr.a") =!= col("pr.b"))
        .select(concat_ws(" ", least(col("pr.a"), col("pr.b")),
          greatest(col("pr.a"), col("pr.b"))).as("pair"))
    }
    for (w <- Seq(1, 2, 3)) {
      val native = docs
        .select(explode(TextSketches.cooc_pairs(
          TextFns.tokens(col("text")), w)).as("pair"))
      val hof = hofPairs(w)
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        s"window=$w")
    }
    // short/self-pair edge cases: one token → no pairs; repeated token →
    // self-pairs dropped at every offset
    val tiny = Seq((1L, "solo"), (2L, "dup dup dup"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = tiny
      .select(col("doc_id"), TextSketches.cooc_pairs(
        TextFns.tokens(col("text")), 2).as("prs"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).isEmpty && got(2L).isEmpty && got(3L) == Seq("x y"))
  }

  test("native simhash60 == HOF reference over token hashes") {
    TextSketches.register(spark)
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val native = base
      .select(col("doc_id"), TextSketches.simhash60(col("toks")).as("sh"))
    val hof = base
      .select(col("doc_id"), TextFns.tokenHashes(col("toks")).as("th"))
      .select(col("doc_id"), TextFns.simhash60(col("th")).as("sh"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("LshBucket == independent recompute from the plane formula") {
    VectorOps.register(spark)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(20)
    val got = emb.select(col("vec_id"),
        VectorOps.lsh_bucket(col("embedding"), 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    def plane(b: Int, d: Int): Double = {
      val h = PortableHash.h60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$b:$d"))
      (h % 2000001L - 1000000L) / 1.0e6
    }
    val exp = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().map { case (id, e) =>
        var out = 0L
        for (b <- 0 until 8) {
          var acc = 0.0
          for (d <- e.indices) acc += e(d).toDouble * plane(b, d)
          if (acc >= 0.0) out |= (1L << b)
        }
        id -> out
      }.toMap
    assert(got == exp)
  }

  test("PHash63 == independent BigInt recompute; structural invariants") {
    graft.plans.PHash63.register(spark)
    // independent reference: same quantized table, BigInt accumulation
    // throughout — a Long overflow anywhere in the expression's two-stage
    // fold would diverge here
    def ref(bytes: Array[Byte]): Long = {
      val cq = graft.plans.PHash63.cq
      val n = bytes.length
      val p = Array.tabulate(256)(i =>
        if (n == 0) BigInt(0) else BigInt(bytes(i % n) & 0xFF))
      val coeffs = (0 until 8).flatMap { u =>
        (0 until 8).map { v =>
          (for (r <- 0 until 16; c <- 0 until 16)
            yield p(r * 16 + c) * cq(v)(c) * cq(u)(r)).sum
        }
      }
      val med = coeffs.drop(1).sorted.apply(31)
      (1 until 64).foldLeft(0L) { (acc, i) =>
        if (coeffs(i) > med) acc | (1L << (i - 1)) else acc
      }
    }
    val samples = Seq("hello perceptual world", "", "a",
      "the quick brown fox jumps over the lazy dog " * 10,
      "graft phash test 12345!@#")
    val got = samples.toDF("s")
      .select(graft.plans.PHash63.phash63(encode(col("s"), "UTF-8")))
      .as[Long].collect().toSeq
    val exp = samples.map(s => ref(s.getBytes("UTF-8")))
    assert(got == exp)
    // empty payload: zero grid -> zero coefficients -> no bit exceeds
    // the (zero) median
    assert(ref(Array.emptyByteArray) == 0L)
    // byte-wrap downsample invariant: s ++ s rasterizes identically
    val dup = Seq(("abcdwxyz", "abcdwxyzabcdwxyz")).toDF("a", "b")
      .select(graft.plans.PHash63.phash63(encode(col("a"), "UTF-8")),
        graft.plans.PHash63.phash63(encode(col("b"), "UTF-8")))
      .as[(Long, Long)].collect()(0)
    assert(dup._1 == dup._2)
  }
}
