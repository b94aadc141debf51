package graft

import org.apache.spark.sql.functions._

/** Round-26 ops: the decoded-PGM pHash arm (VERDICT r9 item 5) — the
  * perceptual-hash recall claim exercised on genuinely decoded
  * image-shaped rasters, not byte-wrap stubs. */
class Round26OpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.plans.{PHash63, PgmPHash63}

  private def pgm(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val header = s"P5 $w $h 255\n".getBytes("US-ASCII")
    header ++ px.map(_.toByte)
  }

  test("PgmPHash63: a 16x16 P5 decodes to exactly the raster pHash") {
    val px = Array.tabulate(256)(i => (i * 37 + 11) % 256)
    val expected = PHash63.hashRaster(px.map(_.toLong))
    assert(PgmPHash63.hashPgm(pgm(16, 16, px)) == expected)
  }

  test("PgmPHash63: 32x32 nearest-neighbor downsample picks img[2r][2c]") {
    val img = Array.tabulate(32 * 32)(i => (i * 7 + 3) % 256)
    val p16 = Array.tabulate(256) { i =>
      val r = i / 16; val c = i % 16
      img((2 * r) * 32 + 2 * c).toLong
    }
    assert(PgmPHash63.hashPgm(pgm(32, 32, img)) == PHash63.hashRaster(p16))
  }

  test("PgmPHash63: malformed payloads yield null, never an exception") {
    val good = pgm(16, 16, Array.fill(256)(128))
    assert(PgmPHash63.hashPgm(good) != null)
    assert(PgmPHash63.hashPgm("P6 16 16 255\n".getBytes) == null) // magic
    assert(PgmPHash63.hashPgm(good.dropRight(1)) == null) // truncated
    assert(PgmPHash63.hashPgm("P5 16 16 65535\n".getBytes ++
      Array.fill[Byte](512)(0)) == null) // 16-bit maxval unsupported
    assert(PgmPHash63.hashPgm("P5 0 16 255\n".getBytes) == null)
    assert(PgmPHash63.hashPgm(Array.emptyByteArray) == null)
    assert(PgmPHash63.hashPgm("P5".getBytes) == null)
    // and through the SQL surface: null out, no crash
    PHash63.register(spark)
    val out = Seq(Array[Byte]('P', '5'))
      .toDF("b").selectExpr("pgm_phash63(b) AS h").collect()
    assert(out.head.isNullAt(0))
  }

  test("mediaPHashDecoded + mediaNearDupPgm: every constructed " +
    "brightness-shift pair is recovered and flagged as a true pair") {
    // ids 0,1,10,11,...,90,91 survive the %10<2 filter: 10 true pairs
    val docs = (0L until 100L).map(i => (i, s"doc $i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ph = graft.ext.Multimodal.mediaPHashDecoded(docs).collect()
    assert(ph.length == 20)
    assert(ph.forall(!_.isNullAt(1))) // every payload decoded
    val pairs = graft.ext.Multimodal.mediaNearDupPgm(docs).collect()
    val truePairs = pairs.filter(_.getAs[Int]("is_true_pair") == 1)
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b")))
      .toSet
    // recall over the 10 known (10k, 10k+1) ground-truth pairs
    val expected = (0 until 10).map(k => (10L * k, 10L * k + 1)).toSet
    val recall = expected.count(truePairs.contains).toDouble / 10.0
    assert(recall >= 0.9, s"known-pair recall $recall; got $truePairs")
    // recovered true pairs sit at small Hamming distance (a brightness
    // shift moves DC, barely AC)
    pairs.filter(_.getAs[Int]("is_true_pair") == 1).foreach { r =>
      assert(r.getAs[Int]("hamming") <= 12)
    }
  }
}
