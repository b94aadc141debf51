package graft

/** Round-24-of-build additions: the LSH-bucketed bitext-mining scale
  * sibling and its recall-vs-exact audit. */
class Round24OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bitextMineLsh: nBits=0 degenerates to the exact miner with " +
    "recall 1") {
    // zero hyperplanes -> every vector lands in bucket 0 -> the candidate
    // frame IS the full A×B frame -> mined pairs, sims, and margins must
    // equal bitextMine's bit-for-bit, and the audit must report itself
    // as perfect
    val rnd = new scala.util.Random(24001)
    val emb = (0L until 40L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val exact = graft.ext.Similarity.bitextMine(emb).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
        r.getAs[Double]("sim"), r.getAs[Double]("margin")))
    val lsh = graft.ext.Similarity.bitextMineLsh(emb, nBits = 0).collect()
    assert(lsh.nonEmpty)
    assert(lsh.map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"),
      r.getAs[Double]("sim"), r.getAs[Double]("margin"))).toSeq ==
      exact.toSeq)
    lsh.foreach { r =>
      assert(r.getAs[Long]("n_exact_pairs") == exact.length.toLong)
      assert(r.getAs[Double]("recall_vs_exact") == 1.0)
    }
  }

  test("bitextMineLsh: bucketing keeps sides/injectivity and the audit " +
    "columns are consistent with the exact miner") {
    val rnd = new scala.util.Random(24002)
    val emb = (0L until 60L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val exactPairs = graft.ext.Similarity.bitextMine(emb).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"))).toSet
    val out = graft.ext.Similarity.bitextMineLsh(emb, nBits = 2).collect()
    assert(out.nonEmpty)
    val srcs = out.map(_.getAs[Long]("src_id"))
    val dsts = out.map(_.getAs[Long]("dst_id"))
    assert(srcs.distinct.length == srcs.length)
    assert(dsts.distinct.length == dsts.length)
    assert(srcs.forall(_ % 2 == 0) && dsts.forall(_ % 2 == 1))
    val mined = out.map(r => (r.getAs[Long]("src_id"),
      r.getAs[Long]("dst_id"))).toSet
    val hits = mined.intersect(exactPairs).size
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact_pairs") == exactPairs.size.toLong)
      assert(r.getAs[Double]("recall_vs_exact") ==
        r6(hits.toDouble / exactPairs.size))
      assert(r.getAs[Double]("margin") > 0.0)
    }
  }
}
