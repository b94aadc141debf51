package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup clustering: candidate pairs (from MinHash/SimHash/embedding
  * blocking — any edge source) → connected components → one canonical doc
  * per cluster. The step a real dedup pipeline runs AFTER pair generation:
  * near-duplication is transitive in effect (A≈B, B≈C ⇒ keep one of
  * {A,B,C}), so keeping "one per pair" over-deletes and under-deletes.
  *
  * Algorithm: iterative min-label propagation. Each round every node takes
  * the minimum component id among itself and its neighbours — one shuffled
  * join + one groupBy per round, lineage cut by localCheckpoint so plans
  * don't grow with iterations. Rounds needed = graph diameter; near-dup
  * graphs are unions of small cliques/stars (diameter ≲ 3), so 3–4 rounds
  * close them. For adversarial long-chain graphs at the 100 TB design
  * point, switch to alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce"), which converges
  * in O(log n) rounds with the same join+groupBy building blocks.
  */
object DedupCluster {

  /** Connected components of the undirected graph given as an (a, b) pair
    * list. Returns (node, comp) where comp = min node id reachable. Nodes
    * appearing in no edge are absent — coalesce with the identity label
    * downstream. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint(false)
    // Seed with min(self, neighbours) — equivalent to one propagation round
    // for free (no join), so star/clique graphs often converge in 1 pass.
    // Checkpoints in the loop are LAZY: the convergence checksum right
    // after is the action that materializes each round — one Spark job per
    // round instead of an eager-checkpoint job plus a checksum job (the
    // rounds are fixed-cost-dominated; halving the job count halves the
    // loop's overhead at any graph size).
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("node"),
        least(col("mn"), col("src")).as("comp")).localCheckpoint(false)
    // Labels only ever decrease, so sum(comp) is a monotone convergence
    // witness: unchanged sum ⇔ unchanged labels. One scalar per round
    // instead of a join + isEmpty re-execution. Summed as decimal(38,0):
    // node ids may be hash-derived 60-bit values, and a bigint sum over
    // billions of those overflows (ANSI mode would throw mid-iteration) —
    // 38 digits hold any realistic id domain times any realistic node count.
    def checksum(l: DataFrame): java.math.BigDecimal = {
      val r = l.agg(sum(col("comp").cast("decimal(38,0)"))).collect()(0)
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO // null ⇔ no edges at all
      else r.getDecimal(0)
    }
    var prevSum = checksum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("comp"))
      val next = labels.union(msgs).groupBy("node")
        .agg(min(col("comp")).as("comp")).localCheckpoint(false)
      val s = checksum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    labels
  }

  /** Prefix-dup clustering over `documents`: docs sharing a 64- or 32-char
    * text prefix are candidate duplicates; components of that graph get a
    * cluster id (min doc_id) and the id-holder is flagged canonical.
    * Both edge types are cheap shuffled self-equi-joins on a short key —
    * never a text × text comparison. */
  def prefixDupClusters(docs: DataFrame): DataFrame = {
    def prefixEdges(n: Int): DataFrame = {
      val k = docs.select(substring(col("text"), 1, n).as("k"),
        col("doc_id"))
      k.select(col("k"), col("doc_id").as("a"))
        .join(k.select(col("k"), col("doc_id").as("b")), "k")
        .filter(col("a") < col("b"))
        .select("a", "b")
    }
    val comps = connectedComponents(prefixEdges(64).union(prefixEdges(32)))
    docs.join(comps, docs("doc_id") === comps("node"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical",
        (col("doc_id") === col("cluster_id")).cast("bigint"))
  }
}
