package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics over relational edge lists — the second
  * distributed-iteration family beside connected components
  * (graft.ext.DedupCluster). No graph library: each iteration is a plain
  * join + aggregate, which is exactly how Pregel-style systems execute on
  * a relational engine anyway.
  */
object GraphAnalytics {

  /** Weighted PageRank over an undirected edge list, fixed iteration
    * count. Each step: contribution = rank·w/outw along every directed
    * edge, summed per target IN DECIMAL (order-stable — the float sums
    * would drift across partition orders and engines), then damped.
    * The rank frame is node-cardinality, so it carries NO broadcast hint:
    * AQE sees its (localCheckpoint-materialized) size each iteration and
    * broadcasts it only while it actually fits — at catalog scale the
    * join degrades gracefully to a hash join on `src` instead of OOMing
    * executors on a forced node-frame broadcast.
    * Iterations are unrolled logical plans; `localCheckpoint` truncates
    * the lineage each round so plan size stays constant (same pattern as
    * DedupCluster's label propagation). Loop-STATE checkpoints are LAZY
    * (`localCheckpoint(false)`, the DedupCluster discipline): the next
    * round's job materializes them in-line, deleting one scheduling
    * round-trip per iteration — measured 8.9 → 2.2 s cold / 1.9 → 1.7 s
    * steady for this operator at sf0.1 driver conditions. Base frames
    * (`e`, `nodes`) stay EAGER so their materialized sizes feed AQE's
    * static broadcast decisions. No dangling-node term: an undirected
    * edge list gives every node at least one out-edge. */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
               iterations: Int = 3): DataFrame = {
    // edges: (src, dst, w) — already symmetric for undirected graphs
    val outw = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    val e = edges.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("frac"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("id")).distinct().localCheckpoint(false)
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations)
      ranks = rankStep(e, nodes, n, ranks, damping).localCheckpoint(false)
    ranks.select(col("id"), round(col("rank"), 9).as("rank"))
  }

  /** One damped PageRank iteration. Deliberately hint-free (see above):
    * exposed so PlanShapeSpec can prove the rank join carries no
    * hard-coded node-cardinality broadcast. */
  private[graft] def rankStep(e: DataFrame, nodes: DataFrame, n: Long,
                              ranks: DataFrame, damping: Double): DataFrame = {
    val contrib = e.join(ranks, e("src") === ranks("id"))
      .select(col("dst"),
        (col("rank") * col("frac")).cast("decimal(38,18)").as("c"))
      .groupBy("dst")
      .agg(sum(col("c")).cast("double").as("inflow"))
    nodes.join(contrib, nodes("id") === contrib("dst"), "left")
      .select(col("id"),
        (lit((1.0 - damping) / n) +
          lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
  }

  /** Per-node triangle counts over the support-floored co-purchase graph
    * — the clique-cohesion metric beside PageRank's centrality: how
    * interconnected a product's co-purchase neighborhood is. Edges are
    * canonical (a < b) pairs, so the a<b<c enumeration counts each
    * triangle exactly once; each triangle then credits all three corners.
    * The two self-joins run on the SIGNAL-sized pruned edge list (the
    * same ≥minSupport floor as the PageRank graph — 335× smaller than
    * the raw pair table at sf0.1), never on the corpus, and both key on
    * edge endpoints — plain hash joins that AQE sizes. */
  def coPurchaseTriangles(spark: SparkSession, sfDir: String,
                          k: Int = 20, minSupport: Long = 2L): DataFrame =
    triangleCounts(spark, sfDir, minSupport)
      .orderBy(col("n_triangles").desc, col("part"))
      .limit(k)

  /** Per-node triangle counts without the top-k cut — shared by the
    * triangle census and the clustering coefficient. */
  private def triangleCounts(spark: SparkSession, sfDir: String,
                             minSupport: Long): DataFrame = {
    val e = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    val tri = e
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy("part")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient 2T/(deg·(deg−1)) per node of the
    * support-floored co-purchase graph — how clique-like each product's
    * neighborhood is (1 = every pair of my neighbors also co-sells). The
    * degree frame is one aggregate over the pruned edge list; triangle
    * counts come from [[triangleCounts]]; the division is pure
    * integer-derived double arithmetic. Nodes with deg < 2 have no
    * possible triangle and are excluded (the ratio is undefined). */
  def clusteringCoefficient(spark: SparkSession, sfDir: String,
                            k: Int = 20,
                            minSupport: Long = 2L): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    val deg = pairs.select(col("a").as("part"))
      .unionAll(pairs.select(col("b").as("part")))
      .groupBy("part").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2)
    deg.join(triangleCounts(spark, sfDir, minSupport), Seq("part"), "left")
      .select(col("part"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        round(lit(2.0) * coalesce(col("n_triangles"), lit(0L))
          .cast("double") /
          (col("deg") * (col("deg") - lit(1))).cast("double"), 6)
          .as("clustering_coef"))
      .orderBy(col("clustering_coef").desc, col("part"))
      .limit(k)
  }

  /** Single-source BFS over the co-purchase graph — `rounds` relational
    * frontier expansions from the smallest part id in the (support-
    * floored) edge list. Each round: frontier ⋈ edges (hash join on the
    * node key), distinct, anti-join against the visited set — the
    * textbook Pregel step as plain relational ops, with localCheckpoint
    * keeping plan size constant (same pattern as [[pageRank]] and the
    * dedup label propagation). State is the visited set: node-sized,
    * hash-partitioned, never collected. Output is the per-hop census
    * (count, id range) — the reachability profile a recommender's
    * neighborhood expansion uses. */
  def coPurchaseBfs(spark: SparkSession, sfDir: String,
                    rounds: Int = 3, minSupport: Long = 2L): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    bfsHops(pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b"))),
      rounds)
  }

  /** Closeness + harmonic centrality of the top-degree co-purchase hubs
    * via bounded multi-source BFS — "how near is this hub to the whole
    * catalog", the recommender-seeding question [[coPurchaseBfs]]'s
    * single-source census stops short of. Seeds are the `k`
    * highest-degree nodes (degree DESC, id ASC — deterministic
    * TakeOrdered); `rounds` frontier expansions bound the horizon, so
    * the output is the centrality of the REACHED ball (deterministic
    * whether or not the graph is exhausted — both engines run the same
    * budget). closeness = n_reached / Σ dist over reached nodes;
    * harmonic = Σ 1/dist (robust to disconnection), each 1/d quantized
    * through DECIMAL so the sum is partition-order-independent.
    *
    * Scale shape: [[bfsHops]] per seed, fused — the visited state is
    * (src, node)-keyed, every round is one hash join + distinct +
    * anti-join, localCheckpoint keeps the plan flat; k seeds multiply
    * the state, never the edge list. */
  def closeness(spark: SparkSession, sfDir: String, k: Int = 5,
                rounds: Int = 4, minSupport: Long = 2L): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    closenessOf(
      pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b"))),
      k, rounds)
  }

  /** [[closeness]] over a prebuilt symmetric (a, b) edge frame — the
    * hand-graph-testable core (the [[bfsHops]] separation). */
  private[graft] def closenessOf(symEdges: DataFrame, k: Int,
                                 rounds: Int): DataFrame = {
    val edges = symEdges.localCheckpoint(false)
    val seeds = edges.groupBy("a").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("a")).limit(k)
      .select(col("a").as("src"))
      .localCheckpoint(false)
    var visited = seeds
      .select(col("src"), col("src").as("node"), lit(0L).as("hop"))
      .localCheckpoint(false)
    for (h <- 1 to rounds) {
      val frontier = visited.filter(col("hop") === (h - 1).toLong)
      val next = frontier.join(edges, col("node") === col("a"))
        .select(col("src"), col("b").as("node")).distinct()
        .join(visited.select(col("src").as("vs"), col("node").as("vn")),
          col("src") === col("vs") && col("node") === col("vn"),
          "left_anti")
        .select(col("src"), col("node"))
        .withColumn("hop", lit(h.toLong))
      visited = visited.unionAll(next).localCheckpoint(false)
    }
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    visited.groupBy("src")
      .agg((count(lit(1)) - 1L).as("n_reached"),
        sum(col("hop")).as("sum_dist"),
        sum(when(col("hop") > 0L,
            (lit(1.0) / d(col("hop"))).cast("decimal(28,12)"))
          .otherwise(lit(0).cast("decimal(28,12)"))).cast("double")
          .as("harm"))
      .select(col("src").cast("bigint").as("src"), col("n_reached"),
        col("sum_dist"),
        r6(when(col("sum_dist") > 0L,
          d(col("n_reached")) / d(greatest(col("sum_dist"), lit(1L))))
          .otherwise(lit(0.0))).as("closeness"),
        r6(col("harm")).as("harmonic_centrality"))
      .orderBy("src")
  }

  /** The BFS core over a symmetric (a, b) edge frame: seeds at min(a) and
    * reports the per-hop census. Separated from the co-purchase wrapper
    * so the frontier algebra is testable on hand graphs. */
  def bfsHops(symEdges: DataFrame, rounds: Int): DataFrame = {
    val edges = symEdges.localCheckpoint(false)
    var visited = edges.agg(min(col("a")).as("node"))
      .withColumn("hop", lit(0L))
      .localCheckpoint(false)
    for (k <- 1 to rounds) {
      val frontier = visited.filter(col("hop") === (k - 1).toLong)
      val next = frontier.join(edges, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(visited.select(col("node").as("vn")),
          col("node") === col("vn"), "left_anti")
        .withColumn("hop", lit(k.toLong))
      visited = visited.unionAll(next).localCheckpoint(false)
    }
    visited.groupBy("hop")
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).cast("bigint").as("min_node"),
        max(col("node")).cast("bigint").as("max_node"))
      .orderBy("hop")
  }

  /** PageRank of the co-purchase graph: parts as nodes, same-order
    * co-occurrence counts as edge weights (see
    * [[StarAnalytics.coPurchasePairs]] for the basket synthesis). Top-k
    * central parts — the "hub products" a recommender would seed with.
    * `minSupport` floors the edge weight (the standard association-rule
    * support cut, same as the PMI op): single-co-occurrence pairs are
    * noise AND dominate the pair count — at sf0.1 the floor shrinks the
    * edge list 335× (1.2M → 3.6k), turning the iteration cost from
    * corpus-sized to signal-sized. The counting pass still sees every
    * basket; only the graph is pruned. */
  def coPurchaseRank(spark: SparkSession, sfDir: String,
                     k: Int = 20, minSupport: Long = 2L): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
    val edges = pairs.select(col("part_a").as("src"),
        col("part_b").as("dst"), col("n_orders").as("w"))
      .union(pairs.select(col("part_b").as("src"),
        col("part_a").as("dst"), col("n_orders").as("w")))
    pageRank(edges)
      .orderBy(col("rank").desc, col("id"))
      .limit(k)
  }

  /** Iterative k-core peeling over a symmetric edge frame: each round
    * recomputes in-subgraph degrees and removes nodes below `k`
    * (including nodes isolated by earlier removals), for a fixed
    * `rounds` budget. Emits the per-round removal census plus a final
    * `rounds + 1` row for the surviving core — the coreness profile
    * that separates a catalog's connected backbone from the tail a
    * recommender can't anchor on. Fixed round count keeps the output
    * deterministic whether or not the peel has converged (both engines
    * run the same budget); rounds that remove nothing emit no row.
    *
    * Scale shape: same discipline as [[bfsHops]] — every step is a
    * node-keyed aggregate plus two semi joins, `localCheckpoint`
    * truncates lineage per round, and nothing node- or edge-sized ever
    * reaches the driver. */
  def kCorePeel(symEdges: DataFrame, k: Int = 2,
                rounds: Int = 3): DataFrame = {
    var edges = symEdges.localCheckpoint(false)
    var nodes = edges.select(col("a").as("node")).distinct()
      .localCheckpoint(false)
    var removed: DataFrame = null
    for (r <- 1 to rounds) {
      val keepIds = edges.groupBy(col("a").as("dn"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("dn"))
      val rem = nodes.join(keepIds, col("node") === col("dn"), "left_anti")
        .withColumn("round", lit(r.toLong))
      removed = (if (removed == null) rem else removed.unionAll(rem))
        .localCheckpoint(false)
      nodes = nodes.join(keepIds, col("node") === col("dn"), "left_semi")
        .localCheckpoint(false)
      edges = edges
        .join(keepIds, col("a") === col("dn"), "left_semi")
        .join(keepIds.select(col("dn").as("dn2")),
          col("b") === col("dn2"), "left_semi")
        .localCheckpoint(false)
    }
    removed.unionAll(nodes.withColumn("round", lit((rounds + 1).toLong)))
      .groupBy("round")
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).cast("bigint").as("min_node"),
        max(col("node")).cast("bigint").as("max_node"))
      .orderBy("round")
  }

  /** [[kCorePeel]] over the support-floored co-purchase graph. */
  def coPurchaseKCore(spark: SparkSession, sfDir: String, k: Int = 2,
                      rounds: Int = 3, minSupport: Long = 2L): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    kCorePeel(pairs.unionAll(pairs.select(col("b").as("a"),
      col("a").as("b"))), k, rounds)
  }

  /** Degree distribution of the (support-floored) co-purchase graph
    * plus the discrete power-law tail exponent via the Clauset–Shalizi–
    * Newman MLE `α = 1 + n / Σ ln(dᵢ/(dmin−½))` over nodes with
    * degree ≥ dmin. Whether the tail is heavy (α ≲ 2.5) decides if
    * degree-targeted skew handling (salting the hubs) is worth wiring
    * into the co-purchase pipeline at all.
    *
    * Scale shape: degrees are one node-keyed aggregate; the histogram
    * is a degree-keyed aggregate over a bounded domain; the MLE's log
    * sum accumulates DECIMAL(28,12)-cast addends (each `ln` is the same
    * IEEE double both engines produce — the entropy/logprob precedent)
    * so the sum is partition-order-independent; the scalar rides back
    * on a one-row crossJoin. */
  def degreeDistribution(spark: SparkSession, sfDir: String,
                         minSupport: Long = 2L,
                         dmin: Long = 2L): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    val deg = pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val hist = deg.groupBy("deg").agg(count(lit(1)).as("n_nodes"))
    val mle = deg.filter(col("deg") >= dmin)
      .agg(count(lit(1)).as("n_tail"),
        sum(log(col("deg").cast("double") / (lit(dmin) - lit(0.5)))
          .cast("decimal(28,12)")).as("lsum"))
      .select(col("n_tail"),
        round(lit(1.0) + col("n_tail").cast("double") /
          col("lsum").cast("double"), 6).as("alpha"))
    hist.crossJoin(mle)
      .select(col("deg").as("degree"), col("n_nodes"), col("n_tail"),
        col("alpha"))
      .orderBy("degree")
  }

  /** Modularity of the brand partition over the (support-floored)
    * co-purchase graph: `Q = Σ_c [e_c/m − (d_c/2m)²]` (Newman–Girvan),
    * asking whether the catalog's brand labels are real communities in
    * co-purchase behaviour — the go/no-go for brand-sharded layouts of
    * a recommender's candidate store.
    *
    * Numeric discipline: summed ACROSS communities, the per-community
    * double terms would be partition-order-sensitive — so the sum stays
    * integral (`Σ_c [4m·e_c − d_c²]`, exact bigint) and divides by 4m²
    * exactly once. Per-brand contributions are rationals → portable
    * floor rounds.
    *
    * Scale shape: two edge-keyed joins against the catalog-cardinality
    * brand frame (no broadcast hint — AQE policy as [[pageRank]]), then
    * brand-cardinality aggregates (≤ 25 rows) and one-row scalar
    * crossJoins. The graph never materializes per-community. */
  def brandModularity(spark: SparkSession, sfDir: String,
                      minSupport: Long = 2L): DataFrame = {
    val und = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    val brands = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"))
    val lab = und
      .join(brands.select(col("p_partkey").as("a"),
        col("p_brand").as("ba")), Seq("a"))
      .join(brands.select(col("p_partkey").as("b"),
        col("p_brand").as("bb")), Seq("b"))
    val mRow = lab.agg(count(lit(1)).as("m"))
    val intra = lab.filter(col("ba") === col("bb"))
      .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("e_c"))
    val dirEdges = lab.select(col("a").as("node"), col("ba").as("brand"))
      .unionAll(lab.select(col("b").as("node"), col("bb").as("brand")))
    val degSum = dirEdges.groupBy("brand")
      // countDistinct plans the two-phase expand — no per-group node set
      // ever sits in one aggregation buffer (collect_set would)
      .agg(count(lit(1)).as("d_c"),
        countDistinct(col("node")).as("n_nodes"))
    val per = degSum.join(intra, Seq("brand"), "left")
      .select(col("brand"), col("n_nodes"),
        coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"))
      .crossJoin(mRow)
      .withColumn("num", lit(4L) * col("m") * col("e_c") -
        col("d_c") * col("d_c"))
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val qTot = per.agg(sum(col("num")).as("num_tot"),
      max(col("m")).as("mm"))
    per.crossJoin(qTot)
      .select(col("brand"), col("n_nodes"), col("e_c").as("n_intra_edges"),
        col("d_c").as("degree_sum"),
        r6(col("num").cast("double") /
          (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
          .as("contribution"),
        r6(col("num_tot").cast("double") /
          (lit(4.0) * col("mm").cast("double") * col("mm").cast("double")))
          .as("q_modularity"))
      .orderBy("brand")
  }

  /** Degree assortativity of the (support-floored) co-purchase graph:
    * the Pearson correlation of endpoint degrees over the directed edge
    * list (Newman, "Assortative mixing in networks"). Positive r means
    * hub products co-sell with other hubs; negative means hubs bridge
    * the long tail — which of the two decides whether degree-targeted
    * sampling keeps a training corpus connected.
    *
    * Scale shape: degrees are one node-cardinality aggregate; the edge
    * list joins the degree frame twice WITHOUT broadcast hints (node
    * frames scale with the catalog — AQE broadcasts only while small,
    * same policy as [[pageRank]]). All correlation moments are integer
    * sums (degrees are integers); the one-row Pearson formula then runs
    * in IEEE doubles — identical in any engine, no rounding ambiguity
    * until the final display round. By symmetry of the directed list
    * Σx = Σy, but both sides are computed for formula transparency. */
  def assortativity(spark: SparkSession, sfDir: String,
                    minSupport: Long = 2L): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    val edges = pairs.unionAll(
      pairs.select(col("b").as("a"), col("a").as("b")))
    val deg = edges.groupBy(col("a").as("part"))
      .agg(count(lit(1)).as("deg"))
    val xy = edges
      .join(deg.select(col("part").as("pa"), col("deg").as("dx")),
        col("a") === col("pa"))
      .join(deg.select(col("part").as("pb"), col("deg").as("dy")),
        col("b") === col("pb"))
      .select(col("dx"), col("dy"))
    val m = xy.agg(count(lit(1)).as("n"),
      sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"),
      sum(col("dx") * col("dy")).as("sxy"))
    val n = col("n").cast("double")
    def d(name: String) = col(name).cast("double")
    val num = n * d("sxy") - d("sx") * d("sy")
    val den = sqrt((n * d("sxx") - d("sx") * d("sx")) *
      (n * d("syy") - d("sy") * d("sy")))
    m.select(col("n").as("n_edges"),
      // mean degree is a rational (int/int) — portable floor round; the
      // correlation has an irrational sqrt denominator, so round() is safe
      (floor(d("sx") / n * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
        .as("mean_deg"),
      round(when(den === 0.0, lit(null)).otherwise(num / den), 6)
        .as("assortativity"))
  }

  /** Synchronous label propagation (Raghavan–Albert–Kumara 2007, public
    * method) over a symmetric edge list, made fully deterministic: a
    * FIXED round count with every node simultaneously adopting the most
    * frequent label among its neighbours, ties broken by the SMALLEST
    * label — a total order, so the trajectory is replay-identical on any
    * partitioning (the textbook algorithm's random visit order and
    * random tie-breaks are the non-determinism this variant removes;
    * sync LPA can oscillate on bipartite cores, which a fixed horizon
    * renders moot — the census at round R is the defined output).
    * Unlike [[graft.ext.DedupCluster]]'s min-label propagation (which
    * converges to connected COMPONENTS), mode-propagation finds dense
    * COMMUNITIES: a bridge edge between two triangles carries one vote,
    * so each triangle's internal majority keeps the sides distinct.
    *
    * Scale shape: each round is ONE shuffle join of the edge list with
    * the node-cardinality label frame (no broadcast hint — AQE
    * broadcasts only while the label frame actually fits, the pageRank
    * policy) followed by two node-keyed hash aggregates. The (node,
    * label) vote count collapses map-side, and the argmax is
    * `min_by(lbl, struct(-cnt, lbl))` — a DeclarativeAggregate that
    * partial-collapses before the exchange (the naive-Bayes/centroid
    * precedent) instead of window-sorting the vote fanout. No global
    * window anywhere; `localCheckpoint` truncates lineage per round so
    * the unrolled plan stays constant-size. The final top-`limit`
    * census is TakeOrderedAndProject (bounded heap, no global sort). */
  def labelPropagation(symEdges: DataFrame, rounds: Int = 3,
                       limit: Int = 20): DataFrame = {
    var labels = symEdges.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      labels = lpaRound(symEdges, labels).localCheckpoint(false)
    }
    labels.groupBy(col("lbl").cast("bigint").as("community"))
      .agg(count(lit(1)).as("n_members"),
        min(col("node")).cast("bigint").as("min_node"),
        max(col("node")).cast("bigint").as("max_node"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(limit)
  }

  /** One synchronous vote round: neighbour-label join, map-side-
    * collapsing vote count, `min_by` argmax (see [[labelPropagation]]). */
  private[graft] def lpaRound(symEdges: DataFrame,
                              labels: DataFrame): DataFrame =
    symEdges
      .join(labels.select(col("node").as("nb"), col("lbl")),
        col("b") === col("nb"))
      .groupBy(col("a"), col("lbl"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("a").as("node"))
      .agg(min_by(col("lbl"),
        struct((-col("cnt")).as("nc"), col("lbl"))).as("lbl"))

  /** [[labelPropagation]] over the support-floored co-purchase graph —
    * the algorithmic community assignment beside [[brandModularity]]'s
    * attribute partition (reference analog: the V2 star schema's
    * part-affinity reporting, warehouse_star.sql's fact joins). */
  def coPurchaseLabelProp(spark: SparkSession, sfDir: String,
                          rounds: Int = 3, minSupport: Long = 2L,
                          limit: Int = 20): DataFrame = {
    val pairs = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
    labelPropagation(pairs.unionAll(pairs.select(col("b").as("a"),
      col("a").as("b"))), rounds, limit)
  }

  /** Adamic–Adar link prediction over the support-floored co-purchase
    * graph: for part pairs NOT currently co-purchased but sharing common
    * neighbors, score Σ_z 1/ln(deg z) — the classic "which products will
    * co-sell next" ranking (plus the raw common-neighbor count). The
    * wedge enumeration joins the SIGNAL-sized pruned edge list with
    * itself on the center node (never the corpus); existing edges drop
    * via an anti-join on the canonical pair. Every common neighbor z of
    * a wedge has deg ≥ 2, so ln(deg) ≥ ln 2 — no division guard needed.
    * Per-term doubles go DECIMAL before the pair sum so partials merge
    * order-independently.
    *
    * SMALL-FIXTURE ONLY at default budget: this exact form is the
    * oracle baseline for [[adamicAdarCapped]], and its Σ_z C(deg z, 2)
    * wedge table is quadratic in hub degree. [[requireWedgeBudget]]
    * trips (fail-fast, before the fanout is scheduled) once the exact
    * enumeration would exceed `maxWedges` — every evidence fixture
    * (sf0.01 13 k, sf1 14 k, the zipf twin 2.0e8) fits under the 1e9
    * default; one 10⁵-degree hub alone (5e9 wedges) does not. At scale
    * use the capped sibling; raising `maxWedges` is an explicit
    * opt-in. */
  def adamicAdar(spark: SparkSession, sfDir: String,
                 minSupport: Long = 2L, limit: Int = 20,
                 maxWedges: Long = DefaultWedgeBudget): DataFrame =
    adamicAdarOnEdges(
      StarAnalytics.coPurchaseCounts(spark, sfDir)
        .filter(col("n_orders") >= minSupport)
        .select(col("part_a").as("a"), col("part_b").as("b"))
        .localCheckpoint(false),
      limit, maxWedges)

  /** Default ceiling for the exact wedge enumerators: comfortably above
    * every evidence fixture (max observed 2.0e8 on the zipf twin),
    * comfortably below what one web-scale hub produces (deg 10⁵ →
    * 5e9 wedges from a single center). */
  private[graft] val DefaultWedgeBudget: Long = 1000000000L

  /** Fail-fast budget guard for the UNCAPPED wedge enumerators: one
    * node-sized aggregate over the (checkpointed, signal-sized)
    * symmetric edge list computes the exact wedge count Σ_z C(deg z, 2)
    * and refuses to schedule a quadratic fanout past `maxWedges`,
    * naming the hub-capped scale sibling. The per-node product and the
    * sum run in DECIMAL(38,0) — Spark's `/` is double division, which
    * loses integer precision above deg ≈ 9.4e7, and a long sum can
    * wrap; decimals keep the count exact to 38 digits, and deg·(deg−1)
    * is even so the driver-side halving of the summed products is
    * exact too. A null sum over a nonempty node frame can only mean
    * decimal overflow (> 1e38 wedge-pairs) — refuse outright. */
  private[graft] def requireWedgeBudget(sym: DataFrame, maxWedges: Long,
                                        op: String,
                                        sibling: String): Unit = {
    val row = sym.groupBy(col("a")).agg(count(lit(1)).as("d"))
      .agg(sum(col("d").cast("decimal(38,0)") *
          (col("d") - lit(1)).cast("decimal(38,0)")).as("w2"),
        max(col("d")).as("m"), count(lit(1)).as("nz"))
      .head()
    require(row.getLong(2) == 0L || !row.isNullAt(0),
      s"$op: exact wedge count overflowed DECIMAL(38,0) — the " +
        s"enumeration is astronomically over budget $maxWedges; use " +
        s"$sibling.")
    val w = (if (row.isNullAt(0)) BigInt(0)
      else BigInt(row.getDecimal(0).toBigInteger)) / 2
    val m = if (row.isNullAt(1)) 0L else row.getLong(1)
    require(w <= BigInt(maxWedges),
      s"$op: exact wedge enumeration would build $w wedges " +
        s"(Σ_z C(deg z, 2); max degree $m) over budget $maxWedges. " +
        s"This uncapped form is a small-fixture oracle baseline — use " +
        s"$sibling (hub-capped, |V|·cap² wedges) at scale, or raise " +
        s"maxWedges explicitly.")
  }

  /** [[adamicAdar]] over a prebuilt canonical (a < b) edge list — the
    * testable core. */
  private[graft] def adamicAdarOnEdges(e: DataFrame, limit: Int,
      maxWedges: Long = DefaultWedgeBudget): DataFrame = {
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    requireWedgeBudget(sym, maxWedges, "adamicAdar", "adamicAdarCapped")
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("deg"))
    // deg attaches to the EDGE frame (2|E| rows) before the wedge
    // fanout, so the Σ_z deg(z)² wedge table never shuffles again for a
    // degree lookup — it flows straight into the pair aggregate
    val left = sym.select(col("a").as("z"), col("b").as("u"))
      .join(deg, Seq("z"))
    val wedges = left
      .join(sym.select(col("a").as("z"), col("b").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum((lit(1.0) / log(col("deg").cast("double")))
          .cast("decimal(28,12)")).as("aa"))
      .join(e, col("u") === col("a") && col("v") === col("b"), "left_anti")
      .select(col("u").as("part_a"), col("v").as("part_b"),
        col("common_neighbors"),
        r6(col("aa").cast("double")).as("adamic_adar"))
      .orderBy(col("adamic_adar").desc, col("part_a"), col("part_b"))
      .limit(limit)
  }

  /** Neighborhood-Jaccard link prediction — [[adamicAdar]]'s unweighted
    * sibling on the same support-floored co-purchase graph: for
    * non-adjacent pairs, |Γu ∩ Γv| / |Γu ∪ Γv|, where the union size is
    * exactly deg(u)+deg(v)−common because the pair is non-adjacent
    * (the anti-join guarantees v ∉ Γu). Jaccard punishes promiscuous
    * hubs where Adamic–Adar merely discounts them, so the two rankings
    * disagree exactly on hub-mediated pairs — worth serving both. Same
    * wedge shape (self-join of the SIGNAL-sized edge list on the center
    * node, never the corpus); degrees here join onto the AGGREGATED
    * pair frame (two node-sized hash joins AQE can broadcast) instead
    * of pre-fanout, since the pair term needs both endpoint degrees
    * rather than a per-wedge weight.
    *
    * SMALL-FIXTURE ONLY at default budget — same [[requireWedgeBudget]]
    * fail-fast as [[adamicAdar]]; [[linkJaccardCapped]] is the scale
    * path. */
  def linkJaccard(spark: SparkSession, sfDir: String,
                  minSupport: Long = 2L, limit: Int = 20,
                  maxWedges: Long = DefaultWedgeBudget): DataFrame =
    linkJaccardOnEdges(
      StarAnalytics.coPurchaseCounts(spark, sfDir)
        .filter(col("n_orders") >= minSupport)
        .select(col("part_a").as("a"), col("part_b").as("b"))
        .localCheckpoint(false),
      limit, maxWedges)

  /** [[linkJaccard]] over a prebuilt canonical (a < b) edge list. */
  private[graft] def linkJaccardOnEdges(e: DataFrame, limit: Int,
      maxWedges: Long = DefaultWedgeBudget): DataFrame = {
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    requireWedgeBudget(sym, maxWedges, "linkJaccard", "linkJaccardCapped")
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("dg"))
    val wedges = sym.select(col("a").as("z"), col("b").as("u"))
      .join(sym.select(col("a").as("z"), col("b").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
    val common = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"))
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    common
      .join(deg.select(col("z").as("u"), col("dg").as("deg_u")), Seq("u"))
      .join(deg.select(col("z").as("v"), col("dg").as("deg_v")), Seq("v"))
      .join(e, col("u") === col("a") && col("v") === col("b"), "left_anti")
      .select(col("u").as("part_a"), col("v").as("part_b"),
        col("common_neighbors"), col("deg_u"), col("deg_v"),
        r6(col("common_neighbors").cast("double") /
          (col("deg_u") + col("deg_v") - col("common_neighbors"))
            .cast("double")).as("jaccard"))
      .orderBy(col("jaccard").desc, col("part_a"), col("part_b"))
      .limit(limit)
  }

  /** Hub-capped Adamic–Adar — the 100 TB-hardened scale sibling of
    * [[adamicAdar]]. Uncapped wedge enumeration is Σ_z deg(z)²: one hub
    * product with 10⁵ co-purchase partners yields 10¹⁰ wedges from a
    * single key regardless of support flooring. Here each center node
    * contributes wedges only from its `hubCap` smallest-id neighbors
    * (row_number over (a ORDER BY b) ≤ cap — Spark rewrites the
    * rank-filter to a map-side WindowGroupLimit, so no center's full
    * adjacency ever sorts in one task), bounding wedges to |V|·cap².
    * The 1/ln(deg) weight keeps the TRUE degree (node-sized aggregate,
    * cheap exactly) — capping truncates enumeration, not the discount.
    * Overflow is accounted, not hidden: `n_capped_hubs` (centers whose
    * adjacency was truncated) rides every row, the same discipline as
    * the LSH bucket caps (DedupExt.minhashCandidatesFromSigs). With
    * cap ≥ max degree the capped ranking is IDENTICAL to [[adamicAdar]]
    * — property-tested in Round27PropSpec. */
  def adamicAdarCapped(spark: SparkSession, sfDir: String,
                       minSupport: Long = 2L, hubCap: Int = 8,
                       limit: Int = 20): DataFrame =
    adamicAdarCappedOnEdges(prunedEdges(spark, sfDir, minSupport),
      hubCap, limit)

  private[graft] def prunedEdges(spark: SparkSession, sfDir: String,
                                 minSupport: Long): DataFrame =
    StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
      .localCheckpoint(false)

  private[graft] def adamicAdarCappedOnEdges(e: DataFrame, hubCap: Int,
                                             limit: Int): DataFrame = {
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(false)
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("deg"))
    val kept = sym.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("a")).orderBy(col("b"))))
      .filter(col("rn") <= hubCap)
      .select(col("a"), col("b"))
    val capped = deg.filter(col("deg") > hubCap)
      .agg(count(lit(1)).as("n_capped_hubs"))
    val left = kept.select(col("a").as("z"), col("b").as("u"))
      .join(deg, Seq("z"))
    val wedges = left
      .join(kept.select(col("a").as("z"), col("b").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum((lit(1.0) / log(col("deg").cast("double")))
          .cast("decimal(28,12)")).as("aa"))
      .join(e, col("u") === col("a") && col("v") === col("b"), "left_anti")
      .crossJoin(broadcast(capped))
      .select(col("u").as("part_a"), col("v").as("part_b"),
        col("common_neighbors"),
        r6(col("aa").cast("double")).as("adamic_adar"),
        col("n_capped_hubs"))
      .orderBy(col("adamic_adar").desc, col("part_a"), col("part_b"))
      .limit(limit)
  }

  /** Hub-capped neighborhood Jaccard — [[linkJaccard]]'s scale sibling,
    * same enumeration cap as [[adamicAdarCapped]]. Degrees in the
    * Jaccard denominator stay TRUE degrees, so a capped score is a
    * conservative under-estimate on truncated hubs and exact elsewhere;
    * cap ≥ max degree reduces to [[linkJaccard]] (Round27PropSpec). */
  def linkJaccardCapped(spark: SparkSession, sfDir: String,
                        minSupport: Long = 2L, hubCap: Int = 8,
                        limit: Int = 20): DataFrame =
    linkJaccardCappedOnEdges(prunedEdges(spark, sfDir, minSupport),
      hubCap, limit)

  private[graft] def linkJaccardCappedOnEdges(e: DataFrame, hubCap: Int,
                                              limit: Int): DataFrame = {
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(false)
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("dg"))
    val kept = sym.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("a")).orderBy(col("b"))))
      .filter(col("rn") <= hubCap)
      .select(col("a"), col("b"))
    val capped = deg.filter(col("dg") > hubCap)
      .agg(count(lit(1)).as("n_capped_hubs"))
    val wedges = kept.select(col("a").as("z"), col("b").as("u"))
      .join(kept.select(col("a").as("z"), col("b").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
    val common = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"))
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    common
      .join(deg.select(col("z").as("u"), col("dg").as("deg_u")), Seq("u"))
      .join(deg.select(col("z").as("v"), col("dg").as("deg_v")), Seq("v"))
      .join(e, col("u") === col("a") && col("v") === col("b"), "left_anti")
      .crossJoin(broadcast(capped))
      .select(col("u").as("part_a"), col("v").as("part_b"),
        col("common_neighbors"), col("deg_u"), col("deg_v"),
        r6(col("common_neighbors").cast("double") /
          (col("deg_u") + col("deg_v") - col("common_neighbors"))
            .cast("double")).as("jaccard"),
        col("n_capped_hubs"))
      .orderBy(col("jaccard").desc, col("part_a"), col("part_b"))
      .limit(limit)
  }

  /** Rich-club coefficient of the co-purchase graph: edge density among
    * the top-k highest-degree parts, against the whole-graph density —
    * the "do the hubs trade with each other" structure probe (rich-club
    * ≫ 1 means the bestsellers co-sell as a clique; ≈ 1 means hub
    * wiring is no denser than anywhere else). The club is a BOUNDED,
    * deterministically-ordered head of the node frame (deg DESC, id),
    * broadcast back onto the edge list for two semi-joins — the edge
    * frame is the pruned signal graph and never re-shuffles. */
  def richClub(spark: SparkSession, sfDir: String, k: Int = 20,
               minSupport: Long = 2L): DataFrame = {
    val e = StarAnalytics.coPurchaseCounts(spark, sfDir)
      .filter(col("n_orders") >= minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
      .localCheckpoint(false)
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("dg"))
    val club = deg.orderBy(col("dg").desc, col("z")).limit(k)
      .select(col("z")).localCheckpoint(false)
    val within = e
      .join(broadcast(club.select(col("z").as("a"))), Seq("a"), "left_semi")
      .join(broadcast(club.select(col("z").as("b"))), Seq("b"), "left_semi")
      .agg(count(lit(1)).as("n_within"))
    val tot = e.agg(count(lit(1)).as("n_edges"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val possibleClub = lit((k.toLong * (k - 1)) / 2).cast("double")
    within.crossJoin(broadcast(tot)).crossJoin(broadcast(nNodes))
      .select(lit(k.toLong).as("k"), col("n_within"), col("n_edges"),
        col("n_nodes"),
        r6(d(col("n_within")) / possibleClub).as("club_density"),
        r6(d(col("n_edges")) / (d(col("n_nodes")) *
          (d(col("n_nodes")) - lit(1.0)) / lit(2.0))).as("graph_density"),
        r6((d(col("n_within")) / possibleClub) /
          (d(col("n_edges")) / (d(col("n_nodes")) *
            (d(col("n_nodes")) - lit(1.0)) / lit(2.0))))
          .as("rich_club_ratio"))
  }

  /** HITS hubs-and-authorities over the bipartite customer→part purchase
    * graph (Kleinberg): customers are hubs, parts authorities;
    * `iterations` alternating updates. L1 normalization COMMUTES with
    * the linear updates, so the whole trajectory runs on RAW integer
    * sums (h₀ ≡ 1 → every intermediate score is an exact integer — no
    * per-round normalization pass, no float rounding anywhere) and the
    * single division at the end produces the same normalized authorities
    * a per-round-normalizing implementation converges to. That deletes
    * 2·iterations scalar-total jobs and makes the result bit-exact by
    * integer arithmetic in any engine. Magnitudes grow ~(d_p·d_c) per
    * round — DECIMAL(38,0) accumulators hold ≥1e38, far beyond any real
    * degree product at 2–3 iterations; re-scale per round only if you
    * push iterations an order of magnitude higher. The edge frame is
    * corpus-sized but every round is an (edge ⋈ score) hash join keyed
    * on the node ids — the textbook distributed HITS shape. */
  def hits(spark: SparkSession, sfDir: String,
           iterations: Int = 2, limit: Int = 20): DataFrame =
    hitsOnEdges(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint(false),
      iterations, limit)

  /** [[hits]] over a prebuilt bipartite (c, p) edge list — the testable
    * core. */
  private[graft] def hitsOnEdges(edges: DataFrame, iterations: Int,
                                 limit: Int): DataFrame = {
    // h₀ ≡ 1 → auth₀ = part in-degree; every later score is an exact
    // integer sum of integers (see scaladoc: normalization deferred)
    var auth: DataFrame = edges.groupBy("p")
      .agg(count(lit(1)).cast("decimal(38,0)").as("a"))
    for (i <- 1 to iterations) {
      val hubs = edges.join(auth, Seq("p"))
        .groupBy("c").agg(sum(col("a")).as("h"))
      auth = edges.join(hubs, Seq("c"))
        .groupBy("p").agg(sum(col("h")).as("a"))
      // barrier per round: auth feeds the next round's join AND (last
      // round) both the total and the output projection
      auth = auth.localCheckpoint(false)
    }
    val aTot = auth.agg(sum(col("a")).as("at"))
    // portable floor round (not round(): engines disagree on half mode)
    def r9(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    auth.crossJoin(broadcast(aTot))
      .select(col("p").as("part"),
        r9(col("a").cast("double") / col("at").cast("double"))
          .as("authority"))
      .orderBy(col("authority").desc, col("part"))
      .limit(limit)
  }
}
