package graft

/** Shared DuckDB-oracle SQL building blocks (CTE strings, literal tables,
  * candidate lists) used by the OracleSql* shards and a handful of
  * `SparkEntry.queries` builders. Split out of SparkEntry in round 10
  * (VERDICT item 6) purely for diff reviewability — no behavior change:
  * `SparkEntry.oracleSql` stitches the shards back into the exact same
  * 463-entry map the driver contract reads. */
private[graft] object OracleCtes {

  /** The q_key_discovery profiling contract: single columns plus the
    * plausible composite keys among non-unique columns. Fixed literal —
    * the combo list IS the operator's schema. */
  val KeyDiscoveryCombos: Seq[Seq[String]] = Seq(
    Seq("o_orderkey"), Seq("o_custkey"), Seq("o_orderstatus"),
    Seq("o_totalprice"), Seq("o_orderdate"), Seq("o_orderpriority"),
    Seq("o_custkey", "o_orderdate"), Seq("o_custkey", "o_totalprice"),
    Seq("o_orderdate", "o_totalprice"),
    Seq("o_orderstatus", "o_orderpriority"))


  /** The q_adstock candidate decay grid — fixed literals shared by the
    * Spark arms and the generated oracle SQL (the weights are computed by
    * the SAME repeated multiplication on both sides; see
    * EventAnalytics.adstockSweep on why pow() is banned here). */
  val AdstockDecays: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.9)


  /** DuckDB oracle SQL — table names resolve to the same parquet fixtures. */
  /** Shared DuckDB CTEs + literal constants for the portable sketch oracles.
    * The hash is `graft.plans.PortableHash.h60` on both sides: first 15 hex
    * chars of md5 as BIGINT; the MinHash permutation coefficients come from
    * the same `PortableHash.a/b` the native expressions use. */
  val minhashA: String =
    (0 until 32).map(graft.plans.PortableHash.a).mkString("[", ",", "]")

  val minhashB: String =
    (0 until 32).map(graft.plans.PortableHash.b).mkString("[", ",", "]")

  /** Shared CTE chain for the BPE oracles: 3 unrolled merge rounds
    * (pair stats -> argmax -> leftmost-greedy island merge -> reindex),
    * mirroring the Spark driver loop round by round. */
  val bpeCtes: String =
    """WITH wl AS (
         SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
           SELECT unnest(list_filter(
             string_split_regex(lower(text), '\s+'),
             x -> x <> '')) AS w FROM documents)
         WHERE len(w) >= 2 GROUP BY 1
         ORDER BY freq DESC, w LIMIT 200),
       t0 AS (
         SELECT w, freq, CAST(pos AS BIGINT) AS pos,
           substr(w, CAST(pos AS INT), 1) AS sym
         FROM (SELECT w, freq, unnest(range(1, len(w) + 1)) AS pos
               FROM wl)),
       p1 AS (
         SELECT w, freq, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         FROM t0),
       b1 AS (
         SELECT sym AS lsym, nxt AS rsym,
           CAST(sum(freq) AS BIGINT) AS pair_count
         FROM p1 WHERE nxt IS NOT NULL GROUP BY 1, 2
         ORDER BY pair_count DESC, lsym, rsym LIMIT 1),
       m1 AS (
         SELECT w, pos, row_number() OVER (PARTITION BY w ORDER BY pos)
           AS rn
         FROM p1, b1 WHERE sym = lsym AND nxt = rsym),
       s1 AS (
         SELECT w, pos FROM (
           SELECT w, pos, row_number() OVER (PARTITION BY w, pos - rn
             ORDER BY pos) AS rn2 FROM m1)
         WHERE (rn2 - 1) % 2 = 0),
       t1 AS (
         SELECT w, freq, CAST(row_number() OVER (PARTITION BY w
           ORDER BY opos) AS BIGINT) AS pos, sym FROM (
           SELECT p.w, p.freq, p.pos AS opos,
             CASE WHEN sc.pos IS NOT NULL THEN p.sym || p.nxt
                  ELSE p.sym END AS sym
           FROM p1 p
           LEFT JOIN s1 sc ON sc.w = p.w AND sc.pos = p.pos
           LEFT JOIN s1 sp ON sp.w = p.w AND sp.pos = p.pos - 1
           WHERE sp.pos IS NULL)),
       a1 AS (SELECT CAST(sum(freq) AS BIGINT) AS corpus_tokens_after
         FROM t1),
       p2 AS (
         SELECT w, freq, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         FROM t1),
       b2 AS (
         SELECT sym AS lsym, nxt AS rsym,
           CAST(sum(freq) AS BIGINT) AS pair_count
         FROM p2 WHERE nxt IS NOT NULL GROUP BY 1, 2
         ORDER BY pair_count DESC, lsym, rsym LIMIT 1),
       m2 AS (
         SELECT w, pos, row_number() OVER (PARTITION BY w ORDER BY pos)
           AS rn
         FROM p2, b2 WHERE sym = lsym AND nxt = rsym),
       s2 AS (
         SELECT w, pos FROM (
           SELECT w, pos, row_number() OVER (PARTITION BY w, pos - rn
             ORDER BY pos) AS rn2 FROM m2)
         WHERE (rn2 - 1) % 2 = 0),
       t2 AS (
         SELECT w, freq, CAST(row_number() OVER (PARTITION BY w
           ORDER BY opos) AS BIGINT) AS pos, sym FROM (
           SELECT p.w, p.freq, p.pos AS opos,
             CASE WHEN sc.pos IS NOT NULL THEN p.sym || p.nxt
                  ELSE p.sym END AS sym
           FROM p2 p
           LEFT JOIN s2 sc ON sc.w = p.w AND sc.pos = p.pos
           LEFT JOIN s2 sp ON sp.w = p.w AND sp.pos = p.pos - 1
           WHERE sp.pos IS NULL)),
       a2 AS (SELECT CAST(sum(freq) AS BIGINT) AS corpus_tokens_after
         FROM t2),
       p3 AS (
         SELECT w, freq, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         FROM t2),
       b3 AS (
         SELECT sym AS lsym, nxt AS rsym,
           CAST(sum(freq) AS BIGINT) AS pair_count
         FROM p3 WHERE nxt IS NOT NULL GROUP BY 1, 2
         ORDER BY pair_count DESC, lsym, rsym LIMIT 1),
       m3 AS (
         SELECT w, pos, row_number() OVER (PARTITION BY w ORDER BY pos)
           AS rn
         FROM p3, b3 WHERE sym = lsym AND nxt = rsym),
       s3 AS (
         SELECT w, pos FROM (
           SELECT w, pos, row_number() OVER (PARTITION BY w, pos - rn
             ORDER BY pos) AS rn2 FROM m3)
         WHERE (rn2 - 1) % 2 = 0),
       t3 AS (
         SELECT w, freq, CAST(row_number() OVER (PARTITION BY w
           ORDER BY opos) AS BIGINT) AS pos, sym FROM (
           SELECT p.w, p.freq, p.pos AS opos,
             CASE WHEN sc.pos IS NOT NULL THEN p.sym || p.nxt
                  ELSE p.sym END AS sym
           FROM p3 p
           LEFT JOIN s3 sc ON sc.w = p.w AND sc.pos = p.pos
           LEFT JOIN s3 sp ON sp.w = p.w AND sp.pos = p.pos - 1
           WHERE sp.pos IS NULL)),
       a3 AS (SELECT CAST(sum(freq) AS BIGINT) AS corpus_tokens_after
         FROM t3)"""


  val sketchShingleCte: String =
    """WITH toks AS MATERIALIZED (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
           x -> x <> '') AS toks
         FROM documents),
       sh AS MATERIALIZED (
         SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(toks)-1, 1)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
         FROM toks),
       hs AS MATERIALIZED (
         SELECT doc_id, list_transform(sh, s ->
           ('0x'||substr(md5(s),1,15))::BIGINT % 2147483647) AS hs
         FROM sh)"""

  val sketchTokenHashCte: String =
    """WITH toks AS MATERIALIZED (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
           x -> x <> '') AS toks
         FROM documents),
       th AS MATERIALIZED (
         SELECT doc_id, list_transform(toks, t ->
           ('0x'||substr(md5(t),1,15))::BIGINT) AS hs
         FROM toks)"""


  /** DuckDB CTE regenerating `graft.plans.LshBucket`'s portable
    * pseudo-random hyperplanes: component (b, d) =
    * (h60("b:d") % 2000001 - 1000000) / 1e6, h60 = first 15 md5 hex chars. */
  def lshPlanesCte(nBits: Int): String =
    s"""WITH planes AS (
         SELECT b, list_transform(range(0, 64), d ->
           ((('0x'||substr(md5(b::VARCHAR||':'||d::VARCHAR),1,15))::BIGINT
             % 2000001) - 1000000)/1000000.0) AS p
         FROM (SELECT unnest(range(0, $nBits)) AS b))"""


  /** Shared pHash CTE chain (→ `ph2(doc_id, phash)`): the integer-DCT
    * perceptual hash of graft.plans.PHash63, recomputed in DuckDB from
    * the SAME quantized cosine table the native expression multiplies
    * by (PHash63.cqSqlLiteral) — every coefficient, the lower-median
    * pick, and all 63 bits are integer-exact on both engines. The
    * separable two-stage DCT (rows then columns) keeps the SQL at
    * ~3k products per doc instead of 16k. */
  val phashCte: String =
    s"""WITH cq AS (SELECT ${graft.plans.PHash63.cqSqlLiteral} AS t),
         d AS (
           SELECT doc_id, text, length(text) AS n FROM documents),
         px AS (
           SELECT doc_id, CASE WHEN n = 0
               THEN list_transform(range(0, 256), i -> 0::BIGINT)
               ELSE list_transform(range(0, 256), i ->
                 ascii(substr(text, CAST((i % n) + 1 AS INT), 1))::BIGINT)
             END AS p
           FROM d),
         s1 AS (
           SELECT doc_id, list_transform(range(0, 16), r ->
             list_transform(range(0, 8), v ->
               list_sum(list_transform(range(0, 16), c ->
                 p[r * 16 + c + 1] * t[v + 1][c + 1])))) AS m
           FROM px, cq),
         co AS (
           SELECT doc_id, flatten(list_transform(range(0, 8), u ->
             list_transform(range(0, 8), v ->
               list_sum(list_transform(range(0, 16), r ->
                 t[u + 1][r + 1] * m[r + 1][v + 1]))))) AS cs
           FROM s1, cq),
         ph AS (SELECT doc_id, cs, list_sort(cs[2:])[32] AS med FROM co),
         ph2 AS (
           SELECT doc_id, CAST(list_sum(list_transform(range(1, 64), i ->
               CASE WHEN cs[i + 1] > med
                 THEN (1::BIGINT << CAST(i - 1 AS INT))
                 ELSE 0::BIGINT END)) AS BIGINT) AS phash
           FROM ph)"""


  /** Raster CTE for the decoded-PGM pHash arm: the oracle computes the
    * 16×16 raster STRAIGHT from the pixel formula (md5 first byte, +8
    * clamp for odd ids, nearest-neighbor floor indices for the 24×24 →
    * 16×16 downsample) — deliberately NOT from the PGM container, so any
    * header/stride bug in the Spark-side encode→decode round trip breaks
    * this compare. DCT/median/bit-pack identical to [[phashCte]]. */
  val pgmPhashCte: String = {
    // source pixel index for p16 cell i (24×24 source, floor map)
    val srcIdx = "((i // 16) * 24 // 16) * 24 + ((i % 16) * 24 // 16)"
    val basePx = "('0x' || substr(md5(CAST(doc_id // 2 AS VARCHAR) || " +
      s"':' || CAST($srcIdx AS VARCHAR)), 1, 2))::BIGINT"
    s"""WITH cq AS (SELECT ${graft.plans.PHash63.cqSqlLiteral} AS t),
         d AS (SELECT doc_id FROM documents WHERE doc_id % 10 < 2),
         px AS (
           SELECT doc_id, list_transform(range(0, 256), i ->
             CASE WHEN doc_id % 2 = 1
               THEN least($basePx + 8, 255) ELSE $basePx END) AS p
           FROM d),
         s1 AS (
           SELECT doc_id, list_transform(range(0, 16), r ->
             list_transform(range(0, 8), v ->
               list_sum(list_transform(range(0, 16), c ->
                 p[r * 16 + c + 1] * t[v + 1][c + 1])))) AS m
           FROM px, cq),
         co AS (
           SELECT doc_id, flatten(list_transform(range(0, 8), u ->
             list_transform(range(0, 8), v ->
               list_sum(list_transform(range(0, 16), r ->
                 t[u + 1][r + 1] * m[r + 1][v + 1]))))) AS cs
           FROM s1, cq),
         ph AS (SELECT doc_id, cs, list_sort(cs[2:])[32] AS med FROM co),
         ph2 AS (
           SELECT doc_id, CAST(list_sum(list_transform(range(1, 64), i ->
               CASE WHEN cs[i + 1] > med
                 THEN (1::BIGINT << CAST(i - 1 AS INT))
                 ELSE 0::BIGINT END)) AS BIGINT) AS phash
           FROM ph)"""
  }


  /** Gradient-SimHash CTE for the decoded-raster SimHash arm
    * (→ `sim(doc_id, simhash)`): the oracle rebuilds the FULL 24×24
    * raster straight from the pixel formula (never the PGM container),
    * takes the row-major byte gradient mod 256, renders each 4-byte
    * shingle as the same lowercase-hex gram string
    * graft.plans.PgmGradHex emits, and majority-votes the md5-based
    * 60-bit simhash exactly like the q_media_neardup oracle — so a
    * decode/stride/hex bug anywhere in the Spark encode→decode→gradient
    * path breaks this compare. */
  val pgmGradSimhashCte: String = {
    val basePx = "('0x' || substr(md5(CAST(doc_id // 2 AS VARCHAR) || " +
      "':' || CAST(i AS VARCHAR)), 1, 2))::BIGINT"
    s"""WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 10 < 2),
         px AS (
           SELECT doc_id, list_transform(range(0, 576), i ->
             CASE WHEN doc_id % 2 = 1
               THEN least($basePx + 8, 255) ELSE $basePx END) AS p
           FROM d),
         gr AS (
           SELECT doc_id, list_transform(range(0, 575), i ->
             (p[i + 2] - p[i + 1] + 256) % 256) AS g
           FROM px),
         gs AS (
           SELECT doc_id, list_distinct(list_transform(range(0, 572),
             j -> printf('%02x%02x%02x%02x',
               g[j + 1], g[j + 2], g[j + 3], g[j + 4]))) AS grams
           FROM gr),
         th AS (
           SELECT doc_id, list_transform(grams, t ->
             ('0x'||substr(md5(t),1,15))::BIGINT) AS hs
           FROM gs),
         sim AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), b ->
               CASE WHEN 2*len(list_filter(hs, h -> ((h >> b) & 1) = 1))
                      >= len(hs)
                    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT)
               AS simhash
           FROM th)"""
  }


  /** Literal list of 31^i mod 2^64 (i < 600) for the rolling-hash oracle —
    * DuckDB has no modpow, so the powers ship as data. HUGEINT arithmetic
    * reproduces the JVM's wrap-around exactly; the oracle is byte-exact for
    * ASCII fixtures (DuckDB `ascii()` = byte value there). */
  val rollingPowers: String = {
    val m = BigInt(1) << 64
    Iterator.iterate(BigInt(1))(p => (p * 31) % m).take(600)
      .mkString("[", ",", "]")
  }


  /** Candidate lists for the schema-profiling queries — shared between the
    * Spark query registrations and the generated per-candidate oracle SQL
    * so both sides always profile the identical pairs. */
  val inclCands: Seq[(String, String, String, String)] = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"))


  val fdCands: Seq[(String, String, String)] = Seq(
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("events", "event_id", "user_id"),
    ("events", "user_id", "event_type"))


  val inclOracle: String = inclCands.map {
    case (ct, cc, pt, pc) =>
      s"""SELECT '$ct' AS child_table, '$cc' AS child_col,
         '$pt' AS parent_table, '$pc' AS parent_col,
         c.n_child_distinct, p.n_parent_distinct, i.n_contained,
         floor(CAST(i.n_contained AS DOUBLE) /
           CAST(c.n_child_distinct AS DOUBLE) * 1000000.0 + 0.5)
           / 1000000.0 AS containment,
         CASE WHEN i.n_contained = c.n_child_distinct THEN 1 ELSE 0 END
           AS is_fk
       FROM (SELECT CAST(count(DISTINCT $cc) AS BIGINT)
           AS n_child_distinct FROM $ct WHERE $cc IS NOT NULL) c
       CROSS JOIN (SELECT CAST(count(DISTINCT $pc) AS BIGINT)
           AS n_parent_distinct FROM $pt WHERE $pc IS NOT NULL) p
       CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_contained
           FROM (SELECT DISTINCT $cc AS v FROM $ct
             WHERE $cc IS NOT NULL) ch
           WHERE ch.v IN (SELECT $pc FROM $pt)) i"""
  }.mkString("", "\n UNION ALL\n ", "\n ORDER BY 1, 2, 3")


  val fdOracle: String = fdCands.map {
    case (t, a, b) =>
      s"""SELECT '$t' AS table_name, '$a' AS lhs, '$b' AS rhs,
         CAST(count(*) AS BIGINT) AS n_lhs,
         CAST(sum(nb) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_lhs,
         CASE WHEN sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0
           THEN 1 ELSE 0 END AS holds
       FROM (SELECT $a AS a, count(DISTINCT $b) AS nb FROM $t
         WHERE $a IS NOT NULL GROUP BY 1) g"""
  }.mkString("", "\n UNION ALL\n ", "\n ORDER BY 1, 2, 3")


  /** Three unrolled EM rounds for the q_gmm_em oracle — generated so the
    * per-round SQL is literally identical, mirroring the Spark fold. */
  val gmmOracle: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
           SELECT sg / CAST(n AS DOUBLE) AS p1, sgx / sg AS mu1,
             greatest(sqrt(sgxx / sg - (sgx / sg) * (sgx / sg)),
               0.000001) AS s1,
             shx / (CAST(n AS DOUBLE) - sg) AS mu2,
             greatest(sqrt(shxx / (CAST(n AS DOUBLE) - sg) -
               (shx / (CAST(n AS DOUBLE) - sg)) *
               (shx / (CAST(n AS DOUBLE) - sg))), 0.000001) AS s2,
             n
           FROM (
             SELECT max(n) AS n,
               CAST(sum(CAST(g AS DECIMAL(28,12))) AS DOUBLE) AS sg,
               CAST(sum(CAST(g * x AS DECIMAL(28,12))) AS DOUBLE)
                 AS sgx,
               CAST(sum(CAST(g * x * x AS DECIMAL(28,12))) AS DOUBLE)
                 AS sgxx,
               CAST(sum(CAST((1.0 - g) * x AS DECIMAL(28,12)))
                 AS DOUBLE) AS shx,
               CAST(sum(CAST((1.0 - g) * x * x AS DECIMAL(28,12)))
                 AS DOUBLE) AS shxx
             FROM (
               SELECT x, n,
                 CASE WHEN a + b > 0.0 THEN a / (a + b) ELSE 0.5 END
                   AS g
               FROM (
                 SELECT x, n,
                   p1 * (exp(-(x - mu1) * (x - mu1) /
                     (2.0 * s1 * s1)) / s1) AS a,
                   (1.0 - p1) * (exp(-(x - mu2) * (x - mu2) /
                     (2.0 * s2 * s2)) / s2) AS b
                 FROM xs CROSS JOIN $prev))))"""
    s"""WITH xs AS MATERIALIZED (
           SELECT value AS x FROM events WHERE value IS NOT NULL),
         base AS MATERIALIZED (
           SELECT CAST(count(*) AS BIGINT) AS n,
             quantile_cont(x, 0.25) AS q1, quantile_cont(x, 0.75) AS q3,
             sqrt(CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)
                 / count(*) -
               (CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                 / count(*)) *
               (CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                 / count(*))) AS sd
           FROM xs),
         i0 AS MATERIALIZED (
           SELECT 0.5 AS p1, q1 AS mu1, greatest(sd, 0.000001) AS s1,
             q3 AS mu2, greatest(sd, 0.000001) AS s2, n
           FROM base),
         ${step("i0", "i1")},
         ${step("i1", "i2")},
         ${step("i2", "i3")},
         ll AS MATERIALIZED (
           SELECT CAST(sum(CAST(ln(greatest(
               (p1 * (exp(-(x - mu1) * (x - mu1) / (2.0 * s1 * s1))
                  / s1) +
                (1.0 - p1) * (exp(-(x - mu2) * (x - mu2) /
                  (2.0 * s2 * s2)) / s2)) / 2.5066282746310002,
               1e-300)) AS DECIMAL(28,12))) AS DOUBLE) AS sll,
             CAST(count(*) AS BIGINT) AS n2
           FROM xs CROSS JOIN i3)
         SELECT n,
           floor(p1 * 1000000.0 + 0.5) / 1000000.0 AS pi1,
           floor(mu1 * 1000000.0 + 0.5) / 1000000.0 AS mu1,
           floor(s1 * 1000000.0 + 0.5) / 1000000.0 AS sigma1,
           floor(mu2 * 1000000.0 + 0.5) / 1000000.0 AS mu2,
           floor(s2 * 1000000.0 + 0.5) / 1000000.0 AS sigma2,
           floor(sll / CAST(n2 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS avg_loglik
         FROM i3 CROSS JOIN ll"""
  }


  /** The periodogram oracle, extracted so q_spectral_entropy can fold the
    * SAME power census (DuckDB allows a WITH-bearing statement as a
    * subquery, so the reuse is verbatim). */
  val periodogramOracleSql: String = {
    val arms = (2 to 14).map { p =>
      def cse(tab: Array[Double]): String =
        s"CASE CAST(t % $p AS INT) " +
          (1 until p).map(r =>
            s"WHEN $r THEN CAST(${tab(r)} AS DOUBLE)").mkString(" ") +
          s" ELSE CAST(${tab(0)} AS DOUBLE) END"
      val cosCase = cse(graft.analytics.PeriodogramTables.cosTab(p))
      val sinCase = cse(graft.analytics.PeriodogramTables.sinTab(p))
      s"""SELECT CAST($p AS BIGINT) AS period,
          CAST(n AS BIGINT) AS n_days,
          floor((sc * sc + ss * ss) / CAST(n AS DOUBLE)
            * 1000000.0 + 0.5) / 1000000.0 AS power
        FROM (SELECT max(n) AS n,
          CAST(sum(CAST(c * ($cosCase) AS DECIMAL(38,12)))
            AS DOUBLE) AS sc,
          CAST(sum(CAST(c * ($sinCase) AS DECIMAL(38,12)))
            AS DOUBLE) AS ss
          FROM centered) a$p"""
    }.mkString(" UNION ALL ")
    s"""WITH daily AS (
         SELECT CAST(ts AS DATE) AS d,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS x
         FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
         GROUP BY 1),
       m0 AS (
         SELECT CAST(count(*) AS BIGINT) AS n, min(d) AS d0,
           CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx
         FROM daily),
       centered AS (
         SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS t,
           x - sx / CAST(n AS DOUBLE) AS c, n
         FROM daily CROSS JOIN m0)
       SELECT * FROM ($arms) ORDER BY period"""
  }


  /** The isotropy oracle, extracted so q_whitening_isotropy can reuse
    * the raw-space mean-cosine verbatim (the periodogram-reuse trick). */
  val isotropyOracleSql: String =
    """WITH base AS (
           SELECT embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[],
               embedding::DOUBLE[])) AS nrm
           FROM embeddings),
         scalars AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(nrm * nrm AS DECIMAL(38,12))) AS DOUBLE) AS ss,
             CAST(sum(CAST(nrm AS DECIMAL(38,12))) AS DOUBLE) AS sn
           FROM base),
         xs AS (SELECT unnest(range(0, 64)) AS i, e, nrm FROM base),
         dims AS (
           SELECT i,
             CAST(sum(CAST(floor(e[i + 1] * 1e12 + 0.5) AS BIGINT))
               AS DOUBLE) / 1e12 AS sx,
             CAST(sum(CAST(floor(e[i + 1] / nrm * 1e12 + 0.5) AS BIGINT))
               AS DOUBLE) / 1e12 AS su
           FROM xs GROUP BY 1),
         vec AS (
           SELECT CAST(sum(CAST(sx * sx AS DECIMAL(38,12))) AS DOUBLE)
               AS ssx,
             CAST(sum(CAST(su * su AS DECIMAL(38,12))) AS DOUBLE) AS ssu
           FROM dims)
         SELECT s.n AS n_vectors, CAST(64 AS BIGINT) AS dim,
           floor(s.sn / CAST(s.n AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_norm,
           floor((v.ssu - CAST(s.n AS DOUBLE))
             / (CAST(s.n AS DOUBLE) * (CAST(s.n AS DOUBLE) - 1.0))
             * 1000000.0 + 0.5) / 1000000.0 AS mean_cosine,
           floor((v.ssx / (CAST(s.n AS DOUBLE) * CAST(s.n AS DOUBLE)))
             / (s.ss / CAST(s.n AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS center_mass_share
         FROM scalars s, vec v"""


  /** The daily total-value series CTE shared by the sequential-monitor
    * oracles (the InferenceAnalytics.dailySeries construction). */
  val dailyCte: String =
    """daily AS (
         SELECT CAST(ts AS DATE) AS d,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS x
         FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
         GROUP BY 1)"""


  /** CASE lookup of 0.5^k (k = `expr`, beyond-table → 0 on BOTH engines)
    * — the ThetaTables.pow05 literals, exact binary powers of two. */
  def pow05Case(expr: String): String =
    s"CASE CAST($expr AS INT) " +
      (0 until graft.analytics.ThetaTables.maxPow).map(i =>
        s"WHEN $i THEN CAST(${graft.analytics.ThetaTables.pow05(i)} " +
          "AS DOUBLE)").mkString(" ") + " ELSE CAST(0.0 AS DOUBLE) END"


  /** The unrolled Hilbert xy→d walk as 8 chained CTEs over fresh column
    * names per level (DuckDB lateral alias resolution makes same-name
    * reuse in one SELECT ambiguous) — the operators.Hilbert.withHilbert
    * chain, verbatim in SQL. Input CTE must expose xg, yg, z. */
  val hilbertStepsCte: String = {
    val init = "h0 AS (SELECT xg, yg, cnt, z, xg AS hx0, yg AS hy0, " +
      "CAST(0 AS BIGINT) AS hd0 FROM grid)"
    val steps = (7 to 0 by -1).zipWithIndex.map { case (i, idx) =>
      val s = 1L << i
      val (a, b) = (idx, idx + 1)
      s"""h$b AS (SELECT xg, yg, cnt, z,
          hd$a + ${s * s} * (CASE
            WHEN (hx$a & $s) = 0 AND (hy$a & $s) = 0 THEN 0
            WHEN (hx$a & $s) = 0 AND (hy$a & $s) > 0 THEN 1
            WHEN (hx$a & $s) > 0 AND (hy$a & $s) > 0 THEN 2
            ELSE 3 END) AS hd$b,
          CASE WHEN (hy$a & $s) > 0 THEN hx$a
               WHEN (hx$a & $s) > 0 THEN ${s - 1} - hy$a
               ELSE hy$a END AS hx$b,
          CASE WHEN (hy$a & $s) > 0 THEN hy$a
               WHEN (hx$a & $s) > 0 THEN ${s - 1} - hx$a
               ELSE hx$a END AS hy$b
        FROM h$a)"""
    }
    (init +: steps).mkString(",\n       ")
  }
}
