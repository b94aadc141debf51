package graft

import graft.OracleCtes._

/** DuckDB oracle SQL shard — evaluation & data-valuation reports, part 2
  * (q_length_sweep .. q_cluster_nmi). Split from SparkEntry in round 10 (VERDICT item
  * 6) so the 463-entry registry stays diff-reviewable; stitched back —
  * order- and content-identical — in `SparkEntry.oracleSql`, which also
  * `require`s key disjointness across shards. */
private[graft] object OracleSqlEval2 {
  val sql: Map[String, String] = Map(
    "q_length_sweep" ->
      """WITH c AS (SELECT unnest([50, 100, 200, 400, 800]) AS cutoff),
         d AS (SELECT n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
           FROM documents),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(en) AS BIGINT) AS n_en FROM d),
         k AS (
           SELECT cutoff,
             CAST(sum(CASE WHEN n_chars >= cutoff THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN n_chars >= cutoff THEN en ELSE 0 END)
               AS BIGINT) AS n_kept_en
           FROM d CROSS JOIN c GROUP BY 1)
         SELECT CAST(cutoff AS BIGINT) AS cutoff, n_kept,
           floor(CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS share_kept,
           floor(CASE WHEN n_kept > 0
             THEN CAST(n_kept_en AS DOUBLE) / CAST(n_kept AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS precision_en,
           floor(CASE WHEN n_en > 0
             THEN CAST(n_kept_en AS DOUBLE) / CAST(n_en AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0 AS recall_en
         FROM k CROSS JOIN t ORDER BY cutoff""",
    "q_ljung_box" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         st AS (
           SELECT CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) /
             CAST(count(*) AS DOUBLE) AS mean_x FROM daily),
         c AS (SELECT d, x - st.mean_x AS c FROM daily CROSS JOIN st),
         den AS (
           SELECT CAST(sum(CAST(c * c AS DECIMAL(28,10))) AS DOUBLE)
             AS den FROM c),
         l AS (
           SELECT c,
             lag(c, 1) OVER (ORDER BY d) AS c1,
             lag(c, 2) OVER (ORDER BY d) AS c2,
             lag(c, 3) OVER (ORDER BY d) AS c3,
             lag(c, 4) OVER (ORDER BY d) AS c4,
             lag(c, 5) OVER (ORDER BY d) AS c5,
             lag(c, 6) OVER (ORDER BY d) AS c6,
             lag(c, 7) OVER (ORDER BY d) AS c7
           FROM c),
         a AS (
           SELECT 1 AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(c * c1 AS DECIMAL(28,10))) AS DOUBLE) AS num
           FROM l WHERE c1 IS NOT NULL
           UNION ALL
           SELECT 2, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c2 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c2 IS NOT NULL
           UNION ALL
           SELECT 3, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c3 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c3 IS NOT NULL
           UNION ALL
           SELECT 4, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c4 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c4 IS NOT NULL
           UNION ALL
           SELECT 5, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c5 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c5 IS NOT NULL
           UNION ALL
           SELECT 6, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c6 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c6 IS NOT NULL
           UNION ALL
           SELECT 7, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c7 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c7 IS NOT NULL),
         acf_t AS (
           SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             round(num / den.den, 6) AS acf
           FROM a CROSS JOIN den),
         t AS (
           SELECT CAST(n_pairs AS DOUBLE) + CAST(lag AS DOUBLE) AS n,
             CAST((acf * acf) / CAST(n_pairs AS DOUBLE)
               AS DECIMAL(28,12)) AS term
           FROM acf_t),
         m AS (
           SELECT n, CAST(count(*) AS BIGINT) AS n_lags,
             CAST(sum(term) AS DOUBLE) AS s
           FROM t GROUP BY 1)
         SELECT CAST(n AS BIGINT) AS n_days, n_lags,
           floor(n * (n + 2.0) * s * 1000000.0 + 0.5) / 1000000.0
             AS lb_q,
           CASE WHEN n * (n + 2.0) * s > 14.06714 THEN 1 ELSE 0 END
             AS reject_iid
         FROM m""",
    "q_stl_lite" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(28,12))), 2)
               AS DOUBLE) AS v
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1),
         tr AS (
           SELECT d, v,
             CAST(sum(CAST(v AS DECIMAL(28,12))) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE) /
               CAST(count(*) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
               AS trend,
             dayofweek(d) AS wd
           FROM daily),
         t2 AS (SELECT *, v - trend AS det FROM tr),
         wk AS (
           SELECT wd, CAST(sum(CAST(det AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS seasonal
           FROM t2 GROUP BY 1)
         SELECT d, v,
           floor(trend * 1000000.0 + 0.5) / 1000000.0 AS trend,
           floor(seasonal * 1000000.0 + 0.5) / 1000000.0 AS seasonal,
           floor((det - seasonal) * 1000000.0 + 0.5) / 1000000.0
             AS residual
         FROM t2 JOIN wk USING (wd) ORDER BY d""",
    "q_rich_club" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS a, b.l_partkey AS b
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
         deg AS (SELECT a AS z, CAST(count(*) AS BIGINT) AS dg
           FROM sym GROUP BY 1),
         club AS (SELECT z FROM (
             SELECT z, row_number() OVER (ORDER BY dg DESC, z) AS rn
             FROM deg) WHERE rn <= 20),
         w AS (SELECT CAST(count(*) AS BIGINT) AS n_within FROM pr
           WHERE a IN (SELECT z FROM club)
             AND b IN (SELECT z FROM club)),
         te AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM pr),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
         SELECT CAST(20 AS BIGINT) AS k, n_within, n_edges, n_nodes,
           floor(CAST(n_within AS DOUBLE) / 190.0 * 1000000.0 + 0.5)
             / 1000000.0 AS club_density,
           floor(CAST(n_edges AS DOUBLE) / (CAST(n_nodes AS DOUBLE) *
             (CAST(n_nodes AS DOUBLE) - 1.0) / 2.0) * 1000000.0 + 0.5)
             / 1000000.0 AS graph_density,
           floor((CAST(n_within AS DOUBLE) / 190.0) /
             (CAST(n_edges AS DOUBLE) / (CAST(n_nodes AS DOUBLE) *
               (CAST(n_nodes AS DOUBLE) - 1.0) / 2.0))
             * 1000000.0 + 0.5) / 1000000.0 AS rich_club_ratio
         FROM w CROSS JOIN te CROSS JOIN nn""",
    "q_gmm_em" -> gmmOracle,
    "q_als_step" ->
      """WITH pairs AS MATERIALIZED (
           SELECT DISTINCT o_custkey AS cust, l_partkey AS item
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         f AS MATERIALIZED (
           SELECT cust,
             (CAST(('0x' || substr(md5(CAST(item AS VARCHAR) || ':f1'),
               1, 15))::BIGINT % 2001 AS DOUBLE) - 1000.0) / 1000.0
               AS x1,
             (CAST(('0x' || substr(md5(CAST(item AS VARCHAR) || ':f2'),
               1, 15))::BIGINT % 2001 AS DOUBLE) - 1000.0) / 1000.0
               AS x2
           FROM pairs),
         m AS MATERIALIZED (
           SELECT cust, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(x1 * x1 AS DECIMAL(28,12))) AS DOUBLE) AS a,
             CAST(sum(CAST(x1 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS b,
             CAST(sum(CAST(x2 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS dd,
             CAST(sum(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE) AS sx1,
             CAST(sum(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE) AS sx2
           FROM f GROUP BY 1)
         SELECT cust, n_items,
           floor(((dd + 0.1) * sx1 - b * sx2) /
             ((a + 0.1) * (dd + 0.1) - b * b) * 1000000.0 + 0.5)
             / 1000000.0 AS w1,
           floor(((a + 0.1) * sx2 - b * sx1) /
             ((a + 0.1) * (dd + 0.1) - b * b) * 1000000.0 + 0.5)
             / 1000000.0 AS w2
         FROM m ORDER BY cust""",
    "q_abc_xyz" ->
      """WITH pp AS (
           SELECT l_partkey,
             sum(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(28,12))) AS rev
           FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(rev) AS total FROM pp),
         cl AS (
           SELECT l_partkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM pp),
         cls AS (
           SELECT l_partkey, rev, total,
             CASE WHEN cum * 5 <= total * 4 THEN 'A'
                  WHEN cum * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS cls_abc
           FROM cl CROSS JOIN tot),
         rows_ AS (
           SELECT l_partkey, l_quantity, CAST(o_orderdate AS DATE) AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         span AS (
           SELECT min(CAST(o_orderdate AS DATE)) AS d0,
             CAST(floor(date_diff('day', min(CAST(o_orderdate AS DATE)),
               max(CAST(o_orderdate AS DATE))) / 7.0) + 1
               AS DOUBLE) AS n_weeks
           FROM orders),
         weekly AS (
           SELECT l_partkey, floor(date_diff('day', d0, d) / 7.0) AS wk,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE)
               AS q,
             max(n_weeks) AS n_weeks
           FROM rows_ CROSS JOIN span GROUP BY 1, 2),
         per AS (
           SELECT l_partkey,
             CAST(sum(CAST(q AS DECIMAL(28,12))) AS DOUBLE) AS sq,
             CAST(sum(CAST(q * q AS DECIMAL(28,12))) AS DOUBLE) AS sqq,
             max(n_weeks) AS w
           FROM weekly GROUP BY 1),
         cv AS (
           SELECT l_partkey,
             floor(CASE WHEN sq > 0.0
               THEN sqrt(greatest(sqq / w - (sq / w) * (sq / w), 0.0))
                 / (sq / w)
               ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0 AS cv
           FROM per),
         x AS (
           SELECT l_partkey,
             CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y'
               ELSE 'Z' END AS cls_xyz
           FROM cv)
         SELECT cls_abc, cls_xyz, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(round(sum(rev), 2) AS DOUBLE) AS revenue,
           floor(CAST(sum(rev) AS DOUBLE) / CAST(max(total) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS revenue_share
         FROM cls JOIN x USING (l_partkey)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_pacf" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         st AS (
           SELECT CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) /
             CAST(count(*) AS DOUBLE) AS mean_x FROM daily),
         c AS (SELECT d, x - st.mean_x AS c FROM daily CROSS JOIN st),
         den AS (
           SELECT CAST(sum(CAST(c * c AS DECIMAL(28,10))) AS DOUBLE)
             AS den FROM c),
         l AS (
           SELECT c,
             lag(c, 1) OVER (ORDER BY d) AS c1,
             lag(c, 2) OVER (ORDER BY d) AS c2,
             lag(c, 3) OVER (ORDER BY d) AS c3,
             lag(c, 4) OVER (ORDER BY d) AS c4,
             lag(c, 5) OVER (ORDER BY d) AS c5,
             lag(c, 6) OVER (ORDER BY d) AS c6,
             lag(c, 7) OVER (ORDER BY d) AS c7
           FROM c),
         a AS (
           SELECT 1 AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(c * c1 AS DECIMAL(28,10))) AS DOUBLE) AS num
           FROM l WHERE c1 IS NOT NULL
           UNION ALL
           SELECT 2, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c2 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c2 IS NOT NULL
           UNION ALL
           SELECT 3, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c3 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c3 IS NOT NULL
           UNION ALL
           SELECT 4, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c4 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c4 IS NOT NULL
           UNION ALL
           SELECT 5, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c5 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c5 IS NOT NULL
           UNION ALL
           SELECT 6, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c6 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c6 IS NOT NULL
           UNION ALL
           SELECT 7, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c * c7 AS DECIMAL(28,10))) AS DOUBLE)
           FROM l WHERE c7 IS NOT NULL),
         acf_t AS (
           SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             round(num / den.den, 6) AS acf
           FROM a CROSS JOIN den),
         pv AS (
           SELECT max(CASE WHEN lag = 1 THEN acf END) AS r1,
             max(CASE WHEN lag = 2 THEN acf END) AS r2,
             max(CASE WHEN lag = 3 THEN acf END) AS r3,
             max(n_pairs + lag) AS n_days
           FROM acf_t),
         s1 AS (
           SELECT n_days, r1, r2, r3, r1 AS p11,
             CASE WHEN 1.0 - r1 * r1 <> 0.0
               THEN (r2 - r1 * r1) / (1.0 - r1 * r1) ELSE 0.0 END AS p22
           FROM pv),
         s2 AS (
           SELECT *, p11 * (1.0 - p22) AS p21 FROM s1),
         s3 AS (
           SELECT *, CASE WHEN 1.0 - p21 * r1 - p22 * r2 <> 0.0
             THEN (r3 - p21 * r2 - p22 * r1) /
               (1.0 - p21 * r1 - p22 * r2)
             ELSE 0.0 END AS p33
           FROM s2)
         SELECT CAST(n_days AS BIGINT) AS n_days,
           floor(p11 * 1000000.0 + 0.5) / 1000000.0 AS pacf_1,
           floor(p22 * 1000000.0 + 0.5) / 1000000.0 AS pacf_2,
           floor(p33 * 1000000.0 + 0.5) / 1000000.0 AS pacf_3
         FROM s3""",
    "q_content_census" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'https?://[^ ]+'))
             AS BIGINT) AS n_urls,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]+'))
             AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '[0-9]+\.[0-9]+|[0-9]+'))
             AS BIGINT) AS n_numbers,
           CAST(len(regexp_extract_all(text, '[{}();=<>]{2,}'))
             AS BIGINT) AS n_code_runs,
           floor(CASE WHEN length(text) > 0
             THEN CAST(len(regexp_extract_all(text, '[0-9]'))
               AS DOUBLE) / CAST(length(text) AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS digit_ratio
         FROM documents ORDER BY doc_id""",
    "q_fulfillment_lag" ->
      """WITH fs AS (
           SELECT l_orderkey, min(CAST(l_shipdate AS DATE))
               AS first_ship
           FROM lineitem GROUP BY 1),
         lags AS (
           SELECT o_orderpriority AS priority,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
               first_ship) AS BIGINT) AS lag_days
           FROM fs JOIN orders ON l_orderkey = o_orderkey)
         SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
           floor(CAST(sum(lag_days) AS DOUBLE) /
             CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS mean_days,
           floor(quantile_cont(lag_days, 0.5) * 1000000.0 + 0.5)
             / 1000000.0 AS p50_days,
           floor(quantile_cont(lag_days, 0.95) * 1000000.0 + 0.5)
             / 1000000.0 AS p95_days
         FROM lags GROUP BY 1 ORDER BY 1""",
    "q_croston" ->
      """WITH rows_ AS (
           SELECT l_partkey, l_quantity, CAST(o_orderdate AS DATE) AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         d0 AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0
           FROM orders),
         weekly AS (
           SELECT l_partkey,
             CAST(floor(date_diff('day', d0, d) / 7.0) AS BIGINT) AS wk,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE)
               AS z
           FROM rows_ CROSS JOIN d0 GROUP BY 1, 2
           HAVING sum(CAST(l_quantity AS DECIMAL(28,12))) > 0),
         idx AS (
           SELECT l_partkey, wk, z,
             CAST(row_number() OVER (PARTITION BY l_partkey
               ORDER BY wk) AS DOUBLE) AS i,
             CAST(wk - lag(wk, 1) OVER (PARTITION BY l_partkey
               ORDER BY wk) AS DOUBLE) AS g
           FROM weekly),
         cnt AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CAST(z AS DECIMAL(28,12))) AS DOUBLE) AS total_z
           FROM idx GROUP BY 1 HAVING count(*) >= 3),
         zh AS (
           SELECT idx.l_partkey, cnt.m, cnt.total_z,
             CAST(sum(CAST(z * CASE WHEN i = 1.0
                 THEN pow(0.7, CAST(m AS DOUBLE) - i)
                 ELSE 0.3 * pow(0.7, CAST(m AS DOUBLE) - i) END
               AS DECIMAL(28,12))) AS DOUBLE) AS z_hat
           FROM idx JOIN cnt USING (l_partkey) GROUP BY 1, 2, 3),
         gh AS (
           SELECT idx.l_partkey,
             CAST(sum(CAST(g * CASE WHEN i - 1.0 = 1.0
                 THEN pow(0.7, CAST(m - 1 AS DOUBLE) - (i - 1.0))
                 ELSE 0.3 * pow(0.7, CAST(m - 1 AS DOUBLE) - (i - 1.0))
               END AS DECIMAL(28,12))) AS DOUBLE) AS g_hat
           FROM idx JOIN cnt USING (l_partkey)
           WHERE g IS NOT NULL GROUP BY 1)
         SELECT l_partkey, m AS n_periods,
           floor(z_hat * 1000000.0 + 0.5) / 1000000.0 AS z_hat,
           floor(g_hat * 1000000.0 + 0.5) / 1000000.0 AS g_hat,
           floor(z_hat / g_hat * 1000000.0 + 0.5) / 1000000.0
             AS demand_rate
         FROM zh JOIN gh USING (l_partkey)
         ORDER BY total_z DESC, l_partkey LIMIT 20""",
    "q_price_index" ->
      """WITH rows_ AS (
           SELECT CAST(o_orderdate AS DATE) AS d, l_partkey,
             l_quantity AS q,
             l_extendedprice * (1.0 - l_discount) AS rev
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         cut AS (SELECT min(d) + CAST(floor(
             date_diff('day', min(d), max(d)) / 2.0) AS INT) AS cut
           FROM rows_),
         per AS (
           SELECT l_partkey,
             sum(CASE WHEN d <= cut
               THEN CAST(floor(q * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) AS q1,
             sum(CASE WHEN d > cut
               THEN CAST(floor(q * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) AS q2,
             sum(CASE WHEN d <= cut
               THEN CAST(floor(rev * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) AS r1,
             sum(CASE WHEN d > cut
               THEN CAST(floor(rev * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) AS r2
           FROM rows_ CROSS JOIN cut GROUP BY 1
           HAVING sum(CASE WHEN d <= cut
               THEN CAST(floor(q * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) > 0
             AND sum(CASE WHEN d > cut
               THEN CAST(floor(q * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) > 0),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_common_parts,
             CAST(sum(CAST((CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)) *
               (CAST(q1 AS DOUBLE) / 1000000.0) AS DECIMAL(28,12)))
               AS DOUBLE) AS p2q1,
             CAST(sum(CAST((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) *
               (CAST(q1 AS DOUBLE) / 1000000.0) AS DECIMAL(28,12)))
               AS DOUBLE) AS p1q1,
             CAST(sum(CAST((CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)) *
               (CAST(q2 AS DOUBLE) / 1000000.0) AS DECIMAL(28,12)))
               AS DOUBLE) AS p2q2,
             CAST(sum(CAST((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) *
               (CAST(q2 AS DOUBLE) / 1000000.0) AS DECIMAL(28,12)))
               AS DOUBLE) AS p1q2
           FROM per)
         SELECT n_common_parts,
           floor(p2q1 / p1q1 * 1000000.0 + 0.5) / 1000000.0
             AS laspeyres,
           floor(p2q2 / p1q2 * 1000000.0 + 0.5) / 1000000.0 AS paasche,
           floor(sqrt((p2q1 / p1q1) * (p2q2 / p1q2)) * 1000000.0 + 0.5)
             / 1000000.0 AS fisher
         FROM m""",
    "q_retention_halflife" ->
      """WITH rows_ AS (
           SELECT user_id, CAST(ts AS DATE) AS d FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         cohorts AS (SELECT user_id, min(d) AS c FROM rows_ GROUP BY 1),
         tri AS (
           SELECT c, CAST(date_diff('day', c, d) AS BIGINT) AS k,
             CAST(count(DISTINCT rows_.user_id) AS BIGINT) AS n
           FROM rows_ JOIN cohorts USING (user_id) GROUP BY 1, 2),
         base AS (SELECT c, n AS b FROM tri WHERE k = 0),
         ld AS (SELECT max(c + CAST(k AS INT)) AS last_day FROM tri),
         offs AS (SELECT DISTINCT k FROM tri),
         den AS (
           SELECT k, CAST(sum(b) AS BIGINT) AS den
           FROM base CROSS JOIN offs CROSS JOIN ld
           WHERE date_diff('day', c, last_day) >= k GROUP BY 1),
         num AS (SELECT k, CAST(sum(n) AS BIGINT) AS num FROM tri
           GROUP BY 1),
         curve AS (
           SELECT CAST(k AS DOUBLE) AS x,
             ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) AS y
           FROM num JOIN den USING (k) WHERE k >= 1 AND num > 0),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_offsets,
             CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy
           FROM curve),
         f AS (
           SELECT n_offsets,
             (CAST(n_offsets AS DOUBLE) * sxy - sx * sy) /
               (CAST(n_offsets AS DOUBLE) * sxx - sx * sx) AS slope,
             sx, sy
           FROM m)
         SELECT n_offsets,
           floor(slope * 1000000.0 + 0.5) / 1000000.0 AS slope,
           floor((sy - slope * sx) / CAST(n_offsets AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS intercept,
           floor(CASE WHEN slope < 0.0 THEN -ln(2.0) / slope
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS half_life_days
         FROM f""",
    "q_uncertainty_batch" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, CASE WHEN len(toks) = 0 THEN 0
             ELSE CAST(floor(10000.0 * len(list_filter(toks,
               x -> list_contains(['the','and','of','is','to','a','in'],
                 x))) / len(toks) + 0.5) AS BIGINT) END AS sri
           FROM t),
         m AS (SELECT doc_id, sri, abs(sri - 5000) AS margin FROM s)
         SELECT doc_id, sri,
           floor(CAST(margin AS DOUBLE) / 10000.0 * 1000000.0 + 0.5)
             / 1000000.0 AS uncertainty
         FROM m ORDER BY margin, doc_id LIMIT 20""",
    "q_knee_point" ->
      """WITH t AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT y, CASE WHEN len(toks) = 0 THEN 0
             ELSE CAST(floor(10000.0 * len(list_filter(toks,
               x -> list_contains(['the','and','of','is','to','a','in'],
                 x))) / len(toks) + 0.5) AS BIGINT) END AS sri
           FROM t),
         census AS (
           SELECT sri, CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(y) AS BIGINT) AS pos_s
           FROM s GROUP BY 1),
         tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_docs,
             CAST(sum(pos_s) AS BIGINT) AS n_pos FROM census),
         pts AS (
           SELECT sri,
             CAST(sum(n_s) OVER (ORDER BY sri DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             CAST(sum(pos_s) OVER (ORDER BY sri DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_pos
           FROM census),
         sc AS (
           SELECT sri, cum_n, cum_pos, n_docs, n_pos,
             CAST(cum_pos AS DOUBLE) / CAST(n_pos AS DOUBLE) -
               CAST(cum_n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS sep
           FROM pts CROSS JOIN tot)
         SELECT sri AS knee_sri, cum_n AS n_kept,
           cum_pos AS pos_captured,
           floor(CAST(cum_n AS DOUBLE) / CAST(n_docs AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS frac_kept,
           floor(CAST(cum_pos AS DOUBLE) / CAST(n_pos AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS frac_pos,
           floor(sep * 1000000.0 + 0.5) / 1000000.0 AS separation
         FROM sc ORDER BY sep DESC, sri LIMIT 1""",
    "q_neyman_alloc" ->
      """WITH per AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             sqrt(greatest(
               CAST(sum(CAST(n_chars * n_chars AS DECIMAL(28,12)))
                 AS DOUBLE) / count(*) -
               (CAST(sum(CAST(n_chars AS DECIMAL(28,12))) AS DOUBLE)
                 / count(*)) *
               (CAST(sum(CAST(n_chars AS DECIMAL(28,12))) AS DOUBLE)
                 / count(*)), 0.0)) AS sigma
           FROM documents GROUP BY 1),
         tot AS (
           SELECT CAST(sum(CAST(CAST(n_docs AS DOUBLE) * sigma
               AS DECIMAL(28,12))) AS DOUBLE) AS w_tot,
             CAST(sum(n_docs) AS BIGINT) AS n_tot
           FROM per)
         SELECT source, n_docs,
           floor(sigma * 1000000.0 + 0.5) / 1000000.0 AS sigma,
           floor(CAST(n_docs AS DOUBLE) * sigma / w_tot
             * 1000000.0 + 0.5) / 1000000.0 AS neyman_share,
           least(n_docs, CAST(floor(1000.0 * (CAST(n_docs AS DOUBLE) *
             sigma / w_tot) + 0.5) AS BIGINT)) AS alloc_neyman,
           least(n_docs, CAST(floor(1000.0 * CAST(n_docs AS DOUBLE) /
             CAST(n_tot AS DOUBLE) + 0.5) AS BIGINT))
             AS alloc_proportional
         FROM per CROSS JOIN tot ORDER BY source""",
    "q_skip_stats" ->
      """WITH m AS (SELECT CAST(max(l_partkey) AS BIGINT) AS xmax,
           CAST(max(l_suppkey) AS BIGINT) AS ymax FROM lineitem),
         g AS (SELECT
             (CAST(l_partkey AS BIGINT) * 256) // (xmax + 1) AS xg,
             (CAST(l_suppkey AS BIGINT) * 256) // (ymax + 1) AS yg
           FROM lineitem, m),
         z AS (SELECT xg, yg, (((xg >> 0) & 1) << 0) | (((yg >> 0) & 1) << 1) | (((xg >> 1) & 1) << 2) | (((yg >> 1) & 1) << 3) | (((xg >> 2) & 1) << 4) | (((yg >> 2) & 1) << 5) | (((xg >> 3) & 1) << 6) | (((yg >> 3) & 1) << 7) | (((xg >> 4) & 1) << 8) | (((yg >> 4) & 1) << 9) | (((xg >> 5) & 1) << 10) | (((yg >> 5) & 1) << 11) | (((xg >> 6) & 1) << 12) | (((yg >> 6) & 1) << 13) | (((xg >> 7) & 1) << 14) | (((yg >> 7) & 1) << 15) AS z FROM g),
         nat AS (
           SELECT 'natural_x' AS layout,
             CASE WHEN max(xg) < 240 OR max(yg) < 240 THEN 1 ELSE 0 END
               AS prune_box,
             CASE WHEN max(yg) < 240 THEN 1 ELSE 0 END AS prune_y
           FROM z GROUP BY xg),
         zo AS (
           SELECT 'zorder' AS layout,
             CASE WHEN max(xg) < 240 OR max(yg) < 240 THEN 1 ELSE 0 END
               AS prune_box,
             CASE WHEN max(yg) < 240 THEN 1 ELSE 0 END AS prune_y
           FROM z GROUP BY z >> 8),
         u AS (SELECT * FROM nat UNION ALL SELECT * FROM zo)
         SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(prune_box) AS BIGINT) AS skip_corner_box,
           CAST(sum(prune_y) AS BIGINT) AS skip_y_only,
           floor(CAST(sum(prune_box) AS DOUBLE) /
             CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS skip_frac_box,
           floor(CAST(sum(prune_y) AS DOUBLE) /
             CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS skip_frac_y
         FROM u GROUP BY 1 ORDER BY 1""",
    "q_compaction_plan" ->
      """WITH files AS (
           SELECT source, doc_id // 50 AS file_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS bytes
           FROM documents GROUP BY 1, 2),
         c AS (
           SELECT *, CAST(sum(bytes) OVER (PARTITION BY source
               ORDER BY bytes DESC, file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM files),
         b AS (SELECT source, (cum - bytes) // 100000 AS bin,
             n_docs, n_files_1 AS nf, bytes
           FROM (SELECT c.*, 1 AS n_files_1 FROM c))
         SELECT source, CAST(bin AS BIGINT) AS bin,
           CAST(sum(nf) AS BIGINT) AS n_files,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           floor(CAST(sum(bytes) AS DOUBLE) / 100000.0
             * 1000000.0 + 0.5) / 1000000.0 AS fill_ratio
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_bloom_fpr" ->
      """SELECT
           CAST(sum(CASE WHEN p_partkey % 2 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_build,
           CAST(sum(CASE WHEN p_partkey % 2 = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_probe,
           TRUE AS fp_within_bound
         FROM part""",
    "q_watermark_sweep" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         h AS (
           SELECT us, max(us) OVER (PARTITION BY user_id
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hwm
           FROM e),
         l AS (SELECT hwm - us AS late_us FROM h
           WHERE hwm IS NOT NULL),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS d0,
             CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS d60,
             CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS d600,
             CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS d3600
           FROM l),
         u AS (
           SELECT CAST(0 AS BIGINT) AS delay_s, n_events,
             d0 AS n_dropped FROM m
           UNION ALL SELECT 60, n_events, d60 FROM m
           UNION ALL SELECT 600, n_events, d600 FROM m
           UNION ALL SELECT 3600, n_events, d3600 FROM m)
         SELECT delay_s, n_events, n_dropped,
           floor(CAST(n_dropped AS DOUBLE) / CAST(n_events AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS drop_rate
         FROM u ORDER BY delay_s""",
    "q_topk_drift" ->
      """WITH rows_ AS MATERIALIZED (
           SELECT CAST(o_orderdate AS DATE) AS d, l_partkey,
             l_extendedprice * (1.0 - l_discount) AS rev
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         cut AS MATERIALIZED (SELECT min(d) + CAST(floor(
             date_diff('day', min(d), max(d)) / 2.0) AS INT) AS cut
           FROM rows_),
         per AS MATERIALIZED (
           SELECT l_partkey,
             sum(CASE WHEN d <= cut
               THEN CAST(floor(rev * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) AS r1,
             sum(CASE WHEN d > cut
               THEN CAST(floor(rev * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END) AS r2
           FROM rows_ CROSS JOIN cut GROUP BY 1),
         a AS MATERIALIZED (SELECT l_partkey, rnk AS rank1 FROM (
             SELECT l_partkey, row_number() OVER
               (ORDER BY r1 DESC, l_partkey) AS rnk FROM per)
           WHERE rnk <= 20),
         b AS MATERIALIZED (SELECT l_partkey, rnk AS rank2 FROM (
             SELECT l_partkey, row_number() OVER
               (ORDER BY r2 DESC, l_partkey) AS rnk FROM per)
           WHERE rnk <= 20),
         i AS MATERIALIZED (
           SELECT CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(abs(rank1 - rank2)) AS BIGINT) AS shift_sum
           FROM a JOIN b USING (l_partkey)),
         t1 AS MATERIALIZED (SELECT l_partkey AS top1_h1 FROM a WHERE rank1 = 1),
         t2 AS MATERIALIZED (SELECT l_partkey AS top1_h2 FROM b WHERE rank2 = 1)
         SELECT CAST(20 AS BIGINT) AS k, n_common,
           floor(CAST(n_common AS DOUBLE) /
             (40.0 - CAST(n_common AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS jaccard,
           floor(CASE WHEN n_common > 0
             THEN CAST(shift_sum AS DOUBLE) / CAST(n_common AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS mean_rank_shift,
           top1_h1, top1_h2
         FROM i CROSS JOIN t1 CROSS JOIN t2""",
    "q_forecast_snaive" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2)
               AS DOUBLE) AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         sc AS (
           SELECT x, lag(x, 7) OVER (ORDER BY d) AS fc FROM daily),
         f AS (SELECT * FROM sc WHERE fc IS NOT NULL),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(abs(x - fc) AS DECIMAL(28,10))) AS DOUBLE)
               AS sae,
             CAST(sum(CAST((x - fc) * (x - fc) AS DECIMAL(28,10)))
               AS DOUBLE) AS sse,
             CAST(sum(CAST(abs(x - fc) / x AS DECIMAL(28,12)))
               AS DOUBLE) AS sape
           FROM f)
         SELECT 'seasonal_naive' AS model, n_days,
           floor(sae / CAST(n_days AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mae,
           floor(sqrt(sse / CAST(n_days AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS rmse,
           floor(sape / CAST(n_days AS DOUBLE) * 100.0
             * 1000000.0 + 0.5) / 1000000.0 AS mape_pct
         FROM m""",
    "q_revenue_var" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2)
               AS DOUBLE) AS x
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1),
         dl AS (
           SELECT x - lag(x, 1) OVER (ORDER BY d) AS dx FROM daily),
         d2 AS (SELECT dx FROM dl WHERE dx IS NOT NULL),
         v AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days,
             floor(quantile_cont(dx, 0.05) * 1000000.0 + 0.5)
               / 1000000.0 AS var_95
           FROM d2),
         cv AS (
           SELECT CAST(count(*) AS BIGINT) AS n_tail,
             CAST(sum(CAST(dx AS DECIMAL(28,10))) AS DOUBLE)
               / count(*) AS cvar_raw
           FROM d2 CROSS JOIN v WHERE dx <= var_95)
         SELECT n_days, var_95, n_tail,
           floor(cvar_raw * 1000000.0 + 0.5) / 1000000.0 AS cvar_95
         FROM v CROSS JOIN cv""",
    "q_split_contamination" ->
      """WITH fp AS (
           SELECT CASE
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 ::BIGINT % 100 < 80 THEN 'train'
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 ::BIGINT % 100 < 90 THEN 'val'
               ELSE 'test' END AS split,
             sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
               AS f
           FROM documents),
         tr AS (SELECT DISTINCT f FROM fp WHERE split = 'train'),
         u AS (
           SELECT 'test' AS split,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN f IN (SELECT f FROM tr) THEN 1 ELSE 0
               END) AS BIGINT) AS n_contaminated
           FROM fp WHERE split = 'test'
           UNION ALL
           SELECT 'val', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN f IN (SELECT f FROM tr) THEN 1 ELSE 0
               END) AS BIGINT)
           FROM fp WHERE split = 'val')
         SELECT split, n_docs, n_contaminated,
           floor(CASE WHEN n_docs > 0
             THEN CAST(n_contaminated AS DOUBLE) /
               CAST(n_docs AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS contamination_rate
         FROM u ORDER BY split""",
    "q_anomaly_consensus" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2)
               AS DOUBLE) AS v
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1),
         st AS (
           SELECT CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE)
               / count(*) AS mu,
             sqrt(greatest(
               CAST(sum(CAST(v * v AS DECIMAL(28,10))) AS DOUBLE)
                 / count(*) -
               (CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE)
                 / count(*)) *
               (CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE)
                 / count(*)), 0.0)) AS sd,
             quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.5) AS med,
             quantile_cont(v, 0.75) AS q3
           FROM daily),
         md AS (
           SELECT quantile_cont(abs(v - med), 0.5) AS mad
           FROM daily CROSS JOIN st),
         f AS (
           SELECT d, v,
             CASE WHEN sd > 0.0 AND abs(v - mu) > 2.0 * sd THEN 1
               ELSE 0 END AS z_flag,
             CASE WHEN v < q1 - 1.5 * (q3 - q1)
                    OR v > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END
               AS fence_flag,
             CASE WHEN mad > 0.0 AND abs(v - med) > 2.0 * 1.4826 * mad
               THEN 1 ELSE 0 END AS mad_flag
           FROM daily CROSS JOIN st CROSS JOIN md)
         SELECT d, v, z_flag, fence_flag, mad_flag,
           CAST(z_flag + fence_flag + mad_flag AS BIGINT) AS n_methods
         FROM f ORDER BY d""",
    "q_ccf" -> {
      // one arm per lag, generated from a single template so the SQL per
      // lag is literally identical to the Spark window expression
      val arms = (-7 to 7).map { k =>
        val shift =
          if (k >= 0) s"lead(cy, $k) OVER (ORDER BY d)"
          else s"lag(cy, ${-k}) OVER (ORDER BY d)"
        s"""SELECT CAST($k AS BIGINT) AS lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(cx * yk AS DECIMAL(28,10))) AS DOUBLE) AS num
           FROM (SELECT cx, $shift AS yk FROM c) s WHERE yk IS NOT NULL"""
      }.mkString("\n           UNION ALL\n           ")
      s"""WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,6))),
               2) AS DOUBLE) AS x,
             CAST(count(*) AS DOUBLE) AS y
           FROM events WHERE ts IS NOT NULL GROUP BY 1),
         st AS (
           SELECT
             CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) /
               CAST(count(*) AS DOUBLE) AS mx,
             CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) /
               CAST(count(*) AS DOUBLE) AS my
           FROM daily),
         c AS (SELECT d, x - st.mx AS cx, y - st.my AS cy
               FROM daily CROSS JOIN st),
         den AS (
           SELECT sqrt(
             CAST(sum(CAST(cx * cx AS DECIMAL(28,10))) AS DOUBLE) *
             CAST(sum(CAST(cy * cy AS DECIMAL(28,10))) AS DOUBLE)) AS den
           FROM c),
         arms AS (
           $arms)
         SELECT lag, n_pairs,
           floor(num / den * 1000000.0 + 0.5) / 1000000.0 AS ccf
         FROM arms CROSS JOIN den ORDER BY lag"""
    },
    "q_drawdown" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         d2 AS (
           SELECT d, x,
             max(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS peak,
             max(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) - x AS dd,
             row_number() OVER (ORDER BY d) AS rn
           FROM daily),
         uw AS (
           SELECT CAST(coalesce(max(len), 0) AS BIGINT)
             AS max_underwater_days
           FROM (SELECT grp, count(*) AS len FROM (
                   SELECT rn - row_number() OVER (ORDER BY rn) AS grp
                   FROM d2 WHERE dd > 0.0) g
                 GROUP BY grp) t),
         sel AS (
           SELECT dd, peak FROM d2 ORDER BY dd DESC, rn DESC LIMIT 1),
         w AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days,
             round(max(dd), 2) AS max_drawdown
           FROM d2)
         SELECT w.n_days, w.max_drawdown,
           floor((CASE WHEN sel.peak > 0.0 THEN sel.dd / sel.peak
                   ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0
             AS max_dd_pct,
           uw.max_underwater_days
         FROM w CROSS JOIN sel CROSS JOIN uw""",
    "q_msprt" ->
      """WITH pud AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
             max(CASE WHEN event_type = 'purchase' AND value > 90
                 THEN 1 ELSE 0 END) AS conv,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2 AS variant
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY user_id, CAST(ts AS DATE)),
         byday AS (
           SELECT d,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS ua,
             sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS ca,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS ub,
             sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS cb
           FROM pud GROUP BY d),
         cum AS (
           SELECT d,
             CAST(sum(ua) OVER w AS BIGINT) AS na,
             CAST(sum(ca) OVER w AS BIGINT) AS ka,
             CAST(sum(ub) OVER w AS BIGINT) AS nb,
             CAST(sum(cb) OVER w AS BIGINT) AS kb
           FROM byday
           WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)),
         sc AS (
           SELECT d, na, ka, nb, kb,
             CASE WHEN na > 0 AND nb > 0
               THEN kb * 1.0 / nb - ka * 1.0 / na ELSE 0.0 END AS theta,
             (ka + kb) * 1.0 / (na + nb) AS pool
           FROM cum),
         s2 AS (
           SELECT *, pool * (1.0 - pool) * (1.0 / na + 1.0 / nb) AS sig2
           FROM sc),
         lm AS (
           SELECT *,
             CASE WHEN na > 0 AND nb > 0 AND sig2 > 0.0
               THEN sqrt(sig2 / (sig2 + 0.0001)) *
                 exp(theta * theta * 0.0001 /
                   (2.0 * sig2 * (sig2 + 0.0001)))
               ELSE 1.0 END AS lambda
           FROM s2),
         p AS (
           SELECT *,
             floor(least(1.0, min(1.0 / lambda) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * 1000000.0 + 0.5) / 1000000.0 AS pav
           FROM lm)
         SELECT d, na AS users_a, ka AS conv_a, nb AS users_b,
           kb AS conv_b,
           floor(theta * 1000000.0 + 0.5) / 1000000.0 AS theta,
           floor(lambda * 1000000.0 + 0.5) / 1000000.0 AS lambda,
           pav AS p_always_valid,
           CAST(CASE WHEN pav <= 0.05 THEN 1 ELSE 0 END AS INT) AS reject
         FROM p ORDER BY d""",
    "q_forecast_combo" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         tt AS (
           SELECT d, x, row_number() OVER (ORDER BY d) AS t FROM daily),
         base AS (
           SELECT t, x,
             lag(x, 1) OVER w AS fc_naive,
             lag(x, 7) OVER w AS fc_snaive,
             (lag(x, 1) OVER w + lag(x, 2) OVER w + lag(x, 3) OVER w +
              lag(x, 4) OVER w + lag(x, 5) OVER w + lag(x, 6) OVER w +
              lag(x, 7) OVER w) / 7.0 AS fc_ma7
           FROM tt WINDOW w AS (ORDER BY t)),
         b2 AS (
           SELECT *, (fc_naive + fc_snaive + fc_ma7) / 3.0 AS fc_combo
           FROM base WHERE t >= 8),
         sc AS (
           SELECT 'naive' AS model, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(abs(x - fc_naive) AS DECIMAL(28,10)))
               AS DOUBLE) AS sae,
             CAST(sum(CAST((x - fc_naive) * (x - fc_naive)
               AS DECIMAL(28,10))) AS DOUBLE) AS sse
           FROM b2
           UNION ALL
           SELECT 'snaive', CAST(count(*) AS BIGINT),
             CAST(sum(CAST(abs(x - fc_snaive) AS DECIMAL(28,10)))
               AS DOUBLE),
             CAST(sum(CAST((x - fc_snaive) * (x - fc_snaive)
               AS DECIMAL(28,10))) AS DOUBLE)
           FROM b2
           UNION ALL
           SELECT 'ma7', CAST(count(*) AS BIGINT),
             CAST(sum(CAST(abs(x - fc_ma7) AS DECIMAL(28,10)))
               AS DOUBLE),
             CAST(sum(CAST((x - fc_ma7) * (x - fc_ma7)
               AS DECIMAL(28,10))) AS DOUBLE)
           FROM b2
           UNION ALL
           SELECT 'combo', CAST(count(*) AS BIGINT),
             CAST(sum(CAST(abs(x - fc_combo) AS DECIMAL(28,10)))
               AS DOUBLE),
             CAST(sum(CAST((x - fc_combo) * (x - fc_combo)
               AS DECIMAL(28,10))) AS DOUBLE)
           FROM b2)
         SELECT model, n_days,
           floor(sae / n_days * 1000000.0 + 0.5) / 1000000.0 AS mae,
           floor(sqrt(sse / n_days) * 1000000.0 + 0.5) / 1000000.0
             AS rmse
         FROM sc ORDER BY model""",
    "q_woe_iv" ->
      """WITH tgt AS (
           SELECT o_custkey AS c_custkey,
             max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS y
           FROM orders GROUP BY 1),
         base AS (
           SELECT c.c_mktsegment, c.c_acctbal, coalesce(t.y, 0) AS y
           FROM customer c LEFT JOIN tgt t ON c.c_custkey = t.c_custkey),
         feats AS (
           SELECT 'mktsegment' AS feature,
             coalesce(c_mktsegment, chr(1) || 'NULL') AS bin, y
           FROM base
           UNION ALL
           SELECT 'acctbal_band',
             coalesce(CAST(CAST(floor(c_acctbal / 2000.0) AS BIGINT)
               AS VARCHAR), chr(1) || 'NULL'), y
           FROM base),
         cells AS (
           SELECT feature, bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS goods,
             CAST(count(*) - sum(y) AS BIGINT) AS bads
           FROM feats GROUP BY 1, 2),
         tot AS (
           SELECT feature, CAST(sum(goods) AS BIGINT) AS g_tot,
             CAST(sum(bads) AS BIGINT) AS b_tot
           FROM cells GROUP BY 1),
         sc AS (
           SELECT c.feature, c.bin, c.n, c.goods, c.bads,
             ln(((c.goods + 0.5) / t.g_tot) /
                ((c.bads + 0.5) / t.b_tot)) AS woe_raw,
             CAST((c.goods * 1.0 / t.g_tot - c.bads * 1.0 / t.b_tot) *
               ln(((c.goods + 0.5) / t.g_tot) /
                  ((c.bads + 0.5) / t.b_tot)) AS DECIMAL(28,12)) AS iv_term
           FROM cells c JOIN tot t ON c.feature = t.feature)
         SELECT feature, bin, n, goods, bads,
           floor(woe_raw * 1000000.0 + 0.5) / 1000000.0 AS woe,
           floor(CAST(sum(iv_term) OVER (PARTITION BY feature) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS iv_feature
         FROM sc ORDER BY feature, bin""",
    "q_ipw_ate" ->
      """WITH units AS (
           SELECT c.c_mktsegment AS stratum,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END AS t,
             CAST(o.o_totalprice AS DOUBLE) AS y
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         st AS (
           SELECT stratum, CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(t) AS BIGINT) AS nt_s
           FROM units GROUP BY 1),
         se AS (
           SELECT stratum, CAST(nt_s AS DOUBLE) / n_s AS e FROM st
           WHERE CAST(nt_s AS DOUBLE) / n_s > 0.0
             AND CAST(nt_s AS DOUBLE) / n_s < 1.0),
         wt AS (
           SELECT u.t, u.y, se.e FROM units u
           JOIN se ON u.stratum = se.stratum),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(t) AS BIGINT) AS n_treated,
             CAST(sum(CAST(t * y / e AS DECIMAL(28,10))) AS DOUBLE)
               AS swy_t,
             CAST(sum(CAST(t / e AS DECIMAL(28,10))) AS DOUBLE) AS sw_t,
             CAST(sum(CAST((1 - t) * y / (1.0 - e) AS DECIMAL(28,10)))
               AS DOUBLE) AS swy_c,
             CAST(sum(CAST((1 - t) / (1.0 - e) AS DECIMAL(28,10)))
               AS DOUBLE) AS sw_c,
             CAST(sum(CAST(CASE WHEN t = 1 THEN y ELSE 0.0 END
               AS DECIMAL(28,10))) AS DOUBLE) AS sy_t,
             CAST(sum(CAST(CASE WHEN t = 0 THEN y ELSE 0.0 END
               AS DECIMAL(28,10))) AS DOUBLE) AS sy_c
           FROM wt)
         SELECT n_units, n_treated,
           floor((sy_t / n_treated - sy_c / (n_units - n_treated))
             * 1000000.0 + 0.5) / 1000000.0 AS naive_diff,
           floor((swy_t / sw_t - swy_c / sw_c) * 1000000.0 + 0.5)
             / 1000000.0 AS ate_ipw
         FROM agg""",
    "q_mcc" ->
      """WITH rows_ AS (
           SELECT user_id, CAST(ts AS DATE) AS d
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         cut AS (SELECT max(d) - 14 AS cutoff FROM rows_),
         per AS (SELECT user_id,
             CAST(date_diff('day', max(CASE WHEN d <= cutoff THEN d END),
               max(cutoff)) AS BIGINT) AS recency_days,
             CAST(max(CASE WHEN d > cutoff THEN 1 ELSE 0 END) AS INT)
               AS label_active
           FROM rows_ CROSS JOIN cut GROUP BY 1
           HAVING sum(CASE WHEN d <= cutoff THEN 1 ELSE 0 END) > 0),
         p AS (SELECT *, CASE WHEN recency_days <= 7 THEN 1 ELSE 0 END
             AS pred FROM per),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN pred = 1 AND label_active = 1 THEN 1
               ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred = 1 AND label_active = 0 THEN 1
               ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN pred = 0 AND label_active = 1 THEN 1
               ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN pred = 0 AND label_active = 0 THEN 1
               ELSE 0 END) AS BIGINT) AS tn
           FROM p),
         s2 AS (SELECT *,
             CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE) *
               CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)
               AS denom,
             CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) /
               CAST(tp + fn AS DOUBLE) ELSE 0.0 END AS tpr,
             CASE WHEN tn + fp > 0 THEN CAST(tn AS DOUBLE) /
               CAST(tn + fp AS DOUBLE) ELSE 0.0 END AS tnr
           FROM m)
         SELECT n_users, tp, fp, fn, tn,
           floor((CASE WHEN denom > 0.0
               THEN (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) -
                     CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) / sqrt(denom)
               ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS mcc,
           floor((tpr + tnr) / 2.0 * 1000000.0 + 0.5) / 1000000.0
             AS balanced_accuracy,
           floor((tpr + tnr - 1.0) * 1000000.0 + 0.5) / 1000000.0
             AS youden_j
         FROM s2""",
    "q_ridge" ->
      """WITH per AS (
           SELECT l_orderkey, CAST(count(*) AS DOUBLE) AS x1,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS x2
           FROM lineitem GROUP BY 1),
         units AS (
           SELECT p.x1, p.x2, CAST(o.o_totalprice AS DOUBLE) AS y
           FROM per p JOIN orders o ON p.l_orderkey = o.o_orderkey),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x1 AS DECIMAL(28,8))) AS DOUBLE) AS s1,
             CAST(sum(CAST(x2 AS DECIMAL(28,8))) AS DOUBLE) AS s2,
             CAST(sum(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x1 * x1 AS DECIMAL(28,8))) AS DOUBLE) AS s11,
             CAST(sum(CAST(x2 * x2 AS DECIMAL(28,8))) AS DOUBLE) AS s22,
             CAST(sum(CAST(y * y AS DECIMAL(28,8))) AS DOUBLE) AS syy,
             CAST(sum(CAST(x1 * x2 AS DECIMAL(28,8))) AS DOUBLE) AS s12,
             CAST(sum(CAST(x1 * y AS DECIMAL(28,8))) AS DOUBLE) AS s1y,
             CAST(sum(CAST(x2 * y AS DECIMAL(28,8))) AS DOUBLE) AS s2y
           FROM units),
         r AS (
           SELECT n,
             (n * s12 - s1 * s2) /
               sqrt((n * s11 - s1 * s1) * (n * s22 - s2 * s2)) AS r12,
             (n * s1y - s1 * sy) /
               sqrt((n * s11 - s1 * s1) * (n * syy - sy * sy)) AS r1y,
             (n * s2y - s2 * sy) /
               sqrt((n * s22 - s2 * s2) * (n * syy - sy * sy)) AS r2y
           FROM m),
         lam AS (SELECT 0.0 AS lambda UNION ALL SELECT 0.1
                 UNION ALL SELECT 1.0)
         SELECT lam.lambda, r.n,
           floor(r12 * 1000000.0 + 0.5) / 1000000.0 AS r12,
           floor(((1.0 + lam.lambda) * r1y - r12 * r2y) /
             ((1.0 + lam.lambda) * (1.0 + lam.lambda) - r12 * r12)
             * 1000000.0 + 0.5) / 1000000.0 AS beta1_std,
           floor(((1.0 + lam.lambda) * r2y - r12 * r1y) /
             ((1.0 + lam.lambda) * (1.0 + lam.lambda) - r12 * r12)
             * 1000000.0 + 0.5) / 1000000.0 AS beta2_std
         FROM r CROSS JOIN lam ORDER BY lam.lambda""",
    "q_collocations" ->
      """WITH toks AS (
           SELECT list_filter(string_split_regex(lower(text), '\s+'),
             x -> x <> '') AS toks FROM documents),
         grams AS (
           SELECT unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM toks WHERE len(toks) >= 2),
         cells AS (
           SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2,
             CAST(count(*) AS BIGINT) AS c12
           FROM grams GROUP BY 1, 2),
         m1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
                FROM cells GROUP BY 1),
         m2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2
                FROM cells GROUP BY 1),
         nt AS (SELECT CAST(sum(c12) AS DOUBLE) AS n FROM cells),
         j AS (
           SELECT c.w1, c.w2, CAST(c.c12 AS BIGINT) AS n_pair,
             CAST(c.c12 AS DOUBLE) AS k, CAST(m1.c1 AS DOUBLE) AS c1,
             CAST(m2.c2 AS DOUBLE) AS c2, nt.n
           FROM cells c
           JOIN m1 ON c.w1 = m1.w1 JOIN m2 ON c.w2 = m2.w2, nt
           WHERE c.c12 >= 20),
         t AS (
           SELECT w1, w2, n_pair, k, c1, c2, n,
             (CASE WHEN k > 0.0
                THEN k * ln(k * n / (c1 * c2)) ELSE 0.0 END +
              CASE WHEN c1 - k > 0.0
                THEN (c1 - k) * ln((c1 - k) * n / (c1 * (n - c2)))
                ELSE 0.0 END +
              CASE WHEN c2 - k > 0.0
                THEN (c2 - k) * ln((c2 - k) * n / ((n - c1) * c2))
                ELSE 0.0 END +
              CASE WHEN n - c1 - c2 + k > 0.0
                THEN (n - c1 - c2 + k) *
                  ln((n - c1 - c2 + k) * n / ((n - c1) * (n - c2)))
                ELSE 0.0 END) AS s
           FROM j)
         SELECT w1 || ' ' || w2 AS bigram, n_pair,
           CAST(CASE WHEN k * n > c1 * c2 THEN 1 ELSE 0 END AS INT)
             AS positive,
           floor(2.0 * s * 1000000.0 + 0.5) / 1000000.0 AS llr
         FROM t ORDER BY bigram""",
    "q_segment_ttr" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         nz AS (SELECT * FROM toks WHERE len(toks) > 0),
         segs AS (
           SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks) / 50.0) AS BIGINT)))
               AS seg
           FROM nz),
         cells AS (
           SELECT doc_id, seg,
             len(toks[(seg * 50 + 1):least((seg + 1) * 50, len(toks))])
               AS n_tok,
             len(list_distinct(
               toks[(seg * 50 + 1):least((seg + 1) * 50, len(toks))]))
               AS n_d
           FROM segs),
         ps AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(CAST(CAST(n_d AS DOUBLE) / n_tok
               AS DECIMAL(28,12))) AS DOUBLE) AS sttr_sum
           FROM cells GROUP BY 1),
         pd AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
           FROM nz)
         SELECT d.doc_id, d.n_tokens, s.n_segments,
           floor(CAST(d.n_distinct AS DOUBLE) / d.n_tokens
             * 1000000.0 + 0.5) / 1000000.0 AS ttr,
           floor(s.sttr_sum / s.n_segments * 1000000.0 + 0.5)
             / 1000000.0 AS sttr
         FROM pd d JOIN ps s ON d.doc_id = s.doc_id
         ORDER BY d.doc_id""",
    "q_rake_keywords" ->
      """WITH frags AS (
           SELECT unnest(string_split(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\s]', '|', 'g'),
             '\b(a|the|of|and|in|to|is|on|for|with|as|by|at|or|be)\b',
             '|', 'g'), '|')) AS frag
           FROM documents),
         cand AS (
           SELECT array_to_string(list_filter(string_split_regex(frag,
             '\s+'), x -> x <> ''), ' ') AS phrase,
             len(list_filter(string_split_regex(frag, '\s+'),
               x -> x <> '')) AS nw
           FROM frags),
         pc AS (
           SELECT phrase, CAST(count(*) AS BIGINT) AS n
           FROM cand WHERE nw BETWEEN 1 AND 3 GROUP BY 1),
         pw AS (SELECT phrase, n, string_split(phrase, ' ') AS words
                FROM pc),
         wx AS (SELECT unnest(words) AS w, n,
                  CAST(len(words) AS BIGINT) AS l FROM pw),
         ws AS (SELECT w, CAST(sum(n) AS BIGINT) AS freq,
                  CAST(sum(n * l) AS BIGINT) AS degree
                FROM wx GROUP BY 1),
         px AS (SELECT phrase, n, unnest(string_split(phrase, ' ')) AS w
                FROM pc WHERE n >= 5),
         sc AS (SELECT p.phrase, p.n,
                  CAST(s.degree AS DOUBLE) / s.freq AS wsc
                FROM px p JOIN ws s ON p.w = s.w)
         SELECT phrase, n, CAST(count(*) AS BIGINT) AS n_words,
           floor(CAST(sum(CAST(wsc AS DECIMAL(28,12))) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS rake_score
         FROM sc GROUP BY phrase, n ORDER BY phrase""",
    "q_key_discovery" -> (KeyDiscoveryCombos.map { combo =>
      val cols = combo.mkString(",")
      // NULL convention (matches Spark's countDistinct): a tuple containing
      // any NULL is NOT a distinct value — the composite subquery filters
      // all-columns-NOT-NULL so both engines agree on nullable tables too
      // (single-column count(DISTINCT c) already ignores NULLs in both).
      val distinctExpr =
        if (combo.length == 1) s"count(DISTINCT ${combo.head})"
        else {
          val notNull = combo.map(c => s"$c IS NOT NULL").mkString(" AND ")
          s"(SELECT count(*) FROM (SELECT DISTINCT $cols FROM orders WHERE $notNull))"
        }
      s"""SELECT 'orders' AS table_name, '$cols' AS columns,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST($distinctExpr AS BIGINT) AS n_distinct,
            CAST(CASE WHEN $distinctExpr = count(*) THEN 1 ELSE 0 END
              AS INT) AS is_key,
            floor(CAST($distinctExpr AS DOUBLE) / count(*)
              * 1000000.0 + 0.5) / 1000000.0 AS uniqueness
          FROM orders"""
    }.mkString("\n          UNION ALL\n          ") +
      "\n          ORDER BY table_name, columns"),
    "q_mix_variance" ->
      """WITH units AS (
           SELECT c.c_mktsegment AS segment,
             o.o_orderdate < DATE '1998-01-01' AS p1, o.o_totalprice
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         cells AS (
           SELECT segment,
             CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
             CAST(round(sum(CAST(CASE WHEN p1 THEN o_totalprice
               ELSE 0.0 END AS DECIMAL(28,6))), 2) AS DOUBLE) AS r1,
             CAST(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT)
               AS q2,
             CAST(round(sum(CAST(CASE WHEN NOT p1 THEN o_totalprice
               ELSE 0.0 END AS DECIMAL(28,6))), 2) AS DOUBLE) AS r2
           FROM units GROUP BY 1),
         tot AS (SELECT CAST(sum(q1) AS BIGINT) AS qt1,
                   CAST(sum(q2) AS BIGINT) AS qt2 FROM cells)
         SELECT segment, q1, q2, r1, r2,
           floor((r2 / q2 - r1 / q1) * q2 * 1000000.0 + 0.5)
             / 1000000.0 AS price_effect,
           floor(q1 * (CAST(qt2 AS DOUBLE) / qt1 - 1.0) * (r1 / q1)
             * 1000000.0 + 0.5) / 1000000.0 AS volume_effect,
           floor((q2 - q1 * (CAST(qt2 AS DOUBLE) / qt1)) * (r1 / q1)
             * 1000000.0 + 0.5) / 1000000.0 AS mix_effect,
           round(r2 - r1, 2) AS delta
         FROM cells CROSS JOIN tot
         WHERE q1 > 0 AND q2 > 0
         ORDER BY segment""",
    "q_markov_attribution" -> {
      // The absorption iteration is GENERATED from one template so each
      // recursive-CTE step is literally the Scala driver loop's fixed
      // left-associated term order (state order: start,click,error,
      // signup,view; removed channel's terms omitted in its variant).
      val chans = Seq("click", "error", "signup", "view")
      val trans = "start" +: chans
      val tos = chans :+ "conv"
      val pmCols = (for (f <- trans; t <- tos) yield
        s"""coalesce(max(CASE WHEN f = '$f' AND t = '$t'
              THEN CAST(n AS DOUBLE) / rowsum END), 0.0) AS p_${f}_$t""")
        .mkString(",\n             ")
      def stepExpr(target: String, removed: Option[String]): String =
        trans.filterNot(removed.contains)
          .map(s => s"v_$s * p_${s}_$target").mkString(" + ")
      def iterCte(name: String, removed: Option[String]): String = {
        val nvs = chans.map { c =>
          if (removed.contains(c)) "CAST(0.0 AS DOUBLE)"
          else stepExpr(c, removed)
        }
        s"""it_$name AS (
           SELECT 0 AS i, CAST(1.0 AS DOUBLE) AS v_start,
             CAST(0.0 AS DOUBLE) AS v_click,
             CAST(0.0 AS DOUBLE) AS v_error,
             CAST(0.0 AS DOUBLE) AS v_signup,
             CAST(0.0 AS DOUBLE) AS v_view,
             CAST(0.0 AS DOUBLE) AS acc
           UNION ALL
           SELECT i + 1, CAST(0.0 AS DOUBLE), ${nvs.mkString(",\n             ")},
             acc + (${stepExpr("conv", removed)})
           FROM it_$name, pm WHERE i < 50)"""
      }
      val iterCtes = (iterCte("base", None) +:
        chans.map(c => iterCte(c, Some(c)))).mkString(",\n         ")
      s"""WITH RECURSIVE rows_ AS (
           SELECT user_id, ts, event_id, event_type FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IN
               ('click', 'error', 'signup', 'view', 'purchase')),
         seq0 AS MATERIALIZED (
           SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase'
               THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS journey
           FROM rows_),
         tr AS (
           SELECT coalesce(lag(event_type) OVER (
               PARTITION BY user_id, journey ORDER BY ts, event_id),
             'start') AS f,
             CASE WHEN event_type = 'purchase' THEN 'conv'
               ELSE event_type END AS t
           FROM seq0),
         term AS (
           SELECT event_type AS f, 'null' AS t FROM (
             SELECT event_type, row_number() OVER (
               PARTITION BY user_id, journey
               ORDER BY ts DESC, event_id DESC) AS rn
             FROM seq0) x
           WHERE rn = 1 AND event_type <> 'purchase'),
         cnt AS MATERIALIZED (
           SELECT f, t, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT * FROM tr UNION ALL SELECT * FROM term) u
           GROUP BY 1, 2),
         rs AS (SELECT f, CAST(sum(n) AS BIGINT) AS rowsum
                FROM cnt GROUP BY 1),
         pm AS MATERIALIZED (
           SELECT $pmCols
           FROM cnt JOIN rs USING (f)),
         $iterCtes,
         sel AS (
           SELECT (SELECT acc FROM it_base WHERE i = 50) AS b,
             (SELECT acc FROM it_click WHERE i = 50) AS a_click,
             (SELECT acc FROM it_error WHERE i = 50) AS a_error,
             (SELECT acc FROM it_signup WHERE i = 50) AS a_signup,
             (SELECT acc FROM it_view WHERE i = 50) AS a_view),
         tt AS (
           SELECT *, (b - a_click) + (b - a_error) + (b - a_signup) +
             (b - a_view) AS tot
           FROM sel),
         res AS (
           SELECT 'click' AS channel, b, a_click AS a, tot FROM tt
           UNION ALL SELECT 'error', b, a_error, tot FROM tt
           UNION ALL SELECT 'signup', b, a_signup, tot FROM tt
           UNION ALL SELECT 'view', b, a_view, tot FROM tt)
         SELECT channel,
           floor(b * 1000000.0 + 0.5) / 1000000.0 AS p_conv_base,
           floor(a * 1000000.0 + 0.5) / 1000000.0 AS p_conv_removed,
           floor((b - a) * 1000000.0 + 0.5) / 1000000.0
             AS removal_effect,
           floor((CASE WHEN tot <> 0.0 THEN (b - a) / tot ELSE 0.0 END)
             * 1000000.0 + 0.5) / 1000000.0 AS share
         FROM res ORDER BY channel"""
    },
    "q_pq_recall" ->
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cb0 AS (
           SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS cid
           FROM base ORDER BY vec_id LIMIT 16),
         cb AS (
           SELECT ms.m, cid, e[(ms.m*16+1):(ms.m*16+16)] AS cent
           FROM cb0, (SELECT unnest(range(0, 4)) AS m) ms),
         subs AS (
           SELECT vec_id, ms.m, e[(ms.m*16+1):(ms.m*16+16)] AS sub
           FROM base, (SELECT unnest(range(0, 4)) AS m) ms),
         asg AS (
           SELECT vec_id, m, cent FROM (
             SELECT s.vec_id, s.m, c.cent,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY round(list_sum(list_transform(range(1, 17),
                   i -> (s.sub[i] - c.cent[i]) * (s.sub[i] - c.cent[i])
                 )), 6), c.cid) AS rn
             FROM subs s JOIN cb c ON s.m = c.m) t
           WHERE rn = 1),
         rec AS (
           SELECT vec_id, flatten(list(cent ORDER BY m)) AS r
           FROM asg GROUP BY 1),
         wn AS (
           SELECT b.vec_id, b.e, rec.r FROM base b JOIN rec USING (vec_id)),
         q AS (
           SELECT vec_id AS query_id, e AS qe FROM base
           WHERE vec_id % 10 = 0),
         pairs AS (
           SELECT q.query_id, w.vec_id AS neighbor_id,
             round(list_cosine_similarity(w.e, q.qe), 6) AS sim_e,
             round(list_cosine_similarity(w.r, q.qe), 6) AS sim_adc
           FROM wn w CROSS JOIN q WHERE w.vec_id <> q.query_id),
         r AS (
           SELECT *,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_e DESC, neighbor_id) AS rk_e,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_adc DESC, neighbor_id) AS rk_a
           FROM pairs)
         SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rk_e <= 10 AND rk_a <= 10 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hits,
           round(CAST(sum(CASE WHEN rk_e <= 10 AND rk_a <= 10 THEN 1
             ELSE 0 END) AS DOUBLE) /
             (count(DISTINCT query_id) * 10), 6) AS recall
         FROM r""",
    "q_stream_interval_join" ->
      """WITH c AS (
           SELECT user_id, event_id AS click_id, ts AS c_ts FROM events
           WHERE event_type = 'click' AND user_id IS NOT NULL
             AND ts IS NOT NULL),
         p AS (
           SELECT user_id, event_id AS purchase_id, ts AS p_ts
           FROM events
           WHERE event_type = 'purchase' AND user_id IS NOT NULL
             AND ts IS NOT NULL)
         SELECT c.user_id, c.click_id, p.purchase_id,
           CAST(date_diff('second', c.c_ts, p.p_ts) AS BIGINT) AS gap_sec
         FROM c JOIN p ON c.user_id = p.user_id
           AND p.p_ts >= c.c_ts
           AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE
         ORDER BY 1, 2, 3""",
    "q_shapley_attribution" ->
      """WITH units AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               + max(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END)
               + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
               + max(CASE WHEN event_type = 'view' THEN 8 ELSE 0 END)
               AS BIGINT) AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         census AS (
           SELECT mask, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS DOUBLE) / count(*) AS v
           FROM units GROUP BY 1),
         chan AS (
           SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
             ('error', CAST(2 AS BIGINT)), ('signup', CAST(4 AS BIGINT)),
             ('view', CAST(8 AS BIGINT))) AS t(channel, bit)),
         terms AS (
           SELECT c.channel, s.n,
             CAST((CASE (CASE WHEN (s.mask & 1) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN (s.mask & 2) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN (s.mask & 4) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN (s.mask & 8) > 0 THEN 1 ELSE 0 END - 1)
               WHEN 0 THEN 6.0 WHEN 1 THEN 2.0 WHEN 2 THEN 2.0
               ELSE 6.0 END
               * (s.v - coalesce(s0.v, 0.0))) AS DECIMAL(28,12)) AS t
           FROM census s JOIN chan c ON (s.mask & c.bit) <> 0
           LEFT JOIN census s0 ON s.mask - c.bit = s0.mask
           UNION ALL
           SELECT c.channel, CAST(0 AS BIGINT) AS n,
             CAST(-(CASE (CASE WHEN (s.mask & 1) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN (s.mask & 2) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN (s.mask & 4) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN (s.mask & 8) > 0 THEN 1 ELSE 0 END)
               WHEN 0 THEN 6.0 WHEN 1 THEN 2.0 WHEN 2 THEN 2.0
               ELSE 6.0 END
               * s.v) AS DECIMAL(28,12)) AS t
           FROM census s JOIN chan c ON (s.mask & c.bit) = 0
           WHERE NOT EXISTS (SELECT 1 FROM census s1
             WHERE s1.mask = s.mask + c.bit))
         SELECT channel, CAST(sum(n) AS BIGINT) AS n_units,
           floor(CAST(sum(t) AS DOUBLE) / 24.0 * 1000000.0 + 0.5)
             / 1000000.0 AS shapley
         FROM terms GROUP BY 1 ORDER BY 1""",
    "q_kneser_ney" ->
      """WITH toksT AS (
           SELECT list_filter(string_split_regex(lower(text), '\s+'),
             x -> x <> '') AS toks
           FROM documents WHERE doc_id % 10 <> 9),
         toksE AS (
           SELECT list_filter(string_split_regex(lower(text), '\s+'),
             x -> x <> '') AS toks
           FROM documents WHERE doc_id % 10 = 9),
         gt AS (
           SELECT unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM toksT WHERE len(toks) >= 2),
         ge AS (
           SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2
           FROM (SELECT unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
             FROM toksE WHERE len(toks) >= 2)),
         bc AS (
           SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2,
             CAST(count(*) AS BIGINT) AS c12
           FROM gt GROUP BY 1, 2),
         heads AS (
           SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1p_head
           FROM bc GROUP BY 1),
         cont AS (
           SELECT w2, CAST(count(*) AS BIGINT) AS n1p_cont
           FROM bc GROUP BY 1),
         big AS (SELECT CAST(count(*) AS DOUBLE) AS bb FROM bc),
         scored AS (
           SELECT h.c1,
             CASE WHEN h.c1 IS NULL THEN NULL ELSE
               greatest(CAST(coalesce(b.c12, 0) AS DOUBLE) - 0.75, 0.0)
                 / CAST(h.c1 AS DOUBLE)
               + 0.75 * CAST(h.n1p_head AS DOUBLE)
                 / CAST(h.c1 AS DOUBLE)
                 * (CAST(coalesce(ct.n1p_cont, 0) AS DOUBLE) / big.bb)
             END AS p
           FROM ge
           LEFT JOIN heads h ON ge.w1 = h.w1
           LEFT JOIN bc b ON ge.w1 = b.w1 AND ge.w2 = b.w2
           LEFT JOIN cont ct ON ge.w2 = ct.w2, big)
         SELECT CAST(count(*) AS BIGINT) AS n_eval_bigrams,
           CAST(sum(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_scored,
           CAST(count(*) - sum(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_skipped,
           floor(CAST(sum(CAST(ln(greatest(p, 1.0e-12))
               AS DECIMAL(28,12))) AS DOUBLE)
             / sum(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END)
             * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob,
           floor(exp(-(CAST(sum(CAST(ln(greatest(p, 1.0e-12))
               AS DECIMAL(28,12))) AS DOUBLE)
             / sum(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END)))
             * 1000000.0 + 0.5) / 1000000.0 AS perplexity
         FROM scored""",
    "q_gopher_repetition" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         arms AS (SELECT * FROM (VALUES (2, 0.20, 0.20),
           (3, 0.18, 0.18)) AS t(n, thr_dup, thr_top)),
         grams AS (
           SELECT t.doc_id, a.n, a.thr_dup, a.thr_top,
             unnest(list_transform(range(1, len(t.toks) - a.n + 2),
               i -> array_to_string(t.toks[i:i+a.n-1], ' '))) AS g
           FROM toks t JOIN arms a ON len(t.toks) >= a.n),
         census AS (
           SELECT doc_id, n, thr_dup, thr_top, g,
             CAST(count(*) AS BIGINT) AS c
           FROM grams GROUP BY 1, 2, 3, 4, 5),
         per AS (
           SELECT doc_id, n, thr_dup, thr_top,
             CAST(sum(c) AS BIGINT) AS n_grams,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(c) AS BIGINT) AS top_c
           FROM census GROUP BY 1, 2, 3, 4)
         SELECT doc_id, CAST(n AS BIGINT) AS n, n_grams,
           floor((1.0 - CAST(n_distinct AS DOUBLE)
             / CAST(n_grams AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
             AS dup_frac,
           floor(CAST(top_c AS DOUBLE) / CAST(n_grams AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS top_share,
           CAST(CASE WHEN (1.0 - CAST(n_distinct AS DOUBLE)
               / CAST(n_grams AS DOUBLE)) <= thr_dup
             AND CAST(top_c AS DOUBLE) / CAST(n_grams AS DOUBLE)
               <= thr_top THEN 1 ELSE 0 END AS INT) AS keep
         FROM per ORDER BY doc_id, n""",
    "q_hill_tail" ->
      """WITH top AS (
           SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
           ORDER BY x DESC LIMIT 101),
         a AS (
           SELECT CAST(sum(CAST(ln(x) AS DECIMAL(28,12))) AS DOUBLE) AS s,
             min(x) AS xb
           FROM top)
         SELECT CAST(100 AS BIGINT) AS k, round(xb, 2) AS x_boundary,
           floor(((s - ln(xb)) / 100.0 - ln(xb)) * 1000000.0 + 0.5)
             / 1000000.0 AS hill_h,
           floor(1.0 / ((s - ln(xb)) / 100.0 - ln(xb))
             * 1000000.0 + 0.5) / 1000000.0 AS tail_alpha
         FROM a""",
    "q_kruskal_wallis" ->
      """WITH per AS (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         cells AS (
           SELECT p.x, c.c_mktsegment AS g, CAST(count(*) AS BIGINT) AS nxg
           FROM per p JOIN customer c ON p.o_custkey = c.c_custkey
           GROUP BY 1, 2),
         census AS (
           SELECT x, CAST(sum(nxg) AS BIGINT) AS t FROM cells GROUP BY 1),
         ranked AS (
           SELECT x, t, CAST(coalesce(sum(t) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS below
           FROM census),
         grp AS (
           SELECT cl.g, CAST(sum(cl.nxg) AS BIGINT) AS n_g,
             sum(CAST(CAST(cl.nxg AS DOUBLE) * (CAST(r.below AS DOUBLE)
               + (CAST(r.t AS DOUBLE) + 1.0) / 2.0) AS DECIMAL(28,12)))
               AS r_g
           FROM cells cl JOIN ranked r ON cl.x = r.x GROUP BY 1),
         ties AS (
           SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum FROM census),
         m AS (
           SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(CAST(CAST(r_g AS DOUBLE) * CAST(r_g AS DOUBLE)
               / CAST(n_g AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS rr
           FROM grp)
         SELECT m.n, m.n_groups - 1 AS df,
           floor((12.0 / (CAST(m.n AS DOUBLE) * (CAST(m.n AS DOUBLE)
               + 1.0)) * m.rr - 3.0 * (CAST(m.n AS DOUBLE) + 1.0))
             * 1000000.0 + 0.5) / 1000000.0 AS h,
           floor((1.0 - CAST(t.tsum AS DOUBLE)
               / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                 * CAST(m.n AS DOUBLE) - CAST(m.n AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS tie_correction,
           floor((CASE WHEN (1.0 - CAST(t.tsum AS DOUBLE)
               / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                 * CAST(m.n AS DOUBLE) - CAST(m.n AS DOUBLE))) > 0.0
             THEN (12.0 / (CAST(m.n AS DOUBLE) * (CAST(m.n AS DOUBLE)
               + 1.0)) * m.rr - 3.0 * (CAST(m.n AS DOUBLE) + 1.0))
             / (1.0 - CAST(t.tsum AS DOUBLE)
               / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                 * CAST(m.n AS DOUBLE) - CAST(m.n AS DOUBLE)))
             ELSE 0.0 END)
             * 1000000.0 + 0.5) / 1000000.0 AS h_corrected
         FROM m, ties t""",
    "q_eb_shrinkage" ->
      """WITH per AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS x
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         pr AS (
           SELECT user_id, n, x, CAST(x AS DOUBLE) / n AS p FROM per),
         mom AS (
           SELECT CAST(count(*) AS BIGINT) AS nu,
             CAST(sum(CAST(p AS DECIMAL(28,12))) AS DOUBLE) AS sp,
             CAST(sum(CAST(p * p AS DECIMAL(28,12))) AS DOUBLE) AS spp
           FROM pr),
         m1 AS (
           SELECT nu, spp, sp / CAST(nu AS DOUBLE) AS mu FROM mom),
         m2 AS (
           SELECT mu, (spp - CAST(nu AS DOUBLE) * mu * mu)
             / (CAST(nu AS DOUBLE) - 1.0) AS v
           FROM m1),
         m3 AS (
           SELECT mu, v, mu * (1.0 - mu) / v - 1.0 AS mm FROM m2),
         prior AS (
           SELECT CASE WHEN v > 0.0 AND mm > 0.0 THEN mu * mm END
               AS alpha,
             CASE WHEN v > 0.0 AND mm > 0.0 THEN (1.0 - mu) * mm END
               AS beta
           FROM m3)
         SELECT user_id, n AS n_events, x AS n_purchases,
           floor(p * 1000000.0 + 0.5) / 1000000.0 AS raw_rate,
           floor(CASE WHEN alpha IS NOT NULL THEN
               (CAST(x AS DOUBLE) + alpha)
               / (CAST(n AS DOUBLE) + alpha + beta)
             ELSE p END * 1000000.0 + 0.5) / 1000000.0 AS shrunk_rate,
           floor(alpha * 1000000.0 + 0.5) / 1000000.0 AS alpha,
           floor(beta * 1000000.0 + 0.5) / 1000000.0 AS beta
         FROM pr, prior
         ORDER BY shrunk_rate DESC, user_id LIMIT 20""",
    "q_term_burstiness" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         tf AS (
           SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
           GROUP BY 1, 2),
         st AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS cf
           FROM tf GROUP BY 1 HAVING count(*) >= 25),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
         SELECT term, df, cf,
           floor(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS burstiness,
           floor((CAST(cf AS DOUBLE) / CAST(nd AS DOUBLE))
             / (1.0 - exp(-(CAST(cf AS DOUBLE) / CAST(nd AS DOUBLE))))
             * 1000000.0 + 0.5) / 1000000.0 AS poisson_expected,
           floor((CAST(cf AS DOUBLE) / CAST(df AS DOUBLE))
             / ((CAST(cf AS DOUBLE) / CAST(nd AS DOUBLE))
               / (1.0 - exp(-(CAST(cf AS DOUBLE) / CAST(nd AS DOUBLE)))))
             * 1000000.0 + 0.5) / 1000000.0 AS burst_ratio
         FROM st, nd
         ORDER BY burstiness DESC, term LIMIT 20""",
    "q_heaps_law" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         tf AS (
           SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
           GROUP BY 1, 2),
         mx AS (SELECT max(doc_id) AS max_id FROM documents),
         wb AS (
           SELECT t.doc_id, t.term, t.tf,
             least(CAST(floor(t.doc_id * 10 / (m.max_id + 1)) AS BIGINT),
               9) AS bucket
           FROM tf t, mx m),
         tp AS (
           SELECT bucket, CAST(sum(tf) AS BIGINT) AS n_tokens
           FROM wb GROUP BY 1),
         nv AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS new_terms
           FROM (SELECT term, min(bucket) AS bucket FROM wb GROUP BY 1)
           GROUP BY 1),
         curve AS (
           SELECT tp.bucket, tp.n_tokens,
             CAST(coalesce(nv.new_terms, 0) AS BIGINT) AS new_terms,
             CAST(sum(tp.n_tokens) OVER (ORDER BY tp.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS tokens_cum,
             CAST(sum(coalesce(nv.new_terms, 0)) OVER (ORDER BY tp.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS vocab_cum
           FROM tp LEFT JOIN nv ON tp.bucket = nv.bucket),
         ols AS (
           SELECT CAST(count(*) AS DOUBLE) AS mq,
             CAST(sum(CAST(ln(CAST(tokens_cum AS DOUBLE))
               AS DECIMAL(28,12))) AS DOUBLE) AS st,
             CAST(sum(CAST(ln(CAST(vocab_cum AS DOUBLE))
               AS DECIMAL(28,12))) AS DOUBLE) AS sv,
             CAST(sum(CAST(ln(CAST(tokens_cum AS DOUBLE))
                 * ln(CAST(tokens_cum AS DOUBLE))
               AS DECIMAL(28,12))) AS DOUBLE) AS stt,
             CAST(sum(CAST(ln(CAST(tokens_cum AS DOUBLE))
                 * ln(CAST(vocab_cum AS DOUBLE))
               AS DECIMAL(28,12))) AS DOUBLE) AS stv
           FROM curve)
         SELECT bucket, n_tokens, new_terms, tokens_cum, vocab_cum,
           floor((mq * stv - st * sv) / (mq * stt - st * st)
             * 1000000.0 + 0.5) / 1000000.0 AS heaps_beta,
           floor(exp(sv / mq - ((mq * stv - st * sv)
               / (mq * stt - st * st)) * (st / mq))
             * 1000000.0 + 0.5) / 1000000.0 AS heaps_k
         FROM curve, ols ORDER BY bucket""",
    "q_simpson_check" ->
      """WITH base AS (
           SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
           FROM lineitem),
         pg AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy
           FROM base GROUP BY 1),
         pool AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy
           FROM base)
         SELECT pg.g AS stratum, pg.n,
           floor((CAST(pg.n AS DOUBLE) * pg.sxy - pg.sx * pg.sy)
             / (CAST(pg.n AS DOUBLE) * pg.sxx - pg.sx * pg.sx)
             * 1000000.0 + 0.5) / 1000000.0 AS slope_stratum,
           floor((CAST(pool.n AS DOUBLE) * pool.sxy - pool.sx * pool.sy)
             / (CAST(pool.n AS DOUBLE) * pool.sxx - pool.sx * pool.sx)
             * 1000000.0 + 0.5) / 1000000.0 AS slope_pooled,
           CAST(CASE WHEN sign((CAST(pg.n AS DOUBLE) * pg.sxy
               - pg.sx * pg.sy) / (CAST(pg.n AS DOUBLE) * pg.sxx
               - pg.sx * pg.sx))
             <> sign((CAST(pool.n AS DOUBLE) * pool.sxy
               - pool.sx * pool.sy) / (CAST(pool.n AS DOUBLE) * pool.sxx
               - pool.sx * pool.sx)) THEN 1 ELSE 0 END AS INT)
             AS sign_flip
         FROM pg, pool ORDER BY 1""",
    "q_anova_f" ->
      """WITH per AS (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         units AS (
           SELECT c.c_mktsegment AS g, p.x FROM per p
           JOIN customer c ON p.o_custkey = c.c_custkey),
         gs AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(x) AS DOUBLE) AS s_g,
             CAST(sum(x * x) AS DOUBLE) AS ss_g
           FROM units GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(s_g AS DECIMAL(38,12))) AS DOUBLE) AS s
           FROM gs),
         terms AS (
           SELECT t.n, t.k,
             CAST(CAST(n_g AS DOUBLE)
               * (s_g / CAST(n_g AS DOUBLE) - s / CAST(n AS DOUBLE))
               * (s_g / CAST(n_g AS DOUBLE) - s / CAST(n AS DOUBLE))
               AS DECIMAL(38,12)) AS ssb_t,
             CAST(ss_g - s_g * s_g / CAST(n_g AS DOUBLE)
               AS DECIMAL(38,12)) AS ssw_t
           FROM gs, tot t),
         m AS (
           SELECT n, k, CAST(sum(ssb_t) AS DOUBLE) AS ssb,
             CAST(sum(ssw_t) AS DOUBLE) AS ssw
           FROM terms GROUP BY 1, 2)
         SELECT n, k - 1 AS df_between, n - k AS df_within,
           floor(ssb * 1000000.0 + 0.5) / 1000000.0 AS ss_between,
           floor(ssw * 1000000.0 + 0.5) / 1000000.0 AS ss_within,
           floor((ssb / CAST(k - 1 AS DOUBLE))
             / (ssw / CAST(n - k AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS f
         FROM m""",
    "q_levene" ->
      """WITH per AS (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         units AS (
           SELECT c.c_mktsegment AS g, p.x FROM per p
           JOIN customer c ON p.o_custkey = c.c_custkey),
         means AS (
           SELECT g, CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS m_g
           FROM units GROUP BY 1),
         z AS (
           SELECT u.g, abs(CAST(u.x AS DOUBLE) - mn.m_g) AS z
           FROM units u JOIN means mn ON u.g = mn.g),
         gs AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(z AS DECIMAL(38,12))) AS DOUBLE) AS s_g,
             CAST(sum(CAST(z * z AS DECIMAL(38,12))) AS DOUBLE) AS ss_g
           FROM z GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(s_g AS DECIMAL(38,12))) AS DOUBLE) AS s
           FROM gs),
         terms AS (
           SELECT t.n, t.k,
             CAST(CAST(n_g AS DOUBLE)
               * (s_g / CAST(n_g AS DOUBLE) - s / CAST(n AS DOUBLE))
               * (s_g / CAST(n_g AS DOUBLE) - s / CAST(n AS DOUBLE))
               AS DECIMAL(38,12)) AS ssb_t,
             CAST(ss_g - s_g * s_g / CAST(n_g AS DOUBLE)
               AS DECIMAL(38,12)) AS ssw_t
           FROM gs, tot t),
         m AS (
           SELECT n, k, CAST(sum(ssb_t) AS DOUBLE) AS ssb,
             CAST(sum(ssw_t) AS DOUBLE) AS ssw
           FROM terms GROUP BY 1, 2)
         SELECT n, k - 1 AS df_between, n - k AS df_within,
           floor(ssb * 1000000.0 + 0.5) / 1000000.0 AS ss_between,
           floor(ssw * 1000000.0 + 0.5) / 1000000.0 AS ss_within,
           floor((ssb / CAST(k - 1 AS DOUBLE))
             / (ssw / CAST(n - k AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS f
         FROM m""",
    "q_bitext_mine" ->
      """WITH wn AS (
           SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         p AS (
           SELECT a.vec_id AS ida, b.vec_id AS idb,
             round(list_cosine_similarity(a.e, b.e), 6) AS sim
           FROM wn a JOIN wn b
           ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
         fr AS (
           SELECT *, row_number() OVER (PARTITION BY ida
             ORDER BY sim DESC, idb) AS rk FROM p),
         fwd AS (
           SELECT ida, max(CASE WHEN rk = 1 THEN idb END) AS best_idb,
             max(CASE WHEN rk = 1 THEN sim END) AS sim_ida,
             CAST(sum(CASE WHEN rk <= 4
                 THEN CAST(sim AS DECIMAL(28,12)) END) AS DOUBLE)
               / CAST(sum(CASE WHEN rk <= 4 THEN 1 ELSE 0 END)
                 AS DOUBLE) AS den_ida
           FROM fr GROUP BY 1),
         br AS (
           SELECT *, row_number() OVER (PARTITION BY idb
             ORDER BY sim DESC, ida) AS rk FROM p),
         bwd AS (
           SELECT idb, max(CASE WHEN rk = 1 THEN ida END) AS best_ida,
             CAST(sum(CASE WHEN rk <= 4
                 THEN CAST(sim AS DECIMAL(28,12)) END) AS DOUBLE)
               / CAST(sum(CASE WHEN rk <= 4 THEN 1 ELSE 0 END)
                 AS DOUBLE) AS den_idb
           FROM br GROUP BY 1)
         SELECT f.ida AS src_id, f.best_idb AS dst_id, f.sim_ida AS sim,
           floor(f.sim_ida / ((f.den_ida + b.den_idb) / 2.0)
             * 1000000.0 + 0.5) / 1000000.0 AS margin
         FROM fwd f JOIN bwd b
           ON f.best_idb = b.idb AND b.best_ida = f.ida
         ORDER BY margin DESC, src_id""",
    "q_bitext_mine_lsh" ->
      s"""${lshPlanesCte(4)},
         bk AS (
           SELECT e.vec_id, e.embedding,
             CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), i ->
                    e.embedding[i]::DOUBLE * pl.p[i])) >= 0
                  THEN (1::BIGINT << pl.b) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings e CROSS JOIN planes pl
           GROUP BY e.vec_id, e.embedding),
         wn AS (
           SELECT vec_id, embedding::DOUBLE[] AS e, bucket FROM bk),
         cand AS (
           SELECT a.vec_id AS ida, b.vec_id AS idb,
             round(list_cosine_similarity(a.e, b.e), 6) AS sim
           FROM wn a JOIN wn b ON a.bucket = b.bucket
             AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
         cfr AS (
           SELECT *, row_number() OVER (PARTITION BY ida
             ORDER BY sim DESC, idb) AS rk FROM cand),
         cfwd AS (
           SELECT ida, max(CASE WHEN rk = 1 THEN idb END) AS best_idb,
             max(CASE WHEN rk = 1 THEN sim END) AS sim_ida,
             CAST(sum(CASE WHEN rk <= 4
                 THEN CAST(sim AS DECIMAL(28,12)) END) AS DOUBLE)
               / CAST(sum(CASE WHEN rk <= 4 THEN 1 ELSE 0 END)
                 AS DOUBLE) AS den_ida
           FROM cfr GROUP BY 1),
         cbr AS (
           SELECT *, row_number() OVER (PARTITION BY idb
             ORDER BY sim DESC, ida) AS rk FROM cand),
         cbwd AS (
           SELECT idb, max(CASE WHEN rk = 1 THEN ida END) AS best_ida,
             CAST(sum(CASE WHEN rk <= 4
                 THEN CAST(sim AS DECIMAL(28,12)) END) AS DOUBLE)
               / CAST(sum(CASE WHEN rk <= 4 THEN 1 ELSE 0 END)
                 AS DOUBLE) AS den_idb
           FROM cbr GROUP BY 1),
         mined AS (
           SELECT f.ida AS src_id, f.best_idb AS dst_id, f.sim_ida AS sim,
             floor(f.sim_ida / ((f.den_ida + b.den_idb) / 2.0)
               * 1000000.0 + 0.5) / 1000000.0 AS margin
           FROM cfwd f JOIN cbwd b
             ON f.best_idb = b.idb AND b.best_ida = f.ida),
         p AS (
           SELECT a.vec_id AS ida, b.vec_id AS idb,
             round(list_cosine_similarity(a.e, b.e), 6) AS sim
           FROM wn a JOIN wn b
           ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
         fr AS (
           SELECT *, row_number() OVER (PARTITION BY ida
             ORDER BY sim DESC, idb) AS rk FROM p),
         fwd AS (
           SELECT ida, max(CASE WHEN rk = 1 THEN idb END) AS best_idb
           FROM fr GROUP BY 1),
         br AS (
           SELECT *, row_number() OVER (PARTITION BY idb
             ORDER BY sim DESC, ida) AS rk FROM p),
         bwd AS (
           SELECT idb, max(CASE WHEN rk = 1 THEN ida END) AS best_ida
           FROM br GROUP BY 1),
         exact AS (
           SELECT f.ida AS src_id, f.best_idb AS dst_id
           FROM fwd f JOIN bwd b
             ON f.best_idb = b.idb AND b.best_ida = f.ida),
         audit AS (
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact)
               AS n_exact_pairs,
             (SELECT CAST(count(*) AS BIGINT) FROM mined m
               JOIN exact e ON m.src_id = e.src_id
                 AND m.dst_id = e.dst_id) AS n_hits)
         SELECT m.src_id, m.dst_id, m.sim, m.margin, a.n_exact_pairs,
           CASE WHEN a.n_exact_pairs > 0
             THEN floor(CAST(a.n_hits AS DOUBLE)
               / CAST(a.n_exact_pairs AS DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0
             ELSE 0.0 END AS recall_vs_exact
         FROM mined m, audit a
         ORDER BY m.margin DESC, m.src_id""",
    "q_tfidf_pairs" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         tf AS (
           SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
           GROUP BY 1, 2),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         dfs AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
           GROUP BY 1 HAVING count(*) >= 2 AND count(*) <= 500),
         posts AS (
           SELECT t.doc_id, t.term,
             (1.0 + ln(CAST(t.tf AS DOUBLE)))
               * ln(CAST(nd.n_docs AS DOUBLE) / CAST(f.df AS DOUBLE)) AS w
           FROM tf t JOIN dfs f ON t.term = f.term, nd),
         norms AS (
           SELECT doc_id, sqrt(CAST(sum(CAST(w * w AS DECIMAL(28,12)))
             AS DOUBLE)) AS nrm
           FROM posts GROUP BY 1),
         wn AS (
           SELECT p.term, p.doc_id, p.w / n.nrm AS wn
           FROM posts p JOIN norms n ON p.doc_id = n.doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared_terms,
             CAST(sum(CAST(a.wn * b.wn AS DECIMAL(28,12))) AS DOUBLE) AS s
           FROM wn a JOIN wn b
             ON a.term = b.term AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, n_shared_terms,
           floor(s * 1000000.0 + 0.5) / 1000000.0 AS cosine
         FROM pairs ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""",
    "q_adstock" -> (AdstockDecays.map { lam =>
      val wts = Iterator.iterate(1.0)(_ * lam).take(15).toSeq
      val wCase = wts.zipWithIndex
        .map { case (w, i) => s"WHEN $i THEN $w" }.mkString(" ")
      s"""SELECT * FROM (
           WITH daily AS (
             SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 AS BIGINT) AS clicks,
               CAST(round(sum(CAST(CASE WHEN event_type = 'purchase'
                   THEN coalesce(value, 0.0) ELSE 0.0 END
                 AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
             FROM events WHERE ts IS NOT NULL GROUP BY 1),
           band AS (
             SELECT a.d AS t, a.revenue, b.clicks,
               date_diff('day', b.d, a.d) AS kk
             FROM daily a JOIN daily b
               ON date_diff('day', b.d, a.d) BETWEEN 0 AND 14),
           ad AS (
             SELECT t, revenue,
               CAST(sum(CAST((CASE kk $wCase END)
                 * CAST(clicks AS DOUBLE) AS DECIMAL(38,12)))
                 AS DOUBLE) AS x
             FROM band GROUP BY 1, 2),
           mm AS (
             SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
               CAST(sum(CAST(revenue AS DECIMAL(38,12))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(revenue * revenue AS DECIMAL(38,12)))
                 AS DOUBLE) AS syy,
               CAST(sum(CAST(x * revenue AS DECIMAL(38,12))) AS DOUBLE)
                 AS sxy
             FROM ad)
           SELECT $lam AS decay, n AS n_days,
             floor((CAST(n AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                 * (CAST(n AS DOUBLE) * syy - sy * sy))
               * 1000000.0 + 0.5) / 1000000.0 AS corr_revenue
           FROM mm)"""
    }.mkString("\n          UNION ALL\n          ") +
      "\n          ORDER BY decay"),
    "q_mcnemar" ->
      """WITH rows_ AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
             coalesce(value, 0.0) AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         cut AS (SELECT max(d) - 14 AS cutoff FROM rows_),
         tsf AS (
           SELECT user_id,
             CAST(count(DISTINCT CASE WHEN d <= cutoff THEN d END)
               AS BIGINT) AS days_active,
             CAST(date_diff('day',
               max(CASE WHEN d <= cutoff THEN d END), max(cutoff))
               AS BIGINT) AS recency_days,
             CAST(max(CASE WHEN d > cutoff THEN 1 ELSE 0 END) AS INT)
               AS label_active
           FROM rows_ CROSS JOIN cut GROUP BY 1
           HAVING sum(CASE WHEN d <= cutoff THEN 1 ELSE 0 END) > 0),
         pred AS (
           SELECT CASE WHEN (CASE WHEN recency_days <= 7 THEN 1 ELSE 0
               END) = label_active THEN 1 ELSE 0 END AS ra,
             CASE WHEN (CASE WHEN days_active >= 5 THEN 1 ELSE 0 END)
               = label_active THEN 1 ELSE 0 END AS rb
           FROM tsf),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS both_right,
             CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS both_wrong
           FROM pred)
         SELECT n_users, both_right, b, c, both_wrong,
           floor((CAST(both_right AS DOUBLE) + CAST(b AS DOUBLE))
             / CAST(n_users AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS acc_recency,
           floor((CAST(both_right AS DOUBLE) + CAST(c AS DOUBLE))
             / CAST(n_users AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS acc_frequency,
           floor(CASE WHEN CAST(b AS DOUBLE) + CAST(c AS DOUBLE) > 0.0
             THEN (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
               * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
               / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0 AS chi2,
           floor(CASE WHEN CAST(b AS DOUBLE) + CAST(c AS DOUBLE) > 0.0
             THEN (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
               * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
               / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0 AS chi2_cc
         FROM m""",
    "q_permutation_test" -> {
      val nPerms = 40
      def bitSql(suffix: String) =
        s"('0x' || substr(md5(CAST(user_id AS VARCHAR)$suffix), 1, 15))" +
          "::BIGINT % 2"
      val permCols = (1 to nPerms).map { p =>
        val b = bitSql(s" || ':$p'")
        s"""CAST(sum(CASE WHEN $b = 0 THEN x ELSE 0 END) AS BIGINT)
              AS s0_$p,
            CAST(sum(CASE WHEN $b = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n0_$p"""
      }.mkString(",\n            ")
      def diffSql(s0: String, n0: String) =
        s"""CASE WHEN $n0 > 0 AND n - $n0 > 0
            THEN CAST($s0 AS DOUBLE) / CAST($n0 AS DOUBLE)
              - (CAST(s AS DOUBLE) - CAST($s0 AS DOUBLE))
                / CAST(n - $n0 AS DOUBLE)
            ELSE 0.0 END"""
      val exceed = (1 to nPerms).map { p =>
        s"CASE WHEN abs(${diffSql(s"s0_$p", s"n0_$p")}) >= " +
          s"abs(${diffSql("s0g", "n0g")}) THEN 1 ELSE 0 END"
      }.mkString(" + ")
      s"""WITH per AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events
           WHERE user_id IS NOT NULL GROUP BY 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CASE WHEN ${bitSql("")} = 0 THEN x ELSE 0 END)
               AS BIGINT) AS s0g,
             CAST(sum(CASE WHEN ${bitSql("")} = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n0g,
            $permCols
           FROM per),
         e AS (
           SELECT n, s, s0g, n0g,
             CAST($exceed AS BIGINT) AS exceed FROM m)
         SELECT n AS n_users,
           floor(${diffSql("s0g", "n0g")} * 1000000.0 + 0.5) / 1000000.0
             AS diff_obs,
           CAST($nPerms AS BIGINT) AS n_perms, exceed AS n_exceed,
           floor((1.0 + CAST(exceed AS DOUBLE)) / ${nPerms + 1}.0
             * 1000000.0 + 0.5) / 1000000.0 AS p_value
         FROM e"""
    },
    "q_pairwise_contrasts" ->
      """WITH per AS (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         units AS (
           SELECT c.c_mktsegment AS g, p.x FROM per p
           JOIN customer c ON p.o_custkey = c.c_custkey),
         gs AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(x) AS DOUBLE) AS s_g,
             CAST(sum(x * x) AS DOUBLE) AS ss_g
           FROM units GROUP BY 1),
         mw AS (
           SELECT CAST(sum(CAST(ss_g - s_g * s_g / CAST(n_g AS DOUBLE)
               AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(sum(n_g) - count(*) AS DOUBLE) AS msw
           FROM gs)
         SELECT a.g AS g_a, b.g AS g_b, a.n_g AS n_a, b.n_g AS n_b,
           floor(a.s_g / CAST(a.n_g AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_a,
           floor(b.s_g / CAST(b.n_g AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_b,
           floor((a.s_g / CAST(a.n_g AS DOUBLE)
             - b.s_g / CAST(b.n_g AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS diff,
           floor(sqrt(mw.msw * (1.0 / CAST(a.n_g AS DOUBLE)
             + 1.0 / CAST(b.n_g AS DOUBLE))) * 1000000.0 + 0.5)
             / 1000000.0 AS se,
           floor((a.s_g / CAST(a.n_g AS DOUBLE)
               - b.s_g / CAST(b.n_g AS DOUBLE))
             / sqrt(mw.msw * (1.0 / CAST(a.n_g AS DOUBLE)
               + 1.0 / CAST(b.n_g AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS t
         FROM gs a JOIN gs b ON a.g < b.g, mw
         ORDER BY 1, 2""",
    "q_lang_vocab_overlap" ->
      """WITH toks AS (
           SELECT doc_id, lang, list_filter(string_split_regex(
             lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
         lt AS (
           SELECT DISTINCT lang, tok AS term
           FROM (SELECT lang, unnest(toks) AS tok FROM toks)),
         sizes AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS v FROM lt GROUP BY 1),
         inter AS (
           SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM lt a JOIN lt b
             ON a.term = b.term AND a.lang < b.lang
           GROUP BY 1, 2)
         SELECT i.lang_a, i.lang_b, sa.v AS v_a, sb.v AS v_b, i.n_shared,
           floor(CAST(i.n_shared AS DOUBLE)
             / CAST(sa.v + sb.v - i.n_shared AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS vocab_jaccard
         FROM inter i
         JOIN sizes sa ON i.lang_a = sa.lang
         JOIN sizes sb ON i.lang_b = sb.lang
         ORDER BY 1, 2""",
    "q_isotropy" -> isotropyOracleSql,
    "q_whitening_isotropy" ->
      s"""WITH iso AS (SELECT * FROM ($isotropyOracleSql) isosub),
         base AS (
           SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ex AS (
           SELECT vec_id, i, e[i + 1] AS xi
           FROM base CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ii),
         ds0 AS (
           SELECT i, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(CAST(floor(xi * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e12 AS sx,
             CAST(sum(CAST(floor(xi * xi * 1e12 + 0.5) AS BIGINT))
               AS DOUBLE) / 1e12 AS sxx
           FROM ex GROUP BY 1),
         ds AS (
           SELECT i, sx / CAST(nd AS DOUBLE) AS mu,
             sqrt(greatest(sxx / CAST(nd AS DOUBLE)
               - (sx / CAST(nd AS DOUBLE)) * (sx / CAST(nd AS DOUBLE)),
               1.0e-12)) AS sd
           FROM ds0),
         w AS (
           SELECT vec_id, i, (xi - mu) / sd AS w
           FROM ex JOIN ds USING (i)),
         nrm AS (
           SELECT vec_id,
             sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE))
               AS nrm
           FROM w GROUP BY 1),
         ntot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nrm),
         units AS (
           SELECT i,
             CAST(sum(CAST(floor((CASE WHEN nrm <> 0.0
               THEN w / (CASE WHEN nrm <> 0.0 THEN nrm ELSE 1.0 END)
               ELSE 0.0 END) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e12 AS su
           FROM w JOIN nrm USING (vec_id) GROUP BY 1),
         ssuw AS (
           SELECT CAST(sum(CAST(su * su AS DECIMAL(38,12))) AS DOUBLE)
             AS ssu_w
           FROM units),
         fin AS (
           SELECT n, ssu_w, iso.mean_cosine AS mcr,
             floor((ssu_w - CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
               * 1000000.0 + 0.5) / 1000000.0 AS mcw
           FROM ntot CROSS JOIN ssuw CROSS JOIN iso)
         SELECT n AS n_vectors, CAST(64 AS BIGINT) AS dim,
           mcr AS mean_cosine_raw, mcw AS mean_cosine_whitened,
           floor((mcr - mcw) * 1000000.0 + 0.5) / 1000000.0
             AS anisotropy_removed,
           CAST(CASE WHEN abs(mcw) < abs(mcr) THEN 1 ELSE 0 END AS INT)
             AS whitening_helps
         FROM fin""",
    "q_tail_dependence" ->
      """WITH base AS (
           SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DOUBLE) AS x,
             CAST(l_quantity AS DOUBLE) AS y
           FROM lineitem),
         n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
         tx AS (
           SELECT x AS thr_x FROM (
             SELECT x, CAST(row_number() OVER (ORDER BY x, l_orderkey,
               l_linenumber) AS BIGINT) AS rn
             FROM base) r CROSS JOIN n0
           WHERE rn = greatest(CAST(ceil(0.95 * CAST(n AS DOUBLE))
             AS BIGINT), 1)),
         ty AS (
           SELECT y AS thr_y FROM (
             SELECT y, CAST(row_number() OVER (ORDER BY y, l_orderkey,
               l_linenumber) AS BIGINT) AS rn
             FROM base) r CROSS JOIN n0
           WHERE rn = greatest(CAST(ceil(0.95 * CAST(n AS DOUBLE))
             AS BIGINT), 1)),
         folds AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             max(thr_x) AS thr_x, max(thr_y) AS thr_y,
             CAST(sum(CASE WHEN x > thr_x THEN 1 ELSE 0 END) AS BIGINT)
               AS nx,
             CAST(sum(CASE WHEN y > thr_y THEN 1 ELSE 0 END) AS BIGINT)
               AS ny,
             CAST(sum(CASE WHEN x > thr_x AND y > thr_y THEN 1 ELSE 0
               END) AS BIGINT) AS nj
           FROM base CROSS JOIN tx CROSS JOIN ty)
         SELECT n AS n_rows,
           floor(thr_x * 1000000.0 + 0.5) / 1000000.0 AS price_q95,
           floor(thr_y * 1000000.0 + 0.5) / 1000000.0 AS qty_q95,
           nx AS n_price_exceed, ny AS n_qty_exceed,
           nj AS n_joint_exceed,
           floor(CASE WHEN ny > 0 AND nx > 0
             THEN CAST(nj AS DOUBLE) / CAST(greatest(ny, 1) AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS lambda_upper,
           floor(CASE WHEN ny > 0 AND nx > 0
             THEN CAST(nx AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS indep_baseline,
           CAST(CASE WHEN ny > 0 AND nx > 0 AND
               CAST(nj AS DOUBLE) / CAST(greatest(ny, 1) AS DOUBLE)
                 > 2.0 * (CAST(nx AS DOUBLE)
                   / CAST(greatest(n, 1) AS DOUBLE))
             THEN 1 ELSE 0 END AS INT) AS tail_dependent_at_2x
         FROM folds""",
    "q_record_counts" ->
      s"""WITH $dailyCte,
         flagged AS (
           SELECT x,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
             max(x) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prevmax
           FROM daily),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CASE WHEN prevmax IS NULL OR x > prevmax THEN 1
               ELSE 0 END) AS BIGINT) AS n_records,
             CAST(sum(CAST(1.0 / CAST(rn AS DOUBLE) AS DECIMAL(28,12)))
               AS DOUBLE) AS h1,
             CAST(sum(CAST(1.0 / CAST(rn * rn AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) AS h2
           FROM flagged),
         fin AS (
           SELECT *, h1 - h2 AS var_r,
             (CAST(n_records AS DOUBLE) - h1)
               / sqrt(CASE WHEN h1 - h2 > 0.0 THEN h1 - h2 ELSE 1.0 END)
               AS z
           FROM m)
         SELECT n_days, n_records,
           floor(h1 * 1000000.0 + 0.5) / 1000000.0 AS expected_records,
           floor(CASE WHEN var_r > 0.0 THEN var_r ELSE 0.0 END
             * 1000000.0 + 0.5) / 1000000.0 AS var_records,
           floor(CASE WHEN var_r > 0.0 THEN z ELSE 0.0 END
             * 1000000.0 + 0.5) / 1000000.0 AS z_stat,
           CAST(CASE WHEN var_r > 0.0 AND z > 1.96 THEN 1
                WHEN var_r > 0.0 AND z < -1.96 THEN -1
                ELSE 0 END AS INT) AS drift_at_196
         FROM fin""",
    "q_diebold_mariano" ->
      s"""WITH $dailyCte,
         lagged AS (
           SELECT x, lag(x, 7) OVER (ORDER BY d) AS f1,
             lag(x, 1) OVER (ORDER BY d) AS f2
           FROM daily),
         rows_ AS (
           SELECT x, (x - f1) * (x - f1) AS l1,
             (x - f2) * (x - f2) AS l2
           FROM lagged WHERE f1 IS NOT NULL AND f2 IS NOT NULL),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l1 AS DECIMAL(38,12))) AS DOUBLE) AS sl1,
             CAST(sum(CAST(l2 AS DECIMAL(38,12))) AS DOUBLE) AS sl2,
             CAST(sum(CAST(l1 - l2 AS DECIMAL(38,12))) AS DOUBLE) AS sd,
             CAST(sum(CAST((l1 - l2) * (l1 - l2) AS DECIMAL(38,12)))
               AS DOUBLE) AS sdd
           FROM rows_),
         c1 AS (
           SELECT n, sl1, sl2,
             sd / CAST(greatest(n, 1) AS DOUBLE) AS mean_d,
             sdd / CAST(greatest(n, 1) AS DOUBLE)
               - (sd / CAST(greatest(n, 1) AS DOUBLE))
                 * (sd / CAST(greatest(n, 1) AS DOUBLE)) AS var_d
           FROM m),
         c2 AS (
           SELECT *,
             mean_d / sqrt(CASE WHEN var_d > 0.0
               THEN var_d / CAST(greatest(n, 1) AS DOUBLE)
               ELSE 1.0 END) AS dm,
             (n > 1 AND var_d > 0.0) AS ok
           FROM c1)
         SELECT n AS n_days,
           floor(sl1 / CAST(greatest(n, 1) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS mse_snaive,
           floor(sl2 / CAST(greatest(n, 1) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS mse_naive,
           floor(mean_d * 1000000.0 + 0.5) / 1000000.0
             AS mean_loss_diff,
           floor(CASE WHEN ok THEN dm ELSE 0.0 END * 1000000.0 + 0.5)
             / 1000000.0 AS dm_stat,
           CAST(CASE WHEN ok AND dm < -1.96 THEN 1
                WHEN ok AND dm > 1.96 THEN -1
                ELSE 0 END AS INT) AS snaive_better_at_196
         FROM c2""",
    "q_pinball_loss" -> {
      val arms = Seq(0.1, 0.5, 0.9).map { t =>
        val t1 = t - 1.0
        s"""SELECT CAST($t AS DOUBLE) AS tau,
             CAST(count(*) AS BIGINT) AS n_days,
             floor(CAST(sum(CAST(greatest($t * err, $t1 * err)
               AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(greatest(count(*), 1) AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0 AS pinball,
             floor(CAST(sum(CAST(abs(err) AS DECIMAL(38,12)))
               AS DOUBLE) / CAST(greatest(count(*), 1) AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0 AS mae
           FROM rows_"""
      }.mkString(" UNION ALL ")
      s"""WITH $dailyCte,
         lagged AS (
           SELECT x, lag(x, 7) OVER (ORDER BY d) AS yhat FROM daily),
         rows_ AS (
           SELECT x - yhat AS err FROM lagged WHERE yhat IS NOT NULL)
         SELECT * FROM ($arms) ORDER BY tau"""
    },
    "q_cluster_validity" ->
      """WITH c AS MATERIALIZED (
           SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id % 40 = 0),
         assign AS MATERIALIZED (
           SELECT emb.embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(emb.embedding::DOUBLE[],
               emb.embedding::DOUBLE[])) AS nrm,
             a.cid
           FROM (SELECT vec_id, cid FROM (
               SELECT emb.vec_id, c.centroid_id AS cid,
                 row_number() OVER (PARTITION BY emb.vec_id ORDER BY
                   round(list_cosine_similarity(emb.embedding::DOUBLE[],
                     c.ce), 6) DESC, c.centroid_id) AS rn
               FROM embeddings emb CROSS JOIN c)
             WHERE rn = 1) a
           JOIN embeddings emb ON emb.vec_id = a.vec_id),
         cd AS MATERIALIZED (
           SELECT cid, i,
             CAST(sum(CAST(e[i + 1] AS DECIMAL(38,12))) AS DOUBLE)
               AS sxi
           FROM assign CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ii
           GROUP BY 1, 2),
         perc AS MATERIALIZED (
           SELECT cid, CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(CAST(nrm * nrm AS DECIMAL(38,12))) AS DOUBLE)
               AS ssq
           FROM assign GROUP BY 1),
         s2 AS MATERIALIZED (
           SELECT cid,
             CAST(sum(CAST(sxi * sxi AS DECIMAL(38,12))) AS DOUBLE)
               AS s2
           FROM cd GROUP BY 1),
         clusters AS MATERIALIZED (
           SELECT p.cid, p.nk, p.ssq, s.s2,
             p.ssq - s.s2 / CAST(p.nk AS DOUBLE) AS wk,
             sqrt(greatest((p.ssq - s.s2 / CAST(p.nk AS DOUBLE))
               / CAST(p.nk AS DOUBLE), 0.0)) AS sk
           FROM perc p JOIN s2 s ON p.cid = s.cid),
         gdim AS MATERIALIZED (
           SELECT CAST(sum(CAST(gx * gx AS DECIMAL(38,12))) AS DOUBLE)
             AS g2
           FROM (SELECT i,
             CAST(sum(CAST(sxi AS DECIMAL(38,12))) AS DOUBLE) AS gx
             FROM cd GROUP BY 1)),
         tot AS MATERIALIZED (
           SELECT CAST(count(*) AS BIGINT) AS kk,
             CAST(sum(nk) AS BIGINT) AS nn,
             CAST(sum(CAST(wk AS DECIMAL(38,12))) AS DOUBLE) AS w_tot,
             CAST(sum(CAST(s2 / CAST(nk AS DOUBLE) AS DECIMAL(38,12)))
               AS DOUBLE) AS bplus
           FROM clusters),
         mj AS MATERIALIZED (
           SELECT cd.cid, cd.i, cd.sxi / CAST(cl.nk AS DOUBLE) AS mu
           FROM cd JOIN clusters cl ON cd.cid = cl.cid),
         paird AS MATERIALIZED (
           SELECT a.cid AS ca, b.cid AS cb,
             sqrt(greatest(CAST(sum(CAST((a.mu - b.mu) * (a.mu - b.mu)
               AS DECIMAL(38,12))) AS DOUBLE), 0.0)) AS dij
           FROM mj a JOIN mj b ON a.i = b.i AND a.cid <> b.cid
           GROUP BY 1, 2),
         dbper AS MATERIALIZED (
           SELECT ca,
             max(CASE WHEN dij <> 0.0
               THEN (sa.sk + sb.sk)
                 / (CASE WHEN dij <> 0.0 THEN dij ELSE 1.0 END)
               ELSE 0.0 END) AS ri,
             CAST(sum(CASE WHEN dij = 0.0 AND ca < cb THEN 1 ELSE 0
               END) AS BIGINT) AS degi
           FROM paird p
           JOIN clusters sa ON p.ca = sa.cid
           JOIN clusters sb ON p.cb = sb.cid
           GROUP BY 1),
         dbm AS MATERIALIZED (
           SELECT CAST(count(*) AS BIGINT) AS kdb,
             CAST(sum(CAST(ri AS DECIMAL(38,12))) AS DOUBLE) AS sri,
             CAST(sum(degi) AS BIGINT) AS deg_pairs
           FROM dbper)
         SELECT nn AS n_vectors, kk AS n_clusters,
           floor(w_tot * 1000000.0 + 0.5) / 1000000.0 AS within_ss,
           floor(greatest(bplus - g2 / CAST(nn AS DOUBLE), 0.0)
             * 1000000.0 + 0.5) / 1000000.0 AS between_ss,
           floor(CASE WHEN kk > 1 AND nn > kk AND w_tot > 0.0
             THEN ((bplus - g2 / CAST(nn AS DOUBLE))
                 / (CAST(kk AS DOUBLE) - 1.0))
               / ((CASE WHEN w_tot <> 0.0 THEN w_tot ELSE 1.0 END)
                 / (CAST(nn AS DOUBLE) - CAST(kk AS DOUBLE)))
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS calinski_harabasz,
           floor(CASE WHEN kk > 1
             THEN coalesce(sri, 0.0) / CAST(greatest(kdb, 1) AS DOUBLE)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS davies_bouldin,
           coalesce(deg_pairs, 0) AS degenerate_pairs
         FROM tot CROSS JOIN dbm CROSS JOIN gdim""",
    "q_newsvendor" ->
      """WITH rows_ AS (
           SELECT l.l_partkey, l.l_quantity,
             CAST(o.o_orderdate AS DATE) AS d
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         span AS (
           SELECT min(CAST(o_orderdate AS DATE)) AS d0,
             CAST(floor(date_diff('day', min(CAST(o_orderdate AS DATE)),
               max(CAST(o_orderdate AS DATE))) / 7) + 1 AS BIGINT)
               AS n_weeks
           FROM orders),
         weekly AS (
           SELECT r.l_partkey,
             floor(date_diff('day', s.d0, r.d) / 7) AS wk,
             CAST(sum(CAST(r.l_quantity AS DECIMAL(28,12))) AS DOUBLE)
               AS q,
             max(s.n_weeks) AS n_weeks
           FROM rows_ r, span s GROUP BY 1, 2),
         stats AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CAST(q AS DECIMAL(28,12))) AS DOUBLE) AS sq,
             max(n_weeks) AS w
           FROM weekly GROUP BY 1),
         picks AS (
           SELECT l_partkey AS pk,
             CAST(row_number() OVER (PARTITION BY l_partkey
               ORDER BY q, wk) AS BIGINT) AS rn, q
           FROM weekly),
         j AS (
           SELECT s.l_partkey, s.n_active, s.sq, s.w,
             CAST(floor((4 * s.w + 4) / 5) AS BIGINT) AS rank_target,
             s.w - s.n_active AS n_zero
           FROM stats s)
         SELECT j.l_partkey, j.w AS n_weeks,
           j.n_active AS n_active_weeks,
           floor(j.sq / CAST(j.w AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_weekly,
           CASE WHEN j.rank_target <= j.n_zero THEN 0.0
             ELSE coalesce(p.q, 0.0) END AS q_star,
           floor((CASE WHEN j.rank_target <= j.n_zero THEN 0.0
               ELSE coalesce(p.q, 0.0) END
             - j.sq / CAST(j.w AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS safety_stock
         FROM j LEFT JOIN picks p
           ON j.l_partkey = p.pk AND p.rn = j.rank_target - j.n_zero
         ORDER BY mean_weekly DESC, l_partkey LIMIT 20""",
    "q_embedding_drift" ->
      """WITH base AS (
           SELECT embedding::DOUBLE[] AS e,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS a,
             sqrt(list_dot_product(embedding::DOUBLE[],
               embedding::DOUBLE[])) AS nrm
           FROM embeddings),
         scalars AS (
           SELECT
             CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN a = 1 THEN CAST(nrm AS DECIMAL(38,12))
               END) AS DOUBLE) AS sna,
             CAST(sum(CASE WHEN a = 0 THEN CAST(nrm AS DECIMAL(38,12))
               END) AS DOUBLE) AS snb
           FROM base),
         xs AS (SELECT a, unnest(range(0, 64)) AS i, e FROM base),
         dims AS (
           SELECT i,
             CAST(sum(CASE WHEN a = 1 THEN
               CAST(floor(e[i + 1] * 1e12 + 0.5) AS BIGINT) ELSE 0 END)
               AS DOUBLE) / 1e12 AS sxa,
             CAST(sum(CASE WHEN a = 0 THEN
               CAST(floor(e[i + 1] * 1e12 + 0.5) AS BIGINT) ELSE 0 END)
               AS DOUBLE) / 1e12 AS sxb
           FROM xs GROUP BY 1),
         mmd AS (
           SELECT CAST(sum(CAST(
             (d.sxa / CAST(s.na AS DOUBLE) - d.sxb / CAST(s.nb AS DOUBLE))
             * (d.sxa / CAST(s.na AS DOUBLE)
               - d.sxb / CAST(s.nb AS DOUBLE))
             AS DECIMAL(38,12))) AS DOUBLE) AS mmd2
           FROM dims d, scalars s)
         SELECT s.na AS n_a, s.nb AS n_b,
           floor(m.mmd2 * 1000000.0 + 0.5) / 1000000.0 AS mmd2_linear,
           floor(sqrt(m.mmd2) * 1000000.0 + 0.5) / 1000000.0
             AS mean_shift,
           floor(s.sna / CAST(s.na AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_norm_a,
           floor(s.snb / CAST(s.nb AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_norm_b
         FROM scalars s, mmd m""",
    "q_effective_rank" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
         xs AS (SELECT i, e[i + 1] AS xi, e
                FROM (SELECT unnest(range(0, 64)) AS i, e FROM e)),
         g AS (SELECT i, j,
                 CAST(sum(CAST(floor(xi * e[j + 1] * 1e12 + 0.5)
                   AS BIGINT)) AS DOUBLE) / 1e12 AS g
               FROM (SELECT i, xi, unnest(range(0, 64)) AS j, e FROM xs)
               GROUP BY 1, 2),
         m AS (SELECT i, CAST(sum(CAST(floor(xi * 1e12 + 0.5) AS BIGINT))
                 AS DOUBLE) / 1e12 AS sx
               FROM xs GROUP BY 1),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
         cells AS (
           SELECT gg.i, gg.j,
             gg.g / CAST(n AS DOUBLE)
               - (mi.sx / CAST(n AS DOUBLE)) * (mj.sx / CAST(n AS DOUBLE))
               AS c
           FROM g gg JOIN m mi ON gg.i = mi.i JOIN m mj ON gg.j = mj.i,
             nn),
         agg AS (
           SELECT CAST(sum(CASE WHEN i = j
               THEN CAST(c AS DECIMAL(38,12)) END) AS DOUBLE) AS tr,
             CAST(sum(CAST(c * c AS DECIMAL(38,12))) AS DOUBLE) AS f2
           FROM cells)
         SELECT n AS n_vectors, CAST(64 AS BIGINT) AS dim,
           floor(tr * 1000000.0 + 0.5) / 1000000.0 AS trace,
           floor(tr * tr / f2 * 1000000.0 + 0.5) / 1000000.0
             AS effective_rank
         FROM agg, nn""",
    "q_cluster_nmi" ->
      """WITH c AS MATERIALIZED (
           SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id % 40 = 0),
         assign AS MATERIALIZED (
           SELECT label, centroid_id FROM (
             SELECT e.vec_id, e.label, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[],
                   c.ce), 6) DESC, c.centroid_id) AS rn
             FROM embeddings e CROSS JOIN c)
           WHERE rn = 1),
         cont AS MATERIALIZED (
           SELECT centroid_id AS c, label AS l,
             CAST(count(*) AS BIGINT) AS n
           FROM assign GROUP BY 1, 2),
         tot AS MATERIALIZED (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cont),
         ncs AS MATERIALIZED (SELECT c, CAST(sum(n) AS BIGINT) AS nc
                 FROM cont GROUP BY 1),
         nls AS MATERIALIZED (SELECT l, CAST(sum(n) AS BIGINT) AS nl
                 FROM cont GROUP BY 1),
         hc AS MATERIALIZED (
           SELECT CAST(sum(CAST(
             -(CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE))
               * ln(CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE))
             AS DECIMAL(38,12))) AS DOUBLE) AS h_c
           FROM ncs, tot),
         hl AS MATERIALIZED (
           SELECT CAST(sum(CAST(
             -(CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE))
               * ln(CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE))
             AS DECIMAL(38,12))) AS DOUBLE) AS h_l
           FROM nls, tot),
         pur AS MATERIALIZED (
           SELECT CAST(sum(mx) AS BIGINT) AS smx
           FROM (SELECT c, max(n) AS mx FROM cont GROUP BY 1)),
         mi AS MATERIALIZED (
           SELECT CAST(sum(CAST(
             (CAST(cont.n AS DOUBLE) / CAST(nn AS DOUBLE))
               * ln(CAST(cont.n AS DOUBLE) * CAST(nn AS DOUBLE)
                 / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE)))
             AS DECIMAL(38,12))) AS DOUBLE) AS mi
           FROM cont JOIN ncs USING (c) JOIN nls USING (l), tot)
         SELECT t.nn AS n_vectors,
           floor(CAST(p.smx AS DOUBLE) / CAST(t.nn AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS purity,
           floor(mi.mi * 1000000.0 + 0.5) / 1000000.0 AS mutual_info,
           floor(hc.h_c * 1000000.0 + 0.5) / 1000000.0 AS h_cluster,
           floor(hl.h_l * 1000000.0 + 0.5) / 1000000.0 AS h_label,
           floor(CASE WHEN hc.h_c > 0.0 AND hl.h_l > 0.0
             THEN mi.mi / sqrt(hc.h_c * hl.h_l) ELSE 0.0 END
             * 1000000.0 + 0.5) / 1000000.0 AS nmi
         FROM tot t, pur p, hc, hl, mi""",
  )
}
