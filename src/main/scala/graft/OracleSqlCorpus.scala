package graft

import graft.OracleCtes._

/** DuckDB oracle SQL shard — corpus scoring / text curation / sketch audits
  * (q_chunk_boilerplate .. q_auc). Split from SparkEntry in round 10 (VERDICT item
  * 6) so the 463-entry registry stays diff-reviewable; stitched back —
  * order- and content-identical — in `SparkEntry.oracleSql`, which also
  * `require`s key disjointness across shards. */
private[graft] object OracleSqlCorpus {
  val sql: Map[String, String] = Map(
    "q_chunk_boilerplate" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
         ch AS (
           SELECT doc_id, unnest(list_transform(
             range(0, greatest(CAST(ceil(len(toks) / 4.0) AS BIGINT), 1)),
             i -> array_to_string(toks[i*4+1:i*4+4], ' '))) AS chunk_text
           FROM toks),
         sp AS (SELECT chunk_text, count(DISTINCT doc_id) AS n_docs
                FROM ch GROUP BY 1)
         SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN sp.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           round(sum(CASE WHEN sp.n_docs > 1 THEN 1.0 ELSE 0.0 END)
             / count(*), 6) AS boilerplate_frac
         FROM ch c JOIN sp USING (chunk_text)
         GROUP BY 1 ORDER BY 1""",

    // The Bloom stage is cost-only (false positives removed by the exact
    // semi join), so the oracle is the plain semi join.
    "q_bloom_semi" ->
      """WITH spenders AS (
           SELECT DISTINCT user_id FROM events
           WHERE user_id IS NOT NULL AND event_type = 'purchase'
             AND value > 200)
         SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(coalesce(e.value, 0)), 2) AS total_value
         FROM events e SEMI JOIN spenders s ON e.user_id = s.user_id
         GROUP BY 1 ORDER BY 1""",
    "q_full_outer" ->
      """WITH spend AS (
           SELECT user_id, round(sum(coalesce(value, 0)), 2) AS total_spend
           FROM events
           WHERE user_id IS NOT NULL AND event_type = 'purchase'
           GROUP BY 1),
         dim AS (
           SELECT c_custkey, c_nationkey FROM customer
           WHERE c_nationkey < 13)
         SELECT coalesce(s.user_id, d.c_custkey) AS entity_id,
           s.total_spend, d.c_nationkey,
           CASE WHEN d.c_custkey IS NULL THEN 'events_only'
                WHEN s.user_id IS NULL THEN 'customer_only'
                ELSE 'both' END AS presence
         FROM spend s FULL OUTER JOIN dim d ON s.user_id = d.c_custkey
         ORDER BY entity_id""",
    "q_except_all" ->
      """SELECT user_id, event_type FROM events
         WHERE user_id IS NOT NULL
           AND strftime(ts, '%Y-%m-%d') = '2024-01-01'
         EXCEPT ALL
         SELECT user_id, event_type FROM events
         WHERE user_id IS NOT NULL
           AND strftime(ts, '%Y-%m-%d') = '2024-01-02'
         ORDER BY user_id, event_type""",
    // Exact side of the ANN recall evaluation; the recall value enters
    // only through the floor boolean (see Similarity.annRecall).
    "q_ann_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
         FROM embeddings WHERE vec_id % 10 = 0""",
    "q_stream_enrich" ->
      """SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_events
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         WHERE e.user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M') AS minute
         FROM events WHERE user_id IS NOT NULL
         ORDER BY user_id, event_type, minute""",
    "q_cdc_apply" ->
      """WITH log AS (
           SELECT user_id, value, ts, event_id,
             CASE event_type WHEN 'signup' THEN 'I'
               WHEN 'purchase' THEN 'U' ELSE 'D' END AS op
           FROM events
           WHERE user_id IS NOT NULL
             AND event_type IN ('signup', 'purchase', 'error')),
         latest AS (
           SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM log)
         SELECT user_id, value, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           event_id
         FROM latest WHERE rn = 1 AND op <> 'D'
         ORDER BY user_id""",
    "q_rolling_median" ->
      """WITH daily AS (
           SELECT strftime(ts, '%Y-%m-%d') AS event_date,
             round(sum(coalesce(value, 0)), 2) AS revenue
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT event_date, revenue,
           round(quantile_cont(revenue, 0.5) OVER (
             ORDER BY event_date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
             AS rolling_median_7d
         FROM daily ORDER BY event_date""",
    "q_corr_matrix" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 6) AS r_qty_price,
           round(corr(l_quantity, l_discount), 6) AS r_qty_disc,
           round(corr(l_extendedprice, l_discount), 6) AS r_price_disc,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem""",
    "q_selective_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_cust_order_dist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         FROM (
           SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT)
             AS c_count
           FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
           GROUP BY 1)
         GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
    "q_fill_forward" ->
      """SELECT user_id, event_id, value,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value
         FROM events WHERE user_id IS NOT NULL
         ORDER BY user_id, event_id""",
    // ts distinct-counted on its microsecond string form (the engine
    // truncates the fixture's nanos to micros on read — tsMicros ↔ %f).
    "q_null_profile" ->
      """WITH m AS (SELECT
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_event_id,
           CAST(count(DISTINCT event_id) AS BIGINT) AS dist_event_id,
           CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_ts,
           CAST(count(DISTINCT strftime(ts, '%Y-%m-%d %H:%M:%S.%f'))
             AS BIGINT) AS dist_ts,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_user_id,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dist_user_id,
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS null_event_type,
           CAST(count(DISTINCT event_type) AS BIGINT) AS dist_event_type,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_value,
           CAST(count(DISTINCT value) AS BIGINT) AS dist_value,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_props,
           CAST(count(DISTINCT props) AS BIGINT) AS dist_props
         FROM events)
         SELECT 'event_id' AS col_name, n_rows, null_event_id AS n_null,
           dist_event_id AS n_distinct FROM m
         UNION ALL SELECT 'event_type', n_rows, null_event_type,
           dist_event_type FROM m
         UNION ALL SELECT 'props', n_rows, null_props, dist_props FROM m
         UNION ALL SELECT 'ts', n_rows, null_ts, dist_ts FROM m
         UNION ALL SELECT 'user_id', n_rows, null_user_id, dist_user_id
           FROM m
         UNION ALL SELECT 'value', n_rows, null_value, dist_value FROM m
         ORDER BY col_name""",
    "q_late_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
               AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1 ORDER BY 1""",
    "q_promo_share" ->
      """SELECT round(100.0 *
           sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
           sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'""",
    "q_promo_suppliers" ->
      """WITH p AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
         li AS (
           SELECT l_partkey, l_suppkey, l_quantity
           FROM lineitem JOIN p ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'),
         pair AS (
           SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
           FROM li GROUP BY 1, 2),
         tot AS (
           SELECT l_partkey, sum(supp_qty) AS part_qty
           FROM pair GROUP BY 1)
         SELECT s_name, CAST(count(*) AS BIGINT) AS n_parts_dominated,
           CAST(sum(supp_qty) AS BIGINT) AS dominated_qty
         FROM pair JOIN tot USING (l_partkey)
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE supp_qty * 2 > part_qty
         GROUP BY s_name ORDER BY s_name""",
    "q_supplier_variety" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM ps JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#1'
           AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem l JOIN part p ON l_partkey = p_partkey
         JOIN (SELECT l_partkey AS ap_partkey,
                 0.2 * avg(l_quantity) AS qty_limit
               FROM lineitem GROUP BY 1) a ON l.l_partkey = a.ap_partkey
         WHERE p_brand = 'Brand#23' AND l_quantity < qty_limit""",
    "q_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem
           GROUP BY 1 HAVING sum(l_quantity) > 300)
         SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY total_qty DESC, o_orderkey LIMIT 100""",
    // exact integer-micros sum — see StarAnalytics.disjunctiveRevenue
    "q_disjunctive_revenue" ->
      """SELECT round(CAST(sum(CAST(floor(l_extendedprice *
           (1.0 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000.0, 2) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""",
    "q_idle_balance" ->
      """WITH recent AS (
           SELECT o_custkey, count(*) AS n FROM orders
           WHERE o_orderdate >= TIMESTAMP '2000-01-01' GROUP BY 1)
         SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
         FROM customer LEFT JOIN recent ON c_custkey = o_custkey
         WHERE c_acctbal >
             (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
           AND coalesce(n, 0) < 3
         GROUP BY 1 ORDER BY 1""",
    "q_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(CAST(volume AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue
         FROM (
           SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
             AND ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_19')
               OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_7')))
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           round(CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_3'
               THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
               AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
    "q_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY s_suppkey""",
    "q_waiting_suppliers" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM lineitem l1
         JOIN orders ON l1.l_orderkey = o_orderkey
         JOIN supplier ON l1.l_suppkey = s_suppkey
         WHERE o_orderstatus = 'F'
           AND EXISTS (SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey
               AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
             WHERE l3.l_orderkey = l1.l_orderkey
               AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_shipdate > l1.l_shipdate)
         GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""",
    "q_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
             - p_retailprice * l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "q_important_parts" ->
      """WITH sup AS (
           SELECT s_suppkey FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_3'),
         pp AS (
           SELECT l_partkey,
             sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6)))
               AS value_dec
           FROM lineitem JOIN sup ON l_suppkey = s_suppkey
           GROUP BY 1)
         SELECT l_partkey, CAST(round(value_dec, 2) AS DOUBLE) AS part_value
         FROM pp
         WHERE value_dec > (SELECT sum(value_dec) FROM pp) * 0.001
         ORDER BY part_value DESC, l_partkey""",
    "q_late_priority_mix" ->
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_shipdate > o_orderdate + INTERVAL 30 DAY
         GROUP BY 1 ORDER BY 1""",
    "q_min_cost_supplier" ->
      """WITH unit AS (
           SELECT p_partkey, p_brand, p_size, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_size IN (1, 5, 9)
           GROUP BY 1, 2, 3, 4),
         best AS (
           SELECT p_partkey AS b_partkey, min(unit_cost) AS best_cost
           FROM unit GROUP BY 1)
         SELECT p_partkey, p_brand, p_size, s_name, n_name,
           round(unit_cost, 6) AS unit_cost
         FROM unit
         JOIN best ON p_partkey = b_partkey AND unit_cost = best_cost
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         ORDER BY p_partkey, s_name""",
    "q_bm25" ->
      """WITH d AS (
           SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM (
             SELECT doc_id, list_filter(
               string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
             FROM documents)),
         stats AS (
           SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
           FROM d),
         tf AS (
           SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
           FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
           WHERE term IN ('table', 'join', 'spark')
           GROUP BY 1, 2, 3),
         df AS (
           SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           FROM tf GROUP BY 1)
         SELECT doc_id,
           round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * tf * (1.2 + 1.0)
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25,
           CAST(count(*) AS BIGINT) AS n_terms_hit
         FROM tf JOIN df USING (term) CROSS JOIN stats
         GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20""",
    "q_hard_negatives" ->
      """WITH q AS (
           SELECT vec_id AS query_id, label AS q_label,
             embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id,
             e.label AS n_label,
             round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6)
               AS sim
           FROM q CROSS JOIN embeddings e WHERE e.label <> q.q_label),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk FROM s)
         SELECT query_id, q_label, neighbor_id, n_label, sim, rnk FROM r
         WHERE rnk <= 5 ORDER BY query_id, rnk""",
    "q_domain_cap" ->
      """WITH r AS (
           SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1,
                 15))::BIGINT, doc_id) AS BIGINT) AS keep_rank
           FROM documents)
         SELECT source, doc_id, keep_rank FROM r
         WHERE keep_rank <= 20 ORDER BY source, keep_rank""",
    "q_blocklist" ->
      """WITH t AS (
           SELECT source,
             CAST(len(list_distinct(list_filter(
               string_split_regex(lower(text), '\s+'), x -> x <> '')))
               AS BIGINT) AS n_distinct,
             CAST(len(list_intersect(list_distinct(list_filter(
               string_split_regex(lower(text), '\s+'), x -> x <> '')),
               ['slow', 'dup', 'drop'])) AS BIGINT) AS n_hits
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_hits * 1000 > n_distinct * 50
             THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           CAST(sum(n_distinct) AS BIGINT) AS total_distinct,
           CASE WHEN sum(n_distinct) = 0 THEN 0.0
             ELSE round(sum(n_hits)::DOUBLE / sum(n_distinct), 6)
           END AS hit_rate
         FROM t GROUP BY source ORDER BY source""",
    "q_oov_rate" ->
      """WITH tok AS (
           SELECT source, unnest(list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> ''))
             AS token
           FROM documents),
         st AS (
           SELECT source, token, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY 1, 2),
         v AS (
           SELECT token FROM (
             SELECT token, sum(n) AS cnt,
               row_number() OVER (ORDER BY sum(n) DESC, token) AS rk
             FROM st GROUP BY token)
           WHERE rk <= 20),
         sel AS (
           SELECT st.source, st.n, v.token AS vtok
           FROM st LEFT JOIN v ON st.token = v.token)
         SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN vtok IS NULL THEN n ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(sum(CASE WHEN vtok IS NULL THEN n ELSE 0 END)::DOUBLE
             / sum(n), 6) AS oov_rate
         FROM sel GROUP BY source ORDER BY source""",
    "q_source_kl" ->
      """WITH tok AS (
           SELECT source, unnest(list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> ''))
             AS token
           FROM documents),
         st AS (
           SELECT source, token, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY 1, 2),
         c AS (SELECT token, CAST(sum(n) AS BIGINT) AS ct
               FROM st GROUP BY 1),
         tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_corpus FROM c),
         ps AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_source
                FROM st GROUP BY 1)
         SELECT source, n_source AS n_tokens,
           round(CAST(sum(CAST(
             (n::DOUBLE / n_source) *
               ln((n::DOUBLE * n_corpus) / (n_source::DOUBLE * ct))
             AS DECIMAL(28,12))) AS DOUBLE), 6) AS kl_divergence
         FROM st JOIN c USING (token) JOIN ps USING (source) CROSS JOIN tot
         GROUP BY source, n_source ORDER BY source""",
    "q_doremi_step" ->
      """WITH tok AS (
           SELECT source, unnest(list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> ''))
             AS token
           FROM documents),
         st AS (
           SELECT source, token, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY 1, 2),
         c AS (SELECT token, CAST(sum(n) AS BIGINT) AS ct
               FROM st GROUP BY 1),
         tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_corpus FROM c),
         ps AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_source
                FROM st GROUP BY 1),
         kl AS (
           SELECT source, n_source AS n_tokens,
             round(CAST(sum(CAST(
               (n::DOUBLE / n_source) *
                 ln((n::DOUBLE * n_corpus) / (n_source::DOUBLE * ct))
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS kl
           FROM st JOIN c USING (token) JOIN ps USING (source)
             CROSS JOIN tot
           GROUP BY source, n_source),
         nt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n_total FROM kl),
         base AS (
           SELECT source, n_tokens, kl,
             CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE) AS w0,
             CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE)
               * exp(1.0 * kl) AS wraw
           FROM kl CROSS JOIN nt),
         z AS (SELECT CAST(sum(CAST(wraw AS DECIMAL(28,12))) AS DOUBLE)
               AS z FROM base)
         SELECT source, n_tokens, kl AS excess_loss,
           floor(w0 * 1000000.0 + 0.5) / 1000000.0 AS weight_before,
           floor(wraw / z * 1000000.0 + 0.5) / 1000000.0 AS weight_after
         FROM base, z ORDER BY source""",
    "q_dirichlet_ql" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents),
         d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks
               FROM toks),
         tot AS (SELECT CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_tokens FROM d),
         focc AS (
           SELECT doc_id, term FROM (
             SELECT doc_id, unnest(toks) AS term FROM toks)
           WHERE term IN ('table', 'join', 'spark')),
         ctf AS (SELECT term, CAST(count(*) AS DOUBLE) AS ctf
                 FROM focc GROUP BY 1),
         tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                FROM focc GROUP BY 1, 2),
         x AS (
           SELECT dd.doc_id, dd.dl, c.term, c.ctf, t.tf
           FROM (SELECT doc_id, dl FROM d) dd CROSS JOIN ctf c
           LEFT JOIN tf t ON dd.doc_id = t.doc_id AND c.term = t.term)
         SELECT doc_id,
           round(CAST(sum(CAST(ln((coalesce(tf, 0.0)
               + 2000.0 * ctf / tot.total_tokens) / (dl + 2000.0))
             AS DECIMAL(28,12))) AS DOUBLE), 6) AS ql_score,
           CAST(sum(CASE WHEN tf IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_terms_hit
         FROM x, tot GROUP BY doc_id
         ORDER BY ql_score DESC, doc_id LIMIT 20""",
    "q_table_digest" ->
      """WITH h AS (
           SELECT ('0x'||substr(md5(
               l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR),
               1,15))::BIGINT % 64 AS bucket,
             ('0x'||substr(md5(
               l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR || '|'
               || l_partkey::VARCHAR || '|' || l_suppkey::VARCHAR || '|'
               || l_returnflag || '|' || l_linestatus || '|'
               || strftime(l_shipdate, '%Y-%m-%d')),1,15))::BIGINT AS h
           FROM lineitem)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(h) AS digest
         FROM h GROUP BY 1 ORDER BY 1""",
    "q_cluster_balance" ->
      """WITH c AS (
           SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id % 40 = 0),
         assign AS (
           SELECT vec_id, centroid_id FROM (
             SELECT e.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce),
                   6) DESC, c.centroid_id) AS rn
             FROM embeddings e CROSS JOIN c)
           WHERE rn = 1),
         r AS (
           SELECT vec_id, centroid_id,
             CAST(row_number() OVER (PARTITION BY centroid_id ORDER BY
               ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT,
               vec_id) AS BIGINT) AS keep_rank
           FROM assign)
         SELECT vec_id, centroid_id, keep_rank FROM r
         WHERE keep_rank <= 10 ORDER BY centroid_id, keep_rank""",
    "q_dsir_logratio" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 20 = 0 AS is_target,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, is_target, unnest(
             toks || list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i] || ' ' || toks[i+1])) AS gram
           FROM t),
         b AS (
           SELECT ('0x'||substr(md5(gram),1,15))::BIGINT % 128 AS bucket,
             CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
               AS target_n,
             CAST(count(*) AS BIGINT) AS raw_n
           FROM g GROUP BY 1),
         tot AS (SELECT sum(target_n) AS tt, sum(raw_n) AS rt FROM b)
         SELECT bucket, target_n, raw_n,
           round(ln((target_n + 1)::DOUBLE / (tt + 128)) -
                 ln((raw_n + 1)::DOUBLE / (rt + 128)), 6) AS log_ratio
         FROM b CROSS JOIN tot ORDER BY bucket""",
    "q_dsir_sample" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 20 = 0 AS is_target,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, is_target, unnest(
             toks || list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i] || ' ' || toks[i+1])) AS gram
           FROM t),
         perdoc AS (
           SELECT doc_id, is_target,
             ('0x'||substr(md5(gram),1,15))::BIGINT % 128 AS bucket,
             CAST(count(*) AS BIGINT) AS c
           FROM g GROUP BY 1, 2, 3),
         b AS (
           SELECT bucket,
             sum(CASE WHEN is_target THEN c ELSE 0 END) AS target_n,
             sum(c) AS raw_n
           FROM perdoc GROUP BY 1),
         tot AS (SELECT sum(target_n) AS tt, sum(raw_n) AS rt FROM b),
         lam AS (
           SELECT bucket,
             round(ln((target_n + 1)::DOUBLE / (tt + 128)) -
                   ln((raw_n + 1)::DOUBLE / (rt + 128)), 6) AS log_ratio
           FROM b CROSS JOIN tot),
         sc AS (
           SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_grams,
             round(CAST(sum(CAST(p.c * lam.log_ratio
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS log_weight
           FROM perdoc p JOIN lam USING (bucket)
           WHERE NOT p.is_target GROUP BY 1),
         r AS (
           SELECT *, row_number() OVER (ORDER BY log_weight DESC, doc_id)
             AS rk
           FROM sc)
         SELECT doc_id, n_grams, log_weight FROM r WHERE rk <= 50
         ORDER BY log_weight DESC, doc_id""",
    "q_record_linkage" ->
      """WITH probes AS (
           SELECT p_partkey AS probe_id,
             string_split(p_name, ' ')[1] AS block_key,
             substr(p_name, 1, length(p_name) - 1) AS probe_name
           FROM part WHERE p_partkey % 10 = 0),
         cands AS (
           SELECT p_partkey AS cand_id, p_name AS cand_name,
             string_split(p_name, ' ')[1] AS block_key
           FROM part),
         pairs AS (
           SELECT probe_id, probe_name, cand_id, cand_name,
             CAST(levenshtein(probe_name, cand_name) AS BIGINT) AS dist
           FROM cands JOIN probes USING (block_key)),
         rk AS (
           SELECT *,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY dist, cand_id) AS rn,
             CAST(count(*) OVER (PARTITION BY probe_id) AS BIGINT)
               AS n_blocked,
             CAST(sum(CASE WHEN dist <= 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY probe_id) AS BIGINT) AS n_match
           FROM pairs)
         SELECT probe_id, probe_name, cand_id AS matched_id,
           cand_name AS matched_name, dist, n_blocked, n_match
         FROM rk WHERE rn = 1 AND dist <= 2 ORDER BY probe_id""",
    "q_knn_classify" ->
      """WITH q AS (
           SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
             round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6)
               AS sim
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM s),
         v AS (
           SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
           FROM r WHERE rnk <= 5 GROUP BY 1, 2),
         p AS (
           SELECT query_id, label AS predicted_label, votes,
             row_number() OVER (PARTITION BY query_id
               ORDER BY votes DESC, label) AS rn FROM v)
         SELECT p.query_id, e.label AS actual_label, p.predicted_label,
           p.votes
         FROM p JOIN embeddings e ON p.query_id = e.vec_id
         WHERE rn = 1 ORDER BY query_id""",
    "q_dup_spans" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents),
         wins AS (
           SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8),
             i -> ('0x' || substr(md5(array_to_string(toks[i:i+9], ' ')),
               1, 15))::BIGINT)) AS h
           FROM toks WHERE len(toks) >= 10),
         census AS (
           SELECT h, count(DISTINCT doc_id) AS span_docs
           FROM wins GROUP BY h)
         SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           CAST(count(DISTINCT CASE WHEN span_docs >= 2 THEN h END)
             AS BIGINT) AS n_dup_spans,
           floor(sum(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE * 1000000.0 + 0.5) / 1000000.0
             AS dup_ratio
         FROM wins JOIN census USING (h)
         GROUP BY doc_id ORDER BY doc_id""",
    "q_bpe_pairs" ->
      """WITH toks AS (
           SELECT unnest(list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok
           FROM documents),
         pairs AS (
           SELECT unnest(list_transform(range(1, len(tok)),
             i -> substr(tok, i, 2))) AS pair
           FROM toks WHERE len(tok) >= 2)
         SELECT pair, CAST(count(*) AS BIGINT) AS n
         FROM pairs GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""",
    // 3 unrolled BPE rounds: pair stats -> argmax -> leftmost-greedy
    // island merge -> reindex (mirrors the Spark driver loop round by
    // round, same trick as the unrolled k-means oracle)
    "q_bpe_learn" ->
      (bpeCtes + """
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS merge_rank, lsym, rsym, pair_count,
             corpus_tokens_after FROM b1, a1
           UNION ALL
           SELECT CAST(2 AS BIGINT), lsym, rsym, pair_count,
             corpus_tokens_after FROM b2, a2
           UNION ALL
           SELECT CAST(3 AS BIGINT), lsym, rsym, pair_count,
             corpus_tokens_after FROM b3, a3)
         ORDER BY merge_rank"""),
    "q_bpe_vocab" ->
      (bpeCtes + """
         SELECT sym, CAST(sum(freq) AS BIGINT) AS weighted_freq,
           CAST(count(*) AS BIGINT) AS n_positions
         FROM t3 GROUP BY 1
         ORDER BY weighted_freq DESC, sym LIMIT 20"""),
    "q_source_overlap" ->
      """WITH t AS (
           SELECT source, list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT DISTINCT source, unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 1, 1)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
           FROM t),
         cnt AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_sh FROM sh
           GROUP BY 1)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_shingles,
           round(count(*) / least(ca.n_sh, cb.n_sh), 6) AS containment
         FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         JOIN cnt ca ON ca.source = a.source
         JOIN cnt cb ON cb.source = b.source
         GROUP BY 1, 2, ca.n_sh, cb.n_sh
         ORDER BY 1, 2""",
    "q_ngram_novelty" ->
      """WITH t AS (
           SELECT doc_id, list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 1, 1)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
           FROM t),
         f AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1)
         SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           round(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
             / count(*), 6) AS novelty
         FROM sh JOIN f USING (s) GROUP BY 1 ORDER BY 1""",
    "q_cusum" ->
      """WITH daily AS (
           SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
           FROM orders GROUP BY 1),
         s1 AS (
           SELECT CAST(sum(rev_dec) AS DOUBLE) / count(*) AS mu,
             CAST(count(*) AS BIGINT) AS n FROM daily),
         d2 AS (
           SELECT day, rev_dec, CAST(rev_dec AS DOUBLE) - mu AS dev, n
           FROM daily, s1),
         s2 AS (
           SELECT sqrt(CAST(sum(CAST(dev * dev AS DECIMAL(38,6)))
             AS DOUBLE) / (any_value(n) - 1)) AS sd FROM d2),
         c AS (
           SELECT day, rev_dec,
             CAST(sum(CAST(dev AS DECIMAL(38,6))) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS cusum
           FROM d2)
         SELECT day, CAST(rev_dec AS DOUBLE) AS revenue,
           round(cusum, 2) AS cusum,
           CAST(abs(cusum) > 3.0 * sd AS INT) AS flag
         FROM c, s2 ORDER BY day""",
    "q_matryoshka_recall" ->
      """WITH rec AS (
           SELECT vec_id, embedding::DOUBLE[] AS e,
             (embedding::DOUBLE[])[1:16] AS r
           FROM embeddings),
         q AS (
           SELECT vec_id AS query_id, e AS qe, r AS qr
           FROM rec WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, rec.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qe, rec.e), 6) AS sim_e,
             round(list_cosine_similarity(q.qr, rec.r), 6) AS sim_r
           FROM q CROSS JOIN rec WHERE rec.vec_id <> q.query_id),
         r2 AS (
           SELECT query_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_e DESC, neighbor_id) AS rk_e,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_r DESC, neighbor_id) AS rk_r
           FROM s)
         SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rk_e <= 10 AND rk_r <= 10 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hits,
           round(sum(CASE WHEN rk_e <= 10 AND rk_r <= 10
             THEN 1 ELSE 0 END)::DOUBLE
             / (count(DISTINCT query_id) * 10), 6) AS recall
         FROM r2""",
    "q_good_turing" ->
      """WITH tok AS (
           SELECT source, unnest(list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> ''))
             AS term
           FROM documents),
         census AS (
           SELECT source, term, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY 1, 2)
         SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_doubletons,
           CASE WHEN sum(n) = 0 THEN 0.0
             ELSE round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
               / sum(n), 6) END AS p_unseen,
           CASE WHEN sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) = 0 THEN 0.0
             ELSE round(2.0 * sum(CASE WHEN n = 2 THEN 1 ELSE 0 END)
               / (sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE * sum(n)),
               6) END AS p1_smoothed
         FROM census GROUP BY source ORDER BY source""",
    "q_conformal" ->
      """WITH s AS (
           SELECT o_orderkey, o_orderpriority AS priority, o_totalprice,
             o_orderkey % 10 AS m
           FROM orders),
         model AS (
           SELECT priority, CAST(count(*) AS BIGINT) AS n_train,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS mu
           FROM s WHERE m <= 5 GROUP BY 1),
         cal AS (
           SELECT s.priority, s.o_orderkey,
             abs(s.o_totalprice - model.mu) AS res
           FROM s JOIN model USING (priority) WHERE s.m IN (6, 7)),
         nc AS (SELECT priority, CAST(count(*) AS BIGINT) AS n_cal
                FROM cal GROUP BY 1),
         ranked AS (
           SELECT priority, res, row_number() OVER (PARTITION BY priority
             ORDER BY res, o_orderkey) AS rk
           FROM cal),
         qh AS (
           SELECT r.priority, r.res AS qhat
           FROM ranked r JOIN nc USING (priority)
           WHERE r.rk = (90 * (nc.n_cal + 1) + 99) // 100),
         tst AS (
           SELECT s.priority, abs(s.o_totalprice - model.mu) AS res
           FROM s JOIN model USING (priority) WHERE s.m >= 8),
         cov AS (
           SELECT t.priority, CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN qh.qhat IS NULL OR t.res <= qh.qhat
               THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
           FROM tst t LEFT JOIN qh USING (priority) GROUP BY 1)
         SELECT m.priority, m.n_train, nc.n_cal, c.n_test,
           round(m.mu, 6) AS mu, round(qh.qhat, 6) AS qhat,
           c.n_covered,
           round(c.n_covered::DOUBLE / c.n_test, 6) AS coverage
         FROM model m JOIN nc USING (priority) JOIN cov c USING (priority)
         LEFT JOIN qh USING (priority) ORDER BY priority""",
    "q_conformal_scale" ->
      """WITH s AS (
           SELECT o_orderkey, o_orderpriority AS priority, o_totalprice,
             o_orderkey % 10 AS m
           FROM orders),
         model AS (
           SELECT priority, CAST(count(*) AS BIGINT) AS n_train,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS mu
           FROM s WHERE m <= 5 GROUP BY 1),
         cal AS (
           SELECT s.priority, abs(s.o_totalprice - model.mu) AS res
           FROM s JOIN model USING (priority) WHERE s.m IN (6, 7)),
         rk AS (
           SELECT priority, res,
             row_number() OVER (PARTITION BY priority ORDER BY res) AS r,
             count(*) OVER (PARTITION BY priority) AS n
           FROM cal),
         qh AS (
           SELECT priority, CAST(max(n) AS BIGINT) AS n_cal,
             max(CASE WHEN r = greatest(1,
               CAST(ceil(0.9::DOUBLE * n) AS BIGINT)) THEN res END)
               AS qhat
           FROM rk GROUP BY 1),
         tst AS (
           SELECT s.priority, abs(s.o_totalprice - model.mu) AS res
           FROM s JOIN model USING (priority) WHERE s.m >= 8),
         cov AS (
           SELECT t.priority, CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN qh.qhat IS NULL OR t.res <= qh.qhat
               THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
           FROM tst t LEFT JOIN qh USING (priority) GROUP BY 1)
         SELECT m.priority, m.n_train, qh.n_cal, c.n_test,
           round(m.mu, 6) AS mu, round(qh.qhat, 6) AS qhat,
           c.n_covered,
           round(c.n_covered::DOUBLE / c.n_test, 6) AS coverage
         FROM model m JOIN qh USING (priority) JOIN cov c USING (priority)
         ORDER BY priority""",
    "q_kcenter" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings),
         seed AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         d1 AS (
           SELECT e.vec_id, e.v,
             1.0 - round(list_cosine_similarity(e.v, s.v), 6) AS mind
           FROM e CROSS JOIN seed s),
         p2 AS (SELECT vec_id, mind FROM d1
                ORDER BY mind DESC, vec_id LIMIT 1),
         c2 AS (SELECT d1.v FROM d1 JOIN p2 USING (vec_id)),
         d2 AS (
           SELECT d1.vec_id, d1.v, least(d1.mind,
             1.0 - round(list_cosine_similarity(d1.v, c2.v), 6)) AS mind
           FROM d1 CROSS JOIN c2),
         p3 AS (SELECT vec_id, mind FROM d2
                ORDER BY mind DESC, vec_id LIMIT 1),
         c3 AS (SELECT d2.v FROM d2 JOIN p3 USING (vec_id)),
         d3 AS (
           SELECT d2.vec_id, least(d2.mind,
             1.0 - round(list_cosine_similarity(d2.v, c3.v), 6)) AS mind
           FROM d2 CROSS JOIN c3),
         p4 AS (SELECT vec_id, mind FROM d3
                ORDER BY mind DESC, vec_id LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id,
           CAST(NULL AS DOUBLE) AS radius FROM seed
         UNION ALL SELECT 2, vec_id, round(mind, 6) FROM p2
         UNION ALL SELECT 3, vec_id, round(mind, 6) FROM p3
         UNION ALL SELECT 4, vec_id, round(mind, 6) FROM p4
         ORDER BY sel_rank""",
    "q_textrank" ->
      """WITH t AS (
           SELECT list_filter(string_split_regex(lower(text), '\s+'),
             x -> x <> '') AS toks
           FROM documents),
         p0 AS (
           SELECT unnest(list_concat(
             list_transform(range(1, greatest(len(toks), 1)),
               i -> {'a': toks[i], 'b': toks[i+1]}),
             list_transform(range(1, greatest(len(toks) - 1, 1)),
               i -> {'a': toks[i], 'b': toks[i+2]}))) AS pr
           FROM t),
         und AS (
           SELECT least(pr.a, pr.b) AS ta, greatest(pr.a, pr.b) AS tb,
             CAST(count(*) AS BIGINT) AS n
           FROM p0 WHERE pr.a <> pr.b
           GROUP BY 1, 2 HAVING count(*) >= 2),
         edges AS (
           SELECT ta AS src, tb AS dst, n AS w FROM und
           UNION ALL SELECT tb, ta, n FROM und),
         outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
         e AS (
           SELECT edges.src, dst, CAST(w AS DOUBLE) / ow AS frac
           FROM edges JOIN outw USING (src)),
         nodes AS (SELECT DISTINCT src AS id FROM e),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         r0 AS (SELECT id, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
         c1 AS (
           SELECT dst, CAST(sum(CAST(rank * frac AS DECIMAL(38,18)))
             AS DOUBLE) AS inflow
           FROM e JOIN r0 ON e.src = r0.id GROUP BY 1),
         r1 AS (
           SELECT id, (1 - 0.85) / n + 0.85 * coalesce(inflow, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.id = c1.dst),
         c2 AS (
           SELECT dst, CAST(sum(CAST(rank * frac AS DECIMAL(38,18)))
             AS DOUBLE) AS inflow
           FROM e JOIN r1 ON e.src = r1.id GROUP BY 1),
         r2 AS (
           SELECT id, (1 - 0.85) / n + 0.85 * coalesce(inflow, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.id = c2.dst),
         c3 AS (
           SELECT dst, CAST(sum(CAST(rank * frac AS DECIMAL(38,18)))
             AS DOUBLE) AS inflow
           FROM e JOIN r2 ON e.src = r2.id GROUP BY 1),
         r3 AS (
           SELECT id, (1 - 0.85) / n + 0.85 * coalesce(inflow, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.id = c3.dst)
         SELECT id AS term, round(rank, 9) AS rank FROM r3
         ORDER BY round(rank, 9) DESC, id LIMIT 20""",
    "q_bradley_terry" ->
      """WITH pq AS MATERIALIZED (
           SELECT l_orderkey, l_partkey, CAST(sum(l_quantity) AS BIGINT)
             AS q
           FROM lineitem GROUP BY 1, 2),
         m AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CASE WHEN b.q > a.q THEN 0 ELSE 1 END AS win_a
           FROM pq a JOIN pq b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey),
         pairs AS MATERIALIZED (
           SELECT pa, pb, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(win_a) AS BIGINT) AS wa
           FROM m GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS MATERIALIZED (
           SELECT pa AS i, pb AS j, n FROM pairs
           UNION ALL SELECT pb, pa, n FROM pairs),
         nodes AS MATERIALIZED (
           SELECT i, CAST(sum(w) AS BIGINT) AS wi,
             CAST(sum(n) AS BIGINT) AS ni
           FROM (SELECT pa AS i, wa AS w, n FROM pairs
                 UNION ALL SELECT pb, n - wa, n FROM pairs)
           GROUP BY 1),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nd FROM nodes),
         g0 AS MATERIALIZED (SELECT i, 1.0 AS g FROM nodes),
         d1 AS MATERIALIZED (
           SELECT s.i, CAST(sum(CAST(s.n / (gi.g + gj.g)
             AS DECIMAL(38,18))) AS DOUBLE) AS den
           FROM sym s JOIN g0 gi ON s.i = gi.i JOIN g0 gj ON s.j = gj.i
           GROUP BY 1),
         u1 AS MATERIALIZED (SELECT w.i, w.wi / d1.den AS g
                FROM nodes w JOIN d1 ON w.i = d1.i),
         s1 AS MATERIALIZED (SELECT CAST(sum(CAST(g AS DECIMAL(38,18))) AS DOUBLE)
                AS sg FROM u1),
         g1 AS MATERIALIZED (SELECT i, g * nd / sg AS g
                FROM u1 CROSS JOIN nn CROSS JOIN s1),
         d2 AS MATERIALIZED (
           SELECT s.i, CAST(sum(CAST(s.n / (gi.g + gj.g)
             AS DECIMAL(38,18))) AS DOUBLE) AS den
           FROM sym s JOIN g1 gi ON s.i = gi.i JOIN g1 gj ON s.j = gj.i
           GROUP BY 1),
         u2 AS MATERIALIZED (SELECT w.i, w.wi / d2.den AS g
                FROM nodes w JOIN d2 ON w.i = d2.i),
         s2 AS MATERIALIZED (SELECT CAST(sum(CAST(g AS DECIMAL(38,18))) AS DOUBLE)
                AS sg FROM u2),
         g2 AS MATERIALIZED (SELECT i, g * nd / sg AS g
                FROM u2 CROSS JOIN nn CROSS JOIN s2)
         SELECT n.i AS part, n.ni AS n_matches, n.wi AS n_wins,
           round(g2.g, 9) AS strength
         FROM nodes n JOIN g2 ON n.i = g2.i
         ORDER BY round(g2.g, 9) DESC, part LIMIT 20""",
    "q_golden_record" ->
      """WITH RECURSIVE probes AS MATERIALIZED (
           SELECT p_partkey AS probe_id,
             string_split(p_name, ' ')[1] AS block_key,
             substr(p_name, 1, length(p_name) - 1) AS probe_name
           FROM part WHERE p_partkey % 10 = 0),
         cands AS MATERIALIZED (
           SELECT p_partkey AS cand_id, p_name AS cand_name,
             string_split(p_name, ' ')[1] AS block_key
           FROM part),
         lp AS MATERIALIZED (
           SELECT probe_id, cand_id,
             CAST(levenshtein(probe_name, cand_name) AS BIGINT) AS dist
           FROM cands JOIN probes USING (block_key)),
         best AS MATERIALIZED (
           SELECT probe_id, cand_id FROM (
             SELECT *, row_number() OVER (PARTITION BY probe_id
               ORDER BY dist, cand_id) AS rn
             FROM lp)
           WHERE rn = 1 AND dist <= 2 AND cand_id <> probe_id),
         edges AS MATERIALIZED (
           SELECT probe_id AS a, cand_id AS b FROM best
           UNION SELECT cand_id, probe_id FROM best),
         reach(src, dst) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         comp AS MATERIALIZED (
           SELECT src AS node, least(src, min(dst)) AS cluster_id
           FROM reach GROUP BY src),
         mem AS MATERIALIZED (
           SELECT c.cluster_id, p.p_partkey, p.p_name, p.p_brand,
             p.p_retailprice
           FROM comp c JOIN part p ON p.p_partkey = c.node),
         bm AS MATERIALIZED (
           SELECT cluster_id, p_brand, CAST(count(*) AS BIGINT) AS c
           FROM mem GROUP BY 1, 2),
         bmode AS MATERIALIZED (
           SELECT cluster_id, p_brand AS brand FROM (
             SELECT *, row_number() OVER (PARTITION BY cluster_id
               ORDER BY c DESC, p_brand) AS rn FROM bm)
           WHERE rn = 1),
         ag AS MATERIALIZED (
           SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             min(p_partkey) AS golden_id,
             min_by(p_name, p_partkey) AS golden_name,
             round(max(p_retailprice), 2) AS max_price
           FROM mem GROUP BY 1)
         SELECT ag.cluster_id, n_members, golden_id, golden_name, brand,
           max_price
         FROM ag JOIN bmode USING (cluster_id) ORDER BY cluster_id""",
    "q_table_diff" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
             ('0x'||substr(md5(o_orderkey::VARCHAR),1,15))::BIGINT AS hk
           FROM orders),
         rb AS (
           SELECT o_orderkey,
             CASE WHEN hk % 97 = 0 THEN o_custkey + 1
               ELSE o_custkey END AS o_custkey,
             o_orderstatus, o_orderpriority
           FROM o WHERE hk % 101 <> 0),
         ra AS (
           SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
             o_orderstatus, o_orderpriority
           FROM o WHERE hk % 89 = 0),
         r AS (SELECT * FROM rb UNION ALL SELECT * FROM ra),
         lh AS (
           SELECT o_orderkey::VARCHAR AS row_key,
             ('0x'||substr(md5(o_orderkey::VARCHAR || '|' ||
               o_custkey::VARCHAR || '|' || o_orderstatus || '|' ||
               o_orderpriority),1,15))::BIGINT AS h_l
           FROM orders),
         rh AS (
           SELECT o_orderkey::VARCHAR AS row_key,
             ('0x'||substr(md5(o_orderkey::VARCHAR || '|' ||
               o_custkey::VARCHAR || '|' || o_orderstatus || '|' ||
               o_orderpriority),1,15))::BIGINT AS h_r
           FROM r)
         SELECT coalesce(lh.row_key, rh.row_key) AS row_key,
           CASE WHEN h_r IS NULL THEN 'missing_right'
                WHEN h_l IS NULL THEN 'missing_left'
                ELSE 'changed' END AS diff_type
         FROM lh FULL OUTER JOIN rh ON lh.row_key = rh.row_key
         WHERE h_l IS NULL OR h_r IS NULL OR h_l <> h_r
         ORDER BY row_key""",
    "q_quantize_recall" ->
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS e,
             list_min(embedding::DOUBLE[]) AS mn,
             list_max(embedding::DOUBLE[]) AS mx
           FROM embeddings),
         rec AS (
           SELECT vec_id, e,
             CASE WHEN mx = mn THEN list_transform(e, x -> mn)
               ELSE list_transform(e, x -> mn + least(255.0, greatest(0.0,
                 floor((x - mn) / ((mx - mn) / 255.0) + 0.5)))
                 * ((mx - mn) / 255.0))
             END AS r
           FROM base),
         q AS (
           SELECT vec_id AS query_id, e AS qe, r AS qr
           FROM rec WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, rec.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qe, rec.e), 6) AS sim_e,
             round(list_cosine_similarity(q.qr, rec.r), 6) AS sim_r
           FROM q CROSS JOIN rec WHERE rec.vec_id <> q.query_id),
         r2 AS (
           SELECT query_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_e DESC, neighbor_id) AS rk_e,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_r DESC, neighbor_id) AS rk_r
           FROM s)
         SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rk_e <= 10 AND rk_r <= 10 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hits,
           round(sum(CASE WHEN rk_e <= 10 AND rk_r <= 10
             THEN 1 ELSE 0 END)::DOUBLE
             / (count(DISTINCT query_id) * 10), 6) AS recall
         FROM r2""",
    "q_quantize" ->
      """WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         m AS (
           SELECT vec_id, v, list_min(v) AS mn,
             (list_max(v) - list_min(v)) / 255.0 AS scale FROM e),
         q AS (
           SELECT vec_id, v, mn, scale,
             list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
               ELSE least(255.0, greatest(0.0,
                 floor((x - mn) / scale + 0.5))) END) AS codes
           FROM m),
         err AS (
           SELECT vec_id, scale,
             list_reduce(list_transform(range(1, len(v) + 1),
               i -> (v[i] - (mn + codes[i] * scale))
                  * (v[i] - (mn + codes[i] * scale))),
               (a, b) -> a + b) AS sse,
             len(v) AS d
           FROM q)
         SELECT vec_id, round(scale, 9) AS scale,
           round(sse / d, 9) AS mse
         FROM err ORDER BY vec_id""",
    "q_zipf" ->
      """WITH f AS (
           SELECT tok, count(*) AS freq FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok
             FROM documents)
           GROUP BY 1),
         r AS (
           SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, tok)
             AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y FROM f),
         s AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
           FROM r)
         SELECT CAST(n AS BIGINT) AS vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) AS intercept
         FROM s""",
    // est and actual from per-key count frames; double math appears only
    // in the final floor/ratio, on values exact below 2^53.
    "q_join_card" ->
      """WITH c1 AS (SELECT user_id AS k, count(*) AS n FROM events
             WHERE user_id IS NOT NULL GROUP BY 1),
         c2l AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem
             GROUP BY 1),
         c2r AS (SELECT o_orderkey AS k, count(*) AS n FROM orders
             GROUP BY 1),
         c3l AS (SELECT l_partkey AS k, count(*) AS n FROM lineitem
             GROUP BY 1),
         c3r AS (SELECT p_partkey AS k, count(*) AS n FROM part
             GROUP BY 1),
         r AS (
           SELECT 'events_self_user' AS join_name,
             (SELECT sum(n) FROM c1) AS rows_left,
             (SELECT count(*) FROM c1) AS ndv_left,
             (SELECT sum(n) FROM c1) AS rows_right,
             (SELECT count(*) FROM c1) AS ndv_right,
             (SELECT coalesce(sum(a.n * b.n), 0) FROM c1 a
                JOIN c1 b ON a.k = b.k) AS actual_rows
           UNION ALL
           SELECT 'lineitem_orders',
             (SELECT sum(n) FROM c2l), (SELECT count(*) FROM c2l),
             (SELECT sum(n) FROM c2r), (SELECT count(*) FROM c2r),
             (SELECT coalesce(sum(a.n * b.n), 0) FROM c2l a
                JOIN c2r b ON a.k = b.k)
           UNION ALL
           SELECT 'lineitem_part',
             (SELECT sum(n) FROM c3l), (SELECT count(*) FROM c3l),
             (SELECT sum(n) FROM c3r), (SELECT count(*) FROM c3r),
             (SELECT coalesce(sum(a.n * b.n), 0) FROM c3l a
                JOIN c3r b ON a.k = b.k))
         SELECT join_name,
           CAST(rows_left AS BIGINT) AS rows_left,
           CAST(ndv_left AS BIGINT) AS ndv_left,
           CAST(rows_right AS BIGINT) AS rows_right,
           CAST(ndv_right AS BIGINT) AS ndv_right,
           CAST(floor(CAST(rows_left AS DOUBLE) * rows_right
             / greatest(ndv_left, ndv_right)) AS BIGINT) AS est_rows,
           CAST(actual_rows AS BIGINT) AS actual_rows,
           round(CAST(actual_rows AS DOUBLE)
             / floor(CAST(rows_left AS DOUBLE) * rows_right
               / greatest(ndv_left, ndv_right)), 6) AS err_ratio
         FROM r ORDER BY join_name""",
    "q_skew_report" ->
      """WITH c1 AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem
             GROUP BY 1),
         c2 AS (SELECT l_partkey AS k, count(*) AS n FROM lineitem
             GROUP BY 1),
         c3 AS (SELECT l_suppkey AS k, count(*) AS n FROM lineitem
             GROUP BY 1),
         r AS (
           SELECT 'l_orderkey' AS key_col, CAST(count(*) AS BIGINT)
               AS n_distinct, CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_key_rows,
             round(max(n) / sum(n), 6) AS max_share,
             round(quantile_cont(n, 0.99), 2) AS p99_key_rows FROM c1
           UNION ALL
           SELECT 'l_partkey', CAST(count(*) AS BIGINT),
             CAST(sum(n) AS BIGINT), CAST(max(n) AS BIGINT),
             round(max(n) / sum(n), 6),
             round(quantile_cont(n, 0.99), 2) FROM c2
           UNION ALL
           SELECT 'l_suppkey', CAST(count(*) AS BIGINT),
             CAST(sum(n) AS BIGINT), CAST(max(n) AS BIGINT),
             round(max(n) / sum(n), 6),
             round(quantile_cont(n, 0.99), 2) FROM c3)
         SELECT * FROM r ORDER BY key_col""",
    "q_mad" ->
      """WITH m AS (
           SELECT event_type, median(value) AS med FROM events
           WHERE value IS NOT NULL GROUP BY 1)
         SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(any_value(med), 6) AS median,
           round(median(abs(value - med)), 6) AS mad
         FROM events e JOIN m ON e.event_type = m.event_type
         WHERE value IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_split_counts" ->
      """SELECT source,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  ::BIGINT % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  ::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_dataset_card" ->
      """WITH t AS (
           SELECT lang, source, n_chars, text,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents)
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6)
             AS mean_tokens,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars,
           CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_exact_dups,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
         FROM t""",
    "q_conversion_time" ->
      """WITH per AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS s,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
           FROM events WHERE user_id IS NOT NULL
             AND event_type IN ('signup', 'purchase')
           GROUP BY 1),
         d AS (
           SELECT (epoch_us(p) - epoch_us(s)) / 1000000.0 AS delta_sec
           FROM per WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s)
         SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(delta_sec, 0.25), 2) AS p25_sec,
           round(quantile_cont(delta_sec, 0.5), 2) AS p50_sec,
           round(quantile_cont(delta_sec, 0.75), 2) AS p75_sec,
           round(quantile_cont(delta_sec, 0.9), 2) AS p90_sec
         FROM d""",
    "q_twap" ->
      """WITH s AS (
           SELECT user_id, value, epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS t_next
           FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
         g AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
             sum(CAST(value * (t_next - t) AS DECIMAL(38,6))) AS wsum,
             CAST(sum(t_next - t) AS BIGINT) AS span_us
           FROM s WHERE t_next IS NOT NULL GROUP BY 1)
         SELECT user_id, n_intervals,
           round(CAST(wsum AS DOUBLE) / span_us, 6) AS twap
         FROM g WHERE span_us > 0 ORDER BY 1""",
    "q_neg_sample" ->
      """WITH pos AS (
           SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         pn AS (SELECT max(p_partkey) + 1 AS p_n FROM part),
         cands AS (
           SELECT c.cust, i.probe,
             ('0x'||substr(md5(c.cust::VARCHAR || ':' ||
               i.probe::VARCHAR),1,15))::BIGINT % pn.p_n AS part
           FROM (SELECT DISTINCT cust FROM pos) c
           CROSS JOIN (SELECT unnest(range(0, 8)) AS probe) i
           CROSS JOIN pn),
         misses AS (
           SELECT cust, part, min(probe) AS probe
           FROM cands
           WHERE NOT EXISTS (SELECT 1 FROM pos p
             WHERE p.cust = cands.cust AND p.part = cands.part)
           GROUP BY 1, 2),
         r AS (
           SELECT cust, part, CAST(row_number() OVER (
             PARTITION BY cust ORDER BY probe, part) AS BIGINT) AS neg_rank
           FROM misses)
         SELECT cust, part, neg_rank FROM r WHERE neg_rank <= 3
         ORDER BY cust, neg_rank""",
    "q_copurchase" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey)
         SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
         FROM pairs GROUP BY 1, 2
         ORDER BY n_orders DESC, part_a, part_b LIMIT 20""",
    // 3 unrolled BFS rounds: frontier ⋈ edges -> distinct -> anti-visited
    "q_bfs_hops" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT pa AS a, pb AS b FROM pr
               UNION ALL SELECT pb, pa FROM pr),
         v0 AS MATERIALIZED (SELECT min(a) AS node, CAST(0 AS BIGINT) AS hop FROM e),
         f1 AS MATERIALIZED (SELECT DISTINCT e.b AS node
           FROM v0 JOIN e ON v0.node = e.a),
         n1 AS MATERIALIZED (SELECT node, CAST(1 AS BIGINT) AS hop FROM f1
           WHERE node NOT IN (SELECT node FROM v0)),
         v1 AS MATERIALIZED (SELECT * FROM v0 UNION ALL SELECT * FROM n1),
         f2 AS MATERIALIZED (SELECT DISTINCT e.b AS node
           FROM n1 JOIN e ON n1.node = e.a),
         n2 AS MATERIALIZED (SELECT node, CAST(2 AS BIGINT) AS hop FROM f2
           WHERE node NOT IN (SELECT node FROM v1)),
         v2 AS MATERIALIZED (SELECT * FROM v1 UNION ALL SELECT * FROM n2),
         f3 AS MATERIALIZED (SELECT DISTINCT e.b AS node
           FROM n2 JOIN e ON n2.node = e.a),
         n3 AS MATERIALIZED (SELECT node, CAST(3 AS BIGINT) AS hop FROM f3
           WHERE node NOT IN (SELECT node FROM v2)),
         v3 AS MATERIALIZED (SELECT * FROM v2 UNION ALL SELECT * FROM n3)
         SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
         FROM v3 GROUP BY 1 ORDER BY 1""",
    "q_incr_agg" ->
      """WITH r0 AS (
           SELECT event_type, CAST(ts AS DATE) AS d,
             coalesce(value, 0) AS v
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         span AS (
           SELECT min(d) + (CAST(date_diff('day', min(d), max(d))
             AS INT) // 2) AS mid FROM r0)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value,
           CAST(sum(CASE WHEN d <= s.mid THEN 1 ELSE 0 END) AS BIGINT)
             AS n_base,
           CAST(sum(CASE WHEN d > s.mid THEN 1 ELSE 0 END) AS BIGINT)
             AS n_delta
         FROM r0 CROSS JOIN span s GROUP BY 1 ORDER BY 1""",
    "q_cuped" ->
      """WITH r0 AS (
           SELECT user_id, CAST(ts AS DATE) AS d, coalesce(value, 0) AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         span AS (
           SELECT min(d) + (CAST(date_diff('day', min(d), max(d))
             AS INT) // 2) AS mid FROM r0),
         pu AS (
           SELECT user_id,
             CAST(round(sum(CAST(CASE WHEN d <= s.mid THEN v ELSE 0 END
               AS DECIMAL(18,6))), 6) AS DOUBLE) AS x,
             CAST(round(sum(CAST(CASE WHEN d > s.mid THEN v ELSE 0 END
               AS DECIMAL(18,6))), 6) AS DOUBLE) AS y
           FROM r0 CROSS JOIN span s GROUP BY 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(28,8))) AS DOUBLE) AS syy
           FROM pu),
         k AS (
           SELECT n_users,
             sx / CAST(n_users AS DOUBLE) AS mx,
             sy / CAST(n_users AS DOUBLE) AS my,
             sxx / CAST(n_users AS DOUBLE) AS exx,
             syy / CAST(n_users AS DOUBLE) AS eyy,
             sxy / CAST(n_users AS DOUBLE) AS exy
           FROM m),
         kk AS (
           SELECT n_users, exy - mx * my AS cv,
             exx - mx * mx AS vx, eyy - my * my AS vy
           FROM k)
         SELECT n_users,
           CASE WHEN vx = 0 THEN NULL
                ELSE round(cv / vx, 6) END AS theta,
           round(vy, 6) AS var_y,
           CASE WHEN vx = 0 THEN NULL
                ELSE round(vy - cv * cv / vx, 6) END AS var_adj,
           CASE WHEN vx = 0 OR vy = 0 THEN NULL
                ELSE round((vy - cv * cv / vx) / vy, 6) END AS var_ratio
         FROM kk""",
    "q_acf" ->
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
           FROM l WHERE c7 IS NOT NULL)
         SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
           round(num / den.den, 6) AS acf
         FROM a CROSS JOIN den ORDER BY lag""",
    "q_ltv_cohorts" ->
      """WITH r0 AS (
           SELECT user_id, CAST(ts AS DATE) AS d, coalesce(value, 0) AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         f AS (SELECT user_id, min(d) AS cohort FROM r0 GROUP BY 1),
         cells AS (
           SELECT cohort,
             CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
             CAST(count(*) AS BIGINT) AS n_events,
             sum(CAST(v AS DECIMAL(18,6))) AS s
           FROM r0 JOIN f USING (user_id)
           WHERE date_diff('day', cohort, d) <= 7
           GROUP BY 1, 2)
         SELECT cohort, day_offset, n_events,
           CAST(round(s, 2) AS DOUBLE) AS period_value,
           CAST(round(sum(s) OVER (PARTITION BY cohort ORDER BY day_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS DOUBLE) AS cum_ltv
         FROM cells ORDER BY cohort, day_offset""",
    "q_robust_trend" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         idx AS (SELECT x, row_number() OVER (ORDER BY d) AS t
           FROM daily),
         pairs AS (
           SELECT a.t AS ta, b.t AS tb,
             (b.x - a.x) / CAST(b.t - a.t AS DOUBLE) AS slope,
             sign(b.x - a.x) AS sgn
           FROM idx a JOIN idx b ON b.t > a.t),
         ag AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(sgn AS BIGINT)) AS BIGINT) AS mk_s FROM pairs),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
         r AS (SELECT slope,
           row_number() OVER (ORDER BY slope, ta, tb) AS rn FROM pairs),
         med AS (
           SELECT avg(slope) AS ts_slope FROM r CROSS JOIN ag
           WHERE rn >= floor((n_pairs + 1) / 2)
             AND rn <= floor(n_pairs / 2) + 1)
         SELECT n_days, n_pairs,
           round(ts_slope, 6) AS theil_sen_slope, mk_s,
           CASE WHEN n_days < 3 THEN NULL
                ELSE round((CAST(mk_s AS DOUBLE) -
                  sign(CAST(mk_s AS DOUBLE))) /
                  sqrt(CAST(n_days AS DOUBLE) *
                    (CAST(n_days AS DOUBLE) - 1.0) *
                    (2.0 * CAST(n_days AS DOUBLE) + 5.0) / 18.0), 6)
           END AS mk_z
         FROM nd CROSS JOIN ag CROSS JOIN med""",
    "q_mde" ->
      """WITH pu AS (
           SELECT user_id,
             CAST(round(sum(CAST(coalesce(value, 0) AS DECIMAL(18,6))), 6)
               AS DOUBLE) AS y,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS variant
           FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
         m AS (
           SELECT variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(y * y AS DECIMAL(28,8))) AS DOUBLE) AS syy
           FROM pu GROUP BY 1),
         m2 AS (
           SELECT variant, n, sy,
             (syy - sy * sy / CAST(n AS DOUBLE)) /
               CAST(n - 1 AS DOUBLE) AS s2
           FROM m),
         a AS (SELECT n AS n_a, sy AS sy_a, s2 AS s2_a FROM m2
           WHERE variant = 0),
         b AS (SELECT n AS n_b, sy AS sy_b, s2 AS s2_b FROM m2
           WHERE variant = 1),
         k AS (
           SELECT n_a, n_b,
             round((sy_a + sy_b) / CAST(n_a + n_b AS DOUBLE), 6)
               AS mean_y,
             (CAST(n_a - 1 AS DOUBLE) * s2_a +
              CAST(n_b - 1 AS DOUBLE) * s2_b) /
               CAST(n_a + n_b - 2 AS DOUBLE) AS var_p
           FROM a CROSS JOIN b)
         SELECT n_a, n_b, mean_y, round(var_p, 6) AS var_pooled,
           round((1.959964 + 0.841621) * sqrt(var_p *
             (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
             AS mde_abs
         FROM k""",
    "q_data_contract" ->
      """SELECT * FROM (
           SELECT 'orders_customer_fk' AS check_name,
             CAST((SELECT count(*) FROM orders o WHERE o.o_custkey NOT IN
               (SELECT c_custkey FROM customer)) AS BIGINT)
               AS n_violations,
             CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_checked
           UNION ALL
           SELECT 'lineitem_orders_fk',
             CAST((SELECT count(*) FROM lineitem l WHERE l.l_orderkey
               NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
             CAST((SELECT count(*) FROM lineitem) AS BIGINT)
           UNION ALL
           SELECT 'events_id_unique',
             CAST((SELECT count(event_id) - count(DISTINCT event_id)
               FROM events) AS BIGINT),
             CAST((SELECT count(*) FROM events) AS BIGINT)
           UNION ALL
           SELECT 'events_value_nonnegative',
             CAST((SELECT count(*) FROM events WHERE value < 0)
               AS BIGINT),
             CAST((SELECT count(*) FROM events WHERE value IS NOT NULL)
               AS BIGINT)
           UNION ALL
           SELECT 'events_user_present',
             CAST((SELECT count(*) FROM events WHERE user_id IS NULL)
               AS BIGINT),
             CAST((SELECT count(*) FROM events) AS BIGINT))
         ORDER BY check_name""",
    "q_curriculum" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             round(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE len(list_filter(toks, x -> list_contains(
                 ['the','and','of','is','to','a','in'], x))) / len(toks)
             END, 4) AS sr
           FROM t),
         st AS (
           SELECT *, CAST(ntile(4) OVER (ORDER BY sr DESC, doc_id)
             AS BIGINT) AS stage FROM m)
         SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(CAST(sr AS DECIMAL(28,6))) AS DOUBLE) /
             CAST(count(*) AS DOUBLE), 6) AS mean_quality
         FROM st GROUP BY 1 ORDER BY 1""",
    // boundary form mirrors q_rfm_scale: percentile_approx at full
    // accuracy returns the sample at rank ceil(p·n), reproduced with an
    // explicit row_number rank; stages invert the ascending boundary
    // count (stage 1 = cleanest) exactly as the Spark side does
    "q_curriculum_scale" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             round(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE len(list_filter(toks, x -> list_contains(
                 ['the','and','of','is','to','a','in'], x))) / len(toks)
             END, 4) AS sr
           FROM t),
         rk AS (
           SELECT *, row_number() OVER (ORDER BY sr) AS r,
             count(*) OVER () AS n
           FROM m),
         b AS (
           SELECT
             max(CASE WHEN r = greatest(1, CAST(ceil(0.25::DOUBLE * n) AS BIGINT)) THEN sr END) AS b1,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.5::DOUBLE * n) AS BIGINT)) THEN sr END) AS b2,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.75::DOUBLE * n) AS BIGINT)) THEN sr END) AS b3
           FROM rk),
         st AS (
           SELECT m.*, CAST(4 - (CASE WHEN sr > b1 THEN 1 ELSE 0 END
               + CASE WHEN sr > b2 THEN 1 ELSE 0 END
               + CASE WHEN sr > b3 THEN 1 ELSE 0 END) AS BIGINT) AS stage
           FROM m CROSS JOIN b)
         SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(CAST(sr AS DECIMAL(28,6))) AS DOUBLE) /
             CAST(count(*) AS DOUBLE), 6) AS mean_quality
         FROM st GROUP BY 1 ORDER BY 1""",
    "q_k_anonymity" ->
      """WITH q AS (
           SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(floor(value / 50.0) AS BIGINT) AS vb
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL),
         g AS (
           SELECT event_type, d, vb, CAST(count(*) AS BIGINT) AS n
           FROM q GROUP BY 1, 2, 3)
         SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unsafe_groups,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(min(n) AS BIGINT) AS min_group_size,
           CAST(5 AS BIGINT) AS k
         FROM g""",
    "q_backfill_plan" ->
      """SELECT CAST(ts AS DATE) AS d,
           CAST(sum(CASE WHEN event_id % 97 <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_old,
           CAST(count(*) AS BIGINT) AS n_new,
           CAST(CASE WHEN sum(CASE WHEN event_id % 97 <> 0 THEN 1
             ELSE 0 END) <> count(*) THEN 1 ELSE 0 END AS INT)
             AS needs_backfill
         FROM events WHERE ts IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2
           HAVING count(*) >= 2),
         e AS (SELECT pa AS a, pb AS b FROM pairs),
         tri AS (
           SELECT ab.a, ab.b, bc.b AS c
           FROM e ab JOIN e bc ON ab.b = bc.a
           WHERE EXISTS (SELECT 1 FROM e ac
                         WHERE ac.a = ab.a AND ac.b = bc.b)),
         x AS (SELECT unnest([a, b, c]) AS part FROM tri)
         SELECT part, CAST(count(*) AS BIGINT) AS n_triangles
         FROM x GROUP BY 1
         ORDER BY n_triangles DESC, part LIMIT 20""",
    "q_clustering_coef" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2
           HAVING count(*) >= 2),
         e AS (SELECT pa AS a, pb AS b FROM pairs),
         deg AS (
           SELECT part, CAST(count(*) AS BIGINT) AS deg FROM (
             SELECT a AS part FROM e UNION ALL SELECT b FROM e)
           GROUP BY 1 HAVING count(*) >= 2),
         tri AS (
           SELECT ab.a, ab.b, bc.b AS c
           FROM e ab JOIN e bc ON ab.b = bc.a
           WHERE EXISTS (SELECT 1 FROM e ac
                         WHERE ac.a = ab.a AND ac.b = bc.b)),
         tc AS (
           SELECT part, CAST(count(*) AS BIGINT) AS n_triangles FROM (
             SELECT unnest([a, b, c]) AS part FROM tri)
           GROUP BY 1)
         SELECT deg.part, deg.deg,
           coalesce(tc.n_triangles, 0) AS n_triangles,
           round(2.0 * CAST(coalesce(tc.n_triangles, 0) AS DOUBLE) /
             CAST(deg.deg * (deg.deg - 1) AS DOUBLE), 6)
             AS clustering_coef
         FROM deg LEFT JOIN tc ON deg.part = tc.part
         ORDER BY clustering_coef DESC, deg.part LIMIT 20""",
    "q_pagerank" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS n
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2
           HAVING count(*) >= 2),
         edges AS MATERIALIZED (
           SELECT pa AS src, pb AS dst, n AS w FROM pairs
           UNION ALL SELECT pb, pa, n FROM pairs),
         outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
         e AS MATERIALIZED (
           SELECT edges.src, dst, CAST(w AS DOUBLE) / ow AS frac
           FROM edges JOIN outw USING (src)),
         nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         r0 AS MATERIALIZED (SELECT id, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
         c1 AS MATERIALIZED (
           SELECT dst, CAST(sum(CAST(rank * frac AS DECIMAL(38,18)))
             AS DOUBLE) AS inflow
           FROM e JOIN r0 ON e.src = r0.id GROUP BY 1),
         r1 AS MATERIALIZED (
           SELECT id, (1 - 0.85) / n + 0.85 * coalesce(inflow, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.id = c1.dst),
         c2 AS MATERIALIZED (
           SELECT dst, CAST(sum(CAST(rank * frac AS DECIMAL(38,18)))
             AS DOUBLE) AS inflow
           FROM e JOIN r1 ON e.src = r1.id GROUP BY 1),
         r2 AS MATERIALIZED (
           SELECT id, (1 - 0.85) / n + 0.85 * coalesce(inflow, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.id = c2.dst),
         c3 AS MATERIALIZED (
           SELECT dst, CAST(sum(CAST(rank * frac AS DECIMAL(38,18)))
             AS DOUBLE) AS inflow
           FROM e JOIN r2 ON e.src = r2.id GROUP BY 1),
         r3 AS MATERIALIZED (
           SELECT id, (1 - 0.85) / n + 0.85 * coalesce(inflow, 0.0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.id = c3.dst)
         SELECT id, round(rank, 9) AS rank FROM r3
         ORDER BY round(rank, 9) DESC, id LIMIT 20""",
    "q_assoc_rules" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pn AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part
           FROM op GROUP BY 1),
         tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nt
           FROM op),
         pairs AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS n
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         rules AS (
           SELECT pa AS antecedent, pb AS consequent, n AS support
           FROM pairs
           UNION ALL SELECT pb, pa, n FROM pairs)
         SELECT antecedent, consequent, support,
           round(support / na.n_part, 6) AS confidence,
           round((support / na.n_part) / (nb.n_part / nt), 6) AS lift
         FROM rules
         JOIN pn na ON na.l_partkey = antecedent
         JOIN pn nb ON nb.l_partkey = consequent
         CROSS JOIN tot
         ORDER BY lift DESC, antecedent, consequent LIMIT 20""",
    "q_seasonality" ->
      """WITH c AS (
           SELECT CAST((CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
               + 4) % 7 AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hr,
             CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2)
         SELECT dow, hr, n_events,
           round(n_events / (SELECT sum(n_events) FROM c), 6) AS share
         FROM c ORDER BY 1, 2""",
    "q_histogram2d" ->
      """SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS qty_bucket,
           CAST(floor(l_discount * 50.0) AS BIGINT) AS disc_bucket,
           CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_imputation" ->
      """WITH m AS (
           SELECT event_type, median(value) AS fill_value FROM events
           WHERE value IS NOT NULL GROUP BY 1),
         g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null,
             sum(CAST(value AS DECIMAL(38,6))) AS sum_dec
           FROM events GROUP BY 1)
         SELECT g.event_type, n_rows, n_null,
           round(fill_value, 6) AS fill_value,
           round(CAST(sum_dec AS DOUBLE) / (n_rows - n_null), 6)
             AS mean_before,
           round((CAST(sum_dec AS DOUBLE) + n_null * fill_value) / n_rows,
             6) AS mean_after
         FROM g LEFT JOIN m ON g.event_type = m.event_type
         ORDER BY 1""",
    "q_iqr_outliers" ->
      """WITH q AS (
           SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         f AS (
           SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
             q3 + (q3 - q1) * 1.5 AS hi FROM q)
         SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(any_value(lo), 6) AS lo_fence,
           round(any_value(hi), 6) AS hi_fence,
           CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
         FROM events e JOIN f ON e.event_type = f.event_type
         WHERE value IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_token_pack" ->
      """WITH t AS (
           SELECT doc_id, source, CAST(len(list_filter(
             string_split_regex(lower(text), '\s+'), x -> x <> ''))
             AS BIGINT) AS n_tokens
           FROM documents)
         SELECT doc_id, source, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / 1000) AS BIGINT) AS pack_id
         FROM t ORDER BY doc_id""",
    "q_containment_pairs" ->
      """WITH sh AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split_regex(
                 lower(text), '\s+'), x -> x <> '')) - 1, 1)),
               i -> list_filter(string_split_regex(lower(text), '\s+'),
                      x -> x <> '')[i] || ' ' ||
                    list_filter(string_split_regex(lower(text), '\s+'),
                      x -> x <> '')[i+1] || ' ' ||
                    list_filter(string_split_regex(lower(text), '\s+'),
                      x -> x <> '')[i+2])) AS s
           FROM documents)
         SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CASE WHEN len(a.s) = 0 THEN 0.0
                ELSE round(len(list_intersect(a.s, b.s)) / len(a.s), 6)
           END AS containment
         FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE a.doc_id % 97 = 0
         ORDER BY doc_id_a, doc_id_b""",
    "q_bigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         grams AS (
           SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM toks WHERE len(toks) >= 2),
         bc AS (SELECT bigram, count(*) AS c_bigram,
                  split_part(bigram, ' ', 1) AS prefix
                FROM grams GROUP BY 1),
         pc AS (SELECT prefix, CAST(sum(c_bigram) AS DOUBLE) AS c_prefix
                FROM bc GROUP BY 1),
         v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM
                (SELECT unnest(toks) AS tok FROM toks))
         SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(CAST(ln((c_bigram + 1.0) / (c_prefix + v))
             AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
             AS avg_bigram_logprob
         FROM grams g JOIN bc USING (bigram) JOIN pc USING (prefix), v
         GROUP BY 1 ORDER BY 1""",
    "q_ccnet_buckets" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         grams AS (
           SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM toks WHERE len(toks) >= 2),
         bc AS (SELECT bigram, count(*) AS c_bigram,
                  split_part(bigram, ' ', 1) AS prefix
                FROM grams GROUP BY 1),
         pc AS (SELECT prefix, CAST(sum(c_bigram) AS DOUBLE) AS c_prefix
                FROM bc GROUP BY 1),
         v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM
                (SELECT unnest(toks) AS tok FROM toks)),
         sc AS (
           SELECT g.doc_id,
             round(CAST(sum(CAST(ln((c_bigram + 1.0) / (c_prefix + v))
               AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS s
           FROM grams g JOIN bc USING (bigram) JOIN pc USING (prefix), v
           GROUP BY 1),
         rk AS (
           SELECT d.lang, sc.s,
             row_number() OVER (PARTITION BY d.lang
               ORDER BY sc.s DESC, sc.doc_id) AS rk,
             count(*) OVER (PARTITION BY d.lang) AS n
           FROM sc JOIN documents d USING (doc_id))
         SELECT lang,
           ['head','middle','tail'][CAST(((rk - 1) * 3) // n AS INT) + 1]
             AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE)
             / count(*), 6) AS mean_logprob
         FROM rk GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_ccnet_scale" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         grams AS (
           SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM toks WHERE len(toks) >= 2),
         bc AS (SELECT bigram, count(*) AS c_bigram,
                  split_part(bigram, ' ', 1) AS prefix
                FROM grams GROUP BY 1),
         pc AS (SELECT prefix, CAST(sum(c_bigram) AS DOUBLE) AS c_prefix
                FROM bc GROUP BY 1),
         v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM
                (SELECT unnest(toks) AS tok FROM toks)),
         sc AS (
           SELECT g.doc_id,
             round(CAST(sum(CAST(ln((c_bigram + 1.0) / (c_prefix + v))
               AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS s
           FROM grams g JOIN bc USING (bigram) JOIN pc USING (prefix), v
           GROUP BY 1),
         sl AS (
           SELECT d.lang, sc.s FROM sc JOIN documents d USING (doc_id)),
         rkb AS (
           SELECT lang, s,
             row_number() OVER (PARTITION BY lang ORDER BY s) AS r,
             count(*) OVER (PARTITION BY lang) AS n
           FROM sl),
         b AS (
           SELECT lang,
             max(CASE WHEN r = greatest(1,
               CAST(ceil((1.0/3) * n) AS BIGINT)) THEN s END) AS b1,
             max(CASE WHEN r = greatest(1,
               CAST(ceil((2.0/3) * n) AS BIGINT)) THEN s END) AS b2
           FROM rkb GROUP BY 1)
         SELECT sl.lang,
           ['head','middle','tail'][
             (CASE WHEN sl.s > b.b2 THEN 0
                   WHEN sl.s > b.b1 THEN 1 ELSE 2 END) + 1] AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(sl.s AS DECIMAL(28,12))) AS DOUBLE)
             / count(*), 6) AS mean_logprob
         FROM sl JOIN b USING (lang)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_group_kfold" ->
      """WITH f AS (
           SELECT ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))
               ::BIGINT % 5 AS fold,
             CAST(user_id AS VARCHAR) AS entity,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
           FROM events WHERE user_id IS NOT NULL),
         fe AS (
           SELECT fold, entity, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(pos) AS BIGINT) AS n_pos
           FROM f GROUP BY 1, 2)
         SELECT fold, CAST(count(*) AS BIGINT) AS n_entities,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(sum(n_pos) AS BIGINT) AS n_pos,
           round(sum(n_pos)::DOUBLE / sum(n_rows), 6) AS pos_share
         FROM fe GROUP BY 1 ORDER BY 1""",
    "q_mrr" ->
      """WITH q AS (
           SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe, label
             AS q_label
           FROM embeddings WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id,
             e.label AS n_label,
             round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6)
               AS sim
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM s),
         fr AS (
           SELECT query_id,
             min(CASE WHEN q_label = n_label THEN rnk END) AS first_rel
           FROM r WHERE rnk <= 10 GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_with_hit,
           round(CAST(sum(CAST(coalesce(1.0 / first_rel, 0.0)
             AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mrr
         FROM fr""",
    "q_dedup_sweep" ->
      """WITH sh AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split_regex(
                 lower(text), '\s+'), x -> x <> '')) - 1, 1)),
               i -> list_filter(string_split_regex(lower(text), '\s+'),
                      x -> x <> '')[i] || ' ' ||
                    list_filter(string_split_regex(lower(text), '\s+'),
                      x -> x <> '')[i+1] || ' ' ||
                    list_filter(string_split_regex(lower(text), '\s+'),
                      x -> x <> '')[i+2])) AS s
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
           FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE a.doc_id % 97 = 0),
         j AS (
           SELECT doc_id_b,
             CASE WHEN uni = 0 THEN 0.0
                  ELSE round(inter / uni, 6) END AS jac
           FROM pairs),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         sw AS (
           SELECT t, doc_id_b
           FROM j CROSS JOIN (SELECT unnest([2, 5, 10, 15, 20]) AS t)
           WHERE jac >= t / 1000.0)
         SELECT CAST(t AS BIGINT) AS threshold_pm,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT doc_id_b) AS BIGINT) AS n_docs_flagged,
           round(count(DISTINCT doc_id_b)::DOUBLE / n_docs, 6)
             AS flagged_frac
         FROM sw CROSS JOIN nd GROUP BY t, n_docs ORDER BY 1""",
    "q_peak_concurrency" ->
      """WITH iv AS (
           SELECT strftime(ts, '%Y-%m-%d') AS event_date, user_id,
             min(ts) AS s, max(ts) AS e
           FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
         pts AS (
           SELECT event_date, s AS t, 1 AS delta FROM iv
           UNION ALL SELECT event_date, e, -1 FROM iv),
         run AS (
           SELECT event_date, sum(delta) OVER (
             PARTITION BY event_date ORDER BY t ASC, delta DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
           FROM pts)
         SELECT event_date, CAST(max(conc) AS BIGINT) AS peak_concurrent
         FROM run GROUP BY 1 ORDER BY 1""",
    "q_zorder" -> {
      val inter = (0 until 8).map(b =>
        s"(((xg >> $b) & 1) << ${2 * b}) | (((yg >> $b) & 1) << ${2 * b + 1})")
        .mkString(" | ")
      s"""WITH m AS (SELECT CAST(max(l_partkey) AS BIGINT) AS xmax,
           CAST(max(l_suppkey) AS BIGINT) AS ymax FROM lineitem),
         g AS (SELECT CAST(l_partkey AS BIGINT) AS x,
                 CAST(l_suppkey AS BIGINT) AS y,
                 (CAST(l_partkey AS BIGINT) * 256) // (xmax + 1) AS xg,
                 (CAST(l_suppkey AS BIGINT) * 256) // (ymax + 1) AS yg
               FROM lineitem, m),
         z AS (SELECT x, y, $inter AS z FROM g)
         SELECT z >> 8 AS z_bucket, CAST(count(*) AS BIGINT) AS n_rows,
           max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
         FROM z GROUP BY 1 ORDER BY 1"""
    },
    "q_downsample" ->
      """SELECT user_id, event_id, CAST(rn AS BIGINT) AS rn FROM (
           SELECT user_id, event_id, row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events WHERE user_id IS NOT NULL)
         WHERE (rn - 1) % 5 = 0 ORDER BY user_id, event_id""",
    "q_scd2_join" ->
      """WITH e AS (
           SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
             row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE user_id IS NOT NULL),
         feed AS (SELECT user_id, day, event_type AS state FROM e
                  WHERE rn = 1),
         m AS (SELECT *, CASE WHEN lag(state) OVER w IS NULL
                                OR lag(state) OVER w <> state
                         THEN 1 ELSE 0 END AS chg
               FROM feed WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         v AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS ver FROM m),
         i AS (SELECT user_id, CAST(ver AS BIGINT) AS version, state,
                 min(day) AS valid_from FROM v GROUP BY 1, 2, 3),
         h AS (SELECT user_id, version, state, valid_from,
                 lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from) AS valid_to
               FROM i),
         p AS (SELECT user_id, event_id, strftime(ts, '%Y-%m-%d') AS day
               FROM events
               WHERE user_id IS NOT NULL AND event_type = 'purchase')
         SELECT p.user_id, p.event_id, p.day, h.state, h.version
         FROM p JOIN h ON p.user_id = h.user_id AND p.day >= h.valid_from
           AND (h.valid_to IS NULL OR p.day < h.valid_to)
         ORDER BY event_id""",
    "q_weighted_sample" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 1000000 < least(1250 * n_chars, 1000000)
         ORDER BY doc_id""",
    "q_top_p" ->
      """WITH r AS (
           SELECT doc_id, source, n_chars,
             coalesce(sum(n_chars) OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bef,
             sum(n_chars) OVER (PARTITION BY source) AS tot
           FROM documents)
         SELECT doc_id, source, n_chars FROM r
         WHERE CAST(bef AS DOUBLE) / CAST(tot AS DOUBLE) < 0.8
         ORDER BY doc_id""",
    "q_uniform_k" ->
      """SELECT event_id, event_type FROM (
           SELECT event_id, event_type, row_number() OVER (
             PARTITION BY event_type
             ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1,
               15))::BIGINT % 1000000000, event_id) AS rk
           FROM events)
         WHERE rk <= 100 ORDER BY event_type, event_id""",
    "q_pmi" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks FROM documents),
         grams AS (
           SELECT unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM toks WHERE len(toks) >= 2),
         uni AS (SELECT unnest(toks) AS tok FROM toks),
         uc AS (SELECT tok, count(*) AS cu FROM uni GROUP BY 1),
         nu AS (SELECT CAST(count(*) AS DOUBLE) AS nu FROM uni),
         bc AS (SELECT bigram, count(*) AS c12 FROM grams GROUP BY 1
                HAVING count(*) >= 20),
         nb AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM grams)
         SELECT b.bigram, CAST(b.c12 AS BIGINT) AS n_pair,
           round(ln((b.c12 / nb.nb) /
             ((u1.cu / nu.nu) * (u2.cu / nu.nu))), 6) AS pmi
         FROM bc b
         JOIN uc u1 ON u1.tok = split_part(b.bigram, ' ', 1)
         JOIN uc u2 ON u2.tok = split_part(b.bigram, ' ', 2), nb, nu
         ORDER BY bigram""",
    "q_entropy" ->
      """WITH t AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(
             lower(text), '\s+'), x -> x <> '')) AS tok
           FROM documents),
         c AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c
               FROM t GROUP BY 1, 2),
         n AS (SELECT *, sum(c) OVER (PARTITION BY doc_id) AS n FROM c)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           round(-sum((c / n) * ln(c / n)), 6) AS entropy
         FROM n GROUP BY doc_id, n ORDER BY doc_id""",
    "q_sql_surface" ->
      """WITH sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(list_filter(string_split_regex(
               lower(text), '\s+'), x -> x <> '')) - 1, 1)),
             i -> list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')[i] || ' ' ||
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')[i+1] || ' ' ||
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')[i+2])) AS s
           FROM documents)
         SELECT doc_id, CAST(len(s) AS BIGINT) AS n_shingles FROM sh
         ORDER BY doc_id""",

    // ---- round 10: evaluation & data-valuation reports ----
    // Integral rank-sum AUC: per-distinct-score pos/neg counts, running
    // negatives-below, U2 = Σ pos·(2·below + tied); double only at the end.
    "q_auc" ->
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
         p AS (SELECT sri, CAST(sum(y) AS BIGINT) AS n_pos_s,
                 CAST(count(*) - sum(y) AS BIGINT) AS n_neg_s
               FROM s GROUP BY 1),
         c AS (SELECT *, coalesce(sum(n_neg_s) OVER (ORDER BY sri
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_neg FROM p)
         SELECT CAST(sum(n_pos_s) AS BIGINT) AS n_pos,
           CAST(sum(n_neg_s) AS BIGINT) AS n_neg,
           round(CAST(sum(n_pos_s * (2 * cum_neg + n_neg_s)) AS BIGINT) /
             (2.0 * CAST(sum(n_pos_s) AS BIGINT) *
              CAST(sum(n_neg_s) AS BIGINT)), 6) AS auc
         FROM c""",
  )
}
