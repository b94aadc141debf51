package graft

import graft.OracleCtes._

/** DuckDB oracle SQL shard — core ETL / warehouse / event & star analytics
  * (q_dau .. q_unpivot). Split from SparkEntry in round 10 (VERDICT item
  * 6) so the 463-entry registry stays diff-reviewable; stitched back —
  * order- and content-identical — in `SparkEntry.oracleSql`, which also
  * `require`s key disjointness across shards. */
private[graft] object OracleSqlEtl {
  val sql: Map[String, String] = Map(
    "q_dau" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         count(DISTINCT user_id) AS dau
         FROM events WHERE user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    // The sketch-audit pair: the exact side is fully oracle-checked; the
    // engine-specific estimates are reduced to deterministic bound flags
    // (always 1 for the fixed fixture+seed — the specs bound the raw
    // estimates; a flag of 0 would hash-mismatch and fail the gate).
    "q_dau_approx" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         count(DISTINCT user_id) AS dau,
         1 AS approx_in_bound
         FROM events WHERE user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_cms_counts" ->
      """SELECT event_type, count(*) AS exact_n, 1 AS est_in_bound
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_revenue" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         round(sum(coalesce(value, 0)), 2) AS revenue
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",
    "q_event_counts" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
         count(*) AS n_events
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_funnel" ->
      """WITH g AS (
           SELECT strftime(ts, '%Y-%m-%d') AS event_date,
             count(DISTINCT CASE WHEN event_type = 'signup' THEN user_id END)
               AS signup_users,
             count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
               AS purchasers
           FROM events WHERE user_id IS NOT NULL GROUP BY 1)
         SELECT event_date, signup_users, purchasers,
           CASE WHEN signup_users = 0 THEN 0.0
                ELSE round(purchasers / signup_users, 4) END
             AS signup_to_purchase_rate
         FROM g ORDER BY event_date""",
    "q_intl_revenue" ->
      """SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 10) AS event_date,
         round(sum(coalesce(o_totalprice, 0)), 2) AS revenue
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_quality_metrics" ->
      """SELECT count(*) AS rows_total,
         CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS null_user_rows,
         count(DISTINCT user_id) AS distinct_users,
         CAST(coalesce(sum(CASE WHEN event_type NOT IN
           ('signup','purchase','view','click') THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS invalid_type_rows,
         round(sum(coalesce(value, 0)), 2) AS total_value
         FROM events""",
    "q_rolling_revenue" ->
      """WITH d AS (
           SELECT strftime(ts, '%Y-%m-%d') AS event_date,
             round(sum(coalesce(value, 0)), 2) AS revenue
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT event_date, revenue,
           round(sum(revenue) OVER (ORDER BY event_date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rolling_7d
         FROM d ORDER BY event_date""",
    "q_revenue_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
         round(sum(coalesce(value, 0)), 2) AS revenue,
         count(*) AS n_events,
         CAST(grouping(strftime(ts, '%Y-%m-%d')) * 2 +
              grouping(event_type) AS BIGINT) AS gid
         FROM events
         GROUP BY ROLLUP(strftime(ts, '%Y-%m-%d'), event_type)
         ORDER BY event_date ASC NULLS FIRST, event_type ASC NULLS FIRST""",
    "q_value_percentiles" ->
      """SELECT event_type,
         round(quantile_cont(value, 0.5), 6) AS p50,
         round(quantile_cont(value, 0.9), 6) AS p90,
         round(quantile_cont(value, 0.99), 6) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_value_percentiles_approx" ->
      """SELECT event_type,
         round(quantile_cont(value, 0.5), 6) AS p50,
         round(quantile_cont(value, 0.9), 6) AS p90,
         round(quantile_cont(value, 0.99), 6) AS p99,
         1 AS approx_in_bound
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_dedup_latest" ->
      """SELECT user_id, event_type, event_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, value
         FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts),
                 row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_quarantine_bad" ->
      """SELECT event_id, event_type, value,
         concat_ws(',',
           CASE WHEN event_type NOT IN ('signup','purchase','view','click')
             THEN 'invalid_event_type' END,
           CASE WHEN user_id IS NULL THEN 'null_user' END,
           CASE WHEN value > 400.0 THEN 'outlier_amount' END) AS reason
         FROM events
         WHERE event_type NOT IN ('signup','purchase','view','click')
           OR user_id IS NULL OR value > 400.0
         ORDER BY event_id""",
    "q_quarantine_good_counts" ->
      """SELECT event_type, count(*) AS n FROM events
         WHERE event_type IN ('signup','purchase','view','click')
           AND (value IS NULL OR value <= 400.0)
         GROUP BY 1 ORDER BY 1""",
    "q_union_quarantine" ->
      """SELECT * FROM (
           SELECT event_id, event_type, 'invalid_event_type' AS reason
           FROM events WHERE event_type = 'error'
           UNION ALL BY NAME
           SELECT event_id, value, 'outlier_amount' AS reason
           FROM events WHERE value > 400.0)
         ORDER BY reason, event_id""",
    "q_json_quarantine" ->
      """SELECT (o_orderkey % 7 = 0) AS is_bad, count(*) AS n,
           round(sum(CASE WHEN o_orderkey % 7 = 0 THEN 0
                          ELSE o_totalprice END), 2) AS total
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_csv_quarantine" ->
      """SELECT (o_orderkey % 11 = 0) AS is_bad, count(*) AS n,
           round(sum(CASE WHEN o_orderkey % 11 = 0 THEN 0
                          ELSE o_totalprice END), 2) AS total
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_normalize_priority" ->
      """SELECT DISTINCT o_orderpriority,
         regexp_replace(lower(trim(o_orderpriority)), '[- ]', '_', 'g')
           AS normalized
         FROM orders ORDER BY o_orderpriority""",
    "q_canonical_events" ->
      """SELECT DISTINCT event_type,
         CASE WHEN regexp_replace(lower(trim(event_type)), '[- ]', '_', 'g')
                IN ('page_view', 'page view', 'view') THEN 'pageview'
              ELSE regexp_replace(lower(trim(event_type)), '[- ]', '_', 'g')
         END AS canonical
         FROM events ORDER BY event_type""",
    "q_props_coercion" ->
      """SELECT event_type,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k,
         count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_props_map" ->
      """WITH kv AS (
           SELECT unnest(json_keys(props)) AS key, props
           FROM events WHERE props IS NOT NULL)
         SELECT key, count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.' || key) AS BIGINT))
             AS BIGINT) AS sum_v
         FROM kv GROUP BY 1 ORDER BY 1""",
    "q_user_type_sets" ->
      """SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
             AS types,
           count(DISTINCT event_type) AS n_types
         FROM events WHERE user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_hash_id" ->
      """SELECT event_id,
         substr(sha256(concat_ws('|', CAST(event_id AS VARCHAR), event_type)),
           1, 24) AS hid
         FROM events ORDER BY event_id""",
    "q_multiformat_ts" ->
      """WITH s AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                    THEN strftime(o_orderdate, '%m-%d-%Y')
                  WHEN o_orderkey % 3 = 1
                    THEN strftime(o_orderdate, '%d/%m/%Y')
                  ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS raw
           FROM orders),
         p AS (
           SELECT o_orderkey, raw,
             coalesce(try_strptime(raw, '%m-%d-%Y'),
                      try_strptime(raw, '%d/%m/%Y'),
                      try_strptime(raw, '%Y-%m-%d %H:%M:%S')) AS t
           FROM s)
         SELECT o_orderkey, raw,
           strftime(CASE WHEN length(raw) <= 10 AND t IS NOT NULL
                         THEN t + INTERVAL 12 HOUR ELSE t END,
                    '%Y-%m-%d %H:%M:%S.%f') AS parsed
         FROM p ORDER BY o_orderkey""",
    "q_money_scrub" ->
      """WITH s AS (
           SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 2 = 0
                  THEN '$' || CAST(l_extendedprice AS VARCHAR)
                  ELSE '₹' || replace(CAST(l_extendedprice AS VARCHAR),
                                      '.', ',') END AS raw
           FROM lineitem)
         SELECT l_orderkey, l_linenumber, raw,
           coalesce(TRY_CAST(regexp_replace(raw, '[,$₹€£]', '', 'g')
             AS DOUBLE), 0.0) AS amount
         FROM s ORDER BY l_orderkey, l_linenumber""",
    "q_upsert" ->
      """WITH existing AS (
           SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_id % 2 = 0),
         incoming AS (
           SELECT event_id, event_type, value + 100.0 AS value,
                  CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS ts
           FROM events WHERE event_id % 3 = 0)
         SELECT event_id, event_type, value,
                strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
         FROM (
           SELECT e.* FROM existing e
           WHERE NOT EXISTS (SELECT 1 FROM incoming i
                             WHERE i.event_id = e.event_id)
           UNION ALL
           SELECT * FROM incoming)
         ORDER BY event_id""",
    "q_surrogate_keys" ->
      """SELECT event_type,
         CAST(dense_rank() OVER (ORDER BY event_type) AS BIGINT)
           AS event_type_id
         FROM (SELECT DISTINCT event_type FROM events)
         ORDER BY event_type""",
    "q_surrogate_scale" ->
      """SELECT name,
         CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
         FROM (SELECT DISTINCT c_name AS name FROM customer)
         ORDER BY name""",
    "q_dim_dates" ->
      """SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS date_key,
         CAST(year(ts) AS BIGINT) AS year,
         CAST(month(ts) AS BIGINT) AS month,
         CAST(day(ts) AS BIGINT) AS day
         FROM events ORDER BY date_key""",
    "q_region_revenue" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_lineitems
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",
    "q_events_preview" ->
      """SELECT e.event_id,
         strftime(CAST(e.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
         e.user_id, e.event_type, e.value, c.c_name AS user_name
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY 2, 1 LIMIT 50""",
    "q_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           revenue
         FROM (
           SELECT l.l_orderkey, o.o_orderdate,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
           FROM customer c
           JOIN orders o ON c.c_custkey = o.o_custkey
           JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           WHERE c.c_mktsegment = 'BUILDING'
             AND o.o_orderdate < TIMESTAMP '1996-06-30'
             AND l.l_shipdate > TIMESTAMP '1996-06-30'
           GROUP BY 1, 2)
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_local_supplier_volume" ->
      """SELECT n_name, revenue FROM (
           SELECT n.n_name,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
           FROM region r
           JOIN nation n ON n.n_regionkey = r.r_regionkey
           JOIN customer c ON c.c_nationkey = n.n_nationkey
           JOIN orders o ON o.o_custkey = c.c_custkey
           JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
             AND s.s_nationkey = c.c_nationkey
           WHERE r.r_name = 'ASIA'
             AND o.o_orderdate >= TIMESTAMP '1996-01-01'
             AND o.o_orderdate < TIMESTAMP '1997-01-01'
           GROUP BY 1)
         ORDER BY revenue DESC, n_name""",
    "q_threshold_alerts" ->
      """WITH t AS (
           SELECT user_id, sum(coalesce(value, 0)) AS total
           FROM events WHERE user_id IS NOT NULL GROUP BY 1)
         SELECT user_id,
           unnest(range(1, CAST(floor(total/1000) AS BIGINT) + 1)) AS level
         FROM t WHERE total >= 1000 ORDER BY 1, 2""",
    "q_stateful_totals" ->
      """SELECT user_id, count(*) AS n_events,
           CAST(round(sum(CAST(coalesce(value, 0) AS DECIMAL(18,6))), 2)
             AS DOUBLE) AS total_value
         FROM events WHERE user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_tws_user_stats" ->
      """SELECT user_id, count(*) AS n_events,
           CAST(round(sum(CAST(coalesce(value, 0) AS DECIMAL(18,6))), 2)
             AS DOUBLE) AS total_value,
           max(coalesce(value, 0)) AS max_value
         FROM events WHERE user_id IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_tws_type_counts" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
         FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_tws_last_n" ->
      """WITH o AS (
           SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_seen
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
         SELECT user_id, CAST(any_value(n_seen) AS BIGINT) AS n_seen,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY rn)
             AS last_ids
         FROM o WHERE rn <= 3 GROUP BY 1 ORDER BY 1""",
    "q_salted_join" ->
      """SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q_orc_roundtrip" ->
      """SELECT event_type, count(*) AS n,
           round(sum(coalesce(value, 0)), 2) AS total_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n,
           round(sum(coalesce(value, 0)), 2) AS total_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_jsonl_roundtrip" ->
      """SELECT event_type, count(*) AS n,
           round(sum(coalesce(value, 0)), 2) AS total_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_cube" ->
      """SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, round(sum(o_totalprice), 2) AS total,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
             AS BIGINT) AS gid
         FROM orders
         GROUP BY CUBE (o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority ASC NULLS FIRST,
           o_orderstatus ASC NULLS FIRST""",
    "q_schema_evolution" ->
      """SELECT event_type, count(*) AS n,
           CAST(count(CASE WHEN event_id % 2 = 1 THEN value END) AS BIGINT)
             AS n_with_value,
           round(sum(CASE WHEN event_id % 2 = 1
                          THEN coalesce(value, 0) ELSE 0 END), 2)
             AS total_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_top_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders)
         WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""",
    "q_gap_median" ->
      """WITH g AS (
           SELECT user_id,
             date_diff('millisecond',
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
               ts) / 1000.0 AS gap
           FROM events WHERE user_id IS NOT NULL)
         SELECT user_id, round(median(gap), 4) AS median_gap_s
         FROM g WHERE gap IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_welford_stats" ->
      """SELECT event_type, round(avg(value), 4) AS mean,
           round(stddev_samp(value), 4) AS sd
         FROM events WHERE value IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    "q_order_stats" ->
      """SELECT o_orderpriority, count(*) AS n,
           round(avg(o_totalprice), 4) AS mean,
           round(stddev_samp(o_totalprice), 4) AS sd,
           round(corr(o_totalprice, o_custkey), 6) AS r
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_sliding_counts" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, count(*) AS n
         FROM (
           SELECT event_type, unnest([date_trunc('hour', ts),
             date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
           FROM events)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_value_deciles" ->
      """SELECT decile, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
         FROM (
           SELECT o_orderkey, o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
           FROM orders)
         GROUP BY 1 ORDER BY 1""",
    "q_repetition" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents)
         SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(toks)) / len(toks), 4)
           END AS rep_ratio
         FROM t ORDER BY doc_id""",
    "q_pii_scrub" ->
      """WITH p AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 5 = 0
               THEN ' contact user' || doc_id::VARCHAR || '@example.com now'
               ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN ' call 5551234567' ELSE '' END
             AS text
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT)
             AS n_long_numbers,
           sha256(regexp_replace(regexp_replace(text,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{7,}', '<NUM>', 'g')) AS clean_fp
         FROM p ORDER BY doc_id""",
    "q_decontaminate" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(toks)-3, 1)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                  toks[i+3] || ' ' || toks[i+4]))) AS sh
           FROM t),
         ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 100 = 0),
         hits AS (
           SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n
           FROM sh s JOIN ev USING (sh)
           WHERE s.doc_id % 100 <> 0 GROUP BY 1)
         SELECT d.doc_id, coalesce(h.n, 0) AS n_shared_ngrams,
           coalesce(h.n, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN hits h USING (doc_id)
         WHERE d.doc_id % 100 <> 0 ORDER BY d.doc_id""",
    "q_curation_pipeline" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents),
         q AS (
           SELECT doc_id FROM (
             SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE len(list_filter(toks, x -> list_contains(
                      ['the','and','of','is','to','a','in'], x))) / len(toks)
               END AS sr,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE 1.0 - len(list_distinct(toks)) / len(toks)
               END AS rr
             FROM t)
           WHERE NOT (n_tokens < 20 OR sr < 0.03 OR rr > 0.8)),
         fp AS (
           SELECT min(doc_id) AS doc_id FROM (
             SELECT doc_id,
               sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                 AS fp
             FROM documents)
           GROUP BY fp),
         sh5 AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(toks)-3, 1)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                  toks[i+3] || ' ' || toks[i+4]))) AS sh
           FROM t),
         ev AS (SELECT DISTINCT sh FROM sh5 WHERE doc_id % 100 = 0),
         hits AS (
           SELECT s.doc_id, count(*) AS n FROM sh5 s JOIN ev USING (sh)
           WHERE s.doc_id % 100 <> 0 GROUP BY 1),
         clean AS (
           SELECT d.doc_id FROM documents d LEFT JOIN hits h USING (doc_id)
           WHERE d.doc_id % 100 <> 0 AND coalesce(h.n, 0) = 0)
         SELECT d.doc_id, d.lang, d.source
         FROM documents d
         JOIN q USING (doc_id) JOIN fp USING (doc_id)
         JOIN clean USING (doc_id)
         WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT
             % 1000 < CASE d.lang WHEN 'en' THEN 1000 ELSE 500 END
         ORDER BY d.doc_id""",
    "q_heavy_hitters" ->
      """SELECT token, n FROM (
           SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT unnest(list_filter(string_split_regex(lower(text),
               '\s+'), x -> x <> '')) AS token
             FROM documents)
           GROUP BY token)
         ORDER BY n DESC, token LIMIT 20""",
    "q_exact_dedup" ->
      """SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           AS fp,
         min(doc_id) AS keeper_doc_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_jaccard_pairs" ->
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
           WHERE a.doc_id % 97 = 0)
         SELECT doc_id_a, doc_id_b,
           CASE WHEN uni = 0 THEN 0.0
                ELSE round(inter / uni, 6) END AS jaccard
         FROM pairs ORDER BY doc_id_a, doc_id_b""",
    "q_minhash_signatures" ->
      s"""$sketchShingleCte,
         sig AS (
           SELECT doc_id, seeds.seed_id,
             CASE WHEN len(hs) = 0 THEN 2147483647
                  ELSE list_min(list_transform(hs, h ->
                    (($minhashA)[seed_id+1] * h + ($minhashB)[seed_id+1])
                      % 2147483647)) END AS min_hash
           FROM hs CROSS JOIN
             (SELECT unnest(range(0, 32)) AS seed_id) seeds)
         SELECT doc_id, seed_id, min_hash FROM sig
         ORDER BY doc_id, seed_id""",
    "q_minhash_candidates" ->
      s"""$sketchShingleCte,
         sigl AS (
           SELECT doc_id, list_transform(range(0, 32), i ->
             CASE WHEN len(hs) = 0 THEN 2147483647
                  ELSE list_min(list_transform(hs, h ->
                    (($minhashA)[i+1] * h + ($minhashB)[i+1])
                      % 2147483647)) END) AS sig
           FROM hs),
         banded AS (
           SELECT doc_id, b.j AS band_id,
             ('0x'||substr(md5(array_to_string(
               sig[b.j*2+1 : b.j*2+2], ',')),1,15))::BIGINT AS band_hash
           FROM sigl CROSS JOIN (SELECT unnest(range(0, 16)) AS j) b),
         buckets AS (
           SELECT band_id, band_hash, list(doc_id) AS bucket
           FROM banded GROUP BY 1, 2
           HAVING count(*) BETWEEN 2 AND 50),
         pairs AS (
           SELECT DISTINCT p[1] AS doc_id_a, p[2] AS doc_id_b FROM (
             SELECT unnest(flatten(list_transform(bucket, x ->
               list_transform(list_filter(bucket, y -> y > x),
                 y -> [x, y])))) AS p
             FROM buckets))
         SELECT count(*) AS n_candidate_pairs FROM pairs""",
    "q_dedup_pipeline" ->
      s"""${sketchShingleCte.replace("WITH toks", "WITH RECURSIVE toks")},
         sigl AS MATERIALIZED (
           SELECT doc_id, list_transform(range(0, 32), i ->
             CASE WHEN len(hs) = 0 THEN 2147483647
                  ELSE list_min(list_transform(hs, h ->
                    (($minhashA)[i+1] * h + ($minhashB)[i+1])
                      % 2147483647)) END) AS sig
           FROM hs),
         banded AS MATERIALIZED (
           SELECT doc_id, b.j AS band_id,
             ('0x'||substr(md5(array_to_string(
               sig[b.j*2+1 : b.j*2+2], ',')),1,15))::BIGINT AS band_hash
           FROM sigl CROSS JOIN (SELECT unnest(range(0, 16)) AS j) b),
         buckets AS MATERIALIZED (
           SELECT band_id, band_hash, list(doc_id) AS bucket
           FROM banded GROUP BY 1, 2
           HAVING count(*) BETWEEN 2 AND 50),
         pairs AS MATERIALIZED (
           SELECT DISTINCT p[1] AS doc_id_a, p[2] AS doc_id_b FROM (
             SELECT unnest(flatten(list_transform(bucket, x ->
               list_transform(list_filter(bucket, y -> y > x),
                 y -> [x, y])))) AS p
             FROM buckets)),
         verified AS MATERIALIZED (
           SELECT p.doc_id_a AS a, p.doc_id_b AS b
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.doc_id_a
           JOIN sh sb ON sb.doc_id = p.doc_id_b
           WHERE CASE WHEN len(sa.sh) + len(sb.sh)
                        - len(list_intersect(sa.sh, sb.sh)) = 0 THEN 0.0
                 ELSE round(len(list_intersect(sa.sh, sb.sh)) /
                   (len(sa.sh) + len(sb.sh)
                     - len(list_intersect(sa.sh, sb.sh))), 6)
                 END >= 0.5),
         edges AS MATERIALIZED (SELECT a, b FROM verified
                   UNION SELECT b, a FROM verified),
         reach(src, dst) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         comp AS MATERIALIZED (
           SELECT src AS node, least(src, min(dst)) AS cluster
           FROM reach GROUP BY src)
         SELECT d.doc_id,
           coalesce(c.cluster, d.doc_id) AS cluster_id,
           CAST(d.doc_id = coalesce(c.cluster, d.doc_id) AS BIGINT)
             AS is_keeper
         FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
         ORDER BY d.doc_id""",
    "q_simhash" ->
      s"""$sketchTokenHashCte
         SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 60), b ->
             CASE WHEN 2*len(list_filter(hs, h -> ((h >> b) & 1) = 1))
                    >= len(hs)
                  THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT)
             AS simhash
         FROM th ORDER BY doc_id""",
    "q_simhash_candidates" ->
      s"""$sketchTokenHashCte,
         sim AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), b ->
               CASE WHEN 2*len(list_filter(hs, h -> ((h >> b) & 1) = 1))
                      >= len(hs)
                    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT)
               AS simhash
           FROM th),
         ch AS (
           SELECT s.doc_id, s.simhash, c.chunk_id,
             (s.simhash >> (c.chunk_id * 15)) & 32767 AS chunk
           FROM sim s CROSS JOIN
             (SELECT unnest(range(0, 4)) AS chunk_id) c),
         cand AS (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
           FROM ch a JOIN ch b ON a.chunk_id = b.chunk_id
             AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         SELECT count(*) AS n_candidate_pairs FROM cand
         WHERE hamming <= 16""",
    "q_cosine_topk" ->
      """WITH q AS (
           SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6)
               AS sim
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk FROM s)
         SELECT query_id, neighbor_id, sim, rnk FROM r
         WHERE rnk <= 10 ORDER BY query_id, rnk""",
    "q_ndcg" ->
      """WITH q AS (
           SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
             label AS q_label
           FROM embeddings WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id,
             e.label AS n_label,
             round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6)
               AS sim
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, neighbor_id) AS rnk FROM s),
         t AS (SELECT * FROM r WHERE rnk <= 10),
         cc AS (SELECT label AS q_label, CAST(count(*) AS BIGINT)
                  AS n_class
                FROM embeddings GROUP BY 1),
         pq AS (
           SELECT query_id, q_label,
             CAST(sum(CAST(CASE WHEN q_label = n_label
               THEN 1.0 / ln(CAST(rnk AS DOUBLE) + 1.0) ELSE 0.0 END
               AS DECIMAL(28,12))) AS DOUBLE) AS dcg,
             CAST(sum(CASE WHEN q_label = n_label THEN 1 ELSE 0 END)
               AS BIGINT) AS hits
           FROM t GROUP BY 1, 2),
         j AS (
           SELECT pq.*, cc.n_class,
             CASE WHEN least(10, n_class - 1) >= 1 THEN
               list_reduce(list_transform(
                 range(1, least(10, n_class - 1) + 1),
                 i -> 1.0 / ln(CAST(i AS DOUBLE) + 1.0)), (a, b) -> a + b)
             ELSE 0.0 END AS idcg
           FROM pq JOIN cc USING (q_label))
         SELECT query_id, hits, n_class, round(dcg, 6) AS dcg,
           round(idcg, 6) AS idcg,
           CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) ELSE 0.0 END
             AS ndcg
         FROM j ORDER BY query_id""",
    "q_ivf_topk" ->
      """WITH c AS (
           SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id % 40 = 0),
         assign AS (
           SELECT vec_id, embedding, centroid_id FROM (
             SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6)
                   DESC, c.centroid_id) AS rn
             FROM embeddings e CROSS JOIN c)
           WHERE rn = 1),
         q AS (
           SELECT vec_id AS query_id, embedding AS qe, centroid_id
           FROM assign WHERE vec_id % 10 = 0),
         s AS (
           SELECT q.query_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qe::DOUBLE[],
               a.embedding::DOUBLE[]), 6) AS sim
           FROM q JOIN assign a ON q.centroid_id = a.centroid_id
           WHERE a.vec_id <> q.query_id),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk FROM s)
         SELECT query_id, neighbor_id, sim, rnk FROM r
         WHERE rnk <= 5 ORDER BY query_id, rnk""",
    "q_lsh_buckets" ->
      s"""${lshPlanesCte(12)}
         SELECT e.vec_id,
           CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), i ->
                  e.embedding[i]::DOUBLE * pl.p[i])) >= 0
                THEN (1::BIGINT << pl.b) ELSE 0 END) AS BIGINT) AS bucket
         FROM embeddings e CROSS JOIN planes pl
         GROUP BY e.vec_id ORDER BY e.vec_id""",
    "q_kmeans_refine" ->
      """WITH c AS (
           SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id % 40 = 0),
         assign AS (
           SELECT vec_id, embedding, centroid_id FROM (
             SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6)
                   DESC, c.centroid_id) AS rn
             FROM embeddings e CROSS JOIN c)
           WHERE rn = 1),
         s AS (
           SELECT centroid_id, unnest(range(0, 64)) AS dim_id, embedding
           FROM assign)
         SELECT centroid_id, dim_id,
           round(avg(embedding[dim_id + 1]::DOUBLE), 6) AS c_val,
           count(*) AS n_members
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_embedding_neardup_lsh" ->
      s"""${lshPlanesCte(8)},
         bk AS (
           SELECT e.vec_id, e.embedding,
             CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), i ->
                    e.embedding[i]::DOUBLE * pl.p[i])) >= 0
                  THEN (1::BIGINT << pl.b) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings e CROSS JOIN planes pl
           GROUP BY e.vec_id, e.embedding)
         SELECT DISTINCT vec_id_a, vec_id_b, sim FROM (
           SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
               b.embedding::DOUBLE[]), 6) AS sim
           FROM bk a JOIN bk b
             ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         WHERE sim >= 0.3
         ORDER BY vec_id_a, vec_id_b""",
    "q_text_stats" ->
      """WITH t AS (
           SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents)
         SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE round(CAST(list_sum(list_transform(toks,
                  x -> length(x))) AS BIGINT) / len(toks), 4)
           END AS avg_token_len,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE round((length(text) - length(regexp_replace(text,
                  '[.,!?;:]', '', 'g'))) / length(text), 6)
           END AS punct_ratio,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE round(len(list_filter(toks, x -> list_contains(
                  ['the','and','of','is','to','a','in'], x))) / len(toks), 4)
           END AS stopword_ratio
         FROM t ORDER BY doc_id""",
    "q_lang_id" ->
      """WITH t AS (
           SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents),
         h AS (
           SELECT doc_id, lang,
             CAST(len(list_filter(toks, x -> list_contains(
               ['the','and','of','is','to','a','in'], x))) AS BIGINT)
               AS en_hits,
             CAST(len(list_filter(toks, x -> list_contains(
               ['der','die','das','und','ist','ein'], x))) AS BIGINT)
               AS de_hits,
             CAST(len(list_filter(toks, x -> list_contains(
               ['le','la','les','et','est','une'], x))) AS BIGINT)
               AS fr_hits,
             CAST(len(list_filter(toks, x -> list_contains(
               ['el','los','las','es','una','y'], x))) AS BIGINT)
               AS es_hits
           FROM t)
         SELECT doc_id, lang,
           CASE WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                  AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                THEN 'en'
                WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                  AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                THEN 'de'
                WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                  AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                THEN 'fr'
                WHEN es_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                  AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                THEN 'es'
                ELSE 'und' END AS pred_lang,
           en_hits, de_hits, fr_hits, es_hits
         FROM h ORDER BY doc_id""",
    "q_lang_confusion" ->
      """WITH t AS (
           SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents),
         h AS (
           SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains(
               ['the','and','of','is','to','a','in'], x))) AS en_hits,
             len(list_filter(toks, x -> list_contains(
               ['der','die','das','und','ist','ein'], x))) AS de_hits,
             len(list_filter(toks, x -> list_contains(
               ['le','la','les','et','est','une'], x))) AS fr_hits,
             len(list_filter(toks, x -> list_contains(
               ['el','los','las','es','una','y'], x))) AS es_hits
           FROM t),
         p AS (
           SELECT lang,
             CASE WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                    AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                  THEN 'en'
                  WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                    AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                  THEN 'de'
                  WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                    AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                  THEN 'fr'
                  WHEN es_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                    AND greatest(en_hits, de_hits, fr_hits, es_hits) > 0
                  THEN 'es'
                  ELSE 'und' END AS pred_lang
           FROM h)
         SELECT lang, pred_lang, count(*) AS n
         FROM p GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_event_paths" ->
      """WITH s AS (
           SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
           FROM events WHERE user_id IS NOT NULL
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT e1, e2, e3, count(*) AS n
         FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
         GROUP BY 1, 2, 3
         ORDER BY n DESC, e1, e2, e3 LIMIT 20""",
    "q_fingerprint" ->
      """SELECT doc_id,
         sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "q_incremental_dedup" ->
      """WITH fp AS (
           SELECT doc_id,
             sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
           FROM documents),
         c AS (SELECT DISTINCT f FROM fp WHERE doc_id < 250)
         SELECT doc_id,
           CAST(CASE WHEN f IN (SELECT f FROM c) THEN 1 ELSE 0 END AS INT)
             AS is_dup
         FROM fp WHERE doc_id >= 250 ORDER BY doc_id""",
    "q_semdedup" ->
      """WITH c AS MATERIALIZED (
           SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id % 40 = 0),
         assign AS MATERIALIZED (
           SELECT vec_id, embedding, centroid_id FROM (
             SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6)
                   DESC, c.centroid_id) AS rn
             FROM embeddings e CROSS JOIN c)
           WHERE rn = 1),
         drops AS MATERIALIZED (
           SELECT DISTINCT b.vec_id
           FROM assign a JOIN assign b
             ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
           WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
             b.embedding::DOUBLE[]), 6) >= 0.35)
         SELECT vec_id, centroid_id FROM assign
         WHERE vec_id NOT IN (SELECT vec_id FROM drops)
         ORDER BY vec_id""",
    "q_rrf_fusion" ->
      """WITH qv AS (
           SELECT embedding::DOUBLE[] AS qe FROM embeddings
           WHERE vec_id = 0),
         sem0 AS (
           SELECT e.vec_id AS id,
             round(list_cosine_similarity(qv.qe, e.embedding::DOUBLE[]), 6)
               AS sim
           FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
         semp AS (SELECT id, sim FROM sem0 ORDER BY sim DESC, id LIMIT 50),
         sem AS (
           SELECT id, CAST(row_number() OVER (ORDER BY sim DESC, id)
             AS BIGINT) AS r_sem
           FROM semp),
         d AS (
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
           FROM tf GROUP BY 1),
         lexp AS (
           SELECT doc_id AS id,
             round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * (1.2 + 1.0)
               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
           FROM tf JOIN df USING (term) CROSS JOIN stats
           GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50),
         lex AS (
           SELECT id, CAST(row_number() OVER (ORDER BY bm25 DESC, id)
             AS BIGINT) AS r_lex
           FROM lexp)
         SELECT coalesce(sem.id, lex.id) AS id, r_sem, r_lex,
           round(coalesce(1.0 / (60.0 + r_sem), 0.0) +
             coalesce(1.0 / (60.0 + r_lex), 0.0), 6) AS rrf
         FROM sem FULL OUTER JOIN lex ON sem.id = lex.id
         ORDER BY rrf DESC, id LIMIT 20""",
    // 3 unrolled greedy MMR picks over the 10-row semantic pool
    "q_mmr_select" ->
      """WITH qv AS (
           SELECT embedding::DOUBLE[] AS qe FROM embeddings
           WHERE vec_id = 0),
         p0 AS (
           SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS ee,
             round(list_cosine_similarity(qv.qe, e.embedding::DOUBLE[]), 6)
               AS rel
           FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
         pool AS (SELECT * FROM p0 ORDER BY rel DESC, id LIMIT 10),
         pr AS (
           SELECT a.id AS ia, b.id AS ib,
             round(list_cosine_similarity(a.ee, b.ee), 6) AS psim
           FROM pool a CROSS JOIN pool b WHERE a.id <> b.id),
         s1 AS (SELECT id, rel, rel AS mmr FROM pool
           ORDER BY rel DESC, id LIMIT 1),
         c2 AS (
           SELECT p.id, p.rel,
             round(0.7 * p.rel - (1.0 - 0.7) * max(pr.psim), 6) AS mmr
           FROM pool p JOIN pr ON pr.ia = p.id
           WHERE pr.ib IN (SELECT id FROM s1)
             AND p.id NOT IN (SELECT id FROM s1)
           GROUP BY p.id, p.rel),
         s2 AS (SELECT id, rel, mmr FROM c2 ORDER BY mmr DESC, id LIMIT 1),
         sel2 AS (SELECT id FROM s1 UNION ALL SELECT id FROM s2),
         c3 AS (
           SELECT p.id, p.rel,
             round(0.7 * p.rel - (1.0 - 0.7) * max(pr.psim), 6) AS mmr
           FROM pool p JOIN pr ON pr.ia = p.id
           WHERE pr.ib IN (SELECT id FROM sel2)
             AND p.id NOT IN (SELECT id FROM sel2)
           GROUP BY p.id, p.rel),
         s3 AS (SELECT id, rel, mmr FROM c3 ORDER BY mmr DESC, id LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS sel_rank, id, rel, mmr FROM s1
         UNION ALL SELECT CAST(2 AS BIGINT), id, rel, mmr FROM s2
         UNION ALL SELECT CAST(3 AS BIGINT), id, rel, mmr FROM s3
         ORDER BY sel_rank""",
    "q_silhouette" ->
      """WITH corpus AS (
           SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cents AS (
           SELECT vec_id AS centroid_id, e AS ce FROM corpus
           WHERE vec_id % 40 = 0),
         sims AS (
           SELECT c.vec_id, ct.centroid_id,
             round(list_cosine_similarity(c.e, ct.ce), 6) AS c_sim
           FROM corpus c CROSS JOIN cents ct),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY c_sim DESC, centroid_id) AS rn FROM sims),
         own AS (SELECT vec_id, centroid_id, c_sim AS a_sim
           FROM ranked WHERE rn = 1),
         oth AS (SELECT vec_id, c_sim AS b_sim FROM ranked WHERE rn = 2),
         s AS (
           SELECT o.centroid_id,
             CASE WHEN o.a_sim = t.b_sim THEN 0.0
                  ELSE (o.a_sim - t.b_sim) / (1.0 - t.b_sim) END AS sil
           FROM own o JOIN oth t ON o.vec_id = t.vec_id)
         SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_members,
           round(CAST(sum(CAST(sil AS DECIMAL(28,12))) AS DOUBLE) /
             CAST(count(*) AS DOUBLE), 6) AS mean_silhouette
         FROM s GROUP BY 1 ORDER BY 1""",
    "q_kmeans_iter" ->
      """WITH c0 AS MATERIALIZED (
           SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id % 40 = 0),
         a1 AS MATERIALIZED (
           SELECT vec_id, embedding, centroid_id FROM (
             SELECT e.vec_id, e.embedding, c0.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c0.ce),
                   6) DESC, c0.centroid_id) AS rn
             FROM embeddings e CROSS JOIN c0)
           WHERE rn = 1),
         m1 AS MATERIALIZED (
           SELECT centroid_id, dim_id,
             round(CAST(sum(CAST(embedding[dim_id + 1]::DOUBLE
               AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS m
           FROM (SELECT centroid_id, unnest(range(0, 64)) AS dim_id,
                   embedding FROM a1)
           GROUP BY 1, 2),
         c1 AS MATERIALIZED (
           SELECT centroid_id, list(m ORDER BY dim_id) AS ce
           FROM m1 GROUP BY 1),
         a2 AS MATERIALIZED (
           SELECT vec_id, embedding, centroid_id FROM (
             SELECT e.vec_id, e.embedding, c1.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[], c1.ce),
                   6) DESC, c1.centroid_id) AS rn
             FROM embeddings e CROSS JOIN c1)
           WHERE rn = 1)
         SELECT centroid_id, dim_id,
           round(CAST(sum(CAST(embedding[dim_id + 1]::DOUBLE
             AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS c_val,
           count(*) AS n_members
         FROM (SELECT centroid_id, unnest(range(0, 64)) AS dim_id,
                 embedding FROM a2)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_power_iteration" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
         xs AS (SELECT i, e[i + 1] AS xi, e
                FROM (SELECT unnest(range(0, 64)) AS i, e FROM e)),
         g AS (SELECT i, j,
                 CAST(sum(CAST(floor(xi * e[j + 1] * 1e12 + 0.5)
                   AS BIGINT)) AS DOUBLE) / 1e12 AS a
               FROM (SELECT i, xi, unnest(range(0, 64)) AS j, e FROM xs)
               GROUP BY 1, 2),
         v0 AS (SELECT unnest(range(0, 64)) AS j, 1.0::DOUBLE AS vj),
         w1 AS (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v0 ON g.j = v0.j GROUP BY 1),
         n1 AS (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w1),
         v1 AS (SELECT i AS j, wi / nrm AS vj FROM w1 CROSS JOIN n1),
         w2 AS (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v1 ON g.j = v1.j GROUP BY 1),
         n2 AS (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w2),
         v2 AS (SELECT i AS j, wi / nrm AS vj FROM w2 CROSS JOIN n2),
         w3 AS (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v2 ON g.j = v2.j GROUP BY 1),
         n3 AS (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w3),
         v3 AS (SELECT i AS j, wi / nrm AS vj FROM w3 CROSS JOIN n3),
         w4 AS (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v3 ON g.j = v3.j GROUP BY 1),
         n4 AS (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w4),
         v4 AS (SELECT i AS j, wi / nrm AS vj, nrm
                FROM w4 CROSS JOIN n4)
         SELECT CAST(j AS BIGINT) AS dim_id, round(vj, 6) AS loading,
           round(nrm, 6) AS eigenvalue
         FROM v4 ORDER BY dim_id""",
    "q_pca_top2" ->
      """WITH e AS MATERIALIZED (SELECT embedding::DOUBLE[] AS e FROM embeddings),
         xs AS MATERIALIZED (SELECT i, e[i + 1] AS xi, e
                FROM (SELECT unnest(range(0, 64)) AS i, e FROM e)),
         g AS MATERIALIZED (SELECT i, j,
                 CAST(sum(CAST(floor(xi * e[j + 1] * 1e12 + 0.5)
                   AS BIGINT)) AS DOUBLE) / 1e12 AS a
               FROM (SELECT i, xi, unnest(range(0, 64)) AS j, e FROM xs)
               GROUP BY 1, 2),
         v0 AS MATERIALIZED (SELECT unnest(range(0, 64)) AS j, 1.0::DOUBLE AS vj),
         w1 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v0 ON g.j = v0.j GROUP BY 1),
         n1 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w1),
         v1 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj FROM w1 CROSS JOIN n1),
         w2 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v1 ON g.j = v1.j GROUP BY 1),
         n2 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w2),
         v2 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj FROM w2 CROSS JOIN n2),
         w3 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v2 ON g.j = v2.j GROUP BY 1),
         n3 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w3),
         v3 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj FROM w3 CROSS JOIN n3),
         w4 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g JOIN v3 ON g.j = v3.j GROUP BY 1),
         n4 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM w4),
         v4 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj, nrm
                FROM w4 CROSS JOIN n4),
         g2 AS MATERIALIZED (SELECT g.i, g.j, g.a - va.nrm * va.vj * vb.vj AS a
                FROM g JOIN v4 va ON g.i = va.j
                JOIN v4 vb ON g.j = vb.j),
         y1 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g2 JOIN v0 ON g2.j = v0.j GROUP BY 1),
         m1 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM y1),
         u1 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj FROM y1 CROSS JOIN m1),
         y2 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g2 JOIN u1 ON g2.j = u1.j GROUP BY 1),
         m2 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM y2),
         u2 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj FROM y2 CROSS JOIN m2),
         y3 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g2 JOIN u2 ON g2.j = u2.j GROUP BY 1),
         m3 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM y3),
         u3 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj FROM y3 CROSS JOIN m3),
         y4 AS MATERIALIZED (SELECT i, CAST(sum(CAST(a * vj AS DECIMAL(28,12)))
                  AS DOUBLE) AS wi
                FROM g2 JOIN u3 ON g2.j = u3.j GROUP BY 1),
         m4 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,12)))
                  AS DOUBLE)) AS nrm FROM y4),
         u4 AS MATERIALIZED (SELECT i AS j, wi / nrm AS vj, nrm
                FROM y4 CROSS JOIN m4)
         SELECT CAST(v4.j AS BIGINT) AS dim_id,
           round(v4.vj, 6) AS loading_1, round(u4.vj, 6) AS loading_2,
           round(v4.nrm, 6) AS eigenvalue_1,
           round(u4.nrm, 6) AS eigenvalue_2,
           floor(u4.nrm / v4.nrm * 1000000.0 + 0.5) / 1000000.0
             AS lambda_ratio
         FROM v4 JOIN u4 ON v4.j = u4.j ORDER BY dim_id""",
    "q_wasserstein" ->
      """WITH per AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS x,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS g
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         census AS (
           SELECT x,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM per GROUP BY 1),
         stepped AS (
           SELECT x, ca, cb,
             CAST(sum(ca) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cuma,
             CAST(sum(cb) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumb,
             CAST(sum(ca) OVER () AS BIGINT) AS na,
             CAST(sum(cb) OVER () AS BIGINT) AS nb,
             lead(x, 1) OVER (ORDER BY x) - x AS gap
           FROM census),
         m AS (
           SELECT CAST(max(na) AS BIGINT) AS n_a,
             CAST(max(nb) AS BIGINT) AS n_b,
             min(x) AS xmin, max(x) AS xmax,
             CAST(sum(CASE WHEN gap IS NOT NULL AND na > 0 AND nb > 0
               THEN CAST(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))
                 * CAST(gap AS DOUBLE) AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS w1
           FROM stepped)
         SELECT n_a, n_b,
           floor(w1 * 1000000.0 + 0.5) / 1000000.0 AS w1,
           CASE WHEN xmax > xmin
             THEN floor(w1 / CAST(xmax - xmin AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0
             ELSE 0.0 END AS w1_normalized
         FROM m""",
    "q_gpd_tail" ->
      """WITH top AS (
           SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
           ORDER BY x DESC LIMIT 101),
         u AS (SELECT min(x) AS u FROM top),
         ranked AS (
           SELECT u.u, t.x - u.u AS y,
             CAST(row_number() OVER (ORDER BY t.x - u.u) AS BIGINT) AS r
           FROM top t CROSS JOIN u),
         m AS (
           SELECT max(u) AS u,
             CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) / 101.0 AS a0,
             CAST(sum(CAST(y * (101.0 - CAST(r AS DOUBLE))
               AS DECIMAL(28,12))) AS DOUBLE) / 10100.0 AS a1
           FROM ranked)
         SELECT CAST(101 AS BIGINT) AS n_excesses,
           round(u, 2) AS threshold,
           floor(a0 * 1000000.0 + 0.5) / 1000000.0 AS mean_excess,
           CASE WHEN a0 - 2.0 * a1 <> 0.0
             THEN floor((2.0 - a0 / (a0 - 2.0 * a1)) * 1000000.0 + 0.5)
               / 1000000.0
             ELSE 0.0 END AS shape_xi,
           CASE WHEN a0 - 2.0 * a1 <> 0.0
             THEN floor((2.0 * a0 * a1 / (a0 - 2.0 * a1))
               * 1000000.0 + 0.5) / 1000000.0
             ELSE 0.0 END AS scale_sigma
         FROM m""",
    "q_wald_iv" ->
      """WITH per AS (
           SELECT user_id,
             CAST(hour(min(ts)) AS INT) AS h1,
             CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
               END) >= 14 THEN 1 ELSE 0 END AS t,
             CAST(sum(CAST(CASE WHEN event_type = 'purchase'
                 THEN coalesce(value, 0.0) ELSE 0.0 END
               AS DECIMAL(18,6))) AS DOUBLE) AS y
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         zz AS (
           SELECT CASE WHEN h1 < 12 THEN 1 ELSE 0 END AS z, t, y
           FROM per),
         m AS (
           SELECT
             CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(sum(CASE WHEN z = 1 THEN CAST(y AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS sy1,
             CAST(sum(CASE WHEN z = 0 THEN CAST(y AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS sy0,
             CAST(sum(CASE WHEN z = 1 THEN t ELSE 0 END) AS BIGINT)
               AS st1,
             CAST(sum(CASE WHEN z = 0 THEN t ELSE 0 END) AS BIGINT)
               AS st0
           FROM zz)
         SELECT n1 AS n_z1, n0 AS n_z0,
           CASE WHEN n1 > 0 AND n0 > 0
             THEN floor(sy1 / CAST(n1 AS DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0 ELSE 0.0 END AS y_mean_z1,
           CASE WHEN n1 > 0 AND n0 > 0
             THEN floor(sy0 / CAST(n0 AS DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0 ELSE 0.0 END AS y_mean_z0,
           CASE WHEN n1 > 0 AND n0 > 0
             THEN floor((CAST(st1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(st0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END
             AS first_stage,
           CAST(CASE WHEN n1 > 0 AND n0 > 0
             AND abs(CAST(st1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(st0 AS DOUBLE) / CAST(n0 AS DOUBLE)) >= 0.01
             THEN 0 ELSE 1 END AS INT) AS weak_instrument,
           CASE WHEN n1 > 0 AND n0 > 0
             AND abs(CAST(st1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(st0 AS DOUBLE) / CAST(n0 AS DOUBLE)) >= 0.01
             THEN floor((sy1 / CAST(n1 AS DOUBLE)
                 - sy0 / CAST(n0 AS DOUBLE))
               / (CAST(st1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(st0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0
             ELSE 0.0 END AS wald_late
         FROM m""",
    "q_rdd" ->
      """WITH band AS (
           SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS x
           FROM orders
           WHERE abs(CAST(o_totalprice AS DOUBLE) - 150000.0)
             <= 30000.0),
         per AS (
           SELECT l.l_orderkey, b.x,
             CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS y
           FROM lineitem l JOIN band b ON l.l_orderkey = b.o_orderkey
           GROUP BY 1, 2),
         uu AS (
           SELECT x - 150000.0 AS u, y,
             CASE WHEN x >= 150000.0 THEN 1 ELSE 0 END AS side
           FROM per),
         m AS (
           SELECT
             CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nl,
             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nr,
             CAST(sum(CASE WHEN side = 0 THEN CAST(u AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS sul,
             CAST(sum(CASE WHEN side = 1 THEN CAST(u AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS sur,
             CAST(sum(CASE WHEN side = 0 THEN CAST(y AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS syl,
             CAST(sum(CASE WHEN side = 1 THEN CAST(y AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS syr,
             CAST(sum(CASE WHEN side = 0
               THEN CAST(u * y AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS suyl,
             CAST(sum(CASE WHEN side = 1
               THEN CAST(u * y AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS suyr,
             CAST(sum(CASE WHEN side = 0
               THEN CAST(u * u AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS suul,
             CAST(sum(CASE WHEN side = 1
               THEN CAST(u * u AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS suur
           FROM uu),
         ab AS (
           SELECT nl, nr,
             CASE WHEN nl >= 2
                 AND CAST(nl AS DOUBLE) * suul - sul * sul <> 0.0
               THEN (syl * suul - sul * suyl)
                 / (CAST(nl AS DOUBLE) * suul - sul * sul)
               ELSE 0.0 END AS al,
             CASE WHEN nr >= 2
                 AND CAST(nr AS DOUBLE) * suur - sur * sur <> 0.0
               THEN (syr * suur - sur * suyr)
                 / (CAST(nr AS DOUBLE) * suur - sur * sur)
               ELSE 0.0 END AS ar,
             CASE WHEN nl >= 2
                 AND CAST(nl AS DOUBLE) * suul - sul * sul <> 0.0
               THEN (CAST(nl AS DOUBLE) * suyl - sul * syl)
                 / (CAST(nl AS DOUBLE) * suul - sul * sul)
               ELSE 0.0 END AS bl,
             CASE WHEN nr >= 2
                 AND CAST(nr AS DOUBLE) * suur - sur * sur <> 0.0
               THEN (CAST(nr AS DOUBLE) * suyr - sur * syr)
                 / (CAST(nr AS DOUBLE) * suur - sur * sur)
               ELSE 0.0 END AS br
           FROM m)
         SELECT nl AS n_left, nr AS n_right,
           floor(al * 1000000.0 + 0.5) / 1000000.0 AS alpha_left,
           floor(ar * 1000000.0 + 0.5) / 1000000.0 AS alpha_right,
           floor(bl * 1000000.0 + 0.5) / 1000000.0 AS slope_left,
           floor(br * 1000000.0 + 0.5) / 1000000.0 AS slope_right,
           floor((ar - al) * 1000000.0 + 0.5) / 1000000.0 AS tau_jump
         FROM ab""",
    "q_qini" ->
      """WITH per AS (
           SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS s,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS g
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         census AS (
           SELECT s,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nt,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nc,
             CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT)
               AS ct,
             CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT)
               AS cc
           FROM per GROUP BY 1),
         cum AS (
           SELECT s,
             CAST(sum(nt) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cnt,
             CAST(sum(nc) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cnc,
             CAST(sum(ct) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cct,
             CAST(sum(cc) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ccc
           FROM census)
         SELECT s AS score_cutoff, cnt AS n_treated, cnc AS n_control,
           cct AS conv_treated, ccc AS conv_control,
           CASE WHEN cnt > 0 AND cnc > 0
             THEN floor((CAST(cct AS DOUBLE) / CAST(cnt AS DOUBLE)
               - CAST(ccc AS DOUBLE) / CAST(cnc AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0
             ELSE 0.0 END AS uplift_rate,
           CASE WHEN cnt > 0 AND cnc > 0
             THEN floor((CAST(cct AS DOUBLE)
               - CAST(ccc AS DOUBLE) * CAST(cnt AS DOUBLE)
                 / CAST(cnc AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0
             ELSE 0.0 END AS qini
         FROM cum ORDER BY score_cutoff DESC""",
    "q_position_attribution" ->
      """WITH p AS (
           SELECT event_id AS p_id, user_id AS p_user,
             epoch_us(ts) AS p_us, value
           FROM events WHERE user_id IS NOT NULL
             AND event_type = 'purchase' AND value IS NOT NULL),
         t AS (
           SELECT user_id AS t_user, epoch_us(ts) AS t_us,
             event_type AS channel
           FROM events WHERE user_id IS NOT NULL
             AND event_type IN ('view', 'click')),
         j AS (
           SELECT p.p_id, p.value, t.t_us, t.channel
           FROM p LEFT JOIN t ON p.p_user = t.t_user
             AND t.t_us <= p.p_us
             AND t.t_us >= p.p_us - 604800000000),
         r AS (
           SELECT p_id, value, channel,
             CASE WHEN channel IS NOT NULL THEN row_number() OVER (
               PARTITION BY p_id ORDER BY t_us, channel) END AS rk,
             CAST(sum(CASE WHEN channel IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY p_id) AS BIGINT) AS n
           FROM j),
         credited AS (
           SELECT p_id, coalesce(channel, 'direct') AS channel,
             CASE WHEN channel IS NOT NULL
               THEN value * (CASE WHEN n = 1 THEN 1.0
                 WHEN n = 2 THEN 0.5
                 WHEN rk = 1 OR rk = n THEN 0.4
                 ELSE 0.2 / CAST(greatest(n - 2, 1) AS DOUBLE) END)
               ELSE value END AS credit
           FROM r)
         SELECT channel,
           CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(round(sum(CAST(credit AS DECIMAL(28,12))), 2) AS DOUBLE)
             AS credit
         FROM credited GROUP BY 1 ORDER BY 1""",
    "q_closeness" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT pa AS a, pb AS b FROM pr
               UNION ALL SELECT pb, pa FROM pr),
         seeds AS MATERIALIZED (
           SELECT a AS src FROM (
             SELECT a, count(*) AS deg FROM e GROUP BY 1
             ORDER BY deg DESC, a LIMIT 5)),
         v0 AS MATERIALIZED (SELECT src, src AS node, CAST(0 AS BIGINT) AS hop
                FROM seeds),
         f1 AS MATERIALIZED (SELECT DISTINCT v0.src, e.b AS node
                FROM v0 JOIN e ON v0.node = e.a),
         n1 AS MATERIALIZED (SELECT src, node, CAST(1 AS BIGINT) AS hop FROM f1
                WHERE NOT EXISTS (SELECT 1 FROM v0
                  WHERE v0.src = f1.src AND v0.node = f1.node)),
         v1 AS MATERIALIZED (SELECT * FROM v0 UNION ALL SELECT * FROM n1),
         f2 AS MATERIALIZED (SELECT DISTINCT n1.src, e.b AS node
                FROM n1 JOIN e ON n1.node = e.a),
         n2 AS MATERIALIZED (SELECT src, node, CAST(2 AS BIGINT) AS hop FROM f2
                WHERE NOT EXISTS (SELECT 1 FROM v1
                  WHERE v1.src = f2.src AND v1.node = f2.node)),
         v2 AS MATERIALIZED (SELECT * FROM v1 UNION ALL SELECT * FROM n2),
         f3 AS MATERIALIZED (SELECT DISTINCT n2.src, e.b AS node
                FROM n2 JOIN e ON n2.node = e.a),
         n3 AS MATERIALIZED (SELECT src, node, CAST(3 AS BIGINT) AS hop FROM f3
                WHERE NOT EXISTS (SELECT 1 FROM v2
                  WHERE v2.src = f3.src AND v2.node = f3.node)),
         v3 AS MATERIALIZED (SELECT * FROM v2 UNION ALL SELECT * FROM n3),
         f4 AS MATERIALIZED (SELECT DISTINCT n3.src, e.b AS node
                FROM n3 JOIN e ON n3.node = e.a),
         n4 AS MATERIALIZED (SELECT src, node, CAST(4 AS BIGINT) AS hop FROM f4
                WHERE NOT EXISTS (SELECT 1 FROM v3
                  WHERE v3.src = f4.src AND v3.node = f4.node)),
         v4 AS MATERIALIZED (SELECT * FROM v3 UNION ALL SELECT * FROM n4),
         m AS MATERIALIZED (
           SELECT src,
             CAST(count(*) - 1 AS BIGINT) AS n_reached,
             CAST(sum(hop) AS BIGINT) AS sum_dist,
             CAST(sum(CASE WHEN hop > 0
               THEN CAST(1.0 / CAST(hop AS DOUBLE) AS DECIMAL(28,12))
               ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS harm
           FROM v4 GROUP BY 1)
         SELECT CAST(src AS BIGINT) AS src, n_reached, sum_dist,
           CASE WHEN sum_dist > 0
             THEN floor(CAST(n_reached AS DOUBLE)
               / CAST(greatest(sum_dist, 1) AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0
             ELSE 0.0 END AS closeness,
           floor(harm * 1000000.0 + 0.5) / 1000000.0
             AS harmonic_centrality
         FROM m ORDER BY src""",
    "q_mixture_weights" ->
      """WITH t AS (
           SELECT source,
             len(list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '')) AS n
           FROM documents),
         g AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens
               FROM t GROUP BY 1),
         s AS (SELECT *, CAST(sqrt(n_tokens) AS DECIMAL(18,6)) AS w_raw
               FROM g),
         tot AS (SELECT sum(w_raw) AS w_tot FROM s)
         SELECT source, n_tokens,
           round(CAST(w_raw AS DOUBLE) / CAST(w_tot AS DOUBLE), 6)
             AS weight,
           CAST(floor(CAST(w_raw AS DOUBLE) / CAST(w_tot AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS alloc_tokens
         FROM s, tot ORDER BY source""",
    "q_shard_plan" ->
      """SELECT
           ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 64
             AS shard_id,
           count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
             x -> x <> ''))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_mixture_sample" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents),
         g AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS nt
               FROM t GROUP BY 1),
         s AS (SELECT *, CAST(sqrt(nt) AS DECIMAL(18,6)) AS w_raw FROM g),
         tot AS (SELECT sum(w_raw) AS w_tot FROM s),
         alloc AS (
           SELECT source,
             CAST(floor(CAST(w_raw AS DOUBLE) / CAST(w_tot AS DOUBLE)
               * 10000 + 0.5) AS BIGINT) AS alloc_tokens
           FROM s, tot),
         c AS (
           SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
               AS BIGINT) AS cum
           FROM t)
         SELECT doc_id, source, n_tokens, cum
         FROM c JOIN alloc USING (source)
         WHERE cum <= alloc_tokens
         ORDER BY doc_id""",
    "q_rolling_fingerprint" ->
      // Linear form: the original per-row lambda indexed the 600-element
      // powers literal AND the varchar per character (`text[i]` is an
      // O(i) UTF-8 scan), costing ~140 s at sf0.1 regardless of skew —
      // flagged the moment check.py grew oracle budgets (r12). Zipping
      // unnest(chars)×unnest(positions) and joining a 600-row powers
      // relation is the same integer sum (order-independent, HUGEINT
      // headroom: 600 · 127 · 2^64 << 2^127) at ~0.5 s.
      s"""WITH pw AS MATERIALIZED (
           SELECT i+1 AS i, ($rollingPowers)[i+1] AS p
           FROM range(0,600) t(i)),
         ch AS MATERIALIZED (
           SELECT doc_id, unnest(range(1, length(text)+1)) AS i,
             unnest(string_split(text,'')) AS c
           FROM documents),
         s AS (SELECT doc_id, sum(ascii(c) * p) AS m0
               FROM ch JOIN pw USING (i) GROUP BY doc_id)
         SELECT doc_id,
           CAST(CASE WHEN m >= 9223372036854775808
                THEN m - 18446744073709551616 ELSE m END AS BIGINT)
             AS rhash
         FROM (SELECT d.doc_id,
                 coalesce(s.m0, 0) % 18446744073709551616 AS m
               FROM documents d LEFT JOIN s USING (doc_id))
         ORDER BY doc_id""",
    "q_frame_sample" ->
      """WITH m AS (
           SELECT doc_id,
             CAST(ceil(CAST(octet_length(encode(text)) AS BIGINT) / 64.0)
               AS BIGINT) AS n_frames
           FROM documents)
         SELECT doc_id, unnest(range(0, n_frames, 8)) AS frame_idx
         FROM m WHERE n_frames > 0
         ORDER BY doc_id, frame_idx""",
    "q_media_features" ->
      """WITH m AS (
           SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
           FROM documents),
         s AS (
           SELECT doc_id, n_bytes, unnest(range(0, 8)) AS dim_id FROM m)
         SELECT doc_id, dim_id,
           ((n_bytes * (dim_id + 1)) % 997) / 997.0 AS feature
         FROM s ORDER BY doc_id, dim_id""",
    "q_multimodal_pack" ->
      """SELECT d.doc_id, d.lang, CAST(e.label AS BIGINT) AS label,
         CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
         round(sqrt(list_dot_product(e.embedding::DOUBLE[],
           e.embedding::DOUBLE[])), 6) AS emb_norm
         FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         ORDER BY d.doc_id""",
    "q_embedding_neardup" ->
      """WITH p AS (
           SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
               b.embedding::DOUBLE[]), 6) AS sim
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         SELECT vec_id_a, vec_id_b, sim FROM p
         WHERE sim >= 0.3 ORDER BY vec_id_a, vec_id_b""",
    "q_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             coalesce(value, 0) AS v
           FROM events WHERE user_id IS NOT NULL),
         x AS (
           SELECT user_id, event_id, ts, v,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM e),
         y AS (
           SELECT user_id, ts, v,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
             '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           count(*) AS n_events, round(sum(v), 2) AS session_value
         FROM y GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q_stream_hourly_counts" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
           '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, count(*) AS n_events,
         round(sum(coalesce(value, 0)), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_kaggle_events" ->
      """WITH raw AS (
           SELECT
             CAST(o_orderkey AS VARCHAR) AS order_id,
             CASE WHEN o_orderkey % 2 = 0
                  THEN strftime(o_orderdate, '%m-%d-%Y')
                  ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             END AS date_r,
             o_orderkey % 5 + 1 AS qty,
             CASE WHEN o_orderkey % 7 = 0 THEN 0.0
                  ELSE o_totalprice END AS amount_raw,
             CASE WHEN o_orderkey % 7 = 0
                  THEN o_totalprice / (o_orderkey % 5 + 1)
                  ELSE 0.0 END AS unit_price
           FROM orders),
         p AS (
           SELECT *,
             coalesce(try_strptime(date_r, '%m-%d-%Y'),
                      try_strptime(date_r, '%Y-%m-%d %H:%M:%S')) AS t0
           FROM raw),
         q AS (
           SELECT *,
             CASE WHEN length(date_r) <= 10 AND t0 IS NOT NULL
                  THEN t0 + INTERVAL 12 HOUR ELSE t0 END AS ts
           FROM p WHERE t0 IS NOT NULL),
         r AS (
           SELECT *,
             CASE WHEN amount_raw = 0.0 AND unit_price > 0.0 AND qty > 0
                  THEN qty * unit_price ELSE amount_raw END AS amount
           FROM q)
         SELECT
           substr(sha256(concat_ws('|', order_id, CAST(ts AS VARCHAR),
             CAST(amount AS VARCHAR))), 1, 24) AS event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           'purchase' AS event, order_id, amount,
           CAST(qty AS INT) AS qty, unit_price, 'USD' AS currency
         FROM r WHERE amount <= 250000.0
         ORDER BY order_id""",
    "q_kaggle_stats" ->
      """WITH ar AS (
           SELECT CAST(o_orderkey % 5 + 1 AS INT) AS qty,
             CASE WHEN o_orderkey % 7 = 0 THEN 0.0
                  ELSE o_totalprice END AS amount_raw,
             CASE WHEN o_orderkey % 7 = 0
                  THEN o_totalprice / (o_orderkey % 5 + 1)
                  ELSE 0.0 END AS unit_price
           FROM orders),
         aamt AS (
           SELECT CASE WHEN amount_raw = 0.0 AND unit_price > 0.0
                        AND qty > 0
                  THEN qty * unit_price ELSE amount_raw END AS amount
           FROM ar),
         astat AS (
           SELECT 'amazon_sale_report' AS file,
             count(*) AS rows_total,
             CAST(sum(CASE WHEN amount <= 250000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS written,
             CAST(0 AS BIGINT) AS skipped_bad_date_value,
             CAST(0 AS BIGINT) AS skipped_no_ts,
             CAST(sum(CASE WHEN amount > 250000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS skipped_amount_outlier
           FROM aamt),
         ir AS (
           SELECT
             CASE WHEN o_orderkey % 11 = 0
                  THEN strftime(o_orderdate, '%Y-%m-%d')
                  ELSE strftime(o_orderdate, '%m-%d-') ||
                       lpad(CAST(year(o_orderdate) - 1980 AS VARCHAR), 2, '0')
             END AS date_tok,
             o_totalprice AS gross_amt
           FROM orders),
         icls AS (
           SELECT CASE
             WHEN date_tok IS NOT NULL AND date_tok <> ''
                  AND NOT regexp_matches(date_tok, '^\d{2}-\d{2}-\d{2}$')
               THEN 'bad_date'
             WHEN try_strptime(date_tok, '%m-%d-%y') IS NULL THEN 'no_ts'
             WHEN gross_amt > 300000.0 THEN 'outlier'
             ELSE 'written' END AS c
           FROM ir),
         istat AS (
           SELECT 'international_sale_report' AS file,
             count(*) AS rows_total,
             CAST(sum(CASE WHEN c = 'written' THEN 1 ELSE 0 END)
               AS BIGINT) AS written,
             CAST(sum(CASE WHEN c = 'bad_date' THEN 1 ELSE 0 END)
               AS BIGINT) AS skipped_bad_date_value,
             CAST(sum(CASE WHEN c = 'no_ts' THEN 1 ELSE 0 END)
               AS BIGINT) AS skipped_no_ts,
             CAST(sum(CASE WHEN c = 'outlier' THEN 1 ELSE 0 END)
               AS BIGINT) AS skipped_amount_outlier
           FROM icls)
         SELECT * FROM astat UNION ALL SELECT * FROM istat
         ORDER BY file""",
    "q_kaggle_intl" ->
      """WITH raw AS (
           SELECT
             CASE WHEN o_orderkey % 11 = 0
                  THEN strftime(o_orderdate, '%Y-%m-%d')
                  ELSE strftime(o_orderdate, '%m-%d-') ||
                       lpad(CAST(year(o_orderdate) - 1980 AS VARCHAR), 2, '0')
             END AS date_tok,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE 'cust_' || CAST(o_custkey % 100 AS VARCHAR)
             END AS customer0,
             'sku_' || CAST(o_orderkey % 997 AS VARCHAR) AS sku,
             CAST(o_orderkey % 9 AS INT) AS pcs,
             o_totalprice / 100.0 AS rate,
             o_totalprice AS gross_amt
           FROM orders),
         f AS (
           SELECT * FROM raw
           WHERE regexp_matches(date_tok, '^\d{2}-\d{2}-\d{2}$')),
         p AS (
           SELECT *,
             try_strptime(date_tok, '%m-%d-%y') + INTERVAL 12 HOUR AS ts,
             coalesce(customer0, 'unknown_customer') AS customer
           FROM f)
         SELECT
           substr(sha256(concat_ws('|', customer, sku, date_tok,
             CAST(gross_amt AS VARCHAR))), 1, 24) AS sale_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           strftime(ts, '%Y-%m-%d') AS date_key,
           customer, sku, pcs, rate, gross_amt, 'INR' AS currency
         FROM p WHERE ts IS NOT NULL
         ORDER BY sale_id, customer, sku, pcs, rate""",
    "q_upsert_intl" ->
      """WITH raw AS MATERIALIZED (
           SELECT
             CASE WHEN o_orderkey % 11 = 0
                  THEN strftime(o_orderdate, '%Y-%m-%d')
                  ELSE strftime(o_orderdate, '%m-%d-') ||
                       lpad(CAST(year(o_orderdate) - 1980 AS VARCHAR), 2, '0')
             END AS date_tok,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE 'cust_' || CAST(o_custkey % 100 AS VARCHAR)
             END AS customer0,
             'sku_' || CAST(o_orderkey % 997 AS VARCHAR) AS sku,
             CAST(o_orderkey % 9 AS INT) AS pcs,
             o_totalprice / 100.0 AS rate,
             o_totalprice AS gross_amt
           FROM orders),
         f AS MATERIALIZED (
           SELECT * FROM raw
           WHERE regexp_matches(date_tok, '^\d{2}-\d{2}-\d{2}$')),
         p AS MATERIALIZED (
           SELECT *,
             try_strptime(date_tok, '%m-%d-%y') + INTERVAL 12 HOUR AS ts,
             coalesce(customer0, 'unknown_customer') AS customer
           FROM f),
         intl AS MATERIALIZED (
           SELECT
             substr(sha256(concat_ws('|', customer, sku, date_tok,
               CAST(gross_amt AS VARCHAR))), 1, 24) AS sale_id,
             ts, strftime(ts, '%Y-%m-%d') AS date_key,
             customer, sku, pcs, rate, gross_amt, 'INR' AS currency
           FROM p WHERE ts IS NOT NULL),
         b1 AS MATERIALIZED (SELECT * FROM intl WHERE pcs % 2 = 0),
         b2 AS MATERIALIZED (
           SELECT sale_id, ts, date_key, customer, sku, pcs,
                  rate + 1000.0 AS rate, gross_amt, currency
           FROM intl WHERE pcs % 3 <> 1),
         c1 AS MATERIALIZED (
           SELECT customer_name,
             CAST(dense_rank() OVER (ORDER BY customer_name) AS BIGINT)
               AS customer_id
           FROM (SELECT DISTINCT customer AS customer_name FROM b1)),
         c2 AS MATERIALIZED (
           SELECT customer_name,
             (SELECT max(customer_id) FROM c1) +
             CAST(dense_rank() OVER (ORDER BY customer_name) AS BIGINT)
               AS customer_id
           FROM (SELECT DISTINCT customer AS customer_name FROM b2
                 WHERE customer NOT IN (SELECT customer_name FROM c1))),
         cust AS MATERIALIZED (SELECT * FROM c1 UNION ALL SELECT * FROM c2),
         p1 AS MATERIALIZED (
           SELECT sku,
             CAST(dense_rank() OVER (ORDER BY sku) AS BIGINT) AS product_id
           FROM (SELECT DISTINCT sku FROM b1)),
         p2 AS MATERIALIZED (
           SELECT sku,
             (SELECT max(product_id) FROM p1) +
             CAST(dense_rank() OVER (ORDER BY sku) AS BIGINT) AS product_id
           FROM (SELECT DISTINCT sku FROM b2
                 WHERE sku NOT IN (SELECT sku FROM p1))),
         prod AS MATERIALIZED (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
         u AS MATERIALIZED (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
         m AS MATERIALIZED (
           SELECT sale_id, ts, date_key, customer, sku, pcs, rate,
                  gross_amt, currency
           FROM (SELECT u.*, row_number() OVER (PARTITION BY sale_id
                   ORDER BY ts DESC, pcs DESC, rate DESC) AS rn FROM u)
           WHERE rn = 1)
         SELECT m.sale_id,
           strftime(m.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, m.date_key,
           c.customer_id, pr.product_id, m.pcs, m.rate, m.gross_amt,
           m.currency
         FROM m
         JOIN cust c ON m.customer = c.customer_name
         JOIN prod pr ON m.sku = pr.sku
         ORDER BY m.sale_id""",
    "q_multimodal_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         (CAST(octet_length(encode(text)) AS BIGINT) * 2654435761) % 1023 + 1
           AS width,
         (CAST(octet_length(encode(text)) AS BIGINT) * 40503) % 767 + 1
           AS height,
         CAST(ceil(CAST(octet_length(encode(text)) AS BIGINT) / 64.0)
           AS BIGINT) AS n_frames
         FROM documents ORDER BY doc_id""",
    "q_asof_join" ->
      """WITH spend AS (
           SELECT o_custkey, o_orderdate,
             round(sum(o_totalprice), 2) AS day_spend,
             CAST(count(*) AS BIGINT) AS day_orders
           FROM orders GROUP BY 1, 2),
         ev AS (
           SELECT user_id, event_id, ts FROM events
           WHERE user_id IS NOT NULL)
         SELECT e.user_id, e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           strftime(s.o_orderdate, '%Y-%m-%d') AS asof_date,
           s.day_spend, s.day_orders
         FROM ev e ASOF JOIN spend s
           ON e.user_id = s.o_custkey AND e.ts >= s.o_orderdate
         ORDER BY e.user_id, e.event_id""",
    "q_range_join" ->
      // ts is TIMESTAMP_NS in the raw parquet; CAST to TIMESTAMP (µs) so
      // the range comparisons see exactly what Spark's µs timestamps see.
      """WITH ev AS (
           SELECT event_id, user_id, event_type, value,
             CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE user_id IS NOT NULL)
         SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
           s.user_id AS user_id,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           coalesce(p.value, 0) AS purchase_value
         FROM ev s JOIN ev p
           ON s.user_id = p.user_id
          AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 7 DAY
         WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
         ORDER BY signup_id, purchase_id""",
    "q_signup_no_purchase" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS event_date
         FROM events
         WHERE event_type = 'signup' AND user_id IS NOT NULL
         EXCEPT
         SELECT user_id, strftime(ts, '%Y-%m-%d') FROM events
         WHERE event_type = 'purchase' AND user_id IS NOT NULL
         ORDER BY user_id, event_date""",
    "q_signup_and_purchase" ->
      """SELECT user_id FROM events
         WHERE event_type = 'signup' AND user_id IS NOT NULL
         INTERSECT
         SELECT user_id FROM events
         WHERE event_type = 'purchase' AND user_id IS NOT NULL
         ORDER BY user_id""",
    "q_event_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
             AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
             AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
             AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_grouping_sets" ->
      """WITH e AS (
           SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
             coalesce(value, 0) AS v
           FROM events)
         SELECT event_date, event_type, round(sum(v), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(grouping(event_date) * 2 + grouping(event_type) AS BIGINT)
             AS gid
         FROM e
         GROUP BY GROUPING SETS ((event_date), (event_type), ())
         ORDER BY event_date ASC NULLS FIRST, event_type ASC NULLS FIRST""",
    "q_event_gaps" ->
      // epoch() of a µs timestamp is exact in double (µs counts < 2^53);
      // trunc matches Spark's toward-zero double→bigint cast.
      """WITH e AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE user_id IS NOT NULL)
         SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           CAST(trunc(epoch(ts) - epoch(lag(ts, 1) OVER
             (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
             AS gap_seconds
         FROM e ORDER BY user_id, event_id""",
    "q_running_revenue" ->
      """WITH p AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             coalesce(value, 0) AS value
           FROM events
           WHERE user_id IS NOT NULL AND event_type = 'purchase')
         SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, value,
           round(sum(value) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS cum_value
         FROM p ORDER BY user_id, event_id""",
    "q_dedup_clusters" ->
      """WITH RECURSIVE pre AS MATERIALIZED (
           SELECT doc_id, substr(text, 1, 64) AS p64,
             substr(text, 1, 32) AS p32
           FROM documents),
         e0 AS MATERIALIZED (
           SELECT a.doc_id AS a, b.doc_id AS b FROM pre a JOIN pre b
             ON a.p64 = b.p64 AND a.doc_id < b.doc_id
           UNION
           SELECT a.doc_id, b.doc_id FROM pre a JOIN pre b
             ON a.p32 = b.p32 AND a.doc_id < b.doc_id),
         edges AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
         reach(src, dst) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         comp AS MATERIALIZED (
           SELECT src AS node, least(src, min(dst)) AS cluster
           FROM reach GROUP BY src)
         SELECT d.doc_id,
           coalesce(c.cluster, d.doc_id) AS cluster_id,
           CAST(d.doc_id = coalesce(c.cluster, d.doc_id) AS BIGINT)
             AS is_canonical
         FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
         ORDER BY d.doc_id""",
    "q_partial_merge" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           round(sum(coalesce(value, 0)), 2) AS revenue,
           count(*) AS n_events
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_stratified_sample" ->
      """SELECT event_id, event_type, user_id, value FROM events
         WHERE ('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,15))::BIGINT
             % 1000 <
           CASE event_type WHEN 'purchase' THEN 1000 WHEN 'signup' THEN 500
                WHEN 'view' THEN 100 WHEN 'click' THEN 50 ELSE 0 END
         ORDER BY event_id""",
    "q_retention" ->
      """WITH a AS (
           SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS event_date
           FROM events WHERE user_id IS NOT NULL),
         c AS (SELECT user_id, min(event_date) AS cohort_date
               FROM a GROUP BY 1)
         SELECT c.cohort_date,
           date_diff('day', CAST(c.cohort_date AS DATE),
             CAST(a.event_date AS DATE)) AS day_offset,
           count(DISTINCT a.user_id) AS n_users
         FROM a JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_transitions" ->
      """WITH s AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events WHERE user_id IS NOT NULL),
         cnt AS (
           SELECT event_type, next_type, count(*) AS n FROM s
           WHERE next_type IS NOT NULL GROUP BY 1, 2)
         SELECT event_type, next_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE),
             6) AS p
         FROM cnt ORDER BY 1, 2""",
    "q_first_last" ->
      """WITH r AS (
           SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ts DESC, event_id DESC) AS rd
           FROM events)
         SELECT event_type,
           max(CASE WHEN ra = 1 THEN event_id END) AS first_event_id,
           max(CASE WHEN rd = 1 THEN event_id END) AS last_event_id,
           count(*) AS n
         FROM r GROUP BY 1 ORDER BY 1""",
    "q_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY 1, 2),
         d AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
         n AS (SELECT count(*) AS n_docs FROM documents),
         sc AS (
           SELECT doc_id, term, tf, df,
             round(tf * ln(n_docs / df), 6) AS score
           FROM d CROSS JOIN n),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term) AS BIGINT) AS rnk FROM sc)
         SELECT doc_id, term, tf, df, score, rnk FROM r
         WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q_inverted_index" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT term, doc_id, count(*) AS tf
                FROM toks GROUP BY 1, 2),
         st AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                  CAST(sum(tf) AS BIGINT) AS total_tf
                FROM tf GROUP BY 1),
         pc AS (SELECT term, doc_id, tf,
                  row_number() OVER (PARTITION BY term ORDER BY doc_id)
                    AS rn
                FROM tf),
         po AS (SELECT term,
                  string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                    CAST(tf AS VARCHAR), ',' ORDER BY doc_id) AS postings
                FROM pc WHERE rn <= 20 GROUP BY term)
         SELECT st.term, df, total_tf, postings
         FROM st JOIN po USING (term)
         WHERE df >= 5
         ORDER BY df DESC, st.term LIMIT 50""",
    "q_feature_hashing" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '')) AS term
           FROM documents),
         h AS (SELECT doc_id,
                 ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
               FROM toks)
         SELECT doc_id, h & 15 AS bucket,
           CAST(sum(CASE WHEN (h >> 4) & 1 = 0 THEN 1 ELSE -1 END)
             AS BIGINT) AS weight,
           CAST(count(*) AS BIGINT) AS n_tokens
         FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_naive_bayes" ->
      """WITH toks AS (
           SELECT doc_id, lang, unnest(list_filter(string_split_regex(
             lower(text), '\s+'), x -> x <> '')) AS term
           FROM documents),
         ct AS (SELECT lang AS cls, term, count(*) AS cnt
                FROM toks GROUP BY 1, 2),
         cl AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tok_c
                FROM toks GROUP BY 1),
         nd AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY 1),
         v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM toks),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
         dtf AS (SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
                 FROM toks GROUP BY 1, 2, 3),
         dl AS (SELECT doc_id, lang, CAST(sum(tf) AS BIGINT) AS len
                FROM dtf GROUP BY 1, 2),
         sp AS (
           SELECT t.doc_id, t.lang, ct.cls,
             CAST(sum(CAST(CAST(t.tf AS DOUBLE) *
               (ln(CAST(ct.cnt AS DOUBLE) + 1.0) - ln(1.0))
               AS DECIMAL(28,12))) AS DOUBLE) AS ll_m
           FROM dtf t JOIN ct ON ct.term = t.term
           GROUP BY 1, 2, 3),
         sc AS (
           SELECT d.doc_id, d.lang AS actual, c.cls,
             coalesce(sp.ll_m, 0.0)
               + CAST(d.len AS DOUBLE) * (ln(1.0) -
                 ln(CAST(c.tok_c + 1 * v.v AS DOUBLE)))
               + ln(CAST(nd.n_docs AS DOUBLE) / CAST(nt.n_total AS DOUBLE))
               AS score
           FROM dl d
           CROSS JOIN cl c
           CROSS JOIN v CROSS JOIN nt
           JOIN nd ON nd.cls = c.cls
           LEFT JOIN sp ON sp.doc_id = d.doc_id AND sp.cls = c.cls),
         b AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY round(score, 6) DESC, cls) AS rn FROM sc)
         SELECT actual, cls AS predicted, CAST(count(*) AS BIGINT)
           AS n_docs
         FROM b WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_doc_quality" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> list_contains(
                    ['the','and','of','is','to','a','in'], x))) / len(toks)
             END AS sr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE 1.0 - len(list_distinct(toks)) / len(toks)
             END AS rr
           FROM t)
         SELECT doc_id, n_tokens,
           round(sr, 4) AS stopword_ratio, round(rr, 4) AS rep_ratio,
           NOT (n_tokens < 20 OR sr < 0.03 OR rr > 0.8) AS keep,
           concat_ws(',',
             CASE WHEN n_tokens < 20 THEN 'too_short' END,
             CASE WHEN sr < 0.03 THEN 'low_stopword' END,
             CASE WHEN rr > 0.8 THEN 'repetitive' END) AS reason
         FROM m ORDER BY doc_id""",
    "q_edit_distance" ->
      """SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
           round(1.0 - levenshtein(a.text, b.text) /
             greatest(length(a.text), length(b.text)), 6) AS sim
         FROM documents a JOIN documents b
           ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE a.doc_id % 97 = 0
         ORDER BY doc_id_a, doc_id_b""",
    "q_minhash_est" ->
      s"""$sketchShingleCte,
         sigl AS (
           SELECT doc_id, list_transform(range(0, 32), i ->
             CASE WHEN len(hs) = 0 THEN 2147483647
                  ELSE list_min(list_transform(hs, h ->
                    (($minhashA)[i+1] * h + ($minhashB)[i+1])
                      % 2147483647)) END) AS sig
           FROM hs),
         banded AS (
           SELECT doc_id, b.j AS band_id,
             ('0x'||substr(md5(array_to_string(
               sig[b.j*2+1 : b.j*2+2], ',')),1,15))::BIGINT AS band_hash
           FROM sigl CROSS JOIN (SELECT unnest(range(0, 16)) AS j) b),
         buckets AS (
           SELECT band_id, band_hash, list(doc_id) AS bucket
           FROM banded GROUP BY 1, 2
           HAVING count(*) BETWEEN 2 AND 50),
         pairs AS (
           SELECT DISTINCT p[1] AS doc_id_a, p[2] AS doc_id_b FROM (
             SELECT unnest(flatten(list_transform(bucket, x ->
               list_transform(list_filter(bucket, y -> y > x),
                 y -> [x, y])))) AS p
             FROM buckets)),
         j AS (
           SELECT p.doc_id_a, p.doc_id_b,
             round(len(list_filter(range(1, 33),
               i -> sa.sig[i] = sb.sig[i])) / 32, 6) AS est_jaccard,
             round(CASE WHEN len(ha.sh) + len(hb.sh)
                     - len(list_intersect(ha.sh, hb.sh)) = 0 THEN 0.0
                   ELSE len(list_intersect(ha.sh, hb.sh)) /
                     (len(ha.sh) + len(hb.sh)
                       - len(list_intersect(ha.sh, hb.sh)))
                   END, 6) AS exact_jaccard
           FROM pairs p
           JOIN sigl sa ON sa.doc_id = p.doc_id_a
           JOIN sigl sb ON sb.doc_id = p.doc_id_b
           JOIN sh ha ON ha.doc_id = p.doc_id_a
           JOIN sh hb ON hb.doc_id = p.doc_id_b)
         SELECT doc_id_a, doc_id_b, est_jaccard, exact_jaccard,
           round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
         FROM j ORDER BY doc_id_a, doc_id_b""",
    "q_scd2_history" ->
      """WITH e AS (
           SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
             row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE user_id IS NOT NULL),
         feed AS (
           SELECT user_id, day, event_type AS state FROM e WHERE rn = 1),
         m AS (
           SELECT *, CASE WHEN lag(state) OVER w IS NULL
                            OR lag(state) OVER w <> state
                     THEN 1 ELSE 0 END AS chg
           FROM feed WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         v AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS ver
           FROM m),
         i AS (
           SELECT user_id, CAST(ver AS BIGINT) AS version, state,
             min(day) AS valid_from, count(*) AS n_days
           FROM v GROUP BY 1, 2, 3)
         SELECT user_id, version, state, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           (lead(valid_from) OVER w2 IS NULL) AS is_current, n_days
         FROM i WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
         ORDER BY user_id, valid_from""",
    "q_value_ranks" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, pr, cd FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd
           FROM orders
           WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey))
         WHERE o_orderkey % 100 = 0
         ORDER BY o_orderpriority, o_orderkey""",
    "q_semi_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey
             AND o.o_orderdate >= TIMESTAMP '1995-01-01'
             AND o.o_orderdate < TIMESTAMP '1996-01-01')
         ORDER BY c_custkey""",
    "q_anti_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",
    "q_stream_attribution" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE user_id IS NOT NULL)
         SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
           s.user_id AS user_id
         FROM ev s JOIN ev p
           ON s.user_id = p.user_id
          AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 7 DAY
         WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
         ORDER BY signup_id, purchase_id""",
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)
             AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    // ---- distribution / statistical analytics ----
    "q_unpivot" ->
      """WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS event_date
                    FROM events),
         t AS (SELECT unnest(['click','error','purchase','signup','view'])
                 AS event_type),
         c AS (SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
                 count(*) AS n
               FROM events GROUP BY 1, 2)
         SELECT d.event_date, t.event_type,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
         FROM d CROSS JOIN t
         LEFT JOIN c ON c.event_date = d.event_date
                    AND c.event_type = t.event_type
         ORDER BY d.event_date, t.event_type""",
  )
}
