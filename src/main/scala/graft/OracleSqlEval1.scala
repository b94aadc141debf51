package graft

import graft.OracleCtes._

/** DuckDB oracle SQL shard — evaluation & data-valuation reports, part 1
  * (q_calibration .. q_discount_elasticity). Split from SparkEntry in round 10 (VERDICT item
  * 6) so the 463-entry registry stays diff-reviewable; stitched back —
  * order- and content-identical — in `SparkEntry.oracleSql`, which also
  * `require`s key disjointness across shards. */
private[graft] object OracleSqlEval1 {
  val sql: Map[String, String] = Map(
    // Reliability deciles: integer bucket sums; ECE/Brier accumulate
    // DECIMAL(28,12) addends (order-independent), double at the divide.
    "q_calibration" ->
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
         q AS (SELECT sri, y,
             CAST((sri / 10000.0 - y) * (sri / 10000.0 - y)
               AS DECIMAL(28,12)) AS sq FROM s),
         p AS (SELECT least(9, sri // 1000) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(sri) AS BIGINT) AS s_sri,
             CAST(sum(y) AS BIGINT) AS s_y,
             sum(sq) AS s_sq
           FROM q GROUP BY 1),
         g AS (SELECT bucket, n_docs, s_sq,
             s_sri / (10000.0 * n_docs) AS conf_raw,
             s_y / n_docs AS acc_raw,
             abs(s_sri / (10000.0 * n_docs) - s_y / n_docs) AS gap_raw
           FROM p),
         tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
             sum(CAST(n_docs * gap_raw AS DECIMAL(28,12))) AS s_gap,
             sum(s_sq) AS s_sq_tot FROM g)
         SELECT bucket, n_docs, round(conf_raw, 6) AS mean_score,
           round(acc_raw, 6) AS frac_pos, round(gap_raw, 6) AS abs_gap,
           round(CAST(s_gap AS DOUBLE) / n_total, 6) AS ece,
           round(CAST(s_sq_tot AS DOUBLE) / n_total, 6) AS brier
         FROM g CROSS JOIN tot ORDER BY bucket""",
    // Leave-one-source-out: totals minus group sums, integer-exact.
    "q_source_ablation" ->
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS s_chars,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS s_en
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot,
             CAST(sum(s_chars) AS BIGINT) AS c_tot,
             CAST(sum(s_en) AS BIGINT) AS e_tot FROM per)
         SELECT source, n_docs,
           round(c_tot / n_tot, 4) AS mean_chars_all,
           round((c_tot - s_chars) / (n_tot - n_docs), 4)
             AS mean_chars_without,
           round((c_tot - s_chars) / (n_tot - n_docs) - c_tot / n_tot, 4)
             AS delta_chars,
           round((e_tot - s_en) / (n_tot - n_docs), 6) AS en_share_without,
           round((e_tot - s_en) / (n_tot - n_docs) - e_tot / n_tot, 6)
             AS delta_en_share
         FROM per CROSS JOIN tot ORDER BY source""",
    // Independent O(n²) dominance check of the per-size sweep.
    "q_skyline" ->
      """SELECT a.p_partkey, a.p_size, a.p_retailprice
         FROM part a
         WHERE NOT EXISTS (
           SELECT 1 FROM part b
           WHERE b.p_retailprice <= a.p_retailprice
             AND b.p_size >= a.p_size
             AND (b.p_retailprice < a.p_retailprice
                  OR b.p_size > a.p_size))
         ORDER BY a.p_partkey""",
    // Sequential CTE chain mirrors the staged min-ts joins.
    "q_funnel_strict" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         t1 AS (SELECT user_id, min(ts) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
                JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'click' AND e.ts > t1.t1
                  AND e.ts <= t1.t1 + INTERVAL 7 DAY GROUP BY 1),
         t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
                JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > t2.t2
                  AND e.ts <= t2.t2 + INTERVAL 7 DAY GROUP BY 1)
         SELECT c1.n_step1, c2.n_step2, c3.n_step3,
           CASE WHEN c1.n_step1 = 0 THEN 0.0
                ELSE round(c2.n_step2 / c1.n_step1, 6) END AS rate_step2,
           CASE WHEN c2.n_step2 = 0 THEN 0.0
                ELSE round(c3.n_step3 / c2.n_step2, 6) END AS rate_step3
         FROM (SELECT CAST(count(*) AS BIGINT) AS n_step1 FROM t1) c1
         CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_step2 FROM t2) c2
         CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_step3 FROM t3)
           c3""",
    // Co-purchase cosine: the pair CTE is the q_copurchase form; the √ of
    // an exact integer product keeps the double math engine-identical.
    "q_item_cf" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         freq AS (SELECT l_partkey AS item,
             CAST(count(*) AS BIGINT) AS n_item FROM op GROUP BY 1),
         sym AS (SELECT part_a AS item, part_b AS other, n_orders FROM pr
           UNION ALL SELECT part_b, part_a, n_orders FROM pr),
         sc AS (SELECT s.item, s.other, s.n_orders,
             s.n_orders / sqrt(CAST(fa.n_item * fb.n_item AS DOUBLE))
               AS sim
           FROM sym s JOIN freq fa ON fa.item = s.item
             JOIN freq fb ON fb.item = s.other),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY item
             ORDER BY sim DESC, other) AS BIGINT) AS rnk FROM sc)
         SELECT item, other, n_orders, round(sim, 6) AS sim, rnk
         FROM r WHERE rnk <= 5 ORDER BY item, rnk""",
    // One Newton step from w=0: gradient X'(y-1/2), Hessian X'X/4 — all
    // rational (no exp), so the unrolled 3x3 adjugate solve is bit-equal.
    "q_logreg_newton" ->
      """WITH t AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT y, CASE WHEN len(toks) = 0 THEN 0
             ELSE CAST(floor(10000.0 * len(list_filter(toks,
               x -> list_contains(['the','and','of','is','to','a','in'],
                 x))) / len(toks) + 0.5) AS BIGINT) END AS sri,
             CASE WHEN len(toks) = 0 THEN 0
             ELSE CAST(floor(10000.0 *
               (1.0 - len(list_distinct(toks)) / len(toks)) + 0.5)
               AS BIGINT) END AS rri
           FROM t),
         x AS (SELECT y, sri / 10000.0 AS x1, rri / 10000.0 AS x2,
             y - 0.5 AS r, sri, rri FROM s),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             sum(CAST(x1 AS DECIMAL(28,12))) AS s1,
             sum(CAST(x2 AS DECIMAL(28,12))) AS s2,
             sum(CAST(x1 * x1 AS DECIMAL(28,12))) AS s11,
             sum(CAST(x1 * x2 AS DECIMAL(28,12))) AS s12,
             sum(CAST(x2 * x2 AS DECIMAL(28,12))) AS s22,
             sum(CAST(r AS DECIMAL(28,12))) AS g0,
             sum(CAST(x1 * r AS DECIMAL(28,12))) AS g1,
             sum(CAST(x2 * r AS DECIMAL(28,12))) AS g2
           FROM x),
         d AS (SELECT n, n_pos,
             CAST(n AS DOUBLE) AS a00, CAST(s1 AS DOUBLE) AS a01,
             CAST(s2 AS DOUBLE) AS a02, CAST(s11 AS DOUBLE) AS a11,
             CAST(s12 AS DOUBLE) AS a12, CAST(s22 AS DOUBLE) AS a22,
             CAST(g0 AS DOUBLE) AS g0, CAST(g1 AS DOUBLE) AS g1,
             CAST(g2 AS DOUBLE) AS g2
           FROM a),
         j AS (SELECT *,
             a11 * a22 - a12 * a12 AS adj00,
             a02 * a12 - a01 * a22 AS adj01,
             a01 * a12 - a11 * a02 AS adj02,
             a00 * a22 - a02 * a02 AS adj11,
             a01 * a02 - a00 * a12 AS adj12,
             a00 * a11 - a01 * a01 AS adj22
           FROM d),
         k AS (SELECT *,
             a00 * adj00 + a01 * adj01 + a02 * adj02 AS det FROM j),
         w AS (SELECT n, n_pos,
             (4.0 * (adj00 * g0 + adj01 * g1 + adj02 * g2)) / det AS w0,
             (4.0 * (adj01 * g0 + adj11 * g1 + adj12 * g2)) / det AS w1,
             (4.0 * (adj02 * g0 + adj12 * g1 + adj22 * g2)) / det AS w2
           FROM k),
         p AS (SELECT x.y, CASE WHEN w.w0 + w.w1 * (x.sri / 10000.0)
                 + w.w2 * (x.rri / 10000.0) > 0.0 THEN 1 ELSE 0 END AS pred
               FROM x CROSS JOIN w),
         c AS (SELECT CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_correct,
               CAST(count(*) AS BIGINT) AS nn FROM p)
         SELECT w.n, w.n_pos, round(w.w0, 6) AS w0, round(w.w1, 6) AS w1,
           round(w.w2, 6) AS w2,
           round(c.n_correct / c.nn, 6) AS accuracy,
           round(greatest(w.n_pos, w.n - w.n_pos) / w.n, 6)
             AS baseline_acc
         FROM w CROSS JOIN c""",
    // HRW argmax per doc via ranked candidates; h-ties break to the
    // LARGER shard id (mirrors Spark's lexicographic struct max).
    "q_shard_move" ->
      """WITH cand AS (
           SELECT doc_id, r.s AS s,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
               CAST(r.s AS VARCHAR)), 1, 15))::BIGINT AS h
           FROM documents, range(9) r(s)),
         b AS (SELECT doc_id, s AS shard_before FROM (
             SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
               ORDER BY h DESC, s DESC) AS rn FROM cand WHERE s < 8)
           WHERE rn = 1),
         a AS (SELECT doc_id, s AS shard_after FROM (
             SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
               ORDER BY h DESC, s DESC) AS rn FROM cand)
           WHERE rn = 1),
         m AS (SELECT b.shard_before AS shard_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN a.shard_after <> b.shard_before
               THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
           FROM b JOIN a ON a.doc_id = b.doc_id GROUP BY 1)
         SELECT shard_id, n_docs, n_moved,
           round(n_moved / n_docs, 6) AS pct_moved
         FROM m ORDER BY shard_id""",
    // Per-row credit value*cnt/n is the same IEEE expression both
    // engines evaluate; the cross-purchase sum is decimal (exact).
    "q_attribution" ->
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
         g AS (
           SELECT p.p_id, p.value, t.channel,
             CAST(count(t.t_us) AS BIGINT) AS cnt
           FROM p LEFT JOIN t ON t.t_user = p.p_user
             AND t.t_us <= p.p_us AND t.t_us >= p.p_us - 604800000000
           GROUP BY 1, 2, 3),
         n AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY p_id) AS BIGINT)
             AS n FROM g),
         c AS (SELECT coalesce(channel, 'direct') AS channel,
             CASE WHEN channel IS NULL THEN value
               ELSE value * cnt / n END AS credit
           FROM n)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(round(sum(CAST(credit AS DECIMAL(28,12))), 2) AS DOUBLE)
             AS credit
         FROM c GROUP BY 1 ORDER BY 1""",
    // Prefix revenue in DECIMAL; B(t) is IEEE-double on exact inputs,
    // so the argmax and the floor-based display rounds agree bit-wise.
    "q_changepoint" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
           FROM orders GROUP BY 1),
         cum AS (
           SELECT day,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             sum(rev) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
           FROM daily),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS dd, sum(rev) AS ss
           FROM daily),
         b AS (
           SELECT day, t, dd,
             CAST(s1 AS DOUBLE) / t AS m1,
             CAST(ss - s1 AS DOUBLE) / (dd - t) AS m2
           FROM cum CROSS JOIN tot WHERE t < dd),
         s AS (SELECT day, t, dd, m1, m2,
             CAST(t * (dd - t) AS DOUBLE) / dd * (m1 - m2) * (m1 - m2)
               AS bs
           FROM b),
         best AS (SELECT * FROM s ORDER BY bs DESC, day LIMIT 1)
         SELECT day AS split_day, t AS n_days_before,
           dd - t AS n_days_after,
           floor(m1 * 100.0 + 0.5) / 100.0 AS mean_before,
           floor(m2 * 100.0 + 0.5) / 100.0 AS mean_after,
           floor(bs * 100.0 + 0.5) / 100.0 AS b_stat
         FROM best""",
    // Minimax PAV: iso(i) = max_{j<=i} min_{k>=i} pooled(j..k), all on
    // the <=101-centile frame; rates are int/int IEEE divisions.
    "q_isotonic" ->
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
         per AS (SELECT sri // 100 AS bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos
           FROM s GROUP BY 1),
         cum AS (SELECT bin, n, n_pos,
             CAST(sum(n) OVER w AS BIGINT) AS cn,
             CAST(sum(n_pos) OVER w AS BIGINT) AS cp
           FROM per WINDOW w AS (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         pairs AS (
           SELECT lo.bin AS j, hi.bin AS k,
             CAST(hi.cp - (lo.cp - lo.n_pos) AS DOUBLE) /
               CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS a
           FROM cum lo JOIN cum hi ON lo.bin <= hi.bin),
         m AS (SELECT j, k, min(a) OVER (PARTITION BY j ORDER BY k DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
           FROM pairs),
         f AS (SELECT k AS bin, max(mn) AS iso FROM m GROUP BY 1)
         SELECT per.bin, per.n, per.n_pos,
           floor(CAST(per.n_pos AS DOUBLE) / per.n * 1000000.0 + 0.5)
             / 1000000.0 AS rate_raw,
           floor(f.iso * 1000000.0 + 0.5) / 1000000.0 AS rate_iso
         FROM per JOIN f ON f.bin = per.bin ORDER BY per.bin""",
    // Degrees are integers, so every Pearson moment is an exact integer
    // sum; the one-row formula then runs in IEEE doubles.
    "q_assortativity" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey),
         cnt AS (SELECT part_a, part_b, count(*) AS n_orders
           FROM pr GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT part_a AS a, part_b AS b FROM cnt
           UNION ALL SELECT part_b, part_a FROM cnt),
         deg AS (SELECT a AS part, CAST(count(*) AS BIGINT) AS deg
           FROM e GROUP BY 1),
         xy AS (SELECT da.deg AS dx, db.deg AS dy
           FROM e JOIN deg da ON da.part = e.a
             JOIN deg db ON db.part = e.b),
         mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(dx * dx) AS BIGINT) AS sxx,
             CAST(sum(dy * dy) AS BIGINT) AS syy,
             CAST(sum(dx * dy) AS BIGINT) AS sxy
           FROM xy)
         SELECT n AS n_edges,
           floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_deg,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS assortativity
         FROM mo""",
    // Three unrolled peel rounds (fixed budget, same as the engine);
    // round 4 is the surviving-core census. NOT IN is safe: no NULLs.
    "q_kcore" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         cnt AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e0 AS MATERIALIZED (SELECT pa AS a, pb AS b FROM cnt
           UNION ALL SELECT pb, pa FROM cnt),
         n0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM e0),
         k1 AS MATERIALIZED (SELECT a AS node FROM e0 GROUP BY 1
           HAVING count(*) >= 2),
         r1 AS MATERIALIZED (SELECT node FROM n0
           WHERE node NOT IN (SELECT node FROM k1)),
         n1 AS MATERIALIZED (SELECT node FROM n0
           WHERE node IN (SELECT node FROM k1)),
         e1 AS MATERIALIZED (SELECT a, b FROM e0
           WHERE a IN (SELECT node FROM k1)
             AND b IN (SELECT node FROM k1)),
         k2 AS MATERIALIZED (SELECT a AS node FROM e1 GROUP BY 1
           HAVING count(*) >= 2),
         r2 AS MATERIALIZED (SELECT node FROM n1
           WHERE node NOT IN (SELECT node FROM k2)),
         n2 AS MATERIALIZED (SELECT node FROM n1
           WHERE node IN (SELECT node FROM k2)),
         e2 AS MATERIALIZED (SELECT a, b FROM e1
           WHERE a IN (SELECT node FROM k2)
             AND b IN (SELECT node FROM k2)),
         k3 AS MATERIALIZED (SELECT a AS node FROM e2 GROUP BY 1
           HAVING count(*) >= 2),
         r3 AS MATERIALIZED (SELECT node FROM n2
           WHERE node NOT IN (SELECT node FROM k3)),
         n3 AS MATERIALIZED (SELECT node FROM n2
           WHERE node IN (SELECT node FROM k3)),
         allr AS MATERIALIZED (
           SELECT 1 AS rr, node FROM r1
           UNION ALL SELECT 2, node FROM r2
           UNION ALL SELECT 3, node FROM r3
           UNION ALL SELECT 4, node FROM n3)
         SELECT CAST(rr AS BIGINT) AS round,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
         FROM allr GROUP BY 1 ORDER BY 1""",
    // Same edge CTEs as q_kcore; three unrolled sync vote rounds, each
    // a neighbour join + per-node mode with (count DESC, lbl ASC) ties.
    "q_label_prop" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         cnt AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e0 AS (SELECT pa AS a, pb AS b FROM cnt
           UNION ALL SELECT pb, pa FROM cnt),
         l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e0),
         c1 AS (SELECT e.a AS node, l.lbl, count(*) AS c
           FROM e0 e JOIN l0 l ON e.b = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()
             OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
           FROM c1) WHERE rn = 1),
         c2 AS (SELECT e.a AS node, l.lbl, count(*) AS c
           FROM e0 e JOIN l1 l ON e.b = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()
             OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
           FROM c2) WHERE rn = 1),
         c3 AS (SELECT e.a AS node, l.lbl, count(*) AS c
           FROM e0 e JOIN l2 l ON e.b = l.node GROUP BY 1, 2),
         l3 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number()
             OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
           FROM c3) WHERE rn = 1)
         SELECT CAST(lbl AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
         FROM l3 GROUP BY 1
         ORDER BY n_members DESC, community LIMIT 20""",
    // Same neighbour CTEs as q_item_cf; the eval holds out max(part).
    "q_cf_hitrate" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         freq AS (SELECT l_partkey AS item,
             CAST(count(*) AS BIGINT) AS n_item FROM op GROUP BY 1),
         sym AS (SELECT part_a AS item, part_b AS other, n_orders FROM pr
           UNION ALL SELECT part_b, part_a, n_orders FROM pr),
         sc AS (SELECT s.item, s.other,
             s.n_orders / sqrt(CAST(fa.n_item * fb.n_item AS DOUBLE))
               AS sim
           FROM sym s JOIN freq fa ON fa.item = s.item
             JOIN freq fb ON fb.item = s.other),
         r AS (SELECT *, row_number() OVER (PARTITION BY item
             ORDER BY sim DESC, other) AS rnk FROM sc),
         nb AS (SELECT item, other FROM r WHERE rnk <= 5),
         ev AS (SELECT l_orderkey, max(l_partkey) AS target
           FROM op GROUP BY 1 HAVING count(*) >= 2),
         hits AS (SELECT DISTINCT c.l_orderkey
           FROM op c JOIN ev ON ev.l_orderkey = c.l_orderkey
             AND c.l_partkey <> ev.target
           JOIN nb ON nb.item = c.l_partkey AND nb.other = ev.target),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_eval FROM ev),
         h AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM hits)
         SELECT n_eval, n_hits,
           floor(CAST(n_hits AS DOUBLE) / CAST(n_eval AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS hit_rate
         FROM a CROSS JOIN h""",
    // The sensitive attribute is user_id; quasi-keys match q_k_anonymity.
    "q_l_diversity" ->
      """WITH q AS (
           SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(floor(value / 50.0) AS BIGINT) AS vb, user_id
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL AND user_id IS NOT NULL),
         g AS (
           SELECT event_type, d, vb, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS ldiv
           FROM q GROUP BY 1, 2, 3)
         SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_div_groups,
           CAST(sum(CASE WHEN ldiv < 3 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(min(ldiv) AS BIGINT) AS min_l,
           CAST(3 AS BIGINT) AS l
         FROM g""",
    // Customers aggregate before the ntile; cumulative share is a
    // decimal/decimal rational → portable floor round.
    "q_lorenz" ->
      """WITH per AS (
           SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
           FROM orders GROUP BY 1),
         d AS (SELECT o_custkey, spend,
             CAST(ntile(10) OVER (ORDER BY spend, o_custkey) AS BIGINT)
               AS decile
           FROM per),
         bd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(spend) AS dspend
           FROM d GROUP BY 1),
         tot AS (SELECT sum(dspend) AS total FROM bd)
         SELECT decile, n_customers,
           CAST(round(dspend, 2) AS DOUBLE) AS spend,
           floor(CAST(sum(dspend) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / CAST(total AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS cum_share
         FROM bd CROSS JOIN tot ORDER BY decile""",
    // boundary form mirrors q_rfm_scale: rank-ceil(p·n) boundaries via
    // explicit row_number, deciles = 1 + ascending boundaries exceeded
    "q_lorenz_scale" ->
      """WITH per AS (
           SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
           FROM orders GROUP BY 1),
         rk AS (
           SELECT *, row_number() OVER (ORDER BY spend) AS r,
             count(*) OVER () AS n
           FROM per),
         b AS (
           SELECT
             max(CASE WHEN r = greatest(1, CAST(ceil(0.1::DOUBLE * n) AS BIGINT)) THEN spend END) AS b1,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.2::DOUBLE * n) AS BIGINT)) THEN spend END) AS b2,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.3::DOUBLE * n) AS BIGINT)) THEN spend END) AS b3,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.4::DOUBLE * n) AS BIGINT)) THEN spend END) AS b4,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.5::DOUBLE * n) AS BIGINT)) THEN spend END) AS b5,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.6::DOUBLE * n) AS BIGINT)) THEN spend END) AS b6,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.7::DOUBLE * n) AS BIGINT)) THEN spend END) AS b7,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.8::DOUBLE * n) AS BIGINT)) THEN spend END) AS b8,
             max(CASE WHEN r = greatest(1, CAST(ceil(0.9::DOUBLE * n) AS BIGINT)) THEN spend END) AS b9
           FROM rk),
         d AS (
           SELECT per.*, CAST(1
               + CASE WHEN spend > b1 THEN 1 ELSE 0 END
               + CASE WHEN spend > b2 THEN 1 ELSE 0 END
               + CASE WHEN spend > b3 THEN 1 ELSE 0 END
               + CASE WHEN spend > b4 THEN 1 ELSE 0 END
               + CASE WHEN spend > b5 THEN 1 ELSE 0 END
               + CASE WHEN spend > b6 THEN 1 ELSE 0 END
               + CASE WHEN spend > b7 THEN 1 ELSE 0 END
               + CASE WHEN spend > b8 THEN 1 ELSE 0 END
               + CASE WHEN spend > b9 THEN 1 ELSE 0 END AS BIGINT) AS decile
           FROM per CROSS JOIN b),
         bd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(spend) AS dspend
           FROM d GROUP BY 1),
         tot AS (SELECT sum(dspend) AS total FROM bd)
         SELECT decile, n_customers,
           CAST(round(dspend, 2) AS DOUBLE) AS spend,
           floor(CAST(sum(dspend) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / CAST(total AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS cum_share
         FROM bd CROSS JOIN tot ORDER BY decile""",
    // Sample variance from exact integer sums; outputs are rationals
    // of integers → portable floor rounds.
    "q_burstiness" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
         m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS scc
           FROM daily GROUP BY 1),
         x AS (SELECT event_type, n_days,
             CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
             (CAST(n_days AS DOUBLE) * CAST(scc AS DOUBLE)
               - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) /
               (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))
               AS variance
           FROM m WHERE n_days > 1)
         SELECT event_type, n_days,
           floor(mean * 1000000.0 + 0.5) / 1000000.0 AS mean_daily,
           floor(variance * 1000000.0 + 0.5) / 1000000.0 AS var_daily,
           floor(variance / mean * 1000000.0 + 0.5) / 1000000.0 AS fano
         FROM x ORDER BY event_type""",
    // The cross-community sum stays integral (4m·e_c − d_c²) and
    // divides by 4m² once — order-independent on both engines.
    "q_modularity" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         lab AS MATERIALIZED (SELECT pr.part_a AS a, pr.part_b AS b,
             pa.p_brand AS ba, pb.p_brand AS bb
           FROM pr JOIN part pa ON pa.p_partkey = pr.part_a
             JOIN part pb ON pb.p_partkey = pr.part_b),
         mm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
         intra AS MATERIALIZED (SELECT ba AS brand, CAST(count(*) AS BIGINT) AS e_c
           FROM lab WHERE ba = bb GROUP BY 1),
         dir AS MATERIALIZED (SELECT a AS node, ba AS brand FROM lab
           UNION ALL SELECT b, bb FROM lab),
         ds AS MATERIALIZED (SELECT brand, CAST(count(*) AS BIGINT) AS d_c,
             CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
           FROM dir GROUP BY 1),
         per AS MATERIALIZED (SELECT ds.brand, ds.n_nodes,
             CAST(coalesce(intra.e_c, 0) AS BIGINT) AS e_c, ds.d_c,
             4 * mm.m * CAST(coalesce(intra.e_c, 0) AS BIGINT)
               - ds.d_c * ds.d_c AS num, mm.m
           FROM ds LEFT JOIN intra ON intra.brand = ds.brand
             CROSS JOIN mm),
         tot AS MATERIALIZED (SELECT CAST(sum(num) AS BIGINT) AS num_tot,
             max(m) AS m2 FROM per)
         SELECT per.brand, per.n_nodes, per.e_c AS n_intra_edges,
           per.d_c AS degree_sum,
           floor(CAST(per.num AS DOUBLE) /
             (4.0 * CAST(per.m AS DOUBLE) * CAST(per.m AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS contribution,
           floor(CAST(tot.num_tot AS DOUBLE) /
             (4.0 * CAST(tot.m2 AS DOUBLE) * CAST(tot.m2 AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS q_modularity
         FROM per CROSS JOIN tot ORDER BY per.brand""",
    // Six independent distinct-child-key anti-joins; a healthy fixture
    // reports zero orphans — the report, not the zero, is the product.
    "q_ref_integrity" ->
      """WITH a AS (
           SELECT 'customer->nation' AS relationship,
             (SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT)
               FROM customer WHERE c_nationkey IS NOT NULL) AS n_child_keys,
             (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT c_nationkey AS k FROM customer
                  WHERE c_nationkey IS NOT NULL) ck
               WHERE k NOT IN (SELECT n_nationkey FROM nation))
               AS n_orphan_keys
           UNION ALL SELECT 'lineitem->orders',
             (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
               FROM lineitem WHERE l_orderkey IS NOT NULL),
             (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT l_orderkey AS k FROM lineitem
                  WHERE l_orderkey IS NOT NULL) ck
               WHERE k NOT IN (SELECT o_orderkey FROM orders))
           UNION ALL SELECT 'lineitem->part',
             (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)
               FROM lineitem WHERE l_partkey IS NOT NULL),
             (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT l_partkey AS k FROM lineitem
                  WHERE l_partkey IS NOT NULL) ck
               WHERE k NOT IN (SELECT p_partkey FROM part))
           UNION ALL SELECT 'lineitem->supplier',
             (SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT)
               FROM lineitem WHERE l_suppkey IS NOT NULL),
             (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT l_suppkey AS k FROM lineitem
                  WHERE l_suppkey IS NOT NULL) ck
               WHERE k NOT IN (SELECT s_suppkey FROM supplier))
           UNION ALL SELECT 'orders->customer',
             (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
               FROM orders WHERE o_custkey IS NOT NULL),
             (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT o_custkey AS k FROM orders
                  WHERE o_custkey IS NOT NULL) ck
               WHERE k NOT IN (SELECT c_custkey FROM customer))
           UNION ALL SELECT 'supplier->nation',
             (SELECT CAST(count(DISTINCT s_nationkey) AS BIGINT)
               FROM supplier WHERE s_nationkey IS NOT NULL),
             (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT s_nationkey AS k FROM supplier
                  WHERE s_nationkey IS NOT NULL) ck
               WHERE k NOT IN (SELECT n_nationkey FROM nation)))
         SELECT relationship, n_child_keys, n_orphan_keys,
           floor(CAST(n_orphan_keys AS DOUBLE) /
             CAST(n_child_keys AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS pct_orphans
         FROM a ORDER BY relationship""",
    // Same ln both engines produce (entropy precedent); the tail sum
    // accumulates decimal-cast addends, so it is order-independent.
    "q_degree_dist" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT pa AS a FROM pr UNION ALL SELECT pb FROM pr),
         deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg
           FROM e GROUP BY 1),
         hist AS (SELECT deg AS degree, CAST(count(*) AS BIGINT) AS n_nodes
           FROM deg GROUP BY 1),
         mle AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
             sum(CAST(ln(CAST(deg AS DOUBLE) / 1.5) AS DECIMAL(28,12)))
               AS lsum
           FROM deg WHERE deg >= 2)
         SELECT hist.degree, hist.n_nodes, mle.n_tail,
           round(1.0 + CAST(mle.n_tail AS DOUBLE)
             / CAST(mle.lsum AS DOUBLE), 6) AS alpha
         FROM hist CROSS JOIN mle ORDER BY hist.degree""",
    // Per-user type sets are domain-bounded, so the self-join is linear
    // in users; counts exact, ratio portable-floored.
    "q_audience_overlap" ->
      """WITH tu AS (
           SELECT DISTINCT event_type AS t, user_id AS u FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         sizes AS (SELECT t, CAST(count(*) AS BIGINT) AS n
           FROM tu GROUP BY 1),
         ab AS (
           SELECT a.t AS type_a, b.t AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
           FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
           GROUP BY 1, 2)
         SELECT ab.type_a, ab.type_b, sa.n AS n_a, sb.n AS n_b,
           ab.n_both,
           floor(CAST(ab.n_both AS DOUBLE) /
             CAST(sa.n + sb.n - ab.n_both AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         FROM ab JOIN sizes sa ON sa.t = ab.type_a
           JOIN sizes sb ON sb.t = ab.type_b
         ORDER BY ab.type_a, ab.type_b""",
    // avg DAU / MAU per month; rationals of exact distinct counts.
    "q_stickiness" ->
      """WITH base AS (
           SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             CAST(ts AS DATE) AS d, user_id
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         dau AS (
           SELECT month, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dd) AS BIGINT) AS sum_dau
           FROM (SELECT month, d,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dd
             FROM base GROUP BY 1, 2)
           GROUP BY 1),
         mau AS (SELECT month,
             CAST(count(DISTINCT user_id) AS BIGINT) AS mau
           FROM base GROUP BY 1)
         SELECT dau.month, dau.n_days, mau.mau,
           floor(CAST(sum_dau AS DOUBLE) / n_days * 1000000.0 + 0.5)
             / 1000000.0 AS avg_dau,
           floor(CAST(sum_dau AS DOUBLE) / n_days / mau.mau
             * 1000000.0 + 0.5) / 1000000.0 AS stickiness
         FROM dau JOIN mau ON mau.month = dau.month
         ORDER BY dau.month""",
    // Both HHI legs stay decimal-exact; ONE double division at the end.
    "q_hhi" ->
      """WITH rev AS (
           SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(18,6))) AS r
           FROM lineitem GROUP BY 1),
         per AS (
           SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
             sum(rev.r) AS total, sum(rev.r * rev.r) AS sum_sq
           FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
             JOIN nation n ON n.n_nationkey = s.s_nationkey
           GROUP BY 1)
         SELECT n_name, n_suppliers,
           CAST(round(total, 2) AS DOUBLE) AS total_revenue,
           floor(CAST(sum_sq AS DOUBLE) /
             (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS hhi,
           floor(1.0 / (CAST(sum_sq AS DOUBLE) /
             (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS equivalent_n
         FROM per ORDER BY n_name""",
    // Lag over the bounded week domain; growth is a rational of exact
    // decimals → portable floor round, NULL for the first week.
    "q_wow_growth" ->
      """WITH weekly AS (
           SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
           FROM orders GROUP BY 1),
         x AS (SELECT week, rev,
             lag(rev, 1) OVER (ORDER BY week) AS prev
           FROM weekly)
         SELECT week, CAST(round(rev, 2) AS DOUBLE) AS revenue,
           floor((CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE)) /
             CAST(prev AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS wow_growth
         FROM x ORDER BY week""",
    // Anti join of the catalog against graph nodes; 25-row rollup.
    "q_cold_start" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         nodes AS (SELECT DISTINCT pa AS node FROM pr
           UNION SELECT pb FROM pr),
         cold AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_cold
           FROM part WHERE p_partkey NOT IN (SELECT node FROM nodes)
           GROUP BY 1),
         sizes AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
           FROM part GROUP BY 1)
         SELECT sizes.p_brand, sizes.n_parts,
           CAST(coalesce(cold.n_cold, 0) AS BIGINT) AS n_cold,
           floor(CAST(coalesce(cold.n_cold, 0) AS DOUBLE) /
             CAST(sizes.n_parts AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS pct_cold
         FROM sizes LEFT JOIN cold ON cold.p_brand = sizes.p_brand
         ORDER BY sizes.p_brand""",
    "q_welch_ttest" ->
      """WITH r AS (
           SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS variant, value AS v
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         m AS (SELECT
           CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
           CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
           sum(CAST(CASE WHEN variant = 0 THEN v ELSE 0.0 END
             AS DECIMAL(28,12))) AS s_a,
           sum(CAST(CASE WHEN variant = 1 THEN v ELSE 0.0 END
             AS DECIMAL(28,12))) AS s_b,
           sum(CAST(CASE WHEN variant = 0 THEN v * v ELSE 0.0 END
             AS DECIMAL(28,12))) AS ss_a,
           sum(CAST(CASE WHEN variant = 1 THEN v * v ELSE 0.0 END
             AS DECIMAL(28,12))) AS ss_b
           FROM r),
         d AS (SELECT n_a, n_b,
           CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
           CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
           (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
             / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
           (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
             / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS var_b
           FROM m),
         s AS (SELECT *, var_a / CAST(n_a AS DOUBLE) AS se_a,
             var_b / CAST(n_b AS DOUBLE) AS se_b FROM d),
         f AS (SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
           (mean_a - mean_b) / sqrt(se_a + se_b) AS t_raw,
           (se_a + se_b) * (se_a + se_b) /
             (se_a * se_a / (CAST(n_a AS DOUBLE) - 1.0) +
              se_b * se_b / (CAST(n_b AS DOUBLE) - 1.0)) AS df_raw
           FROM s)
         SELECT n_a, n_b,
           floor(mean_a * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
           floor(mean_b * 1000000.0 + 0.5) / 1000000.0 AS mean_b,
           floor(var_a * 1000000.0 + 0.5) / 1000000.0 AS var_a,
           floor(var_b * 1000000.0 + 0.5) / 1000000.0 AS var_b,
           floor(t_raw * 1000000.0 + 0.5) / 1000000.0 AS t_stat,
           floor(df_raw * 1000000.0 + 0.5) / 1000000.0 AS df_welch
         FROM f""",
    "q_t_closeness" ->
      """WITH rows_ AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(floor(value / 50.0) AS BIGINT) AS vb, event_type
           FROM events WHERE event_type IS NOT NULL
             AND ts IS NOT NULL AND value IS NOT NULL),
         cells AS (SELECT d, vb, event_type, count(*) AS c
           FROM rows_ GROUP BY 1, 2, 3),
         grp AS (SELECT d, vb, sum(c) AS ng FROM cells GROUP BY 1, 2),
         gdist AS (SELECT event_type, sum(c) AS g FROM cells GROUP BY 1),
         tot AS (SELECT sum(c) AS n_all FROM cells),
         terms AS (SELECT cells.d, cells.vb, grp.ng,
             abs(CAST(c AS DOUBLE) / CAST(ng AS DOUBLE) -
               CAST(g AS DOUBLE) / CAST(n_all AS DOUBLE)) -
               CAST(g AS DOUBLE) / CAST(n_all AS DOUBLE) AS term
           FROM cells JOIN grp USING (d, vb)
             JOIN gdist USING (event_type) CROSS JOIN tot),
         pg AS (SELECT d, vb, CAST(max(ng) AS BIGINT) AS n,
             0.5 * (1.0 + CAST(sum(CAST(term AS DECIMAL(28,12)))
               AS DOUBLE)) AS tvd
           FROM terms GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_groups,
           floor(max(tvd) * 1000000.0 + 0.5) / 1000000.0 AS max_tvd,
           CAST(sum(CASE WHEN tvd > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_wide_groups,
           CAST(sum(CASE WHEN tvd > 0.2 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(0.2 AS DOUBLE) AS t_max
         FROM pg""",
    "q_staleness" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
         hor AS (SELECT max(d) AS horizon FROM daily)
         SELECT event_type, CAST(sum(c) AS BIGINT) AS n_rows,
           max(d) AS last_day,
           CAST(date_diff('day', max(d), max(horizon)) AS BIGINT)
             AS lag_days,
           CAST(sum(CASE WHEN d >= horizon - 6 THEN c ELSE 0 END)
             AS BIGINT) AS n_last7,
           CAST(CASE WHEN date_diff('day', max(d), max(horizon)) > 3
             THEN 1 ELSE 0 END AS INT) AS is_stale
         FROM daily CROSS JOIN hor GROUP BY 1 ORDER BY 1""",
    "q_cohen_kappa" ->
      """WITH l AS (SELECT
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
           CASE WHEN len(list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '')) >= 55 THEN 1 ELSE 0 END AS rb
           FROM documents),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n11,
           CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n00,
           CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n10,
           CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n01
           FROM l),
         p AS (SELECT *,
           (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE)
             AS po,
           ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE)) *
              (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE)) +
            (CAST(n00 AS DOUBLE) + CAST(n01 AS DOUBLE)) *
              (CAST(n00 AS DOUBLE) + CAST(n10 AS DOUBLE))) /
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
           FROM m)
         SELECT n AS n_docs, n11, n00, n10, n01,
           floor(po * 1000000.0 + 0.5) / 1000000.0 AS p_observed,
           floor(pe * 1000000.0 + 0.5) / 1000000.0 AS p_expected,
           floor((po - pe) / (1.0 - pe) * 1000000.0 + 0.5) / 1000000.0
             AS kappa
         FROM p""",
    "q_fleiss_kappa" ->
      """WITH l AS (SELECT
           (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) +
           (CASE WHEN len(list_filter(string_split_regex(lower(text),
             '\s+'), x -> x <> '')) >= 55 THEN 1 ELSE 0 END) +
           (CASE WHEN length(replace(text, ' ', '')) * 1000 >=
             length(text) * 822 THEN 1 ELSE 0 END) AS n1
           FROM documents),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n1) AS BIGINT) AS s1,
           CAST(sum(n1 * n1 + (3 - n1) * (3 - n1)) AS BIGINT) AS sq
           FROM l),
         p AS (SELECT n,
           (CAST(sq AS DOUBLE) - 3.0 * CAST(n AS DOUBLE)) /
             (6.0 * CAST(n AS DOUBLE)) AS pbar,
           CAST(s1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) AS p1
           FROM m),
         q AS (SELECT *, p1 * p1 + (1.0 - p1) * (1.0 - p1) AS pe FROM p)
         SELECT n AS n_docs, CAST(3 AS BIGINT) AS n_raters,
           floor(p1 * 1000000.0 + 0.5) / 1000000.0 AS p_positive,
           floor(pbar * 1000000.0 + 0.5) / 1000000.0 AS p_bar,
           floor(pe * 1000000.0 + 0.5) / 1000000.0 AS p_expected,
           floor((pbar - pe) / (1.0 - pe) * 1000000.0 + 0.5) / 1000000.0
             AS kappa
         FROM q""",
    "q_adamic_adar" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT pa AS a, pb AS b FROM pr
               UNION ALL SELECT pb, pa FROM pr),
         deg AS MATERIALIZED (SELECT a AS z, CAST(count(*) AS BIGINT) AS dg
           FROM e GROUP BY 1),
         w AS MATERIALIZED (SELECT e1.a AS z, e1.b AS u, e2.b AS v
           FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b),
         sc AS MATERIALIZED (SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
             sum(CAST(1.0 / ln(CAST(dg AS DOUBLE)) AS DECIMAL(28,12)))
               AS aa
           FROM w JOIN deg USING (z) GROUP BY 1, 2),
         f AS MATERIALIZED (SELECT * FROM sc WHERE NOT EXISTS
           (SELECT 1 FROM pr WHERE pr.pa = sc.u AND pr.pb = sc.v))
         SELECT u AS part_a, v AS part_b, common_neighbors,
           floor(CAST(aa AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS adamic_adar
         FROM f ORDER BY adamic_adar DESC, part_a, part_b LIMIT 20""",
    // hub-capped sibling: wedge enumeration restricted to each center's
    // 8 smallest-id neighbors; degrees (and the 1/ln discount) stay TRUE;
    // truncated-center count rides every row as n_capped_hubs
    "q_adamic_adar_capped" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT pa AS a, pb AS b FROM pr
               UNION ALL SELECT pb, pa FROM pr),
         deg AS MATERIALIZED (SELECT a AS z, CAST(count(*) AS BIGINT) AS dg
           FROM e GROUP BY 1),
         kept AS MATERIALIZED (SELECT a, b FROM
           (SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY b)
              AS rn FROM e)
           WHERE rn <= 8),
         cap AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_capped_hubs
           FROM deg WHERE dg > 8),
         w AS MATERIALIZED (SELECT k1.a AS z, k1.b AS u, k2.b AS v
           FROM kept k1 JOIN kept k2 ON k1.a = k2.a AND k1.b < k2.b),
         sc AS MATERIALIZED (SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
             sum(CAST(1.0 / ln(CAST(dg AS DOUBLE)) AS DECIMAL(28,12)))
               AS aa
           FROM w JOIN deg USING (z) GROUP BY 1, 2),
         f AS MATERIALIZED (SELECT * FROM sc WHERE NOT EXISTS
           (SELECT 1 FROM pr WHERE pr.pa = sc.u AND pr.pb = sc.v))
         SELECT u AS part_a, v AS part_b, common_neighbors,
           floor(CAST(aa AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS adamic_adar,
           n_capped_hubs
         FROM f CROSS JOIN cap
         ORDER BY adamic_adar DESC, part_a, part_b LIMIT 20""",
    "q_hits" ->
      """WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_partkey AS p
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         a1 AS MATERIALIZED (SELECT p, count(*) AS a FROM e GROUP BY 1),
         h1 AS MATERIALIZED (SELECT c, sum(a) AS h FROM e JOIN a1 USING (p)
           GROUP BY 1),
         a2 AS MATERIALIZED (SELECT p, sum(h) AS a FROM e JOIN h1 USING (c)
           GROUP BY 1),
         h2 AS MATERIALIZED (SELECT c, sum(a) AS h FROM e JOIN a2 USING (p)
           GROUP BY 1),
         a3 AS MATERIALIZED (SELECT p, sum(h) AS a FROM e JOIN h2 USING (c)
           GROUP BY 1),
         t AS MATERIALIZED (SELECT sum(a) AS at FROM a3)
         SELECT p AS part,
           floor(CAST(a AS DOUBLE) / CAST(at AS DOUBLE) * 1000000000.0
             + 0.5) / 1000000000.0 AS authority
         FROM a3 CROSS JOIN t ORDER BY authority DESC, part LIMIT 20""",
    "q_fertility" ->
      """WITH t AS (SELECT lang,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
             x -> x <> '')) AS BIGINT) AS w,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tk,
           CAST(length(text) AS BIGINT) AS ch
           FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS n_words,
           CAST(sum(tk) AS BIGINT) AS n_subwords,
           floor(CAST(sum(tk) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS fertility,
           floor(CAST(sum(ch) AS DOUBLE) / CAST(sum(tk) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS chars_per_subword
         FROM t GROUP BY 1 ORDER BY 1""",
    "q_brown_trend" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         idx AS (SELECT d, x, row_number() OVER (ORDER BY d) AS t
           FROM daily),
         t1 AS (SELECT a.d, a.t, b.x AS xj,
             CASE WHEN b.t = 1 THEN a.t - 1
                  ELSE a.t - b.t + 1 END AS k
           FROM idx a JOIN idx b ON b.t <= a.t AND a.t - b.t <= 62),
         c1 AS (SELECT d, t,
             CAST(sum(CAST(xj / CAST((1::BIGINT << k) AS DOUBLE)
               AS DECIMAL(28,10))) AS DOUBLE) AS v1
           FROM t1 GROUP BY 1, 2),
         w1 AS (SELECT idx.d, idx.x, idx.t, c1.v1
           FROM idx JOIN c1 USING (d, t)),
         t2 AS (SELECT a.d, a.t, b.v1 AS xj,
             CASE WHEN b.t = 1 THEN a.t - 1
                  ELSE a.t - b.t + 1 END AS k
           FROM w1 a JOIN w1 b ON b.t <= a.t AND a.t - b.t <= 62),
         c2 AS (SELECT d, t,
             CAST(sum(CAST(xj / CAST((1::BIGINT << k) AS DOUBLE)
               AS DECIMAL(28,10))) AS DOUBLE) AS v2
           FROM t2 GROUP BY 1, 2),
         f AS (SELECT w1.d, w1.x, w1.v1, c2.v2
           FROM w1 JOIN c2 USING (d, t))
         SELECT d, x AS daily_revenue,
           floor(v1 * 10000.0 + 0.5) / 10000.0 AS s1,
           floor(v2 * 10000.0 + 0.5) / 10000.0 AS s2,
           floor((2.0 * v1 - v2) * 10000.0 + 0.5) / 10000.0 AS level,
           floor((v1 - v2) * 10000.0 + 0.5) / 10000.0 AS trend,
           floor(((2.0 * v1 - v2) + (v1 - v2)) * 10000.0 + 0.5) / 10000.0
             AS forecast_next
         FROM f ORDER BY d""",
    "q_randomized_response" ->
      """WITH r AS (
           SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b,
             CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
               1, 15))::BIGINT % 4 = 0 THEN 1 ELSE 0 END AS f
           FROM events WHERE event_type IS NOT NULL),
         o AS (SELECT b, f, b + f - 2 * b * f AS rr FROM r),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(b) AS BIGINT) AS sb,
             CAST(sum(rr) AS BIGINT) AS sr FROM o),
         p AS (SELECT n, sb, sr,
             CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) AS p_true_r,
             CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) AS p_obs_r
           FROM m),
         q AS (SELECT *, (p_obs_r - 0.25) / 0.5 AS p_est_r FROM p)
         SELECT n, sb AS n_true_pos, sr AS n_reported_pos,
           floor(p_true_r * 1000000.0 + 0.5) / 1000000.0 AS p_true,
           floor(p_obs_r * 1000000.0 + 0.5) / 1000000.0 AS p_observed,
           floor(p_est_r * 1000000.0 + 0.5) / 1000000.0 AS p_estimated,
           floor(abs(p_est_r - p_true_r) * 1000000.0 + 0.5) / 1000000.0
             AS abs_err
         FROM q""",
    "q_dbscan_core" ->
      """WITH p AS (
           SELECT a.vec_id AS va, b.vec_id AS vb,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
               b.embedding::DOUBLE[]), 6) AS sim
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
         pr AS (SELECT va, vb FROM p WHERE sim >= 0.3),
         sym AS (SELECT va AS v, vb AS nb FROM pr
                 UNION ALL SELECT vb, va FROM pr),
         deg AS (SELECT v, count(*) AS k FROM sym GROUP BY 1),
         roles AS (SELECT e.vec_id AS v,
             coalesce(deg.k, 0) AS k,
             CASE WHEN coalesce(deg.k, 0) >= 3 THEN 1 ELSE 0 END
               AS is_core
           FROM embeddings e LEFT JOIN deg ON deg.v = e.vec_id),
         nearc AS (SELECT DISTINCT sym.v FROM sym
           JOIN roles r ON r.v = sym.nb AND r.is_core = 1),
         ce AS (SELECT count(*) AS n_core_edges FROM pr
           WHERE EXISTS (SELECT 1 FROM roles r
               WHERE r.v = pr.va AND r.is_core = 1)
             AND EXISTS (SELECT 1 FROM roles r
               WHERE r.v = pr.vb AND r.is_core = 1))
         SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(roles.is_core) AS BIGINT) AS n_core,
           CAST(sum(CASE WHEN roles.is_core = 0 AND nearc.v IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_border,
           CAST(sum(CASE WHEN roles.is_core = 0 AND nearc.v IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_noise,
           CAST(max(ce.n_core_edges) AS BIGINT) AS n_core_edges,
           CAST(3 AS BIGINT) AS min_pts
         FROM roles LEFT JOIN nearc ON nearc.v = roles.v
           CROSS JOIN ce""",
    "q_dbscan_clusters" ->
      """WITH p AS MATERIALIZED (
           SELECT a.vec_id AS va, b.vec_id AS vb,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
               b.embedding::DOUBLE[]), 6) AS sim
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
         pr AS MATERIALIZED (SELECT va, vb FROM p WHERE sim >= 0.3),
         sym AS MATERIALIZED (SELECT va AS v, vb AS nb FROM pr
                 UNION ALL SELECT vb, va FROM pr),
         deg AS MATERIALIZED (SELECT v, count(*) AS k FROM sym GROUP BY 1),
         core AS MATERIALIZED (SELECT v FROM deg WHERE k >= 3),
         ce AS MATERIALIZED (SELECT va, vb FROM pr
           WHERE va IN (SELECT v FROM core)
             AND vb IN (SELECT v FROM core)),
         cs AS MATERIALIZED (SELECT va AS v, vb AS nb FROM ce
                UNION ALL SELECT vb, va FROM ce),
         l0 AS MATERIALIZED (SELECT v, v AS lbl FROM core),
         r1 AS MATERIALIZED (SELECT l0.v, least(l0.lbl, coalesce(m.nmin, l0.lbl))
             AS lbl
           FROM l0 LEFT JOIN (SELECT cs.v, min(x.lbl) AS nmin
             FROM cs JOIN l0 x ON x.v = cs.nb GROUP BY 1) m
             ON m.v = l0.v),
         r2 AS MATERIALIZED (SELECT r1.v, least(r1.lbl, coalesce(m.nmin, r1.lbl))
             AS lbl
           FROM r1 LEFT JOIN (SELECT cs.v, min(x.lbl) AS nmin
             FROM cs JOIN r1 x ON x.v = cs.nb GROUP BY 1) m
             ON m.v = r1.v),
         r3 AS MATERIALIZED (SELECT r2.v, least(r2.lbl, coalesce(m.nmin, r2.lbl))
             AS lbl
           FROM r2 LEFT JOIN (SELECT cs.v, min(x.lbl) AS nmin
             FROM cs JOIN r2 x ON x.v = cs.nb GROUP BY 1) m
             ON m.v = r2.v),
         bl AS MATERIALIZED (SELECT sym.v, min(x.lbl) AS lbl
           FROM sym JOIN r3 x ON x.v = sym.nb
           WHERE sym.v NOT IN (SELECT v FROM core) GROUP BY 1),
         mem AS MATERIALIZED (SELECT v, lbl, 'core' AS role FROM r3
                 UNION ALL SELECT v, lbl, 'border' FROM bl)
         SELECT lbl AS cluster,
           CAST(sum(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_core,
           CAST(sum(CASE WHEN role = 'border' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_border,
           CAST(count(*) AS BIGINT) AS n_total
         FROM mem GROUP BY 1
         ORDER BY n_total DESC, cluster LIMIT 20""",
    "q_churn_baseline" ->
      """WITH rows_ AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
             coalesce(value, 0.0) AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         cut AS (SELECT max(d) - 14 AS cutoff FROM rows_),
         per AS (SELECT user_id,
             CAST(sum(CASE WHEN d <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
               AS n_events,
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
             CASE WHEN tp + fp > 0
               THEN CAST(tp AS DOUBLE) /
                 (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
               ELSE 0.0 END AS prec,
             CASE WHEN tp + fn > 0
               THEN CAST(tp AS DOUBLE) /
                 (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
               ELSE 0.0 END AS rec
           FROM m)
         SELECT n_users, tp, fp, fn, tn,
           floor(prec * 1000000.0 + 0.5) / 1000000.0 AS precision,
           floor(rec * 1000000.0 + 0.5) / 1000000.0 AS recall,
           floor(CASE WHEN prec + rec > 0.0
               THEN 2.0 * prec * rec / (prec + rec) ELSE 0.0 END
             * 1000000.0 + 0.5) / 1000000.0 AS f1,
           floor((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE)) /
             CAST(n_users AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS accuracy
         FROM s2""",
    "q_dup_by_source" ->
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
         near AS (
           SELECT DISTINCT b.doc_id AS doc_id
           FROM ch a JOIN ch b ON a.chunk_id = b.chunk_id
             AND a.chunk = b.chunk AND a.doc_id < b.doc_id
           WHERE bit_count(xor(a.simhash, b.simhash)) <= 8),
         fp AS (
           SELECT doc_id,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS f
           FROM documents),
         keep AS (SELECT f, min(doc_id) AS keeper FROM fp GROUP BY 1),
         ex AS (SELECT fp.doc_id FROM fp JOIN keep ON keep.f = fp.f
           WHERE fp.doc_id <> keep.keeper)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_exact_dup,
           CAST(sum(CASE WHEN near.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_near_dup,
           floor(CAST(sum(CASE WHEN near.doc_id IS NOT NULL THEN 1
               ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS near_dup_rate
         FROM documents d
           LEFT JOIN ex ON ex.doc_id = d.doc_id
           LEFT JOIN near ON near.doc_id = d.doc_id
         GROUP BY 1 ORDER BY 1""",
    "q_gains_curve" ->
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
         p AS (SELECT sri, CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(y) AS BIGINT) AS pos_s
           FROM s GROUP BY 1),
         cum AS (SELECT sri,
             CAST(sum(n_s) OVER (ORDER BY sri DESC) AS BIGINT) AS cum_n,
             CAST(sum(pos_s) OVER (ORDER BY sri DESC) AS BIGINT)
               AS cum_pos
           FROM p),
         tot AS (SELECT max(cum_n) AS n_total, max(cum_pos) AS pos_total
           FROM cum),
         ks AS (SELECT unnest(range(1, 11)) AS k),
         cuts AS (SELECT k, n_total, pos_total, min(cum_n) AS n_kept
           FROM ks CROSS JOIN tot JOIN cum
             ON cum.cum_n * 10 >= k * n_total
           GROUP BY 1, 2, 3),
         f AS (SELECT cuts.k, cuts.n_total, cuts.pos_total, cuts.n_kept,
             cum.cum_pos AS pos_kept
           FROM cuts JOIN cum ON cum.cum_n = cuts.n_kept)
         SELECT CAST(k AS BIGINT) AS decile, n_kept, pos_kept,
           floor(CAST(pos_kept AS DOUBLE) / CAST(pos_total AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS recall,
           floor(CAST(pos_kept AS DOUBLE) * CAST(n_total AS DOUBLE) /
             (CAST(pos_total AS DOUBLE) * CAST(n_kept AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS lift
         FROM f ORDER BY decile""",
    "q_seasonal_anomaly" ->
      """WITH pb AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST((CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) + 4)
               % 7 AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hr,
             CAST(count(*) AS BIGINT) AS c
           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
         cs AS (SELECT dow, hr, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS scc
           FROM pb GROUP BY 1, 2 HAVING count(*) >= 4),
         j AS (SELECT pb.d, pb.dow, pb.hr, pb.c,
             CAST(n_days - 1 AS DOUBLE) AS np,
             CAST(sc - c AS DOUBLE) / CAST(n_days - 1 AS DOUBLE)
               AS mean_c,
             (CAST(n_days - 1 AS DOUBLE) * (CAST(scc AS DOUBLE) -
                CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) -
              CAST(sc - c AS DOUBLE) * CAST(sc - c AS DOUBLE)) /
             (CAST(n_days - 1 AS DOUBLE) *
              (CAST(n_days - 1 AS DOUBLE) - 1.0)) AS var_c
           FROM pb JOIN cs USING (dow, hr)),
         z AS (SELECT *,
             (CAST(c AS DOUBLE) - mean_c) / sqrt(var_c) AS zv
           FROM j WHERE var_c > 0.0)
         SELECT d, dow, hr, c,
           floor(mean_c * 1000000.0 + 0.5) / 1000000.0 AS cell_mean,
           floor(zv * 1000000.0 + 0.5) / 1000000.0 AS z
         FROM z WHERE abs(zv) > 3.0 ORDER BY d, hr""",
    "q_qte" ->
      """WITH r AS (
           SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS variant, value AS v
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         q AS (SELECT
             quantile_cont(CASE WHEN variant = 0 THEN v END,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qa,
             quantile_cont(CASE WHEN variant = 1 THEN v END,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qb
           FROM r),
         u AS (SELECT unnest(range(1, 10)) AS i, qa, qb FROM q)
         SELECT CAST(i * 10 AS BIGINT) AS pct,
           floor(qa[i] * 1000000.0 + 0.5) / 1000000.0 AS q_a,
           floor(qb[i] * 1000000.0 + 0.5) / 1000000.0 AS q_b,
           floor((qb[i] - qa[i]) * 1000000.0 + 0.5) / 1000000.0 AS qte
         FROM u ORDER BY pct""",
    "q_covariate_balance" ->
      """WITH b AS (
           SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS variant, value, ts
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         long_ AS (
           SELECT variant, 'a_value' AS cname,
             CAST(coalesce(value, 0.0) AS DOUBLE) AS x FROM b
           UNION ALL SELECT variant, 'b_hour',
             CAST(hour(ts) AS DOUBLE) FROM b
           UNION ALL SELECT variant, 'c_dow',
             CAST((CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) + 4)
               % 7 AS DOUBLE) FROM b),
         m AS (SELECT cname,
             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             sum(CAST(CASE WHEN variant = 0 THEN x ELSE 0.0 END
               AS DECIMAL(28,12))) AS s_a,
             sum(CAST(CASE WHEN variant = 1 THEN x ELSE 0.0 END
               AS DECIMAL(28,12))) AS s_b,
             sum(CAST(CASE WHEN variant = 0 THEN x * x ELSE 0.0 END
               AS DECIMAL(28,12))) AS ss_a,
             sum(CAST(CASE WHEN variant = 1 THEN x * x ELSE 0.0 END
               AS DECIMAL(28,12))) AS ss_b
           FROM long_ GROUP BY 1),
         d2 AS (SELECT cname, n_a, n_b,
             CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
             CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
             (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) *
               CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)) /
               (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
             (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) *
               CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
               (CAST(n_b AS DOUBLE) - 1.0) AS var_b
           FROM m)
         SELECT cname AS covariate, n_a, n_b,
           floor(mean_a * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
           floor(mean_b * 1000000.0 + 0.5) / 1000000.0 AS mean_b,
           CASE WHEN var_a + var_b > 0.0
             THEN floor((mean_b - mean_a) / sqrt((var_a + var_b) / 2.0)
               * 1000000.0 + 0.5) / 1000000.0
             ELSE 0.0 END AS smd
         FROM d2 ORDER BY covariate""",
    "q_ess" ->
      """WITH w AS (
           SELECT source,
             least(1250 * n_chars, 1000000) AS w
           FROM documents),
         m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(w * w) AS BIGINT) AS sww
           FROM w GROUP BY 1)
         SELECT source, n_docs,
           floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) /
             CAST(sww AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS ess,
           floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) /
             CAST(sww AS DOUBLE) / CAST(n_docs AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS ess_ratio
         FROM m ORDER BY source""",
    "q_temporal_leakage" ->
      """WITH rows_ AS (
           SELECT user_id, CAST(ts AS DATE) AS d
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         cut AS (SELECT max(d) - 14 AS cutoff FROM rows_),
         per AS (SELECT user_id,
             CAST(sum(CASE WHEN d <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pre,
             CAST(sum(CASE WHEN d > cutoff THEN 1 ELSE 0 END) AS BIGINT)
               AS n_post
           FROM rows_ CROSS JOIN cut GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN n_pre > 0 AND n_post = 0 THEN 1 ELSE 0
             END) AS BIGINT) AS n_train_only,
           CAST(sum(CASE WHEN n_pre = 0 AND n_post > 0 THEN 1 ELSE 0
             END) AS BIGINT) AS n_test_only,
           CAST(sum(CASE WHEN n_pre > 0 AND n_post > 0 THEN 1 ELSE 0
             END) AS BIGINT) AS n_spanning,
           CAST(sum(n_post) AS BIGINT) AS n_test_events,
           floor(CAST(sum(CASE WHEN n_pre > 0 THEN n_post ELSE 0 END)
               AS DOUBLE) / CAST(sum(n_post) AS DOUBLE) * 1000000.0
             + 0.5) / 1000000.0 AS seen_share
         FROM per""",
    "q_delta_method" ->
      """WITH per AS (
           SELECT user_id,
             CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,6)))
               AS DOUBLE) AS x,
             CAST(count(*) AS DOUBLE) AS y
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(y * y AS DECIMAL(28,10))) AS DOUBLE) AS syy
           FROM per),
         d2 AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, sxx, sxy, syy,
             sx / CAST(n AS DOUBLE) AS mx, sy / CAST(n AS DOUBLE) AS my,
             sx / sy AS r, CAST(1.96 AS DOUBLE) AS z
           FROM m),
         d3 AS (SELECT *,
             (sxx - sx * sx / nd) / (nd - 1.0) AS vxx,
             (sxy - sx * sy / nd) / (nd - 1.0) AS vxy,
             (syy - sy * sy / nd) / (nd - 1.0) AS vyy
           FROM d2),
         d4 AS (SELECT *,
             sqrt((vxx - 2.0 * r * vxy + r * r * vyy) / (nd * my * my))
               AS se
           FROM d3)
         SELECT n AS n_users,
           floor(mx * 1000000.0 + 0.5) / 1000000.0 AS mean_x,
           floor(my * 1000000.0 + 0.5) / 1000000.0 AS mean_y,
           floor(r * 1000000.0 + 0.5) / 1000000.0 AS ratio,
           floor(se * 1000000.0 + 0.5) / 1000000.0 AS se_delta,
           floor((r - z * se) * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
           floor((r + z * se) * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
         FROM d4""",
    "q_analyze_stats" ->
      """WITH long_ AS (
           SELECT 'o_custkey' AS cname, CAST(o_custkey AS VARCHAR) AS v
             FROM orders
           UNION ALL SELECT 'o_orderpriority', o_orderpriority
             FROM orders
           UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
           UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR)
             FROM orders),
         census AS (SELECT cname, v, count(*) AS cnt FROM long_
           WHERE v IS NOT NULL GROUP BY 1, 2),
         mcv AS (SELECT cname, v AS mcv_value,
             CAST(cnt AS BIGINT) AS mcv_count
           FROM (SELECT *, row_number() OVER (PARTITION BY cname
             ORDER BY cnt DESC, v) AS rn FROM census) WHERE rn = 1),
         base AS (
           SELECT 'o_custkey' AS cname,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv,
             CAST(min(o_custkey) AS VARCHAR) AS min_v,
             CAST(max(o_custkey) AS VARCHAR) AS max_v
           FROM orders
           UNION ALL
           SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0
               END) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             min(o_orderpriority), max(o_orderpriority)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT),
             min(o_orderstatus), max(o_orderstatus)
           FROM orders
           UNION ALL
           SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(count(DISTINCT o_totalprice) AS BIGINT),
             CAST(min(o_totalprice) AS VARCHAR),
             CAST(max(o_totalprice) AS VARCHAR)
           FROM orders)
         SELECT base.cname, n_rows, n_null, ndv, min_v, max_v,
           mcv.mcv_value, mcv.mcv_count
         FROM base JOIN mcv ON mcv.cname = base.cname
         ORDER BY base.cname""",
    "q_cmh" ->
      """WITH units AS (
           SELECT CAST(ts AS DATE) AS d,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS variant,
             user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2, 3),
         strata AS (SELECT d,
             CAST(sum(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0
               END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS r1,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS r2,
             CAST(sum(conv) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n
           FROM units GROUP BY 1 HAVING count(*) > 1),
         terms AS (SELECT a,
             CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)
               AS e,
             CAST(r1 AS DOUBLE) * CAST(r2 AS DOUBLE) *
               CAST(c1 AS DOUBLE) *
               (CAST(n AS DOUBLE) - CAST(c1 AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
                (CAST(n AS DOUBLE) - 1.0)) AS v
           FROM strata),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(a) AS BIGINT) AS sum_a,
             sum(CAST(e AS DECIMAL(28,12))) AS se,
             sum(CAST(v AS DECIMAL(28,12))) AS sv
           FROM terms)
         SELECT n_strata, sum_a,
           floor(CAST(se AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS sum_expected,
           floor((CAST(sum_a AS DOUBLE) - CAST(se AS DOUBLE)) *
             (CAST(sum_a AS DOUBLE) - CAST(se AS DOUBLE)) /
             CAST(sv AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS cmh_stat
         FROM m""",
    "q_did" ->
      """WITH rows_ AS (
           SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 2 AS variant,
             CAST(ts AS DATE) AS d, value AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL),
         span AS (SELECT min(d) +
             CAST(floor(date_diff('day', min(d), max(d)) / 2) AS INT)
               AS mid
           FROM rows_),
         p AS (SELECT variant, v,
             CASE WHEN d > mid THEN 1 ELSE 0 END AS post
           FROM rows_ CROSS JOIN span),
         agg AS (SELECT
           sum(CAST(CASE WHEN variant = 0 AND post = 0 THEN v ELSE 0.0
             END AS DECIMAL(28,12))) AS s00,
           CAST(sum(CASE WHEN variant = 0 AND post = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n00,
           sum(CAST(CASE WHEN variant = 0 AND post = 1 THEN v ELSE 0.0
             END AS DECIMAL(28,12))) AS s01,
           CAST(sum(CASE WHEN variant = 0 AND post = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n01,
           sum(CAST(CASE WHEN variant = 1 AND post = 0 THEN v ELSE 0.0
             END AS DECIMAL(28,12))) AS s10,
           CAST(sum(CASE WHEN variant = 1 AND post = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n10,
           sum(CAST(CASE WHEN variant = 1 AND post = 1 THEN v ELSE 0.0
             END AS DECIMAL(28,12))) AS s11,
           CAST(sum(CASE WHEN variant = 1 AND post = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n11
           FROM p),
         d2 AS (SELECT *,
             CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) AS m00,
             CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) AS m01,
             CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) AS m10,
             CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) AS m11
           FROM agg)
         SELECT n00, n01, n10, n11,
           floor(m00 * 1000000.0 + 0.5) / 1000000.0 AS ctrl_pre,
           floor(m01 * 1000000.0 + 0.5) / 1000000.0 AS ctrl_post,
           floor(m10 * 1000000.0 + 0.5) / 1000000.0 AS treat_pre,
           floor(m11 * 1000000.0 + 0.5) / 1000000.0 AS treat_post,
           floor(((m11 - m10) - (m01 - m00)) * 1000000.0 + 0.5)
             / 1000000.0 AS did
         FROM d2""",
    "q_funnel_ci" ->
      """WITH m AS (SELECT
           CAST(count(DISTINCT CASE WHEN event_type = 'signup'
             THEN user_id END) AS BIGINT) AS n_signup,
           CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
             THEN user_id END) AS BIGINT) AS n_purchase
           FROM events WHERE user_id IS NOT NULL),
         s AS (SELECT n_signup, n_purchase,
             CAST(n_signup AS DOUBLE) AS n,
             CAST(n_purchase AS DOUBLE) / CAST(n_signup AS DOUBLE) AS p
           FROM m),
         z_ AS (SELECT *, CAST(1.96 AS DOUBLE) AS z FROM s),
         w AS (SELECT *,
             (p + z * z / (2.0 * n)) / (1.0 + z * z / n) AS center,
             z * sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)) /
               (1.0 + z * z / n) AS half
           FROM z_)
         SELECT n_signup, n_purchase,
           floor(p * 1000000.0 + 0.5) / 1000000.0 AS rate,
           floor((center - half) * 1000000.0 + 0.5) / 1000000.0
             AS wilson_lo,
           floor((center + half) * 1000000.0 + 0.5) / 1000000.0
             AS wilson_hi
         FROM w""",
    "q_lsh_tuning" -> {
      val arms = Seq(4, 8, 12).map { nb =>
        s"""bk$nb AS (
           SELECT e.vec_id, e.embedding,
             CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65),
                    i -> e.embedding[i]::DOUBLE * pl.p[i])) >= 0
                  THEN (1::BIGINT << pl.b) ELSE 0 END) AS BIGINT)
               AS bucket
           FROM embeddings e CROSS JOIN planes pl WHERE pl.b < $nb
           GROUP BY e.vec_id, e.embedding),
         m$nb AS (SELECT CAST($nb AS BIGINT) AS n_bits,
             CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN sim >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_found
           FROM (SELECT round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
             FROM bk$nb a JOIN bk$nb b
               ON a.bucket = b.bucket AND a.vec_id < b.vec_id))"""
      }.mkString(",\n")
      s"""${lshPlanesCte(12)},
         ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs FROM (
           SELECT 1 AS one FROM embeddings a JOIN embeddings b
             ON a.vec_id < b.vec_id
           WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
             b.embedding::DOUBLE[]), 6) >= 0.3)),
         $arms,
         u AS (SELECT * FROM m4 UNION ALL SELECT * FROM m8
               UNION ALL SELECT * FROM m12)
         SELECT n_bits, n_exact_pairs, n_candidates, n_found,
           floor(CAST(n_found AS DOUBLE) / CAST(n_exact_pairs AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS recall
         FROM u CROSS JOIN ex ORDER BY n_bits"""
    },
    "q_media_neardup" ->
      """WITH grams AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(length(text) - 3, 1) + 1),
             i -> substr(text, CAST(i AS INT), 4))) AS gs
           FROM documents),
         th AS (
           SELECT doc_id, list_transform(gs, t ->
             ('0x'||substr(md5(t),1,15))::BIGINT) AS hs
           FROM grams),
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
           SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
           FROM ch a JOIN ch b ON a.chunk_id = b.chunk_id
             AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         SELECT doc_id_a, doc_id_b, hamming FROM cand
         WHERE hamming <= 8 ORDER BY doc_id_a, doc_id_b""",
    "q_media_phash" ->
      s"""$phashCte
         SELECT doc_id, phash FROM ph2 ORDER BY doc_id""",
    "q_media_phash_neardup" ->
      s"""$phashCte,
         ch AS (
           SELECT p2.doc_id, p2.phash, c.chunk_id,
             (p2.phash >> (c.chunk_id * 16)) & 65535 AS chunk
           FROM ph2 p2 CROSS JOIN
             (SELECT unnest(range(0, 4)) AS chunk_id) c),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
           FROM ch a JOIN ch b ON a.chunk_id = b.chunk_id
             AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         SELECT doc_id_a, doc_id_b, hamming FROM cand
         WHERE hamming <= 12 ORDER BY doc_id_a, doc_id_b""",
    "q_pgm_phash" ->
      s"""$pgmPhashCte
         SELECT doc_id, phash FROM ph2 ORDER BY doc_id""",
    "q_pgm_neardup" ->
      s"""$pgmPhashCte,
         ch AS (
           SELECT p2.doc_id, p2.phash, c.chunk_id,
             (p2.phash >> (c.chunk_id * 16)) & 65535 AS chunk
           FROM ph2 p2 CROSS JOIN
             (SELECT unnest(range(0, 4)) AS chunk_id) c),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
           FROM ch a JOIN ch b ON a.chunk_id = b.chunk_id
             AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         SELECT doc_id_a, doc_id_b, hamming,
           CAST(CASE WHEN doc_id_a // 2 = doc_id_b // 2 THEN 1 ELSE 0
             END AS INT) AS is_true_pair
         FROM cand WHERE hamming <= 12 ORDER BY doc_id_a, doc_id_b""",
    "q_pgm_simhash" ->
      s"""$pgmGradSimhashCte
         SELECT doc_id, simhash FROM sim ORDER BY doc_id""",
    // multi-probe blocking: each side emits the 10-bit chunk plus its 10
    // single-bit-flip variants (balanced 1-probe MIH) — collide iff some
    // chunk differs by <= 2 bits, guaranteed for total Hamming <= 17
    "q_pgm_simhash_neardup" ->
      s"""$pgmGradSimhashCte,
         ch AS (
           SELECT s.doc_id, s.simhash, c.chunk_id,
             (s.simhash >> (c.chunk_id * 10)) & 1023 AS chunk
           FROM sim s CROSS JOIN
             (SELECT unnest(range(0, 6)) AS chunk_id) c),
         pv AS MATERIALIZED (
           SELECT doc_id, simhash, chunk_id,
             CASE WHEN v.b = -1 THEN chunk
                  ELSE xor(chunk, (1::BIGINT << v.b)) END AS probe
           FROM ch CROSS JOIN
             (SELECT unnest(range(-1, 10)) AS b) v),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
           FROM pv a JOIN pv b ON a.chunk_id = b.chunk_id
             AND a.probe = b.probe AND a.doc_id < b.doc_id)
         SELECT doc_id_a, doc_id_b, hamming,
           CAST(CASE WHEN doc_id_a // 2 = doc_id_b // 2 THEN 1 ELSE 0
             END AS INT) AS is_true_pair
         FROM cand WHERE hamming <= 20 ORDER BY doc_id_a, doc_id_b""",
    "q_srm" ->
      """WITH m AS (SELECT
           CAST(sum(CASE WHEN ('0x' ||
             substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
             = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN ('0x' ||
             substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
             = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
           FROM events WHERE user_id IS NOT NULL),
         s AS (SELECT n_a, n_b,
             (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0 AS e,
             CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n
           FROM m),
         c AS (SELECT *,
             (CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e +
             (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e
               AS chi2
           FROM s)
         SELECT n_a, n_b,
           floor(CAST(n_a AS DOUBLE) / n * 1000000.0 + 0.5) / 1000000.0
             AS ratio_a,
           floor(chi2 * 1000000.0 + 0.5) / 1000000.0 AS chi2,
           CAST(CASE WHEN chi2 > 10.83 THEN 1 ELSE 0 END AS INT)
             AS srm_flag
         FROM c""",
    "q_training_set" ->
      """WITH rows_ AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
             coalesce(value, 0.0) AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         cut AS (SELECT max(d) - 14 AS cutoff FROM rows_)
         SELECT user_id,
           CAST(sum(CASE WHEN d <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
             AS n_events,
           CAST(round(sum(CAST(CASE WHEN d <= cutoff THEN v ELSE 0.0 END
             AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
           CAST(count(DISTINCT CASE WHEN d <= cutoff THEN d END)
             AS BIGINT) AS days_active,
           CAST(date_diff('day', max(CASE WHEN d <= cutoff THEN d END),
             max(cutoff)) AS BIGINT) AS recency_days,
           CAST(max(CASE WHEN d > cutoff THEN 1 ELSE 0 END) AS INT)
             AS label_active
         FROM rows_ CROSS JOIN cut
         GROUP BY 1
         HAVING sum(CASE WHEN d <= cutoff THEN 1 ELSE 0 END) > 0
         ORDER BY 1""",
    "q_rec_coverage" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         freq AS (SELECT l_partkey AS item,
             CAST(count(*) AS BIGINT) AS n_item FROM op GROUP BY 1),
         sym AS (SELECT part_a AS item, part_b AS other, n_orders FROM pr
           UNION ALL SELECT part_b, part_a, n_orders FROM pr),
         sc AS (SELECT s.item, s.other,
             s.n_orders / sqrt(CAST(fa.n_item * fb.n_item AS DOUBLE))
               AS sim
           FROM sym s JOIN freq fa ON fa.item = s.item
             JOIN freq fb ON fb.item = s.other),
         r AS (SELECT *, row_number() OVER (PARTITION BY item
             ORDER BY sim DESC, other) AS rnk FROM sc),
         recs AS (SELECT item, other FROM r WHERE rnk <= 5),
         counts AS (SELECT other, count(*) AS c FROM recs GROUP BY 1),
         head AS (SELECT CAST(sum(c) AS BIGINT) AS head_c FROM
           (SELECT c, other FROM counts ORDER BY c DESC, other LIMIT 20)),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_recommended,
             CAST(sum(c) AS BIGINT) AS total_slots FROM counts),
         cat AS (SELECT CAST(count(*) AS BIGINT) AS catalog_size
           FROM part),
         src AS (SELECT CAST(count(DISTINCT item) AS BIGINT)
             AS n_items_with_recs FROM recs)
         SELECT catalog_size, n_items_with_recs, n_recommended,
           total_slots,
           floor(CAST(n_recommended AS DOUBLE) /
             CAST(catalog_size AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS coverage,
           floor(CAST(head_c AS DOUBLE) / CAST(total_slots AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS head20_share
         FROM tot CROSS JOIN cat CROSS JOIN head CROSS JOIN src""",
    "q_forecast_eval" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS x
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         idx AS (SELECT d, x, row_number() OVER (ORDER BY d) AS t
           FROM daily),
         t1 AS (SELECT a.d, a.t, b.x AS xj,
             CASE WHEN b.t = 1 THEN a.t - 1
                  ELSE a.t - b.t + 1 END AS k
           FROM idx a JOIN idx b ON b.t <= a.t AND a.t - b.t <= 62),
         c1 AS (SELECT d, t,
             CAST(sum(CAST(xj / CAST((1::BIGINT << k) AS DOUBLE)
               AS DECIMAL(28,10))) AS DOUBLE) AS s1
           FROM t1 GROUP BY 1, 2),
         base AS (SELECT idx.d, idx.x, idx.t, c1.s1,
             lag(idx.x) OVER (ORDER BY idx.t) AS naive_fc,
             lag(c1.s1) OVER (ORDER BY idx.t) AS ewma_fc
           FROM idx JOIN c1 USING (d, t)),
         b2 AS (SELECT * FROM base WHERE t >= 2),
         m AS (
           SELECT 'naive' AS model, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(abs(x - naive_fc) AS DECIMAL(28,10)))
               AS DOUBLE) AS sae,
             CAST(sum(CAST((x - naive_fc) * (x - naive_fc)
               AS DECIMAL(28,10))) AS DOUBLE) AS sse,
             CAST(sum(CAST(abs(x - naive_fc) / x AS DECIMAL(28,12)))
               AS DOUBLE) AS sape
           FROM b2
           UNION ALL
           SELECT 'ewma', CAST(count(*) AS BIGINT),
             CAST(sum(CAST(abs(x - ewma_fc) AS DECIMAL(28,10)))
               AS DOUBLE),
             CAST(sum(CAST((x - ewma_fc) * (x - ewma_fc)
               AS DECIMAL(28,10))) AS DOUBLE),
             CAST(sum(CAST(abs(x - ewma_fc) / x AS DECIMAL(28,12)))
               AS DOUBLE)
           FROM b2)
         SELECT model, n_days,
           floor(sae / CAST(n_days AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mae,
           floor(sqrt(sse / CAST(n_days AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS rmse,
           floor(sape / CAST(n_days AS DOUBLE) * 100.0 * 1000000.0 + 0.5)
             / 1000000.0 AS mape_pct
         FROM m ORDER BY model""",
    "q_map" ->
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
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM s),
         h AS (
           SELECT query_id, q_label, rnk,
             CASE WHEN q_label = n_label THEN 1 ELSE 0 END AS rel,
             CAST(sum(CASE WHEN q_label = n_label THEN 1 ELSE 0 END)
               OVER (PARTITION BY query_id ORDER BY rnk) AS BIGINT)
               AS hits_upto
           FROM r WHERE rnk <= 10),
         pq AS (
           SELECT query_id, any_value(q_label) AS q_label,
             sum(CAST(CASE WHEN rel = 1
               THEN CAST(hits_upto AS DOUBLE) / CAST(rnk AS DOUBLE)
               ELSE 0.0 END AS DECIMAL(28,12))) AS ap_num,
             CAST(sum(rel) AS BIGINT) AS n_hits
           FROM h GROUP BY 1),
         lc AS (SELECT label, count(*) AS n_lab FROM embeddings
           GROUP BY 1),
         ap AS (SELECT pq.*, least(lc.n_lab - 1, 10) AS denom
           FROM pq JOIN lc ON lc.label = pq.q_label)
         SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_hit,
           floor(CAST(sum(CAST(CASE WHEN denom > 0
               THEN CAST(ap_num AS DOUBLE) / CAST(denom AS DOUBLE)
               ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS map
         FROM ap""",
    "q_mann_whitney" ->
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
         ranked AS (
           SELECT *, ca + cb AS t,
             CAST(coalesce(sum(ca + cb) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS below
           FROM census),
         m AS (
           SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b,
             sum(CAST(CAST(ca AS DOUBLE) * (CAST(below AS DOUBLE) +
               (CAST(t AS DOUBLE) + 1.0) / 2.0) AS DECIMAL(28,12)))
               AS ra,
             CAST(sum(t * t * t - t) AS BIGINT) AS tsum
           FROM ranked),
         s2 AS (
           SELECT n_a, n_b,
             CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
             CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
             CAST(ra AS DOUBLE) -
               CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0
               AS ua,
             CAST(tsum AS DOUBLE) AS ts FROM m),
         s3 AS (
           SELECT *, na * nb / 2.0 AS mu,
             sqrt(na * nb / 12.0 * ((n + 1.0) - ts / (n * (n - 1.0))))
               AS sigma
           FROM s2)
         SELECT n_a, n_b,
           floor(ua * 1000000.0 + 0.5) / 1000000.0 AS u_a,
           floor((na * nb - ua) * 1000000.0 + 0.5) / 1000000.0 AS u_b,
           floor(mu * 1000000.0 + 0.5) / 1000000.0 AS mu_u,
           floor(sigma * 1000000.0 + 0.5) / 1000000.0 AS sigma_u,
           floor(CASE WHEN sigma > 0.0 THEN (ua - mu) / sigma
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0 AS z
         FROM s3""",
    "q_spearman" ->
      """WITH nord AS (
           SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         nparts AS (
           SELECT o.o_custkey AS cust,
             CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS y
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY 1),
         pc AS (SELECT nord.cust, x, y FROM nord
           JOIN nparts ON nord.cust = nparts.cust),
         cx AS (SELECT x, CAST(count(*) AS BIGINT) AS t FROM pc
           GROUP BY 1),
         rx AS (SELECT x,
             CAST(coalesce(sum(t) OVER (ORDER BY x ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) +
               (CAST(t AS DOUBLE) + 1.0) / 2.0 AS r_x
           FROM cx),
         cy AS (SELECT y, CAST(count(*) AS BIGINT) AS t FROM pc
           GROUP BY 1),
         ry AS (SELECT y,
             CAST(coalesce(sum(t) OVER (ORDER BY y ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) +
               (CAST(t AS DOUBLE) + 1.0) / 2.0 AS r_y
           FROM cy),
         ranked AS (SELECT pc.x, pc.y, rx.r_x, ry.r_y FROM pc
           JOIN rx ON pc.x = rx.x JOIN ry ON pc.y = ry.y),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(r_x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
             CAST(sum(CAST(r_y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(r_x * r_x AS DECIMAL(28,12))) AS DOUBLE)
               AS sxx,
             CAST(sum(CAST(r_y * r_y AS DECIMAL(28,12))) AS DOUBLE)
               AS syy,
             CAST(sum(CAST(r_x * r_y AS DECIMAL(28,12))) AS DOUBLE)
               AS sxy,
             CAST(sum(x) AS DOUBLE) AS rsx, CAST(sum(y) AS DOUBLE)
               AS rsy,
             CAST(sum(x * x) AS DOUBLE) AS rsxx,
             CAST(sum(y * y) AS DOUBLE) AS rsyy,
             CAST(sum(x * y) AS DOUBLE) AS rsxy
           FROM ranked)
         SELECT n AS n_customers,
           floor((CAST(n AS DOUBLE) * sxy - sx * sy) /
             sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) *
               (CAST(n AS DOUBLE) * syy - sy * sy))
             * 1000000.0 + 0.5) / 1000000.0 AS rho_spearman,
           floor((CAST(n AS DOUBLE) * rsxy - rsx * rsy) /
             sqrt((CAST(n AS DOUBLE) * rsxx - rsx * rsx) *
               (CAST(n AS DOUBLE) * rsyy - rsy * rsy))
             * 1000000.0 + 0.5) / 1000000.0 AS r_pearson
         FROM m""",
    "q_theil" ->
      """WITH spend AS (
           SELECT o.o_custkey, c.c_mktsegment AS segment,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,12))) AS DOUBLE)
               AS s
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2),
         seg AS (
           SELECT segment, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(s AS DECIMAL(28,12))) AS sx,
             sum(CAST(s * ln(s) AS DECIMAL(28,12))) AS sxlnx
           FROM spend GROUP BY 1),
         gl AS (
           SELECT CAST(sum(n) AS BIGINT) AS n_all, sum(sx) AS x_all,
             sum(sxlnx) AS xlnx_all
           FROM seg),
         within AS (
           SELECT 'within' AS component, segment, n AS n_customers,
             floor(CAST(sx AS DOUBLE) / CAST(x_all AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0 AS spend_share,
             floor((CAST(sxlnx AS DOUBLE) / CAST(sx AS DOUBLE) -
               ln(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
               * 1000000.0 + 0.5) / 1000000.0 AS theil
           FROM seg CROSS JOIN gl),
         betw AS (
           SELECT 'between' AS component, '__ALL__' AS segment,
             CAST(sum(n) AS BIGINT) AS n_customers, 1.0 AS spend_share,
             floor(CAST(sum(CAST(
               CAST(sx AS DOUBLE) / CAST(x_all AS DOUBLE) *
               ln((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
                 (CAST(x_all AS DOUBLE) / CAST(n_all AS DOUBLE)))
               AS DECIMAL(28,12))) AS DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0 AS theil
           FROM seg CROSS JOIN gl),
         tot AS (
           SELECT 'total' AS component, '__ALL__' AS segment,
             n_all AS n_customers, 1.0 AS spend_share,
             floor((CAST(xlnx_all AS DOUBLE) / CAST(x_all AS DOUBLE) -
               ln(CAST(x_all AS DOUBLE) / CAST(n_all AS DOUBLE)))
               * 1000000.0 + 0.5) / 1000000.0 AS theil
           FROM gl)
         SELECT * FROM within UNION ALL
         SELECT * FROM betw UNION ALL SELECT * FROM tot
         ORDER BY 1, 2""",
    "q_runs_test" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS v
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1),
         med AS (SELECT quantile_cont(v, 0.5) AS med FROM daily),
         signed AS (
           SELECT d, CASE WHEN v > med THEN 1 ELSE 0 END AS s
           FROM daily CROSS JOIN med WHERE v <> med),
         runs AS (
           SELECT s, CASE WHEN lag(s, 1) OVER (ORDER BY d) IS NULL
               OR lag(s, 1) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END
               AS brk
           FROM signed),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(s) AS BIGINT) AS n_above,
             CAST(sum(1 - s) AS BIGINT) AS n_below,
             CAST(sum(brk) AS BIGINT) AS n_runs
           FROM runs),
         s2 AS (
           SELECT *, CAST(n_above AS DOUBLE) AS n1,
             CAST(n_below AS DOUBLE) AS n2,
             CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE) AS n
           FROM m),
         s3 AS (
           SELECT *, 2.0 * n1 * n2 / n + 1.0 AS mu,
             sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) /
               (n * n * (n - 1.0))) AS sigma
           FROM s2)
         SELECT n_days, n_above, n_below, n_runs,
           floor(mu * 1000000.0 + 0.5) / 1000000.0 AS mu_runs,
           floor(sigma * 1000000.0 + 0.5) / 1000000.0 AS sigma_runs,
           floor(CASE WHEN sigma > 0.0
             THEN (CAST(n_runs AS DOUBLE) - mu) / sigma ELSE 0.0 END
             * 1000000.0 + 0.5) / 1000000.0 AS z
         FROM s3""",
    "q_cramers_v" ->
      """WITH cells AS (
           SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
             CAST(count(*) AS BIGINT) AS o
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
           FROM cells GROUP BY 1),
         ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells
           GROUP BY 1),
         gl AS (
           SELECT CAST(sum(o) AS BIGINT) AS n_all,
             CAST(count(DISTINCT event_type) AS BIGINT) AS k,
             CAST(count(DISTINCT dow) AS BIGINT) AS r
           FROM cells),
         terms AS (
           SELECT CAST(
               (CAST(o AS DOUBLE) - CAST(rt.rt AS DOUBLE) *
                 CAST(ct.ct AS DOUBLE) / CAST(n_all AS DOUBLE))
               * (CAST(o AS DOUBLE) - CAST(rt.rt AS DOUBLE) *
                 CAST(ct.ct AS DOUBLE) / CAST(n_all AS DOUBLE))
               / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) /
                 CAST(n_all AS DOUBLE)) AS DECIMAL(28,12)) AS term,
             CAST(CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) /
               CAST(n_all AS DOUBLE) AS DECIMAL(28,12)) AS e,
             n_all, k, r
           FROM cells JOIN rt ON cells.event_type = rt.event_type
             JOIN ct ON cells.dow = ct.dow CROSS JOIN gl),
         m AS (
           SELECT n_all, k, r, CAST(sum(term) AS DOUBLE) +
               (CAST(n_all AS DOUBLE) - CAST(sum(e) AS DOUBLE)) AS chi2
           FROM terms GROUP BY 1, 2, 3)
         SELECT n_all AS n, k AS n_types, r AS n_dows,
           floor(chi2 * 1000000.0 + 0.5) / 1000000.0 AS chi2,
           floor(sqrt(chi2 / (CAST(n_all AS DOUBLE) *
             least(CAST(k AS DOUBLE) - 1.0, CAST(r AS DOUBLE) - 1.0)))
             * 1000000.0 + 0.5) / 1000000.0 AS cramers_v
         FROM m""",
    "q_fk_discovery" -> inclOracle,
    "q_fd_discovery" -> fdOracle,
    "q_ohlc" ->
      """WITH rows_ AS (
           SELECT CAST(ts AS DATE) AS d, ts, event_id, value
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL),
         pt AS (
           SELECT d, ts, arg_min(value, event_id) AS ov,
             arg_max(value, event_id) AS cv,
             min(value) AS mn, max(value) AS mx,
             CAST(count(*) AS BIGINT) AS cnt,
             sum(CAST(value AS DECIMAL(28,12))) AS sv
           FROM rows_ GROUP BY 1, 2),
         day_ AS (
           SELECT d, arg_min(ov, ts) AS open, arg_max(cv, ts) AS close,
             min(mn) AS low, max(mx) AS high,
             CAST(sum(cnt) AS BIGINT) AS n_trades, sum(sv) AS svd
           FROM pt GROUP BY 1)
         SELECT d, open, high, low, close, n_trades,
           CAST(round(svd, 2) AS DOUBLE) AS total,
           floor(CAST(svd AS DOUBLE) / CAST(n_trades AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS vwap
         FROM day_ ORDER BY d""",
    "q_link_jaccard" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT pa AS a, pb AS b FROM pr
               UNION ALL SELECT pb, pa FROM pr),
         deg AS MATERIALIZED (SELECT a AS z, CAST(count(*) AS BIGINT) AS dg
           FROM e GROUP BY 1),
         w AS MATERIALIZED (SELECT e1.a AS z, e1.b AS u, e2.b AS v
           FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b),
         sc AS MATERIALIZED (SELECT u, v, CAST(count(*) AS BIGINT)
             AS common_neighbors
           FROM w GROUP BY 1, 2),
         j AS MATERIALIZED (SELECT sc.u, sc.v, sc.common_neighbors,
             du.dg AS deg_u, dv.dg AS deg_v
           FROM sc JOIN deg du ON du.z = sc.u
             JOIN deg dv ON dv.z = sc.v),
         f AS MATERIALIZED (SELECT * FROM j WHERE NOT EXISTS
           (SELECT 1 FROM pr WHERE pr.pa = j.u AND pr.pb = j.v))
         SELECT u AS part_a, v AS part_b, common_neighbors, deg_u, deg_v,
           floor(CAST(common_neighbors AS DOUBLE) /
             CAST(deg_u + deg_v - common_neighbors AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         FROM f ORDER BY jaccard DESC, part_a, part_b LIMIT 20""",
    // hub-capped sibling of q_link_jaccard: capped enumeration, true
    // degrees in the denominator (conservative on truncated hubs)
    "q_link_jaccard_capped" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT pa AS a, pb AS b FROM pr
               UNION ALL SELECT pb, pa FROM pr),
         deg AS MATERIALIZED (SELECT a AS z, CAST(count(*) AS BIGINT) AS dg
           FROM e GROUP BY 1),
         kept AS MATERIALIZED (SELECT a, b FROM
           (SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY b)
              AS rn FROM e)
           WHERE rn <= 8),
         cap AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_capped_hubs
           FROM deg WHERE dg > 8),
         w AS MATERIALIZED (SELECT k1.a AS z, k1.b AS u, k2.b AS v
           FROM kept k1 JOIN kept k2 ON k1.a = k2.a AND k1.b < k2.b),
         sc AS MATERIALIZED (SELECT u, v, CAST(count(*) AS BIGINT)
             AS common_neighbors
           FROM w GROUP BY 1, 2),
         j AS MATERIALIZED (SELECT sc.u, sc.v, sc.common_neighbors,
             du.dg AS deg_u, dv.dg AS deg_v
           FROM sc JOIN deg du ON du.z = sc.u
             JOIN deg dv ON dv.z = sc.v),
         f AS MATERIALIZED (SELECT * FROM j WHERE NOT EXISTS
           (SELECT 1 FROM pr WHERE pr.pa = j.u AND pr.pb = j.v))
         SELECT u AS part_a, v AS part_b, common_neighbors, deg_u, deg_v,
           floor(CAST(common_neighbors AS DOUBLE) /
             CAST(deg_u + deg_v - common_neighbors AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard,
           n_capped_hubs
         FROM f CROSS JOIN cap
         ORDER BY jaccard DESC, part_a, part_b LIMIT 20""",
    "q_rec_novelty" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
         freq AS (SELECT l_partkey AS item,
             CAST(count(*) AS BIGINT) AS n_item FROM op GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS t_rows FROM op),
         sym AS (SELECT part_a AS item, part_b AS other, n_orders FROM pr
           UNION ALL SELECT part_b, part_a, n_orders FROM pr),
         sc AS (SELECT s.item, s.other,
             s.n_orders / sqrt(CAST(fa.n_item * fb.n_item AS DOUBLE))
               AS sim
           FROM sym s JOIN freq fa ON fa.item = s.item
             JOIN freq fb ON fb.item = s.other),
         r AS (SELECT *, row_number() OVER (PARTITION BY item
             ORDER BY sim DESC, other) AS rnk FROM sc),
         recs AS (SELECT item, other FROM r WHERE rnk <= 5),
         ri AS (
           SELECT CAST(count(*) AS BIGINT) AS n_slots,
             CAST(sum(CAST(ln(CAST(t_rows AS DOUBLE) /
               CAST(f.n_item AS DOUBLE)) / ln(2.0)
               AS DECIMAL(28,12))) AS DOUBLE) AS si
           FROM recs JOIN freq f ON f.item = recs.other CROSS JOIN tot),
         ent AS (
           SELECT CAST(sum(CAST(
               (CAST(n_item AS DOUBLE) / CAST(t_rows AS DOUBLE)) *
               (ln(CAST(t_rows AS DOUBLE) / CAST(n_item AS DOUBLE)) /
                 ln(2.0)) AS DECIMAL(28,12))) AS DOUBLE) AS entropy
           FROM freq CROSS JOIN tot)
         SELECT n_slots,
           floor(si / CAST(n_slots AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_rec_info,
           floor(entropy * 1000000.0 + 0.5) / 1000000.0
             AS purchase_entropy,
           floor((si / CAST(n_slots AS DOUBLE) - entropy)
             * 1000000.0 + 0.5) / 1000000.0 AS novelty_lift
         FROM ri CROSS JOIN ent""",
    "q_jaro_linkage" ->
      """WITH probes AS (
           SELECT p_partkey AS probe_id,
             string_split(p_name, ' ')[1] AS block_key,
             substr(p_name, 1, length(p_name) - 1) AS probe_name
           FROM part WHERE p_partkey % 10 = 0),
         cands AS (
           SELECT p_partkey AS cand_id, p_name AS cand_name,
             string_split(p_name, ' ')[1] AS block_key
           FROM part),
         sc AS (
           SELECT probe_id, probe_name, cand_id, cand_name,
             floor(jaro_winkler_similarity(probe_name, cand_name)
               * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM cands JOIN probes USING (block_key)
           WHERE 2 * least(length(cand_name), length(probe_name)) >=
             greatest(length(cand_name), length(probe_name))),
         f AS (SELECT * FROM sc WHERE sim >= 0.9),
         rk AS (
           SELECT *,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY sim DESC, cand_id) AS rn,
             CAST(count(*) OVER (PARTITION BY probe_id) AS BIGINT)
               AS n_match
           FROM f)
         SELECT probe_id, probe_name, cand_id AS matched_id,
           cand_name AS matched_name, sim, n_match
         FROM rk WHERE rn = 1 ORDER BY probe_id""",
    "q_kendall_tau" ->
      """WITH nord AS (
           SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         nparts AS (
           SELECT o.o_custkey AS cust,
             CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS y
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY 1),
         pc AS (SELECT nord.cust, x, y FROM nord
           JOIN nparts ON nord.cust = nparts.cust),
         cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS nc FROM pc
           GROUP BY 1, 2),
         pp AS (
           SELECT CAST(a.nc * b.nc AS DECIMAL(38,0)) AS m,
             a.y < b.y AS conc
           FROM cells a JOIN cells b ON a.x < b.x AND a.y <> b.y),
         cd AS (
           SELECT sum(CASE WHEN conc THEN m ELSE 0 END) AS ncs,
             sum(CASE WHEN NOT conc THEN m ELSE 0 END) AS nds
           FROM pp),
         tx AS (SELECT sum(CAST((t * (t - 1)) // 2 AS DECIMAL(38,0)))
               AS t_x, CAST(sum(t) AS BIGINT) AS n_x
           FROM (SELECT x, CAST(sum(nc) AS BIGINT) AS t FROM cells
             GROUP BY 1)),
         ty AS (SELECT sum(CAST((t * (t - 1)) // 2 AS DECIMAL(38,0)))
               AS t_y
           FROM (SELECT y, CAST(sum(nc) AS BIGINT) AS t FROM cells
             GROUP BY 1))
         SELECT n_x AS n_customers, CAST(ncs AS BIGINT) AS n_concordant,
           CAST(nds AS BIGINT) AS n_discordant,
           CAST(t_x AS BIGINT) AS ties_x, CAST(t_y AS BIGINT) AS ties_y,
           floor((CAST(ncs AS DOUBLE) - CAST(nds AS DOUBLE)) /
             sqrt((CAST(n_x AS DOUBLE) * (CAST(n_x AS DOUBLE) - 1.0)
                 / 2.0 - CAST(t_x AS DOUBLE)) *
               (CAST(n_x AS DOUBLE) * (CAST(n_x AS DOUBLE) - 1.0)
                 / 2.0 - CAST(t_y AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS tau_b
         FROM cd CROSS JOIN tx CROSS JOIN ty""",
    "q_hurst" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS v
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1),
         idx AS (SELECT d, v,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
           FROM daily),
         ws AS (SELECT unnest([5, 10, 15]) AS w),
         blocked AS (
           -- floor() before the cast: DuckDB CAST(double AS BIGINT)
           -- ROUNDS where Spark truncates (the q_did trap)
           SELECT w, CAST(floor((CAST(t AS DOUBLE) - 1) / w) AS BIGINT)
               AS b, t, v
           FROM idx CROSS JOIN ws),
         full_ AS (SELECT w, b FROM blocked GROUP BY 1, 2
           HAVING count(*) = w),
         rows_ AS (SELECT blocked.* FROM blocked
           JOIN full_ USING (w, b)),
         m AS (
           SELECT w, b,
             CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / w
               AS mean_v,
             CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS svv
           FROM rows_ GROUP BY 1, 2),
         dev AS (
           SELECT r.w, r.b, r.t, m.svv, m.mean_v,
             CAST(sum(CAST(r.v - m.mean_v AS DECIMAL(28,12)))
               OVER (PARTITION BY r.w, r.b ORDER BY r.t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS cum
           FROM rows_ r JOIN m USING (w, b)),
         rs1 AS (
           SELECT w, b, max(cum) - min(cum) AS r,
             sqrt(max(svv) / w - max(mean_v) * max(mean_v)) AS s
           FROM dev GROUP BY 1, 2),
         rs AS (
           SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(CAST(r / s AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS rs
           FROM rs1 WHERE s > 0.0 GROUP BY 1),
         fit AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(28,12)))
               AS DOUBLE) AS sx,
             CAST(sum(CAST(ln(rs) AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE))
               AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(ln(CAST(w AS DOUBLE)) * ln(rs)
               AS DECIMAL(28,12))) AS DOUBLE) AS sxy
           FROM rs),
         wide AS (
           SELECT max(CASE WHEN w = 5 THEN rs END) AS rs_a,
             max(CASE WHEN w = 10 THEN rs END) AS rs_b,
             max(CASE WHEN w = 15 THEN rs END) AS rs_c
           FROM rs),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
         SELECT n_days,
           floor(rs_a * 1000000.0 + 0.5) / 1000000.0 AS rs_5,
           floor(rs_b * 1000000.0 + 0.5) / 1000000.0 AS rs_10,
           floor(rs_c * 1000000.0 + 0.5) / 1000000.0 AS rs_15,
           floor((CAST(k AS DOUBLE) * sxy - sx * sy) /
             (CAST(k AS DOUBLE) * sxx - sx * sx) * 1000000.0 + 0.5)
             / 1000000.0 AS hurst
         FROM nd CROSS JOIN wide CROSS JOIN fit""",
    "q_readability" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS toks,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS groups_,
             greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
               AS BIGINT)) AS n_sentences
           FROM documents),
         s AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
             n_sentences,
             groups_ + CAST(len(list_filter(toks,
               x -> NOT regexp_matches(x, '[aeiouy]'))) AS BIGINT)
               AS n_syllables
           FROM t)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             floor((206.835 -
               1.015 * CAST(n_words AS DOUBLE) /
                 CAST(n_sentences AS DOUBLE) -
               84.6 * CAST(n_syllables AS DOUBLE) /
                 CAST(n_words AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
           ELSE 0.0 END AS flesch
         FROM s ORDER BY doc_id""",
    "q_pr_auc" ->
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
             CAST(sum(pos_s) AS BIGINT) AS n_pos,
             CAST(count(*) AS BIGINT) AS n_blocks
           FROM census),
         pts AS (
           SELECT sri,
             CAST(sum(n_s) OVER (ORDER BY sri DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             CAST(sum(pos_s) OVER (ORDER BY sri DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_pos
           FROM census),
         rp AS (
           SELECT sri,
             CAST(cum_pos AS DOUBLE) / CAST(n_pos AS DOUBLE) AS r,
             CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE) AS p
           FROM pts CROSS JOIN tot),
         seg AS (
           SELECT r, p,
             coalesce(lag(r, 1) OVER (ORDER BY sri DESC), 0.0) AS r0,
             coalesce(lag(p, 1) OVER (ORDER BY sri DESC), 1.0) AS p0
           FROM rp),
         area AS (
           SELECT CAST(sum(CAST((r - r0) * (p + p0) / 2.0
             AS DECIMAL(28,12))) AS DOUBLE) AS auc_pr
           FROM seg)
         SELECT n_docs, n_pos, n_blocks,
           floor(auc_pr * 1000000.0 + 0.5) / 1000000.0 AS pr_auc
         FROM tot CROSS JOIN area""",
    "q_brier_decomp" ->
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
         bins AS (
           SELECT least(9, sri // 1000) AS bucket,
             CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(sri) AS BIGINT) AS sp,
             CAST(sum(sri * sri) AS BIGINT) AS spp,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(sri * y) AS BIGINT) AS spy
           FROM s GROUP BY 1),
         gl AS (
           SELECT CAST(sum(nb) AS BIGINT) AS n,
             CAST(sum(sp) AS BIGINT) AS gsp,
             CAST(sum(spp) AS BIGINT) AS gspp,
             CAST(sum(sy) AS BIGINT) AS gsy,
             CAST(sum(spy) AS BIGINT) AS gspy
           FROM bins),
         terms AS (
           SELECT n, gsy, gspp, gspy,
             CAST(CAST(nb AS DOUBLE) *
               (CAST(sp AS DOUBLE) / (10000.0 * CAST(nb AS DOUBLE)) -
                 CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)) *
               (CAST(sp AS DOUBLE) / (10000.0 * CAST(nb AS DOUBLE)) -
                 CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE))
               AS DECIMAL(28,12)) AS rel_t,
             CAST(CAST(nb AS DOUBLE) *
               (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE) -
                 CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE)) *
               (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE) -
                 CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE))
               AS DECIMAL(28,12)) AS res_t,
             CAST((CAST(spp AS DOUBLE) -
               CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) /
                 CAST(nb AS DOUBLE)) / 100000000.0
               AS DECIMAL(28,12)) AS wbv_t
           FROM bins CROSS JOIN gl),
         agg AS (
           SELECT n, gsy, gspp, gspy,
             CAST(sum(rel_t) AS DOUBLE) AS rel_s,
             CAST(sum(res_t) AS DOUBLE) AS res_s,
             CAST(sum(wbv_t) AS DOUBLE) AS wbv_s
           FROM terms GROUP BY 1, 2, 3, 4),
         f AS (
           SELECT n, rel_s / CAST(n AS DOUBLE) AS rel,
             res_s / CAST(n AS DOUBLE) AS res,
             wbv_s / CAST(n AS DOUBLE) AS wbv,
             (CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE)) *
               (1.0 - CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE)) AS unc,
             (CAST(gspp AS DOUBLE) / 100000000.0 -
               2.0 * CAST(gspy AS DOUBLE) / 10000.0 +
               CAST(gsy AS DOUBLE)) / CAST(n AS DOUBLE) AS braw
           FROM agg)
         SELECT n AS n_docs,
           floor(unc * 1000000.0 + 0.5) / 1000000.0 AS uncertainty,
           floor(rel * 1000000.0 + 0.5) / 1000000.0 AS reliability,
           floor(res * 1000000.0 + 0.5) / 1000000.0 AS resolution,
           floor(wbv * 1000000.0 + 0.5) / 1000000.0 AS within_bin_var,
           floor((rel - res + unc) * 1000000.0 + 0.5) / 1000000.0
             AS brier_binned,
           floor(braw * 1000000.0 + 0.5) / 1000000.0 AS brier_raw
         FROM f""",
    "q_markov_entropy" ->
      """WITH e AS (
           SELECT event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
           FROM events WHERE user_id IS NOT NULL),
         cells AS (
           SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
           FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
         rt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS ni
           FROM cells GROUP BY 1),
         gl AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(DISTINCT event_type) AS BIGINT) AS k
           FROM cells),
         rate AS (
           SELECT nn, k, CAST(sum(CAST(
               (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)) *
               (ln(CAST(ni AS DOUBLE) / CAST(n AS DOUBLE)) / ln(2.0))
               AS DECIMAL(28,12))) AS DOUBLE) AS h_rate
           FROM cells JOIN rt USING (event_type) CROSS JOIN gl
           GROUP BY 1, 2),
         marg AS (
           SELECT CAST(sum(CAST(
               (CAST(ni AS DOUBLE) / CAST(nn AS DOUBLE)) *
               (ln(CAST(nn AS DOUBLE) / CAST(ni AS DOUBLE)) / ln(2.0))
               AS DECIMAL(28,12))) AS DOUBLE) AS h_marginal
           FROM rt CROSS JOIN gl)
         SELECT nn AS n_transitions, k AS n_states,
           floor(h_marginal * 1000000.0 + 0.5) / 1000000.0 AS h_marginal,
           floor(h_rate * 1000000.0 + 0.5) / 1000000.0 AS h_rate,
           floor((h_marginal - h_rate) * 1000000.0 + 0.5) / 1000000.0
             AS info_gain
         FROM rate CROSS JOIN marg""",
    "q_ooo_audit" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         p AS (
           SELECT lag(us, 1) OVER (PARTITION BY user_id
               ORDER BY event_id) - us AS back_us
           FROM e),
         p2 AS (SELECT back_us FROM p WHERE back_us IS NOT NULL),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN back_us > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_backward,
             CAST(sum(CASE WHEN back_us > 0 THEN back_us ELSE 0 END)
               AS BIGINT) AS sum_back_us,
             CAST(max(CASE WHEN back_us > 0 THEN back_us ELSE 0 END)
               AS BIGINT) AS max_back_us
           FROM p2)
         SELECT n_pairs, n_backward,
           floor(CAST(n_backward AS DOUBLE) / CAST(n_pairs AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS backward_rate,
           floor(CASE WHEN n_backward > 0
             THEN CAST(sum_back_us AS DOUBLE) /
               (CAST(n_backward AS DOUBLE) * 1000000.0)
             ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
             AS mean_backward_s,
           floor(CAST(max_back_us AS DOUBLE) / 1000000.0
             * 1000000.0 + 0.5) / 1000000.0 AS max_backward_s
         FROM m""",
    "q_seasonal_strength" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS v,
             dayofweek(CAST(ts AS DATE)) AS wd
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1, 3),
         wk AS (
           SELECT wd, CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS s
           FROM daily GROUP BY 1),
         j AS (SELECT v, v - s AS r FROM daily JOIN wk USING (wd)),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS sv,
             CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS svv,
             CAST(sum(CAST(r AS DECIMAL(28,12))) AS DOUBLE) AS sr,
             CAST(sum(CAST(r * r AS DECIMAL(28,12))) AS DOUBLE) AS srr
           FROM j),
         f AS (
           SELECT n_days,
             svv / CAST(n_days AS DOUBLE) -
               (sv / CAST(n_days AS DOUBLE)) *
               (sv / CAST(n_days AS DOUBLE)) AS var_v,
             srr / CAST(n_days AS DOUBLE) -
               (sr / CAST(n_days AS DOUBLE)) *
               (sr / CAST(n_days AS DOUBLE)) AS var_r
           FROM m)
         SELECT n_days,
           floor(var_v * 1000000.0 + 0.5) / 1000000.0 AS var_total,
           floor(var_r * 1000000.0 + 0.5) / 1000000.0 AS var_resid,
           floor(CASE WHEN var_v > 0.0
             THEN greatest(0.0, 1.0 - var_r / var_v) ELSE 0.0 END
             * 1000000.0 + 0.5) / 1000000.0 AS strength
         FROM f""",
    "q_sax" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS v
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1),
         idx AS (SELECT v,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
           FROM daily),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS sv,
             CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS svv
           FROM idx),
         mm AS (
           SELECT sv / CAST(n AS DOUBLE) AS mu,
             sqrt(svv / CAST(n AS DOUBLE) -
               (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE)))
               AS sigma
           FROM m),
         z AS (
           SELECT CAST(floor((CAST(t AS DOUBLE) - 1) / 5) AS BIGINT)
               AS segment,
             CASE WHEN sigma > 0.0 THEN (v - mu) / sigma ELSE 0.0 END
               AS z
           FROM idx CROSS JOIN mm),
         seg AS (
           SELECT segment, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(z AS DECIMAL(28,12))) AS DOUBLE) / count(*)
               AS paa_raw
           FROM z GROUP BY 1)
         SELECT segment, n_days,
           floor(paa_raw * 1000000.0 + 0.5) / 1000000.0 AS paa,
           CASE WHEN paa_raw < -0.6744897501960817 THEN 'a'
                WHEN paa_raw < 0.0 THEN 'b'
                WHEN paa_raw < 0.6744897501960817 THEN 'c'
                ELSE 'd' END AS symbol
         FROM seg ORDER BY segment""",
    "q_cluster_bootstrap" ->
      """WITH users AS (
           SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS s,
             CAST(count(*) AS BIGINT) AS n
           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
           GROUP BY 1),
         rep AS (SELECT user_id, s, n, unnest(range(0, 32)) AS rep
                 FROM users),
         m AS (
           SELECT rep, s, n,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4 ELSE 5 END AS mult
           FROM (SELECT rep, s, n,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) ||
                     ':' || CAST(rep AS VARCHAR)), 1, 15))::BIGINT
                     AS DOUBLE) / 1152921504606846976.0 AS u
                 FROM rep)),
         mb AS (
           SELECT rep,
             CAST(sum(CAST(s * CAST(mult AS DOUBLE) AS DECIMAL(28,12)))
               AS DOUBLE) / CASE WHEN sum(mult * n) = 0 THEN NULL
               ELSE CAST(sum(mult * n) AS DOUBLE) END AS mean_b
           FROM m GROUP BY 1),
         f AS (
           SELECT CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE) /
               CAST(sum(n) AS DOUBLE) AS mean_full,
             CAST(count(*) AS BIGINT) AS n_users
           FROM users)
         SELECT round(mean_full, 6) AS mean_full,
           round(quantile_cont(mean_b, 0.025), 6) AS ci_lo,
           round(quantile_cont(mean_b, 0.975), 6) AS ci_hi,
           CAST(count(*) AS BIGINT) AS n_resamples, n_users
         FROM mb CROSS JOIN f GROUP BY mean_full, n_users""",
    "q_hll_intersect" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE user_id IS NOT NULL AND event_type = 'purchase'),
         b AS (SELECT DISTINCT user_id FROM events
           WHERE user_id IS NOT NULL AND event_type = 'error'),
         i AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersect
           FROM a WHERE user_id IN (SELECT user_id FROM b)),
         ca AS (SELECT CAST(count(*) AS BIGINT) AS exact_a FROM a),
         cb AS (SELECT CAST(count(*) AS BIGINT) AS exact_b FROM b)
         SELECT exact_a, exact_b, exact_intersect,
           exact_a + exact_b - exact_intersect AS exact_union,
           TRUE AS est_within_10pct
         FROM ca CROSS JOIN cb CROSS JOIN i""",
    "q_stats_drift" ->
      """WITH rows_ AS (
           SELECT CAST(ts AS DATE) AS d, value, event_type, user_id
           FROM events WHERE ts IS NOT NULL),
         cut AS (SELECT min(d) + CAST(floor(
             date_diff('day', min(d), max(d)) / 2.0) AS INT) AS cut
           FROM rows_),
         mk AS (SELECT rows_.*, d <= cut AS h1 FROM rows_
           CROSS JOIN cut),
         m AS (
           SELECT
             CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(CASE WHEN h1 AND value IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS nulls1,
             CAST(sum(CASE WHEN NOT h1 AND value IS NULL THEN 1 ELSE 0
               END) AS BIGINT) AS nulls2,
             sum(CAST(CASE WHEN h1 THEN value ELSE 0.0 END
               AS DECIMAL(28,12))) AS s1,
             sum(CAST(CASE WHEN NOT h1 THEN value ELSE 0.0 END
               AS DECIMAL(28,12))) AS s2,
             CAST(count(DISTINCT CASE WHEN h1 THEN event_type END)
               AS BIGINT) AS ndv_t1,
             CAST(count(DISTINCT CASE WHEN NOT h1 THEN event_type END)
               AS BIGINT) AS ndv_t2,
             CAST(count(DISTINCT CASE WHEN h1 THEN user_id END)
               AS BIGINT) AS ndv_u1,
             CAST(count(DISTINCT CASE WHEN NOT h1 THEN user_id END)
               AS BIGINT) AS ndv_u2
           FROM mk),
         r AS (
           SELECT '*' AS column_name, 'row_count' AS metric,
             CAST(n1 AS DOUBLE) AS a, CAST(n2 AS DOUBLE) AS b FROM m
           UNION ALL
           SELECT 'value', 'null_rate',
             CAST(nulls1 AS DOUBLE) / CAST(n1 AS DOUBLE),
             CAST(nulls2 AS DOUBLE) / CAST(n2 AS DOUBLE) FROM m
           UNION ALL
           SELECT 'value', 'mean',
             CASE WHEN n1 > nulls1 THEN CAST(s1 AS DOUBLE) /
               (CAST(n1 AS DOUBLE) - CAST(nulls1 AS DOUBLE))
               ELSE 0.0 END,
             CASE WHEN n2 > nulls2 THEN CAST(s2 AS DOUBLE) /
               (CAST(n2 AS DOUBLE) - CAST(nulls2 AS DOUBLE))
               ELSE 0.0 END FROM m
           UNION ALL
           SELECT 'event_type', 'ndv', CAST(ndv_t1 AS DOUBLE),
             CAST(ndv_t2 AS DOUBLE) FROM m
           UNION ALL
           SELECT 'user_id', 'ndv', CAST(ndv_u1 AS DOUBLE),
             CAST(ndv_u2 AS DOUBLE) FROM m)
         SELECT column_name, metric,
           floor(a * 1000000.0 + 0.5) / 1000000.0 AS first_half,
           floor(b * 1000000.0 + 0.5) / 1000000.0 AS second_half,
           floor((b - a) * 1000000.0 + 0.5) / 1000000.0 AS delta
         FROM r ORDER BY 1, 2""",
    "q_abc" ->
      """WITH pp AS (
           SELECT l_partkey,
             sum(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(28,12))) AS rev
           FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(rev) AS total FROM pp),
         cl AS (
           SELECT rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM pp),
         c2 AS (
           SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                       WHEN cum * 20 <= total * 19 THEN 'B'
                       ELSE 'C' END AS cls, rev, total
           FROM cl CROSS JOIN tot)
         SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(round(sum(rev), 2) AS DOUBLE) AS revenue,
           floor(CAST(sum(rev) AS DOUBLE) / CAST(max(total) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS revenue_share
         FROM c2 GROUP BY 1 ORDER BY 1""",
    // per-half sums are EXACT integer micros (floor(x*1e6+0.5) of
    // IEEE-identical doubles) — see StarAnalytics.partHalves: per-row
    // double->DECIMAL casts round differently across engines, and a
    // zipf hot part accumulates the divergence past the r6 rounding in
    // the cancellation-sensitive (p2-p1) term
    "q_rev_bridge" ->
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
           FROM rows_ CROSS JOIN cut GROUP BY 1),
         m AS (
           SELECT CAST(sum(r1) AS DOUBLE) / 1000000.0 AS total_h1,
             CAST(sum(r2) AS DOUBLE) / 1000000.0 AS total_h2,
             CAST(sum(CASE WHEN q1 > 0 AND q2 > 0 THEN CAST(
                 (CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE) -
                  CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) *
                 ((CAST(q1 AS DOUBLE) + CAST(q2 AS DOUBLE)) / 2000000.0)
                 AS DECIMAL(28,12)) ELSE 0 END) AS DOUBLE)
               AS price_effect,
             CAST(sum(CASE WHEN q1 > 0 AND q2 > 0 THEN CAST(
                 (CAST(q2 AS DOUBLE) - CAST(q1 AS DOUBLE)) / 1000000.0 *
                 ((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE) +
                   CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)) / 2.0)
                 AS DECIMAL(28,12)) ELSE 0 END) AS DOUBLE)
               AS volume_effect,
             CAST(sum(CASE WHEN q1 = 0 THEN r2 ELSE 0 END) AS DOUBLE)
               / 1000000.0 AS new_parts_effect,
             CAST(sum(CASE WHEN q2 = 0 THEN -r1 ELSE 0 END) AS DOUBLE)
               / 1000000.0 AS lost_parts_effect
           FROM per)
         SELECT
           floor(total_h1 * 1000000.0 + 0.5) / 1000000.0 AS total_h1,
           floor(total_h2 * 1000000.0 + 0.5) / 1000000.0 AS total_h2,
           floor((total_h2 - total_h1) * 1000000.0 + 0.5) / 1000000.0
             AS delta,
           floor(price_effect * 1000000.0 + 0.5) / 1000000.0
             AS price_effect,
           floor(volume_effect * 1000000.0 + 0.5) / 1000000.0
             AS volume_effect,
           floor(new_parts_effect * 1000000.0 + 0.5) / 1000000.0
             AS new_parts_effect,
           floor(lost_parts_effect * 1000000.0 + 0.5) / 1000000.0
             AS lost_parts_effect
         FROM m""",
    "q_discount_elasticity" ->
      """WITH rows_ AS (
           SELECT p_brand, l_discount AS x, l_quantity AS y
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         m AS (
           SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy
           FROM rows_ GROUP BY 1)
         SELECT p_brand, n,
           floor((CAST(n AS DOUBLE) * sxy - sx * sy) /
             (CAST(n AS DOUBLE) * sxx - sx * sx) * 1000000.0 + 0.5)
             / 1000000.0 AS slope,
           floor((sy - (CAST(n AS DOUBLE) * sxy - sx * sy) /
             (CAST(n AS DOUBLE) * sxx - sx * sx) * sx) /
             CAST(n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             AS intercept
         FROM m ORDER BY p_brand""",
  )
}
