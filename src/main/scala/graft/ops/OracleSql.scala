package graft.ops

/** DuckDB oracle SQL for [[Relational]] — SURVEY.md §2.2, verbatim except
  * where noted. Aliases are byte-identical to the Spark-side aliases.
  * Sums of int columns are CAST to BIGINT so DuckDB's HUGEINT widening
  * matches Spark's long.
  */
object OracleSql {

  val all: Seq[(String, String)] = Seq(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) sum_qty,
        |       round(sum(l_extendedprice),2) sum_base,
        |       round(sum(l_extendedprice*(1-l_discount)),2) sum_disc_price,
        |       round(avg(l_quantity),4) avg_qty, count(*) cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 20""".stripMargin,

    "q03_join_revenue_by_nation" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) revenue
        |FROM customer JOIN orders ON c_custkey=o_custkey
        |JOIN lineitem ON l_orderkey=o_orderkey
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) p, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
        | FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 100""".stripMargin,

    "q06_distinct_users" ->
      "SELECT event_type, count(DISTINCT user_id) u FROM events GROUP BY event_type ORDER BY event_type",

    "q07_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice),2) s, count(*) c
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q08_semi_anti" ->
      """SELECT
        | (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)) with_orders,
        | (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) without_orders""".stripMargin,

    "q09_month_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) m, count(*) c, round(sum(o_totalprice),2) s
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_json_extract" ->
      """SELECT event_type, round(avg(CAST(json_extract(props,'$.k') AS INT)),4) avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q11_sessionize" ->
      """WITH g AS (
        | SELECT user_id, ts,
        |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END new_s
        | FROM events)
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) sessions, count(*) n_events
        |FROM g GROUP BY user_id ORDER BY user_id LIMIT 100""".stripMargin,

    "q12_dedup_docs" ->
      """SELECT count(*) n_unique, (SELECT count(*) FROM documents) n_total FROM (
        | SELECT min(doc_id) keep FROM documents GROUP BY lang, source, text) t""".stripMargin,

    "q13_cosine_topk" ->
      """WITH q AS (SELECT embedding e FROM embeddings WHERE vec_id=0)
        |SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT CAST(e AS DOUBLE[]) FROM q)),6) sim
        |FROM embeddings WHERE vec_id<>0 ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin,

    "q14_tumbling_1h" ->
      """SELECT date_trunc('hour', ts) w, event_type, count(*) c, round(sum(value),2) s
        |FROM events GROUP BY 1,2 ORDER BY 1,2 LIMIT 200""".stripMargin,

    "q15_set_ops" ->
      """SELECT 'all_distinct' tag, count(*) c FROM (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier) t
        |UNION ALL
        |SELECT 'both' tag, count(*) c FROM (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) t
        |UNION ALL
        |SELECT 'cust_only' tag, count(*) c FROM (SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier) t
        |ORDER BY tag""".stripMargin,

    "q16_strings" ->
      """SELECT count(*) FILTER (WHERE p_name LIKE '%red%') n_red,
        |       count(DISTINCT upper(substr(p_type,1,3))) n_pfx,
        |       CAST(sum(length(p_name)) AS BIGINT) tot_len,
        |       count(*) FILTER (WHERE regexp_matches(p_name, '^(red|blue) ')) n_regex
        |FROM part""".stripMargin,

    "q17_vector_norm" ->
      """SELECT label, round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))),3) avg_l2
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q18_asof_join" ->
      """WITH p AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
        |     c AS (SELECT user_id, ts FROM events WHERE event_type='click'),
        |     m AS (SELECT p.user_id, (epoch_us(p.ts) - epoch_us(c.ts)) / 1e6 AS gap_s
        |           FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT count(*) n_matched, round(avg(gap_s),2) avg_gap_s FROM m""".stripMargin,

    "q19_cube" ->
      """SELECT event_type, d, count(*) c FROM (
        | SELECT event_type, CAST(date_trunc('day', ts) AS DATE) d FROM events) t
        |GROUP BY CUBE(event_type, d)
        |ORDER BY event_type NULLS FIRST, d NULLS FIRST""".stripMargin,

    "q32_percentile_corr" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) p50,
        |       round(quantile_cont(value, 0.95), 4) p95,
        |       round(corr(value, CAST(json_extract(props,'$.k') AS INT)), 4) corr_vk
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q33_correlated_count" ->
      """SELECT c_custkey, n_orders FROM (
        |  SELECT c_custkey, (SELECT count(*) FROM orders WHERE o_custkey=c_custkey) n_orders
        |  FROM customer) t
        |WHERE n_orders >= 12 ORDER BY n_orders DESC, c_custkey LIMIT 20""".stripMargin,

    "q34_window_frames" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) p,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING),2) run_sum,
        |  round(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),2) next_p,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS INT) quartile
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_custkey, o_orderdate, o_orderkey LIMIT 100""".stripMargin,

    "q35_pivot_values" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type='click' THEN value ELSE 0 END),2) click_v,
        |  round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END),2) purchase_v,
        |  round(sum(CASE WHEN event_type='view' THEN value ELSE 0 END),2) view_v,
        |  count(*) n
        |FROM events GROUP BY user_id ORDER BY user_id LIMIT 50""".stripMargin,

    "q36_ship_lag" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) m,
        |  round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))),4) avg_ship_days,
        |  count(*) c
        |FROM orders JOIN lineitem ON l_orderkey=o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q38_moving_avg" ->
      """SELECT user_id, ts, round(avg(value) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),4) mv
        |FROM events WHERE user_id < 5 ORDER BY user_id, ts LIMIT 100""".stripMargin,

    "q39_band_pairs" ->
      """SELECT a.event_type ta, b.event_type tb, count(*) c
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q20_argmax_group" ->
      """SELECT r_name, n_name, c FROM (
        | SELECT r_name, n_name, count(*) c,
        |        row_number() OVER (PARTITION BY r_name ORDER BY count(*) DESC, n_name) rn
        | FROM customer JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        | GROUP BY r_name, n_name) t WHERE rn=1 ORDER BY r_name""".stripMargin,

    "q43_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) sum_qty, count(*) n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q47_set_ops_all" ->
      """SELECT 'except_all' tag, count(*) c FROM (SELECT c_nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier) t
        |UNION ALL
        |SELECT 'inter_all' tag, count(*) c FROM (SELECT c_nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier) t
        |UNION ALL
        |SELECT 'union_all' tag, count(*) c FROM (SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier) t
        |ORDER BY tag""".stripMargin,

    // q55's bloom pruning is result-invisible (no false negatives, false
    // positives removed by the join) — the oracle is the PLAIN join
    "q55_bloom_join" ->
      """SELECT l_returnflag, count(*) n_lines,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // sliding 1h/30min: every event belongs to exactly the two
    // epoch-aligned 30-min buckets at and before its own
    "q56_sliding_30m" ->
      """SELECT w, event_type, count(*) c, round(sum(value),2) s FROM (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) w,
        |         event_type, value
        |  FROM events) t
        |GROUP BY 1,2 ORDER BY 1,2 LIMIT 200""".stripMargin,

    // epoch_us(ts) on both sides: the engine's timestamps are µs while
    // the raw parquet is ns — ordering must compare at the SAME precision
    "q60_latest_events" ->
      """SELECT user_id, epoch_us(ts) ts_us, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q61_null_semantics" ->
      """SELECT x, count(*) n, count(y) n_y, count(DISTINCT y) nd_y,
        |       count(*) FILTER (WHERE x IS NOT DISTINCT FROM y) nullsafe_eq
        |FROM (SELECT nullif(event_type,'click') x, nullif(event_type,'view') y
        |      FROM events) t
        |GROUP BY x ORDER BY x NULLS FIRST""".stripMargin,

    "q62_window_battery2" ->
      """SELECT o_orderpriority,
        |  round(min(fv),2) min_first, round(max(lv),2) max_last, round(min(nth),2) nth10,
        |  round(avg(pr),4) avg_pr, round(avg(cd),4) avg_cd
        |FROM (
        |  SELECT o_orderpriority,
        |    first_value(o_totalprice) OVER wf fv,
        |    last_value(o_totalprice) OVER wf lv,
        |    nth_value(o_totalprice, 10) OVER wf nth,
        |    percent_rank() OVER wr pr,
        |    cume_dist() OVER wr cd
        |  FROM orders
        |  WINDOW wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |         wr AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // arrays rendered as space-joined strings (pandas comparator can't
    // hash list cells); sort AFTER distinct — distinct's order is
    // impl-defined
    "q63_array_ops" ->
      """SELECT doc_id, array_to_string(list_sort(list_distinct(toks))[1:5], ' ') first5,
        |       len(list_distinct(toks)) n_distinct,
        |       array_to_string(list_reverse(toks)[1:3], ' ') rev3,
        |       list_contains(toks, 'the') has_the
        |FROM (SELECT doc_id, string_split(text,' ') toks FROM documents WHERE doc_id < 10) t
        |ORDER BY doc_id""".stripMargin,

    // decorrelated TPC-H Q21 shape: per-(order,supplier) late flags,
    // per-order supplier/late counts, join back — no correlated subquery
    "q64_late_alone" ->
      """WITH ol AS (
        |  SELECT l_orderkey, l_suppkey,
        |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT l_orderkey, count(*) n_supp, sum(late) n_late
        |  FROM ol GROUP BY 1)
        |SELECT l_suppkey, count(*) n_orders
        |FROM ol JOIN o USING (l_orderkey)
        |WHERE late = 1 AND n_late = 1 AND n_supp >= 2
        |GROUP BY 1 ORDER BY n_orders DESC, l_suppkey LIMIT 10""".stripMargin,

    "q65_full_outer" ->
      """WITH c AS (SELECT c_nationkey k, count(*) c_cnt FROM customer
        |           WHERE c_nationkey < 20 GROUP BY 1),
        |s AS (SELECT s_nationkey k, count(*) s_cnt FROM supplier
        |      WHERE s_nationkey > 5 GROUP BY 1)
        |SELECT coalesce(c.k, s.k) k, coalesce(c_cnt, 0) c_cnt, coalesce(s_cnt, 0) s_cnt
        |FROM c FULL OUTER JOIN s ON c.k = s.k
        |ORDER BY k""".stripMargin,

    "q67_schema_drift" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 2 <> 0)
        |SELECT coalesce(o_orderpriority, '<missing>') prio, count(*) n,
        |       round(sum(o_totalprice),2) total
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q70_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) h, count(*) c, round(sum(value),2) s
        |  FROM events WHERE event_type = 'error' GROUP BY 1),
        |bounds AS (SELECT min(date_trunc('hour', ts)) lo, max(date_trunc('hour', ts)) hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) h FROM bounds)
        |SELECT h, coalesce(c, 0) c, coalesce(s, 0.0) s
        |FROM spine LEFT JOIN hourly USING (h)
        |ORDER BY h LIMIT 200""".stripMargin,

    // decimal twin: EXACT decimal sums rendered as strings (identical
    // across engines); avg divides the exact decimal sum as double —
    // DuckDB's avg(DECIMAL) returns DOUBLE, so avg is never aggregated
    // natively on either side
    "q71_decimal_pricing" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) sum_base,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) sum_disc,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) avg_price,
        |       count(*) cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // map twin: the Spark side parses props into a real map column and
    // explodes entries; the oracle reproduces the values from the JSON
    // text (json_keys + computed-path json_extract)
    "q72_map_entries" ->
      """WITH kv AS (
        |  SELECT event_type, unnest(json_keys(props)) k, props FROM events)
        |SELECT event_type, k, count(*) n,
        |       CAST(sum(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS BIGINT) sum_v,
        |       min(CAST(json_extract(props, '$.' || k) AS BIGINT)) min_v,
        |       max(CAST(json_extract(props, '$.' || k) AS BIGINT)) max_v
        |FROM kv GROUP BY event_type, k ORDER BY event_type, k""".stripMargin,

    // tie-stress ASOF twin: DuckDB's native ASOF JOIN on an hour-
    // truncated grid (equal timestamps are the common case) in both
    // directions — pins the inclusive-boundary rule engine-to-engine
    "q82_asof_ties" ->
      """WITH v AS (SELECT user_id, date_trunc('hour', ts) ts FROM events
        |           WHERE event_type = 'view'),
        |     c AS (SELECT user_id, date_trunc('hour', ts) ts, max(value) v
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |     b AS (SELECT v.user_id, c.v FROM v
        |           ASOF JOIN c ON v.user_id = c.user_id AND v.ts >= c.ts),
        |     f AS (SELECT v.user_id, c.v FROM v
        |           ASOF JOIN c ON v.user_id = c.user_id AND v.ts <= c.ts)
        |SELECT (SELECT count(*) FROM v) n_left,
        |       (SELECT count(*) FROM b) n_b,
        |       (SELECT round(sum(v), 2) FROM b) sum_v_b,
        |       (SELECT count(*) FROM f) n_f,
        |       (SELECT round(sum(v), 2) FROM f) sum_v_f""".stripMargin,

    // concurrent-sessions twin: the naive range-predicate self-join
    // over the same 30-min-gap sessionization — the engine's bucket-
    // tiled interval join must reproduce it exactly
    "q91_concurrent_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
        |                   > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events WHERE user_id < 50),
        |s AS (
        |  SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM g),
        |sess AS (
        |  SELECT user_id, sid, min(ts) st, max(ts) en FROM s GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.user_id u1, b.user_id u2
        |  FROM sess a JOIN sess b
        |    ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en)
        |SELECT u1, u2, count(*) AS n_overlaps
        |FROM pairs GROUP BY 1, 2
        |ORDER BY n_overlaps DESC, u1, u2 LIMIT 20""".stripMargin,

    // rolling-engagement twin: trailing windows as day-range joins over
    // the distinct (day, user) grain
    "q92_active_users" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM du),
        |dau AS (SELECT d, count(*) dau FROM du GROUP BY d),
        |wau AS (SELECT days.d, count(DISTINCT du.user_id) wau
        |        FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d GROUP BY days.d),
        |mau AS (SELECT days.d, count(DISTINCT du.user_id) mau
        |        FROM days JOIN du ON du.d BETWEEN days.d - 29 AND days.d GROUP BY days.d)
        |SELECT dau.d, dau.dau, wau.wau, mau.mau
        |FROM dau JOIN wau ON dau.d = wau.d JOIN mau ON dau.d = mau.d
        |ORDER BY dau.d""".stripMargin,

    // same decorrelated min-per-part join; exact cents; ties kept
    "q158_min_cost_supplier" ->
      """WITH li AS (
        |  SELECT l.l_partkey, l.l_suppkey,
        |         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_size = 10),
        |mn AS (SELECT l_partkey, min(pc) AS mn FROM li GROUP BY l_partkey),
        |w AS (
        |  SELECT DISTINCT li.l_partkey, li.l_suppkey, li.pc
        |  FROM li JOIN mn ON mn.l_partkey = li.l_partkey AND li.pc = mn.mn)
        |SELECT w.l_partkey AS p_partkey, s.s_name, n.n_name,
        |       round(w.pc / 100.0, 2) AS min_price
        |FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |ORDER BY min_price, p_partkey, s_name LIMIT 100""".stripMargin,

    // cross-multiplied integer threshold: 5*qty*n < sum(qty)
    "q159_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem),
        |per AS (
        |  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(qc) AS BIGINT) AS sq
        |  FROM li GROUP BY l_partkey)
        |SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_small,
        |       round(sum(li.pc) / 100.0, 2) AS revenue
        |FROM li JOIN per ON per.pk = li.l_partkey
        |JOIN part p ON p.p_partkey = li.l_partkey
        |WHERE li.qc * 5 * per.n < per.sq
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    // exact 1e-4-dollar integer revenue; scalar max subquery
    "q160_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |              (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |           AS BIGINT) AS tot
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, round(rev.tot / 10000.0, 2) AS total_revenue
        |FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        |WHERE rev.tot = (SELECT max(tot) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,

    // integer test bal*n > sum; NOT EXISTS as anti join
    "q161_idle_rich" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bc
        |  FROM customer),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(bc) AS BIGINT) AS s
        |  FROM c WHERE bc > 0)
        |SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_cust,
        |       round(sum(c.bc) / 100.0, 2) AS total_balance
        |FROM c CROSS JOIN st
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c.bc * st.n > st.s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    // grouped-HAVING IN subquery as the aggregate itself joined back
    "q162_big_orders" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS tq
        |  FROM lineitem GROUP BY l_orderkey HAVING tq > 25000)
        |SELECT c.c_name, o.o_orderkey,
        |       CAST(o.o_orderdate AS DATE) AS o_orderdate,
        |       round(o.o_totalprice, 2) AS o_totalprice,
        |       round(per.tq / 100.0, 2) AS total_qty
        |FROM per JOIN orders o ON o.o_orderkey = per.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY total_qty DESC, o.o_orderkey LIMIT 50""".stripMargin)
}
