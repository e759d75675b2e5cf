package graft.queries

/** DuckDB oracle SQL — one ANSI-SQL twin per hash-checked query in
  * [[Inventory]] / [[Extras]]. Same determinism rules as the Spark side:
  * total ORDER BY, DECIMAL-exact double aggregation, formatted-string
  * timestamps, BIGINT-cast derived integers, identical column names.
  */
object OracleSql {

  private val F = "%Y-%m-%d %H:%M:%S.%f"

  /** DECIMAL-exact sum rendered as double (matches Inventory.dsum). */
  private def dsum(e: String, p: Int = 28, s: Int = 10): String =
    s"CAST(CAST(SUM(CAST(CAST(($e) AS VARCHAR) AS DECIMAL($p,$s))) AS VARCHAR) AS DOUBLE)"

  val sql: Map[String, String] = Map(
    "q01_scan" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_extendedprice LIMIT 100""".stripMargin,

    "q02_filter" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_totalprice, o_orderstatus
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND o_totalprice > 150000.0 AND o_orderstatus IN ('O','F')
        |  AND o_orderkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q03_json_project" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k, event_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q04_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin,

    "q05_join_broadcast" ->
      s"""SELECT p_brand, ${dsum("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q06_join_5way" ->
      s"""SELECT r_name, ${dsum("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q07_join_leftouter" ->
      s"""SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS order_cnt,
         |  ${dsum("COALESCE(o_totalprice, 0.0)", 28, 2)} AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q08_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "q09_agg_ratios" ->
      s"""WITH g AS (
         |  SELECT l_returnflag, l_linestatus,
         |    ${dsum("l_quantity", 28, 2)} AS sum_qty,
         |    ${dsum("l_extendedprice", 28, 2)} AS sum_base_price,
         |    ${dsum("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
         |    ${dsum("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
         |    ${dsum("l_discount", 18, 6)} AS sum_disc,
         |    CAST(COUNT(*) AS BIGINT) AS count_order
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |  GROUP BY l_returnflag, l_linestatus)
         |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
         |  sum_charge,
         |  sum_qty / count_order AS avg_qty,
         |  sum_base_price / count_order AS avg_price,
         |  sum_disc / count_order AS avg_disc,
         |  CASE WHEN sum_qty <> 0.0 THEN sum_disc_price / sum_qty END AS rev_per_qty,
         |  count_order
         |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q10_distinct" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniq_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the estimate is approximate by design; the checkable contract is
    // the BOUND (within 5% of exact), which the Spark side emits as a
    // boolean and the oracle asserts as constant true
    "q10_approx_distinct" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q11_explode_agg" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,

    "q12_rollup" ->
      s"""SELECT COALESCE(CAST(c_nationkey AS VARCHAR), '(all)') AS nation,
         |  COALESCE(o_orderpriority, '(all)') AS priority,
         |  ${dsum("o_totalprice", 28, 2)} AS total_price,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY ROLLUP(c_nationkey, o_orderpriority)
         |ORDER BY nation, priority""".stripMargin,

    "q12_cube" ->
      s"""SELECT COALESCE(CAST(c_nationkey AS VARCHAR), '(all)') AS nation,
         |  COALESCE(o_orderstatus, '(all)') AS status,
         |  ${dsum("o_totalprice", 28, 2)} AS total_price,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY CUBE(c_nationkey, o_orderstatus)
         |ORDER BY nation, status""".stripMargin,

    "q13_keep_latest" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q14_trailing_window" ->
      """SELECT event_id, user_id,
        |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 518400000000 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |    AS trailing_sum
        |FROM events ORDER BY event_id""".stripMargin,

    "q15_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        dense_rank() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,

    "q16_range_join" ->
      s"""SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_early_items,
         |  ${dsum("l_extendedprice", 28, 2)} AS early_revenue
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  AND l_shipdate >= o_orderdate
         |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q17_asof_join" ->
      s"""SELECT event_id, user_id, strftime(ts, '$F') AS ts,
         |  strftime((SELECT max(c.ts) FROM events c
         |            WHERE c.user_id = e.user_id AND c.event_type = 'click'
         |              AND c.ts <= e.ts), '$F') AS last_click_ts
         |FROM events e WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q18_set_ops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |SELECT 'union' AS op, c_custkey
        |  FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey
        |  FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, c_custkey
        |  FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
        |ORDER BY op, c_custkey""".stripMargin,

    "q19_dedup_upsert" ->
      s"""SELECT user_id, event_type, strftime(ts, '$F') AS ts, value, event_id
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q20_tumbling" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q21_sliding" ->
      """WITH e AS (
        |  SELECT make_timestamp(((epoch_us(ts)//1800000000)*1800000000) - off) AS ws,
        |    event_type, value
        |  FROM events, (SELECT unnest([0, 1800000000]) AS off) o)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q22_session" ->
      s"""WITH x AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |y AS (
         |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sid FROM x)
         |SELECT user_id, strftime(MIN(ts), '$F') AS session_start,
         |  strftime(MAX(ts) + INTERVAL 30 MINUTE, '$F') AS session_end,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
         |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q23_sanitize" ->
      """SELECT o_orderkey,
        |  CASE WHEN floor(o_totalprice + 0.5) > 0
        |       THEN CAST(floor(o_totalprice + 0.5) AS BIGINT) END AS money_minor,
        |  'act_' || CAST(o_custkey AS VARCHAR) AS acct,
        |  'act_' || CAST(o_custkey AS VARCHAR) AS acct_pre,
        |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '+00:00' AS ts_iso_a,
        |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '+00:00' AS ts_iso_b,
        |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '+00:00' AS ts_iso_c,
        |  CASE WHEN o_orderstatus = 'O' THEN true
        |       WHEN o_orderstatus = 'F' THEN false ELSE true END AS flag,
        |  o_orderpriority || '|' || o_orderstatus || '|x' AS list_csv,
        |  'a|' || o_orderstatus AS list_json,
        |  CASE WHEN o_orderstatus IN ('O','F') THEN NULL
        |       WHEN floor(o_totalprice + 0.5) > 0
        |       THEN CAST(floor(o_totalprice + 0.5) AS BIGINT) END AS spend_cap,
        |  'A_' || o_orderstatus AS unescaped
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,

    "q24_scalar_battery" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  upper(l_returnflag || '_' || l_linestatus) AS flag_status,
        |  substr(l_returnflag || l_linestatus, 1, 1) AS first_char,
        |  trim('  ' || l_returnflag || '  ') AS trimmed,
        |  regexp_matches(l_returnflag, '^[AR]$') AS is_ar,
        |  round(l_extendedprice / 7.0, 2) AS price_div7,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  greatest(l_quantity, l_discount * 100.0) AS g,
        |  least(l_tax, l_discount) AS le,
        |  CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS BIGINT)
        |    AS days_since,
        |  CAST(l_shipdate + INTERVAL 2 MONTH AS DATE) AS ship_plus2m
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 2000""".stripMargin,

    "q25_text_stats" ->
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
        |wc AS (SELECT lang, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
        |top AS (SELECT lang, word AS top_term FROM
        |  (SELECT lang, word, row_number() OVER (PARTITION BY lang
        |     ORDER BY c DESC, word) AS rn FROM wc) WHERE rn = 1),
        |dw AS (SELECT lang, CAST(COUNT(DISTINCT word) AS BIGINT) AS distinct_words
        |  FROM w GROUP BY 1),
        |ag AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |  FROM documents GROUP BY 1)
        |SELECT ag.lang AS lang, docs, avg_chars, distinct_words, top_term
        |FROM ag JOIN dw ON ag.lang = dw.lang JOIN top ON ag.lang = top.lang
        |ORDER BY ag.lang""".stripMargin,

    "q26_centroid" ->
      """SELECT label, CAST(i AS BIGINT) AS dim,
        |  CAST(CAST(SUM(CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
        |    / COUNT(*) AS centroid
        |FROM embeddings, generate_series(1, 64) t(i)
        |GROUP BY label, i ORDER BY label, dim""".stripMargin,

    "q26b_cosine_topk" ->
      """WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
        |pr AS (SELECT vec_id,
        |  CAST(CAST(SUM(CAST(CAST(CAST(embedding[i] AS DOUBLE)*CAST(pe[i] AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS dot,
        |  CAST(CAST(SUM(CAST(CAST(CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS n1,
        |  CAST(CAST(SUM(CAST(CAST(CAST(pe[i] AS DOUBLE)*CAST(pe[i] AS DOUBLE) AS VARCHAR)
        |    AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS n2
        |  FROM embeddings, p, generate_series(1, 64) t(i)
        |  WHERE vec_id <> 0 GROUP BY vec_id)
        |SELECT vec_id, dot / (sqrt(n1) * sqrt(n2)) AS cosine
        |FROM pr ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin,

    "q27_near_dup" ->
      """WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM t GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT d1, d2, CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
        |FROM p JOIN s sa ON sa.doc_id = d1 JOIN s sb ON sb.doc_id = d2
        |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.9
        |ORDER BY d1, d2""".stripMargin,

    "q28_stream_equiv" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
