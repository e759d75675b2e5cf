package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Sanitize
import graft.expressions.UnicodeUnescape

/** The declared query inventory Q01–Q28 (SURVEY.md §2.2) — the t2
  * correctness contract distilled from the reference's operator surface.
  *
  * Every query is a plain declarative DataFrame plan: Catalyst handles
  * pushdown/pruning, AQE picks physical join strategies (small dims are
  * additionally hinted with `broadcast`). Determinism rules for the
  * DuckDB oracle:
  *  - every query ends in a total ORDER BY;
  *  - double aggregates go through exact DECIMAL accumulation and are
  *    cast back to DOUBLE at the end, so Spark and DuckDB produce
  *    bit-identical IEEE values regardless of execution order;
  *  - timestamps are emitted as formatted strings or DATEs (never raw
  *    TIMESTAMP columns) to sidestep physical-type/offset mismatches;
  *  - derived integers are cast to BIGINT on both sides.
  */
object Inventory {

  /** Microsecond-precision timestamp render (oracle: strftime %f). */
  private[queries] val F6 = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private[queries] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has stored `ts` as parquet TIMESTAMP(NANOS) in
    * some data generations — which Spark's reader rejects by default,
    * so it is read as raw nanos via `legacy.parquet.nanosAsLong` — and
    * as TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) in others. Normalize
    * either shape to a plain micros TimestampType: nanos truncate the
    * way DuckDB does, and the NTZ cast is epoch-identical because every
    * session here runs with session.timeZone=UTC.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // raw nanos (legacy flag)
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }

  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, dir, "events"))
  }

  /** Exact decimal sum rendered as double — order-independent, so it
    * hash-matches DuckDB's `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`.
    */
  private[queries] def dsum(c: Column, p: Int = 28, sc: Int = 10): Column =
    sum(c.cast(DecimalType(p, sc))).cast(DoubleType)

  private[queries] def cnt: Column = count(lit(1))

  // ---------------------------------------------------------------- A/B: scans, filters

  /** Q01 — scan + project + limit (ref A1/B1: declared field projections,
    * src/main_extractor.py:56-63,346-355). Projection prunes the parquet
    * scan to 2 columns (verify via explain: ReadSchema).
    */
  def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_extendedprice")
      .limit(100)
  }

  /** Q02 — predicate battery (ref B3/B4/B5: watermark + range + set
    * predicates, src/main_extractor.py:42-51,358). All three filters push
    * down to the parquet scan.
    */
  def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1997-01-01").cast(TimestampType) &&
        $"o_totalprice" > 150000.0 &&
        $"o_orderstatus".isin("O", "F") &&
        $"o_orderkey".isNotNull)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate".cast(DateType).as("o_orderdate"),
        $"o_totalprice", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }

  /** Q03 — JSON-in-string projection + cast (ref B2/G11: `creative{id}`
    * nested projection + numeric coercion; `props` mirrors the raw Graph
    * API payloads kept as JSON).
    */
  def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .select($"event_id",
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"),
        $"event_type")
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- C: joins

  /** Q04 — inner equi hash join (ref C1, campaign_inspector.py:221-247). */
  def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
      .limit(1000)
  }

  /** Q05 — broadcast dimension join (ref C2/C3: pixel/creative dict
    * indexes, campaign_inspector.py:210-218). `part`/`supplier` are dims:
    * explicitly broadcast so the fact scan never shuffles.
    */
  def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .groupBy($"p_brand")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        cnt.as("n_items"))
      .orderBy($"p_brand")
  }

  /** Q06 — 5-way hierarchical join (ref C6: report assembly,
    * campaign_inspector.py:250-304). region/nation broadcast; the
    * customer⋈orders⋈lineitem chain shuffles on its keys.
    */
  def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        cnt.as("n_items"))
      .orderBy($"r_name")
  }

  /** Q07 — left outer join keeping zero-match rows (ref C1 `[]`-default
    * semantics: enrich_ad_sets attaches [] when no ads match).
    */
  def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("order_cnt"),
        dsum(coalesce($"o_totalprice", lit(0.0)), 28, 2).as("total_spent"))
      .orderBy($"c_custkey")
  }

  /** Q08a — left-semi join (ref C4: distinct creative ids drive the
    * fetch, src/main_extractor.py:387-406): customers with ≥1 'F' order.
    */
  def q08Semi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter($"o_orderstatus" === "F"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Q08b — left-anti join (ref D5 "missing" lists,
    * api_extractor.py:158-159): parts never ordered.
    */
  def q08Anti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey", "left_anti")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  // ---------------------------------------------------------------- D: aggregations

  /** Q09 — grouped sums + null-safe ratio metrics, TPC-H Q1 shape (ref
    * D1/D3: the insights aggregation, api_extractor.py:79-137 +
    * fields_schema.py:218-233). Partial aggregation (map-side combine) is
    * automatic; decimal accumulation keeps the oracle hash exact.
    */
  def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity", 28, 2).as("sum_qty"),
        dsum($"l_extendedprice", 28, 2).as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .as("sum_charge"),
        dsum($"l_discount", 18, 6).as("sum_disc"),
        cnt.as("count_order"))
    g.select($"l_returnflag", $"l_linestatus", $"sum_qty", $"sum_base_price",
        $"sum_disc_price", $"sum_charge",
        ($"sum_qty" / $"count_order").as("avg_qty"),
        ($"sum_base_price" / $"count_order").as("avg_price"),
        ($"sum_disc" / $"count_order").as("avg_disc"),
        when($"sum_qty" =!= 0.0, $"sum_disc_price" / $"sum_qty").as("rev_per_qty"),
        $"count_order")
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q10 — exact distinct (oracle-checked twin of the approx path; ref
    * D2/D6 reach + dedup-by-id).
    */
  def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type")
      .agg(cnt.as("n_events"), countDistinct($"user_id").as("uniq_users"))
      .orderBy($"event_type")
  }

  /** Q10approx — production path for reach at scale: HLL++
    * `approx_count_distinct` (ref D2, fields_schema.py:219-221). The
    * estimate itself is approximate by design, so the driver-checkable
    * output carries the BOUND, not the value: `approx_ok` asserts the
    * estimate landed within 5% of the exact distinct (2.5× the 2% rsd),
    * which a SQL oracle can hash-match as a constant-true column. The
    * tighter relative-error pin vs exact lives in the test suite;
    * production callers read the estimate directly off the agg.
    */
  def q10Approx(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type")
      .agg(cnt.as("n_events"),
        approx_count_distinct($"user_id", 0.02).as("approx"),
        countDistinct($"user_id").as("exact"))
      .select($"event_type", $"n_events",
        (abs($"approx" - $"exact") <= lit(0.05) * $"exact").as("approx_ok"))
      .orderBy($"event_type")
  }

  /** Q11 — explode → group breakdown agg (ref D4: `actions[]` with
    * action_breakdowns=['action_type'], src/main_extractor.py:453-460).
    */
  def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .groupBy($"word")
      .agg(cnt.as("n"))
      .orderBy($"n".desc, $"word")
      .limit(20)
  }

  /** Q12 — ROLLUP over the ad/adset/campaign-style summary levels (ref
    * D1×3, fields_schema.py:275-300). Grouping-null keys are coalesced to
    * '(all)' so null-ordering differences between engines can't bite.
    */
  def q12Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .rollup($"c_nationkey", $"o_orderpriority")
      .agg(dsum($"o_totalprice", 28, 2).as("total_price"), cnt.as("n_orders"))
      .select(coalesce($"c_nationkey".cast(StringType), lit("(all)")).as("nation"),
        coalesce($"o_orderpriority", lit("(all)")).as("priority"),
        $"total_price", $"n_orders")
      .orderBy($"nation", $"priority")
  }

  /** Q12b — CUBE variant (same contract, all grouping-set combinations). */
  def q12Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .cube($"c_nationkey", $"o_orderstatus")
      .agg(dsum($"o_totalprice", 28, 2).as("total_price"), cnt.as("n_orders"))
      .select(coalesce($"c_nationkey".cast(StringType), lit("(all)")).as("nation"),
        coalesce($"o_orderstatus", lit("(all)")).as("status"),
        $"total_price", $"n_orders")
      .orderBy($"nation", $"status")
  }

  // ---------------------------------------------------------------- E: windows / top-k

  /** Q13 — keep-latest dedup via ranking window (ref E4: creative
    * results dict last-wins, api_extractor.py:167-169): latest order per
    * customer. At 100 TB: partitionBy(custkey) shuffles once on the key;
    * hot-key skew is handled by AQE (no global sort).
    */
  def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast(DateType).as("o_orderdate"),
        $"o_totalprice")
      .orderBy($"o_custkey")
  }

  /** Q14 — RANGE-frame trailing window: 7-day trailing sum per user (ref
    * H2 analog: daily-metrics frames over the insights lake). Ordered by
    * epoch micros so the RANGE bound is a plain numeric interval on both
    * engines; decimal accumulation keeps frame sums exact.
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tsu")
      .rangeBetween(-518400000000L, 0) // 6 days in micros, + current day = 7-day trailing
    events(s, dir)
      .withColumn("tsu", unix_micros($"ts"))
      .withColumn("trailing_sum",
        sum($"value".cast(DecimalType(18, 6))).over(w).cast(DoubleType))
      .select($"event_id", $"user_id", $"trailing_sum")
      .orderBy($"event_id")
  }

  /** Q15 — top-k per group via dense_rank (ref E1/E2 sorted displays):
    * top-3 orders by price per customer.
    */
  def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
    t(s, dir, "orders")
      .withColumn("rnk", dense_rank().over(w).cast(LongType))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rnk")
      .orderBy($"o_custkey", $"rnk", $"o_orderkey")
  }

  // ---------------------------------------------------------------- C-ext: range / as-of joins

  /** Q16 — range/interval join (declared ext.: start/stop-interval
    * semantics of campaign entities, fields_schema.py:29-30): lineitems
    * shipped within 30 days of their order date. Equality key keeps it a
    * hash join (the range predicate is a post-join filter — no cartesian).
    */
  def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .groupBy($"o_orderkey")
      .agg(cnt.as("n_early_items"), dsum($"l_extendedprice", 28, 2).as("early_revenue"))
      .orderBy($"o_orderkey")
  }

  /** Q17 — as-of join: for each purchase event, the most recent click by
    * the same user at-or-before it. Implemented the scalable way: one
    * shuffle on user_id, a running `max(click_ts)` window over the
    * time-ordered union — no per-row subquery, no range explosion.
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, dir)
      .withColumn("click_ts", when($"event_type" === "click", $"ts"))
      .withColumn("last_click_ts", max($"click_ts").over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id",
        date_format($"ts", F6).as("ts"),
        date_format($"last_click_ts", F6).as("last_click_ts"))
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- F: set ops

  /** Q18 — UNION / INTERSECT / EXCEPT over two predicate-defined customer
    * sets (ref F: retry-set subtraction, requested−fetched).
    */
  def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val b = c.filter($"c_acctbal" > 5000.0).select($"c_custkey")
    val u = a.union(b).distinct().select(lit("union").as("op"), $"c_custkey")
    val i = a.intersect(b).select(lit("intersect").as("op"), $"c_custkey")
    val e = a.except(b).select(lit("except").as("op"), $"c_custkey")
    u.union(i).union(e).orderBy($"op", $"c_custkey")
  }

  /** Q19 — dedup keep-latest upsert (ref H5/E4: daily-mode re-fetch
    * overwrites by id keeping the freshest row): per (user_id,
    * event_type) keep the max-ts event.
    */
  def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", date_format($"ts", F6).as("ts"),
        $"value", $"event_id")
      .orderBy($"user_id", $"event_type")
  }

  // ---------------------------------------------------------------- H: windows over event time

  /** Q20 — tumbling 1-day window agg (ref H2: per-day backfill
    * partitions, src/main_extractor.py:438-508).
    */
  def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(cnt.as("n"), dsum($"value", 18, 6).as("sum_value"))
      .select($"w.start".cast(DateType).as("day"), $"event_type", $"n", $"sum_value")
      .orderBy($"day", $"event_type")
  }

  /** Q21 — sliding window agg: 1-hour windows every 30 minutes. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(cnt.as("n"), dsum($"value", 18, 6).as("sum_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"window_start", $"event_type")
  }

  /** Q22 — session windows with a 30-minute gap per user (ref H1
    * incremental sessions; `session_window` is the same operator the
    * streaming path uses, so batch and stream share semantics).
    */
  def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(cnt.as("n_events"), dsum($"value", 18, 6).as("sum_value"))
      .select($"user_id", date_format($"sw.start", F6).as("session_start"),
        date_format($"sw.end", F6).as("session_end"), $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start")
  }

  // ---------------------------------------------------------------- G: scalar batteries

  /** Q23 — sanitize battery (G1/G3/G4/G7/G8/G13/G14/G26) applied to
    * strings derived from `orders`, so the DuckDB oracle can compute the
    * expected value directly from the source columns.
    */
  def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    UnicodeUnescape.register(s)
    // take the checked 1000 rows FIRST (TakeOrdered on the key), then
    // apply the expensive multi-format parse battery to 1000 rows
    // instead of the whole table — same result, ~30x less parse work
    val o = t(s, dir, "orders").orderBy($"o_orderkey").limit(1000)
    val iso0000 = date_format($"o_orderdate", "yyyy-MM-dd'T'HH:mm:ssZ")    // +0000
    val plain = date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss")
    // o_orderdate reads as TIMESTAMP_NTZ; unix_seconds needs TIMESTAMP
    // (session TZ is pinned UTC, so the cast is wall-clock-identity).
    val epochS = unix_seconds($"o_orderdate".cast(TimestampType)).cast(StringType)
    val boolSrc = when($"o_orderstatus" === "O", lit("yes"))
      .when($"o_orderstatus" === "F", lit("0")).otherwise(lit("TRUE"))
    val csv = concat($"o_orderpriority", lit(", "), $"o_orderstatus", lit(", ,x"))
    val jsonList = concat(lit("[\"a\",\""), $"o_orderstatus", lit("\"]"))
    val capSrc = when($"o_orderstatus" === "O", lit("0"))
      .when($"o_orderstatus" === "F", lit("")).otherwise($"o_totalprice".cast(StringType))
    o.select(
        $"o_orderkey",
        Sanitize.parsePositiveAmount($"o_totalprice".cast(StringType)).as("money_minor"),
        Sanitize.normalizeAccountId($"o_custkey".cast(StringType)).as("acct"),
        Sanitize.normalizeAccountId(concat(lit("act_"), $"o_custkey")).as("acct_pre"),
        Sanitize.isoFormat(Sanitize.parseDatetime(iso0000)).as("ts_iso_a"),
        Sanitize.isoFormat(Sanitize.parseDatetime(plain)).as("ts_iso_b"),
        Sanitize.isoFormat(Sanitize.parseDatetime(epochS)).as("ts_iso_c"),
        Sanitize.parseBool(boolSrc).as("flag"),
        array_join(Sanitize.normalizeStringCollection(csv), "|").as("list_csv"),
        array_join(Sanitize.normalizeStringCollection(jsonList), "|").as("list_json"),
        Sanitize.normalizeSpendCap(capSrc).as("spend_cap"),
        UnicodeUnescape.unicodeUnescape(concat(lit("\\u0041_"), $"o_orderstatus"))
          .as("unescaped"))
      .orderBy($"o_orderkey")
      .limit(1000)
  }

  /** Q24 — builtin scalar battery: string / math / date functions over
    * lineitem (ref G: the general coercion+formatting surface).
    */
  def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // TakeOrdered on the (unique) sort key FIRST, so the scalar battery
    // runs on 2000 rows, not the whole table (same result — the battery
    // is row-local; same trick as Q23).
    t(s, dir, "lineitem")
      .orderBy($"l_orderkey", $"l_linenumber")
      .limit(2000)
      .select(
        $"l_orderkey", $"l_linenumber".cast(LongType).as("l_linenumber"),
        upper(concat($"l_returnflag", lit("_"), $"l_linestatus")).as("flag_status"),
        substring(concat($"l_returnflag", $"l_linestatus"), 1, 1).as("first_char"),
        trim(concat(lit("  "), $"l_returnflag", lit("  "))).as("trimmed"),
        $"l_returnflag".rlike("^[AR]$").as("is_ar"),
        round($"l_extendedprice" / 7.0, 2).as("price_div7"),
        abs($"l_discount" - 0.05).as("disc_dev"),
        greatest($"l_quantity", $"l_discount" * 100.0).as("g"),
        least($"l_tax", $"l_discount").as("le"),
        date_trunc("month", $"l_shipdate").cast(DateType).as("ship_month"),
        datediff($"l_shipdate", lit("1995-01-01").cast(DateType)).cast(LongType)
          .as("days_since"),
        add_months($"l_shipdate", 2).as("ship_plus2m"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ---------------------------------------------------------------- north star: text / vector

  /** Q25 — text analysis per language: doc counts, avg length, distinct
    * vocabulary, top term.
    *
    * One pass over the exploded words: (lang, word) counts feed BOTH
    * the vocabulary size (count of distinct pairs per lang) and the top
    * term (argmin of (-c, word), i.e. highest count with lexicographic
    * tie-break) from a single grouped frame — the r03 form scanned and
    * exploded `documents` once per consumer because exchanges aren't
    * reused across consumers (VERDICT r03 "What's wrong" #3).
    */
  def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val wc = d.select($"lang", explode(split($"text", " ")).as("word"))
      .groupBy($"lang", $"word").agg(cnt.as("c"))
    val perLang = wc.groupBy($"lang").agg(
      cnt.as("distinct_words"),
      min_by($"word", struct((-$"c").as("nc"), $"word")).as("top_term"))
    val agg = d.groupBy($"lang").agg(cnt.as("docs"),
      (sum($"n_chars").cast(DoubleType) / cnt).as("avg_chars"))
    agg.join(perLang, Seq("lang"))
      .select($"lang", $"docs", $"avg_chars", $"distinct_words", $"top_term")
      .orderBy($"lang")
  }

  /** Q26 — vector centroid per label via posexplode + exact decimal mean.
    * (The typed `Aggregator` path is `q26_centroid_agg` — rows-only
    * checked since float-sum order differs by design.)
    */
  def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg((sum($"v".cast(DoubleType).cast(DecimalType(30, 12))).cast(DoubleType) / cnt)
        .as("centroid"))
      .select($"label", ($"pos" + 1).cast(LongType).as("dim"), $"centroid")
      .orderBy($"label", $"dim")
  }

  /** Q26b — brute-force cosine top-5 against a fixed probe vector
    * (vec_id 0). Probe-vs-all is the correct baseline; pairwise
    * similarity at scale goes through the LSH-bucketed path (Extras).
    * Dot products accumulate in DECIMAL so the oracle hash is exact.
    */
  def q26b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expressions.DecimalDot.register(s)
    val e = t(s, dir, "embeddings")
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("n1", graft.functions.VectorFns.dotDec("v", "v")) // norm once per vector
    val probe = e.filter($"vec_id" === 0).select($"v".as("p"), $"n1".as("n2"))
    e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("dot", graft.functions.VectorFns.dotDec("v", "p"))
      .select($"vec_id", ($"dot" / (sqrt($"n1") * sqrt($"n2"))).as("cosine"))
      .orderBy($"cosine".desc, $"vec_id")
      .limit(5)
  }

  /** Q27 — near-duplicate detection: token-set Jaccard ≥ 0.9 via the
    * adaptive exact set-similarity join
    * ([[graft.operators.SetSimilarityJoin]]): bitset + size-filter
    * strategy for ≤64-token vocabularies, shared-token candidate join
    * otherwise. Never a cartesian. At 100 TB with open vocabulary the
    * scale path is MinHash/LSH banding (Extras x02) with this operator
    * as the exact verifier.
    */
  def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("tok")).distinct()
    // only two consumers (vocab probe + mask aggregate) — unlike the
    // 12-consumer shingle index in x04, persisting here costs more in
    // materialization than the one saved recompute
    graft.operators.SetSimilarityJoin.jaccardSelfJoin(toks, 0.9)
      .orderBy($"d1", $"d2")
  }

  /** Q28 — streaming ≡ batch equivalence: Q20's tumbling-day aggregation
    * executed through Structured Streaming (file source, watermark,
    * memory sink, AvailableNow-style synchronous drain). Oracle = the
    * batch Q20 SQL.
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = t(s, dir, "events").schema // ts as raw nanos or NTZ micros
    val name = "q28_sink_" + System.nanoTime()
    val stream = normalizeTs(s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .parquet(dir))
    val agg = stream
      .withWatermark("ts", "1 day")
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(cnt.as("n"), sum($"value".cast(DecimalType(18, 6))).as("sv"))
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try { q.processAllAvailable() } finally { q.stop() }
    // copy out + drop the per-invocation temp view (same discipline as
    // x69: Bench re-invokes each key, and leaked MemorySinks live for
    // the whole session); the copy is one row per (day, event_type)
    val drained = s.table(name)
    val local = s.createDataFrame(
      java.util.Arrays.asList(drained.collect(): _*), drained.schema)
    s.catalog.dropTempView(name)
    local
      .select($"w.start".cast(DateType).as("day"), $"event_type", $"n",
        $"sv".cast(DoubleType).as("sum_value"))
      .orderBy($"day", $"event_type")
  }
}
