package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Det, Tables}

/** The relational operator spine (SURVEY.md §2.2–§2.7): projections,
  * filters, joins, aggregations, windows, sorts/limits, set ops — expressed
  * as declarative DataFrame plans so Catalyst provides pushdown, pruning,
  * join selection, and whole-stage codegen.
  *
  * Scale notes (100 TB thinking, per query):
  *  - dimension joins (`nation`, `region`, filtered `customer`) are
  *    explicitly `broadcast()` — no shuffle of the fact side;
  *  - aggregates are map-side partial by construction (`groupBy.agg`);
  *  - sorts that feed a LIMIT become `TakeOrderedAndProject` (no global
  *    sort materialization);
  *  - every float aggregate is rounded in BOTH the Spark plan and the
  *    DuckDB oracle (summation order differs across engines), using the
  *    IEEE-portable floor form from [[graft.Det]] — never `round()`,
  *    whose half-boundary semantics are engine-specific.
  */
object RelationalQueries {

  /** Deterministic tiebreak: every ORDER BY ends in a unique key column so
    * hash-compare against the oracle is stable. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A3: group-by aggregate with multiple agg functions (TPC-H Q1 shape).
    "q1_agg" -> ((s, d) => {
      // Exact integer sums (scale-determinism, round 19): a double SUM
      // over millions of rows carries partition-order noise of hundreds
      // of ulps, and at sf10 sum_base_price landed ON a penny rounding
      // boundary — even DuckDB's own parallel sum flipped between .99
      // and .00 across runs, so rounding the FP sum is nondeterministic
      // on BOTH engines. The source columns sit on fixed decimal grids
      // by construction (prices 2-dec, discounts and their products
      // <=4-dec), so the per-row floor(x*10^k + 0.5) is a LOSSLESS
      // re-quantization (the Det contract: bit-identical per-row IEEE
      // ops on both engines), the BIGINT sum is exact at any scale and
      // partition order (< 2^53 through sf100), and the single final
      // division + Det.r round is deterministic. This is the "prefer
      // exact integer sums" rule — per-row VALUES are unchanged, only
      // the summation domain moves from float to int.
      val qty100 = sum(floor(col("l_quantity") * 100 + lit(0.5)))
      val cents = sum(floor(col("l_extendedprice") * 100 + lit(0.5)))
      val disc4 = sum(floor(col("l_extendedprice") *
        (lit(1) - col("l_discount")) * 10000 + lit(0.5)))
      val d4 = sum(floor(col("l_discount") * 10000 + lit(0.5)))
      val n = count(lit(1))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.r(qty100 / 100.0, 2).as("sum_qty"),
          Det.r(cents / 100.0, 2).as("sum_base_price"),
          Det.r(disc4 / 10000.0, 2).as("sum_disc_price"),
          Det.r(qty100 / 100.0 / n, 4).as("avg_qty"),
          Det.r(d4 / 10000.0 / n, 4).as("avg_disc"),
          n.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1/P2: projection + predicate passthrough (filter pushed to parquet).
    "q2_filter_project" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0)
        // raw product, deliberately un-rounded: IEEE double multiply is
        // bit-identical across engines, while round() half-boundary
        // semantics are not (DuckDB rounds via decimal repr).
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 0.9).as("discounted"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // J: fact-dim join chain; dims broadcast (no fact shuffle until the agg).
    "q3_join_agg" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      Tables.orders(s, d)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          Det.r(sum(col("o_totalprice")), 2).as("total_revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // O1/O3: top-k — Catalyst plans TakeOrderedAndProject, not a global sort.
    "q4_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
    }),

    // W1: window functions with deterministic ordering.
    "q5_window" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          row_number().over(w).as("order_seq"),
          Det.r(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"))
        .filter(col("order_seq") <= 3)
        .orderBy(col("o_custkey"), col("order_seq"))
    }),

    // Distinct aggregation.
    "q6_distinct" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // §2.7: UNION ALL of scalar counts (cookbook cell 24 shape, A9).
    "q7_union_counts" -> ((s, d) => {
      val c = Tables.customer(s, d).agg(count(lit(1)).as("n"))
        .select(lit("customer").as("tbl"), col("n"))
      val o = Tables.orders(s, d).agg(count(lit(1)).as("n"))
        .select(lit("orders").as("tbl"), col("n"))
      val l = Tables.lineitem(s, d).agg(count(lit(1)).as("n"))
        .select(lit("lineitem").as("tbl"), col("n"))
      c.union(o).union(l).orderBy(col("tbl"))
    }),

    // Semi join (EXISTS): customers having at least one open order.
    "q8_semijoin" -> ((s, d) => {
      val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      Tables.customer(s, d)
        .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Anti join (NOT EXISTS): customers with no orders at all.
    "q9_antijoin" -> ((s, d) => {
      val o = Tables.orders(s, d)
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // O2: LIMIT/OFFSET pagination (deterministic order key).
    "q10_pagination" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
        .offset(50).limit(20)
    }),

    // CASE WHEN bucketing + aggregate.
    "q11_case_buckets" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          Det.r(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy(col("bucket"))
    }),

    // Date/time grouping: monthly revenue (UTC session timezone both sides).
    "q12_monthly" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          Det.r(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("month"))
    }),

    // HAVING: post-aggregation filter.
    "q13_having" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(Det.r(sum(col("l_quantity")), 2).as("total_qty"),
          count(lit(1)).as("n_items"))
        .filter(col("n_items") > 30)
        .orderBy(col("l_suppkey"))
    }),

    // Correlated-style per-group top-1 via window (J4's relational analogue).
    "q14_latest_order" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_custkey"))
    }),

    // Multi-way fact join: lineitem ⋈ orders ⋈ part with selective filters.
    "q15_fact_join" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_size") >= 40)
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(Det.r(sum(col("l_extendedprice")), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    }),

    // lead/lag window navigation (raw doubles pass through unrounded —
    // per-row values hash identically).
    "q17_leadlag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ROLLUP hierarchy totals (exact counts; NULL subtotal keys hash as
    // NULL on both sides).
    "q18_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }),

    // Batch sessionization via window composition (lag -> gap flag ->
    // running sum = session id -> per-session aggregate): the SQL-
    // expressible twin of the streaming flatMapGroupsWithState operator.
    "q19_sessions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).cast("long").as("start_s"))
        .orderBy(col("user_id"), col("sess_id"))
    }),

    // Point-in-time (as-of) join: each purchase matched to the same
    // user's most recent preceding click ([[graft.joins.AsOfJoin]] —
    // union + ordered window, ONE shuffle, no range explosion). Gate
    // slice `user_id < 1e8` is a no-op on the base corpus and holds the
    // oracle's per-probe LATERAL cost flat on the key-shifted scale
    // corpora (the doc_pii pattern); the operator itself is the plan
    // users run unsliced.
    "q20_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") < 100000000L)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.joins.AsOfJoin.backward(purchases, clicks,
          key = "user_id", probeTime = "ts", refTime = "ts",
          refPayload = Seq(col("event_id").as("click_id"),
            col("ts").as("click_ts")),
          refTiebreak = col("event_id"))
        .withColumn("gap_s",
          col("ts").cast("long") - col("click_ts").cast("long"))
        .orderBy(col("event_id"))
    }),

    // Event-time tumbling aggregation expressed in batch (streaming parity
    // uses the same plan via readStream; see streaming package).
    "q16_event_windows" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          Det.r(sum(col("value")), 4).as("total_value"))
        .orderBy(col("win_start"), col("event_type"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         floor((sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0)
           * 100.0 + 0.5) / 100.0 AS sum_qty,
         floor((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
           / 100.0) * 100.0 + 0.5) / 100.0 AS sum_base_price,
         floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000
           + 0.5) AS BIGINT)) / 10000.0) * 100.0 + 0.5) / 100.0
           AS sum_disc_price,
         floor((sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0
           / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
         floor((sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT))
           / 10000.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT o_orderkey, o_custkey,
         o_totalprice * 0.9 AS discounted, o_orderpriority
         FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
         ORDER BY o_orderkey""",
    "q3_join_agg" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q4_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""",
    "q5_window" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, order_seq, running_total
         FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
             row_number() OVER w AS order_seq,
             floor((sum(o_totalprice) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * 100.0 + 0.5) / 100.0 AS running_total
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ) t WHERE order_seq <= 3
         ORDER BY o_custkey, order_seq""",
    "q6_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
         count(*) AS n_customers
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q7_union_counts" ->
      """SELECT * FROM (
           SELECT 'customer' AS tbl, count(*) AS n FROM customer
           UNION ALL SELECT 'orders', count(*) FROM orders
           UNION ALL SELECT 'lineitem', count(*) FROM lineitem
         ) ORDER BY tbl""",
    "q8_semijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         ORDER BY c_custkey""",
    "q9_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q10_pagination" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         ORDER BY p_partkey LIMIT 20 OFFSET 50""",
    "q11_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket,
         count(*) AS n,
         floor((avg(o_totalprice)) * 100.0 + 0.5) / 100.0 AS avg_price
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "q12_monthly" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         count(*) AS n_orders,
         floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue
         FROM orders GROUP BY 1 ORDER BY month""",
    "q13_having" ->
      """SELECT l_suppkey,
         floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS total_qty,
         count(*) AS n_items
         FROM lineitem GROUP BY l_suppkey HAVING count(*) > 30
         ORDER BY l_suppkey""",
    "q14_latest_order" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey""",
    "q15_fact_join" ->
      """SELECT p_brand,
         floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS revenue,
         count(*) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
         JOIN part ON l_partkey = p_partkey AND p_size >= 40
         GROUP BY p_brand ORDER BY p_brand""",
    "q17_leadlag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q18_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
         FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""",
    "q19_sessions" ->
      """WITH o AS (
           SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
           FROM events),
         f AS (
           SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800
               THEN 1 ELSE 0 END AS new_sess
           FROM o),
         s AS (
           SELECT user_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS sess_id
           FROM f)
         SELECT user_id, sess_id, count(*) AS n_events,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s
         FROM s GROUP BY 1, 2 ORDER BY user_id, sess_id""",
    "q20_asof_join" ->
      """WITH ev AS (SELECT * FROM events WHERE user_id < 100000000),
         p AS (SELECT event_id, user_id, ts FROM ev
               WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts,
           CAST(floor(epoch(p.ts)) AS BIGINT)
             - CAST(floor(epoch(c.click_ts)) AS BIGINT) AS gap_s
         FROM p LEFT JOIN LATERAL (
           SELECT event_id AS click_id, ts AS click_ts FROM ev c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND c.ts <= p.ts
           ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE
         ORDER BY p.event_id""",
    "q16_event_windows" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
         count(*) AS n,
         floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
         FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""")
}
