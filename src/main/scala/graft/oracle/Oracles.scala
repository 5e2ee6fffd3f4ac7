package graft.oracle

/** DuckDB oracle SQL for every oracle-checkable query in
  * graft.SparkEntry.queries. Table names are bare (`lineitem`, …) — the
  * driver materializes each parquet table under its name.
  *
  * Parity rules (why these strings look the way they do):
  *  - decimal-grid columns (money/quantity) sum as exact DECIMAL then
  *    CAST to DOUBLE — order-independent at any group size; non-grid
  *    doubles in bounded groups use `round(sum(..), 4)`, which absorbs
  *    summation-order ULP noise while groups stay small;
  *  - avg is written sum/count over the exact sum — division of
  *    identical doubles is deterministic, engine `avg` internals are not;
  *  - counts are BIGINT on both engines; DuckDB `sum(int)` would be
  *    HUGEINT so integer sums are cast;
  *  - vector math (see Similarity/Dedup oracles) uses index-ordered
  *    list_reduce so double accumulation is bit-identical to Spark's
  *    left-fold `aggregate()`.
  */
object Oracles {

  val wordcount: String =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(lower(text), '[ \t]')) AS word FROM documents)
      |GROUP BY word ORDER BY word""".stripMargin

  val mrWordcount: String = wordcount

  def grep(query: String): String =
    s"""SELECT text FROM documents
       |WHERE length(trim(text)) > 0 AND contains(lower(text), '${query.toLowerCase}')
       |ORDER BY text""".stripMargin

  val q1PricingSummary: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q2FilterPushdown: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_quantity < 10.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val q3SegmentRevenue: String =
    """SELECT c_mktsegment, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val q4RegionRevenue: String =
    """SELECT n_name, CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  val q5SemiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  val q6AntiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  val q7DistinctCounts: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val q8TopK: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  val q9Union: String =
    """SELECT count(*) AS n_rows, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total FROM (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0
      |)""".stripMargin

  val q10WindowRank: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  val q11WindowRunning: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  val q12ScalarFuncs: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  upper(substr(o_orderpriority, 1, 1)) AS pri1,
      |  CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
      |  o_orderstatus || '|' || o_orderpriority AS status_pri,
      |  round(sqrt(o_totalprice), 6) AS sqrt_price,
      |  round(o_totalprice * 0.07, 4) AS tax,
      |  round(abs(o_totalprice - 250000.0), 4) AS dist_mid
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val q13Rollup: String =
    """SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val q14Cube: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  val q24SetOps: String =
    """WITH urgent AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |big AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0),
      |labeled AS (
      |  SELECT 'urgent_and_big' AS bucket, o_orderkey FROM (SELECT o_orderkey FROM urgent INTERSECT SELECT o_orderkey FROM big)
      |  UNION ALL
      |  SELECT 'urgent_only' AS bucket, o_orderkey FROM (SELECT o_orderkey FROM urgent EXCEPT SELECT o_orderkey FROM big))
      |SELECT bucket, count(*) AS n_orders, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM labeled GROUP BY bucket ORDER BY bucket""".stripMargin

  val q23KmvDistinct: String =
    s"""WITH h AS (SELECT DISTINCT l_returnflag,
       |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) AS h
       |  FROM lineitem),
       |r AS (SELECT l_returnflag, h,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM h),
       |agg AS (SELECT l_returnflag, max(h) AS kth, count(*) AS k_seen FROM r
       |  WHERE rn <= ${graft.queries.Relational.KmvK} GROUP BY 1)
       |SELECT l_returnflag,
       |  CAST(floor(CASE WHEN k_seen < ${graft.queries.Relational.KmvK} THEN CAST(k_seen AS DOUBLE)
       |       ELSE ${(graft.queries.Relational.KmvK - 1).toDouble} * 4294967296.0 / greatest(kth, 1) END) AS BIGINT) AS est_parts
       |FROM agg ORDER BY l_returnflag""".stripMargin

  val q25GroupingSets: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Epoch-day subtraction yields the same integer order key in both
    * engines (order dates are midnight-aligned), so the value-based
    * RANGE frame covers identical peer sets.
    */
  val q26RangeFrame: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_7d
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  val q15MaxPerGroup: String =
    """SELECT p_brand, p_partkey, p_retailprice FROM part
      |WHERE p_retailprice = (SELECT max(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand)
      |ORDER BY p_brand, p_partkey""".stripMargin

  val q16Pivot: String =
    """SELECT user_id,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val q17JsonExtract: String =
    """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
      |  count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  val q18CollectList: String =
    """SELECT o_custkey,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  val q19LagLead: String =
    """WITH cuts AS (SELECT quantile_cont(o_totalprice, 0.25) AS c1,
      |  quantile_cont(o_totalprice, 0.50) AS c2,
      |  quantile_cont(o_totalprice, 0.75) AS c3 FROM orders)
      |SELECT o_custkey, o_orderkey,
      |  round(lag(o_totalprice, 1) OVER w, 4) AS prev_price,
      |  round(lead(o_totalprice, 1) OVER w, 4) AS next_price,
      |  CAST(1 + (CASE WHEN o_totalprice > c1 THEN 1 ELSE 0 END)
      |         + (CASE WHEN o_totalprice > c2 THEN 1 ELSE 0 END)
      |         + (CASE WHEN o_totalprice > c3 THEN 1 ELSE 0 END) AS BIGINT) AS price_quartile
      |FROM orders, cuts WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** The bucketed layout changes the physical plan, not the result — the
    * oracle is the plain join over the source tables.
    */
  val q22BucketedJoin: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val q20Percentiles: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
      |  round(min(l_extendedprice), 4) AS min_price,
      |  round(max(l_extendedprice), 4) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The sketch-bound booleans are literal TRUE: the oracle's power is
    * the invariant itself — if Spark's sketch estimate leaves its bound,
    * the Spark side computes FALSE and the hash goes red.
    */
  val q21SketchGate: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS parts_in_bound,
      |  TRUE AS orders_in_bound,
      |  TRUE AS median_in_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val eventsAsof: String =
    """SELECT c.event_id, c.user_id, p.ts AS purchase_ts, p.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  val eventsRangeJoin: String =
    """SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
      |  CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS dt_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
      | AND b.ts - a.ts <= INTERVAL 5 MINUTE
      |ORDER BY id_a, id_b""".stripMargin

  val eventsTumbling: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  /** Gap-filled 15-min resample: same integer-µs bucket keys, dense
    * (type × bucket-range) grid, zero-filled left join.
    */
  /** Replays the funnel's chained filtered min-aggregations — stage
    * boundaries are strict (>), so identical timestamps at a boundary
    * don't advance the funnel on either engine.
    */
  val eventsFunnel: String =
    """WITH v AS (SELECT user_id, min(ts) AS first_view_ts
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS first_click_ts
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.first_view_ts GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS first_purchase_ts
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.first_click_ts GROUP BY 1)
      |SELECT v.user_id, v.first_view_ts, c.first_click_ts, p.first_purchase_ts,
      |  CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |         + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage
      |FROM v LEFT JOIN c ON c.user_id = v.user_id LEFT JOIN p ON p.user_id = v.user_id
      |ORDER BY v.user_id""".stripMargin

  val eventsResample: String =
    """WITH e AS (SELECT event_type, (epoch_us(ts) // 900000000) * 900000000 AS b, value FROM events),
      |agg AS (SELECT event_type, b, count(*) AS n, round(sum(value), 4) AS sv FROM e GROUP BY 1, 2),
      |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM e),
      |grid AS (SELECT t.event_type, g.b
      |  FROM (SELECT DISTINCT event_type FROM e) t, bounds, unnest(generate_series(lo, hi, 900000000)) AS g(b))
      |SELECT grid.event_type, make_timestamp(grid.b) AS bucket_start,
      |  coalesce(agg.n, 0) AS n_events, coalesce(agg.sv, 0.0) AS sum_value
      |FROM grid LEFT JOIN agg ON agg.event_type = grid.event_type AND agg.b = grid.b
      |ORDER BY 1, 2""".stripMargin

  /** Session windows: new session when the gap to the previous event of
    * the same user is >= 30 min (matches Spark session_window, whose
    * window end is last_ts + gap, exclusive).
    */
  /** Each event expands to its two containing 30-min-aligned hour
    * windows (k = 0, 1), matching Spark's window(ts, 1h, 30m) exactly.
    */
  val eventsHopping: String =
    """WITH h AS (SELECT event_type, value,
      |    make_timestamp((epoch_us(ts) // 1800000000 - k.k) * 1800000000) AS hop_start
      |  FROM events, (SELECT unnest(generate_series(0, 1)) AS k) k)
      |SELECT hop_start, event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val eventsSessions: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM ordered
      |)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM numbered GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** Ranking suite: rank-family ties resolve identically on equal spend;
    * ntile's window has a custkey tiebreak for a total order. Fractions
    * use the floor-based half-up 6dp guard (see round6 rationale).
    */
  val q27WindowSuite: String =
    """WITH spend AS (
      |  SELECT o_custkey AS custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY 1),
      |j AS (SELECT c_mktsegment, custkey, spend
      |  FROM spend JOIN customer ON custkey = c_custkey)
      |SELECT c_mktsegment, custkey, spend,
      |  CAST(rank() OVER ws AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER ws AS BIGINT) AS drnk,
      |  floor((percent_rank() OVER ws) * 1e6 + 0.5) / 1e6 AS prnk,
      |  floor((cume_dist() OVER ws) * 1e6 + 0.5) / 1e6 AS cdist,
      |  CAST(ntile(4) OVER wt AS BIGINT) AS quartile
      |FROM j
      |WINDOW ws AS (PARTITION BY c_mktsegment ORDER BY spend DESC),
      |       wt AS (PARTITION BY c_mktsegment ORDER BY spend DESC, custkey)
      |ORDER BY c_mktsegment, custkey""".stripMargin

  /** Correlated scalar subquery, verbatim semantics (DuckDB decorrelates
    * the same way); the threshold compares identical exact-sum/count
    * doubles on both engines.
    */
  val q29ScalarSubquery: String =
    """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice > 2 * (
      |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_custkey, o.o_orderkey""".stripMargin

  /** MERGE/upsert replay: the same deterministic change feed (key mod
    * classes, disjoint; inserts map k → -(k+1), collision-free even for
    * key 0) applied with a left join + anti-filter + union.
    * DECIMAL × DECIMAL is exact on both engines.
    */
  val q30MergeUpsert: String =
    """WITH snap AS (SELECT o_orderkey AS k, o_custkey, o_totalprice, o_orderstatus FROM orders),
      |upd AS (SELECT k, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 1.10 AS DOUBLE) AS new_price
      |  FROM snap WHERE k % 5 = 0),
      |del AS (SELECT k FROM snap WHERE k % 5 <> 0 AND k % 7 = 0),
      |kept AS (
      |  SELECT s.k, s.o_custkey, coalesce(u.new_price, s.o_totalprice) AS o_totalprice,
      |    s.o_orderstatus
      |  FROM snap s LEFT JOIN upd u ON s.k = u.k
      |  WHERE NOT EXISTS (SELECT 1 FROM del d WHERE d.k = s.k)),
      |ins AS (SELECT -(k + 1) AS k, o_custkey, o_totalprice, o_orderstatus FROM snap WHERE k % 11 = 0)
      |SELECT * FROM kept UNION ALL SELECT * FROM ins ORDER BY k""".stripMargin

  /** Partition pruning replay: the partitioned layout changes I/O, not
    * semantics — the oracle is the plain year-filtered aggregate.
    */
  val q31PartitionPruning: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders WHERE year(o_orderdate) = 1997
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Window top-k replay: identical row_number spec with the orderkey
    * tie-break, so the selected rows are a total order on both engines.
    */
  val q34WindowTopK: String = {
    import graft.queries.Relational.WindowTopK
    s"""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
       |  SELECT o_custkey, o_orderkey, o_totalprice,
       |    CAST(row_number() OVER (
       |      PARTITION BY o_custkey
       |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
       |  FROM orders)
       |WHERE rn <= $WindowTopK
       |ORDER BY o_custkey, rn""".stripMargin
  }

  /** Dynamic-partition-pruning replay: the oracle recomputes the
    * calendar dim from the orders date domain and runs the same
    * dim-filtered star join — DPP changes which partitions are READ,
    * never the result.
    */
  val q33DynamicPruning: String = {
    import graft.queries.Relational.DppEpoch
    s"""WITH cal AS (
       |  SELECT DISTINCT year(o_orderdate) AS cal_year,
       |    CASE WHEN year(o_orderdate) BETWEEN 1997 AND 1999 THEN 'late90s'
       |         WHEN year(o_orderdate) < 1997 THEN 'mid90s'
       |         ELSE '2000s' END AS epoch_label
       |  FROM orders)
       |SELECT o_orderpriority, count(*) AS n_orders,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM orders JOIN cal ON year(o_orderdate) = cal_year
       |WHERE epoch_label = '$DppEpoch'
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** sql_q33_window replay: the IDENTICAL SQL body the engine parses
    * (`Relational.SqlQ33WindowBody` verbatim), with a raw-table CTE
    * preamble standing in for the engine's partitioned-fact and
    * calendar-dim views — the views are engine artifacts; their
    * CONTENT is exactly these derivations of `orders`.
    */
  val sqlQ33Window: String =
    s"""WITH orders_by_year AS (SELECT o.*, year(o_orderdate) AS o_year FROM orders o),
       |calendar AS (
       |  SELECT DISTINCT year(o_orderdate) AS cal_year,
       |    CASE WHEN year(o_orderdate) BETWEEN 1997 AND 1999 THEN 'late90s'
       |         WHEN year(o_orderdate) < 1997 THEN 'mid90s'
       |         ELSE '2000s' END AS epoch_label
       |  FROM orders)
       |${graft.queries.Relational.SqlQ33WindowBody}""".stripMargin

  /** UNPIVOT replay as the portable long-form UNION ALL. */
  val q28Unpivot: String =
    """WITH long AS (
      |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
      |SELECT measure, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
      |FROM long GROUP BY 1 ORDER BY 1""".stripMargin

  /** Fixed-point integer PageRank replay: identical integer recurrence
    * (truncating div on non-negative operands ≡ DuckDB `//`), chained
    * one CTE per iteration. The HUGEINT sum casts back to BIGINT.
    */
  def graphPagerank(iterations: Int, scale: Long): String = {
    val teleport = 15L * scale / 100L
    val iters = (1 to iterations)
      .map { i =>
        s"""r$i AS (SELECT n.node,
           |  CAST($teleport + (85 * coalesce(c.in_sum, 0)) // 100 AS BIGINT) AS rank
           |  FROM n LEFT JOIN (
           |    SELECT e.dst, CAST(sum(r.rank // deg.d) AS BIGINT) AS in_sum
           |    FROM e JOIN r${i - 1} r ON e.src = r.node JOIN deg ON deg.src = e.src
           |    GROUP BY e.dst) c ON c.dst = n.node)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH raw AS (SELECT DISTINCT o_custkey AS c, -(l_suppkey + 1) AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT c AS src, s AS dst FROM raw UNION ALL SELECT s, c FROM raw),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |n AS (SELECT DISTINCT src AS node FROM e),
       |r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank FROM n),
       |$iters
       |SELECT node, rank FROM r$iterations ORDER BY node""".stripMargin
  }

  /** Weekly cohort retention over epoch-aligned integer-µs week buckets
    * (the resample convention — no date_trunc dialect risk).
    */
  val eventsRetention: String =
    """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |c AS (SELECT user_id, min(wk) AS cwk FROM a GROUP BY 1),
      |s AS (SELECT cwk, count(*) AS cohort_size FROM c GROUP BY 1),
      |r AS (SELECT c.cwk, a.wk - c.cwk AS week_offset, count(*) AS n_active
      |  FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2)
      |SELECT make_timestamp(r.cwk * 604800000000) AS cohort_start, r.week_offset,
      |  r.n_active, s.cohort_size,
      |  floor((CAST(r.n_active AS DOUBLE) / s.cohort_size) * 1e6 + 0.5) / 1e6 AS retention
      |FROM r JOIN s ON r.cwk = s.cwk
      |ORDER BY 1, 2""".stripMargin

  /** Replays the transition ranking: identical per-user
    * (epoch-µs, event_id) lead order, exact integer counts, same
    * (count DESC, from, to) top-K cut.
    */
  def eventsTopPaths(k: Int): String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu, event_type FROM events),
       |nx AS (SELECT event_type AS from_type,
       |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS to_type
       |  FROM e),
       |t AS (SELECT from_type, to_type, count(*) AS n_transitions
       |  FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
       |SELECT from_type, to_type, n_transitions FROM t
       |ORDER BY n_transitions DESC, from_type, to_type LIMIT $k""".stripMargin

  /** Replays z-score anomaly detection: identical fixed-point value
    * scaling, exact integer window sums over the identical
    * (epoch-µs, event_id) frame order — integer sums are immune to the
    * engines' differing sliding-frame summation strategies — and the
    * identical double op sequence for mean/var/z. DuckDB's HUGEINT
    * window sums cast back to BIGINT before the double math.
    */
  def eventsAnomaly(window: Int, minPrior: Int, zThreshold: Double, scale: Double): String =
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tu,
       |    CAST(floor(value * $scale + 0.5) AS BIGINT) AS v FROM events),
       |st AS (SELECT event_id, user_id, v,
       |    CAST(count(v) OVER w AS BIGINT) AS n_prior,
       |    CAST(sum(v) OVER w AS BIGINT) AS s,
       |    CAST(sum(v * v) OVER w AS BIGINT) AS ss
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
       |    ROWS BETWEEN $window PRECEDING AND 1 PRECEDING)),
       |m AS (SELECT *, CAST(s AS DOUBLE) / CAST(n_prior AS DOUBLE) AS mean FROM st),
       |vr AS (SELECT *, CAST(ss AS DOUBLE) / CAST(n_prior AS DOUBLE) - mean * mean AS varr
       |  FROM m WHERE n_prior >= $minPrior),
       |z AS (SELECT *, (CAST(v AS DOUBLE) - mean) / sqrt(varr) AS zval
       |  FROM vr WHERE varr > 0)
       |SELECT event_id, user_id, v AS value_scaled, n_prior,
       |  floor(zval * 1e6 + 0.5) / 1e6 AS z
       |FROM z WHERE abs(zval) > $zThreshold ORDER BY event_id""".stripMargin

  /** JSON extraction parity: Spark's from_json(k BIGINT) yields NULL for
    * anything but an integral JSON number (quoted "12", 3.7, missing key,
    * malformed document) — the json_type guard mirrors exactly that, and
    * TRY_CAST keeps a malformed document from erroring the whole oracle.
    * The BIGINT sum casts back from DuckDB's HUGEINT.
    */
  val eventsJsonProps: String =
    """WITH e AS (SELECT event_type,
      |    CASE WHEN json_valid(props) AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
      |         THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_type, count(*) AS n_events, count(k) AS count_k,
      |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
      |  floor((CAST(sum(k) AS DOUBLE) / count(k)) * 1e6 + 0.5) / 1e6 AS avg_k
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  /** The z-order box scan is layout-invariant: the oracle runs the same
    * predicate + aggregate over the RAW lineitem table (DuckDB never
    * sees the clustered artifact) — equality proves clustering changed
    * the physical layout only. Bounds are generated from the same
    * Layout constants the Spark query filters with.
    */
  val layoutZorder: String = {
    import graft.queries.Layout._
    s"""SELECT l_returnflag, count(*) AS n_rows,
       |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE l_partkey BETWEEN $PartLo AND $PartHi
       |  AND l_suppkey BETWEEN $SuppLo AND $SuppHi
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Compaction is layout-only: the oracle aggregates the RAW
    * documents table; equality with the compacted-layout scan proves
    * the rewrite preserved every row.
    */
  val layoutCompact: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(CASE WHEN length(text) > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** ANALYZE-profile replay, generated from the SAME column list the
    * Spark query profiles (Relational.StatsProfileCols) so adding a
    * column updates both sides. `ndv_sketch_ok` is pinned TRUE: the
    * oracle asserts the engine's HLL sketch landed within its 3·rsd
    * error contract of the exact NDV (q21_sketch_gate pattern).
    * Timestamps format to whole seconds so both engines emit one
    * canonical string.
    */
  val statsProfile: String = {
    val perCol = graft.queries.Relational.StatsProfileCols.map { c =>
      val minMax =
        if (c == "l_shipdate")
          s"strftime(min($c), '%Y-%m-%d %H:%M:%S') AS min_s, strftime(max($c), '%Y-%m-%d %H:%M:%S') AS max_s"
        else
          s"CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s"
      s"""SELECT '$c' AS col, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS ndv, $minMax,
         |  TRUE AS ndv_sketch_ok FROM lineitem""".stripMargin
    }
    perCol.mkString("", "\nUNION ALL\n", "\nORDER BY col")
  }

  /** Correlation-matrix replay generated from the SAME column/pair
    * lists the Spark query profiles: identical ×100 exact-decimal
    * moment sums, one decimal→double cast per component, the identical
    * IEEE corr expression under round6.
    */
  val statsCorr: String = {
    import graft.queries.Relational.{CorrCols, CorrPairs}
    val scaled = CorrCols
      .map(c => s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS $c")
      .mkString(", ")
    val moments =
      ("CAST(count(*) AS DOUBLE) AS n" +:
        (CorrCols.map(c => s"CAST(sum($c) AS DOUBLE) AS s_$c") ++
          CorrCols.map(c => s"CAST(sum(CAST($c * $c AS DECIMAL(38,0))) AS DOUBLE) AS ss_$c") ++
          CorrPairs.map { case (a, b) =>
            s"CAST(sum(CAST($a * $b AS DECIMAL(38,0))) AS DOUBLE) AS sp_${a}_$b"
          })).mkString(",\n  ")
    val rows = CorrPairs.map { case (a, b) =>
      val corr =
        s"(n * sp_${a}_$b - s_$a * s_$b) / (sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b))"
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n_rows,
         |  floor(($corr) * 1e6 + 0.5) / 1e6 AS corr FROM m""".stripMargin
    }
    s"""WITH sc AS (SELECT $scaled FROM lineitem),
       |m AS (SELECT $moments FROM sc)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** Equi-height histogram replay, generated from the SAME bucket
    * count / column list the Spark query profiles: fences via
    * quantile_cont at i/B (the interpolation convention q20 already
    * pins), the identical value-based bucket when-chain, identical
    * per-bucket aggregates under round4.
    */
  val statsHistogram: String = {
    import graft.queries.Relational.{HistBuckets => B, HistCols}
    val parts = HistCols.map { c =>
      val fdefs =
        (1 until B).map(i => s"quantile_cont($c, ${i.toDouble / B}) AS f$i").mkString(", ")
      val bucket = "1" +
        (1 until B).map(i => s" + (CASE WHEN CAST($c AS DOUBLE) > f$i THEN 1 ELSE 0 END)").mkString
      val lo = "CASE " +
        (2 to B).map(i => s"WHEN bucket = $i THEN round(f${i - 1}, 4) ").mkString + "ELSE NULL END"
      val hi = "CASE " +
        (1 until B).map(i => s"WHEN bucket = $i THEN round(f$i, 4) ").mkString + "ELSE NULL END"
      val fcols = (1 until B).map(i => s"f$i").mkString(", ")
      val cte =
        s"""f_$c AS (SELECT $fdefs FROM lineitem),
           |b_$c AS (
           |  SELECT v, bucket, $lo AS lo, $hi AS hi FROM (
           |    SELECT CAST($c AS DOUBLE) AS v, $bucket AS bucket, $fcols
           |    FROM lineitem, f_$c))""".stripMargin
      val sel =
        s"""SELECT '$c' AS col, CAST(bucket AS BIGINT) AS bucket, lo, hi,
           |  count(*) AS n_rows, count(DISTINCT v) AS ndv,
           |  round(min(v), 4) AS bucket_min, round(max(v), 4) AS bucket_max
           |FROM b_$c GROUP BY bucket, lo, hi""".stripMargin
      (cte, sel)
    }
    s"""WITH ${parts.map(_._1).mkString(",\n")}
       |${parts.map(_._2).mkString("\nUNION ALL\n")}
       |ORDER BY col, bucket""".stripMargin
  }

  /** Salting changes the shuffle histogram, never the result: the
    * oracle runs the PLAIN unsalted join — equality proves the
    * (orderkey, salt) rewrite is result-invariant.
    */
  val q32SaltedJoin: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** SCD2 replay: identical lag/row_number/lead windows over the same
    * (user_id, (ts, event_id)) total order.
    */
  val eventsScd2: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |chg AS (
      |  SELECT user_id, ts, event_id, event_type FROM marked
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS version,
      |  event_type, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  (lead(ts) OVER w IS NULL) AS is_current
      |FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** Snapshot-as-of replay from the RAW table: version v of the
    * incrementally-ingested layout is by construction the rows with
    * l_orderkey % 2^(v+2) ≠ 0 (v < latest; the latest snapshot is the
    * full table). Equality proves the tick/manifest machinery committed
    * exactly those rows to each snapshot.
    */
  /** Vacuum is retention-only: the retained snapshot (the compaction
    * commit = the whole table) and its manifest-pruned box scan must
    * answer exactly as the raw table does — equality proves expiry
    * deleted nothing any retained snapshot references.
    */
  val layoutVacuum: String = {
    import graft.queries.Layout._
    def m(metric: String, where: String): String =
      s"""SELECT '$metric' AS metric, count(*) AS n_rows,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM lineitem WHERE $where""".stripMargin
    Seq(
      m("pruned_box", s"l_partkey BETWEEN $PartLo AND $PartHi AND l_suppkey BETWEEN $SuppLo AND $SuppHi"),
      m("snapshot_v3", "TRUE")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY metric")
  }

  /** Schema-evolution replay: column PRESENCE is a function of which
    * tick a row landed in (tick predicates on l_orderkey), so the
    * oracle computes the evolved-column counts/sums over exactly the
    * slices that carried them — equality proves the merged-schema read
    * nulls precisely the rows whose files predate each column.
    */
  val layoutSchemaEvolution: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  count(CASE WHEN l_orderkey % 4 = 0 THEN 1 END) AS n_disc,
      |  CAST(sum(CASE WHEN l_orderkey % 4 = 0
      |    THEN CAST(l_discount AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_disc,
      |  count(CASE WHEN l_orderkey % 8 = 0 THEN 1 END) AS n_tax
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** CDF replay: commit membership from the raw table through the
    * slice/delete predicates — v1 inserts = slice 0, v2 inserts =
    * slices 1-2, v3 deletes = the predicate rows (lineage ids unique).
    */
  val layoutChanges: String = {
    import graft.queries.Layout.MorPartHi
    def m(v: Int, ctype: String, where: String) =
      s"""SELECT CAST($v AS BIGINT) AS version, '$ctype' AS change_type,
         |  l_returnflag, count(*) AS n_rows,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         |FROM lineitem WHERE $where GROUP BY 1, 2, 3""".stripMargin
    Seq(
      m(1, "insert", "l_orderkey % 4 <> 0"),
      m(2, "insert", "l_orderkey % 4 = 0"),
      m(3, "delete", s"l_partkey <= $MorPartHi")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY version, change_type, l_returnflag")
  }

  /** Incremental-MV replay: the oracle aggregates the RAW table in
    * full — equality proves per-tick delta maintenance (merge of
    * groups-sized partials) lost nothing, including the exact decimal
    * sum and the serve-time derived avg.
    */
  val mvIncremental: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** MV time-travel replay: each stored version must equal a full
    * refresh at that commit — version k aggregates the raw table
    * through the CUMULATIVE tick predicates (slices 0..k).
    */
  val mvSnapshot: String = {
    def v(k: Int, pred: String) =
      s"""SELECT CAST($k AS BIGINT) AS version, l_returnflag, l_linestatus, count(*) AS n_rows,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price
         |FROM lineitem WHERE $pred GROUP BY 1, 2, 3""".stripMargin
    Seq(
      v(0, "l_orderkey % 4 <> 0"),
      v(1, "l_orderkey % 8 <> 0"),
      v(2, "TRUE")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY version, l_returnflag, l_linestatus")
  }

  /** Partition-spec-evolution replay: the date window from the raw
    * table. The engine side answers through per-segment partition
    * pruning under each segment's own recorded spec + a residual
    * predicate; the union of tick slices is the full table, so equality
    * proves the heterogeneous-spec merge (and its pruning) lost nothing.
    */
  val layoutSpecEvolution: String = {
    import graft.queries.Layout.{SpecEvoLo, SpecEvoHi}
    s"""SELECT l_returnflag, count(*) AS n_rows,
       |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$SpecEvoLo' AND l_shipdate < TIMESTAMP '$SpecEvoHi'
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** MV-vacuum replay: the retained versions (the last [[graft.queries.
    * Layout.MvRetain]] commits) recomputed from the raw table through
    * the cumulative tick predicates — identical per-version shape to
    * [[mvSnapshot]], restricted to the post-expiry survivors. Equality
    * proves expiry deleted nothing a retained as-of read needs.
    */
  val mvVacuum: String = {
    def v(k: Int, pred: String) =
      s"""SELECT CAST($k AS BIGINT) AS version, l_returnflag, l_linestatus, count(*) AS n_rows,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price
         |FROM lineitem WHERE $pred GROUP BY 1, 2, 3""".stripMargin
    Seq(
      v(1, "l_orderkey % 8 <> 0"),
      v(2, "TRUE")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY version, l_returnflag, l_linestatus")
  }

  /** Merge-on-read delete replay: the DV holds the write-time lineage
    * ids of exactly the predicate rows, and lineage ids are unique —
    * so the live set both serve paths (DV anti-join and post-purge
    * layout) must answer is precisely the predicate's complement on
    * the raw table.
    */
  val layoutDeletes: String = {
    import graft.queries.Layout.MorPartHi
    def m(metric: String) =
      s"""SELECT '$metric' AS metric, l_returnflag, count(*) AS n_rows,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM lineitem WHERE l_partkey > $MorPartHi GROUP BY 1, 2""".stripMargin
    s"""${m("mor_read")}
       |UNION ALL
       |${m("purged_read")}
       |ORDER BY metric, l_returnflag""".stripMargin
  }

  /** Streaming-takedown replay: the per-batch key-delete commits
    * partition exactly the purge predicate's lineage ids, and set union
    * is order-free — so the post-drain live set is the predicate's
    * complement on the raw table, the same replay as [[layoutDeletes]]'
    * serve metrics under the stream's own metric label.
    */
  val streamLayoutTakedown: String = {
    import graft.queries.Layout.MorPartHi
    s"""SELECT 'stream_takedown' AS metric, l_returnflag, count(*) AS n_rows,
       |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM lineitem WHERE l_partkey > $MorPartHi GROUP BY 1, 2
       |ORDER BY metric, l_returnflag""".stripMargin
  }

  /** Pruned-takedown replay: file skipping is provably lossless (a file
    * whose (min,max) rectangle misses the box holds no matching row)
    * and the DV is exactly the purge predicate's lineage ids — so the
    * serve must equal the box ∩ predicate-complement on the raw table.
    */
  val streamLayoutTakedownPruned: String = {
    import graft.queries.Layout.{MorPartHi, MorBoxPartLo, MorBoxPartHi, MorBoxSuppLo, MorBoxSuppHi}
    s"""SELECT l_returnflag, count(*) AS n_rows,
       |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE l_partkey > $MorPartHi
       |  AND l_partkey BETWEEN $MorBoxPartLo AND $MorBoxPartHi
       |  AND l_suppkey BETWEEN $MorBoxSuppLo AND $MorBoxSuppHi
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val layoutSnapshot: String = {
    def snap(v: Int, pred: String): String =
      s"""SELECT CAST($v AS BIGINT) AS version, count(*) AS n_rows,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM lineitem WHERE $pred""".stripMargin
    Seq(
      snap(0, "l_orderkey % 4 <> 0"),
      snap(1, "l_orderkey % 8 <> 0"),
      snap(2, "TRUE")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY version")
  }

  /** CDF-driven MV replay: the net of the three commits — inserts v1∪v2
    * minus the delete predicate — aggregated from the raw table. The
    * same exact-decimal sum and serve-derived avg as [[mvIncremental]];
    * equality proves signed-delta maintenance (delete commits as
    * negative deltas) ≡ recompute.
    */
  val mvFromChanges: String = {
    import graft.queries.Layout.MorPartHi
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price
       |FROM lineitem WHERE l_partkey > $MorPartHi GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** As-of × deletion-vector replay: version v from the raw table
    * through the commit predicates, with the DV applied ONLY at-or-
    * after its commit — v2 (before the delete) still contains the rows
    * v3 drops, which is precisely the isolation property under test.
    */
  val layoutSnapshotDeletes: String = {
    import graft.queries.Layout.MorPartHi
    def snap(v: Int, pred: String): String =
      s"""SELECT CAST($v AS BIGINT) AS version, count(*) AS n_rows,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM lineitem WHERE $pred""".stripMargin
    Seq(
      snap(1, "l_orderkey % 4 <> 0"),
      snap(2, "TRUE"),
      snap(3, s"l_partkey > $MorPartHi")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY version")
  }
}
