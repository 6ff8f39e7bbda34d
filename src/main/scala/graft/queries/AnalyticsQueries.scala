package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin, Sessionize}
import graft.sources.Tables

/** SURVEY.md §2b — analytics breadth (q10–q21): the general OLAP surface a
  * mart layer like the reference's dbt models sits on.
  *
  * Scale notes per query are inline; the common principles: dims broadcast
  * (no shuffle of the fact side for star joins), windows and aggregations
  * share one hash partitioning, filters/projections push to the parquet
  * scan.
  */
object AnalyticsQueries {

  private val SessionGapSeconds = 7200L // 2h — see gap distribution in docs

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_star_join"      -> ((s, d) => q10(s, d)),
    "q11_topk_per_group" -> ((s, d) => q11(s, d)),
    "q12_rollup"         -> ((s, d) => q12(s, d)),
    "q12b_cube"          -> ((s, d) => q12b(s, d)),
    "q13_sessionize"     -> ((s, d) => q13(s, d)),
    "q14_asof_join"      -> ((s, d) => q14(s, d)),
    "q15_range_join"     -> ((s, d) => q15(s, d)),
    "q16_window_running" -> ((s, d) => q16(s, d)),
    "q17_percentile"     -> ((s, d) => q17(s, d)),
    "q18_semi_anti"      -> ((s, d) => q18(s, d)),
    "q19_pivot"          -> ((s, d) => q19(s, d)),
    "q20_count_distinct" -> ((s, d) => q20(s, d)),
    "q21_setops"         -> ((s, d) => q21(s, d))
  )

  /** q10: multi-way star join — fact `lineitem` joined to the
    * supplier→nation→region dimension chain, revenue rollup per region and
    * nation. All three dims are `broadcast()` (100 / 25 / 5 rows; at 100 TB
    * they are still MBs) so the fact table never shuffles for the join; the
    * only shuffle is the final two-column aggregate with map-side partials. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val px   = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val one  = lit(1).cast("decimal(4,2)")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(px * (one - disc)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** q11: top-k per group — highest-value orders per market segment via
    * `row_number` over a per-group window. One shuffle on the group key;
    * the 1500-row customer dim broadcasts. Ties broken by order key so the
    * result is total-ordered and oracle-stable. */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("c_mktsegment").as("segment"), col("rank"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("segment"), col("rank"))
  }

  /** q12: ROLLUP aggregation (grouping sets) — subtotals per
    * (returnflag, linestatus), per returnflag, and grand total. Naive
    * `rollup` over the fact table Expands every input row once per
    * grouping level BEFORE aggregating (3× the scan volume through the
    * aggregate); since sum/count re-aggregate, we aggregate to the finest
    * level first (one ordinary shuffle) and roll up only the tiny
    * micro-aggregate — same result bit-for-bit for algebraic aggregates,
    * a third of the aggregation work at any scale. Rolled-up levels
    * surface as 'ALL' (the raw data never contains that value, so the
    * encoding is unambiguous). */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).as("__sq"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).as("__sp"),
        count(lit(1)).as("__n"))
    base
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("__sq")).cast("double").as("sum_qty"),
        sum(col("__sp")).cast("double").as("sum_price"),
        sum(col("__n")).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("sum_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** q12b: CUBE over the same dimensions — all 4 grouping sets (pair,
    * each single, grand total). Same pre-aggregation trick as q12: Spark
    * Expands input 4× for a 2-column cube, so cube the tiny
    * micro-aggregate, not the fact table. */
  def q12b(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).as("__sq"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).as("__sp"),
        count(lit(1)).as("__n"))
    base
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("__sq")).cast("double").as("sum_qty"),
        sum(col("__sp")).cast("double").as("sum_price"),
        sum(col("__n")).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("sum_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** q13: gap sessionization of the event stream (2h inactivity boundary),
    * one row per session. See [[graft.operators.Sessionize]] — single
    * shuffle on user_id. */
  def q13(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Tables.events(s, dir), "user_id", "ts", "event_id",
        SessionGapSeconds, "value")
      .orderBy(col("id"), col("session_id"))

  /** q14: as-of join — each 'view' event annotated with the user's latest
    * 'purchase' at or before it. See [[graft.operators.AsOfJoin]] — the
    * union-window formulation, one shuffle, no pair explosion. */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    AsOfJoin.asOfJoin(views, "user_id", "ts",
        purchases, "user_id", "ts", Seq("value"), rightSeq = Some("event_id"))
      .orderBy(col("event_id"))
  }

  private val BandSeconds = 60L // q15 concurrency band: ±60s

  /** q15: time-range join WITHOUT an equi-key — per event, how many other
    * events (any user) happened within ±60s. A naive `BETWEEN` join has no
    * equi-condition (cartesian plan); [[graft.operators.RangeJoin]] buckets
    * the time axis so it becomes an equi-join on the bucket id — the only
    * shuffle, near-linear pair space. Zero-match events are kept via a
    * left join of the counts back onto the event set. */
  def q15(s: SparkSession, dir: String): DataFrame = {
    val us = BandSeconds * 1000000L
    val ev = Tables.events(s, dir).select(col("event_id"), col("ts"))
    val counts = RangeJoin.timeBand(ev, "ts", ev, "ts", us, us)
      .filter(col("event_id_r") =!= col("event_id"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("__n"))
    ev.select(col("event_id"))
      .join(counts, Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("__n"), lit(0L)).as("n_concurrent"))
      .orderBy(col("event_id"))
  }

  /** q16: running-window analytics — per customer order sequence: order
    * index, cumulative spend, and 3-order moving average. One shuffle on
    * o_custkey; all four window functions share the same (partition, sort)
    * so Spark evaluates them in a single Window node over one sort.
    * DECIMAL accumulation keeps the running sums oracle-exact. */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val px = col("o_totalprice").cast("decimal(14,2)")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ma  = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        row_number().over(w).as("seq"),
        sum(px).over(cum).cast("double").as("run_spend"),
        (sum(px).over(ma).cast("double") / count(lit(1)).over(ma)).as("ma3"))
      .orderBy(col("o_custkey"), col("seq"))
  }

  /** q17: exact distribution statistics per group — median (midpoint of
    * the two middle values, DECIMAL-exact) and nearest-rank p90 of order
    * value per order priority. Interpolating `percentile` built-ins differ
    * in FP detail across engines, so both sides compute the identical
    * rank-arithmetic formulation: k_med = (n+1)/2,(n+2)/2 and
    * k90 = ceil(0.9n) over a row_number ordering. One shuffle on the
    * group key; the rank filter is a single window pass. */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val px = col("o_totalprice").cast("decimal(14,2)")
    val grp = col("o_orderpriority")
    val w = Window.partitionBy(grp).orderBy(col("v"), col("o_orderkey"))
    val ranked = Tables.orders(s, dir)
      .select(grp, px.as("v"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(grp)))
    val k1  = (col("n") + 1).divide(2).cast("long")   // lower middle
    val k2  = (col("n") + 2).divide(2).cast("long")   // upper middle
    val k90 = ((col("n") * 9 + 9)).divide(10).cast("long") // ceil(0.9n)
    ranked
      .groupBy(grp.as("priority"))
      .agg(
        max(col("n")).as("n"),
        ((sum(when(col("rn") === k1, col("v"))) +
          sum(when(col("rn") === k2, col("v")))).cast("double") / 2).as("median"),
        sum(when(col("rn") === k90, col("v"))).cast("double").as("p90"))
      .orderBy(col("priority"))
  }

  /** q18: semi + anti join in one plan — customers that have at least one
    * order (LEFT SEMI) but no finished ('F') order (LEFT ANTI). Both joins
    * hash-partition on the customer key; at scale the two order scans
    * share the parquet source with the status filter pushed down. */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderstatus"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .join(o.filter(col("o_orderstatus") === "F"),
        c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q19: pivot — market segment × order status matrix of spend and order
    * counts. Spark's `pivot` with an explicit value list plans as a
    * two-phase aggregate: groupBy(segment, status) with map-side partials
    * is the only data-sized shuffle; the PivotFirst phase re-shuffles just
    * the |segments|·|statuses| group rows. Never use the value-discovering
    * overload at scale (it adds a whole distinct pass over the data). */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val px = col("o_totalprice").cast("decimal(14,2)")
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(px).cast("double").as("spend"), count(lit(1)).as("n"))
      .select(col("segment"),
        col("F_spend").as("f_spend"), col("F_n").as("f_n"),
        col("O_spend").as("o_spend"), col("O_n").as("o_n"),
        col("P_spend").as("p_spend"), col("P_n").as("p_n"))
      .orderBy(col("segment"))
  }

  /** q20: exact distinct aggregation — distinct users and active days per
    * event type alongside plain aggregates. Spark plans multi-distinct via
    * Expand (one row per distinct-clause per input row) with partial
    * aggregation before the shuffle, so the exchange carries
    * (group, distinct-value) pairs, not raw events; at extreme cardinality
    * switch to approx_count_distinct (HLL) — kept out of the oracle-checked
    * query because sketches aren't engine-portable. */
  def q20(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** q21: set operations — classify users by view/purchase behavior via
    * EXCEPT / INTERSECT (both DISTINCT semantics). Each set op is one
    * hash-partition of the (already distinct-projected) keys; the three
    * branches reuse the same two scans. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"))
    val v = users("view")
    val p = users("purchase")
    v.except(p).withColumn("segment", lit("view_only"))
      .unionAll(p.except(v).withColumn("segment", lit("purchase_only")))
      .unionAll(v.intersect(p).withColumn("segment", lit("both")))
      .select(col("user_id"), col("segment"))
      .orderBy(col("user_id"), col("segment"))
  }

  def oracles: Map[String, String] = Map(
    "q10_star_join" ->
      """SELECT r_name, n_name,
        |  (sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(4,2) - l_discount::DECIMAL(4,2))))::DOUBLE AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q11_topk_per_group" ->
      """WITH ranked AS (
        |  SELECT c_mktsegment AS segment,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank,
        |    o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT segment, rank, o_orderkey, o_totalprice
        |FROM ranked WHERE rank <= 5
        |ORDER BY segment, rank""".stripMargin,

    "q12_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  (sum(l_quantity::DECIMAL(12,2)))::DOUBLE AS sum_qty,
        |  (sum(l_extendedprice::DECIMAL(12,2)))::DOUBLE AS sum_price,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q12b_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  (sum(l_quantity::DECIMAL(12,2)))::DOUBLE AS sum_qty,
        |  (sum(l_extendedprice::DECIMAL(12,2)))::DOUBLE AS sum_price,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q13_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, event_id, value,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN prev_us IS NULL
         |      OR epoch_us(ts) - prev_us > ${SessionGapSeconds}000000 THEN 1 ELSE 0 END AS is_new
         |  FROM e),
         |g AS (
         |  SELECT *, (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                               ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
         |  FROM f)
         |SELECT user_id AS id, session_id, min(ts) AS session_start,
         |  max(ts) AS session_end, count(*) AS n_events,
         |  (sum(value::DECIMAL(12,2)))::DOUBLE AS sum_value
         |FROM g GROUP BY user_id, session_id
         |ORDER BY id, session_id""".stripMargin,

    "q14_asof_join" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT v.event_id, v.user_id, v.ts, p.ts AS asof_ts, p.value AS asof_value
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
        |ORDER BY v.event_id""".stripMargin,

    "q15_range_join" ->
      s"""SELECT a.event_id, count(b.event_id) AS n_concurrent
         |FROM events a LEFT JOIN events b
         |  ON b.ts >= a.ts - INTERVAL $BandSeconds SECOND
         | AND b.ts <= a.ts + INTERVAL $BandSeconds SECOND
         | AND b.event_id <> a.event_id
         |GROUP BY a.event_id
         |ORDER BY a.event_id""".stripMargin,

    "q16_window_running" ->
      """SELECT o_custkey, o_orderdate, o_orderkey,
        |  row_number() OVER w AS seq,
        |  (sum(o_totalprice::DECIMAL(14,2)) OVER (w ROWS UNBOUNDED PRECEDING))::DOUBLE AS run_spend,
        |  (sum(o_totalprice::DECIMAL(14,2)) OVER (w ROWS 2 PRECEDING))::DOUBLE
        |    / count(*) OVER (w ROWS 2 PRECEDING) AS ma3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, seq""".stripMargin,

    "q17_percentile" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority AS priority, o_totalprice::DECIMAL(14,2) AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice::DECIMAL(14,2), o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT priority, max(n) AS n,
        |  (sum(CASE WHEN rn = (n+1)//2 THEN v END)
        |   + sum(CASE WHEN rn = (n+2)//2 THEN v END))::DOUBLE / 2 AS median,
        |  (sum(CASE WHEN rn = (n*9+9)//10 THEN v END))::DOUBLE AS p90
        |FROM ranked GROUP BY priority
        |ORDER BY priority""".stripMargin,

    "q18_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q20_count_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT ts::DATE) AS n_days,
        |  count(*) AS n_events,
        |  (sum(value::DECIMAL(14,2)))::DOUBLE AS sum_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q21_setops" ->
      """WITH v AS (SELECT user_id FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id FROM events WHERE event_type = 'purchase')
        |SELECT * FROM (
        |  SELECT user_id, 'view_only' AS segment FROM (SELECT user_id FROM v EXCEPT SELECT user_id FROM p)
        |  UNION ALL
        |  SELECT user_id, 'purchase_only' AS segment FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM v)
        |  UNION ALL
        |  SELECT user_id, 'both' AS segment FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM p))
        |ORDER BY user_id, segment""".stripMargin,

    "q19_pivot" ->
      """SELECT c_mktsegment AS segment,
        |  (sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice::DECIMAL(14,2) END))::DOUBLE AS f_spend,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
        |  (sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice::DECIMAL(14,2) END))::DOUBLE AS o_spend,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
        |  (sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice::DECIMAL(14,2) END))::DOUBLE AS p_spend,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY segment""".stripMargin
  )
}
