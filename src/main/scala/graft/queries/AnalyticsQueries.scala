package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Sessionize}
import graft.sources.Tables

/** SURVEY.md §2b — analytics breadth (q10–q14): the general OLAP surface a
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
    "q13_sessionize"     -> ((s, d) => q13(s, d)),
    "q14_asof_join"      -> ((s, d) => q14(s, d))
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
    * (returnflag, linestatus), per returnflag, and grand total in one pass.
    * Spark expands grouping sets map-side then aggregates with partials —
    * still one shuffle. Rolled-up levels surface as 'ALL' (the raw data
    * never contains that value, so the encoding is unambiguous). */
  def q12(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("sum_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

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
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                              ROWS UNBOUNDED PRECEDING) AS session_id
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
        |ORDER BY v.event_id""".stripMargin
  )
}
