package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7 (plan).
  *
  * Every query key in [[queries]] is one operator from SURVEY.md §2; each has
  * an equivalent DuckDB oracle in [[oracleSql]] unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  *
  * Oracle-determinism rules (§4): aggregate money/quantities in DECIMAL
  * (exact, order-insensitive) and cast the final value to double; identical
  * column aliases on both sides; total ORDER BY on every result.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => q1PricingSummary(s, dir))
  ) ++ graft.queries.EtlQueries.defs ++ graft.queries.AnalyticsQueries.defs ++
    graft.queries.DedupQueries.defs ++ graft.queries.TextQueries.defs ++
    graft.queries.CurationQueries.defs ++ graft.queries.FormatQueries.defs

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  (sum(l_quantity::DECIMAL(12,2)))::DOUBLE AS sum_qty,
        |  (sum(l_extendedprice::DECIMAL(12,2)))::DOUBLE AS sum_base_price,
        |  (sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(4,2) - l_discount::DECIMAL(4,2))))::DOUBLE AS sum_disc_price,
        |  (sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(4,2) - l_discount::DECIMAL(4,2)) * (1.00::DECIMAL(4,2) + l_tax::DECIMAL(4,2))))::DOUBLE AS sum_charge,
        |  (sum(l_quantity::DECIMAL(12,2)))::DOUBLE / count(*) AS avg_qty,
        |  (sum(l_extendedprice::DECIMAL(12,2)))::DOUBLE / count(*) AS avg_price,
        |  (sum(l_discount::DECIMAL(4,2)))::DOUBLE / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) ++ graft.queries.EtlQueries.oracles ++ graft.queries.AnalyticsQueries.oracles ++
    graft.queries.DedupQueries.oracles ++ graft.queries.TextQueries.oracles ++
    graft.queries.CurationQueries.oracles ++ graft.queries.FormatQueries.oracles

  /** q1: groupBy multi-aggregate over the fact table (TPC-H Q1 shape — the
    * dbt-style "aggregate mart" pattern of the reference, e.g.
    * dbt/models/marts/lion_parcell_bonus_test.sql feeding a rollup).
    *
    * Scale notes: single shuffle on (l_returnflag, l_linestatus) with
    * map-side partial aggregation; the shipdate filter and the 7-column
    * projection push down to the parquet scan.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val dec  = "decimal(12,2)"
    val qty  = col("l_quantity").cast(dec)
    val px   = col("l_extendedprice").cast(dec)
    val disc = col("l_discount").cast("decimal(4,2)")
    val tax  = col("l_tax").cast("decimal(4,2)")
    val one  = lit(1).cast("decimal(4,2)")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(px).cast("double").as("sum_base_price"),
        sum(px * (one - disc)).cast("double").as("sum_disc_price"),
        sum(px * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(px).cast("double") / count(lit(1))).as("avg_price"),
        (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
