package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Source schema contracts — the declarative guarantees the reference
  * states in `dbt/models/sources.yml` (source tables + column lists),
  * enforced at ingest instead of assumed.
  *
  * Two failure surfaces, handled differently:
  *
  *  - STRUCTURAL drift (a declared column missing, or a type Spark cannot
  *    cast at all) is detectable from the schema alone — it throws
  *    immediately at plan time, before any data moves;
  *  - ROW-level violations (a value that does not cast, a null in a
  *    declared non-null column) are data, so they are handled in the
  *    plan: either fail the job on first violation (`enforce`) or split
  *    the scan into a valid stream and a quarantine stream with per-row
  *    reasons (`quarantine`).
  *
  * Everything is expression-level — no driver-side scan, no UDF; the
  * violation predicates ride the same whole-stage-codegen pipeline as the
  * rest of the ingest and survive any data volume.
  */
object Contracts {

  /** Structural contract breach — thrown before execution. */
  final class ContractViolationException(msg: String)
    extends RuntimeException(msg)

  /** One row's violations: array of "column: reason" strings (empty =
    * clean). Exposed for callers composing their own routing. */
  def violations(df: DataFrame, contract: StructType): Column = {
    requireStructure(df, contract)
    val checks = contract.fields.flatMap { f =>
      val c = col(f.name)
      val uncastable =
        when(c.isNotNull && c.cast(StringType).try_cast(f.dataType).isNull,
          concat(lit(s"${f.name}: not a ${f.dataType.simpleString} ("), c.cast(StringType), lit(")")))
      val nullCheck =
        if (f.nullable) None
        else Some(when(c.isNull, lit(s"${f.name}: null in non-null column")))
      Seq(Some(uncastable), nullCheck).flatten
    }
    filter(array(checks.map(ch => ch.otherwise(lit(null))): _*), _.isNotNull)
  }

  /** Enforce the contract inline: the returned frame has exactly the
    * contract's columns and types, and the JOB FAILS on the first
    * violating row (distributed `assert_true` — no driver collect). Use
    * for pipelines where bad input must stop the load, the reference's
    * implicit behavior when a dbt source query hits a type error. */
  def enforce(df: DataFrame, contract: StructType): DataFrame = {
    val viol = violations(df, contract)
    df.filter(coalesce(
        assert_true(size(viol) === 0,
          concat(lit("contract violation: "), array_join(viol, "; "))),
        lit(true)))
      .select(contract.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Split ingest into (valid, quarantined): valid rows cast to the
    * contract's exact schema; quarantined rows keep the ORIGINAL values
    * (you cannot repair what you already coerced) plus a `__violations`
    * array saying why. Route the quarantine stream to a dead-letter sink
    * and alert on its volume — at 100 TB a 0.1% quarantine rate is a
    * million rows, not a log line. */
  def quarantine(df: DataFrame, contract: StructType): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("__violations", violations(df, contract))
    val valid = tagged.filter(size(col("__violations")) === 0)
      .select(contract.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    val rejected = tagged.filter(size(col("__violations")) > 0)
    (valid, rejected)
  }

  /** Structural check: every declared column present (case-insensitive,
    * matching Spark's default resolver). Extra undeclared columns are
    * allowed and dropped by the select — additive evolution is not drift. */
  private def requireStructure(df: DataFrame, contract: StructType): Unit = {
    val have = df.columns.map(_.toLowerCase).toSet
    val missing = contract.fields.map(_.name).filterNot(n => have(n.toLowerCase))
    if (missing.nonEmpty)
      throw new ContractViolationException(
        s"declared columns missing from source: ${missing.mkString(", ")} " +
          s"(source has: ${df.columns.mkString(", ")})")
  }
}
