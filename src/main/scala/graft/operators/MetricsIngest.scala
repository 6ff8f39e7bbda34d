package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured metrics ingest + per-id rollup — Spark-first
  * re-expression of the reference's bonus pipeline
  * (public/lion_parcell_bonus_test_stg.py):
  *
  *   - `process_one_file()` (lines 199-238): flatten
  *     `MetricDataResults[] → {Id, Timestamps[], Values[]}` plus top-level
  *     `Messages[]` into one row per (file, metric id), dropping null/NaN
  *     values;
  *   - `aggregate_one_row_per_id()` (lines 240-276): one row per id with
  *     `runtime_date = max(timestamp)`, weighted mean
  *     `load_time = sum(values)/count(values)/60000` (ms → minutes), and
  *     `Message = '; '.join(sorted(set(messages)))`.
  *
  * Where the reference downloads files one by one on a single node and
  * aggregates in pandas, graft reads the whole drop as a distributed JSON
  * scan and aggregates with map-side partial aggregation — one shuffle on
  * the metric id, linear scale-out over files.
  */
object MetricsIngest {

  /** Schema of one payload file (CloudWatch GetMetricData response shape,
    * as handled by the reference's process_one_file). Messages are VARIANT:
    * the reference accepts strings or objects
    * (lion_parcell_bonus_test_stg.py:161-173). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("MetricDataResults", ArrayType(StructType(Seq(
      StructField("Id", StringType),
      StructField("Timestamps", ArrayType(StringType)),
      StructField("Values", ArrayType(DoubleType)))))),
    StructField("Messages", ArrayType(VariantType))))

  /** One message element → text, with the reference's fallback chain
    * (extract_messages, stg script lines 161-173): plain string as-is,
    * else .Message / .message / .text field, else the JSON rendering of
    * the object. Python's `or` chain skips FALSY fields, hence: a field
    * only counts when it is a genuine non-empty STRING (a numeric 0/false
    * would be cast to "0"/"false" by a plain variant_get — the reference
    * skips those); a plain empty string yields null and is dropped by the
    * piece filter, mirroring `[s for s in out if s]`. */
  private def messageText(m: Column): Column = {
    // non-empty string field or null: to_json of a variant string starts
    // with a quote, so non-string (numeric/bool/object) fields are skipped
    def stringField(path: String): Column = {
      val v = try_variant_get(m, path, "string")
      nullif(when(startswith(to_json(try_variant_get(m, path, "variant")), lit("\"")), v), lit(""))
    }
    val asString = try_variant_get(m, "$", "string")
    when(startswith(to_json(m), lit("\"")), nullif(asString, lit("")))
      .otherwise(coalesce(
        stringField("$.Message"),
        stringField("$.message"),
        stringField("$.text"),
        to_json(m)))
  }

  /** Flatten a JSON payload drop (one object per file) to one row per
    * (source_file, metric id): id, runtime_date, sum_ms, cnt, message.
    * Mirrors process_one_file() incl. NaN/null-value dropping, empty
    * Timestamps → null runtime_date, and string-or-object messages. */
  def flatten(spark: SparkSession, path: String): DataFrame = {
    spark.read.schema(payloadSchema).option("multiLine", "true").json(path)
      .withColumn("source_file", input_file_name())
      .withColumn("message",
        array_join(
          filter(transform(coalesce(col("Messages"), array()), m => messageText(m)),
            p => p.isNotNull && p =!= ""),
          "; "))
      .select(explode(col("MetricDataResults")).as("m"),
        col("message"), col("source_file"))
      .withColumn("__valid",
        filter(coalesce(col("m.Values"), array().cast("array<double>")),
          v => v.isNotNull && !isnan(v)))
      .select(
        col("m.Id").as("id"),
        array_max(col("m.Timestamps")).as("runtime_date"),
        aggregate(col("__valid"), lit(0.0), (acc, v) => acc + v).as("sum_ms"),
        size(col("__valid")).as("cnt"),
        col("message"), col("source_file"))
      .filter(col("id").isNotNull)
  }

  /** One row per id (aggregate_one_row_per_id): max runtime_date AS AN
    * INSTANT (the reference parses to UTC datetimes before max — a string
    * max would mis-order mixed offsets), re-rendered ISO-8601 +00:00;
    * weighted mean minutes (null when an id has no valid values, matching
    * the reference's `if r["cnt"] else None`); sorted-distinct messages. */
  def rollup(detail: DataFrame): DataFrame =
    detail.groupBy(col("id")).agg(
      max(to_timestamp(col("runtime_date"))).as("__max_ts"),
      when(sum(col("cnt")) > 0,
        sum(col("sum_ms")) / sum(col("cnt")) / lit(60000.0)).as("load_time"),
      array_join(array_sort(collect_set(
        when(length(trim(col("message"))) > 0, col("message")))), "; ")
        .as("message"))
      .select(
        col("id"),
        // session TZ is UTC → literal offset matches the reference's fmt_iso
        when(col("__max_ts").isNotNull,
          concat(date_format(col("__max_ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("+00:00")))
          .as("runtime_date"),
        col("load_time"), col("message"))
}
