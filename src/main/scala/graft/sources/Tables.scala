package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the engine's canonical tables.
  *
  * The reference (lion-parcel-etl) reads from PostgreSQL staging tables and
  * Google-Drive JSON drops (`etl/extract_load.py`,
  * `public/source_transaction_lion_parcel.py:31-46`); graft's canonical
  * storage is columnar parquet — schema-on-read, splittable, predicate
  * pushdown — which is what a 100 TB lake actually uses. CSV/JSON ingest
  * helpers cover the reference's raw-drop formats.
  */
object Tables {

  /** Read one canonical table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and convert to micros (lossless for
    * this data — values are generated at microsecond precision). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Raw JSON drop ingest (the reference's Google-Drive payload format).
    * multiLine handles one-object-per-file payloads like CloudWatch
    * GetMetricData responses. */
  def jsonDrop(spark: SparkSession, path: String, multiLine: Boolean = true): DataFrame =
    spark.read.option("multiLine", multiLine.toString).json(path)

  /** CSV ingest with header + schema inference off by default at scale —
    * callers pass an explicit schema for production use. */
  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).csv(path)
}
