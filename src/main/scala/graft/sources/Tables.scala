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
  /** events.parquet's `ts` physical type has varied across driver data
    * generations — TIMESTAMP(NANOS) (read as long via the legacy conf,
    * lossless: values are generated at microsecond precision) and
    * TIMESTAMP_NTZ micros. Normalize either to session-TZ TIMESTAMP
    * (sessions run UTC, so the NTZ cast is micros-identical and matches
    * the DuckDB oracle's naive reading). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, dir, "events"))
  }

  /** The `ts`-normalization shared with the streaming reader
    * ([[graft.streaming.EventStream.readEvents]]). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
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

  /** ORC ingest — the other columnar lake format (Hive-lineage
    * warehouses). Same pushdown/pruning behavior as parquet: predicate
    * and column pruning reach the ORC reader, so a 2-column projection
    * reads 2 stripes' worth of columns, not the row. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines ingest with malformed-record quarantine: every line
    * parses against the declared schema via `from_json` (null on
    * malformed), valid rows come back typed, rejected rows keep the RAW
    * line for the dead-letter sink — the raw-drop counterpart of
    * [[Contracts.quarantine]] (which handles typed drift; this handles
    * unparseable input). All expression-level: the text scan is
    * splittable, the parse is codegen'd, nothing is cached or collected.
    *
    * A line that is the literal `null` also routes to quarantine (the
    * parse cannot distinguish it from failure) — acceptable for drops
    * whose records are objects. */
  def jsonLinesWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json}
    // PERMISSIVE from_json yields an all-null struct for malformed input,
    // so malformed-ness is detected via the explicit corrupt-record field
    val corrupt = "__corrupt"
    val withCorrupt = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .select(col("value").as("__raw"),
        from_json(col("value"), withCorrupt,
          Map("columnNameOfCorruptRecord" -> corrupt)).as("__p"))
    val valid = parsed.filter(col(s"__p.$corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"__p.$f")): _*)
    val rejected = parsed.filter(col(s"__p.$corrupt").isNotNull)
      .select(col("__raw").as("raw"))
    (valid, rejected)
  }

  /** JDBC extract — the reference's primary source is a Postgres read
    * (`public/source_transaction_lion_parcel.py:29-43` reads
    * `schema_punten.source_transaction_lion_parcel` over an SQLAlchemy
    * engine built in `etl/connection.py:1-36`). Single-connection read:
    * fine for dims and small staging tables. Catalyst pushes filters and
    * column pruning into the generated SELECT (check `PushedFilters` in
    * the explain output), so `jdbc(...).filter(...).select(...)` ships
    * the WHERE clause to the database, not to Spark. */
  def jdbc(
      spark: SparkSession,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(props).jdbc(url, table, new java.util.Properties())

  /** Parallel JDBC extract for big tables: `numPartitions` concurrent
    * connections, each reading one stride of `partitionColumn` between the
    * bounds. This is the scale path — a single-connection read of a 10 TB
    * table serializes through one socket; a 32-way partitioned read is 32
    * concurrent range scans (give the column an index). Bounds only shape
    * the stride, they do NOT filter — rows outside still land in the first
    * and last partition. */
  def jdbcPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(props).jdbc(
      url, table, partitionColumn, lowerBound, upperBound, numPartitions,
      new java.util.Properties())

  /** JDBC extract with caller-supplied partition predicates — one
    * partition per WHERE clause. For tables whose natural split is not a
    * numeric range (dates, hash buckets, tenant ids). */
  def jdbcByPredicates(
      spark: SparkSession,
      url: String,
      table: String,
      predicates: Seq[String],
      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, predicates.toArray, p)
  }
}
