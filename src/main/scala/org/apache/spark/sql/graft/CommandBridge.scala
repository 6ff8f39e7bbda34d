package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, TimestampType}

/** Bridges for the SQL DML face ([[graft.plans.GraftSql]]): the runnable-
  * command plumbing and plan→DataFrame construction live behind
  * `private[sql]`, hence this shim package (as [[ColumnBridge]]). */
object CommandBridge {

  /** Build a DataFrame over an arbitrary (possibly partially unresolved)
    * logical plan — the analyzer finishes resolution exactly as for a
    * parsed query. For command plans this is the `spark.sql` execution
    * path: the command runs eagerly and the frame holds its result. */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** A leaf command node the graft parser substitutes for DML/maintenance
  * statements targeting a versioned-table path: executes `body` eagerly
  * (commands run at `spark.sql` time, like every SQL command) and
  * returns one summary row `(operation, table, result)` — result is the
  * committed version for DML, the dropped-version count for VACUUM. */
case class GraftCommand(name: String, table: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("result", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftCommand($name $table)"
}

/** `DESCRIBE HISTORY '<root>'`: the versioned table's commit log as a
  * result set (one row per retained version, newest first) — the
  * introspection command of the SQL face, schema fixed to
  * [[graft.sources.VersionedTable.history]]'s frame. */
case class GraftHistoryCommand(table: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("files", IntegerType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("fresh_files", IntegerType, nullable = false)(),
    AttributeReference("kept_refs", IntegerType, nullable = false)(),
    AttributeReference("change_feed", BooleanType, nullable = false)(),
    AttributeReference("deletion_vectors", BooleanType, nullable = false)(),
    AttributeReference("txn_stamp", BooleanType, nullable = false)(),
    AttributeReference("schema_fields", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftHistoryCommand($table)"
}

/** `DESCRIBE CONSTRAINTS '<root>'`: the current version's named CHECK
  * constraints as a result set (name, expression) — introspection face of
  * [[graft.sources.VersionedTable.constraintsOf]]. */
case class GraftConstraintsCommand(table: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("check_expression", StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftConstraintsCommand($table)"
}

/** `DESCRIBE '<root>'`: the current logical schema as a result set, with
  * each column's PHYSICAL (birth) parquet name when column mapping has
  * renamed it — the introspection face of the schema-per-version record. */
case class GraftSchemaCommand(table: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("nullable", BooleanType, nullable = false)(),
    AttributeReference("physical_name", StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftSchemaCommand($table)"
}

/** `DESCRIBE DETAIL '<root>'`: one-row summary of the current snapshot
  * (Delta's DESCRIBE DETAIL shape) — version, file/byte totals, schema
  * width, and which format features are active on the table. */
case class GraftDetailCommand(table: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", IntegerType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("schema_fields", IntegerType, nullable = false)(),
    AttributeReference("renamed_columns", IntegerType, nullable = false)(),
    AttributeReference("constraints", IntegerType, nullable = false)(),
    AttributeReference("properties", IntegerType, nullable = false)(),
    AttributeReference("deletion_vectors", BooleanType, nullable = false)(),
    AttributeReference("copy_ledger_files", LongType, nullable = false)(),
    AttributeReference("retained_versions", IntegerType, nullable = false)(),
    AttributeReference("protocol_features", StringType, nullable = false)(),
    AttributeReference("maintenance", StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftDetailCommand($table)"
}

/** `SHOW MATERIALIZED VIEWS IN '<dir>'`: every committed view directly
  * under the dir as (location, source, versions_behind) — the
  * operator's staleness dashboard (lag measured from the views' own
  * refresh stamps, [[graft.sources.AggReplica.versionsBehind]]). */
case class GraftViewsCommand(dir: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("versions_behind", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftViewsCommand($dir)"
}

/** `SHOW TBLPROPERTIES '<root>'`: the current version's table properties
  * as a result set (key, value) — introspection face of
  * [[graft.sources.VersionedTable.propertiesOf]]. */
case class GraftPropertiesCommand(table: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftPropertiesCommand($table)"
}

/** `SHOW PARTITIONS '<root>'`: the current snapshot's live partition
  * tuples with per-partition file counts and recorded bytes —
  * introspection face of [[graft.sources.VersionedTable.partitions]],
  * Spark's render shape (`c1=v1/c2=v2`) plus the size columns Delta
  * users reach for DESCRIBE DETAIL to get. */
case class GraftPartitionsCommand(table: String, body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("files", IntegerType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override def simpleString(maxFields: Int): String = s"GraftPartitionsCommand($table)"
}
