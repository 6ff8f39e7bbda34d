package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GraftSql
import graft.sources.{AggReplica, Tables, VersionedTable}

/** SURVEY.md §2g — the TABLE FORMAT's DML semantics, oracle-checked:
  * each key materializes a versioned table in a scratch root, drives it
  * through the SQL face (MERGE, deletion-vector DELETE/UPDATE, INSERT
  * INTO + metadata-only RENAME COLUMN), and returns the final table
  * state — which DuckDB re-derives RELATIONALLY from the same input
  * parquet. A hash match proves the format's write paths (copy-on-write
  * planning, deletion-vector masking, column mapping, append commits)
  * compute exactly the semantics an independent engine assigns to the
  * same statements — the gate the spec suite can't provide, because it
  * never leaves this engine.
  *
  * All inputs are deterministic slices of `orders`; values pass through
  * unchanged (no float arithmetic), so the comparison is exact. Scratch
  * roots are fresh per invocation and O(sf) sized; at 100 TB these same
  * statements run against a persistent root — the semantics under test
  * are size-independent. */
object FormatQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_format_merge"     -> ((s, d) => q27(s, d)),
    "q28_format_dv_dml"    -> ((s, d) => q28(s, d)),
    "q29_format_evolution" -> ((s, d) => q29(s, d)),
    "q30_format_partition" -> ((s, d) => q30(s, d)),
    "q31_format_schema"    -> ((s, d) => q31(s, d)),
    "q32_catalog_widen"    -> ((s, d) => q32(s, d)),
    "q33_convert"          -> ((s, d) => q33(s, d)),
    "q34_deep_clone"       -> ((s, d) => q34(s, d)),
    "q35_convert_partitioned" -> ((s, d) => q35(s, d)),
    "q36_generated_partition" -> ((s, d) => q36(s, d)),
    "q37_default_columns"     -> ((s, d) => q37(s, d)),
    "q38_format_merge_nmbs"   -> ((s, d) => q38(s, d)),
    "q39_generated_identity"  -> ((s, d) => q39(s, d)),
    "q40_matview"             -> ((s, d) => q40(s, d)),
    "q41_matview_minmax"      -> ((s, d) => q41(s, d)),
    "q42_matview_join"        -> ((s, d) => q42(s, d)),
    "q43_matview_star"        -> ((s, d) => q43(s, d)),
    "q44_matview_multi"       -> ((s, d) => q44(s, d)),
    "q45_matview_join_minmax" -> ((s, d) => q45(s, d)),
    "q46_matview_rollup"      -> ((s, d) => q46(s, d)),
    "q47_matview_cube"        -> ((s, d) => q47(s, d)),
    "q48_matview_rollup_minmax" -> ((s, d) => q48(s, d))
  )

  // scratch roots live on local tmpfs, so the bench numbers for q27–q42
  // measure local-fs commit latency — an object store would add its
  // round-trips through the same adapter seam; the SEMANTICS under the
  // oracle are storage-independent
  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_fmtq").toString + "/t"

  /** q27: ANSI SQL MERGE on the versioned table (the touched-file COW
    * road): matched rows take the source image (`UPDATE SET *`),
    * unmatched source rows insert (`INSERT *`). The oracle re-derives the
    * merge as source ∪ (target anti source) — a full-join restatement of
    * the SQL-standard action semantics. */
  def q27(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
    VersionedTable.commit(orders.where(col("o_orderkey") % 3 =!= 0), root)
    orders.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("M"))
      .createOrReplaceTempView("q27_src")
    GraftSql.execute(s,
      s"""MERGE INTO `$root` AS t USING q27_src AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q28: DELETION-VECTOR DML — `graft.enableDeletionVectors=true` flips
    * the SQL DELETE and UPDATE to merge-on-read: matched rows are masked
    * at their (file, position) and updates append replacement rows; the
    * read folds the masks. The oracle is the plain relational statement
    * of the same two operations. */
  def q28(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    VersionedTable.commit(Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      root)
    VersionedTable.setProperties(s, root,
      Map("graft.enableDeletionVectors" -> "true"))
    GraftSql.execute(s, s"DELETE FROM `$root` WHERE o_totalprice < 100000.0")
    GraftSql.execute(s,
      s"UPDATE `$root` SET o_orderstatus = 'X' WHERE o_orderkey % 5 = 0")
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q29: SCHEMA EVOLUTION road — `INSERT INTO` (O(batch) append commit)
    * followed by a METADATA-ONLY `RENAME COLUMN` (column mapping: the
    * files keep the birth name, the logical schema renames). The result
    * surfaces both commits' rows under the renamed column; the oracle
    * is a projection with the alias applied — proving the mapping
    * changes names and nothing else. */
  def q29(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    VersionedTable.commit(orders.where(col("o_orderkey") % 4 === 1), root)
    orders.where(col("o_orderkey") % 4 === 2)
      .createOrReplaceTempView("q29_src")
    GraftSql.execute(s, s"INSERT INTO `$root` SELECT * FROM q29_src")
    GraftSql.execute(s,
      s"ALTER TABLE '$root' RENAME COLUMN o_totalprice TO price")
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q30: PARTITIONED table lifecycle — the reference's own load shape
    * (hourly/date batches) driven through the format's partition verbs:
    * a month-partitioned table, date-RETENTION delete (`DELETE WHERE
    * <partition> < cutoff` — the metadata-only manifest drop road, zero
    * data bytes), then DYNAMIC PARTITION OVERWRITE reloading one month
    * with corrected rows (the hourly-reload verb — exactly that month's
    * partition is replaced, every other rides by reference). The oracle
    * is the plain relational statement: rows at/after the cutoff, with
    * the reloaded month's status rewritten. A hash match proves the
    * partition roads change WHICH files exist, never what the table
    * means. */
  def q30(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    // cluster by the partition column before the partitioned commit: the
    // unshuffled scan is 1-2 tasks each writing all ~84 partition dirs
    // (sequential file creates, measured 1.6 s of the key); hashed by
    // month, the creates parallelize and each file holds one month
    VersionedTable.commit(orders.repartition(col("o_month")), root,
      partitionBy = Seq("o_month"))
    GraftSql.execute(s, s"DELETE FROM `$root` WHERE o_month < '1997-01'")
    VersionedTable.overwritePartitions(s, root,
      orders.where(col("o_month") === "1999-06")
        .withColumn("o_orderstatus", lit("R")))
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q31: the SCHEMA-EVOLUTION DDL surface end to end — METADATA-ONLY
    * `ADD COLUMNS` (old rows null-backfill at read time) and
    * METADATA-ONLY `ALTER COLUMN TYPE` widening (int files served under
    * a bigint reader schema), then an `INSERT INTO` whose rows populate
    * the added columns and carry values an int cannot hold. The final
    * read mixes file vintages: pre-evolution int-typed files with null
    * backfill, post-evolution wide files with real values. The oracle is
    * the plain relational union of the two eras — a hash match proves
    * the evolution commits changed the SCHEMA and nothing else, and that
    * the widened read path is value-exact. */
  def q31(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"))
    VersionedTable.commit(orders.where(col("o_orderkey") % 4 === 1)
      .withColumn("o_qty", (col("o_orderkey") % 100).cast("int")), root)
    GraftSql.execute(s,
      s"ALTER TABLE '$root' ADD COLUMNS (discount DECIMAL(10,2), note STRING)")
    GraftSql.execute(s, s"ALTER TABLE '$root' ALTER COLUMN o_qty TYPE BIGINT")
    orders.where(col("o_orderkey") % 4 === 2)
      .withColumn("o_qty", col("o_orderkey") + 5000000000L)
      .withColumn("discount", (col("o_orderkey") % 50).cast("decimal(10,2)"))
      .withColumn("note", concat(lit("n"), col("o_orderkey")))
      .createOrReplaceTempView("q31_src")
    GraftSql.execute(s, s"INSERT INTO `$root` SELECT * FROM q31_src")
    // the TABLE stores DECIMAL(10,2); the comparison surface casts to
    // double because the driver's hash is dtype-sensitive and DuckDB's
    // pandas export renders decimals as float64 (values are integral,
    // so the cast is exact)
    VersionedTable.read(s, root)
      .withColumn("discount", col("discount").cast("double"))
      .orderBy(col("o_orderkey"))
  }

  /** q32: the NAMED-CATALOG face + date→timestamp_ntz widening, driven
    * end to end BY NAME — no quoted path appears in any statement. A
    * fresh warehouse hosts `q32_orders`: CTAS from a date-typed slice,
    * metadata-only `ALTER COLUMN TYPE TIMESTAMP_NTZ` (the widen commit
    * converts the carried day-stats to micro bounds), an INSERT of
    * native non-midnight NTZ rows, a DELETE, and a micro-literal range
    * read that crosses both vintages — the exact read that r9's unit
    * mismatch would have silently truncated. DuckDB re-derives the
    * state relationally from the same parquet. */
  def q32(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_whq32").toString
    s.conf.set(graft.sources.GraftCatalog.WarehouseKey, wh)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").cast("date").as("o_d"))
    orders.where(col("o_orderkey") % 3 === 1)
      .createOrReplaceTempView("q32_seed")
    GraftSql.execute(s, "CREATE TABLE q32_orders AS SELECT * FROM q32_seed")
    GraftSql.execute(s,
      "ALTER TABLE q32_orders ALTER COLUMN o_d TYPE TIMESTAMP_NTZ")
    orders.where(col("o_orderkey") % 3 === 2)
      .withColumn("o_d",
        col("o_d").cast("timestamp_ntz") + expr("INTERVAL 6 HOURS"))
      .createOrReplaceTempView("q32_more")
    GraftSql.execute(s, "INSERT INTO q32_orders SELECT * FROM q32_more")
    GraftSql.execute(s, "DELETE FROM q32_orders WHERE o_orderkey % 7 = 0")
    GraftSql.execute(s,
      "SELECT o_orderkey, o_orderstatus, o_d FROM q32_orders " +
        "WHERE o_d >= TIMESTAMP_NTZ '1996-01-01 00:00:00' " +
        "ORDER BY o_orderkey")
  }

  /** q33: CONVERT TO GRAFT — an existing plain-parquet directory becomes
    * a versioned table IN PLACE (manifest by absolute reference, zero
    * data movement), then proves full citizenship: an INSERT lands a
    * version dir beside the original files, a DELETE is a COW over the
    * converted refs, and the final read crosses both vintages. The
    * oracle states the surviving rows relationally. */
  def q33(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    orders.where(col("o_orderkey") % 3 === 1)
      .repartitionByRange(4, col("o_orderkey"))
      .write.parquet(root)
    GraftSql.execute(s, s"CONVERT TO GRAFT '$root'")
    orders.where(col("o_orderkey") % 3 === 2)
      .createOrReplaceTempView("q33_more")
    GraftSql.execute(s, s"INSERT INTO `$root` SELECT * FROM q33_more")
    GraftSql.execute(s, s"DELETE FROM `$root` WHERE o_totalprice < 75000.0")
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q34: DEEP CLONE — an INDEPENDENT byte-level copy of a multi-commit
    * snapshot (the distributed file-copy road: no masks, no partitions),
    * then proves independence the only way that matters: DML against the
    * clone while the SOURCE stays byte-identical — a shallow clone would
    * share files here; the deep clone owns its own. The returned frame is
    * the mutated clone; the untouched source is asserted inside the query
    * (count preserved) so a shared-file bug fails loudly, not silently. */
  def q34(s: SparkSession, dir: String): DataFrame = {
    val src = freshRoot()
    val dst = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    VersionedTable.commit(orders.where(col("o_orderkey") % 3 === 0), src)
    orders.where(col("o_orderkey") % 3 === 1)
      .createOrReplaceTempView("q34_more")
    GraftSql.execute(s, s"INSERT INTO `$src` SELECT * FROM q34_more")
    val srcRows = VersionedTable.read(s, src).count()
    GraftSql.execute(s, s"CREATE TABLE '$dst' DEEP CLONE '$src'")
    GraftSql.execute(s, s"DELETE FROM `$dst` WHERE o_totalprice < 50000.0")
    val after = VersionedTable.read(s, src).count()
    require(after == srcRows,
      s"deep clone not independent: source went $srcRows -> $after rows")
    VersionedTable.read(s, dst).orderBy(col("o_orderkey"))
  }

  /** q35: Hive-partitioned CONVERT — the q30 lifecycle run against a
    * directory that was NEVER loaded through this engine: Spark's plain
    * `partitionBy` writer lays out `o_month=.../part-*.parquet` with the
    * partition values ONLY in the dir names (the classic lake layout,
    * the reference's own date-batched load shape —
    * /root/reference/dags/retail_hourly_etl.py), then CONVERT TO GRAFT
    * adopts it in place (zero bytes moved), the retention DELETE drops
    * whole hive partitions metadata-only, and a dynamic partition
    * overwrite reloads one month through the native layout. The oracle
    * re-derives the final state relationally — a hash match proves the
    * synthesized partition values are exactly the written ones, across
    * both the original hive files and the post-convert native files. */
  def q35(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.repartition(col("o_month"))
      .write.partitionBy("o_month").parquet(root)
    GraftSql.execute(s, s"CONVERT TO GRAFT '$root'")
    GraftSql.execute(s, s"DELETE FROM `$root` WHERE o_month < '1997-01'")
    VersionedTable.overwritePartitions(s, root,
      orders.where(col("o_month") === "1999-06")
        .withColumn("o_orderstatus", lit("R")))
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q36: GENERATED PARTITION COLUMNS end to end (Delta's generation
    * expressions — [[graft.sources.GeneratedCols]]): the table records
    * `ds = date(ts)` at birth and every stage runs in EVENT TIME —
    * (1) the birth commit partitions a raw event frame that carries no
    * `ds` at all (write-side population), (2) a retention `DELETE WHERE
    * ts < <midnight boundary>` decides WHOLE date partitions through the
    * derived-conjunct replacement (metadata-only drop — the predicate
    * never names the partition column), (3) a late raw batch appends,
    * again without `ds`, landing in fresh partitions. The oracle
    * restates the surviving and appended rows relationally with
    * `CAST(ts AS DATE)` — a hash match proves population, the derived
    * drop, and the append all computed exactly `date(ts)` semantics. */
  def q36(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    VersionedTable.commit(ev, root, partitionBy = Seq("ds"),
      recordProperties = Some(Map(
        graft.sources.GeneratedCols.Prefix + "ds" -> "date(ts)")))
    VersionedTable.deleteWhere(s, root,
      col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
    VersionedTable.commitAppend(
      ev.where(col("event_id") % 97 === 0)
        .withColumn("event_id", col("event_id") + 1000000L)
        .withColumn("ts", col("ts") + expr("INTERVAL 45 DAYS")), root)
    // the TABLE stores ds as DATE; the comparison surface strings it
    // (the driver's hash is dtype-sensitive and the two engines' pandas
    // exports disagree on date dtypes — same rule as q31's decimals)
    VersionedTable.read(s, root)
      .withColumn("ds", col("ds").cast("string"))
      .orderBy(col("event_id"))
  }

  /** q37: column DEFAULT values end to end (Delta's defaultColumns —
    * Spark-native EXISTS_DEFAULT/CURRENT_DEFAULT schema metadata):
    * (1) a table births WITHOUT the columns, (2) `ADD COLUMNS ...
    * DEFAULT` lands metadata-only — the pre-evolution files then serve
    * the defaults through the parquet reader's own missing-column fill,
    * zero bytes rewritten — (3) an INSERT omitting the columns stores
    * the defaults, (4) an INSERT naming them stores explicit values.
    * The oracle restates all three eras relationally; the hash match
    * proves backfill ≡ stored-default ≡ explicit-value semantics. */
  def q37(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"))
    VersionedTable.commit(orders.where(col("o_orderkey") % 4 === 1), root)
    GraftSql.execute(s, s"ALTER TABLE '$root' ADD COLUMNS " +
      "(priority INT DEFAULT 3, channel STRING DEFAULT 'web')")
    orders.where(col("o_orderkey") % 4 === 2)
      .createOrReplaceTempView("q37_src")
    GraftSql.execute(s,
      s"INSERT INTO `$root` (o_orderkey, o_orderstatus) SELECT * FROM q37_src")
    orders.where(col("o_orderkey") % 4 === 3)
      .withColumn("priority", (col("o_orderkey") % 5).cast("int"))
      .withColumn("channel", lit("store"))
      .createOrReplaceTempView("q37_src2")
    GraftSql.execute(s, s"INSERT INTO `$root` SELECT * FROM q37_src2")
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q38: MERGE `NOT MATCHED BY SOURCE` on the touched-file COW road
    * (Delta's NMBS stats pruning, `plans/GraftSql.scala`): a
    * date-clustered table takes the operational sweep merge — matched
    * rows refresh from the feed, pre-1993 rows absent from the feed
    * sweep out, 1998+ absentees get flagged — and only files the ON
    * match or an NMBS condition can reach are rewritten; the 1993–1997
    * middle rides by manifest reference (CowMergeSpec proves the
    * manifest shape; this key proves the ANSWER). The oracle restates
    * the three fates relationally — matched rows are 1995-dated, so
    * the NMBS fates never overlap them. */
  def q38(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
    VersionedTable.commit(
      orders.repartitionByRange(8, col("o_orderdate")), root)
    orders.where(col("o_orderkey") % 2 === 0 &&
        col("o_orderdate") >= lit("1995-01-01").cast("date") &&
        col("o_orderdate") < lit("1996-01-01").cast("date"))
      .withColumn("o_orderstatus", lit("M"))
      .createOrReplaceTempView("q38_src")
    GraftSql.execute(s,
      s"""MERGE INTO `$root` AS t USING q38_src AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_orderstatus = s.o_orderstatus
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderdate < DATE '1993-01-01'
         |  THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderdate >= DATE '1998-01-01'
         |  THEN UPDATE SET o_orderstatus = 'S'""".stripMargin)
    VersionedTable.read(s, root).orderBy(col("o_orderkey"))
  }

  /** q39: STORED GENERATED + IDENTITY columns (Delta's generation
    * expressions and identity columns, `sources/GeneratedCols.scala`) —
    * the reference's surrogate-key pattern
    * (`dbt/models/marts/retail_transactions_scd.sql` version rows). The
    * table births with `row_sk GENERATED BY DEFAULT AS IDENTITY
    * (START 1000 STEP 1)` and `price_band GENERATED ALWAYS AS
    * (floor(o_totalprice/50000))`; a birth commit and an SQL INSERT of
    * RAW 3-column rows both auto-populate — the INSERT's by-position
    * alignment excludes auto columns, the append road computes them,
    * the identity high-water advances transactionally. The ids
    * themselves are allocation-order-dependent, so the surface proves
    * their CONTRACT instead: `sk_gap = row_sk - 999 - row_number() OVER
    * (ORDER BY row_sk)` is all-zero IFF the ids are exactly the dense
    * range 1000..999+n (unique, gapless, starting at START) — which the
    * oracle restates as literal zero. price_band is deterministic and
    * compares per row. */
  def q39(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot()
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    VersionedTable.commit(orders.where(col("o_orderkey") % 3 === 1), root,
      recordProperties = Some(Map(
        "graft.identityCol.row_sk" -> "1000,1",
        "graft.generatedExpr.price_band" ->
          "CAST(floor(o_totalprice / 50000.0) AS INT)")))
    orders.where(col("o_orderkey") % 3 === 2)
      .createOrReplaceTempView("q39_src")
    GraftSql.execute(s, s"INSERT INTO `$root` SELECT * FROM q39_src")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("row_sk"))
    VersionedTable.read(s, root)
      .withColumn("sk_gap",
        col("row_sk") - lit(999L) - row_number().over(w).cast("bigint"))
      .drop("row_sk")
      .orderBy(col("o_orderkey"))
  }

  /** q40: SQL-face MATERIALIZED VIEW — create from a snapshot, mutate
    * the source through feed-carrying DML (insert, group-moving update,
    * delete), REFRESH folds the feed in O(changes), the view equals the
    * batch aggregate over the final source state (the oracle). A second
    * REFRESH with nothing new must be a no-op without a commit. */
  def q40(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q40").toString
    val src = s"$tmp/src"; val mv = s"$tmp/mv"
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal"))
    val seed = customers.where(col("c_custkey") % 3 === 1)
    VersionedTable.commit(seed, src, extras = Map("changes" ->
      VersionedTable.feedWritable(
        seed.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT c_mktsegment, count(*) AS n_rows, sum(c_acctbal) AS value_sum
         |FROM '$src' GROUP BY c_mktsegment""".stripMargin)
    // source moves on: an append, a group-moving update, a delete
    VersionedTable.commitAppend(
      customers.where(col("c_custkey") % 3 === 2), src, changeFeed = true)
    VersionedTable.updateWhere(s, src, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    VersionedTable.deleteWhere(s, src, col("c_acctbal") < lit(0))
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    val after = VersionedTable.currentVersion(s, mv).get
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'") // nothing new
    require(VersionedTable.currentVersion(s, mv).contains(after),
      "an up-to-date REFRESH must not commit")
    VersionedTable.read(s, mv)
      .select(col("c_mktsegment"), col("n_rows"),
        col("value_sum").cast("double").as("value_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** q41: extrema-maintained MATERIALIZED VIEW — the extended shape
    * (count/sum/n_vals/min/max over one column, avg derived at read as
    * `value_sum / n_vals`). The refresh sequence drives BOTH maintenance
    * roads: an insert-only append folds (`least`/`greatest`, no source
    * read), then a delete that removes every segment's top AND bottom
    * balances plus a group-moving update RETRACT the stored extrema —
    * the maintainer re-reads only the affected groups' rows from the
    * source at the refresh's pinned version. The oracle recomputes the
    * whole aggregate from the source's final state: maintenance must
    * equal recompute exactly. */
  def q41(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q41").toString
    val src = s"$tmp/src"; val mv = s"$tmp/mv"
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal"))
    val seed = customers.where(col("c_custkey") % 3 === 1)
    VersionedTable.commit(seed, src, extras = Map("changes" ->
      VersionedTable.feedWritable(
        seed.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT c_mktsegment, count(*) AS n_rows,
         |  sum(c_acctbal) AS value_sum, count(c_acctbal) AS n_vals,
         |  min(c_acctbal) AS value_min, max(c_acctbal) AS value_max
         |FROM '$src' GROUP BY c_mktsegment""".stripMargin)
    // insert-only refresh: the fold fast path (no source re-read)
    VersionedTable.commitAppend(
      customers.where(col("c_custkey") % 3 === 2), src, changeFeed = true)
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    // retract the extrema in both directions (every segment's max sits
    // above 9000 and its min below -900 at any sf), and move groups so
    // preimage retractions hit segments whose extremum may leave
    VersionedTable.deleteWhere(s, src,
      col("c_acctbal") > lit(9000) || col("c_acctbal") < lit(-900))
    VersionedTable.updateWhere(s, src, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    VersionedTable.read(s, mv)
      .select(col("c_mktsegment"), col("n_rows"),
        col("value_sum").cast("double").as("value_sum"),
        col("n_vals"),
        col("value_min").cast("double").as("value_min"),
        col("value_max").cast("double").as("value_max"),
        (col("value_sum").cast("double") / col("n_vals")).as("value_avg"))
      .orderBy(col("c_mktsegment"))
  }

  /** q42: JOIN-BACKED MATERIALIZED VIEW — `γ(orders ⋈ customer)` by
    * market segment, maintained with the bilinear delta rule
    * (Δ(F⋈D) = ΔF⋈D_new + F_old⋈ΔD) over BOTH tables' change feeds.
    * One refresh folds fact churn (append + delete), a late-arriving
    * dim population (previously-unjoined orders become visible), a
    * group-moving dim update, and a dim delete — every shape the rule
    * has to get right, hash-checked against the full join-aggregate
    * recompute. */
  def q42(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q42").toString
    val fact = s"$tmp/fact"; val dim = s"$tmp/dim"; val mv = s"$tmp/mv"
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val factSeed = orders.where(col("o_orderkey") % 3 === 1)
    VersionedTable.commit(factSeed, fact, extras = Map("changes" ->
      VersionedTable.feedWritable(
        factSeed.withColumn("_change_type", lit("insert")))))
    // HALF the dim at create: odd-custkey orders join, evens wait
    val dimSeed = customers.where(col("c_custkey") % 2 === 1)
    VersionedTable.commit(dimSeed, dim, extras = Map("changes" ->
      VersionedTable.feedWritable(
        dimSeed.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT d.c_mktsegment, count(*) AS n_rows,
         |  sum(f.o_totalprice) AS value_sum
         |FROM '$fact' f JOIN '$dim' d ON f.o_custkey = d.c_custkey
         |GROUP BY d.c_mktsegment""".stripMargin)
    // fact churn: an append wave, then a price-band delete
    VersionedTable.commitAppend(
      orders.where(col("o_orderkey") % 3 === 2), fact, changeFeed = true)
    VersionedTable.deleteWhere(s, fact, col("o_totalprice") > lit(300000))
    // dim churn: the missing half arrives, a segment move, a drop
    VersionedTable.commitAppend(
      customers.where(col("c_custkey") % 2 === 0), dim, changeFeed = true)
    VersionedTable.updateWhere(s, dim, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    VersionedTable.deleteWhere(s, dim, col("c_custkey") % 7 === 3)
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    val after = VersionedTable.currentVersion(s, mv).get
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'") // nothing new
    require(VersionedTable.currentVersion(s, mv).contains(after),
      "an up-to-date REFRESH must not commit")
    VersionedTable.read(s, mv)
      .select(col("c_mktsegment"), col("n_rows"),
        col("value_sum").cast("double").as("value_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** q43: STAR MATERIALIZED VIEW — `γ(lineitem ⋈ part ⋈ supplier)` by
    * (brand, nation), maintained over THREE change feeds with the
    * telescoping rule. One refresh folds fact churn (append + delete),
    * a late-arriving dim population, a group-moving dim update on one
    * dim, and a delete on the other — the multi-dim cross terms the
    * rule has to sequence correctly (each term pins earlier dims OLD
    * and later dims NEW), hash-checked against the full recompute. */
  def q43(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q43").toString
    val fact = s"$tmp/fact"; val dp = s"$tmp/part"; val ds = s"$tmp/supp"
    val mv = s"$tmp/mv"
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("decimal(18,2)").as("l_quantity"))
    val part = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
    val supp = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val factSeed = li.where(col("l_orderkey") % 2 === 1)
    VersionedTable.commit(factSeed, fact, extras = Map("changes" ->
      VersionedTable.feedWritable(
        factSeed.withColumn("_change_type", lit("insert")))))
    // two-thirds of parts at create: the rest arrive mid-stream
    val partSeed = part.where(col("p_partkey") % 3 =!= 0)
    VersionedTable.commit(partSeed, dp, extras = Map("changes" ->
      VersionedTable.feedWritable(
        partSeed.withColumn("_change_type", lit("insert")))))
    VersionedTable.commit(supp, ds, extras = Map("changes" ->
      VersionedTable.feedWritable(
        supp.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT p.p_brand, n.s_nationkey, count(*) AS n_rows,
         |  sum(f.l_quantity) AS value_sum
         |FROM '$fact' f JOIN '$dp' p ON f.l_partkey = p.p_partkey
         |JOIN '$ds' n ON f.l_suppkey = n.s_suppkey
         |GROUP BY p.p_brand, n.s_nationkey""".stripMargin)
    // all three sources churn before ONE refresh
    VersionedTable.commitAppend(
      li.where(col("l_orderkey") % 2 === 0), fact, changeFeed = true)
    VersionedTable.deleteWhere(s, fact, col("l_quantity") > lit(45))
    VersionedTable.commitAppend(
      part.where(col("p_partkey") % 3 === 0), dp, changeFeed = true)
    VersionedTable.updateWhere(s, dp, col("p_partkey") % 10 === 0,
      Map("p_brand" -> lit("MOVED")))
    VersionedTable.deleteWhere(s, ds, col("s_suppkey") % 7 === 3)
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    val after = VersionedTable.currentVersion(s, mv).get
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'") // nothing new
    require(VersionedTable.currentVersion(s, mv).contains(after),
      "an up-to-date REFRESH must not commit")
    VersionedTable.read(s, mv)
      .select(col("p_brand"), col("s_nationkey"), col("n_rows"),
        col("value_sum").cast("double").as("value_sum"))
      .orderBy(col("p_brand"), col("s_nationkey"))
  }

  /** q44: MULTI-MEASURE JOIN VIEW — several maintained sums (the real
    * mart-rollup shape: a count and TWO measures per group), declared
    * through the SQL join face with per-sum aliases and maintained in
    * the same one delta pass per refresh. Fact and dim churn both
    * retract/advance every measure; hash-checked against the
    * two-measure recompute. */
  def q44(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q44").toString
    val fact = s"$tmp/fact"; val dim = s"$tmp/dim"; val mv = s"$tmp/mv"
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val factSeed = orders.where(col("o_orderkey") % 3 === 1)
    VersionedTable.commit(factSeed, fact, extras = Map("changes" ->
      VersionedTable.feedWritable(
        factSeed.withColumn("_change_type", lit("insert")))))
    VersionedTable.commit(customers, dim, extras = Map("changes" ->
      VersionedTable.feedWritable(
        customers.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT d.c_mktsegment, count(*) AS n_rows,
         |  sum(f.o_totalprice) AS price_sum, sum(f.o_orderkey) AS key_sum
         |FROM '$fact' f JOIN '$dim' d ON f.o_custkey = d.c_custkey
         |GROUP BY d.c_mktsegment""".stripMargin)
    VersionedTable.commitAppend(
      orders.where(col("o_orderkey") % 3 === 2), fact, changeFeed = true)
    VersionedTable.deleteWhere(s, fact, col("o_totalprice") > lit(300000))
    VersionedTable.updateWhere(s, dim, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    VersionedTable.read(s, mv)
      .select(col("c_mktsegment"), col("n_rows"),
        col("price_sum").cast("double").as("price_sum"), col("key_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** q45: EXTREMA over a JOIN-backed MATERIALIZED VIEW — the enriched
    * mart's commonest shape after plain sums ("latest/largest X per
    * segment"): `γ(orders ⋈ customer)` maintaining count/sum/n_vals/
    * min/max of the fact measure, with avg derived at read. One refresh
    * folds fact churn (append + a delete that RETRACTS every segment's
    * stored max), a group-moving dim update and a dim delete (both
    * retract whole enriched populations, extrema included) — the
    * retracted groups recompute from the STAR at the refresh's pinned
    * versions, restricted to the flagged groups. The oracle recomputes
    * the whole join-aggregate from the final states: maintenance must
    * equal recompute exactly. */
  def q45(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q45").toString
    val fact = s"$tmp/fact"; val dim = s"$tmp/dim"; val mv = s"$tmp/mv"
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val factSeed = orders.where(col("o_orderkey") % 3 === 1)
    VersionedTable.commit(factSeed, fact, extras = Map("changes" ->
      VersionedTable.feedWritable(
        factSeed.withColumn("_change_type", lit("insert")))))
    VersionedTable.commit(customers, dim, extras = Map("changes" ->
      VersionedTable.feedWritable(
        customers.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT d.c_mktsegment, count(*) AS n_rows,
         |  sum(f.o_totalprice) AS value_sum,
         |  count(f.o_totalprice) AS n_vals,
         |  min(f.o_totalprice) AS value_min,
         |  max(f.o_totalprice) AS value_max
         |FROM '$fact' f JOIN '$dim' d ON f.o_custkey = d.c_custkey
         |GROUP BY d.c_mktsegment""".stripMargin)
    // fact churn: an append wave, then a delete that removes every
    // segment's top prices (the stored maxima retract → recompute road)
    VersionedTable.commitAppend(
      orders.where(col("o_orderkey") % 3 === 2), fact, changeFeed = true)
    VersionedTable.deleteWhere(s, fact, col("o_totalprice") > lit(300000))
    // dim churn: a segment move and a drop — whole enriched populations
    // (extrema included) leave their groups
    VersionedTable.updateWhere(s, dim, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    VersionedTable.deleteWhere(s, dim, col("c_custkey") % 7 === 3)
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    VersionedTable.read(s, mv)
      .select(col("c_mktsegment"), col("n_rows"),
        col("value_sum").cast("double").as("value_sum"),
        col("n_vals"),
        col("value_min").cast("double").as("value_min"),
        col("value_max").cast("double").as("value_max"),
        (col("value_sum").cast("double") / col("n_vals")).as("value_avg"))
      .orderBy(col("c_mktsegment"))
  }

  /** q46: DECLARED ROLLUP MATERIALIZED VIEW — one `CREATE … GROUP BY
    * ROLLUP (seg, nation)` builds the finest view PLUS the cascade of
    * coarser sum views, each maintained from its parent's own change
    * feed; one `REFRESH` folds the chain parent-first, O(changes) per
    * link. The surface is the SQL ROLLUP result set (all grouping sets
    * + grand total, NULL keys coalesced to sentinels for a stable total
    * order) and the oracle recomputes `GROUP BY ROLLUP` from the
    * source's final state. */
  def q46(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q46").toString
    val src = s"$tmp/src"; val mv = s"$tmp/mv"
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal"))
    val seed = customers.where(col("c_custkey") % 3 === 1)
    VersionedTable.commit(seed, src, extras = Map("changes" ->
      VersionedTable.feedWritable(
        seed.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT c_mktsegment, c_nationkey, count(*) AS n_rows,
         |  sum(c_acctbal) AS value_sum
         |FROM '$src' GROUP BY ROLLUP (c_mktsegment, c_nationkey)""".stripMargin)
    // source churn: append, group-moving update, delete — ONE refresh
    // folds the whole chain in dependency order
    VersionedTable.commitAppend(
      customers.where(col("c_custkey") % 3 === 2), src, changeFeed = true)
    VersionedTable.updateWhere(s, src, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    VersionedTable.deleteWhere(s, src, col("c_acctbal") < lit(0))
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    graft.sources.AggReplica.readRollup(s, mv)
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
        coalesce(col("c_nationkey"), lit(-1)).as("c_nationkey"),
        col("n_rows"),
        col("value_sum").cast("double").as("value_sum"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  /** q48: DECLARED ROLLUP MATERIALIZED VIEW WITH EXTREMA — the q46
    * lifecycle with the full extrema tail (`count(v) AS n_vals,
    * min(v) AS value_min, max(v) AS value_max`): a coarser min/max is
    * not retraction-algebraic over subgroup extrema, so each cascade
    * child maintains min(value_min)/max(value_max) over its parent's
    * feed and recomputes flagged coarse groups FROM THE PARENT VIEW at
    * its pinned version (group-count-sized — never a fact scan). The
    * churn deletes the negative tail (retracting minima) and moves
    * groups; the oracle recomputes `GROUP BY ROLLUP` with min/max from
    * the source's final state. */
  def q48(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q48").toString
    val src = s"$tmp/src"; val mv = s"$tmp/mv"
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal"))
    val seed = customers.where(col("c_custkey") % 3 === 1)
    VersionedTable.commit(seed, src, extras = Map("changes" ->
      VersionedTable.feedWritable(
        seed.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT c_mktsegment, c_nationkey, count(*) AS n_rows,
         |  sum(c_acctbal) AS value_sum, count(c_acctbal) AS n_vals,
         |  min(c_acctbal) AS value_min, max(c_acctbal) AS value_max
         |FROM '$src' GROUP BY ROLLUP (c_mktsegment, c_nationkey)""".stripMargin)
    VersionedTable.commitAppend(
      customers.where(col("c_custkey") % 3 === 2), src, changeFeed = true)
    VersionedTable.updateWhere(s, src, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    // deleting the negative tail RETRACTS the minimum of most groups —
    // the hostile shape for folded extrema, forcing the recompute road
    // through the chain
    VersionedTable.deleteWhere(s, src, col("c_acctbal") < lit(0))
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    graft.sources.AggReplica.readRollup(s, mv)
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
        coalesce(col("c_nationkey"), lit(-1)).as("c_nationkey"),
        col("n_rows"),
        col("value_sum").cast("double").as("value_sum"),
        col("value_min").cast("double").as("value_min"),
        col("value_max").cast("double").as("value_max"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  /** q47: DECLARED CUBE MATERIALIZED VIEW — `CREATE … GROUP BY CUBE
    * (seg, nation)` builds the finest view plus ONE maintained sum view
    * per proper key subset, all folding the finest's own change feed
    * (any subset aggregate is a sum over finest groups — the lattice
    * flattens to one fan-out); one `REFRESH` folds everything. Surface
    * = the SQL CUBE result set; oracle recomputes `GROUP BY CUBE` from
    * the source's final state. */
  def q47(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q47").toString
    val src = s"$tmp/src"; val mv = s"$tmp/mv"
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal"))
    val seed = customers.where(col("c_custkey") % 3 === 1)
    VersionedTable.commit(seed, src, extras = Map("changes" ->
      VersionedTable.feedWritable(
        seed.withColumn("_change_type", lit("insert")))))
    GraftSql.execute(s,
      s"""CREATE MATERIALIZED VIEW '$mv' AS
         |SELECT c_mktsegment, c_nationkey, count(*) AS n_rows,
         |  sum(c_acctbal) AS value_sum
         |FROM '$src' GROUP BY CUBE (c_mktsegment, c_nationkey)""".stripMargin)
    VersionedTable.commitAppend(
      customers.where(col("c_custkey") % 3 === 2), src, changeFeed = true)
    VersionedTable.updateWhere(s, src, col("c_custkey") % 10 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    VersionedTable.deleteWhere(s, src, col("c_acctbal") < lit(0))
    GraftSql.execute(s, s"REFRESH MATERIALIZED VIEW '$mv'")
    graft.sources.AggReplica.readCube(s, mv)
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
        coalesce(col("c_nationkey"), lit(-1)).as("c_nationkey"),
        col("n_rows"),
        col("value_sum").cast("double").as("value_sum"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  /** Amortized MV lifecycle splits for the bench (the s4_build/s4_probe
    * pattern): per view shape, `qNN_create` = scratch construction
    * (sources already standing) and `qNN_refresh` = ONE O(changes)
    * REFRESH folding a fresh churn batch — the maintenance cost the
    * operator exists for, separated from the one-time build the main
    * keys q40–q44 fold into their totals. Churn is untimed setup; every
    * slice is disjoint from the seed so the refresh folds real deltas.
    * Returns (name, seconds) rows for bench_out.json's amortized map. */
  def mvAmortized(s: SparkSession, dir: String): Seq[(String, Double)] = {
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val out = Seq.newBuilder[(String, Double)]
    val tmp = java.nio.file.Files.createTempDirectory("graft_mv_amort").toString
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal"))
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
    def seedWithFeed(df: DataFrame, root: String): Unit =
      VersionedTable.commit(df, root, extras = Map("changes" ->
        VersionedTable.feedWritable(
          df.withColumn("_change_type", lit("insert")))))
    // BEST-OF-3 like the main keys (r18's driver artifact wrote a
    // single-shot q44_refresh of 14.2 s against a 2.3 s steady state —
    // one bad host window must not define an official number): each
    // shape builds three INDEPENDENT (sources, view) replicas, times
    // create and refresh on each, and reports the per-metric min. The
    // churn between create and refresh is identical untimed setup per
    // replica, so every timed refresh folds the same real delta.
    val Reps = 3
    def bestOf(name: String)(scenario: String => (Double, Double)): Unit = {
      val runs = (1 to Reps).map(i => scenario(s"$tmp/${name}_r$i"))
      out += s"${name}_create" -> runs.map(_._1).min
      out += s"${name}_refresh" -> runs.map(_._2).min
    }

    // q40: single-source sum view
    bestOf("q40") { base =>
      val src = s"${base}src"; val mv = s"${base}mv"
      seedWithFeed(customers.where(col("c_custkey") % 3 === 1), src)
      val tCreate = timed(
        AggReplica.createView(s, mv, src, Seq("c_mktsegment"), "c_acctbal"))
      VersionedTable.commitAppend(
        customers.where(col("c_custkey") % 3 === 2), src, changeFeed = true)
      VersionedTable.updateWhere(s, src, col("c_custkey") % 10 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      (tCreate, timed(AggReplica.refreshView(s, mv)))
    }
    // q41: extrema view, churn retracts stored extrema (the recompute road)
    bestOf("q41") { base =>
      val src = s"${base}src"; val mv = s"${base}mv"
      seedWithFeed(customers.where(col("c_custkey") % 3 === 1), src)
      val tCreate = timed(AggReplica.createView(
        s, mv, src, Seq("c_mktsegment"), "c_acctbal", extrema = true))
      VersionedTable.commitAppend(
        customers.where(col("c_custkey") % 3 === 2), src, changeFeed = true)
      VersionedTable.deleteWhere(s, src,
        col("c_acctbal") > lit(9000) || col("c_acctbal") < lit(-900))
      (tCreate, timed(AggReplica.refreshView(s, mv)))
    }
    // q42: join-backed view, churn on both feeds
    bestOf("q42") { base =>
      val fact = s"${base}f"; val dim = s"${base}d"; val mv = s"${base}mv"
      seedWithFeed(orders.where(col("o_orderkey") % 3 === 1), fact)
      seedWithFeed(customers.select(col("c_custkey"), col("c_mktsegment")), dim)
      val tCreate = timed(AggReplica.createJoinView(
        s, mv, fact, dim, Seq(("o_custkey", "c_custkey")),
        Seq((false, "c_mktsegment")), "o_totalprice"))
      VersionedTable.commitAppend(
        orders.where(col("o_orderkey") % 3 === 2), fact, changeFeed = true)
      VersionedTable.updateWhere(s, dim, col("c_custkey") % 10 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      (tCreate, timed(AggReplica.refreshView(s, mv)))
    }
    // q43: star view (fact + two dims), all three feeds churn
    locally {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("decimal(18,2)").as("l_quantity"))
      val part = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
      val supp = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      bestOf("q43") { base =>
        val fact = s"${base}f"; val dp = s"${base}p"; val ds = s"${base}s"
        val mv = s"${base}mv"
        seedWithFeed(li.where(col("l_orderkey") % 2 === 1), fact)
        seedWithFeed(part.where(col("p_partkey") % 3 =!= 0), dp)
        seedWithFeed(supp, ds)
        val tCreate = timed(AggReplica.createStarView(
          s, mv, fact,
          dims = Seq((dp, Seq(("l_partkey", "p_partkey"))),
            (ds, Seq(("l_suppkey", "s_suppkey")))),
          groupCols = Seq((1, "p_brand"), (2, "s_nationkey")),
          valueCol = "l_quantity"))
        VersionedTable.commitAppend(
          li.where(col("l_orderkey") % 2 === 0), fact, changeFeed = true)
        VersionedTable.commitAppend(
          part.where(col("p_partkey") % 3 === 0), dp, changeFeed = true)
        VersionedTable.deleteWhere(s, ds, col("s_suppkey") % 7 === 3)
        (tCreate, timed(AggReplica.refreshView(s, mv)))
      }
    }
    // q44: multi-measure join view (two maintained sums, one delta pass)
    bestOf("q44") { base =>
      val fact = s"${base}f"; val dim = s"${base}d"; val mv = s"${base}mv"
      seedWithFeed(orders.where(col("o_orderkey") % 3 === 1), fact)
      seedWithFeed(customers.select(col("c_custkey"), col("c_mktsegment")), dim)
      val tCreate = timed(AggReplica.createStarView(
        s, mv, fact, dims = Seq((dim, Seq(("o_custkey", "c_custkey")))),
        groupCols = Seq((1, "c_mktsegment")),
        measures = Seq(("o_totalprice", "price_sum"), ("o_orderkey", "key_sum"))))
      VersionedTable.commitAppend(
        orders.where(col("o_orderkey") % 3 === 2), fact, changeFeed = true)
      VersionedTable.updateWhere(s, dim, col("c_custkey") % 10 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      (tCreate, timed(AggReplica.refreshView(s, mv)))
    }
    out.result()
  }

  def oracles: Map[String, String] = Map(
    // q45: the extrema join-aggregate recomputed over the final states —
    // star-recompute maintenance must equal it exactly
    "q45_matview_join_minmax" ->
      """WITH f AS (
        |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        |  FROM orders
        |  WHERE o_orderkey % 3 IN (1, 2) AND NOT (o_totalprice > 300000)),
        |d AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment
        |  FROM customer WHERE NOT (c_custkey % 7 = 3))
        |SELECT c_mktsegment, count(*)::BIGINT AS n_rows,
        |  sum(o_totalprice)::DOUBLE AS value_sum,
        |  count(o_totalprice)::BIGINT AS n_vals,
        |  min(o_totalprice)::DOUBLE AS value_min,
        |  max(o_totalprice)::DOUBLE AS value_max,
        |  sum(o_totalprice)::DOUBLE / count(o_totalprice) AS value_avg
        |FROM f JOIN d ON f.o_custkey = d.c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // q46: GROUP BY ROLLUP recomputed from the source's final state —
    // the maintained cascade (finest + stacked sums + derived grand
    // total) must serve exactly the SQL grouping sets
    "q46_matview_rollup" ->
      """WITH s AS (
        |  SELECT
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment,
        |    c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
        |  FROM customer
        |  WHERE c_custkey % 3 IN (1, 2) AND NOT (c_acctbal < 0))
        |SELECT coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  coalesce(c_nationkey, -1) AS c_nationkey,
        |  count(*)::BIGINT AS n_rows,
        |  sum(c_acctbal)::DOUBLE AS value_sum
        |FROM s GROUP BY ROLLUP (c_mktsegment, c_nationkey)
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    // q48: GROUP BY ROLLUP with min/max recomputed from the source's
    // final state — the maintained extrema chain (each level's
    // min(value_min)/max(value_max) fold + parent-view recompute for
    // retracted extrema) must serve exactly the SQL grouping sets
    "q48_matview_rollup_minmax" ->
      """WITH s AS (
        |  SELECT
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment,
        |    c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
        |  FROM customer
        |  WHERE c_custkey % 3 IN (1, 2) AND NOT (c_acctbal < 0))
        |SELECT coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  coalesce(c_nationkey, -1) AS c_nationkey,
        |  count(*)::BIGINT AS n_rows,
        |  sum(c_acctbal)::DOUBLE AS value_sum,
        |  min(c_acctbal)::DOUBLE AS value_min,
        |  max(c_acctbal)::DOUBLE AS value_max
        |FROM s GROUP BY ROLLUP (c_mktsegment, c_nationkey)
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    // q47: GROUP BY CUBE recomputed from the source's final state
    "q47_matview_cube" ->
      """WITH s AS (
        |  SELECT
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment,
        |    c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
        |  FROM customer
        |  WHERE c_custkey % 3 IN (1, 2) AND NOT (c_acctbal < 0))
        |SELECT coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  coalesce(c_nationkey, -1) AS c_nationkey,
        |  count(*)::BIGINT AS n_rows,
        |  sum(c_acctbal)::DOUBLE AS value_sum
        |FROM s GROUP BY CUBE (c_mktsegment, c_nationkey)
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    // q44: both sums recomputed over the final join state
    "q44_matview_multi" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        |  FROM orders
        |  WHERE o_orderkey % 3 IN (1, 2) AND NOT (o_totalprice > 300000)),
        |d AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment
        |  FROM customer)
        |SELECT c_mktsegment, count(*)::BIGINT AS n_rows,
        |  sum(o_totalprice)::DOUBLE AS price_sum,
        |  sum(o_orderkey)::BIGINT AS key_sum
        |FROM f JOIN d ON f.o_custkey = d.c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // q43: the star-aggregate over all three tables' FINAL states —
    // the telescoping-rule maintenance must equal it exactly
    "q43_matview_star" ->
      """WITH f AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS l_quantity
        |  FROM lineitem WHERE NOT (l_quantity > 45)),
        |p AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 10 = 0 THEN 'MOVED' ELSE p_brand END
        |      AS p_brand
        |  FROM part),
        |n AS (
        |  SELECT s_suppkey, s_nationkey FROM supplier
        |  WHERE NOT (s_suppkey % 7 = 3))
        |SELECT p_brand, s_nationkey, count(*)::BIGINT AS n_rows,
        |  sum(l_quantity)::DOUBLE AS value_sum
        |FROM f JOIN p ON f.l_partkey = p.p_partkey
        |JOIN n ON f.l_suppkey = n.s_suppkey
        |GROUP BY p_brand, s_nationkey
        |ORDER BY p_brand, s_nationkey""".stripMargin,
    // q42: the join-aggregate over both tables' FINAL states — the
    // bilinear-rule maintenance must equal it exactly
    "q42_matview_join" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        |  FROM orders
        |  WHERE o_orderkey % 3 IN (1, 2) AND NOT (o_totalprice > 300000)),
        |d AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment
        |  FROM customer
        |  WHERE NOT (c_custkey % 7 = 3))
        |SELECT c_mktsegment, count(*)::BIGINT AS n_rows,
        |  sum(o_totalprice)::DOUBLE AS value_sum
        |FROM f JOIN d ON f.o_custkey = d.c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // q41: the batch aggregate over the source's FINAL state — the
    // extrema-maintained view must equal it exactly (incl. the derived
    // avg); the delete filter reads the ORIGINAL acctbal because the
    // group-moving update runs after the delete and never touches it
    "q41_matview_minmax" ->
      """WITH fin AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
        |  FROM customer
        |  WHERE c_custkey % 3 IN (1, 2)
        |    AND NOT (c_acctbal > 9000 OR c_acctbal < -900))
        |SELECT c_mktsegment, count(*)::BIGINT AS n_rows,
        |  sum(coalesce(c_acctbal, 0))::DOUBLE AS value_sum,
        |  count(c_acctbal)::BIGINT AS n_vals,
        |  min(c_acctbal)::DOUBLE AS value_min,
        |  max(c_acctbal)::DOUBLE AS value_max,
        |  (sum(coalesce(c_acctbal, 0))::DOUBLE) / count(c_acctbal)
        |    AS value_avg
        |FROM fin
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // q40: the batch aggregate over the source's FINAL state — which
    // the incremental refresh must equal exactly
    "q40_matview" ->
      """WITH fin AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
        |      AS c_mktsegment,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
        |  FROM customer
        |  WHERE c_custkey % 3 IN (1, 2))
        |SELECT c_mktsegment, count(*)::BIGINT AS n_rows,
        |  sum(coalesce(c_acctbal, 0))::DOUBLE AS value_sum
        |FROM fin
        |WHERE NOT (c_acctbal < 0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q39_generated_identity" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(floor(o_totalprice / 50000.0) AS INT) AS price_band,
        |  CAST(0 AS BIGINT) AS sk_gap
        |FROM orders
        |WHERE o_orderkey % 3 IN (1, 2)
        |ORDER BY o_orderkey""".stripMargin,
    "q38_format_merge_nmbs" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0 AND o_orderdate >= DATE '1995-01-01'
        |            AND o_orderdate < DATE '1996-01-01' THEN 'M'
        |       WHEN o_orderdate >= DATE '1998-01-01' THEN 'S'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate >= DATE '1993-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q37_default_columns" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(3 AS INT) AS priority, 'web' AS channel
        |  FROM orders WHERE o_orderkey % 4 IN (1, 2)),
        |s AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_orderkey % 5 AS INT) AS priority, 'store' AS channel
        |  FROM orders WHERE o_orderkey % 4 = 3)
        |SELECT * FROM t UNION ALL SELECT * FROM s
        |ORDER BY o_orderkey""".stripMargin,
    "q36_generated_partition" ->
      """WITH base AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events),
        |kept AS (
        |  SELECT * FROM base
        |  WHERE NOT ts < TIMESTAMP '2024-01-11 00:00:00'),
        |late AS (
        |  SELECT event_id + 1000000 AS event_id,
        |    ts + INTERVAL 45 DAY AS ts, user_id, event_type, value
        |  FROM base WHERE event_id % 97 = 0),
        |u AS (SELECT * FROM kept UNION ALL SELECT * FROM late)
        |SELECT event_id, ts, user_id, event_type, value,
        |  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds
        |FROM u ORDER BY event_id""".stripMargin,
    "q35_convert_partitioned" ->
      """SELECT o_orderkey,
        |  CASE WHEN strftime(o_orderdate, '%Y-%m') = '1999-06' THEN 'R'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice, o_orderdate,
        |  strftime(o_orderdate, '%Y-%m') AS o_month
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q34_deep_clone" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 3 IN (0, 1)
        |  AND NOT (o_totalprice < 50000.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q33_convert" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey % 3 IN (1, 2)
        |  AND NOT (o_totalprice < 75000.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q27_format_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |s AS (
        |  SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM s
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
        |ORDER BY o_orderkey""".stripMargin,
    "q28_format_dv_dml" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders
        |WHERE NOT (o_totalprice < 100000.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q29_format_evolution" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice AS price
        |FROM orders
        |WHERE o_orderkey % 4 = 1 OR o_orderkey % 4 = 2
        |ORDER BY o_orderkey""".stripMargin,
    "q30_format_partition" ->
      """SELECT o_orderkey,
        |  CASE WHEN strftime(o_orderdate, '%Y-%m') = '1999-06' THEN 'R'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice, o_orderdate,
        |  strftime(o_orderdate, '%Y-%m') AS o_month
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q31_format_schema" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_orderkey % 100 AS BIGINT) AS o_qty,
        |    CAST(NULL AS DOUBLE) AS discount,
        |    CAST(NULL AS VARCHAR) AS note
        |  FROM orders WHERE o_orderkey % 4 = 1),
        |s AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_orderkey + 5000000000 AS BIGINT) AS o_qty,
        |    CAST(CAST(o_orderkey % 50 AS DECIMAL(10,2)) AS DOUBLE) AS discount,
        |    'n' || CAST(o_orderkey AS VARCHAR) AS note
        |  FROM orders WHERE o_orderkey % 4 = 2)
        |SELECT * FROM t UNION ALL SELECT * FROM s
        |ORDER BY o_orderkey""".stripMargin,
    "q32_catalog_widen" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS o_d
        |  FROM orders WHERE o_orderkey % 3 = 1),
        |m AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)
        |      + INTERVAL 6 HOUR AS o_d
        |  FROM orders WHERE o_orderkey % 3 = 2),
        |u AS (SELECT * FROM t UNION ALL SELECT * FROM m)
        |SELECT o_orderkey, o_orderstatus, o_d FROM u
        |WHERE o_orderkey % 7 <> 0
        |  AND o_d >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin
  )
}
