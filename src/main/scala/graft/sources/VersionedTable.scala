package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal table format: versioned snapshots with METADATA-ONLY commits —
  * the missing piece between [[Sinks.truncateLoad]]'s write-then-rename
  * (which moves the data path itself and has a brief absent-target window)
  * and a full Iceberg/Delta dependency (unavailable in this environment;
  * the protocol below is the same idea pared to its core, cf. the Delta
  * transaction-log and Iceberg snapshot-pointer designs, both public).
  *
  * Layout:
  * {{{
  *   <root>/v00000001/...parquet     immutable snapshot directories
  *   <root>/v00000002/...
  *   <root>/_commits/00000001        empty marker files; the SET of these
  *   <root>/_commits/00000002        IS the table state
  * }}}
  *
  * Protocol (each writer):
  *  1. WRITE the snapshot to `_staging/<uuid>` — private, any size, fully
  *     parallel, no table state touched;
  *  2. CLAIM the next version: create-exclusive `_claims/<N>` (retrying
  *     with N+1 on loss). The claim is an empty-file create — two writers
  *     can never own the same N, so they never touch the same paths;
  *  3. MOVE the staging dir to `v<N>` — a directory rename, metadata-only
  *     on a real filesystem (the data files never move);
  *  4. PUBLISH: create `_commits/<N>`. Readers resolve the table as
  *     max(`_commits`) — the publish is the linearization point and the
  *     table is never absent, never half-visible.
  *
  * Crash anywhere before step 4 leaves only invisible garbage (an
  * unclaimed staging dir or a claimed-but-unpublished version number that
  * later writers simply skip) — never a corrupted table. Create-exclusive
  * is atomic on HDFS/local; on S3 swap the claim/publish for conditional
  * PUTs. TIME TRAVEL: committed versions stay readable until [[vacuum]]
  * removes all but the newest K — the SCD2 "query yesterday's snapshot"
  * at whole-table granularity.
  */
object VersionedTable {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitDir(root: String) = new Path(root, "_commits")
  private def claimDir(root: String) = new Path(root, "_claims")
  private def versionDir(root: String, v: Long) = new Path(root, f"v$v%08d")
  private def pad(v: Long) = f"$v%08d"

  private def listVersions(f: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[Long] =
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong)
      .sorted

  /** All committed versions, ascending (empty for a fresh/unborn table). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    listVersions(f, commitDir(root))
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Write `df` as the next snapshot and publish it. Returns the committed
    * version. The data is written ONCE to a private staging dir; claiming,
    * moving and publishing are three metadata operations (create, dir
    * rename, create) — a lost claim race costs one retried empty-file
    * create, never a data rewrite. */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    f.mkdirs(commitDir(root))
    f.mkdirs(claimDir(root))
    // (1) private data write — no shared state touched
    val staging = new Path(root,
      "_staging/" + java.util.UUID.randomUUID().toString.take(12))
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // (2) claim the next version number with create-exclusive
    var v = math.max(
      listVersions(f, claimDir(root)).lastOption.getOrElse(0L),
      listVersions(f, commitDir(root)).lastOption.getOrElse(0L)) + 1
    var claimed = false
    while (!claimed) {
      claimed =
        try { f.create(new Path(claimDir(root), pad(v)), false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!claimed) v += 1
    }
    // (3) move staging into place — we own v, so the dir is free modulo
    // garbage from a writer that crashed after claiming this very number
    val dir = versionDir(root, v)
    if (f.exists(dir)) f.delete(dir, true)
    if (!f.rename(staging, dir))
      throw new java.io.IOException(s"rename $staging -> $dir failed")
    // (4) publish — the linearization point
    f.create(new Path(commitDir(root), pad(v)), false).close()
    v
  }

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root,
      currentVersion(spark, root).getOrElse(
        throw new java.io.IOException(s"no committed version under $root")))

  /** Time travel: read an exact committed version. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(versions(spark, root).contains(v), s"version $v is not committed under $root")
    spark.read.parquet(versionDir(root, v).toString)
  }

  /** Drop all but the newest `keepLast` committed versions (marker first,
    * then data — a reader that already resolved an old version may race
    * the delete, exactly as in any table format's vacuum; pick `keepLast`
    * to cover the longest-running reader). Returns the dropped versions. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val f = fs(spark, root)
    val drop = versions(spark, root).dropRight(keepLast)
    drop.foreach { v =>
      f.delete(new Path(commitDir(root), pad(v)), false)
      f.delete(versionDir(root, v), true)
    }
    drop
  }
}
