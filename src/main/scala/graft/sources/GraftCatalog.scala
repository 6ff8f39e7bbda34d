package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** LIGHTWEIGHT NAMED CATALOG: `name → root` mappings under a warehouse
  * dir, so SQL can say `CREATE TABLE events AS ...` / `FROM events` /
  * `OPTIMIZE events` instead of quoting root paths — while the path form
  * keeps working everywhere (the name IS just a pointer; the root stays
  * the table's identity, exactly like an external table).
  *
  * Layout: `<warehouse>/_catalog/<name>.tbl`, one small text file per
  * table whose content is the root path. Registration uses the same
  * atomic create-if-absent primitive as the commit protocol
  * ([[StoreAdapter.claim]]-style `putIfAbsent`), so two processes
  * racing `CREATE TABLE t` get one winner and one clean "already
  * exists" — the catalog never points one name at two roots. DROP
  * removes the POINTER only (external-table semantics: the versioned
  * data stays, re-registrable).
  *
  * The warehouse is `spark.graft.warehouse` (default
  * `<java.io.tmpdir>/graft_warehouse`); tables created by name without
  * a LOCATION land at `<warehouse>/<name>`. Resolution is one small
  * file read per statement — metadata-scale, no caching to invalidate
  * (a drop/re-register is visible immediately, also across processes). */
object GraftCatalog {
  val WarehouseKey = "spark.graft.warehouse"

  private val NameRe = "[A-Za-z_][A-Za-z0-9_]*"

  def validName(name: String): Boolean = name.matches(NameRe)

  def warehouse(spark: SparkSession): String =
    spark.conf.getOption(WarehouseKey).getOrElse(
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_warehouse")

  private def catalogDir(spark: SparkSession): Path =
    new Path(warehouse(spark), "_catalog")

  private def entry(spark: SparkSession, name: String): Path =
    new Path(catalogDir(spark), name + ".tbl")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Default data root for a table created BY NAME without LOCATION. */
  def defaultRoot(spark: SparkSession, name: String): String =
    new Path(warehouse(spark), name).toString

  /** Register `name → root`. Atomic: of two racing registrations one
    * wins; a repeat registration of the SAME root is an idempotent
    * no-op, a different root refuses loudly (a name must never silently
    * repoint). */
  def register(spark: SparkSession, name: String, root: String): Unit = {
    require(validName(name), s"invalid table name '$name' (want $NameRe)")
    val p = entry(spark, name)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val content = (root + "\n").getBytes("UTF-8")
    val won = StoreAdapter.forFs(f).putIfAbsent(f, p, content)
    invalidateNames(spark)
    if (!won) {
      val existing = resolve(spark, name)
      if (!existing.contains(root))
        throw new java.io.IOException(
          s"table name '$name' is already registered to " +
            s"${existing.getOrElse("<unreadable>")} — DROP TABLE $name first " +
            s"to repoint it (the data is untouched either way)")
    }
  }

  /** The root registered under `name`, or None. */
  def resolve(spark: SparkSession, name: String): Option[String] = {
    if (!validName(name)) return None
    val p = entry(spark, name)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else
      try {
        val in = f.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
        Some(text.trim).filter(_.nonEmpty)
      } catch { case _: Exception => None }
  }

  /** Drop the name→root POINTER; the table data stays (external-table
    * semantics). True when the name existed. */
  def drop(spark: SparkSession, name: String): Boolean = {
    val p = entry(spark, name)
    val existed = fs(spark, p).delete(p, false)
    invalidateNames(spark)
    existed
  }

  /** Every registered (name, root), name-sorted — the SHOW TABLES
    * listing; one directory list + one small read per table. */
  def tables(spark: SparkSession): Seq[(String, String)] = {
    val dir = catalogDir(spark)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".tbl"))
      .map(_.stripSuffix(".tbl"))
      .sorted
      .flatMap(n => resolve(spark, n).map(n -> _))
  }

  /** Registered names only — the membership set [[graft.plans.GraftSql]]
    * consults before rewriting an identifier. MEMOIZED against the
    * catalog dir's mtime on stores where directory mtimes track child
    * churn (local fs, HDFS): the per-statement cost is then one
    * `getFileStatus`, not a LIST — and in-JVM register/drop invalidate
    * eagerly, so the same-millisecond registration race cannot serve a
    * stale set to its own process. Object stores have no real directory
    * mtime, so they list every time (their LIST is the membership
    * oracle; memoizing on a constant mtime would stale-cache forever). */
  private val namesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Set[String])]()

  private[sources] def invalidateNames(spark: SparkSession): Unit =
    namesMemo.remove(catalogDir(spark).toString)

  def names(spark: SparkSession): Set[String] = {
    val dir = catalogDir(spark)
    val f = fs(spark, dir)
    val mtimeTracked = f.getScheme == "file" || f.getScheme == "hdfs"
    def list(): Set[String] =
      if (!f.exists(dir)) Set.empty
      else f.listStatus(dir).iterator
        .map(_.getPath.getName)
        .filter(_.endsWith(".tbl"))
        .map(_.stripSuffix(".tbl"))
        .toSet
    if (!mtimeTracked) list()
    else {
      val mtime =
        try f.getFileStatus(dir).getModificationTime
        catch { case _: Exception => -1L }
      if (mtime < 0) { namesMemo.remove(dir.toString); Set.empty }
      else {
        val cached = namesMemo.get(dir.toString)
        if (cached != null && cached._1 == mtime) cached._2
        else {
          val ns = list()
          namesMemo.put(dir.toString, (mtime, ns))
          ns
        }
      }
    }
  }
}
