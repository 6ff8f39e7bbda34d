package graft.plans

import graft.SparkSpec
import graft.sources.{GraftCatalog, VersionedTable}
import org.apache.spark.sql.functions._

/** The named-catalog SQL face: `CREATE TABLE t AS ...` / `FROM t` /
  * `INSERT INTO t` / `OPTIMIZE t` / `DESCRIBE DETAIL t` without quoted
  * paths, backed by [[GraftCatalog]]'s name→root mapping under the
  * warehouse dir — with the path form staying interchangeable (the name
  * is a pointer; the root is the identity). */
class SqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.install(spark) // graft_table TVF for the FROM rewrite
    spark.conf.set(GraftCatalog.WarehouseKey,
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
  }

  test("create/insert/select/describe by name; path and name interchangeable") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "x").createOrReplaceTempView("seed")
    GraftSql.execute(spark, "CREATE TABLE cat_t AS SELECT * FROM seed")
    val root = GraftCatalog.resolve(spark, "cat_t").get
    assert(root.startsWith(GraftCatalog.warehouse(spark)))
    // read by name
    assert(GraftSql.execute(spark, "SELECT count(*) AS n FROM cat_t")
      .collect().head.getLong(0) == 2L)
    // DML by name
    GraftSql.execute(spark, "INSERT INTO cat_t VALUES (3, 'c')")
    GraftSql.execute(spark, "DELETE FROM cat_t WHERE id = 1")
    assert(GraftSql.execute(spark, "SELECT id FROM cat_t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // ...and the PATH face sees the same table
    assert(VersionedTable.read(spark, root).count() == 2L)
    VersionedTable.commitAppend(Seq((4L, "d")).toDF("id", "x"), root)
    assert(GraftSql.execute(spark, "SELECT count(*) AS n FROM cat_t")
      .collect().head.getLong(0) == 3L)
    // maintenance + introspection by name
    GraftSql.execute(spark, "OPTIMIZE cat_t SORT BY (id)")
    val detail = GraftSql.execute(spark, "DESCRIBE DETAIL cat_t").collect().head
    assert(detail.getString(detail.fieldIndex("location")) == root)
    // time travel by name rides the same rewrite chain
    assert(GraftSql.execute(spark,
      "SELECT count(*) AS n FROM cat_t VERSION AS OF 1")
      .collect().head.getLong(0) == 2L)
  }

  test("registration is atomic and never silently repoints; DROP removes the pointer only") {
    val external = java.nio.file.Files
      .createTempDirectory("graft_cat_ext").toString + "/t"
    VersionedTable.commit(Seq((9L, "z")).toDF("id", "x"), external)
    GraftSql.execute(spark, s"CREATE TABLE cat_ext LOCATION '$external'")
    assert(GraftSql.execute(spark, "SELECT id FROM cat_ext")
      .collect().head.getLong(0) == 9L)
    // same-root re-registration is idempotent; a different root refuses
    GraftCatalog.register(spark, "cat_ext", external)
    val err = intercept[java.io.IOException](
      GraftCatalog.register(spark, "cat_ext", external + "_other"))
    assert(err.getMessage.contains("already registered"))
    // DROP: pointer gone, data intact, name re-registrable
    GraftSql.execute(spark, "DROP TABLE cat_ext")
    assert(GraftCatalog.resolve(spark, "cat_ext").isEmpty)
    assert(VersionedTable.read(spark, external).count() == 1L)
    GraftCatalog.register(spark, "cat_ext", external)
    assert(GraftCatalog.resolve(spark, "cat_ext").contains(external))
    // the listing face
    val listed = GraftSql.execute(spark, "SHOW GRAFT TABLES").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(listed.get("cat_ext").contains(external))
  }

  test("SHOW GRAFT TABLES tracks the warehouse through creates and drops") {
    Seq((1L, "x")).toDF("id", "x").createOrReplaceTempView("sgt_seed")
    GraftSql.execute(spark, "CREATE TABLE sgt_one AS SELECT * FROM sgt_seed")
    GraftSql.execute(spark, "CREATE TABLE sgt_two AS SELECT * FROM sgt_seed")
    def listed(): Map[String, String] =
      GraftSql.execute(spark, "SHOW GRAFT TABLES").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val both = listed()
    assert(both.contains("sgt_one") && both.contains("sgt_two"),
      s"both creates must list: ${both.keySet}")
    assert(both("sgt_one").startsWith(GraftCatalog.warehouse(spark)))
    GraftSql.execute(spark, "DROP TABLE sgt_one")
    val after = listed()
    assert(!after.contains("sgt_one") && after.contains("sgt_two"),
      s"drop must remove exactly its pointer: ${after.keySet}")
  }

  test("graft_table TVF family resolves catalog names too") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cat_tvf").toString + "/t"
    VersionedTable.commit(Seq((7L, "x")).toDF("id", "v"), root)
    GraftCatalog.register(spark, "cat_tvf", root)
    assert(spark.sql("SELECT id FROM graft_table('cat_tvf')")
      .collect().head.getLong(0) == 7L)
    assert(spark.sql("SELECT id FROM graft_table_at('cat_tvf', 1)")
      .collect().head.getLong(0) == 7L)
    assert(spark.sql("SELECT count(*) FROM graft_history('cat_tvf')")
      .collect().head.getLong(0) == 1L)
  }

  test("APPLY CHANGES by name: source resolves, new destination registers under the warehouse") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "x").createOrReplaceTempView("cr_cat")
    GraftSql.execute(spark, "CREATE TABLE cat_cdc_src AS SELECT * FROM cr_cat")
    GraftSql.execute(spark, "DELETE FROM cat_cdc_src WHERE id = 2")
    val ck = java.nio.file.Files.createTempDirectory("graft_cat_ck").toString
    GraftSql.execute(spark,
      s"APPLY CHANGES INTO cat_cdc_dst FROM cat_cdc_src KEYS (id) CHECKPOINT '$ck'")
    val dstRoot = GraftCatalog.resolve(spark, "cat_cdc_dst").get
    assert(VersionedTable.read(spark, dstRoot).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // the replica now reads by name like any catalog table
    assert(GraftSql.execute(spark, "SELECT count(*) AS n FROM cat_cdc_dst")
      .collect().head.getLong(0) == 1L)
  }

  test("registered names inside string LITERALS are never rewritten") {
    Seq((1L, "seed")).toDF("id", "x").createOrReplaceTempView("lit_seed")
    GraftSql.execute(spark, "CREATE TABLE cat_lit AS SELECT * FROM lit_seed")
    // the literal mentions the registered name in a FROM position — a
    // naive textual rewrite would corrupt the VALUE into graft_table(...)
    GraftSql.execute(spark,
      "INSERT INTO cat_lit VALUES (2, 'copied from cat_lit yesterday')")
    val got = GraftSql.execute(spark,
      "SELECT x FROM cat_lit WHERE id = 2").collect().head.getString(0)
    assert(got == "copied from cat_lit yesterday", s"literal corrupted: '$got'")
    // escaped quotes inside the literal survive too
    GraftSql.execute(spark,
      "INSERT INTO cat_lit VALUES (3, 'it''s from cat_lit')")
    assert(GraftSql.execute(spark, "SELECT x FROM cat_lit WHERE id = 3")
      .collect().head.getString(0) == "it's from cat_lit")
    // DOUBLE-quoted literals are strings in Spark's default mode — the
    // tracker must treat them as opaque exactly like single-quoted ones
    GraftSql.execute(spark,
      "INSERT INTO cat_lit VALUES (4, \"copied from cat_lit twice\")")
    assert(GraftSql.execute(spark, "SELECT x FROM cat_lit WHERE id = 4")
      .collect().head.getString(0) == "copied from cat_lit twice")
    // BACKSLASH-escaped quote must not end the literal early (a naive
    // tracker would resume scanning mid-value and rewrite the name)
    GraftSql.execute(spark,
      "INSERT INTO cat_lit VALUES (5, 'don\\'t read from cat_lit')")
    assert(GraftSql.execute(spark, "SELECT x FROM cat_lit WHERE id = 5")
      .collect().head.getString(0) == "don't read from cat_lit")
  }

  test("outsideQuotes treats both quote styles and backslash escapes as opaque") {
    def upper(s: String) = GraftSql.outsideQuotes(s)(_.toUpperCase)
    assert(upper("select 'from a' x, \"from b\" y") ==
      "SELECT 'from a' X, \"from b\" Y")
    assert(upper("select 'it\\'s from a' z") == "SELECT 'it\\'s from a' Z")
    assert(upper("select \"he said \"\"from a\"\"\" w") ==
      "SELECT \"he said \"\"from a\"\"\" W")
    // a single-quote inside a double-quoted literal (and vice versa) is
    // plain data, not a nested literal boundary
    assert(upper("select \"o'brien from a\" q, 'say \"from b\"' r") ==
      "SELECT \"o'brien from a\" Q, 'say \"from b\"' R")
  }

  test("bare-name CTAS interception is gated on the graft catalog opt-in") {
    // force-disable: even with the warehouse configured, namedDdl=false
    // must fall through to Spark's own CTAS (the session did not opt in)
    spark.conf.set(GraftSql.NamedDdlKey, "false")
    try {
      GraftSql.execute(spark, "CREATE TABLE gated_spark_t AS SELECT 1 AS a")
      assert(GraftCatalog.resolve(spark, "gated_spark_t").isEmpty,
        "gated-off CTAS must not register a graft table")
      assert(spark.catalog.tableExists("gated_spark_t"),
        "gated-off CTAS must reach Spark's catalog")
    } finally {
      spark.conf.unset(GraftSql.NamedDdlKey)
      spark.sql("DROP TABLE IF EXISTS gated_spark_t")
    }
    // opt-in path (warehouse set in beforeAll): intercepted by graft
    GraftSql.execute(spark, "CREATE TABLE gated_graft_t AS SELECT 1 AS a")
    assert(GraftCatalog.resolve(spark, "gated_graft_t").isDefined)
  }

  test("unregistered identifiers pass through untouched (temp views, plain SQL)") {
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("plain_view")
    assert(GraftSql.execute(spark, "SELECT count(*) FROM plain_view")
      .collect().head.getLong(0) == 1L)
    // DROP TABLE of a non-catalog name still reaches Spark (and errors
    // there for a temp view, exactly as without graft)
    intercept[Exception](
      GraftSql.execute(spark, "DROP TABLE definitely_not_registered"))
  }
}
