package graft.sources

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** JDBC source/sink round-trip against embedded Derby (ships with Spark's
  * jar dir, so this runs with zero extra dependencies and zero network).
  * Covers the reference's actual extract/load surface: a warehouse read
  * (`public/source_transaction_lion_parcel.py:29-43`) and the TRUNCATE +
  * batched INSERT staging load (`etl/extract_load.py`).
  */
class JdbcSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").resolve("db").toString
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  private def seed(): Unit = {
    exec("CREATE TABLE src (id BIGINT NOT NULL PRIMARY KEY, grp VARCHAR(10), amount DOUBLE)")
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement("INSERT INTO src VALUES (?, ?, ?)")
      try (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"g${i % 5}"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      } finally { ps.executeBatch(); ps.close() }
    } finally c.close()
  }

  override def beforeAll(): Unit = { super.beforeAll(); seed() }

  test("single-connection read returns the full table with the right schema") {
    val df = Tables.jdbc(spark, url, "src")
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "grp", "amount"))
    assert(df.count() == 100)
    assert(df.agg(sum($"ID")).as[Double].head() == 5050.0)
  }

  test("partitioned read splits into N range-scan partitions, same content") {
    val df = Tables.jdbcPartitioned(spark, url, "src", "ID", 1L, 100L, 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    // bounds shape the stride, they do not filter: out-of-range rows survive
    val narrow = Tables.jdbcPartitioned(spark, url, "src", "ID", 40L, 60L, 3)
    assert(narrow.count() == 100)
  }

  test("predicate-split read: one partition per WHERE clause") {
    val df = Tables.jdbcByPredicates(spark, url, "src",
      Seq("ID <= 50", "ID > 50"))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 100)
  }

  test("predicate-split partitions must not overlap: overlap means duplicate rows") {
    // the predicates define the partitioning, nothing dedupes them —
    // pin that contract so callers know overlap is on them
    val dup = Tables.jdbcByPredicates(spark, url, "src",
      Seq("ID <= 60", "ID > 40"))
    assert(dup.count() == 120) // rows 41..60 appear twice
  }

  test("filters and projection push into the database scan") {
    val df = Tables.jdbc(spark, url, "src")
      .filter($"ID" > 90).select($"ID", $"GRP")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"expected pushed filter on ID in:\n$plan")
    assert(df.count() == 10)
  }

  test("jdbcTruncateLoad replaces rows but keeps the table DDL") {
    exec("CREATE TABLE stg (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
    Sinks.jdbcAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), url, "stg")
    assert(Tables.jdbc(spark, url, "stg").count() == 2)
    Sinks.jdbcTruncateLoad(Seq((9L, "z")).toDF("id", "v"), url, "stg")
    val rows = Tables.jdbc(spark, url, "stg").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 9L)
    // TRUNCATE (not DROP+CREATE): the primary key constraint survived, so a
    // duplicate-key append must fail
    intercept[Exception] {
      Sinks.jdbcAppend(Seq((9L, "dup")).toDF("id", "v"), url, "stg")
    }
  }

  test("round-trip: partitioned extract -> transform -> truncate load") {
    exec("CREATE TABLE agg_out (grp VARCHAR(10), total DOUBLE)")
    val extracted = Tables.jdbcPartitioned(spark, url, "src", "ID", 1L, 100L, 4)
    val agg = extracted.groupBy($"GRP".as("grp"))
      .agg(sum($"AMOUNT").cast("double").as("total"))
    Sinks.jdbcTruncateLoad(agg, url, "agg_out")
    val back = Tables.jdbc(spark, url, "agg_out")
    assert(back.count() == 5)
    assert(back.agg(sum($"TOTAL")).as[Double].head() == (1 to 100).map(_ * 1.5).sum)
  }
}
