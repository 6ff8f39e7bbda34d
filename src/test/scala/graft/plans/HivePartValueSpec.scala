package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** [[HivePartValue]] — the cached per-file partition-value extraction —
  * must be VALUE-IDENTICAL to its reference formulation (the composed
  * regexp_extract/url_decode form synthHiveParts used first), including
  * escapes, literal '+', the Hive null marker, `p__` prefixes, shadowing
  * segments above the root, and value-embedded '='. The one-entry memo
  * must never serve a stale value across interleaved paths. */
class HivePartValueSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: String) = ColumnBridge.column(
    HivePartValue(ColumnBridge.expression(col("p")), c))

  /** The reference formulation, verbatim from the first implementation. */
  private def reference(c: String) = {
    val raw = regexp_extract(col("p"),
      ".*/(?:p__)?" + java.util.regex.Pattern.quote(c) + "=([^/]+)/.*", 1)
    when(raw === "" || raw === "__HIVE_DEFAULT_PARTITION__",
      lit(null).cast("string"))
      .otherwise(url_decode(regexp_replace(raw, "\\+", "%2B")))
  }

  private val paths = Seq(
    "file:/lake/t/d=2024-01-01/part-0.parquet",
    "file:/lake/t/p__d=2024-01-02/part-1.parquet",            // native prefix
    "file:/lake/d=shadow/t/d=2024-01-03/part-2.parquet",      // deeper wins
    "file:/lake/t/d=__HIVE_DEFAULT_PARTITION__/part-3.parquet", // hive null
    "file:/lake/t/g=1/d=a%20b/part-4.parquet",                // %20 escape
    "file:/lake/t/d=a%2Fb/part-5.parquet",                    // escaped slash
    "file:/lake/t/d=1+2/part-6.parquet",                      // literal plus
    "file:/lake/t/other=d=5/part-7.parquet",                  // '=' inside a value
    "file:/lake/t/v00000002/part-8.parquet",                  // no segment
    "file:/lake/t/xd=9/part-9.parquet",                       // name suffix, no '/'
    "file:/lake/t/d=%C3%A9/part-10.parquet"                   // UTF-8 escape
  )

  test("value-identical to the reference formulation on every path shape") {
    val df = paths.toDF("p")
    val got = df.select(col("p"), native("d").as("n"), reference("d").as("r"))
      .collect()
    got.foreach { row =>
      assert(row.isNullAt(1) == row.isNullAt(2) &&
        (row.isNullAt(1) || row.getString(1) == row.getString(2)),
        s"${row.getString(0)}: native=${row.get(1)} reference=${row.get(2)}")
    }
    // spot-check the interesting decodes directly
    val byPath = got.map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byPath(paths(0)).contains("2024-01-01"))
    assert(byPath(paths(1)).contains("2024-01-02"))
    assert(byPath(paths(2)).contains("2024-01-03"), "deeper segment must win")
    assert(byPath(paths(3)).isEmpty, "hive null marker must decode to null")
    assert(byPath(paths(4)).contains("a b"))
    assert(byPath(paths(5)).contains("a/b"))
    assert(byPath(paths(6)).contains("1+2"), "'+' is literal in path names")
    assert(byPath(paths(7)).isEmpty, "'=' inside another value must not match")
    assert(byPath(paths(8)).isEmpty)
    assert(byPath(paths(9)).isEmpty, "a name suffix (xd=) must not match d")
    assert(byPath(paths(10)).contains("é"), "UTF-8 %XX%XX decode")
  }

  test("the one-entry memo never serves a stale value across interleaved paths") {
    // many rows alternating between files — every row must get ITS path's
    // value, not the previous row's
    val rows = (1 to 500).map(i => s"file:/t/d=v${i % 7}/part-${i % 7}.parquet")
    val got = rows.toDF("p").repartition(1)
      .select(col("p"), native("d").as("v")).collect()
    got.foreach { r =>
      val want = r.getString(0).split('/').find(_.startsWith("d=")).get.drop(2)
      assert(r.getString(1) == want, s"${r.getString(0)} -> ${r.getString(1)}")
    }
  }

  test("stays inside WholeStageCodegen (and is value-correct through it)") {
    // a parquet scan, not a local relation — ConvertToLocalRelation
    // would otherwise fold the projection away interpreted
    val dir = java.nio.file.Files.createTempDirectory("graft_hpv").toString + "/t"
    paths.toDF("p").write.parquet(dir)
    val df = spark.read.parquet(dir).select(col("p"), native("d").as("v"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.exists(_.toString.contains("graft_hive_part_value")),
      s"HivePartValue fell out of codegen:\n${df.queryExecution.executedPlan}")
    val byPath = df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byPath(paths(4)).contains("a b") && byPath(paths(3)).isEmpty,
      "codegen road must decode identically to the interpreted road")
  }
}
