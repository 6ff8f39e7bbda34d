package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("describe computes rows, nulls, distinct, min/max per column") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(1.0)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(9.75)))
      .toDF("id", "s", "d")
    val out = Profile.describe(df, Seq("id", "s", "d"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("id") == (4L, 0L, 4L, "1", "4"))
    assert(out("s") == (4L, 1L, 2L, "a", "b"))
    assert(out("d") == (4L, 1L, 3L, "1.0", "9.75"))
  }

  test("profiling an empty frame yields zero counts and null min/max") {
    import org.apache.spark.sql.functions.col
    val empty = Seq((1L, "x")).toDF("id", "s").filter(col("id") < 0)
    val rows = Profile.describe(empty, Seq("id", "s")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.isNullAt(4) && r.isNullAt(5))
    }
  }

  test("profiling an all-null column yields null min/max, full null count") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val row = Profile.describe(df, Seq("s")).collect()(0)
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L && row.getLong(3) == 0L)
    assert(row.isNullAt(4) && row.isNullAt(5))
  }
}
