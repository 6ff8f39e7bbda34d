package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tsDF(rows: Seq[(Long, String, Long, Double)], cols: (String, String, String, String)) =
    rows.toDF(cols._1, "s", cols._3, cols._4)
      .selectExpr(cols._1, s"cast(s as timestamp) as ${cols._2}", cols._3, cols._4)

  test("matches latest right row at or before left ts, inclusive") {
    val left = Seq(
      (1L, "2024-01-01 10:00:00", 100L, 0.0),
      (1L, "2024-01-01 12:00:00", 101L, 0.0),
      (2L, "2024-01-01 10:00:00", 102L, 0.0)
    ).toDF("k", "s", "lid", "x").selectExpr("k", "cast(s as timestamp) as t", "lid")
    val right = Seq(
      (1L, "2024-01-01 09:00:00", 1L, 10.0),
      (1L, "2024-01-01 12:00:00", 2L, 20.0), // equal ts → inclusive match
      (2L, "2024-01-02 00:00:00", 3L, 30.0)  // after left → no match
    ).toDF("k", "s", "rid", "v").selectExpr("k", "cast(s as timestamp) as t", "rid", "v")

    val out = AsOfJoin.asOfJoin(left, "k", "t", right, "k", "t", Seq("v"),
        rightSeq = Some("rid"))
      .orderBy("lid").collect()

    assert(out.length == 3)
    assert(out(0).getAs[Double]("asof_v") == 10.0)
    assert(out(1).getAs[Double]("asof_v") == 20.0) // inclusive
    assert(out(2).isNullAt(out(2).fieldIndex("asof_v"))) // unmatched → null
  }

  test("equal right timestamps: highest seq wins") {
    val left = Seq((1L, "2024-01-01 10:00:00", 100L))
      .toDF("k", "s", "lid").selectExpr("k", "cast(s as timestamp) as t", "lid")
    val right = Seq(
      (1L, "2024-01-01 09:00:00", 1L, 10.0),
      (1L, "2024-01-01 09:00:00", 2L, 20.0)
    ).toDF("k", "s", "rid", "v").selectExpr("k", "cast(s as timestamp) as t", "rid", "v")
    val out = AsOfJoin.asOfJoin(left, "k", "t", right, "k", "t", Seq("v"),
      rightSeq = Some("rid")).collect()
    assert(out.head.getAs[Double]("asof_v") == 20.0)
  }
}
