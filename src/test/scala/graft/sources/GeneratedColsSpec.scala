package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generated partition columns ([[GeneratedCols]], Delta's generation
  * expressions): write-side population and enforcement, and the
  * predicate-derived pruning that lets EVENT-TIME predicates decide
  * derived-period partitions — including the metadata-only retention
  * delete (`DELETE WHERE ts < boundary` against `ds = date(ts)`). */
class GeneratedColsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_gen").toString + "/t"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def seed(root: String): Unit = {
    // 3 days of events, ts only — ds populates itself
    val rows = for {
      d <- 1 to 3; h <- Seq(0, 6, 12, 18)
    } yield (d * 100L + h, ts(f"2024-03-0$d $h%02d:30:00"))
    VersionedTable.commit(
      rows.toDF("id", "ts"), root,
      partitionBy = Seq("ds"),
      recordProperties = Some(Map(
        GeneratedCols.Prefix + "ds" -> "date(ts)")))
  }

  test("population: a frame without the generated column partitions itself") {
    val root = freshRoot()
    seed(root)
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "ts", "ds"))
    assert(got.where(col("ds") =!= to_date(col("ts"))).count() == 0)
    assert(got.count() == 12)
    // appends populate too (every road funnels through the same commit)
    VersionedTable.commitAppend(
      Seq((401L, ts("2024-03-04 01:00:00"))).toDF("id", "ts"), root)
    assert(VersionedTable.read(spark, root)
      .where(col("ds") === lit("2024-03-04").cast("date")).count() == 1)
  }

  test("enforcement: a caller-provided generated column must agree row for row") {
    val root = freshRoot()
    seed(root)
    // agreeing value passes
    VersionedTable.commitAppend(
      Seq((500L, ts("2024-03-05 10:00:00"), java.sql.Date.valueOf("2024-03-05")))
        .toDF("id", "ts", "ds"), root)
    // disagreeing value is refused before anything publishes
    val before = VersionedTable.currentVersion(spark, root)
    intercept[Exception] {
      VersionedTable.commitAppend(
        Seq((501L, ts("2024-03-05 10:00:00"), java.sql.Date.valueOf("2024-03-06")))
          .toDF("id", "ts", "ds"), root)
    }
    assert(VersionedTable.currentVersion(spark, root) == before)
    // null base with null generated passes (null-safe equality)
    VersionedTable.commitAppend(
      Seq((502L, null.asInstanceOf[java.sql.Timestamp],
        null.asInstanceOf[java.sql.Date])).toDF("id", "ts", "ds"), root)
    assert(VersionedTable.read(spark, root).where(col("id") === 502L)
      .select("ds").head.isNullAt(0))
  }

  test("derived pruning: an event-time range prunes date partitions") {
    val root = freshRoot()
    seed(root)
    val v = VersionedTable.currentVersion(spark, root).get
    // predicate on ts ONLY — the ds bounds derive from the generator
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v,
      col("ts") >= lit("2024-03-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-03-03 00:00:00").cast("timestamp"))
    assert(kept.nonEmpty && kept.size < total, s"kept ${kept.size} of $total")
    assert(kept.forall(_.contains("ds=2024-03-02")),
      s"derived bounds failed to prune: $kept")
  }

  test("metadata-only retention delete in event time (boundary literal)") {
    val root = freshRoot()
    seed(root)
    val vd = VersionedTable.deleteWhere(spark, root,
      col("ts") < lit("2024-03-03 00:00:00").cast("timestamp"))
    assert(VersionedTable.commitInfoOf(spark, root, vd)
      .get("partitionDrop").contains("true"),
      "event-time boundary delete took the rewrite road")
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 4)
    assert(got.where(col("ts") < lit("2024-03-03 00:00:00").cast("timestamp"))
      .count() == 0)
    // NON-boundary literal: equivalence doesn't hold, the row road runs,
    // results stay exact
    val vd2 = VersionedTable.deleteWhere(spark, root,
      col("ts") < lit("2024-03-03 07:00:00").cast("timestamp"))
    assert(!VersionedTable.commitInfoOf(spark, root, vd2)
      .get("partitionDrop").contains("true"))
    // day 3 had events at 00:30, 06:30, 12:30, 18:30 — two survive 07:00
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("UPDATE of the base regenerates the generated column (the Delta rule)") {
    val root = freshRoot()
    seed(root)
    // move id=106's event three days forward WITHOUT naming ds
    VersionedTable.updateWhere(spark, root, col("id") === 106L,
      Map("ts" -> lit("2024-03-07 09:00:00").cast("timestamp")))
    val row = VersionedTable.read(spark, root).where(col("id") === 106L)
      .select("ds").head
    assert(row.getDate(0).toString == "2024-03-07",
      s"stale generated value after base update: ${row.getDate(0)}")
    // explicitly setting a DISAGREEING pair is refused by enforcement
    intercept[Exception] {
      VersionedTable.updateWhere(spark, root, col("id") === 112L,
        Map("ts" -> lit("2024-03-08 09:00:00").cast("timestamp"),
            "ds" -> lit("2024-03-01").cast("date")))
    }
  }

  test("rename follows generated definitions; dropping base or generated refused") {
    val root = freshRoot()
    seed(root)
    // renaming the BASE rewrites the generator text; raw appends keep working
    VersionedTable.renameColumn(spark, root, "ts", "event_ts")
    val cur = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, cur)
      .get(GeneratedCols.Prefix + "ds").contains("date(event_ts)"))
    VersionedTable.commitAppend(
      Seq((600L, ts("2024-03-09 01:00:00"))).toDF("id", "event_ts"), root)
    assert(VersionedTable.read(spark, root)
      .where(col("ds") === lit("2024-03-09").cast("date")).count() == 1)
    // dropping the base or the generated column is refused up front
    val e1 = intercept[IllegalArgumentException](
      VersionedTable.dropColumn(spark, root, "event_ts"))
    assert(e1.getMessage.contains("base of generated column"))
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.dropColumn(spark, root, "ds"))
    assert(e2.getMessage.toLowerCase.contains("partition column") ||
      e2.getMessage.contains("generated column"))
  }

  test("zone pin: a mismatched session cannot write, and derivation " +
      "falls back to the correct row road") {
    val root = freshRoot()
    seed(root) // born under the suite's UTC session
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      // zone-sensitive write refused loudly
      val e = intercept[IllegalArgumentException] {
        VersionedTable.commitAppend(
          Seq((700L, ts("2024-03-09 01:00:00"))).toDF("id", "ts"), root)
      }
      assert(e.getMessage.contains("time zone"), e.getMessage)
      // read-side derivation skips the zone-sensitive generator: the
      // boundary delete takes the ROW road and computes the exact result
      // for THIS session's literal interpretation
      val expect = VersionedTable.read(spark, root)
        .where(!(col("ts") < lit("2024-03-02 00:00:00").cast("timestamp")))
        .count()
      val vd = VersionedTable.deleteWhere(spark, root,
        col("ts") < lit("2024-03-02 00:00:00").cast("timestamp"))
      assert(!VersionedTable.commitInfoOf(spark, root, vd)
        .get("partitionDrop").contains("true"),
        "zone-mismatched session must not take the metadata drop road")
      assert(VersionedTable.read(spark, root).count() == expect)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("MERGE and dynamic partition overwrite regenerate from raw sources") {
    val root = freshRoot()
    seed(root)
    // MERGE with a RAW source (no ds): INSERT * lands in the right
    // partition; UPDATE SET * moving ts keeps ds in agreement
    Seq((106L, ts("2024-03-08 10:00:00")), (999L, ts("2024-03-09 11:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("gen_src")
    graft.plans.GraftSql.execute(spark,
      s"""MERGE INTO `$root` t USING gen_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = VersionedTable.read(spark, root)
    assert(got.where(col("ds") =!= to_date(col("ts"))).count() == 0,
      "merge left a generated value disagreeing with its base")
    assert(got.where(col("id") === 999L).select("ds").head.getDate(0)
      .toString == "2024-03-09")
    assert(got.where(col("id") === 106L).select("ds").head.getDate(0)
      .toString == "2024-03-08")
    // dynamic partition overwrite with a raw reload frame (no ds)
    VersionedTable.overwritePartitions(spark, root,
      Seq((777L, ts("2024-03-02 05:00:00"))).toDF("id", "ts"))
    val day2 = VersionedTable.read(spark, root)
      .where(col("ds") === lit("2024-03-02").cast("date"))
    assert(day2.count() == 1 &&
      day2.select("id").head.getLong(0) == 777L,
      "overwrite did not replace exactly the touched derived partition")
  }

  test("month-extract generator: equality derives, definitions are immutable") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, ts("2024-01-15 10:00:00")), (2L, ts("2024-02-15 10:00:00")),
        (3L, ts("2024-03-15 10:00:00")))
        .toDF("id", "ts"), root,
      partitionBy = Seq("m"),
      recordProperties = Some(Map(GeneratedCols.Prefix + "m" -> "month(ts)")))
    val v = VersionedTable.currentVersion(spark, root).get
    val (kept, total) = VersionedTable.prunedFiles(spark, root, v,
      col("ts") === lit("2024-02-15 10:00:00").cast("timestamp"))
    assert(total == 3 && kept.size == 1 && kept.head.contains("m=2"),
      s"kept $kept of $total")
    // the generator definition is fixed at birth
    intercept[IllegalArgumentException] {
      VersionedTable.setProperties(spark, root,
        Map(GeneratedCols.Prefix + "m" -> "year(ts)"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.unsetProperties(spark, root,
        Seq(GeneratedCols.Prefix + "m"))
    }
  }

  // ---- STORED GENERATED COLUMNS (expression face) --------------------------

  test("stored expression column: populated on commit and append, " +
    "enforced when caller-provided") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, 120.0), (2L, 40.0)).toDF("id", "amount"), root,
      recordProperties = Some(Map(
        GeneratedCols.ExprPrefix + "band" ->
          "CAST(floor(amount / 50.0) AS INT)")))
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "amount", "band"))
    assert(got.orderBy("id").select("band").as[Int].collect().toSeq == Seq(2, 0))
    // appends populate too
    VersionedTable.commitAppend(Seq((3L, 260.0)).toDF("id", "amount"), root)
    assert(VersionedTable.read(spark, root).where(col("id") === 3L)
      .select("band").as[Int].head() == 5)
    // caller-provided agreeing value passes; disagreeing refused
    VersionedTable.commitAppend(
      Seq((4L, 75.0, 1)).toDF("id", "amount", "band"), root)
    intercept[Exception] {
      VersionedTable.commitAppend(
        Seq((5L, 75.0, 9)).toDF("id", "amount", "band"), root)
    }
    assert(VersionedTable.read(spark, root).count() == 4)
    // definitions are birth-fixed
    intercept[IllegalArgumentException] {
      VersionedTable.setProperties(spark, root,
        Map(GeneratedCols.ExprPrefix + "band" -> "CAST(0 AS INT)"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.unsetProperties(spark, root,
        Seq(GeneratedCols.ExprPrefix + "band"))
    }
  }

  // ---- IDENTITY COLUMNS ----------------------------------------------------

  test("identity: dense monotone allocation across commit and appends; " +
    "explicit values pass through (BY DEFAULT)") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq("a", "b", "c").toDF("name"), root,
      recordProperties = Some(Map(
        GeneratedCols.IdentityPrefix + "sk" -> "100,1")))
    VersionedTable.commitAppend(Seq("d", "e").toDF("name"), root)
    val got = VersionedTable.read(spark, root)
    assert(got.select("sk").as[Long].collect().sorted.toSeq ==
      (100L to 104L).toSeq)
    // the high-water advanced transactionally with each commit
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, v)
      .get(GeneratedCols.IdentityHighPrefix + "sk").contains("104"))
    // explicit values pass through (GENERATED BY DEFAULT semantics) and
    // don't advance the high-water
    VersionedTable.commitAppend(Seq(("f", 9999L)).toDF("name", "sk"), root)
    val v2 = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, v2)
      .get(GeneratedCols.IdentityHighPrefix + "sk").contains("104"))
    // the next allocation continues from the recorded high
    VersionedTable.commitAppend(Seq("g").toDF("name"), root)
    assert(VersionedTable.read(spark, root).where(col("name") === "g")
      .select("sk").as[Long].head() == 105L)
    // the high-water cannot be set or unset manually
    intercept[IllegalArgumentException] {
      VersionedTable.setProperties(spark, root,
        Map(GeneratedCols.IdentityHighPrefix + "sk" -> "1"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.unsetProperties(spark, root,
        Seq(GeneratedCols.IdentityPrefix + "sk"))
    }
  }

  test("UPDATE of a referenced column regenerates stored expression " +
    "columns; explicit SET is enforced; MERGE refuses naming them") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, 100.0), (2L, 200.0)).toDF("id", "amount"), root,
      recordProperties = Some(Map(
        GeneratedCols.ExprPrefix + "band" -> "CAST(floor(amount / 50.0) AS INT)")))
    // COW road: SET amount regenerates band from the post-image
    VersionedTable.updateWhere(spark, root, col("id") === 1L,
      Map("amount" -> lit(900.0)))
    assert(VersionedTable.read(spark, root).where(col("id") === 1L)
      .select("band").as[Int].head() == 18)
    // MOR road too
    VersionedTable.setProperties(spark, root,
      Map("graft.enableDeletionVectors" -> "true"))
    VersionedTable.updateWhere(spark, root, col("id") === 2L,
      Map("amount" -> lit(260.0)), mor = true)
    assert(VersionedTable.read(spark, root).where(col("id") === 2L)
      .select("band").as[Int].head() == 5)
    // explicit SET of the generated column: an agreeing pair passes,
    // a disagreeing pair is refused by the enforcement scan
    VersionedTable.updateWhere(spark, root, col("id") === 1L,
      Map("amount" -> lit(50.0), "band" -> lit(1)))
    intercept[Exception] {
      VersionedTable.updateWhere(spark, root, col("id") === 1L,
        Map("amount" -> lit(75.0), "band" -> lit(9)))
    }
    // MERGE: naming a stored generated column is refused up front
    // (GENERATED ALWAYS — it regenerates; see the merge spec below)
    Seq((1L, 10.0)).toDF("id", "amount").createOrReplaceTempView("genup_src")
    val e = intercept[IllegalArgumentException] {
      graft.plans.GraftSql.execute(spark,
        s"""MERGE INTO `$root` t USING genup_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET band = 0""".stripMargin)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("INSERT OVERWRITE: the change feed carries populated generated and " +
    "identity values, never the raw frame's nulls") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, 100.0)).toDF("id", "amount"), root,
      recordProperties = Some(Map(
        GeneratedCols.ExprPrefix + "band" -> "CAST(floor(amount / 50.0) AS INT)",
        GeneratedCols.IdentityPrefix + "sk" -> "1,1")))
    Seq((10L, 500.0), (11L, 75.0)).toDF("id", "amount")
      .createOrReplaceTempView("genov_src")
    graft.plans.GraftSql.execute(spark,
      s"INSERT OVERWRITE `$root` SELECT * FROM genov_src")
    val v = VersionedTable.currentVersion(spark, root).get
    val ins = VersionedTable.readChanges(spark, root, v, v)
      .where(col("_change_type") === "insert")
      .select("id", "band", "sk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ins.sortBy(_._1).map(t => (t._1, t._2)).toSeq ==
      Seq((10L, 10), (11L, 1)), ins.toSeq.toString)
    assert(ins.map(_._3).toSet == Set(2L, 3L), // overwrite re-allocated above high 1
      s"feed must carry the allocated ids: ${ins.toSeq}")
    // the feed agrees with the table
    val tbl = VersionedTable.read(spark, root)
      .select("id", "band", "sk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(tbl == ins.toSet)
  }

  test("MERGE regenerates stored expression columns and allocates " +
    "identity for its inserts (the surrogate-key flow)") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, 100.0), (2L, 200.0)).toDF("id", "amount"), root,
      recordProperties = Some(Map(
        GeneratedCols.ExprPrefix + "band" -> "CAST(floor(amount / 50.0) AS INT)",
        GeneratedCols.IdentityPrefix + "sk" -> "10,1")))
    Seq((2L, 900.0), (3L, 75.0)).toDF("id", "amount")
      .createOrReplaceTempView("genid_merge_src")
    graft.plans.GraftSql.execute(spark,
      s"""MERGE INTO `$root` t USING genid_merge_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET amount = s.amount
         |WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)
         |""".stripMargin)
    val got = VersionedTable.read(spark, root).orderBy("id")
      .select("id", "amount", "band", "sk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
    // the update moved the base: band regenerated (900/50 = 18); the
    // insert computed its own (75/50 = 1); the untouched row recomputed
    // to itself
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, 100.0, 2), (2L, 900.0, 18), (3L, 75.0, 1)), got.toSeq.toString)
    // identity: carried rows keep their ids, the insert allocated above
    // the recorded high (seed batch took 10 and 11)
    val sks = got.map(_._4)
    assert(sks.toSet == Set(10L, 11L, 12L) && sks(2) == 12L, s"sks: ${sks.toSeq}")
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, v)
      .get(GeneratedCols.IdentityHighPrefix + "sk").contains("12"))
    // the feed's insert row carries the allocated id, not null
    val ins = VersionedTable.readChanges(spark, root, v, v)
      .where(col("_change_type") === "insert")
      .select("sk").as[Long].collect()
    assert(ins.toSeq == Seq(12L))
    // and the postimage feed carries the regenerated band
    val post = VersionedTable.readChanges(spark, root, v, v)
      .where(col("_change_type") === "update_postimage")
      .select("band").as[Int].collect()
    assert(post.toSeq == Seq(18))
  }

  test("MERGE identity is decided PER ACTION: an UPDATE assigning the " +
    "column never suppresses allocation for an INSERT that omits it") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, 100.0), (2L, 200.0)).toDF("id", "amount"), root,
      recordProperties = Some(Map(
        GeneratedCols.IdentityPrefix + "sk" -> "10,1")))
    // seed allocated sk 10, 11 — high = 11
    Seq((2L, 900.0, 77L), (3L, 75.0, 0L)).toDF("id", "amount", "sk")
      .createOrReplaceTempView("genid_peract_src")
    graft.plans.GraftSql.execute(spark,
      s"""MERGE INTO `$root` t USING genid_peract_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET amount = s.amount, sk = s.sk
         |WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)
         |""".stripMargin)
    val got = VersionedTable.read(spark, root).orderBy("id")
      .select("id", "sk").as[(Long, Long)].collect().toSeq
    // the matched row took its EXPLICIT update (77); the insert row —
    // whose action omits sk — ALLOCATED above the high, never null
    // (the pooled pre-fix form let the update's assignment suppress it)
    assert(got == Seq((1L, 10L), (2L, 77L), (3L, 12L)), got.toString)
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, v)
      .get(GeneratedCols.IdentityHighPrefix + "sk").contains("12"))
    // the feed's insert row carries the allocated id too
    val ins = VersionedTable.readChanges(spark, root, v, v)
      .where(col("_change_type") === "insert")
      .select("sk").as[Long].collect()
    assert(ins.toSeq == Seq(12L))
  }

  test("MERGE identity, MIXED insert actions: the assigning action keeps " +
    "its explicit value per row, the omitting action allocates") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, 100.0)).toDF("id", "amount"), root,
      recordProperties = Some(Map(
        GeneratedCols.IdentityPrefix + "sk" -> "10,1")))
    // seed allocated sk 10 — high = 10
    Seq((3L, 75.0), (4L, 33.0)).toDF("id", "amount")
      .createOrReplaceTempView("genid_mixed_src")
    graft.plans.GraftSql.execute(spark,
      s"""MERGE INTO `$root` t USING genid_mixed_src s ON t.id = s.id
         |WHEN NOT MATCHED AND s.id = 3
         |  THEN INSERT (id, amount, sk) VALUES (s.id, s.amount, 500)
         |WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)
         |""".stripMargin)
    val bySk = VersionedTable.read(spark, root).select("id", "sk")
      .as[(Long, Long)].collect().toMap
    assert(bySk(1L) == 10L && bySk(3L) == 500L, bySk.toString)
    // the omitting action's row allocated above the high; candidate ids
    // are handed to every insert row in batch order, so the explicit
    // row's discarded candidate may leave a gap — permitted by the
    // BY DEFAULT contract (aborted commits already gap)
    assert(bySk(4L) == 11L || bySk(4L) == 12L, bySk.toString)
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, v)
      .get(GeneratedCols.IdentityHighPrefix + "sk").contains("12"))
  }

  test("identity: concurrent allocating writers never collide — the basis " +
    "re-validates inside the claim and the loser retries") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq("seed").toDF("name"), root,
      recordProperties = Some(Map(
        GeneratedCols.IdentityPrefix + "sk" -> "1,1")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val writers = (1 to 4).map { w =>
      Future {
        VersionedTable.commitAppend(
          (1 to 25).map(i => s"w$w-$i").toDF("name"), root)
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    val ids = VersionedTable.read(spark, root).select("sk").as[Long]
      .collect().sorted.toSeq
    // 1 seed + 4×25 appended: every id unique, and DENSE — each loser
    // re-allocated above the winner's recorded high instead of colliding
    assert(ids == (1L to 101L).toSeq,
      s"expected dense 1..101, got ${ids.size} ids, " +
        s"dupes=${ids.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted}")
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.propertiesOf(spark, root, v)
      .get(GeneratedCols.IdentityHighPrefix + "sk").contains("101"))
  }
}
