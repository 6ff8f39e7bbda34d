package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Named CHECK constraints (Delta invariants): recorded per version next
  * to the schema, validated over the WHOLE table when added, enforced
  * against every staged write afterwards (one columnar pass over the
  * batch, whatever the constraint count), carried by every commit path,
  * and dropped by name. NULL passes — ANSI CHECK semantics — so
  * non-nullability is `c IS NOT NULL`. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_constraints").toString + "/t"

  private def seed(root: String): Unit =
    VersionedTable.commit(
      (1L to 50L).map(i => (i, s"r$i", i * 10)).toDF("id", "x", "amount"), root)

  test("violating append refused before any shared state; passing append lands") {
    val root = freshRoot(); seed(root)
    val v = VersionedTable.addConstraint(spark, root, "amount_pos", "amount > 0")
    assert(VersionedTable.constraintsOf(spark, root, v) ==
      Map("amount_pos" -> "amount > 0"))
    val e = intercept[VersionedTable.ConstraintViolationException] {
      VersionedTable.commitAppend(
        Seq((51L, "bad", -5L)).toDF("id", "x", "amount"), root)
    }
    assert(e.getMessage.contains("amount_pos") && e.getMessage.contains("1 row"))
    // the refused write left nothing behind: same version, same rows
    assert(VersionedTable.currentVersion(spark, root).contains(v))
    assert(VersionedTable.read(spark, root).count() == 50)
    VersionedTable.commitAppend(
      Seq((51L, "ok", 510L)).toDF("id", "x", "amount"), root)
    assert(VersionedTable.read(spark, root).count() == 51)
  }

  test("adding a constraint existing rows violate is refused; NULL passes") {
    val root = freshRoot(); seed(root)
    intercept[VersionedTable.ConstraintViolationException] {
      VersionedTable.addConstraint(spark, root, "small", "amount < 100")
    }
    // NULL result = pass (ANSI CHECK): a constraint over a non-matching
    // CASE passes everywhere
    VersionedTable.addConstraint(spark, root, "null_passes",
      "CASE WHEN id < 0 THEN false END")
    // ... and NOT NULL is expressed explicitly
    VersionedTable.addConstraint(spark, root, "x_not_null", "x IS NOT NULL")
    val bad = Seq((99L, null.asInstanceOf[String], 1L)).toDF("id", "x", "amount")
    intercept[VersionedTable.ConstraintViolationException] {
      VersionedTable.commitAppend(bad, root)
    }
  }

  test("constraints survive DML, maintenance, and updates that respect them") {
    val root = freshRoot(); seed(root)
    VersionedTable.addConstraint(spark, root, "amount_pos", "amount > 0")
    VersionedTable.deleteWhere(spark, root, col("id") === 3L)
    VersionedTable.updateWhere(spark, root, col("id") === 4L,
      Map("amount" -> lit(9999L)))
    VersionedTable.compact(spark, root)
    val cur = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.constraintsOf(spark, root, cur)
      .contains("amount_pos"))
    // an UPDATE writing a violating value is refused mid-commit
    intercept[VersionedTable.ConstraintViolationException] {
      VersionedTable.updateWhere(spark, root, col("id") === 5L,
        Map("amount" -> lit(-1L)))
    }
    assert(VersionedTable.read(spark, root)
      .where(col("id") === 5L).head.getLong(2) == 50L)
    // drop: unknown name throws, known name removes enforcement
    intercept[IllegalArgumentException] {
      VersionedTable.dropConstraint(spark, root, "nope")
    }
    VersionedTable.dropConstraint(spark, root, "amount_pos")
    VersionedTable.commitAppend(
      Seq((52L, "neg", -1L)).toDF("id", "x", "amount"), root)
    assert(VersionedTable.read(spark, root).where(col("amount") < 0).count() == 1)
  }

  test("SQL face: ALTER TABLE ADD/DROP CONSTRAINT + DESCRIBE CONSTRAINTS") {
    val root = freshRoot(); seed(root)
    graft.plans.GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD CONSTRAINT amount_pos CHECK (amount > 0)")
    graft.plans.GraftSql.execute(spark,
      s"ALTER TABLE '$root' ADD CONSTRAINT id_pos CHECK (id > 0)")
    val shown = graft.plans.GraftSql.execute(spark,
      s"DESCRIBE CONSTRAINTS '$root'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == Map("amount_pos" -> "amount > 0", "id_pos" -> "id > 0"))
    intercept[VersionedTable.ConstraintViolationException] {
      graft.plans.GraftSql.execute(spark,
        s"UPDATE `$root` SET amount = -7 WHERE id = 1")
    }
    graft.plans.GraftSql.execute(spark,
      s"ALTER TABLE '$root' DROP CONSTRAINT amount_pos")
    assert(graft.plans.GraftSql.execute(spark,
      s"DESCRIBE CONSTRAINTS '$root'").collect().length == 1)
  }
}
