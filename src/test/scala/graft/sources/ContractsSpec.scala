package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Schema-contract enforcement: structural drift fails before execution,
  * row violations either stop the job or route to quarantine with
  * reasons. */
class ContractsSpec extends SparkSpec {

  import spark.implicits._

  private val contract = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("amount", DoubleType, nullable = true),
    StructField("status", StringType, nullable = true)))

  // raw ingest shape: everything arrives as strings (CSV-like)
  private def raw(rows: (String, String, String)*) =
    rows.toDF("id", "amount", "status")

  test("clean input passes enforce and comes out with the contract schema") {
    val out = Contracts.enforce(raw(("1", "2.5", "OPEN")), contract)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      contract.map(f => (f.name, f.dataType)))
    assert(out.count() == 1)
    // an empty string is NOT silently nulled — it is a cast violation
    val empty = Contracts.enforce(raw(("2", "", "DONE")), contract)
    intercept[Exception] { empty.collect() }
  }

  test("enforce passes genuinely clean rows through, cast to target types") {
    val out = Contracts.enforce(raw(("1", "2.5", "OPEN"), ("2", "3.0", "DONE")), contract)
    val rows = out.orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 2.5, "OPEN"), (2L, 3.0, "DONE")))
  }

  test("enforce fails the job on an uncastable value") {
    val bad = Contracts.enforce(raw(("1", "2.5", "OPEN"), ("x", "3.0", "DONE")), contract)
    // assert_true surfaces as SparkRuntimeException (local) or
    // SparkException (task failure on a cluster) — match the message
    val e = intercept[Exception] { bad.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("contract violation")), msgs(e).mkString(" | "))
  }

  test("quarantine routes violating rows with reasons, keeps originals") {
    val (valid, rejected) = Contracts.quarantine(
      raw(("1", "2.5", "OPEN"), ("x", "3.0", "DONE"), ("3", "oops", "HOLD"), (null, "1.0", "A")),
      contract)
    val ok = valid.orderBy("id").collect()
    assert(ok.map(_.getLong(0)).toSeq == Seq(1L))
    assert(ok.head.getDouble(1) == 2.5)

    val rej = rejected.orderBy("id").collect()
    assert(rej.length == 3)
    // original (uncast) values preserved for repair
    val byId = rej.map(r => Option(r.getString(0)).getOrElse("<null>") ->
      r.getSeq[String](r.fieldIndex("__violations"))).toMap
    assert(byId("x").exists(_.startsWith("id: not a bigint")))
    assert(byId("3").exists(_.startsWith("amount: not a double")))
    assert(byId("<null>").exists(_.contains("null in non-null column")))
  }

  test("structural drift (missing declared column) throws before execution") {
    val e = intercept[Contracts.ContractViolationException] {
      Contracts.enforce(Seq(("1", "2.5")).toDF("id", "amount"), contract)
    }
    assert(e.getMessage.contains("status"))
  }

  test("undeclared extra columns are dropped, not drift") {
    val df = Seq(("1", "2.5", "OPEN", "extra")).toDF("id", "amount", "status", "junk")
    val out = Contracts.enforce(df, contract)
    assert(out.columns.toSeq == Seq("id", "amount", "status"))
    assert(out.count() == 1)
  }

  test("timestamp contracts flag unparseable datetimes") {
    val c = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("at", TimestampType, nullable = true)))
    val (valid, rejected) = Contracts.quarantine(
      Seq(("1", "2024-06-01 10:00:00"), ("2", "2024-13-99 99:00:00"), ("3", "soon"))
        .toDF("id", "at"), c)
    assert(valid.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val reasons = rejected.collect()
      .map(r => r.getString(0) -> r.getSeq[String](r.fieldIndex("__violations"))).toMap
    assert(reasons("2").exists(_.startsWith("at: not a timestamp")))
    assert(reasons("3").exists(_.startsWith("at: not a timestamp")))
  }

  test("quarantine of a fully clean frame is empty and cheap") {
    val (valid, rejected) = Contracts.quarantine(
      raw(("1", "1.0", "A"), ("2", "2.0", "B")), contract)
    assert(valid.count() == 2 && rejected.count() == 0)
  }
}
