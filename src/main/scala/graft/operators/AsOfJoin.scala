package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload of the
  * latest right row with the same key and `rightTs <= leftTs` (inclusive).
  *
  * Spark has no native as-of join; the scalable formulation is the
  * union-and-window trick (the same one Flink/kdb-style engines compile to):
  * tag both sides, union, then `last(payload, ignoreNulls)` over a window
  * partitioned by key and ordered by (ts, side) — right rows sort BEFORE
  * left rows at equal timestamps, making the match inclusive.
  *
  * Why not a range join? `l JOIN r ON key AND r.ts <= l.ts` + max-per-left
  * explodes to O(|l|·|r| per key) intermediate rows; the union-window plan
  * is a SINGLE shuffle on the key with linear row count, survives 100× the
  * data, and never materializes candidate pairs.
  *
  * Caveat (documented semantic): right rows whose payload value is NULL are
  * skipped by `ignoreNulls` — treat NULL payloads as "no observation".
  */
object AsOfJoin {

  /** @param payload  right columns to carry onto left rows (each emitted as
    *                 `outPrefix + name`; `rightTs` is always carried)
    * @param rightSeq deterministic tiebreak among right rows with equal
    *                 timestamps (must cast to long); latest wins
    */
  def asOfJoin(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      payload: Seq[String],
      rightSeq: Option[String] = None,
      outPrefix: String = "asof_"): DataFrame = {
    val lSchema = left.schema
    val rSchema = right.schema
    val leftCols = left.columns.toSeq
    val payloadOut = (rightTs +: payload).map(c => c -> (outPrefix + c))

    val lRows = left.select(
      leftCols.map(col) ++
        payloadOut.map { case (src, out) => lit(null).cast(rSchema(src).dataType).as(out) } ++
        Seq(col(leftTs).as("__t"), col(leftKey).as("__k"),
          lit(1).as("__side"), lit(0L).as("__seq")): _*)

    val rRows = right.select(
      leftCols.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        payloadOut.map { case (src, out) => col(src).as(out) } ++
        Seq(col(rightTs).as("__t"), col(rightKey).as("__k"),
          lit(0).as("__side"),
          rightSeq.map(col(_).cast("long")).getOrElse(lit(0L)).as("__seq")): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    payloadOut
      .foldLeft(lRows.unionByName(rRows)) { case (df, (_, out)) =>
        df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
      }
      .filter(col("__side") === 1)
      .drop("__t", "__k", "__side", "__seq")
  }
}
