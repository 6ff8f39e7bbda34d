package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded time-range join: pair rows whose timestamps fall within a band,
  * WITHOUT an equi-key (SURVEY.md §2b q15). Plain `a JOIN b ON b.ts BETWEEN
  * a.ts - x AND a.ts + y` has no equi-condition, so Spark would pick a
  * broadcast-nested-loop / cartesian plan — O(|a|·|b|) comparisons and a
  * broadcast of a whole table. The classic scalable formulation buckets the
  * time axis: each right row lands in one bucket (`ts div bucket`), each
  * left row fans out to the few buckets its band overlaps, and the join
  * becomes an equi-join on the bucket id followed by the exact band filter.
  *
  * With `bucketUs` ≈ the band width, a left row explodes to at most
  * `(before+after)/bucket + 1` buckets (3 for a symmetric band), so the
  * pair space is |matches| + O(|a|·density) instead of |a|·|b|, and the
  * only shuffle keys on the bucket id — a sort-merge/hash join that scales
  * horizontally. Time-skew (hot buckets) is AQE skew-join territory; at
  * extreme skew, salt the bucket id.
  *
  * The same banding idea is how Flink implements interval joins and how
  * range-join hints work in other engines (bin size = bucketUs).
  */
object RangeJoin {

  /** Pairs (left, right) with
    * `right.ts ∈ [left.ts - beforeUs, left.ts + afterUs]` (inclusive).
    *
    * Output: every left column, plus every right column suffixed by
    * `rightSuffix`. Caller filters self-pairs if left and right are the
    * same table.
    *
    * @param bucketUs band bucket width in microseconds; defaults to the
    *                 full band width (≤3 buckets per left row).
    */
  def timeBand(
      left: DataFrame,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      beforeUs: Long,
      afterUs: Long,
      rightSuffix: String = "_r",
      bucketUs: Long = 0L): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      "band must be non-empty")
    val bucket = if (bucketUs > 0) bucketUs else beforeUs + afterUs
    def b(us: Column): Column = floorDiv(us, lit(bucket))

    val lus = unix_micros(col(leftTs))
    val l = left
      .withColumn("__lus", lus)
      .withColumn("__bkt",
        explode(sequence(b(lus - lit(beforeUs)), b(lus + lit(afterUs)))))
    val rCols = right.columns.toIndexedSeq
    val r = right
      .select(rCols.map(c => col(c).as(c + rightSuffix)) :+
        unix_micros(col(rightTs)).as("__rus"): _*)
      .withColumn("__bkt", b(col("__rus")))

    // each right row has exactly ONE bucket, so a matching pair joins once
    l.join(r, "__bkt")
      .filter(col("__rus") >= col("__lus") - lit(beforeUs) &&
        col("__rus") <= col("__lus") + lit(afterUs))
      .drop("__bkt", "__lus", "__rus")
  }

  /** Floor division as a Column, in exact integer arithmetic (Spark's
    * `div` truncates toward zero; timestamps here are post-1970 so
    * positive, but keep it correct for pre-epoch data too):
    * floorDiv(a,b) = (a - pmod(a,b)) / b with pmod always ≥ 0; the division
    * is exact (the dividend is a multiple of b, correctly-rounded IEEE
    * division of exactly-representable operands yields the integer). */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")
}
