package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector ops over `array<float>` embedding columns (SURVEY.md §2c/§2d).
  *
  * Elements are cast float→double (exact) and folded SEQUENTIALLY with a
  * 0.0 seed — the identical order a SQL engine's left-fold
  * (`list_reduce`) uses, so results are bit-identical across engines and
  * safe for the driver's exact-value oracle compare. Higher-order
  * functions keep this fully columnar (no UDF, no boxing of the whole
  * array into Scala).
  */
object VectorFunctions {

  /** Dot product in double precision, sequential left-to-right sum —
    * computed by the native codegen'd expression
    * [[graft.plans.FloatDotProduct]] (no per-pair array allocation).
    * Bit-identical to [[dotHof]], the declarative reference formulation. */
  def dotD(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.FloatDotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Higher-order-function dot product (the engine-neutral reference the
    * oracles mirror; [[dotD]] must stay bit-identical to it). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dotD(a, a)

  /** Cosine similarity: dot / sqrt(|a|²·|b|²). Callers joining many pairs
    * should pre-materialize `norm2` per side and use [[cosineFromNorms]]
    * so each norm is computed once per vector, not once per pair. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / sqrt(norm2(a) * norm2(b))

  /** Cosine from a pair dot product and pre-computed squared norms. */
  def cosineFromNorms(dot: Column, na2: Column, nb2: Column): Column =
    dot / sqrt(na2 * nb2)
}
