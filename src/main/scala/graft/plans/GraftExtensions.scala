package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions as
  * SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works and
  * plain SQL users get the codegen'd hot paths — plus the
  * [[BandJoinRewrite]] optimizer rule that turns naive band-join
  * predicates into bucketed equi-joins.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
object GraftExtensions {
  /** Register the graft functions + optimizer rule on a live session (for
    * sessions built without `spark.sql.extensions`). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.ColumnBridge.installFunctions(spark, new GraftExtensions)
    if (!spark.experimental.extraOptimizations.contains(BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinRewrite
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BandJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double-precision dot product of two float/double arrays"),
      (args: Seq[Expression]) => FloatDotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "graft_poly_hash(s) - rolling polynomial hash (base 31 mod 1e9+7) of a string's bytes"),
      (args: Seq[Expression]) => PolyHash(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash_array"),
      info("graft_poly_hash_array", "graft_poly_hash_array(arr) - polynomial hash of each string in an array"),
      (args: Seq[Expression]) => PolyHashArray(args(0))))
  }
}
