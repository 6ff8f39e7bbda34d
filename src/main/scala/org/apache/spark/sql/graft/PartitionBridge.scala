package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

/** Bridge for CLAIMING a physical distribution on rows that are already
  * laid out that way (graft's recorded hash-bucket layout: file `b` of
  * a bucketized snapshot holds exactly the rows with
  * `pmod(murmur3(key), n) = b`).
  *
  * Mechanism: assemble the bucket-ordered partitions with the PLAIN
  * `SparkContext.union` (partitioner-free children concatenate one
  * partition per child, in order — the SQL-level Union must NOT be used
  * here: Spark 4's UnionExec builds a partitioning-aware union that
  * MERGES equally-partitioned children instead of concatenating them),
  * then record `HashPartitioning(key, n)` as a [[LogicalRDD]]'s
  * outputPartitioning — the construction `Dataset.checkpoint` uses to
  * preserve partitioning across a lineage cut (public Spark source),
  * reachable only from this `private[sql]` shim package.
  * EnsureRequirements then sees a satisfied ClusteredDistribution on
  * that side of a key-equi join and inserts NO exchange there.
  *
  * CONTRACT (the caller proves it by construction): `parts(i)` contains
  * only rows with `pmod(murmur3_hash(key, 42), n) = i`, in the row
  * layout of `schema` — murmur3 seed 42 is what
  * `Dataset.repartition(n, col(key))` distributed by when the layout
  * was written, what `functions.hash` computes, and what
  * `HashPartitioning.partitionIdExpression` re-derives. A false claim
  * silently mis-joins; never call this on a layout not written by that
  * exact partitioning. */
object PartitionBridge {
  def claimHashPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      schema: StructType,
      parts: Seq[RDD[InternalRow]],
      key: String): DataFrame = {
    val sess = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    require(parts.forall(_.partitioner.isEmpty) &&
      parts.forall(_.getNumPartitions == 1),
      "each bucket must arrive as exactly one partitioner-free partition")
    val union = sess.sparkContext.union(parts)
    val attrs = DataTypeUtils.toAttributes(schema)
    val attr = attrs.find(_.name.equalsIgnoreCase(key)).getOrElse(
      throw new IllegalArgumentException(
        s"no column $key in ${schema.fieldNames.mkString(", ")}"))
    val plan = new LogicalRDD(
      attrs, union, HashPartitioning(Seq(attr), parts.size), Nil,
      false, None)(sess, None, None)
    org.apache.spark.sql.classic.Dataset.ofRows(sess, plan)
  }

  /** Per-partition CONCATENATION of two frames already laid out in the
    * same n-bucket hash layout of `key` (e.g. the survivors and inserts
    * branches of a merge whose join ran on a claimed bucket-aligned
    * target: SMJ partition i holds only keys hashing to bucket i on
    * BOTH branches). The SQL-level union cannot express this — it either
    * concatenates 2n partitions (losing the bucket↔part-index map the
    * layout's purity stamp depends on) or forces a repartition that
    * moves every written byte through an exchange. zipPartitions keeps
    * n partitions with partition i = a_i ++ b_i — bucket-pure by the
    * inputs' construction — and the claim rides on top as in
    * [[claimHashPartitioned]]. None when either side does not arrive as
    * exactly n partitions (an optimizer reshape; callers fall back to
    * the explicit repartition, which is always correct).
    *
    * Why the count guard suffices: the alignment could only break if
    * the CLAIMED side stopped driving the join's partitioning. It can't
    * be broadcast away — statically the claimed [[LogicalRDD]] reports
    * the default (huge) size estimate, and adaptively only materialized
    * SHUFFLE stages gain runtime stats, which a claimed scan never is.
    * A broadcast of the SOURCE side keeps the claimed side streamed
    * (partitioning preserved), and AQE cannot coalesce the source's
    * exchange when its join sibling is a non-shuffle leaf. Any exotic
    * reshape that slips past all of that still changes the partition
    * count away from n and lands in the fallback. */
  def alignedConcat(
      spark: org.apache.spark.sql.SparkSession,
      a: DataFrame, b: DataFrame,
      key: String, n: Int): Option[DataFrame] = {
    val sameShape = a.schema.map(f => (f.name, f.dataType)) ==
      b.schema.map(f => (f.name, f.dataType))
    if (!sameShape) return None
    val ra = a.queryExecution.toRdd
    val rb = b.queryExecution.toRdd
    if (ra.getNumPartitions != n || rb.getNumPartitions != n) None
    else {
      val sess = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val zipped = ra.zipPartitions(rb)((x, y) => x ++ y)
      val attrs = DataTypeUtils.toAttributes(a.schema)
      val attr = attrs.find(_.name.equalsIgnoreCase(key)).getOrElse(
        throw new IllegalArgumentException(
          s"no column $key in ${a.schema.fieldNames.mkString(", ")}"))
      val plan = new LogicalRDD(
        attrs, zipped, HashPartitioning(Seq(attr), n), Nil,
        false, None)(sess, None, None)
      Some(org.apache.spark.sql.classic.Dataset.ofRows(sess, plan))
    }
  }

  /** A frame's internal rows as ONE partition (the per-bucket reads
    * feeding [[claimHashPartitioned]]) — RDD-level coalesce, so no SQL
    * optimizer pass can re-shape it. */
  def onePartition(df: DataFrame): RDD[InternalRow] = {
    val r = df.queryExecution.toRdd
    if (r.getNumPartitions == 1) r else r.coalesce(1, shuffle = false)
  }

  /** An empty single partition in `schema`'s layout (an untouched or
    * empty bucket). */
  def emptyPartition(
      spark: org.apache.spark.sql.SparkSession): RDD[InternalRow] =
    spark.sparkContext.parallelize(Seq.empty[InternalRow], 1)
}
