package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** SimHash fingerprint as a native typed aggregate (the guide's
  * TypedImperativeAggregate pattern): per group, fold every element of the
  * input hash arrays into `bits` signed bit-counters; the fingerprint sets
  * bit j iff counter j ends positive.
  *
  * Value-identical to the relational formulation
  * (explode + Σ((x>>j & 1)·2−1) per bit + assemble), but with NO explode:
  * the shingle arrays never fan out into rows, partial aggregation folds
  * arrays map-side, and merge is an O(bits) vector add — at corpus scale
  * this removes a ~shingles-per-doc row blowup before the shuffle.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<bigint>, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val x = arr.getLong(i)
          var j = 0
          while (j < bits) {
            buf(j) += ((x >> j) & 1L) * 2L - 1L
            j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}
