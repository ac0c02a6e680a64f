package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `vec_sum(v ARRAY<DOUBLE>)` — element-wise sum of equal-length vectors
 * as a [[TypedImperativeAggregate]]: each partition folds its rows into
 * ONE d-length accumulator (update), partials merge element-wise, and
 * only d doubles cross the shuffle per group.
 *
 * This replaces the `posexplode → groupBy(group, dim) → sum` centroid
 * update in [[graft.operators.Clustering]]: the explode form pushes
 * n·d (row, dim) tuples through the partial aggregation — 128M tuples
 * per Lloyd pass at 2M 64-dim vectors — where this aggregate touches
 * each row once. Exactness: Clustering's quantized vectors are
 * integer-valued doubles with |sum| < 2^53 (see that object's
 * Scaladoc), so element-wise addition is EXACT in any order — the
 * update/merge reorder across partitions cannot change a bit, which is
 * the same invariant the explode form already relied on.
 *
 * Null rows are skipped; a null ELEMENT is an error (the clustering
 * quantizer never produces one); mixed lengths error loudly rather
 * than silently truncating. Empty input → empty array (callers using
 * groupBy never see it — a group exists only with ≥ 1 row).
 */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def prettyName: String = "vec_sum"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum needs ARRAY<DOUBLE>, got $other")
    }
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val acc = if (buf.length == 0) new Array[Double](n) else buf
    require(acc.length == n,
      s"vec_sum: mixed vector lengths (${acc.length} vs $n)")
    var i = 0
    while (i < n) { acc(i) += v.getDouble(i); i += 1 }
    acc
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"vec_sum: mixed vector lengths (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}
