package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * vec_sum — elementwise sum of `array<float>` vectors as a native
 * TypedImperativeAggregate, with double accumulation.
 *
 * The composition alternative (posexplode -> groupBy(key, dim) -> sum ->
 * re-assemble) multiplies the shuffled row count by the vector
 * dimensionality (64-dim embeddings -> a 64x bigger exchange). This
 * aggregate keeps ONE buffer row per group with map-side partial merge —
 * the per-label centroid of a 100 TB embedding table shuffles |labels| x
 * dim doubles, nothing more.
 *
 * Null/empty vectors are ignored; vectors of differing lengths accumulate
 * over the longer length. SQL sum semantics hold per position: a position
 * that only ever saw null (or missing-tail) elements yields a null
 * element, exactly like the posexplode -> groupBy(pos) -> sum composition
 * and the oracle's unnest. An all-null group yields null.
 *
 * Buffer layout: interleaved [sum0, cnt0, sum1, cnt1, ...].
 */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = grow(buf, 2 * n)
      var i = 0
      // null elements are skipped AND uncounted, so a position that only
      // ever saw nulls evals to null — SQL sum semantics per position
      while (i < n) {
        if (!arr.isNullAt(i)) {
          out(2 * i) += arr.getFloat(i).toDouble
          out(2 * i + 1) += 1.0
        }
        i += 1
      }
      out
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val out = grow(b1, b2.length)
    var i = 0
    while (i < b2.length) { out(i) += b2(i); i += 1 }
    out
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](buf.length / 2) { i =>
        if (buf(2 * i + 1) == 0.0) null else buf(2 * i)
      })

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSum =
    copy(child = newChildren.head)
}

object VectorAggregates {

  /** Column binding: vec_sum(embedding) usable inside agg(...). */
  def vecSum(v: Column): Column =
    ColumnBridge.column(
      VecSum(ColumnBridge.expression(v)).toAggregateExpression())
}
