package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint as ONE imperative aggregate (same motivation as
  * [[MinHashSignature]]: `nBits` separate `sum(case ...)` columns generate
  * pathological codegen; a single Array[Long] bit-balance buffer doesn't).
  *
  * Input: a 60-bit token hash. Buffer: per-bit balance counters
  * (+1 if the bit is set, −1 otherwise). Output: the fingerprint long with
  * bit j set iff balance(j) > 0 — identical to the declarative form and the
  * DuckDB oracle.
  */
case class SimHashAggregate(
    child: Expression,
    nBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < nBits) {
        buf(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nBits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var j = 0
    while (j < nBits) {
      if (buf(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nBits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nBits)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAggregate =
    copy(child = newChild)
}

object SimHashAggregate {
  /** Column-level SimHash fingerprint aggregate over a token-hash column. */
  def simhash(h: Column, nBits: Int): Column =
    ColumnBridge.column(
      SimHashAggregate(ColumnBridge.expression(h), nBits).toAggregateExpression())
}
