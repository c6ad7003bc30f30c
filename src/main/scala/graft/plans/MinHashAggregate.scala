package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.Hashing

/** MinHash signature as ONE imperative aggregate.
  *
  * The declarative alternative — `numPerm` separate `min((a_i*h+b_i)%P)`
  * aggregate columns — works but generates enormous codegen output (one
  * buffer field + update expression per permutation), whose janino
  * compilation dominates cold-start and whose buffer handling dominates the
  * hot loop. This aggregate keeps the whole signature in a single
  * `Array[Long]` buffer updated in a tight while loop; map-side partial
  * aggregation (merge = element-wise min) still applies, so each document's
  * shingles collapse before the shuffle.
  *
  * Input: the 60-bit shingle hash (graft.functions.Hashing.hash60).
  * Output: ARRAY<BIGINT> of length numPerm, h_i = min over shingles of
  * (a_i * (h mod P) + b_i) mod P — identical values to the declarative form
  * and the DuckDB oracle.
  */
case class MinHashSignature(
    child: Expression,
    numPerm: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val as: Array[Long] = Array.tabulate(numPerm)(Hashing.permA)
  @transient private lazy val bs: Array[Long] = Array.tabulate(numPerm)(Hashing.permB)

  override def createAggregationBuffer(): Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hm = v.asInstanceOf[Long] % Hashing.P
      var i = 0
      while (i < numPerm) {
        val h = (as(i) * hm + bs(i)) % Hashing.P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashAggregate {
  /** Column-level MinHash signature aggregate over a shingle-hash column. */
  def minhashSignature(h: Column, numPerm: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(h), numPerm).toAggregateExpression())
}
