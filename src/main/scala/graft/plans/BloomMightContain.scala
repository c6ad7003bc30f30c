package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a broadcast sketch.
  *
  * Replaces the Scala-UDF probe in [[graft.operators.BloomPrefilter]]: a UDF
  * breaks the whole-stage-codegen span of the scan+filter stage and boxes
  * every key; this expression stays inside the generated loop. The
  * expression captures the `Broadcast` HANDLE, not the sketch — the plan
  * that ships with every task serializes to a few bytes, and the sketch
  * itself moves once per executor through broadcast machinery (exactly like
  * a broadcast-hash-join build side).
  *
  * Key representation must match what `DataFrame.stat.bloomFilter` put, or
  * false negatives would break the no-lost-rows contract:
  *  - integral keys probe `mightContainLong` (the builder's put for them);
  *  - strings: the sketch library defines `putString`/`mightContainString`
  *    as UTF-8-bytes delegation to the binary path (BloomFilterBase
  *    bytecode), so probing `mightContainBinary(utf8.getBytes)` is
  *    value-identical and skips the per-row `java.lang.String` round-trip;
  *  - binary probes `mightContainBinary` directly.
  */
case class BloomMightContain(
    child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom probe supports integral/string/binary keys, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bloom.value.mightContainBinary(v.asInstanceOf[Array[Byte]])
    case _ => bloom.value.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcName = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per generated class instance, not per row
    val filterName = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcName.value();")
    val probe: String => String = child.dataType match {
      case StringType => c => s"$filterName.mightContainBinary($c.getBytes())"
      case BinaryType => c => s"$filterName.mightContainBinary($c)"
      case _ => c => s"$filterName.mightContainLong((long) $c)"
    }
    defineCodeGen(ctx, ev, probe)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def expr(key: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloom))
}
