package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit MD5-prefix hash as one expression.
  *
  * Value-identical to `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15
  * hex chars are the first 7.5 digest bytes, i.e. the big-endian top-8-bytes
  * long shifted right by 4 — but computed directly from the digest bytes:
  * no hex-string materialization, no base-conversion string parse. The DuckDB
  * oracle identity (`CAST('0x' || substr(md5(s),1,15) AS BIGINT)`) is
  * unchanged and asserted in tests.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Md5Prefix60.hash(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of MD5: big-endian first-8-bytes long, logically shifted
    * right 4 — always non-negative.
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (d(i) & 0xffL)
      i += 1
    }
    acc >>> 4
  }

  def expr(c: Column): Column = ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(c)))
}
