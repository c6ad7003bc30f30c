package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused symmetric-int8 quantization report: one codegen'd pass per vector
  * computing everything [[graft.operators.Similarity.quantizeInt8]] needs —
  * `struct(amax, q_min, q_max, recon_cosine)`.
  *
  * The composable form (three `transform` lambdas + `array_min`/`array_max`
  * + DotProduct cosine over a derived dequant array) evaluates the lambdas
  * interpreted — a per-element closure dispatch outside whole-stage codegen,
  * and it materializes two intermediate arrays per row. This expression is
  * the same arithmetic in a primitive loop: identical operation ORDER
  * (abs-max scan; round-half-up via `floor(x*scale + 0.5)`; left-to-right
  * double accumulation for the x·d, x·x, d·d sums exactly like
  * [[DotProduct]]), so every output double is bit-identical to the lambda
  * form and the DuckDB oracle.
  *
  * Empty vectors report `amax = 0` (callers filter `amax > 0`, which also
  * matches the lambda form where `array_max(empty) = null` fails the same
  * predicate). A vector containing ANY null element yields a NULL report —
  * a partial vector has no well-defined quantization, and returning null
  * (rather than reading the null slot as garbage) keeps the expression
  * honest on `containsNull` arrays; callers' `amax > 0` filters drop these
  * rows just like the lambda form's null-poisoned `amax` does.
  */
case class QuantizeInt8Report(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeInt8Report.schema

  private def containsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = child.nullable || containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 needs ARRAY<FLOAT|DOUBLE>, got ${dt.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    val checkNull = containsNull
    def at(i: Int): Double = if (f) x.getFloat(i).toDouble else x.getDouble(i)
    var amax = 0.0
    var i = 0
    // null check rides the amax scan — no extra array pass on the hot path
    while (i < n) {
      if (checkNull && x.isNullAt(i)) return null
      val a = math.abs(at(i)); if (a > amax) amax = a; i += 1
    }
    val scale = 127.0 / amax
    var qMin = Long.MaxValue; var qMax = Long.MinValue
    var dot = 0.0; var nx = 0.0; var nd = 0.0
    i = 0
    while (i < n) {
      val xd = at(i)
      val q = math.floor(xd * scale + 0.5).toLong
      if (q < qMin) qMin = q
      if (q > qMax) qMax = q
      val d = q.toDouble / scale
      dot += xd * d; nx += xd * xd; nd += d * d
      i += 1
    }
    val cos = dot / (math.sqrt(nx) * math.sqrt(nd))
    InternalRow(amax, if (n == 0) 0L else qMin, if (n == 0) 0L else qMax, cos)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val amax = ctx.freshName("amax"); val scale = ctx.freshName("scale")
      val qMin = ctx.freshName("qMin"); val qMax = ctx.freshName("qMax")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val nd = ctx.freshName("nd"); val xd = ctx.freshName("xd")
      val q = ctx.freshName("q"); val d = ctx.freshName("d")
      val abs = ctx.freshName("abs")
      // null check rides the amax scan (no extra pass); on a null element
      // the whole report is null and the compute block is skipped
      val nullCheck = if (containsNull)
        s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""
      val guardOpen = if (containsNull) s"if (!${ev.isNull}) {" else ""
      val guardClose = if (containsNull) "}" else ""
      s"""
         |int $n = $a.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $abs = java.lang.Math.abs((double)$a.$get($i));
         |  if ($abs > $amax) $amax = $abs;
         |}
         |$guardOpen
         |double $scale = 127.0 / $amax;
         |long $qMin = Long.MAX_VALUE; long $qMax = Long.MIN_VALUE;
         |double $dot = 0.0; double $nx = 0.0; double $nd = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xd = (double)$a.$get($i);
         |  long $q = (long) java.lang.Math.floor($xd * $scale + 0.5);
         |  if ($q < $qMin) $qMin = $q;
         |  if ($q > $qMax) $qMax = $q;
         |  double $d = (double)$q / $scale;
         |  $dot += $xd * $d; $nx += $xd * $xd; $nd += $d * $d;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{
         |    java.lang.Double.valueOf($amax),
         |    java.lang.Long.valueOf(($n == 0) ? 0L : $qMin),
         |    java.lang.Long.valueOf(($n == 0) ? 0L : $qMax),
         |    java.lang.Double.valueOf(
         |      $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($nd)))});
         |$guardClose
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Report =
    copy(child = newChild)
}

object QuantizeInt8Report {
  val schema: StructType = StructType(Seq(
    StructField("amax", DoubleType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false),
    StructField("recon_cosine", DoubleType, nullable = false)))

  def expr(c: Column): Column =
    ColumnBridge.column(QuantizeInt8Report(ColumnBridge.expression(c)))
}
