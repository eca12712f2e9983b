package graft.exprs

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product of two numeric array columns — the hot loop of every
  * embedding operator (cosine, LSH signature, IVF assignment). The HOF form
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` is CodegenFallback: each
  * element round-trips a lambda-variable InternalRow through interpreted
  * eval, the same bottleneck class the span decoder had before its kernel
  * ([[DecodeOsmSpans]]). This expression stays inside whole-stage codegen by
  * emitting a static call into [[VecKernel]].
  *
  * Semantics are exactly the HOF composition's:
  *  - float×float products are computed in FLOAT precision, then accumulated
  *    in double (Spark does not promote `FloatType * FloatType`);
  *  - mixed float/double promotes the product to double;
  *  - length mismatch → null (zip_with pads with null, nullifying the sum);
  *  - a null element → null; both empty → 0.0.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot needs two array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Kernel variant, picked once from the resolved child types. */
  private lazy val kernel: String = (elem(left), elem(right)) match {
    case (FloatType, FloatType) => "dotFF"
    case (FloatType, DoubleType) => "dotFD"
    case (DoubleType, FloatType) => "dotDF"
    case _ => "dotDD"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = kernel match {
      case "dotFF" => VecKernel.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "dotFD" => VecKernel.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "dotDF" => VecKernel.dotDF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case _ => VecKernel.dotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""java.lang.Double $r = graft.exprs.VecKernel.$kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Static dot-product kernels (top-level object → static forwarders callable
  * from generated Java). Boxed return: null signals length mismatch or a null
  * element — one Double box per ROW is noise against the per-element work. */
object VecKernel {

  def dotFF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      // float multiply THEN widen: bit-identical to Spark's float Multiply
      acc += (a.getFloat(i) * b.getFloat(i)).toDouble
      i += 1
    }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
