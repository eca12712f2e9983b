package graft.exprs

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd first-match tag lookup over the `tags`
  * array<struct<key,value>> — the compiler's COLD-path primitive
  * (graft.compile.Compiler.tagValue). Semantically identical to
  * `get(filter(tags, t => t.key === k), 0).value`, which it replaces on the
  * hot path: the higher-order `filter`/`exists` forms are CodegenFallback
  * in Spark 4, so every tag predicate evaluated through them drops the
  * surrounding Filter out of whole-stage codegen AND allocates an
  * intermediate filtered array per row. This expression is one static-call
  * linear scan with early exit, fused into the surrounding stage.
  *
  * Parity notes (pinned by TagExprsSpec against the HOF forms):
  *  - first MATCHING tag wins (array order);
  *  - a null `key` field never matches (the HOF filter drops null lambda
  *    results, i.e. treats them as false);
  *  - null input array ⇒ null (same as the HOF chain);
  *  - absent key ⇒ null.
  */
case class TagLookup(child: Expression, key: String) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "tag_lookup"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
      if fields.length == 2 && fields(0).dataType == StringType &&
        fields(1).dataType == StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tag_lookup needs array<struct<key:string,value:string>>, got ${other.simpleString}")
  }

  private val keyU: UTF8String = UTF8String.fromString(key)

  override def nullSafeEval(input: Any): Any =
    TagKernel.lookup(input.asInstanceOf[ArrayData], keyU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("tagKey", keyU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.exprs.TagKernel.lookup($c, $keyRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): TagLookup =
    copy(child = newChild)
}

/** Codegen'd has-key check — replaces `exists(tags, t => t.key === k)` on
  * the cold compile path, INCLUDING the HOF's three-valued logic: a null
  * `key` field yields null (unknown) when no other tag matches, exactly as
  * `ArrayExists` evaluates `null === k` under default configuration. On the
  * engine's views keys are never null, so this is two-valued in practice;
  * the parity matters only for arbitrary caller-supplied frames. */
case class TagExists(child: Expression, key: String) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "tag_exists"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
      if fields.length == 2 && fields(0).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tag_exists needs array<struct<key:string,value:string>>, got ${other.simpleString}")
  }

  private val keyU: UTF8String = UTF8String.fromString(key)

  override def nullSafeEval(input: Any): Any =
    TagKernel.exists(input.asInstanceOf[ArrayData], keyU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("tagKey", keyU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Boolean ex_${ev.value} = graft.exprs.TagKernel.exists($c, $keyRef);
      ${ev.isNull} = ex_${ev.value} == null;
      ${ev.value} = ex_${ev.value} != null && ex_${ev.value}.booleanValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): TagExists =
    copy(child = newChild)
}

/** Static kernels (top-level object → static forwarders callable from
  * generated Java). */
object TagKernel {

  /** First value whose key equals `key`; null when absent. Null keys are
    * skipped (HOF filter-as-false parity). */
  def lookup(tags: ArrayData, key: UTF8String): UTF8String = {
    val n = tags.numElements()
    var i = 0
    while (i < n) {
      if (!tags.isNullAt(i)) {
        val t = tags.getStruct(i, 2)
        if (!t.isNullAt(0) && t.getUTF8String(0).equals(key))
          return t.getUTF8String(1)
      }
      i += 1
    }
    null
  }

  /** Three-valued exists: TRUE on any match; otherwise NULL if any key (or
    * array element) was null, else FALSE — `ArrayExists` default parity. */
  def exists(tags: ArrayData, key: UTF8String): java.lang.Boolean = {
    val n = tags.numElements()
    var sawNull = false
    var i = 0
    while (i < n) {
      if (tags.isNullAt(i)) sawNull = true
      else {
        val t = tags.getStruct(i, 2)
        if (t.isNullAt(0)) sawNull = true
        else if (t.getUTF8String(0).equals(key)) return java.lang.Boolean.TRUE
      }
      i += 1
    }
    if (sawNull) null else java.lang.Boolean.FALSE
  }
}
