package graft.exprs

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Keeps the elements of a long-array column that are members of a
  * BROADCAST sorted set — the map-side membership prefilter of
  * [[graft.ops.Dedup.winnowedDupPairs]]'s candidate generation. Equivalent
  * to exploding the array and broadcast-hash-joining each element against
  * the set, but runs before the Generate: the surviving few percent are the
  * only rows the explode materializes, and the scan stays inside whole-stage
  * codegen (`doGenCode` is one static call). The set rides a Spark
  * broadcast, not an expression literal, so tasks serialize a handle rather
  * than megabytes of plan.
  *
  * Order- and multiplicity-preserving: output elements appear exactly as in
  * the input, filtered — so `explode(retain(fps))` produces the same row
  * multiset as `explode(fps) join broadcast(set)`.
  */
case class LongArrayRetainSorted(child: Expression, set: Broadcast[Array[Long]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "long_array_retain_sorted"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_array_retain_sorted needs array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    LongArrayRetainSorted.retain(input.asInstanceOf[ArrayData], set.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcSortedSet", set,
      classOf[Broadcast[Array[Long]]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.LongArrayRetainSorted.retain($c, (long[]) $bcRef.value());")
  }

  override protected def withNewChildInternal(newChild: Expression): LongArrayRetainSorted =
    copy(child = newChild)
}

object LongArrayRetainSorted {
  /** sorted-set membership filter over a primitive long array — static so
    * generated Java calls it directly. */
  def retain(arr: ArrayData, sorted: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val tmp = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (java.util.Arrays.binarySearch(sorted, v) >= 0) { tmp(m) = v; m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == n) tmp else java.util.Arrays.copyOf(tmp, m))
  }
}
