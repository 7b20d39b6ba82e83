package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED long arrays via a
  * linear merge — no hash set, no output array.
  *
  * `size(array_intersect(a, b))` builds a hash relation and materializes
  * the intersection array per row only to take its length; on the
  * verify stage of set-similarity joins (hundreds of thousands of
  * candidate pairs × ~100-element shingle-hash sets) that allocation is
  * the dominant cost. The merge needs both inputs ascending — callers
  * sort once per document up front (`sort_array`), amortized across
  * every candidate pair the document participates in.
  *
  * Semantics on DISTINCT sorted inputs match `size(array_intersect)`
  * exactly (duplicate elements would be counted per matching occurrence
  * pair-position rather than once — upstream relations are
  * `array_distinct`ed). Null ELEMENTS never match (skipped in the
  * merge) — the type check accepts containsNull arrays, so SQL callers
  * can pass them; silently reading a null slot as 0 would fabricate
  * matches.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "sorted_intersect_count needs two array<bigint> args, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xi = x.getLong(i); val yj = y.getLong(j)
        if (xi < yj) i += 1
        else if (yj < xi) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |    if ($xi < $yj) { $i++; }
         |    else if ($yj < $xi) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)
}
