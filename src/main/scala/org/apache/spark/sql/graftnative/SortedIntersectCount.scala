package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType}

/** Distinct-intersection SIZE of two SORTED `array<int>` columns — the
  * fused, allocation-free replacement for `size(array_intersect(a, b))` on
  * the triangle counter's hot path (guide §1.2 step 2: per-task work).
  *
  * `array_intersect` builds an OpenHashSet over one side and materializes
  * the intersection as a fresh UnsafeArrayData PER ROW, only for `size` to
  * read its length and throw the array away. When both inputs are already
  * sorted ascending (the adjacency arrays are built with
  * `sort_array(collect_list(...))`, and the `filter(_ > hi)` trim preserves
  * order), a two-pointer merge counts the same distinct common values with
  * zero allocation and no hashing. Same-session A/B on q_graph_triangles
  * at sf0.1 is recorded in OPTIMIZATION_r13.md.
  *
  * Semantics match `size(array_intersect(a, b))` EXACTLY on the declared
  * precondition (both arrays sorted ascending with Spark's `sort_array`
  * order: nulls first): common values count ONCE regardless of duplicates,
  * and a null element present in both sides counts once (array_intersect
  * keeps a shared null). Unsorted input is a CONTRACT VIOLATION and
  * undercounts silently — this expression is deliberately not exposed as a
  * general function; callers own the sortedness proof.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    // nulls sort first (sort_array ascending): a null on both sides is one
    // shared intersection element, exactly array_intersect's treatment
    var hasNullX = false
    while (i < n && x.isNullAt(i)) { hasNullX = true; i += 1 }
    var hasNullY = false
    while (j < m && y.isNullAt(j)) { hasNullY = true; j += 1 }
    if (hasNullX && hasNullY) cnt += 1
    while (i < n && j < m) {
      val xv = x.getInt(i)
      val yv = y.getInt(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        cnt += 1
        // skip duplicates of the matched value on both sides so each
        // distinct value counts once (array_intersect dedups)
        val v = xv
        while (i < n && !x.isNullAt(i) && x.getInt(i) == v) i += 1
        while (j < m && !y.isNullAt(j) && y.getInt(j) == v) j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nx = ctx.freshName("hasNullX")
      val ny = ctx.freshName("hasNullY")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |int $cnt = 0;
         |boolean $nx = false;
         |boolean $ny = false;
         |while ($i < $n && $a.isNullAt($i)) { $nx = true; $i++; }
         |while ($j < $m && $b.isNullAt($j)) { $ny = true; $j++; }
         |if ($nx && $ny) $cnt++;
         |while ($i < $n && $j < $m) {
         |  int $xv = $a.getInt($i);
         |  int $yv = $b.getInt($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $cnt++;
         |    while ($i < $n && !$a.isNullAt($i) && $a.getInt($i) == $xv) $i++;
         |    while ($j < $m && !$b.isNullAt($j) && $b.getInt($j) == $xv) $j++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
