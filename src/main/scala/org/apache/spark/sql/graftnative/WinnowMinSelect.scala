/* Hosted under org.apache.spark.sql so the expression can use the
 * private[sql] Catalyst surface (ExpressionUtils for Expression↔Column
 * bridging) — the standard technique for out-of-tree Spark-native
 * expressions. */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native winnowing selection over an `array<long>` of positional gram
  * hashes: the SORTED DISTINCT set of sliding-window minima over windows
  * of `w` consecutive elements (max(n−w+1, 1) windows; n < w degrades to
  * one whole-array window) — the second stage of the MOSS fingerprint
  * (Dedup.winnowFingerprints), bit-equal to
  * `array_sort(array_distinct(transform(sequence(0, nWin−1), j =>
  * array_min(slice(g, j+1, w)))))`.
  *
  * That HOF form allocates a w-element slice per window under interpreted
  * lambda dispatch — measured ~5 s of the ×100 winnowing pipeline against
  * ~1 s for the native gram hashing it follows. Here: one monotone-deque
  * sliding-minimum pass (O(n), no per-window allocation), then sort +
  * unique on the minima buffer.
  *
  * Null input → null; empty input → empty. Null ELEMENTS cannot reach
  * this expression from the library's builder (Portable60Grams emits
  * containsNull = false); defensively they are treated as +∞ (never a
  * minimum), and an all-null window contributes nothing.
  */
case class WinnowMinSelect(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "w must be at least 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_min_select"

  override protected def nullSafeEval(input: Any): Any =
    WinnowMinSelect.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = "org.apache.spark.sql.graftnative.WinnowMinSelect"
      s"${ev.value} = $cls.compute($a, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowMinSelect =
    copy(child = newChild)
}

object WinnowMinSelect {

  def apply(grams: Column, w: Int): Column =
    ExpressionUtils.column(WinnowMinSelect(
      ExpressionUtils.expression(grams), w))

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val ww = math.min(w, n) // n < w: one whole-array window
    val nWin = n - ww + 1
    val mins = new Array[Long](nWin)
    var nMins = 0
    // monotone deque of candidate indices (increasing values front→back)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      if (head < tail && deque(head) <= i - ww) head += 1 // expire left
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        while (head < tail && {
          val d = deque(tail - 1)
          arr.isNullAt(d) || arr.getLong(d) >= v
        }) tail -= 1
        deque(tail) = i
        tail += 1
      }
      if (i >= ww - 1 && head < tail) {
        val d = deque(head)
        if (!arr.isNullAt(d)) { mins(nMins) = arr.getLong(d); nMins += 1 }
      }
      i += 1
    }
    val buf = java.util.Arrays.copyOf(mins, nMins)
    java.util.Arrays.sort(buf)
    // in-place unique
    var out = 0
    var j = 0
    while (j < buf.length) {
      if (out == 0 || buf(out - 1) != buf(j)) { buf(out) = buf(j); out += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, out))
  }
}
