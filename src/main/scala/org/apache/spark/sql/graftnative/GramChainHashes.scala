/* Hosted under org.apache.spark.sql so the expression can use the
 * private[sql] Catalyst surface (ExpressionUtils for Expression↔Column
 * bridging) — the standard technique for out-of-tree Spark-native
 * expressions. */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native positional k-gram chain hashes over an `array<long>` of token
  * hashes: element i = the xxhash64 chain over the k-token window starting
  * at i, for all max(m−k+1, 1) positions in ONE pass.
  *
  * Replaces the k−1 chained `zip_with(acc, slice(hs, j+1, len), (a, b) =>
  * xxhash64(a, b))` passes in Dedup.positionalGramHashes — interpreted
  * lambda dispatch per element per pass, measured 6.5 s for the sf0.1
  * corpus at the repeated-span window k = 50 (49 interpreted array walks),
  * the same HOF-fold cost class as the MinHash signature before its
  * native expression.
  *
  * Bit-identical to the HOF form (lockstep-spec'd), INCLUDING its
  * short-document padding artifact: for m < k the single gram is built by
  * the same fold, where a step past the end — zip_with's null padding
  * into `xxhash64(a, null)` — skips the null input but still re-seeds,
  * contributing hashLong(acc, 42) rather than leaving the accumulator
  * untouched. Each in-window step is xxhash64(acc, next) =
  * hashLong(next, hashLong(acc, 42)).
  *
  * Null input array → null (as slice/zip_with propagate); empty input →
  * empty output. Null ELEMENTS can't reach this expression from the
  * library's builders (token hashes are xxhash64 outputs); defensively
  * they're treated as skipped inputs whose seed chain still advances —
  * matching the HOF for mid-window nulls (a null FIRST element is
  * approximated; no caller can construct one, and the lockstep spec pins
  * only constructible inputs).
  */
case class GramChainHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be at least 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_chain_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val n = math.max(m - k + 1, 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var g = if (arr.isNullAt(i)) 42L else arr.getLong(i)
      var j = 1
      while (j < k) {
        g = XXH64.hashLong(g, 42L)
        if (i + j < m && !arr.isNullAt(i + j)) g = XXH64.hashLong(arr.getLong(i + j), g)
        j += 1
      }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val g = ctx.freshName("g")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val gad = classOf[GenericArrayData].getName
      val xxh = classOf[XXH64].getName
      s"""
         |int $m = $a.numElements();
         |int $n = java.lang.Math.max($m - ${k - 1}, 1);
         |if ($m == 0) $n = 0;
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $g = $a.isNullAt($i) ? 42L : $a.getLong($i);
         |  for (int $j = 1; $j < $k; $j++) {
         |    $g = $xxh.hashLong($g, 42L);
         |    if ($i + $j < $m && !$a.isNullAt($i + $j)) {
         |      $g = $xxh.hashLong($a.getLong($i + $j), $g);
         |    }
         |  }
         |  $out[$i] = $g;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramChainHashes =
    copy(child = newChild)
}

object GramChainHashes {
  def apply(tokenHashes: Column, k: Int): Column =
    ExpressionUtils.column(GramChainHashes(
      ExpressionUtils.expression(tokenHashes), k))
}
