/* Hosted under org.apache.spark.sql so the expression can use the
 * private[sql] Catalyst surface (ExpressionUtils for Expression↔Column
 * bridging) — the standard technique for out-of-tree Spark-native
 * expressions. */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an `array<string>` of tokens: hash every
  * token once (XXH64 over its UTF-8 bytes, seed 42 — bit-identical to the
  * builtin `xxhash64`) and accumulate all 64 bit votes in ONE fused loop
  * inside WholeStageCodegen.
  *
  * The higher-order-function formulation ([[graft.operators.Dedup.simHashHof]])
  * — `aggregate(transform(toks, xxhash64), array_repeat(0L, 64),
  * zip_with(acc, votes(h), _+_))` then a 64-step packing fold — allocates
  * a 64-long vote array PER TOKEN and runs fully interpreted (HOFs never
  * reach codegen): measured 2.6 s cold at sf0.1 for the column form. This
  * expression is the loop a native engine would write: per token, one
  * hash, 64 register adds; per row, one 64-step pack. Equivalence with the
  * vote fold: bit b is set iff Σ(±1 votes) > 0 iff 2·(count of set bit b)
  * > n_tokens — the same identity the bulk simHashSketch aggregate uses.
  *
  * Null semantics, pinned in SimHash64Spec: a null token ARRAY yields a
  * null fingerprint (the HOF aggregate over null is null); an EMPTY array
  * yields 0L (all votes 0, no bit set — matching the HOF fold's seed).
  * Null ELEMENTS are skipped — deliberately NOT the HOF artifact, where
  * `xxhash64(NULL)` inside the transform propagates a null vote that the
  * `when(...).otherwise(-1)` three-valued logic turns into a −1 vote on
  * every bit. No tokenizer produces null elements (they come from `split`),
  * so the contracts only diverge on inputs the library never constructs;
  * the spec pins both behaviors.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  // fail at ANALYSIS, not execution: getUTF8String over a non-string
  // array would read garbage offsets deep inside a stage
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val cnt = new Array[Int](64)
    var n = 0
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        n += 1
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var b = 0
        while (b < 64) {
          cnt(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      j += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (2L * cnt(b) > n) sh |= 1L << b
      b += 1
    }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |int[] $cnt = new int[64];
         |int $n = 0;
         |int $m = $arr.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    $n++;
         |    long $h = $xxh.hashUTF8String($arr.getUTF8String($j), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $cnt[$b] += (int) (($h >>> $b) & 1L);
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2L * $cnt[$b] > $n) ${ev.value} |= 1L << $b;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry over a token array column. */
  def apply(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))
}
