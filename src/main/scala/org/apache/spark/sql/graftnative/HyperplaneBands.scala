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
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native banded random-hyperplane signatures: `b` LSH band keys of `w`
  * sign bits each over an `array<double>` vector, in ONE fused pass inside
  * WholeStageCodegen.
  *
  * Band i's key packs the sign bits of planes [i·w, (i+1)·w): bit j set iff
  * plane(i·w+j) · v ≥ 0 — EXACTLY the bits `Similarity.lshBucket` packs
  * into one long and band-slices with shifts, so for w·b ≤ 63 the two
  * formulations are interchangeable (lockstep-spec'd). The point of the
  * expression is that it is NOT limited to 63 total bits: the single-long
  * pack put a hard ceiling w·b ≤ 63 on the (width, bands) plane, which is
  * precisely the knob auto-banding must widen as the corpus grows
  * (width ~ log2(n) for constant bucket occupancy). Per-band keys remove
  * the ceiling, and the fused loop replaces w·b chained interpreted
  * zip_with/aggregate dot products (the HOF cost class profiled at 30-50×
  * the native loop for MinHashSignature) with one primitive sweep that
  * reads each vector component once per plane.
  *
  * Null semantics mirror the HOF fold they replace: a null vector yields a
  * null result; a null COMPONENT nulls every dot product in the fold
  * (`when(null >= 0)` never fires), so any-null input yields all-zero keys.
  * No embedding source produces null components — the parity just keeps
  * the lockstep spec unconditional.
  *
  * A vector whose length differs from `dim` FAILS LOUDLY (runtime
  * IllegalArgumentException naming both lengths): the HOF fold would
  * null-pad via zip_with into all-zero keys (silent recall collapse) and
  * the DuckDB oracle's list_dot_product would error — truncating to
  * min(length, dim), as earlier rounds did, silently banded on partial
  * dots no other formulation computes (round-6 advice).
  */
case class HyperplaneBands(
    child: Expression,
    planes: Seq[Double], // flattened row-major: plane p = [p*dim, (p+1)*dim)
    dim: Int,
    w: Int,
    b: Int) extends UnaryExpression {

  // 63 bits max: bit 62 is the highest that keeps the key positive
  require(w > 0 && w <= 63, "band width must be in [1, 63] bits")
  require(b > 0, "band count must be positive")
  require(planes.length == w * b * dim,
    s"planes must hold w*b*dim = ${w * b * dim} values, got ${planes.length}")

  // fail at ANALYSIS, not execution: getDouble over a non-double array
  // would read garbage slots deep inside a stage
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_bands"

  private lazy val flat: Array[Double] = planes.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m != dim) throw new IllegalArgumentException(
      s"hyperplane_bands: vector length $m != dim $dim")
    val keys = new Array[Long](b)
    var anyNull = false
    var t = 0
    while (t < m && !anyNull) { anyNull = arr.isNullAt(t); t += 1 }
    if (!anyNull) {
      var band = 0
      var pl = 0
      while (band < b) {
        var key = 0L
        var bit = 0
        while (bit < w) {
          var d = 0.0
          val off = pl * dim
          var i = 0
          while (i < m) { d += flat(off + i) * arr.getDouble(i); i += 1 }
          if (d >= 0) key |= (1L << bit)
          bit += 1
          pl += 1
        }
        keys(band) = key
        band += 1
      }
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val planesRef = ctx.addReferenceObj("hyperplanes", flat, "double[]")
      val gad = classOf[GenericArrayData].getName
      val keys = ctx.freshName("keys")
      val anyNull = ctx.freshName("anyNull")
      val m = ctx.freshName("m")
      val t = ctx.freshName("t")
      val band = ctx.freshName("band")
      val bit = ctx.freshName("bit")
      val pl = ctx.freshName("pl")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val key = ctx.freshName("key")
      s"""
         |int $m = $c.numElements();
         |if ($m != $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_bands: vector length " + $m + " != dim " + $dim);
         |}
         |long[] $keys = new long[$b];
         |boolean $anyNull = false;
         |for (int $t = 0; $t < $m && !$anyNull; $t++) {
         |  $anyNull = $c.isNullAt($t);
         |}
         |if (!$anyNull) {
         |  int $pl = 0;
         |  for (int $band = 0; $band < $b; $band++) {
         |    long $key = 0L;
         |    for (int $bit = 0; $bit < $w; $bit++, $pl++) {
         |      double $d = 0.0;
         |      int $off = $pl * $dim;
         |      for (int $i = 0; $i < $m; $i++) {
         |        $d += $planesRef[$off + $i] * $c.getDouble($i);
         |      }
         |      if ($d >= 0) $key |= (1L << $bit);
         |    }
         |    $keys[$band] = $key;
         |  }
         |}
         |${ev.value} = new $gad($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {
  /** Column-API entry. `planes` is flattened row-major (w·b planes of
    * `dim` components each, band i = planes [i·w, (i+1)·w)).
    */
  def apply(vec: Column, planes: Seq[Double], dim: Int, w: Int, b: Int): Column =
    ExpressionUtils.column(
      HyperplaneBands(ExpressionUtils.expression(vec), planes, dim, w, b))
}
