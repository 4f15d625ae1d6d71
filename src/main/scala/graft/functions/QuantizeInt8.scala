package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native int8 vector quantization, pre-widened for [[ArrayDot]]:
  * `quantize_int8(v)` = per-vector symmetric scale to ±127 —
  * `round(v_i * 127.0 / max_j |v_j|, 0)` — emitted as `array<double>` of
  * exact integers so the downstream dot/norm folds take it directly.
  *
  * Semantics identical to the built-in composition it replaces
  * (`transform(transform(v, abs→max) …)` — see
  * `Similarity.quantizeInt8`, kept as the declarative twin and
  * property-tested equal): same widen-first, same `(x·127)/m` operation
  * order, same HALF_UP decimal rounding as Spark's `round` — including its
  * edge semantics: `Round` NULLs a non-finite double, so an all-zero
  * vector (NaN scale) quantizes to all-NULL elements here exactly as in
  * the twin. A NULL input element quantizes to NULL and is skipped by the
  * max; an all-NULL or empty vector has NULL scale so every output
  * element is NULL.
  *
  * Why native: the declarative form is THREE higher-order transforms per
  * row (abs-map for the max, quantize-map, widen-map), each evaluating its
  * lambda interpreted per element — the exact per-element-hot-loop shape
  * the FunnelReached lesson (BASELINE round 6) bans from hot paths. This
  * fuses all three into one two-pass primitive loop inside codegen; at
  * corpus scale the quantize pass runs once per CORPUS row before the
  * broadcast join, so it sits on the data-sized side of the plan.
  */
final case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 requires array<float|double> input, got $other")
  }

  private def childContainsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // elements are nullable even over non-null inputs: a NaN scale
  // (all-zero vector) NULLs every element, matching the twin's `round`
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // pass 1: scale = max |v_i| over non-null elements (NaN sorts greatest)
    var m = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!(childContainsNull && v.isNullAt(i))) {
        val d = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
        if (!seen || d > m || java.lang.Double.isNaN(d)) m = d
        seen = true
      }
      i += 1
    }
    // pass 2: quantize (null scale → all-null elements, as in the HOF twin)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (seen && !(childContainsNull && v.isNullAt(i))) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val q = x * 127.0 / m
        if (!java.lang.Double.isNaN(q) && !java.lang.Double.isInfinite(q))
          out(i) = QuantizeInt8.roundHalfUp(q)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val seen = ctx.freshName("seen")
      val d = ctx.freshName("d")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val isNull = if (childContainsNull) s"$v.isNullAt($i)" else "false"
      s"""
        int $n = $v.numElements();
        double $m = 0.0;
        boolean $seen = false;
        for (int $i = 0; $i < $n; $i++) {
          if (!($isNull)) {
            double $d = java.lang.Math.abs($get);
            if (!$seen || $d > $m || java.lang.Double.isNaN($d)) $m = $d;
            $seen = true;
          }
        }
        Object[] $out = new Object[$n];
        for (int $i = 0; $i < $n; $i++) {
          if ($seen && !($isNull)) {
            double $q = ($get * 127.0) / $m;
            if (!java.lang.Double.isNaN($q) && !java.lang.Double.isInfinite($q))
              $out[$i] = (Object) graft.functions.QuantizeInt8.roundHalfUp($q);
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Spark `Round(_, 0)`'s finite-double branch: decimal HALF_UP on the
    * double's shortest decimal form (BigDecimal.valueOf) — bit-identical to
    * the `round` the declarative twin and the DuckDB oracle replay. Callers
    * NULL non-finite inputs first, as `Round` itself does. */
  def roundHalfUp(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def apply(v: Column): Column = Bridge.column(QuantizeInt8(Bridge.expression(v)))
}
