package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of a 2-D bucket pair: `hilbert_index(a, b)` → long,
  * with both inputs already normalized to `[0, 2^bits)` buckets.
  *
  * Why Hilbert and not Morton/Z-order for clustered writes: an
  * equal-frequency range partitioning of curve positions cuts the curve at
  * arbitrary points, and a Z-curve has long jumps (the segment crossing the
  * quadrant junction teleports from one side of the space to the other, so
  * that file's min/max span the FULL width of one dimension — measured:
  * x-span 99/99 on a uniform grid). The Hilbert curve is continuous: every
  * contiguous position range is a spatially local blob, so EVERY file gets
  * tight min/max on both dimensions regardless of where the cuts land.
  *
  * Classic bit-twiddling walk (rotate/reflect per level), one JIT-compiled
  * loop of `bits` iterations per row inside whole-stage codegen.
  */
final case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (bigint, bigint), got " +
          s"(${left.dataType}, ${right.dataType})")
    else if (bits < 1 || bits > 31) TypeCheckResult.TypeCheckFailure(
      s"hilbert_index bits must be in [1, 31], got $bits")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertIndex.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Standard Hilbert xy→d walk over a 2^bits × 2^bits grid. Inputs outside
    * the grid are clamped (callers bucket first, so this is belt-and-braces). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = math.min(math.max(x0, 0L), n - 1)
    var y = math.min(math.max(y0, 0L), n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation matches
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-API entry point over pre-bucketed long columns. */
  def apply(a: Column, b: Column, bits: Int): Column =
    Bridge.column(HilbertIndex(Bridge.expression(a), Bridge.expression(b), bits))
}
