package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `numTables` sign-LSH signatures of a vector in ONE per-row expression:
  * `lsh_sigs(vec, numTables, numPlanes, dims)` → `array<long>` (length
  * numTables; table t uses hyperplanes `t·numPlanes … (t+1)·numPlanes − 1`
  * of the md5-derived [[Vectors.planeWeight]] family).
  *
  * Semantics identical, table by table, to
  * [[Vectors.lshSignBits]]`(v, numPlanes, dims, planeOffset = t·numPlanes)`
  * (property-tested): per plane, the projection is the ArrayDot contract —
  * widen to double, left fold in index order over the common prefix — and
  * bit p is set iff the projection is >= 0, so the DuckDB oracle still
  * reconstructs every signature exactly.
  *
  * Why native: the declarative form inlines numTables × numPlanes ArrayDot
  * calls, each against its own `dims`-element literal array, into one
  * projection — hundreds of KB of generated code at 8 × 12 × 64, which
  * overflows JIT/codegen budgets and falls back to interpreted evaluation
  * (measured: tables=4 went 3.5 s → 39 s on a 200k corpus, superlinear in
  * tables for a linear amount of math). This evaluates the whole
  * weight-matrix product as one tight loop over a cached primitive array —
  * cost linear in tables at any corpus size, as the math is.
  */
final case class LshSigs(child: Expression, numTables: Int, numPlanes: Int,
    dims: Int) extends UnaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!elemOk(child.dataType)) TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs requires an array<float|double> input, got ${child.dataType}")
    else if (numTables < 1 || numPlanes < 1 || numPlanes > 63 || dims < 1)
      TypeCheckResult.TypeCheckFailure(
        "lsh_sigs(vec, numTables, numPlanes, dims) — need numTables >= 1, " +
          "1 <= numPlanes <= 63, dims >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sigs"

  private def isFloatElem: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any =
    LshSigs.sigs(input.asInstanceOf[ArrayData], isFloatElem, mayHaveNullElems,
      numTables, numPlanes, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshSigs.sigs($c, $isFloatElem, $mayHaveNullElems, " +
        s"$numTables, $numPlanes, $dims)")

  override protected def withNewChildInternal(newChild: Expression): LshSigs =
    copy(child = newChild)
}

object LshSigs {

  /** Flat weight matrix per (tables, planes, dims): index
    * `(t·planes + p)·dims + i` = planeWeight(t·planes + p, i). Derived once
    * per JVM from the md5 family — identical on every executor. */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
  private def weights(tables: Int, planes: Int, dims: Int): Array[Double] =
    weightCache.computeIfAbsent((tables, planes, dims), { case (t, p, d) =>
      val w = new Array[Double](t * p * d)
      var g = 0
      while (g < t * p) {
        var i = 0
        while (i < d) { w(g * d + i) = Vectors.planeWeight(g, i); i += 1 }
        g += 1
      }
      w
    })

  /** Static helper the generated code calls: one fused loop per row. A null
    * element in the folded prefix nulls every plane's projection, and a
    * null projection contributes bit 0 — exactly what the declarative
    * `when(proj >= 0, …).otherwise(0)` chain yields — so the signature
    * degrades to 0L per table, never to a null row. */
  def sigs(v: ArrayData, floatElem: Boolean, checkNulls: Boolean,
      numTables: Int, numPlanes: Int, dims: Int): ArrayData = {
    val w = weights(numTables, numPlanes, dims)
    val n = math.min(v.numElements(), dims)
    if (checkNulls) {
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return new GenericArrayData(new Array[Long](numTables))
        i += 1
      }
    }
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = if (floatElem) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var p = 0
      while (p < numPlanes) {
        val base = (t * numPlanes + p) * dims
        var acc = 0.0
        var j = 0
        while (j < n) { acc += x(j) * w(base + j); j += 1 }
        if (acc >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(vec: Column, numTables: Int, numPlanes: Int, dims: Int): Column =
    Bridge.column(LshSigs(Bridge.expression(vec), numTables, numPlanes, dims))
}
