package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram frequencies in ONE per-row expression:
  * `ngram_counts(text, n)` → `array<struct<tok: string, tf: bigint>>`, one
  * entry per distinct n-gram ([[WordShingles]] semantics — a doc shorter
  * than `n` yields its full token string) with its occurrence count,
  * first-occurrence order. The n-gram generalization of [[TokenCounts]]
  * (`n = 1` is exactly it): n-gram frequency is a per-document aggregate,
  * so counting inside the row spares the occurrence-level shuffle the
  * explode → groupBy(doc, gram) formulation pays — downstream consumers
  * (word-LM scoring, phrase vocabularies) explode one row per DISTINCT
  * gram per doc. */
final case class NgramCounts(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ngram_counts requires a string input, got ${child.dataType}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"ngram_counts(text, n) — n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = TokenCounts.Schema
  override def prettyName: String = "ngram_counts"

  override def nullSafeEval(input: Any): Any =
    NgramCounts.counts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramCounts.counts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramCounts =
    copy(child = newChild)
}

object NgramCounts {
  /** Static helper the generated code calls: shingle, count
    * (first-occurrence order), emit (tok, tf) structs. */
  def counts(s: UTF8String, n: Int): ArrayData = {
    val shingles = WordShingles.shingle(s, n)
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < shingles.numElements()) {
      val g = shingles.getUTF8String(i)
      val slot = m.get(g)
      if (slot == null) m.put(g, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    Bridge.column(NgramCounts(Bridge.expression(text), n))
}
