package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in ONE per-row expression:
  * `token_counts(text)` → `array<struct<tok: string, tf: bigint>>`, tokens
  * split on single spaces (`split(text, ' ')` semantics, empty tokens
  * included), one entry per distinct token with its occurrence count,
  * ordered by first occurrence (deterministic).
  *
  * Why: term frequency is a PER-DOCUMENT aggregate — pushing it through
  * `explode → groupBy(doc, token)` shuffles one row per token occurrence
  * (3M rows for 5k docs at sf0.1) to compute something each row already
  * determines alone. This computes the counts inside the row; downstream
  * consumers explode one row per DISTINCT token per doc, and doc-keyed
  * aggregates collapse map-side (a row's explode output stays in its
  * partition). TF-IDF's first shuffle disappears entirely.
  */
final case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"token_counts requires a string input, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = TokenCounts.Schema
  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  /** Static helper the generated code calls: split, count (first-occurrence
    * order), emit (tok, tf) structs. */
  def counts(s: UTF8String): ArrayData = {
    val raw = s.getBytes // materialize backing bytes ONCE
    val bytes = raw.length
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var start = 0
    var i = 0
    while (i <= bytes) {
      if (i == bytes || raw(i) == ' '.toByte) {
        val tok = UTF8String.fromBytes(raw, start, i - start)
        val slot = m.get(tok)
        if (slot == null) m.put(tok, Array(1L)) else slot(0) += 1L
        start = i + 1
      }
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

  /** Column-API entry point. */
  def apply(text: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(text)))
}
