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

/** Per-document character-bigram frequencies in ONE per-row expression:
  * `char_bigram_counts(text)` → `array<struct<bg: string, n: bigint>>` —
  * one entry per distinct CHARACTER bigram (codepoint pairs, so multi-byte
  * UTF-8 is sliced on character boundaries, matching `substr(text, i, 2)`
  * over i in [1, length-1] in both engines), counted within the row.
  * A doc with fewer than 2 characters yields an empty array.
  *
  * Same rationale as [[TokenCounts]]: the per-doc count is row-local, so
  * pushing it through explode → groupBy(doc, bigram) would shuffle one row
  * per character OCCURRENCE; this emits one row per distinct bigram per doc
  * post-aggregation. Feeds the char-LM quality score
  * ([[graft.operators.TextAnalysis.charLmScore]]).
  */
final case class CharBigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"char_bigram_counts requires a string input, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = CharBigramCounts.Schema
  override def prettyName: String = "char_bigram_counts"

  override def nullSafeEval(input: Any): Any =
    CharBigramCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharBigramCounts.counts($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharBigramCounts =
    copy(child = newChild)
}

object CharBigramCounts {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("bg", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  /** Static helper the generated code calls: walk UTF-8 character
    * boundaries, slice each adjacent pair, count (first-occurrence order). */
  def counts(s: UTF8String): ArrayData = {
    val raw = s.getBytes // materialize backing bytes ONCE
    val bytes = raw.length
    // character start offsets (a UTF-8 char starts at any byte != 10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < bytes) {
      if ((raw(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < 2) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes) {
      if ((raw(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var k = 0
    while (k < nChars - 1) {
      val bg = UTF8String.fromBytes(raw, starts(k), starts(k + 2) - starts(k))
      val slot = m.get(bg)
      if (slot == null) m.put(bg, Array(1L)) else slot(0) += 1L
      k += 1
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
    Bridge.column(CharBigramCounts(Bridge.expression(text)))
}
