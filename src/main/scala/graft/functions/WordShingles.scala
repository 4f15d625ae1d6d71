package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingler: `wordShingles(text, n)` → `array<string>`.
  *
  * Semantics identical to the declarative form
  * `transform(sequence(1, greatest(size(split(text,' ')) - n + 1, 1)),
  *            i -> concat_ws(' ', slice(split(text,' '), i, n)))`
  * — i.e. space-split tokens, one shingle per window of n consecutive tokens,
  * and a document shorter than n tokens yields its whole text as the single
  * shingle. (DuckDB oracle twin: `list_transform(range(...), i ->
  * array_to_string(list_slice(t, i, i+n-1), ' '))`.)
  *
  * Why an Expression and not the built-in composition: Spark evaluates
  * higher-order functions interpreted (no whole-stage codegen inside the
  * lambda), which costs ~6µs per shingle — the dominant term of every dedup
  * pipeline over documents. This expression generates a call to a static
  * JIT-compiled helper (~0.2µs per shingle) and keeps the surrounding
  * operators inside WholeStageCodegen. The output shingles are slices of the
  * input bytes (single copy per shingle, no token array materialized).
  */
final case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${child.dataType}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"word_shingles(text, n) — n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Static helper the generated code calls. One pass over the UTF-8 bytes:
    * records space positions, then emits each shingle as a byte-range slice
    * `[start(i), end(i+n-1))` of the original string — no per-token objects. */
  def shingle(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.numBytes()
    // token boundaries: starts(i) .. ends(i) byte offsets (split on single space,
    // matching split(text, ' ') semantics incl. empty tokens for doubled spaces)
    var tokenCount = 1
    var i = 0
    while (i < bytes) {
      if (s.getByte(i) == ' ') tokenCount += 1
      i += 1
    }
    if (tokenCount <= n) return new GenericArrayData(Array[Any](s.copy()))

    val starts = new Array[Int](tokenCount)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < bytes) {
      if (s.getByte(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val raw = s.getBytes // materialize the backing bytes ONCE (may copy)
    val out = new Array[Any](tokenCount - n + 1)
    var k = 0
    while (k <= tokenCount - n) {
      val from = starts(k)
      val until = if (k + n < tokenCount) starts(k + n) - 1 else bytes
      out(k) = UTF8String.fromBytes(raw, from, until - from)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}
