package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashes of a document's NON-overlapping `w`-word segments in ONE per-row
  * expression: `segment_hashes(text, w)` → `array<long>` with one
  * [[MinhashSig.stableHash60]] value per full segment, in document order
  * (the trailing `n_tokens % w` words form no segment and are never
  * dropped by segment-level dedup).
  *
  * This is the segment analogue of [[ShingleHashes]] (which emits every
  * OVERLAPPING n-gram, deduped — the Jaccard-similarity shape): corpus-level
  * boilerplate stripping needs each segment occurrence with positional
  * identity, so output here is neither sorted nor deduped. Hashing the
  * space-joined segment text via the md5-prefix scheme keeps the values
  * engine-portable — the DuckDB oracle computes the identical longs from
  * `list_slice` + `array_to_string` + `md5`.
  */
final case class SegmentHashes(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"segment_hashes requires a string input, got ${child.dataType}")
    else if (w < 1) TypeCheckResult.TypeCheckFailure(
      s"segment_hashes(text, w) — w must be >= 1, got $w")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "segment_hashes"

  override def nullSafeEval(input: Any): Any =
    SegmentHashes.hashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SegmentHashes.hashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): SegmentHashes =
    copy(child = newChild)
}

object SegmentHashes {

  /** Static helper the generated code calls: split on single spaces
    * (`split(text, ' ')` semantics — empty tokens included), group into
    * floor(n/w) full segments, hash each segment's space-joined text.
    * Token boundaries are byte offsets of ' ' — a segment's joined text is
    * just the byte span from its first token's start to its last token's
    * end, so no per-token materialization happens at all. */
  def hashes(s: UTF8String, w: Int): ArrayData = {
    val raw = s.getBytes
    val bytes = raw.length
    // offsets of token starts: 0 and every byte after a space
    var nTokens = 1
    var i = 0
    while (i < bytes) { if (raw(i) == ' '.toByte) nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < bytes) {
      if (raw(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = bytes + 1 // sentinel: "start" just past a virtual space
    val nSegs = nTokens / w
    val out = new Array[Long](nSegs)
    var g = 0
    while (g < nSegs) {
      val from = starts(g * w)
      val until = starts(g * w + w) - 1 // strip the trailing space
      out(g) = MinhashSig.stableHash60(
        UTF8String.fromBytes(raw, from, until - from))
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(text: Column, w: Int): Column =
    Bridge.column(SegmentHashes(Bridge.expression(text), w))
}
