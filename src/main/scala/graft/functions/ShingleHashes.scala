package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word n-gram shingles in ONE per-row expression:
  * `shingle_hashes(text, n)` → sorted `array<long>` of distinct
  * [[Hashing.stableHash31]] values over the doc's shingles.
  *
  * The inverted-index operators (n-gram Jaccard, decontamination) only ever
  * JOIN and COUNT shingles — their identity matters, their text doesn't. An
  * 8-byte hash through the explode → shuffle → self-join pipeline beats a
  * ~25-byte shingle string on every axis (shuffle bytes, hash-join probe
  * cost, aggregate key width), and the md5-derived hash is deterministic
  * and engine-portable, so the DuckDB oracle computes the IDENTICAL values
  * (`list_distinct(list_transform(shingles, s -> ...))`) — even a 60-bit
  * collision collapses the same two shingles in both engines, keeping
  * results matched by construction.
  *
  * Dedup happens on the HASHES (not the strings) in both engines, so the
  * contract holds under collisions too. Output sorted ascending — callers
  * explode it, so order only needs to be deterministic.
  */
final case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string input, got ${child.dataType}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes(text, n) — n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Positional variant of [[ShingleHashes]]: `positional_shingle_hashes(text,
  * n)` → `array<long>` where element i is the hash of the shingle STARTING at
  * token position i — no sort, no dedup. The exact-substring span detector
  * ([[graft.operators.Dedup.repeatedSpans]]) needs every occurrence at its
  * position: dedup would erase in-document repeats, and sorting would erase
  * the positions the span merge runs on. Same hash family as
  * [[ShingleHashes]], so the two are joinable and share the oracle SQL twin.
  */
final case class PositionalShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"positional_shingle_hashes requires a string input, got ${child.dataType}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"positional_shingle_hashes(text, n) — n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.posHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.posHashes($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): PositionalShingleHashes =
    copy(child = newChild)
}

object PositionalShingleHashes {
  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    Bridge.column(PositionalShingleHashes(Bridge.expression(text), n))
}

object ShingleHashes {
  import Hashing.P

  /** Static helper for [[PositionalShingleHashes]]: hash each shingle in
    * position order, every occurrence kept. */
  def posHashes(s: UTF8String, n: Int): ArrayData = {
    val shingles = WordShingles.shingle(s, n)
    val m = shingles.numElements()
    val hs = new Array[Any](m)
    var i = 0
    while (i < m) {
      hs(i) = MinhashSig.stableHash60(shingles.getUTF8String(i)) % P
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** Static helper the generated code calls: shingle, hash, sort, dedup. */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val shingles = WordShingles.shingle(s, n)
    val m = shingles.numElements()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = MinhashSig.stableHash60(shingles.getUTF8String(i)) % P
      i += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 0
    var j = 0
    while (j < m) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(uniq) = hs(j); uniq += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, uniq))
  }

  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))
}
