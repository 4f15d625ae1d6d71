package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row text-gate statistics: ONE pass over the document bytes
  * produces every count the curation row gates need —
  * `gate_stats(text)` → `struct<n_parts int, n_chars int, sum_part_len int,
  * n_punct int, n_digit int, top_tf bigint, hits array<int>>`.
  *
  * Field contracts (each replays an existing declarative form EXACTLY —
  * the catalog oracles and golden manifest pin the equivalences):
  *  - `n_parts`  = `size(split(text, ' '))` — single-space split, empty
  *    parts (consecutive/trailing spaces) included = #spaces + 1;
  *  - `n_chars`  = `length(text)` (codepoints — UTF8String.numChars
  *    counts non-continuation bytes, reproduced here);
  *  - `sum_part_len` = `aggregate(split(text,' '), 0, acc + length(x))`
  *    ≡ n_chars − n_spaces (separator spaces are the only chars not in
  *    any part);
  *  - `n_punct`  = `regexp_count(text, '[^a-zA-Z0-9 ]')` — Java regex
  *    negated classes match per CODEPOINT, so every non-ASCII codepoint
  *    counts once (leading byte), continuation bytes never;
  *  - `n_digit`  = `regexp_count(text, '[0-9]')`;
  *  - `top_tf`   = `array_max(transform(token_counts(text), x -> x.tf))`
  *    — [[TokenCounts]] tokenization (byte-split on ' ', empty tokens
  *    counted);
  *  - `hits(i)`  = `size(filter(split(text,' '), t -> array_contains(w_i, t)))`
  *    for the i-th configured word list (byte-equality membership).
  *
  * Why native: the declarative row gate reads each document ~8 times —
  * one split per language list, two regexp scans, two more splits for
  * the quality score, a token_counts pass. At 10M docs the measured
  * stage-1 wall was 390 s, ~85% of the whole curation pipeline. This
  * expression is one scan + one token hashmap; with whole-stage codegen
  * subexpression elimination, every gate that references `gate_stats(text)`
  * in the same filter shares a single evaluation per row.
  */
final case class GateStats(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"gate_stats requires a string input, got ${child.dataType}")
    else if (wordLists.exists(_.exists(_.isEmpty)))
      TypeCheckResult.TypeCheckFailure(
        "gate_stats word lists must contain non-empty words")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = GateStats.Schema
  override def prettyName: String = "gate_stats"

  @transient private lazy val sets =
    GateStats.wordSets(wordLists.map(_.toArray).toArray)

  override def nullSafeEval(input: Any): Any =
    GateStats.stats(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val listsRef = ctx.addReferenceObj("gateWordLists",
      wordLists.map(_.toArray).toArray, "java.lang.String[][]")
    val setsVar = ctx.addMutableState("java.util.HashSet[]", "gateSets",
      v => s"$v = graft.functions.GateStats.wordSets($listsRef);")
    defineCodeGen(ctx, ev, c => s"graft.functions.GateStats.stats($c, $setsVar)")
  }

  override protected def withNewChildInternal(newChild: Expression): GateStats =
    copy(child = newChild)
}

object GateStats {
  val Schema: DataType = StructType(Seq(
    StructField("n_parts", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("sum_part_len", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("top_tf", LongType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  /** Per-JVM word-set cache (the PolicyHits.automaton pattern): one
    * HashSet[UTF8String] array per distinct list-of-lists, shared by the
    * codegen constructor and every deserialized interpreted instance. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    List[List[String]], Array[java.util.HashSet[UTF8String]]]()

  def wordSets(lists: Array[Array[String]]): Array[java.util.HashSet[UTF8String]] =
    cache.computeIfAbsent(lists.map(_.toList).toList, { ls =>
      ls.map { words =>
        val s = new java.util.HashSet[UTF8String]()
        words.foreach(w => s.add(UTF8String.fromString(w)))
        s
      }.toArray
    })

  /** Static helper the generated code calls: one byte scan + one token
    * hashmap per row. */
  def stats(s: UTF8String,
      sets: Array[java.util.HashSet[UTF8String]]): InternalRow = {
    val raw = s.getBytes
    val n = raw.length
    var nSpaces = 0
    var nChars = 0
    var nPunct = 0
    var nDigit = 0
    var i = 0
    while (i < n) {
      val b = raw(i) & 0xff
      if (b < 0x80) { // ASCII codepoint
        nChars += 1
        if (b == ' ') nSpaces += 1
        else if (b >= '0' && b <= '9') nDigit += 1
        else if (!((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')))
          nPunct += 1
      } else if (b >= 0xc0) { // leading byte: one non-ASCII codepoint
        nChars += 1
        nPunct += 1 // outside [a-zA-Z0-9 ] by definition
      } // 0x80..0xBF continuation bytes: not a codepoint
      i += 1
    }
    // token pass: same boundaries as TokenCounts (split on ' ' bytes,
    // empty tokens between/after separators included)
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    val hits = new Array[Int](sets.length)
    var topTf = 0L
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || raw(i) == ' '.toByte) {
        val tok = UTF8String.fromBytes(raw, start, i - start)
        var slot = m.get(tok)
        if (slot == null) { slot = Array(0L); m.put(tok, slot) }
        slot(0) += 1L
        if (slot(0) > topTf) topTf = slot(0)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(tok)) hits(j) += 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nSpaces + 1, nChars, nChars - nSpaces, nPunct, nDigit, topTf,
      new GenericArrayData(hits.map(Int.box))))
  }

  /** Column-API entry point. */
  def apply(text: Column, wordLists: Seq[Seq[String]]): Column =
    Bridge.column(GateStats(Bridge.expression(text), wordLists))
}
