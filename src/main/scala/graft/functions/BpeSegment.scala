package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical greedy BPE apply (Sennrich et al. 2016, the subword-nmt
  * algorithm): a word starts as its code-point sequence; while any adjacent
  * symbol pair appears in the merge table, merge every left-to-right
  * non-overlapping occurrence of the BEST-RANKED present pair, then rescan.
  * "aaaa" under (a,a) → `aa aa` — the run case the declarative
  * single-pass-per-rank rewrite ([[graft.operators.TextAnalysis.bpeSegment]])
  * resolves differently.
  *
  * Only the merge list is serialized; the rank map is rebuilt lazily and
  * cached per JVM ([[BpeSegment.merger]]), so a production-sized merge table
  * ships once as strings.
  */
final class BpeMerger private[functions] (val merges: Array[(String, String)])
    extends Serializable {

  @transient private lazy val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    var i = 0
    while (i < merges.length) { m.putIfAbsent(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }

  /** Segment one word; returns its symbols space-joined. */
  def segment(word: String): String = {
    if (word.length <= 1) return word
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && syms.size > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get((syms.get(j), syms.get(j + 1)))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            out.add(a + b); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
      }
    }
    String.join(" ", syms)
  }
}

/** `bpe_segment(word)` → the word's canonical-BPE segmentation under a fixed
  * rank-ordered merge table, symbols space-joined. Runs per VOCABULARY word
  * (callers collapse the corpus first — see
  * [[graft.operators.TextAnalysis.bpeSegmentExact]]), inside whole-stage
  * codegen: the merge loop is a static call, no UDF serialization. */
final case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"bpe_segment requires a string input, got ${child.dataType}")
    else if (merges.exists(m => m._1.isEmpty || m._2.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "bpe_segment merge pairs must be non-empty symbols")
    // an EMPTY merge list is legal: the segmentation is then the plain
    // code-point split — the trainer's round-0 state
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_segment"

  @transient private lazy val bm = BpeSegment.merger(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(bm.segment(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", merges.toArray,
      "scala.Tuple2[]")
    val bmClass = classOf[BpeMerger].getName
    val bmVar = ctx.addMutableState(bmClass, "bpeMerger",
      v => s"$v = graft.functions.BpeSegment.merger($mergesRef);")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($bmVar.segment($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object BpeSegment {
  /** Per-JVM merger cache: one rank map per distinct merge list, shared by
    * every task of every plan that uses it. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[List[(String, String)], BpeMerger]()

  def merger(merges: Array[(String, String)]): BpeMerger =
    cache.computeIfAbsent(merges.toList, ms => new BpeMerger(ms.toArray))

  /** Column-API entry point. */
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeSegment(Bridge.expression(word), merges))
}
