package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

/** The fused gate-statistics expression must agree field-for-field with the
  * declarative forms it replaced (split-on-space / regexp_count /
  * token_counts), including the edge shapes that make split semantics
  * subtle: empty string, consecutive/leading/trailing spaces (empty parts
  * count as tokens), multi-byte UTF-8 (codepoint counting), and newlines
  * (punct class, NOT token separators). */
class GateStatsSpec extends SparkSpec {

  private val cases = Seq(
    "the cat sat on the mat",
    "", " ", "  ", "a  b", " leading", "trailing ",
    "le chat de la le et", // fr stopwords
    "999 555-1234 !!!",
    "café naïve 中文 txt",
    "line1\nline2\tword",
    "a a a a a b",
    "é") // single 2-byte codepoint

  private def df = {
    import spark.implicits._
    cases.toDF("text")
  }

  test("fused fields equal their declarative twins on every edge case") {
    val g = GateStats(col("text"), TextAnalysis.StopwordsByLang.map(_._2))
    val tc = TokenCounts(col("text"))
    val rows = df.select(
      g.getField("n_parts"),
      size(split(col("text"), " ")),
      g.getField("n_chars"), length(col("text")),
      g.getField("sum_part_len"),
      aggregate(split(col("text"), " "), lit(0), (a, x) => a + length(x)),
      g.getField("n_punct"), regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")),
      g.getField("n_digit"), regexp_count(col("text"), lit("[0-9]")),
      g.getField("top_tf"),
      array_max(transform(tc, x => x.getField("tf")))).collect()
    rows.zip(cases).foreach { case (r, text) =>
      assert(r.getInt(0) == r.getInt(1), s"n_parts on '$text'")
      assert(r.getInt(2) == r.getInt(3), s"n_chars on '$text'")
      assert(r.getInt(4) == r.getInt(5), s"sum_part_len on '$text'")
      assert(r.getInt(6) == r.getInt(7), s"n_punct on '$text'")
      assert(r.getInt(8) == r.getInt(9), s"n_digit on '$text'")
      assert(r.getLong(10) == r.getLong(11), s"top_tf on '$text'")
    }
  }

  test("per-language hits equal the filter+array_contains twin") {
    val g = GateStats(col("text"), TextAnalysis.StopwordsByLang.map(_._2))
    TextAnalysis.StopwordsByLang.zipWithIndex.foreach { case ((lang, ws), i) =>
      val w = array(ws.map(lit): _*)
      val rows = df.select(
        g.getField("hits").getItem(i),
        size(filter(split(col("text"), " "), t => array_contains(w, t))))
        .collect()
      rows.zip(cases).foreach { case (r, text) =>
        assert(r.getInt(0) == r.getInt(1), s"hits($lang) on '$text'")
      }
    }
  }

  test("gate functions built on the fusion match hand-checked values") {
    import spark.implicits._
    val r = Seq("the cat sat on the mat").toDF("text")
      .select(
        TextAnalysis.langIdGuess(col("text")).as("lang"),
        TextAnalysis.topTokenShare(col("text")).as("tts"))
      .head()
    assert(r.getString(0) == "en")
    assert(r.getDouble(1) == 2.0 / 6.0) // 'the' twice over six tokens
  }

  test("null text keeps the declarative original's null semantics") {
    import spark.implicits._
    // the original formula never returned NULL for null text: least()
    // SKIPS null arguments, so lenScore and both penalties collapse to
    // their caps and the score is 0.4·1 + 0.3·0.5 = 0.55; the fused path
    // must inherit that quirk bit-for-bit, not "fix" it
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(TextAnalysis.qualityScore(col("text")),
        TextAnalysis.langIdGuess(col("text")),
        TextAnalysis.topTokenShare(col("text"))).head()
    assert(r.getDouble(0) == 0.55)
    // every when-branch predicate is null → the otherwise branch fires
    assert(r.getString(1) == "unknown")
    assert(r.isNullAt(2)) // null / null
  }
}
