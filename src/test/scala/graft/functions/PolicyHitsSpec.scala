package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

/** The Aho–Corasick counter must agree with a brute-force every-position
  * substring scan — ALL occurrences, overlapping included — on adversarial
  * patterns (self-overlapping, nested, shared prefixes) and on the real
  * corpus. */
class PolicyHitsSpec extends SparkSpec {

  private def brute(text: String, pats: Seq[String]): (Long, Long) = {
    val counts = pats.map { p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }
    (counts.sum, counts.count(_ > 0).toLong)
  }

  test("overlapping, nested and shared-prefix patterns match brute force") {
    import spark.implicits._
    val pats = Seq("aa", "aaa", "ab", "ba", "b", "table", "big table")
    val docs = Seq(
      "aaaa",                 // "aa" x3 overlapping, "aaa" x2 overlapping
      "ababab",
      "big table on a table", // nested containment
      "",                     // no match anywhere
      "bbbb",
      "aabaaabab")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = TextAnalysis.policyHits(df, "id", "text", pats)
      .orderBy("id").collect()
    docs.zipWithIndex.foreach { case (t, i) =>
      val (hits, np) = brute(t, pats)
      assert(got(i).getLong(1) == hits, s"n_hits for <$t>")
      assert(got(i).getLong(2) == np, s"n_patterns_hit for <$t>")
    }
    // the canonical overlap case, pinned explicitly: "aa" occurs 3x in "aaaa"
    assert(brute("aaaa", Seq("aa"))._1 == 3)
  }

  test("real corpus: agrees with brute force on every document") {
    val pats = Seq("slow filter", "big table", "table", "hash join", "vector scan")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = TextAnalysis.policyHits(docs, "doc_id", "text", pats)
      .orderBy("id").collect()
    val texts = docs.select("doc_id", "text").orderBy("doc_id").collect()
    assert(got.length == texts.length)
    got.zip(texts).foreach { case (g, t) =>
      val (hits, np) = brute(t.getString(1), pats)
      assert(g.getLong(1) == hits && g.getLong(2) == np, s"doc ${t.getLong(0)}")
    }
  }

  test("interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq((1L, "aaaa big table table")).toDF("id", "text")
    val pats = Seq("aa", "table")
    def run() = TextAnalysis.policyHits(df, "id", "text", pats).head()
    val cg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = run()
      assert(cg.getLong(1) == interp.getLong(1) && cg.getLong(2) == interp.getLong(2))
      assert(cg.getLong(1) == 3L + 2L && cg.getLong(2) == 2L)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null text yields a null struct; empty/duplicate patterns rejected") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "text")
    val rows = df.select(PolicyHits(col("text"), Seq("x")).as("ph"))
      .orderBy(lit(1)).collect()
    assert(rows.exists(_.isNullAt(0)))
    intercept[Exception] {
      df.select(PolicyHits(col("text"), Seq.empty)).collect()
    }
    intercept[Exception] {
      df.select(PolicyHits(col("text"), Seq("x", "x"))).collect()
    }
  }

  test("policyFilter drops exactly the docs over the hit budget") {
    import spark.implicits._
    val df = Seq((1L, "clean text"), (2L, "one table here"),
      (3L, "table table table")).toDF("id", "text")
    val strict = TextAnalysis.policyFilter(df, "text", Seq("table"))
      .select("id").as[Long].collect().sorted
    assert(strict.sameElements(Array(1L)))
    val lenient = TextAnalysis.policyFilter(df, "text", Seq("table"), maxHits = 1)
      .select("id").as[Long].collect().sorted
    assert(lenient.sameElements(Array(1L, 2L)))
  }
}
