package graft.jobs

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

/** The composed corpus-health report: totals must re-derive from the
  * per-source rows, constituent metrics must agree with the operators they
  * come from, and the Zipf fit rides only the corpus row. */
class CorpusReportSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("corpus row == sum/weighted-avg of per-source rows; zipf only on corpus row") {
    val rep = CorpusReport.run(docs).collect()
    val (corpusRows, srcRows) = rep.partition(_.getInt(rep.head.fieldIndex("is_corpus_row")) == 1)
    assert(corpusRows.length == 1)
    val corpus = corpusRows.head
    def li(name: String) = corpus.fieldIndex(name)
    assert(srcRows.map(_.getLong(li("n_docs"))).sum == corpus.getLong(li("n_docs")))
    assert(srcRows.map(_.getLong(li("total_tokens"))).sum ==
      corpus.getLong(li("total_tokens")))
    // corpus mean quality = doc-weighted mean of the source means (6dp rounding slack)
    val weighted = srcRows.map(r =>
      r.getDouble(li("mean_quality")) * r.getLong(li("n_docs"))).sum /
      corpus.getLong(li("n_docs"))
    assert(math.abs(weighted - corpus.getDouble(li("mean_quality"))) < 1e-4)
    // zipf fit: corpus row only, and it matches the operator it came from
    srcRows.foreach(r => assert(r.isNullAt(li("zipf_slope"))))
    val z = TextAnalysis.zipfSlope(docs, "text", CorpusReport.Config().vocabK).head()
    assert(corpus.getDouble(li("zipf_slope")) == z.getDouble(1))
    // slope of a natural-ish corpus is negative (frequency falls with rank)
    assert(corpus.getDouble(li("zipf_slope")) < 0.0)
  }

  test("metrics agree with their source operators (quality, novelty)") {
    val rep = CorpusReport.run(docs)
      .where(col("is_corpus_row") === 1).head()
    // the report's internal persists are live until drained; the direct
    // operator calls below re-persist the same sub-plans
    graft.core.CacheScope.drain()
    val directQuality = docs.agg(
      round(avg(TextAnalysis.qualityScore(col("text"))), 6)).head().getDouble(0)
    assert(math.abs(rep.getDouble(rep.fieldIndex("mean_quality")) - directQuality) < 1e-5)
    val directNovelty = graft.operators.Dedup.noveltyRates(docs, "doc_id", "text", 3)
      .agg(round(avg(col("novelty")), 6)).head().getDouble(0)
    assert(math.abs(rep.getDouble(rep.fieldIndex("mean_novelty")) - directNovelty) < 1e-5)
    assert(rep.getDouble(rep.fieldIndex("near_dup_share")) >= 0.0)
  }
}
