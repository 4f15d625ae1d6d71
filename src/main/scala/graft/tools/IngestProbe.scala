package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: the fixed-batch ingest-cost probe behind the
  * [[graft.operators.Dedup.minhashCandidatesIndexed]] scale claim. The
  * catalog row (q221) splits ONE table 75/25, so its batch grows with the
  * corpus and the row's tiers measure total scaling, not the production
  * question — "what does ONE ingest batch cost as the standing corpus
  * grows?". This probe holds the batch fixed (the sf0.1 documents with
  * doc_id % 4 == 0, ~15k docs) and grows only the corpus
  * (doc_id % 4 != 0 from the target dir — ids disjoint from the batch by
  * the mod-4 split, whatever the dir): per corpus tier it times the
  * indexed path (standing bucketed sig/band index, built once in the
  * discarded warmup exactly like a warehouse pays it once per corpus)
  * against the unindexed [[Dedup.minhashCandidatesIncremental]] (which
  * re-shingles and re-signs the corpus every call). Indexed per-batch
  * cost should stay ~flat across tiers; the unindexed path grows with
  * the corpus. Prints SCALEAUDIT-style lines (min-estimator protocol:
  * report the MIN across reps) and appends SPARK_GRAFT_SCALE_OUT JSONL
  * like ScaleAudit when set.
  *
  * Usage: `IngestProbe <corpusDir> [reps]` (batch dir pinned to sf0.1) */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val batchDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .where(col("doc_id") % 4 =!= 0)
    val batch = spark.read.parquet(s"$batchDir/documents.parquet")
      .where(col("doc_id") % 4 === 0)
    def run(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      var rows = f().count() // discarded warmup (indexed: builds the index)
      graft.core.CacheScope.drain()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = f().count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.core.CacheScope.drain()
        t
      }.sorted
      val all = times.map(t => f"$t%.2f").mkString(",")
      println(f"SCALEAUDIT $tag $corpusDir ${times.head}%.2f s ($rows rows) all=$all")
      sys.env.get("SPARK_GRAFT_SCALE_OUT").foreach { path =>
        def js(s: String): String = graft.core.Jsons.str(s)
        val line = s"""{"query":${js(tag)},"dir":${js(corpusDir)},""" +
          s""""median_s":${times(times.size / 2)},"rows":$rows,""" +
          s""""all_s":[${times.mkString(",")}]}""" + "\n"
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
    }
    run("ingest_fixedbatch_indexed", () =>
      graft.operators.Dedup.minhashCandidatesIndexed(corpus, batch,
        "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
        sigTable = graft.operators.ScaleOps
          .bucketTableName("graft_probe_incsig", corpusDir),
        bandTable = graft.operators.ScaleOps
          .bucketTableName("graft_probe_incband", corpusDir)))
    run("ingest_fixedbatch_unindexed", () =>
      graft.operators.Dedup.minhashCandidatesIncremental(corpus, batch,
        "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16))
    spark.stop()
  }
}
