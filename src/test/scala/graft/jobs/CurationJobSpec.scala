package graft.jobs

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

/** The composed curation pipeline: every gate provably fires on constructed
  * inputs, and the real documents table flows end-to-end. */
class CurationJobSpec extends SparkSpec {

  test("constructed corpus: each stage drops exactly the rows it should") {
    import spark.implicits._
    val en = "the quick brown fox jumps over the lazy dog and it is a fine day for running"
    val docs = Seq(
      (1L, en, "en"),                                  // keeper
      (2L, en, "en"),                                  // exact dup of 1 → dropped at stage 2
      (3L, en + " extra tail word", "en"),             // near-dup of 1 → dropped at stage 3
      (4L, "der hund ist ein tier und das ist gut so am tag", "de"), // wrong lang
      (5L, "!!! ### 123 &&& ~~~ ((( ))) @@@", "en"),   // quality floor
      (6L, "a completely different english document about the sea and the sky " +
        "that it is in every way distinct for this test", "en")) // keeper
      .toDF("doc_id", "text", "lang")

    val (out, stats) = CurationJob.run(docs,
      CurationJob.Config(minQuality = 0.4, nearDupJaccard = 0.5))
    assert(stats.input == 6)
    assert(stats.afterQuality == 4)   // 4 (lang) and 5 (quality) gone
    assert(stats.afterExact == 3)     // 2 gone
    assert(stats.afterNearDup == 2)   // 3 gone
    val ids = out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 6L))
    // chunk text round-trips (docs shorter than one window → identity)
    val c1 = out.where(col("doc_id") === 1).select("chunk").head().getString(0)
    assert(c1 == en)
  }

  test("policy blocklist gate drops hit docs; budget keeps best docs that fit") {
    import spark.implicits._
    val clean = "the quick brown fox jumps over the lazy dog and it is a " +
      "fine day for running through the field with good cheer in the sun"
    val hit = clean + " now buy cheap pills today"
    val short = "a tidy little english sentence about the calm blue sea today"
    val docs = Seq(
      (1L, clean, "en"), (2L, hit, "en"), (3L, short, "en"))
      .toDF("doc_id", "text", "lang")
    // blocklist: doc 2 carries one forbidden phrase → dropped at the row gate
    val (_, s1) = CurationJob.run(docs, CurationJob.Config(minQuality = 0.1,
      blockedPatterns = Seq("buy cheap pills", "crypto giveaway")))
    assert(s1.afterQuality == 2)
    // token budget: doc 1 (26 tokens, higher quality than 11-token doc 3)
    // fits a 30-token budget alone; doc 3 would then overflow it
    val pair = docs.where(col("doc_id") =!= 2)
    val q = pair.orderBy("doc_id")
      .select(TextAnalysis.qualityScore(col("text"))).collect()
    assert(q(0).getDouble(0) > q(1).getDouble(0), "fixture: doc1 outscores doc3")
    val (out2, s2) = CurationJob.run(pair, CurationJob.Config(minQuality = 0.1,
      tokenBudget = Some(30L)))
    assert(s2.afterNearDup == 2, "budget must cut AFTER dedup counting")
    val kept = out2.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("compression bounds drop looping text, spare prose") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and it is a " +
      "fine day for running through the field with good cheer in the sun"
    val docs = Seq(
      (1L, prose, "en"),
      (2L, ("the and is it to " * 60).trim, "en")) // loops → ratio ≈ 0.03
      .toDF("doc_id", "text", "lang")
    val (_, off) = CurationJob.run(docs, CurationJob.Config(minQuality = 0.0))
    assert(off.afterQuality == 2)
    val (_, on) = CurationJob.run(docs, CurationJob.Config(minQuality = 0.0,
      compressionBounds = Some((0.25, 1.0))))
    assert(on.afterQuality == 1)
  }

  test("containment pass drops the quoted doc but not its container") {
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy dog tonight in the field"
    val docs = Seq(
      (1L, quote, "en"),                               // contained in 2 → dropped
      (2L, s"preface words set the scene here $quote and a long trailing " +
        "discussion keeps the jaccard far below the near dup bar", "en"),
      (3L, "a completely different english document about the sea and the " +
        "sky that it is in every way distinct for this test", "en"))
      .toDF("doc_id", "text", "lang")
    // without the containment pass the quote survives (jaccard too low)
    val (_, statsOff) = CurationJob.run(docs,
      CurationJob.Config(minQuality = 0.0, nearDupJaccard = 0.9))
    assert(statsOff.afterNearDup == 3)
    val (out, statsOn) = CurationJob.run(docs,
      CurationJob.Config(minQuality = 0.0, nearDupJaccard = 0.9,
        containmentThreshold = Some(0.8)))
    assert(statsOn.afterNearDup == 2)
    val ids = out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L))
  }

  test("dup-chunk gate drops passage-heavy docs that whole-doc dedup misses") {
    import spark.implicits._
    // a long shared passage dominating two docs whose FRAMING differs enough
    // that whole-doc jaccard and containment both stay below their bars
    val passage = Seq.tabulate(10)(r =>
      s"alpha bravo charlie delta echo foxtrot golf hotel india row$r " +
        s"juliet kilo lima mike november oscar papa quebec romeo sierra " +
        s"tango uniform victor whiskey xray yankee zulu extra$r")
      .mkString(" ")
    val docs = Seq(
      (1L, s"this is the opening that frames it for us so $passage", "en"),
      (2L, s"here is another way in which it was framed for the record $passage", "en"),
      (3L, "a completely different english document about the sea and the " +
        "sky that is in every way distinct for this test", "en"))
      .toDF("doc_id", "text", "lang")
    val base = CurationJob.Config(minQuality = 0.0, nearDupJaccard = 0.95,
      containmentThreshold = Some(0.95))
    val (_, off) = CurationJob.run(docs, base)
    assert(off.afterNearDup == 3, s"gate off must keep all three: $off")
    val (out, on) = CurationJob.run(docs,
      base.copy(maxDupChunkShare = Some(0.5)))
    // both passage-heavy docs exceed the 50% duplicated-chunk share; the
    // distinct doc carries no duplicated chunk at all
    assert(on.afterNearDup == 1, s"gate on must keep only the distinct doc: $on")
    assert(out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("importance sampling: deterministic across runs, keeps more than uniform at same mean rate only via scores") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("lang", lit("en"))
      .select(col("doc_id"), col("text"), col("lang"))
    def run() = CurationJob.run(docs,
      CurationJob.Config(minQuality = 0.0, lang = "en",
        keepTopQualityFrac = None, importanceRate = Some(0.8)))
    val (outA, statsA) = run()
    val a = outA.select("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val (_, statsB) = run()
    assert(statsA.sampled == statsB.sampled) // reproducible under re-run
    assert(statsA.sampled > 0 && statsA.sampled < statsA.chunks)
    // kept set is exactly re-derivable: same hash, same scores
    val (outC, _) = run()
    val c = outC.select("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == c)
  }

  test("transitive mode keeps one doc per near-dup CLUSTER, pairwise keeps local minima") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and it is a fine day for running"
    // ids chosen so the chain's middle doc is the LARGEST: pairwise drop
    // (larger of each pair) keeps both endpoints 1 and 3; transitive closure
    // keeps only the cluster min 1. Chain: 1 ~ 5 ~ 3. The est_jaccard values
    // are deterministic (fixed stableHash coefficients): 1~5 = 0.875,
    // 3~5 = 0.53125, 1~3 = 0.46875 — threshold 0.5 admits exactly the chain.
    val docs = Seq(
      (1L, base + " alpha beta gamma delta", "en"),
      (5L, base + " alpha beta epsilon zeta", "en"),
      (3L, base + " theta iota epsilon zeta", "en"))
      .toDF("doc_id", "text", "lang")
    def ids(transitive: Boolean): Set[Long] =
      CurationJob.run(docs, CurationJob.Config(minQuality = 0.0,
          nearDupJaccard = 0.5, transitive = transitive))
        ._1.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val pairwise = ids(transitive = false)
    val transitive = ids(transitive = true)
    // the chain's middle (5) is dropped either way; the far endpoint (3)
    // survives only in pairwise mode
    assert(pairwise == Set(1L, 3L))
    assert(transitive == Set(1L))
  }

  test("repetition and LM gates drop spam and character soup") {
    import spark.implicits._
    val clean1 = "the quick brown fox jumps over the lazy dog and it is a fine day"
    val clean2 = "the slow red fox walks under the busy dog and it is a good day"
    val spam = "the the the the the the the the the the the the fox"
    val soup = "tqz jxq zvq the it is a qjz xqv zqt qzx jvq zzq the of and"
    val docs = Seq(
      (1L, clean1, "en"), (2L, clean2, "en"),
      (3L, spam, "en"),   // top token 'the' share 12/13 → repetition gate
      (4L, soup, "en"))   // rare bigram transitions → LM gate
      .toDF("doc_id", "text", "lang")
    // the LM model is self-trained, so derive the floor from the corpus:
    // soup must score strictly lowest, and a floor between soup and the
    // next-lowest doc must cut exactly soup
    val scores = TextAnalysis.charLmScore(
        docs.where(col("doc_id") =!= 3), "doc_id", "text")
      .select("id", "lm_score").as[(Long, Double)].collect().toMap
    assert(scores(4L) < scores(1L) && scores(4L) < scores(2L),
      s"soup not lowest: $scores")
    val floor = (scores(4L) + (scores - 4L).values.min) / 2
    val (out, stats) = CurationJob.run(docs, CurationJob.Config(
      minQuality = 0.0, maxTopTokenShare = Some(0.5),
      minLmScore = Some(floor), nearDupJaccard = 0.95))
    val ids = out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!ids.contains(3L), "repetition gate missed the spam doc")
    assert(!ids.contains(4L), "LM gate missed the character soup")
    assert(ids == Set(1L, 2L))
    assert(stats.afterQuality == 2)
    // defaults-off config leaves prior behavior untouched
    val (_, stats0) = CurationJob.run(docs, CurationJob.Config(
      minQuality = 0.0, nearDupJaccard = 0.95))
    assert(stats0.afterQuality == 4)
  }

  test("boilerplate-share gate drops mostly-boilerplate docs, spares light ones") {
    import spark.implicits._
    val boiler = "all rights reserved contact us terms of service" // 8 words
    // every doc carries en function words so the LANG gate passes them all —
    // this test must isolate the boilerplate gate
    def uniq(i: Int, n: Int) = "the is it and " +
      (0 until n).map(j => s"tok$i" + ('a' + j).toChar).mkString(" ")
    // 1-3: one boiler seg + 29 other tokens (share 8/37 ≈ 0.22)
    // 4: boiler twice + 12 other (share 16/28 ≈ 0.57 → gated)
    // 5: no boilerplate at all
    val docs = Seq(
      (1L, s"$boiler ${uniq(1, 25)}", "en"),
      (2L, s"$boiler ${uniq(2, 25)}", "en"),
      (3L, s"$boiler ${uniq(3, 25)}", "en"),
      (4L, s"$boiler $boiler ${uniq(4, 8)}", "en"),
      (5L, uniq(5, 33), "en")).toDF("doc_id", "text", "lang")
    val (out, stats) = CurationJob.run(docs, CurationJob.Config(
      minQuality = 0.0, lang = "en", nearDupJaccard = 0.95,
      maxBoilerplateShare = Some(0.5)))
    val ids = out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!ids.contains(4L), "mostly-boilerplate doc must gate out")
    assert(Set(1L, 2L, 3L, 5L).subsetOf(ids))
    assert(stats.afterQuality == 4)
  }

  test("keepTopQualityFrac gates relatively: exactly floor(frac*n) survive") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("lang") === "en")
    val (_, stats) = CurationJob.run(docs, CurationJob.Config(
      lang = "en", keepTopQualityFrac = Some(0.5), nearDupJaccard = 0.95))
    // the fraction applies WITHIN the heuristic-lang-matched subset (the
    // metadata lang column and the n-gram guess disagree on some docs)
    val n = docs.where(TextAnalysis.langIdGuess(col("text")) === "en").count()
    assert(stats.afterQuality == math.floor(0.5 * n).toLong,
      s"expected floor(0.5*$n), got ${stats.afterQuality}")
  }

  test("benchmark decontamination removes leaky docs before dedup") {
    import spark.implicits._
    val en = "the quick brown fox jumps over the lazy dog and it is a fine day for running"
    val docs = Seq(
      (1L, en + " with its own special ending here", "en"),
      (2L, "a completely different english document about the sea and the sky " +
        "that it is in every way distinct for this test", "en"))
      .toDF("doc_id", "text", "lang")
    val benchmark = Seq((900L, en)).toDF("doc_id", "text")
    val (out, stats) = CurationJob.run(docs,
      CurationJob.Config(minQuality = 0.0), benchmark = Some(benchmark))
    assert(stats.decontaminated == 1) // doc 1 leaks the benchmark text
    val ids = out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
    // without a benchmark, nothing is removed and the field stays 0
    val (_, stats2) = CurationJob.run(docs, CurationJob.Config(minQuality = 0.0))
    assert(stats2.decontaminated == 0)
  }

  test("split stage: near-dups below the dedup cut still share a split; chunks inherit it") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and it is a fine " +
      "day for running through the field with good cheer in the sun today"
    // doc 2 shares a long prefix with doc 1 — similar enough to leak
    // (est_jaccard ≥ 0.3) but BELOW the 0.9 dedup threshold, so both
    // survive dedup and must co-locate in one split
    val para = base.split(" ").dropRight(5).mkString(" ") +
      " beneath a warm bright open sky"
    val other = "an entirely different english text about ships and the wide " +
      "grey sea with storms and salt and the long patient work of sailors"
    val docs = Seq((1L, base, "en"), (2L, para, "en"), (3L, other, "en"))
      .toDF("doc_id", "text", "lang")
    val cfg = CurationJob.Config(minQuality = 0.1, nearDupJaccard = 0.9,
      splitPermilles = Some(Seq("train" -> 500, "val" -> 250, "test" -> 250)),
      splitJaccard = 0.3)
    val (out, stats) = CurationJob.run(docs, cfg)
    assert(stats.afterNearDup == 3, "fixture: nothing deduped")
    assert(out.columns.contains("split"))
    val byDoc = out.select("doc_id", "split").distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.size == 3, "every doc labeled with exactly one split")
    assert(byDoc(1L) == byDoc(2L), "leaky pair must share a split")
    // every chunk of a doc carries that doc's split
    val chunkSplits = out.groupBy("doc_id")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(chunkSplits.forall(_.getLong(1) == 1L))
  }

  test("PII scrub unifies docs differing only in PII; output shards are a permutation") {
    import spark.implicits._
    val base = "please contact the quick brown fox about the fine day we had running"
    val docs = Seq(
      (1L, base + " ref alpha7", "en"),   // same doc, different "PII" handle
      (2L, base + " ref beta9", "en"),    // → exact dup of 1 after scrub
      (3L, "a completely different english document about the sea and the sky " +
        "that it is in every way distinct for this test", "en"))
      .toDF("doc_id", "text", "lang")
    val cfg = CurationJob.Config(minQuality = 0.1,
      redactClasses = Seq("handle" -> "\\b[a-z]+[0-9]+\\b"),
      outputShards = Some(4))
    val (out, stats) = CurationJob.run(docs, cfg)
    assert(stats.afterQuality == 3)
    assert(stats.afterExact == 2, "scrubbed docs 1/2 must collapse to one")
    // scrubbed text flows into chunks
    val chunk1 = out.where(col("doc_id") === 1).select("chunk")
      .head().getString(0)
    assert(chunk1.endsWith("ref <HANDLE>"), chunk1)
    // sharding: every chunk gets (shard, pos); (shard, pos) is a key and
    // positions are dense 1..n within each shard
    assert(out.columns.contains("shard") && out.columns.contains("pos"))
    val sp = out.select("shard", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(sp.toSet.size == sp.length)
    sp.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // rerun is bit-identical (deterministic scrub + hash order)
    val (out2, _) = CurationJob.run(docs, cfg)
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)
  }

  test("real documents table flows end-to-end with sane funnels") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (out, stats) = CurationJob.run(docs,
      CurationJob.Config(minQuality = 0.3, samplePermille = 500))
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterExact <= stats.afterQuality)
    assert(stats.afterNearDup <= stats.afterExact)
    assert(stats.chunks >= stats.afterNearDup) // chunking only multiplies
    assert(stats.sampled <= stats.chunks)
    assert(out.columns.toSeq == Seq("doc_id", "chunk_idx", "chunk"))
    // deterministic: same config → same output set
    val (out2, stats2) = CurationJob.run(docs,
      CurationJob.Config(minQuality = 0.3, samplePermille = 500))
    assert(stats == stats2)
    assert(out.exceptAll(out2).isEmpty)
  }

}
