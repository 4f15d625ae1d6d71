package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** Round-5 curation operators: segment-level boilerplate stripping,
  * vocabulary building, semantic dedup, the quality-quantile gate, and
  * epoch-weighted mixing. Each is checked against an independent
  * declarative restatement of its semantics (not against itself). */
class CurationOpsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // --------------------------------------------------- SegmentHashes

  test("segment_hashes == declarative slice+hash twin, incl. ragged tails") {
    import spark.implicits._
    val df = Seq(
      "a b c d e f g h i",          // 9 tokens, w=4 → 2 segs + ragged 1
      "a b c d",                     // exactly one segment
      "a b c",                       // shorter than w → no segment
      "", "x",                       // degenerate
      "a  b c d",                    // double space → empty token counts
      "uno dos tres cuatro cinco seis siete ocho").toDF("text")
    val w = 4
    val fused = df.select(graft.functions.SegmentHashes(col("text"), w).as("h"))
    // guard the zero-segment case: sequence(1, 0) steps DOWN in Spark, so
    // the transform only runs when at least one full segment exists
    val t = split(col("text"), " ")
    val nSegs = floor(size(t) / lit(w)).cast("int")
    val declarativeSafe = df.select(
      when(nSegs >= 1,
        transform(sequence(lit(1), greatest(nSegs, lit(1))),
          g => graft.functions.Hashing.stableHash(
            concat_ws(" ", slice(t, (g - 1) * w + 1, lit(w))))))
        .otherwise(array().cast("array<long>")).as("h"))
    val a = fused.collect().map(_.getSeq[Long](0).toList)
    val b = declarativeSafe.collect().map(_.getSeq[Long](0).toList)
    assert(a.toList == b.toList)
  }

  // ------------------------------------------------ boilerplateStrip

  test("boilerplateStrip: accounting identity and hot-everywhere semantics") {
    import spark.implicits._
    val boiler = "all rights reserved contact us terms of service"  // 8 words
    val unique = (i: Int) => s"unique${i}a unique${i}b unique${i}c unique${i}d " +
      s"unique${i}e unique${i}f unique${i}g unique${i}h"
    // docs 0-4 share the boilerplate segment; 5-6 are fully unique; doc 7
    // contains the boilerplate TWICE (both occurrences must drop)
    val df = ((0 to 4).map(i => (i.toLong, s"$boiler ${unique(i)}")) ++
      Seq((5L, unique(5)), (6L, unique(6)),
          (7L, s"$boiler $boiler tail words here")))
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateStrip(df, "doc_id", "text",
      segWords = 8, maxDocFreq = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    (0 to 4).foreach { i =>
      val (nTok, nSegs, nDropped, kept) = out(i.toLong)
      assert(nSegs == 2 && nDropped == 1, s"doc $i: boiler seg must drop")
      assert(kept == nTok - 8)
    }
    Seq(5L, 6L).foreach { i =>
      val (nTok, _, nDropped, kept) = out(i)
      assert(nDropped == 0 && kept == nTok)
    }
    val (t7, s7, d7, k7) = out(7L)
    assert(s7 == 2 && d7 == 2, "both boilerplate occurrences drop")
    assert(k7 == t7 - 16)
  }

  test("boilerplateStrip: forced shuffle branch == broadcast branch") {
    // maxBroadcastHot = 0 forces the size-guard's degradation path (the
    // shuffle join a data-sized hot set would trigger at corpus scale);
    // output must be identical to the broadcast branch row-for-row
    val broadcastOut = Dedup.boilerplateStrip(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val shuffleOut = Dedup.boilerplateStrip(docs, "doc_id", "text",
        maxBroadcastHot = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(broadcastOut.toSeq == shuffleOut.toSeq)
  }

  test("boilerplateStrip on corpus: kept_tokens identity, no doc lost") {
    val out = Dedup.boilerplateStrip(docs, "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.where(col("kept_tokens") =!=
      col("n_tokens") - col("n_dropped") * 8).count() == 0)
    assert(out.where(col("n_dropped") > col("n_segs")).count() == 0)
  }

  // ------------------------------------------------------ vocabTopK

  test("vocabTopK == explode/groupBy twin") {
    val k = 25
    val fused = TextAnalysis.vocabTopK(docs, "text", k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tf = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val twin = tf.groupBy("tok")
      .agg(sum("c").as("tf_total"), count(lit(1)).as("df"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("tf_total").desc, col("tok"))).cast("long"))
      .where(col("rnk") <= k).orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fused.toList == twin.toList)
  }

  // -------------------------------------------------- semanticDedup

  test("semanticDedup: dropped iff a lower-id in-cell neighbor above threshold") {
    val nlist = 8
    val minCos = 0.35
    val out = Similarity.semanticDedup(emb, nlist, minCos)
    // restate: join verdicts against independently computed in-cell pairs
    val assigned = out.select("vec_id", "cid")
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val withVec = assigned.join(vecs, "vec_id")
    val pairs = withVec.as("l").join(withVec.as("r"),
        col("l.cid") === col("r.cid") && col("l.vec_id") < col("r.vec_id"))
      .where(graft.functions.Vectors.dot(col("l.embedding"), col("r.embedding")) /
        (graft.functions.Vectors.l2Norm(col("l.embedding")) *
         graft.functions.Vectors.l2Norm(col("r.embedding"))) >= minCos)
      .select(col("r.vec_id").as("vec_id")).distinct()
    val expectedDropped = pairs.collect().map(_.getLong(0)).toSet
    val actualDropped = out.where(!col("keep")).collect().map(_.getLong(0)).toSet
    assert(actualDropped == expectedDropped)
    assert(out.count() == emb.count(), "every vector gets a verdict")
  }

  // -------------------------------------- minhashCandidatesIncremental

  test("incremental dedup == full candidates filtered to pairs touching new") {
    val old = docs.where(col("doc_id") % 4 =!= 0)
    val neu = docs.where(col("doc_id") % 4 === 0)
    val inc = Dedup.minhashCandidatesIncremental(old, neu, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16)
      .where(col("id_a") % 4 === 0 || col("id_b") % 4 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == full)
    // and strictly no old-old pair sneaks in
    assert(inc.forall { case (a, b, _) => a % 4 == 0 || b % 4 == 0 })
  }

  // -------------------------------------------------------- oovRate

  test("oovRate: k covering the whole vocab gives zero OOV; k=tiny gives high OOV") {
    import spark.implicits._
    val tiny = Seq((1L, "a a a b"), (2L, "a c c c c")).toDF("doc_id", "text")
    val full = TextAnalysis.oovRate(tiny, "doc_id", "text", k = 100)
    assert(full.where(col("oov_tokens") =!= 0L).count() == 0)
    // k=1 keeps only the most frequent token ('c': tf 4 beats 'a': tf 4?
    // no — both tf 4, tie falls to 'a' lexicographically)
    val one = TextAnalysis.oovRate(tiny, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(one(1L) == ((4L, 1L)))  // 'b' is OOV
    assert(one(2L) == ((5L, 4L)))  // all four 'c' are OOV
  }

  // ---------------------------------------------------- qualityGate

  test("qualityGate == global row_number ranking (histogram path is exact)") {
    val frac = 0.3
    val out = TextAnalysis.qualityGate(docs, "doc_id", "text", frac)
    val n = docs.count()
    val target = math.floor(frac * n).toLong
    val ranked = docs.select(col("doc_id").as("id"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("score").desc, col("id"))))
    val expectKeep = ranked.where(col("rnk") <= target)
      .collect().map(_.getLong(0)).toSet
    val actualKeep = out.where(col("keep")).collect().map(_.getLong(0)).toSet
    assert(actualKeep == expectKeep)
    assert(actualKeep.size.toLong == target)
    assert(out.count() == n, "gate returns a verdict per doc, not a filter")
  }

  test("qualityGate keepFrac=0 keeps nothing; keepFrac=1 keeps everything") {
    import spark.implicits._
    val tiny = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    assert(TextAnalysis.qualityGate(tiny, "doc_id", "text", 0.0)
      .where(col("keep")).count() == 0)
    graft.core.CacheScope.drain() // same scored plan re-persists below
    assert(TextAnalysis.qualityGate(tiny, "doc_id", "text", 1.0)
      .where(col("keep")).count() == 3)
  }

  // ------------------------------------------------- tokenBudgetGate

  test("tokenBudgetGate == global cumsum prefix (histogram path is exact)") {
    val budget = 30000L
    val out = TextAnalysis.tokenBudgetGate(docs, "doc_id", "text", budget)
    val expectKeep = docs.select(col("doc_id").as("id"),
        TextAnalysis.qualityScore(col("text")).as("score"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(
        Window.orderBy(col("score").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum") <= budget)
      .collect().map(_.getLong(0)).toSet
    val got = out.where(col("keep")).collect().map(_.getLong(0)).toSet
    assert(got == expectKeep)
    assert(out.count() == docs.count(), "gate returns a verdict per doc")
    // the kept set actually fits the budget, and is maximal as a prefix:
    // adding the best-scored dropped doc must overflow
    val keptTokens = out.where(col("keep"))
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(keptTokens <= budget)
  }

  test("tokenBudgetGate: zero budget keeps nothing, huge budget keeps all") {
    import spark.implicits._
    val tiny = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.tokenBudgetGate(tiny, "doc_id", "text", 0L)
      .where(col("keep")).count() == 0)
    graft.core.CacheScope.drain() // same scored plan re-persists below
    assert(TextAnalysis.tokenBudgetGate(tiny, "doc_id", "text", 1000000L)
      .where(col("keep")).count() == 2)
  }

  // ------------------------------------------------------- epochMix

  test("epochMix: copy counts match quantized weights, copy_idx is dense") {
    val weights = Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.4)
    val out = ScaleOps.epochMix(docs, "source", "doc_id", weights,
      defaultWeight = 0.0)
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
    // dense 0..n-1 copy indices
    assert(perDoc.where(col("mx") =!= col("n") - 1).count() == 0)
    // whole part: every src1 doc appears exactly twice (frac 0 → no extra)
    assert(perDoc.where(col("source") === "src1" && col("n") =!= 2).count() == 0)
    // src0: 2 or 3 copies; src2: 0 or 1 (docs absent from out when 0)
    assert(perDoc.where(col("source") === "src0" &&
      (col("n") < 2 || col("n") > 3)).count() == 0)
    assert(perDoc.where(col("source") === "src2" && col("n") =!= 1).count() == 0)
    // default weight 0 → other sources contribute nothing
    assert(out.where(!col("source").isin("src0", "src1", "src2")).count() == 0)
    // determinism: a second run emits the identical multiset
    val again = ScaleOps.epochMix(docs, "source", "doc_id", weights, 0.0)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("degenerate inputs: empty corpus, k past vocab, nlist past corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.boilerplateStrip(empty, "doc_id", "text").count() == 0)
    assert(TextAnalysis.vocabTopK(empty, "text", 5).count() == 0)
    assert(TextAnalysis.qualityGate(empty, "doc_id", "text", 0.5).count() == 0)
    // k larger than the vocabulary: every token ranked, none invented
    val two = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabTopK(two, "text", 100)
    assert(v.count() == 3 && v.agg(max("rnk")).head().getLong(0) == 3L)
    // nlist larger than the corpus: every vector its own cell, all kept
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val sd = Similarity.semanticDedup(vecs, nlist = 16, minCosine = 0.9)
    assert(sd.count() == 2 && sd.where(!col("keep")).count() == 0)
  }

  test("degenerate inputs, round-6 ops: empty/singleton corpora, edge params") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bpePairStats(empty, "text", 5).count() == 0)
    assert(TextAnalysis.bpeSegment(empty, "text", Seq("a" -> "b")).count() == 0)
    // no merges at all: every word stays fully split (the declarative form
    // takes Nil as "zero merge passes")
    val one = Seq((1L, "abc x")).toDF("doc_id", "text")
    val unsplit = TextAnalysis.bpeSegment(one, "text", Nil)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(unsplit("abc") == "a b c" && unsplit("x") == "x")
    // quantiles: single row → every permille returns that value
    val single = Seq(("g", 7.5)).toDF("src", "v")
    val q = ScaleOps.groupQuantiles(single, "src", col("v"), Seq(1, 500, 1000))
      .collect().map(_.getDouble(2))
    assert(q.length == 3 && q.forall(_ == 7.5))
    // temperature weights: one stratum → weight exactly 1.0 at any alpha
    val w = ScaleOps.temperatureWeights(single, "src", 0.3)
      .head()
    assert(w.getLong(1) == 1L && w.getDouble(3) == 1.0)
    // range join: empty dims → empty result, not a crash
    val noDims = Seq.empty[(Double, Double, String)].toDF("lo", "hi", "band")
    assert(ScaleOps.rangeBucketJoin(single.toDF("src", "k"), "k",
      noDims, "lo", "hi", 1.0).count() == 0)
    // hard negatives: all labels equal → nothing to mine
    val mono = Seq((0L, Seq(1f, 0f), 1), (1L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardNegatives(mono, mono, k = 3).count() == 0)
    // microPearson: constant column → zero variance → r is NULL (0/0), not a crash
    val const = Seq(("g", 1.0, 2.0), ("g", 1.0, 3.0)).toDF("g", "x", "y")
    val r = ScaleOps.microPearson(const, "g", col("x"), col("y")).head()
    assert(r.isNullAt(2))
  }

  test("epochMix fractional subset == hashSample of the same permille") {
    // weight 0.4 keeps exactly the docs hashSample(permille=400) keeps —
    // the hash-decision composition contract across mixing primitives
    val mixed = ScaleOps.epochMix(docs.where(col("source") === "src2"),
      "source", "doc_id", Map("src2" -> 0.4), 0.0)
      .select("doc_id").distinct()
    val sampled = ScaleOps.hashSample(docs.where(col("source") === "src2"),
      "doc_id", permille = 400).select("doc_id")
    assert(mixed.exceptAll(sampled).isEmpty && sampled.exceptAll(mixed).isEmpty)
  }
}
