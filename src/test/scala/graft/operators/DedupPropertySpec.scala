package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized brute-force twins for the inverted-index dedup operators:
  * on seeded random corpora (tiny vocabulary → dense shingle sharing, plus
  * short/empty/doubled-space edge docs), the distributed plans must equal a
  * direct Scala restatement of the semantics computed on the driver.
  * String shingles stand in for the 60-bit hashes — a collision on these
  * corpus sizes is ~2^-40, and the operators' own contract is that both
  * engines collapse collisions identically anyway. */
class DedupPropertySpec extends SparkSpec {

  // mirror of WordShingles.shingle + ShingleHashes' per-doc distinct
  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length <= n) Set(text)
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def randomCorpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val n = 8 + rnd.nextInt(12)
    (1L to n).map { id =>
      val len = rnd.nextInt(13) // 0 → empty doc
      val base = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // occasionally weave in a doubled space (empty-token edge)
      val text = if (len > 2 && rnd.nextInt(5) == 0) base.replaceFirst(" ", "  ") else base
      id -> text
    }
  }

  test("crossTagDupPairs == the fingerprint self-join form on random corpora") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 31)
      // duplicate-heavy corpus: a small text pool so fingerprints collide,
      // tags drawn from 3 values so some groups cross tags and some don't
      val pool = randomCorpus(seed).map(_._2)
      val rows = (1L to 30L).map { id =>
        (id, pool(rnd.nextInt(pool.size)), s"t${rnd.nextInt(3)}")
      }
      val df = spark.createDataFrame(rows).toDF("doc_id", "text", "lang")
      val got = Dedup.crossTagDupPairs(df, "doc_id", "lang", "text")
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      val fp = df.select(col("doc_id"), col("lang"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      val want = fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
            col("a.lang") =!= col("b.lang"))
        .select(col("a.doc_id"), col("b.doc_id"), col("a.lang"), col("b.lang"))
        .orderBy("a.doc_id", "b.doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      assert(got.toSeq == want.toSeq, s"seed=$seed")
      assert(got.nonEmpty || want.isEmpty)
    }
  }

  test("crossTagDupPairs: NULL texts, duplicate ids, single-tag mega-group") {
    import org.apache.spark.sql.functions.col
    // a 10k-copy single-tag boilerplate group (zero cross-tag output — must
    // be killed inside the aggregate, NOT expanded m² and filtered), two
    // NULL-text rows (the join form's equality key drops NULLs), a
    // duplicate doc_id carrying two tags (strict id_a < id_b excludes the
    // self-pair), and one genuine cross-tag group for signal.
    val boiler = (1L to 10000L).map(i => (i, "the same boilerplate text", "t0"))
    val rows = boiler ++ Seq(
      (20001L, null.asInstanceOf[String], "t0"),
      (20002L, null.asInstanceOf[String], "t1"),
      (20003L, "shared cross tag body", "t0"),
      (20003L, "shared cross tag body", "t1"), // duplicate id, two tags
      (20004L, "shared cross tag body", "t1"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text", "lang")
    val got = Dedup.crossTagDupPairs(df, "doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val fp = df.select(col("doc_id"), col("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val want = fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
          col("a.lang") =!= col("b.lang"))
      .select(col("a.doc_id"), col("b.doc_id"), col("a.lang"), col("b.lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == want)
    // the cross-tag group survives; no id==id self-pair; no NULL-fp pair
    assert(got.forall { case (a, b, _, _) => a < b })
    assert(got.contains((20003L, 20004L, "t0", "t1")))
    assert(!got.exists { case (a, b, _, _) => a >= 20001L && a <= 20002L || b <= 20002L && b >= 20001L })
    // maxGroupSize skips groups above the cap (exhaustive shape otherwise)
    val capped = Dedup.crossTagDupPairs(df, "doc_id", "lang", "text",
      maxGroupSize = Some(2)).collect()
    assert(capped.isEmpty) // the surviving cross-tag group has 3 members
    assert(Dedup.crossTagDupPairs(df, "doc_id", "lang", "text",
      maxGroupSize = Some(3)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      want.map { case (a, b, _, _) => (a, b) })
  }

  test("containmentPairs == driver brute force on random corpora") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3, 4, 5)) {
      val corpus = randomCorpus(seed)
      val (n, minCont, minShared, maxDf) = (3, 0.5, 2L, 6L)
      val sets = corpus.map { case (id, t) => id -> shingleSet(t, n) }.toMap
      val docFreq = sets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val filtered = sets.view.mapValues(_.filter(docFreq(_) <= maxDf)).toMap
      val expect = (for {
        (a, sa) <- filtered.toSeq; (b, sb) <- filtered.toSeq if a < b
        shared = (sa & sb).size.toLong if shared >= minShared
        cont = shared.toDouble / math.min(sa.size, sb.size) if cont >= minCont
      } yield (a, b) -> (shared, cont)).toMap
      val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text"), "doc_id", "text",
          n = n, minContainment = minCont, minShared = minShared, maxDocFreq = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet == expect.keySet, s"seed $seed pair sets differ")
      expect.foreach { case (k, (sh, c)) =>
        assert(got(k)._1 == sh, s"seed $seed shared $k")
        assert(math.abs(got(k)._2 - c) < 1e-12, s"seed $seed containment $k")
      }
      graft.core.CacheScope.drain()
    }
  }

  test("repeatedSpans == driver brute force on random corpora") {
    import spark.implicits._
    // positional grams, short-doc whole-text rule included
    def grams(text: String, n: Int): Seq[String] = {
      val toks = text.split(" ", -1)
      if (toks.length <= n) Seq(text)
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    for (seed <- Seq(11, 12, 13, 14, 15)) {
      val corpus = randomCorpus(seed)
      val (n, minCount) = (3, 2L)
      val counts = corpus.flatMap { case (_, t) => grams(t, n) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect = corpus.flatMap { case (id, t) =>
        val hit = grams(t, n).zipWithIndex
          .collect { case (g, p) if counts(g) >= minCount => p }
        // merge adjacent positions into maximal runs
        val spans = hit.foldLeft(List.empty[(Int, Int, Long)]) {
          case ((s, e, c) :: rest, p) if p == e + 1 => (s, p, c + 1) :: rest
          case (acc, p) => (p, p, 1L) :: acc
        }.reverse
        spans.map { case (s, e, c) => (id, s.toLong, (e + n - 1).toLong, c) }
      }.toSet
      val got = Dedup.repeatedSpans(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = n, minCount = minCount)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expect, s"seed $seed spans differ")
      graft.core.CacheScope.drain()
    }
  }

  test("repeatedSpans: an exact doc-level dup yields one whole-doc span each") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, text), (2L, text), (3L, "unique words only here now"))
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(df, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 20 tokens, n=8 → windows 0..12, span end = 12 + 7 = 19 (whole doc)
    assert(got == Set((1L, 0L, 19L), (2L, 0L, 19L)))
  }

  test("cdcChunks == driver brute force on random corpora (incl. space edges)") {
    import spark.implicits._
    val P = 2147483647L
    // driver mirror of the boundary rule over Java-split tokens
    def hash31(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16) % P
    }
    def chunksOf(text: String, w: Int, div: Int): Seq[(Long, Long, Long)] = {
      val toks = text.split(" ") match { case a if a.isEmpty => Array("") case a => a }
      val hs = toks.map(hash31)
      val cuts = (w to toks.length).filter { i =>
        hs.slice(i - w, i).foldLeft(0L)((acc, h) => (acc * 257 + h) % P) % div == 0
      }
      val ends = if (cuts.nonEmpty && cuts.last == toks.length) cuts
                 else cuts :+ toks.length
      ends.zipWithIndex.map { case (e, k) =>
        val st = if (k == 0) 1 else ends(k - 1) + 1
        (st.toLong, e.toLong, hash31(toks.slice(st - 1, e).mkString(" ")))
      }
    }
    for (seed <- Seq(11, 12, 13)) {
      val corpus = randomCorpus(seed)
      val (w, div) = (3, 4)
      val expect = corpus.flatMap { case (id, t) =>
        chunksOf(t, w, div).zipWithIndex.map { case (c, k) => (id, k.toLong, c) }
      }.toSet
      val got = Dedup.cdcChunks(corpus.toDF("doc_id", "text"), "doc_id", "text",
          window = w, divisor = div)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
        .toSet
      assert(got == expect, s"seed $seed: ${got.diff(expect)} vs ${expect.diff(got)}")
    }
  }

  test("bandedHammingPairs: pigeonhole recall is exact on random 64-bit signatures") {
    import spark.implicits._
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new scala.util.Random(seed)
      // random base sigs + planted near-dups at controlled hamming distances
      val base = (1L to 40L).map(id => id -> rnd.nextLong())
      val planted = base.take(10).zipWithIndex.map { case ((id, sig), i) =>
        val flips = i % 4 // 0..3 bit flips, all within maxHamming = 3
        val mutated = (0 until flips).foldLeft(sig)((s, _) =>
          s ^ (1L << rnd.nextInt(64)))
        (id + 1000L) -> mutated
      }
      val all = base ++ planted
      val (maxH, bands) = (3, 8)
      val expect = (for {
        (a, sa) <- all; (b, sb) <- all if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (a, b, h)).toSet
      val got = Dedup.bandedHammingPairs(all.toDF("id", "sig"), "id", "sig",
          maxHamming = maxH, bands = bands, bits = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // recall must be EXACT (maxHamming < bands pigeonholes a clean band);
      // precision is exact too — every emitted pair re-checks full hamming
      assert(got == expect, s"seed $seed: got ${got.size}, expect ${expect.size}")
      graft.core.CacheScope.drain()
    }
  }

  test("noveltyRates == driver brute force on random corpora") {
    import spark.implicits._
    for (seed <- Seq(11, 12, 13, 14, 15)) {
      val corpus = randomCorpus(seed)
      val n = 3
      val sets = corpus.map { case (id, t) => id -> shingleSet(t, n) }.toMap
      val firstSeen = sets.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val expect = sets.map { case (id, s) =>
        val seen = s.count(sh => firstSeen(sh) < id)
        id -> ((s.size.toLong, seen.toLong,
          BigDecimal(1.0 - seen.toDouble / s.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      val got = Dedup.noveltyRates(corpus.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet == expect.keySet, s"seed $seed doc sets differ")
      expect.foreach { case (id, (ns, seen, nov)) =>
        assert(got(id)._1 == ns, s"seed $seed n_shingles doc $id")
        assert(got(id)._2 == seen, s"seed $seed n_seen doc $id")
        assert(math.abs(got(id)._3 - nov) < 2e-6, s"seed $seed novelty doc $id")
      }
      graft.core.CacheScope.drain()
    }
  }

  test("minhashCandidatesBucketed == minhashCandidates on the test corpus " +
      "(fused band key changes the layout, never the candidate set)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val base = canon(Dedup.minhashCandidates(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16))
    graft.core.CacheScope.drain()
    val bucketed = canon(Dedup.minhashCandidatesBucketed(docs, "doc_id",
      "text", shingleSize = 3, numHashes = 32, bands = 16,
      graft.operators.ScaleOps.bucketTableName("graft_test_mhsig", sfDir),
      graft.operators.ScaleOps.bucketTableName("graft_test_mhband", sfDir)))
    assert(bucketed == base)
    assert(base.nonEmpty, "vacuous corpus: no candidate pairs at all")
  }

  test("minhashCandidatesIndexed == minhashCandidatesIncremental on the " +
      "same (corpus, batch) split (the standing index changes the read " +
      "path, never the candidate set)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val old = docs.where(col("doc_id") % 4 =!= 0)
    val neu = docs.where(col("doc_id") % 4 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val unindexed = canon(Dedup.minhashCandidatesIncremental(old, neu,
      "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16))
    graft.core.CacheScope.drain()
    val indexed = canon(Dedup.minhashCandidatesIndexed(old, neu,
      "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = graft.operators.ScaleOps
        .bucketTableName("graft_test_incsig", sfDir),
      bandTable = graft.operators.ScaleOps
        .bucketTableName("graft_test_incband", sfDir)))
    graft.core.CacheScope.drain()
    assert(indexed == unindexed)
    assert(indexed.nonEmpty, "vacuous split: no cross/batch pairs at all")
    // and strictly no old-old pair sneaks in through the index
    assert(indexed.forall { case (a, b, _) => a % 4 == 0 || b % 4 == 0 })
  }

  test("index lifecycle: append keeps the probe exchange-free (sort-elision " +
      "suspended), compact restores it, output identical throughout") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigT = graft.operators.ScaleOps
      .bucketTableName("graft_test_lcsig", sfDir)
    val bandT = graft.operators.ScaleOps
      .bucketTableName("graft_test_lcband", sfDir)
    val batch = docs.where(col("doc_id") % 4 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def probe() = Dedup.minhashCandidatesIndexedTables(batch, "doc_id",
      "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT, bandTable = bandT)
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out) { df.explain() }
      out.toString
    }
    val want = canon(Dedup.minhashCandidatesIncremental(
      docs.where(col("doc_id") % 4 =!= 0), batch, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16))
    graft.core.CacheScope.drain()
    // gen 1 + appended gen 2 == the full corpus the unindexed form sees
    Dedup.buildDedupIndex(
      docs.where(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2),
      "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT, bandTable = bandT)
    Dedup.indexAppend(docs.where(col("doc_id") % 4 === 3), "doc_id",
      "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT, bandTable = bandT, batchTag = "gen2")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // post-append, pre-compact: buckets hold two files each, so the
      // scan's sort order is (correctly) dropped and merge joins re-sort —
      // but the layout's exchange-freedom must survive: the corpus side
      // still scans co-located (the q221 pin: <= 4 hash exchanges are
      // batch/pair-grain; corpus-side Sorts push the count past 4)
      val pAppended = planOf(probe())
      assert("Exchange hashpartitioning".r.findAllIn(pAppended).size <= 4,
        s"append must not cost the corpus its co-location:\n$pAppended")
      assert("\\bSort\\b".r.findAllIn(pAppended).size > 4,
        s"multi-file buckets should re-sort (sort-elision suspended) — " +
          s"if this starts failing, Spark kept ordering over 2-file " +
          s"buckets and the compaction rationale needs re-checking:\n" +
          pAppended)
      val gotAppended = canon(probe())
      graft.core.CacheScope.drain()
      assert(gotAppended == want,
        "two-generation index diverged from the recompute path")
      // compaction: one sorted file per bucket again — the q221 plan
      // shape (corpus never re-sorted) must come back, output unchanged
      Dedup.indexCompact(spark, sigT, tag = "t1")
      Dedup.indexCompact(spark, bandT, tag = "t1")
      val pCompacted = planOf(probe())
      assert("\\bSort\\b".r.findAllIn(pCompacted).size <= 4,
        s"compaction must restore sort-elision:\n$pCompacted")
      assert("Exchange hashpartitioning".r.findAllIn(pCompacted).size <= 4,
        s"compaction must preserve the bucket layout:\n$pCompacted")
      val gotCompacted = canon(probe())
      graft.core.CacheScope.drain()
      assert(gotCompacted == want, "compaction corrupted the index")
      // idempotence: replaying a tagged append or compaction is a no-op
      Dedup.indexAppend(docs.where(col("doc_id") % 4 === 3), "doc_id",
        "text", shingleSize = 3, numHashes = 32, bands = 16,
        sigTable = sigT, bandTable = bandT, batchTag = "gen2")
      Dedup.indexCompact(spark, sigT, tag = "t1")
      val gotReplayed = canon(probe())
      graft.core.CacheScope.drain()
      assert(gotReplayed == want,
        "a replayed append/compact changed the index (idempotence broken)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("leveled index lifecycle: probe reads main ∪ L0 between folds, the " +
      "fold restores the no-L0 one-file-per-bucket shape, output identical " +
      "throughout, and a replayed folded tag stays a no-op") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigT = graft.operators.ScaleOps
      .bucketTableName("graft_test_lvsig", sfDir)
    val bandT = graft.operators.ScaleOps
      .bucketTableName("graft_test_lvband", sfDir)
    val batch = docs.where(col("doc_id") % 4 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def probe() = Dedup.minhashCandidatesIndexedTables(batch, "doc_id",
      "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT, bandTable = bandT)
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out) { df.explain() }
      out.toString
    }
    val want = canon(Dedup.minhashCandidatesIncremental(
      docs.where(col("doc_id") % 4 =!= 0), batch, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16))
    graft.core.CacheScope.drain()
    // main level = %4==1; generations 2 and 3 land in L0 (foldEvery=3:
    // two pending generations, no fold yet)
    Dedup.buildDedupIndex(docs.where(col("doc_id") % 4 === 1),
      "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT, bandTable = bandT)
    Dedup.indexAppendLeveled(docs.where(col("doc_id") % 4 === 2), "doc_id",
      "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT, bandTable = bandT, batchTag = "g2", foldEvery = 3)
    Dedup.indexAppendLeveled(docs.where(col("doc_id") % 4 === 3), "doc_id",
      "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT, bandTable = bandT, batchTag = "g3", foldEvery = 3)
    assert(spark.catalog.tableExists(sigT + "_l0") &&
      spark.catalog.tableExists(bandT + "_l0"),
      "two pending generations under foldEvery=3 must sit in L0")
    val gotPending = canon(probe())
    graft.core.CacheScope.drain()
    assert(gotPending == want,
      "probe over main ∪ L0 diverged from the recompute path")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // explicit fold: L0 gone, main level back to one sorted file per
      // bucket — the no-L0 plan shape (corpus co-located, sort elision
      // live; the q221 pins) must come back, output unchanged
      Dedup.foldDedupIndexL0(spark, sigT, bandT)
      assert(!spark.catalog.tableExists(sigT + "_l0") &&
        !spark.catalog.tableExists(bandT + "_l0"), "fold must drop L0")
      val pFolded = planOf(probe())
      assert("Exchange hashpartitioning".r.findAllIn(pFolded).size <= 4,
        s"fold must preserve the corpus-side bucket layout:\n$pFolded")
      assert("\\bSort\\b".r.findAllIn(pFolded).size <= 4,
        s"fold must restore sort-elision (one file per bucket):\n$pFolded")
      val gotFolded = canon(probe())
      graft.core.CacheScope.drain()
      assert(gotFolded == want, "fold corrupted the index")
      // a replayed tag whose generation was already folded must stay a
      // no-op: neither recreate L0 nor double the rows
      Dedup.indexAppendLeveled(docs.where(col("doc_id") % 4 === 2),
        "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
        sigTable = sigT, bandTable = bandT, batchTag = "g2", foldEvery = 3)
      assert(!spark.catalog.tableExists(sigT + "_l0"),
        "a replayed folded tag must not recreate L0")
      val gotReplayed = canon(probe())
      graft.core.CacheScope.drain()
      assert(gotReplayed == want,
        "a replayed folded tag changed the index (idempotence broken)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // automatic cadence on a fresh table pair: foldEvery=1 folds the
    // append immediately (same two-generation corpus as the q225 gate)
    val sigT2 = graft.operators.ScaleOps
      .bucketTableName("graft_test_lvsig2", sfDir)
    val bandT2 = graft.operators.ScaleOps
      .bucketTableName("graft_test_lvband2", sfDir)
    Dedup.buildDedupIndex(
      docs.where(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2),
      "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT2, bandTable = bandT2)
    Dedup.indexAppendLeveled(docs.where(col("doc_id") % 4 === 3), "doc_id",
      "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT2, bandTable = bandT2, batchTag = "g2", foldEvery = 1)
    assert(!spark.catalog.tableExists(sigT2 + "_l0"),
      "foldEvery=1 must fold the append into the main level immediately")
    val gotAuto = canon(Dedup.minhashCandidatesIndexedTables(batch,
      "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
      sigTable = sigT2, bandTable = bandT2))
    graft.core.CacheScope.drain()
    assert(gotAuto == want,
      "auto-folded index diverged from the recompute path")
  }
}
