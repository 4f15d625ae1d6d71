package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, WordShingles}

/** Document deduplication for large-scale training-data pipelines.
  *
  * Four families, all expressed as distributed hash-partition-friendly plans
  * (no driver-side loops, no O(n²) cross joins — candidate generation always
  * goes through a bucket/blocking join that shuffles on a small key):
  *
  *  - exact:        group by content hash                  (1 shuffle)
  *  - MinHash+LSH:  shingle → per-row signature (narrow) → band-bucket join
  *  - SimHash:      per-row 64-bit signature (narrow) → bucket by signature
  *  - n-gram Jaccard: shingle-inverted-index self-join within blocks
  *
  * Hashes are [[Hashing.stableHash]]-based so the DuckDB oracle reproduces them.
  */
object Dedup {
  import Hashing.P

  /** Apply an optional join-strategy hint ("shuffle_hash", "merge", …) to one
    * side of a self-join; None leaves strategy choice to Catalyst/AQE. */
  private def hinted(df: DataFrame, hint: Option[String]): DataFrame =
    hint.fold(df)(df.hint(_))

  /** Anti-join `index` against a (small-by-construction) hot-key set.
    * `broadcastHot = true` pins the map-side-lookup plan; on a
    * boilerplate-heavy corpus where the hot set might exceed driver/broadcast
    * limits, pass false and AQE picks the strategy from the measured size. */
  private def cullHot(index: DataFrame, hot: DataFrame,
      broadcastHot: Boolean): DataFrame =
    index.join(if (broadcastHot) broadcast(hot) else hot, Seq("sh"), "left_anti")

  /** Count co-occurrences per candidate pair from a shingle-keyed self-join:
    * `(id_a, id_b, shared)` with `id_a < id_b`. The pair aggregate is the
    * dominant cost of the inverted-index pipelines (the join's output barely
    * collapses — most pairs share ~1 shingle, so partial aggregation can't
    * shrink the shuffle), and hashing/shuffling ONE packed long beats a
    * two-long composite key measurably. `packIds = true` (default) packs
    * `id_a << 32 | id_b` with a codegen'd range guard that raises instead of
    * silently corrupting — valid whenever ids fit [0, 2^31), i.e. any dense
    * doc numbering; pass false for 64-bit id spaces (content-hash ids) to
    * keep the composite-key aggregate. */
  private def sharedCounts(filtered: DataFrame, joinHint: Option[String],
      packIds: Boolean): DataFrame = {
    val joined = hinted(filtered.as("a"), joinHint)
      .join(hinted(filtered.as("b"), joinHint), "sh")
      .where(col("a.id") < col("b.id"))
    if (packIds) {
      def guarded(c: Column): Column =
        when(c.between(0L, Int.MaxValue.toLong), c)
          .otherwise(raise_error(lit(
            "packIds pair aggregation needs ids in [0, 2^31); " +
              "pass packIds = false for wider id spaces")))
      joined
        .select(shiftleft(guarded(col("a.id")), 32)
          .bitwiseOR(guarded(col("b.id"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("shared"))
        .select(shiftright(col("pk"), 32).as("id_a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"), col("shared"))
    } else {
      joined
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
    }
  }

  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (a doc shorter than n yields its full token string
    * as the single shingle). Backed by the codegen'd [[WordShingles]]
    * expression; [[shinglesDeclarative]] is the built-in-only twin it must
    * always agree with (property-tested). */
  def shingles(text: Column, n: Int): Column = WordShingles(text, n)

  /** The same shingling expressed purely with built-in higher-order functions
    * (interpreted → ~30× slower per shingle; kept as the semantic oracle). */
  def shinglesDeclarative(text: Column, n: Int): Column = {
    val t = tokens(text)
    transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(t, i, lit(n))))
  }

  /** Exact dedup: group identical content by md5, keep the smallest id as the
    * canonical copy. One hash-shuffle; at 100 TB the md5 is computed map-side
    * next to the scan and only (hash, id) pairs move. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature over an already-hashed shingle array:
    * sig_i = min over shingles of (a_i * h + b_i) mod P. Keep the md5-based
    * shingle hashing in a separate materialized column ([[withMinhash]]) —
    * inlining it here would recompute every md5 numHashes times. */
  def minhashOfHashes(shingleHashes: Column, numHashes: Int): Column =
    array(Hashing.minhashCoeffs(numHashes).map { case (a, b) =>
      array_min(transform(shingleHashes, h => (lit(a) * h + lit(b)) % lit(P)))
    }: _*)

  /** Adds a MinHash signature column — entirely within the row via higher-order
    * functions: NO explode, NO shuffle. The shingle-hash array is materialized
    * once per row (`_hs`) so each of the numHashes permutations reuses it. */
  def withMinhash(df: DataFrame, textCol: String, out: String,
      shingleSize: Int, numHashes: Int): DataFrame =
    df.withColumn("_hs",
        transform(shingles(col(textCol), shingleSize), s => Hashing.stableHash31(s)))
      .withColumn(out, minhashOfHashes(col("_hs"), numHashes))
      .drop("_hs")

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand` and
    * hash each band; docs sharing any band hash are near-dup candidates.
    * Output: one row per (doc, band) — the thing you groupBy/join on. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = df.select(
      col(idCol),
      col(sigCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(concat_ws(",", slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    banded
  }

  /** MinHash signatures: one fused codegen'd loop per row
    * ([[graft.functions.MinhashSig]]) — shingle, md5, and all numHashes
    * permutation-mins inside a single JIT-compiled call. A NARROW map with
    * zero shuffle: the signature step costs exactly one corpus scan at any
    * size. Values identical to [[withMinhash]] and [[minhashSigsAgg]]
    * (property-tested). */
  def minhashSigs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.MinhashSig(col(textCol), shingleSize, numHashes).as("sig"))

  /** The same signatures via explode → codegen'd hash → numHashes-way min
    * aggregate — the built-in-operator twin [[minhashSigs]] must always agree
    * with (property-tested). Costs an exchange + two HashAggregate levels;
    * kept as the semantic oracle and as the fallback shape for engines
    * without expression extension points. */
  def minhashSigsAgg(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame = {
    val aggs = Hashing.minhashCoeffs(numHashes).zipWithIndex.map {
      case ((a, b), i) => min((lit(a) * col("h") + lit(b)) % lit(P)).as(s"_s$i")
    }
    df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleSize)).as("sh"))
      .select(col("id"), Hashing.stableHash31(col("sh")).as("h"))
      .groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"_s$i")): _*).as("sig"))
  }

  /** Candidate near-dup pairs via LSH: self-join on (band_idx, band_hash) —
    * the shuffle key is the band hash, so comparisons happen only within
    * buckets (the whole point of LSH at scale). Estimated Jaccard = fraction
    * of matching signature positions. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8, maxBucketSize: Option[Int] = None,
      joinHint: Option[String] = Some("shuffle_hash")): DataFrame = {
    val rowsPerBand = numHashes / bands
    // persist: signatures feed the banding AND the two signature joins at the
    // end. Registered with CacheScope so the session owner releases the
    // blocks after the query's action — an operator-internal bare persist
    // would pin them for the session lifetime. At warehouse scale, write
    // sigs to parquet once instead (same effect, spillable to object
    // storage).
    val sigs = graft.core.CacheScope.persist(
      minhashSigs(df, idCol, textCol, shingleSize, numHashes))
    // candidate pairs carry ONLY (id_a, id_b) through the band self-join:
    // a pair colliding in k bands appears k times pre-distinct, and dup-heavy
    // corpora make that join output enormous — 16-byte rows keep it cheap.
    // The signature arrays join back AFTER the distinct, so the per-pair
    // similarity fold runs exactly once per unique pair.
    val banded = lshBands(sigs, "id", "sig", bands, rowsPerBand)
      .select("band_idx", "band_hash", "id")
    // maxBucketSize: a bucket of m docs emits C(m,2) pairs — one giant
    // exact-dup cluster can dominate the whole job quadratically. The
    // standard cap skips mega-buckets (run exactGroups first: identical docs
    // are ITS job, and their bucket is degenerate by construction). None
    // keeps exhaustive semantics (the oracle's shape).
    val b = maxBucketSize match {
      case None => banded
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_hash")
        banded.withColumn("_bs", count(lit(1)).over(w))
          .where(col("_bs") <= cap).drop("_bs")
    }
    // shuffle_hash (default): pins the bucket-join shape (hash-partition on
    // the band key) — AQE would broadcast the whole banded table at test
    // scale, which is slower even there and unbuildable at corpus scale.
    // maxBucketSize is what bounds a bucket partition's hash build; if a
    // corpus must run uncapped with mega-buckets, pass joinHint = None
    // (AQE + skew-join) or Some("merge") (sort-merge spills instead of OOM).
    val pairs = hinted(b.as("l"), joinHint)
      .join(hinted(b.as("r"), joinHint), Seq("band_idx", "band_hash"))
      .where(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(numHashes)).as("est_jaccard"))
  }

  /** [[minhashCandidates]] over BUCKETED signature + band layouts — the
    * q212/q214/q216 warehousing pattern applied to the LAST repeated
    * corpus shuffle in the dedup family (round-15 verdict item 5): every
    * minhash sweep re-shingles the corpus (narrow, cheap) and then
    * RE-SHUFFLES it twice — once on the band key for the bucket
    * self-join, once on id for the signature join-back. Here both
    * exchanges are paid ONCE at write time: the signature table lands
    * bucketed on id, the band table bucketed (and sorted) on a single
    * fused band key, so repeated sweeps over a warehoused corpus read
    * co-located buckets with no exchange below the self-join and no
    * exchange on the signature side of the join-backs (only the
    * pair-grain distinct — output-bounded, never corpus-bounded —
    * shuffles per query).
    *
    * The band key is ONE fused column, md5(band_idx | band_hash), rather
    * than the pair (band_idx, band_hash) the unbucketed form joins on:
    * Spark requires co-partitioning on ALL join keys, so a two-key join
    * over a one-column bucket layout would re-exchange both sides and
    * the layout would buy nothing. Equality of the fused key is
    * equality of both parts, so the candidate set — and therefore the
    * output — is identical to [[minhashCandidates]] (same oracle). */
  def minhashCandidatesBucketed(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int, bands: Int,
      sigTable: String, bandTable: String, buckets: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = graft.operators.ScaleOps.ensureBucketed(
      minhashSigs(df, idCol, textCol, shingleSize, numHashes),
      sigTable, buckets, Seq("id"))
    val banded = graft.operators.ScaleOps.ensureBucketed(
      lshBands(sigs, "id", "sig", bands, rowsPerBand)
        .select(fusedBandKey.as("bkey"), col("id")),
      bandTable, buckets, Seq("bkey"))
    // bucketed + sorted on bkey: the self-join sort-merges over co-located
    // scans — zero exchange, zero sort (asserted in PlanAuditSpec). The
    // merge hint pins that shape: left alone, AQE broadcasts the whole
    // band table at test scale — unbuildable at corpus scale, and paying
    // a broadcast to dodge an exchange the layout already paid for.
    val pairs = banded.as("l").hint("merge")
      .join(banded.as("r").hint("merge"), Seq("bkey"))
      .where(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    // join-backs likewise merge-hinted: the sigs side reads bucketed and
    // pre-sorted on id (no exchange, no sort); only the pair-grain side
    // exchanges — broadcasting corpus-sized signatures is the wrong
    // default at scale
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .hint("merge"), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
        .hint("merge"), "id_b")
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(numHashes)).as("est_jaccard"))
  }

  /** The one fused band-join key over a (band_idx, band_hash) frame,
    * shared by every bucketed band layout: built with NULL-PROPAGATING
    * concat, not concat_ws — concat_ws silently drops NULL parts, so a
    * NULL band_hash would fuse to md5(band_idx) and rows would join where
    * the two-column equi-join (NULL != NULL) would not. concat makes the
    * key itself NULL in that case and NULL keys never match — the fused
    * join's semantics equal the two-column join's by construction, not by
    * an unstated band_hash-is-never-null invariant. (Today band_hash is
    * always a non-null md5, so values are unchanged.) */
  private def fusedBandKey: Column =
    md5(concat(col("band_idx").cast("string"), lit("|"), col("band_hash")))

  /** Incremental LSH dedup — candidate near-dup pairs for a NEW batch of
    * documents against an existing corpus and within the batch itself,
    * WITHOUT re-pairing the existing corpus (old × old pairs were found
    * when the old snapshot was curated). This is how dedup actually runs in
    * production: each ingest batch joins against the standing index, it
    * never re-processes the corpus.
    *
    * Ids must be disjoint across the two inputs. Returns
    * (id_a, id_b, est_jaccard) with id_a < id_b — exactly the
    * [[minhashCandidates]] rows of (old ∪ new) that touch at least one new
    * doc, by construction rather than by filtering.
    *
    * Scale shape: the batch's band table is small (|new| × bands rows); the
    * corpus side ships only (band key, id) rows into the bucket join, and
    * at warehouse scale sigs/bands of the corpus are a PRE-BUILT parquet
    * index appended per batch — so per-ingest work scales with
    * |new| × collision rate, never |corpus|². This form still re-shingles
    * and re-signs the corpus per call (fine for one-shot use);
    * [[minhashCandidatesIndexed]] is the composed warehouse form that
    * reads the standing bucketed sig/band index instead. */
  def minhashCandidatesIncremental(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      joinHint: Option[String] = Some("shuffle_hash")): DataFrame = {
    val rowsPerBand = numHashes / bands
    // persist both signature tables: each feeds its band table AND the
    // est-jaccard join-back (CacheScope-registered; owner drains after use)
    val sigsOld = graft.core.CacheScope.persist(
      minhashSigs(oldDf, idCol, textCol, shingleSize, numHashes))
    val sigsNew = graft.core.CacheScope.persist(
      minhashSigs(newDf, idCol, textCol, shingleSize, numHashes))
    def bandsOf(s: DataFrame) =
      lshBands(s, "id", "sig", bands, rowsPerBand)
        .select("band_idx", "band_hash", "id")
    val bAll = bandsOf(sigsOld).withColumn("is_new", lit(false))
      .unionByName(bandsOf(sigsNew).withColumn("is_new", lit(true)))
    // new side is ALWAYS the left: new-old pairs emit regardless of id
    // order, new-new pairs emit once (l < r); old-old pairs cannot occur
    val pairs = hinted(bandsOf(sigsNew).as("l"), joinHint)
      .join(hinted(bAll.as("r"), joinHint), Seq("band_idx", "band_hash"))
      .where((!col("r.is_new") && col("l.id") =!= col("r.id")) ||
        (col("r.is_new") && col("l.id") < col("r.id")))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
      .distinct()
    val sigsAll = sigsOld.unionByName(sigsNew)
    pairs
      .join(sigsAll.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigsAll.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(numHashes)).as("est_jaccard"))
  }

  /** [[minhashCandidatesIncremental]] against a PRE-BUILT corpus index —
    * the composed warehouse form that function's docstring names: the
    * unindexed incremental path re-shingles and re-signs the CORPUS on
    * every ingest batch, the one remaining per-batch corpus-sized cost in
    * the production ingest loop. Here the corpus signatures and band keys
    * are standing bucketed layouts (the q219 pattern,
    * [[graft.operators.ScaleOps.ensureBucketed]]): signatures
    * bucketed+sorted on id, band keys bucketed+sorted on the single fused
    * [[fusedBandKey]] — both built ONCE per corpus at write time. Per
    * ingest batch, only the BATCH is shingled and signed; its band rows
    * shuffle batch-grain into the corpus buckets (merge join: the corpus
    * side scans co-located and pre-sorted — zero corpus-side exchange,
    * zero corpus-side sort, pinned in PlanAuditSpec), and the est-jaccard
    * join-backs read the bucketed signature table the same way (corpus
    * sigs never move; only pair-grain rows exchange). Per-ingest work
    * scales with |batch| × collision rate; the corpus index is READ,
    * never recomputed and never re-shuffled. Output identical to
    * [[minhashCandidatesIncremental]] over the same (corpus, batch) split
    * — same oracle, property-tested equality.
    *
    * Ids must be disjoint across corpus and batch (the caller's identity
    * contract, as in the unindexed form). After admission, a production
    * job appends the admitted batch's sigs/bands to the standing index —
    * a compaction-style per-bucket rewrite keeps the one-file-per-bucket
    * sort guarantee (see [[graft.sources.Compaction]]); this function is
    * the per-batch READ path that makes that index pay. */
  def minhashCandidatesIndexed(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      sigTable: String, bandTable: String, buckets: Int = 32): DataFrame = {
    // the standing corpus index: built once per (session, corpus), then
    // read back bucketed — repeated ingest batches in one session (and
    // every batch of a warehoused corpus) skip straight to the scans
    buildDedupIndex(oldDf, idCol, textCol, shingleSize, numHashes, bands,
      sigTable, bandTable, buckets)
    minhashCandidatesIndexedTables(newDf, idCol, textCol, shingleSize,
      numHashes, bands, sigTable, bandTable)
  }

  /** Build (once per session+tables) the standing dedup index for a
    * corpus: signatures bucketed+sorted on id, band keys bucketed+sorted
    * on the fused [[fusedBandKey]]. The write pays the corpus shuffle
    * exactly once; [[minhashCandidatesIndexedTables]] is the per-batch
    * read path, [[indexAppend]]/[[indexCompact]] the maintenance path. */
  def buildDedupIndex(corpus: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int, bands: Int,
      sigTable: String, bandTable: String, buckets: Int = 32): Unit = {
    val rowsPerBand = numHashes / bands
    val sigs = graft.operators.ScaleOps.ensureBucketed(
      minhashSigs(corpus, idCol, textCol, shingleSize, numHashes),
      sigTable, buckets, Seq("id"))
    graft.operators.ScaleOps.ensureBucketed(
      lshBands(sigs, "id", "sig", bands, rowsPerBand)
        .select(fusedBandKey.as("bkey"), col("id")),
      bandTable, buckets, Seq("bkey"))
    ()
  }

  /** The per-ingest-batch probe of [[minhashCandidatesIndexed]], reading
    * the standing index TABLES directly (whatever built or appended them —
    * [[buildDedupIndex]], [[indexAppend]], or a prior
    * [[minhashCandidatesIndexed]] call). Same output contract and scale
    * shape as [[minhashCandidatesIndexed]]. */
  def minhashCandidatesIndexedTables(newDf: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int, bands: Int,
      sigTable: String, bandTable: String): DataFrame = {
    val rowsPerBand = numHashes / bands
    val spark = newDf.sparkSession
    val sigsOld = spark.table(sigTable)
    val bandsOld = spark.table(bandTable)
    // leveled appends ([[indexAppendLeveled]]) park recent generations in
    // unbucketed L0 side tables until the next fold; a probe between folds
    // must see corpus = main ∪ L0. Auto-detected so the no-L0 plan (every
    // caller that maintains the index with indexAppend/indexCompact, e.g.
    // q221/q225) is byte-identical to the pre-L0 shape; when L0 is live its
    // rows join as SEPARATE small branches — the main level's exchange-free
    // bucketed scans are never unioned into (a union would re-exchange the
    // corpus side and forfeit the layout).
    val hasL0 = spark.catalog.tableExists(l0Of(sigTable))
    val sigsL0 = if (hasL0) Some(spark.table(l0Of(sigTable))) else None
    val bandsL0 = if (hasL0) Some(spark.table(l0Of(bandTable))) else None
    // the batch side: |new| signatures, persisted because they feed the
    // band probe AND the est-jaccard join-backs
    val sigsNew = graft.core.CacheScope.persist(
      minhashSigs(newDf, idCol, textCol, shingleSize, numHashes))
    val bandsNew = lshBands(sigsNew, "id", "sig", bands, rowsPerBand)
      .select(fusedBandKey.as("bkey"), col("id"))
    // new × old: the batch probes the corpus buckets; merge-hinted so the
    // corpus side keeps its exchange-free bucketed-scan shape (AQE would
    // broadcast the CORPUS band table at test scale — unbuildable at
    // warehouse scale). Ids are disjoint by contract, so every bucket
    // match is a real cross pair; canonicalize to id_a < id_b.
    val newOld = bandsNew.as("l")
      .join(bandsOld.as("r").hint("merge"), Seq("bkey"))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
    // new × L0: both sides batch-grain (≤ foldEvery pending batches), any
    // strategy — this branch exists only between folds
    val newL0 = bandsL0.map { b0 =>
      bandsNew.as("l")
        .join(b0.as("r"), Seq("bkey"))
        .select(least(col("l.id"), col("r.id")).as("id_a"),
          greatest(col("l.id"), col("r.id")).as("id_b"))
    }
    // new × new: batch-grain self-join — tiny both sides, any strategy
    val newNew = bandsNew.as("l")
      .join(bandsNew.as("r"), Seq("bkey"))
      .where(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    val pairs = newL0.foldLeft(newOld.unionByName(newNew))(_ unionByName _)
      .distinct()
    // est-jaccard join-backs: each pair endpoint's signature comes from
    // the bucketed corpus table (merge-hinted: sigs side pre-sorted and
    // co-located, only the pair-grain side exchanges), the L0 side table
    // (small, plain join) when live, OR the batch sigs (left joins +
    // coalesce — a union of the sig frames would re-exchange the corpus
    // side and forfeit the layout). Ids are disjoint across all three by
    // the maintenance contract, so coalesce order cannot matter.
    def l0SigJoin(df: DataFrame, idAlias: String, out: String): DataFrame =
      sigsL0 match {
        case None => df // no-L0 plan stays byte-identical to the pre-L0 shape
        case Some(s0) => df.join(
          s0.select(col("id").as(idAlias), col("sig").as(out)),
          Seq(idAlias), "left")
      }
    def sigCoalesce(oldC: String, l0C: String, newC: String): Column =
      if (hasL0) coalesce(col(oldC), col(l0C), col(newC))
      else coalesce(col(oldC), col(newC))
    val withA = l0SigJoin(pairs
      .join(sigsOld.select(col("id").as("id_a"), col("sig").as("_sa_old"))
        .hint("merge"), Seq("id_a"), "left")
      .join(sigsNew.select(col("id").as("id_a"), col("sig").as("_sa_new")),
        Seq("id_a"), "left"), "id_a", "_sa_l0")
      .withColumn("sig_a", sigCoalesce("_sa_old", "_sa_l0", "_sa_new"))
    l0SigJoin(withA
      .join(sigsOld.select(col("id").as("id_b"), col("sig").as("_sb_old"))
        .hint("merge"), Seq("id_b"), "left")
      .join(sigsNew.select(col("id").as("id_b"), col("sig").as("_sb_new")),
        Seq("id_b"), "left"), "id_b", "_sb_l0")
      .withColumn("sig_b", sigCoalesce("_sb_old", "_sb_l0", "_sb_new"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(numHashes)).as("est_jaccard"))
  }

  /** One-shot guard registry for index maintenance ops: an append or a
    * compaction tagged (table, tag) runs once per JVM session — the same
    * idempotence contract as [[graft.operators.ScaleOps.ensureBucketed]]'s
    * write-once, extended to MUTATIONS so a repeated caller (bench warmup
    * + timed passes, verify re-runs, sweep specs) cannot double-append a
    * generation or re-pay a compaction. Session-scoped is the right
    * scope: the metastore is in-memory and the warehouse a per-JVM temp
    * dir, so the tables themselves are session-scoped too. */
  private val appliedIndexOps =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Append one ingest batch's signatures and band keys to the STANDING
    * dedup index — the maintenance half of the production loop whose read
    * half is [[minhashCandidatesIndexedTables]]: admit a batch against
    * the index, then append the admitted docs so the NEXT batch dedups
    * against them too, never recomputing the corpus. The append honors
    * the tables' bucket spec (`bucketBy`+`sortBy` must match or Spark
    * fails the write loudly) and lands exactly ONE new file per bucket
    * (the same repartition-on-bucket-key trick as
    * [[graft.operators.ScaleOps.writeBucketed]]), so joins against the
    * index stay exchange-free immediately. What appends DO cost is the
    * sort-elision: with more than one file per bucket Spark drops the
    * scan's sortBy ordering at plan time (correctly — concatenated sorted
    * files are not sorted) and merge joins re-sort per partition until
    * [[indexCompact]] restores the one-file-per-bucket invariant. That is
    * the LSM trade, chosen deliberately: appends are O(batch), reads stay
    * co-located, and the periodic compaction is O(corpus) WRITE (no
    * shingling, no signing — orders cheaper than recompute).
    *
    * Idempotent per (session, table, batchTag): a replayed call with the
    * same tag is a no-op, so foreachBatch replays after a crash cannot
    * double a generation. */
  def indexAppend(batch: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int, bands: Int,
      sigTable: String, bandTable: String, batchTag: String,
      buckets: Int = 32): Unit = appliedIndexOps.synchronized {
    // the guard key is recorded only AFTER both writes succeed: a crash
    // between the sig and band appends must leave the op re-runnable
    // (torn-index repair is the caller's job — see the replay-repair
    // branch in corpusIngestSinkIndexed — but the registry must never
    // claim an append that didn't finish). Serialized on the registry:
    // maintenance ops are rare and short relative to what they guard.
    val key = s"append|$sigTable|$bandTable|$batchTag"
    if (appliedIndexOps.contains(key)) return
    val rowsPerBand = numHashes / bands
    val sigs = graft.core.CacheScope.persist(
      minhashSigs(batch, idCol, textCol, shingleSize, numHashes))
    sigs.repartition(buckets, col("id"))
      .write.mode("append")
      .bucketBy(buckets, "id").sortBy("id")
      .format("parquet").saveAsTable(sigTable)
    lshBands(sigs, "id", "sig", bands, rowsPerBand)
      .select(fusedBandKey.as("bkey"), col("id"))
      .repartition(buckets, col("bkey"))
      .write.mode("append")
      .bucketBy(buckets, "bkey").sortBy("bkey")
      .format("parquet").saveAsTable(bandTable)
    appliedIndexOps.add(key)
    ()
  }

  /** L0 side-table name for a standing index table (leveled appends). */
  private def l0Of(table: String): String = table + "_l0"

  /** LEVELED (L0→L1) append — the round-17 verdict's refinement of
    * [[indexAppend]], whose one-file-per-bucket append dirties EVERY
    * bucket on every batch (`buckets` new files per table per batch) and
    * therefore couples compaction cadence to batch cadence: at small
    * frequent batches the only way to keep file counts bounded is an
    * O(corpus) [[indexCompact]] per few batches — prohibitive at 100 TB.
    * The LSM shape instead: each batch lands in PLAIN unbucketed L0 side
    * tables (`<table>_l0`, one append of batch-partition-many files — no
    * bucket fan-out, no bucket-spec shuffle), and every `foldEvery`-th
    * pending generation is FOLDED into the main bucketed level (read main
    * raw + L0, one [[graft.operators.ScaleOps.writeBucketed]] rewrite,
    * rename, drop L0 — the same publish mechanics as [[indexCompact]], so
    * readers never see a half-folded index). Probe-side,
    * [[minhashCandidatesIndexedTables]] auto-detects a live L0 and unions
    * its (small, batch-grain) rows into the candidate and signature
    * lookups WITHOUT touching the main level's exchange-free bucketed
    * scans — the trade is a bounded extra join against ≤ foldEvery
    * batches of rows, and the payoff is a compaction cadence chosen by
    * `foldEvery`, decoupled from how often batches arrive.
    *
    * Same idempotence contract as [[indexAppend]]: once per (session,
    * tables, batchTag), key recorded only after both L0 writes land, so a
    * crash mid-append leaves the op re-runnable and the caller's
    * torn-index repair ([[dropDedupIndex]], which drops L0 too) covers
    * the replayed-batch window. The fold count is tracked by the same
    * session-scoped registry (consistent: tables live in the in-memory
    * metastore, so registry and tables die together). */
  def indexAppendLeveled(batch: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int, bands: Int,
      sigTable: String, bandTable: String, batchTag: String,
      foldEvery: Int = 8): Unit = appliedIndexOps.synchronized {
    require(foldEvery >= 1, "foldEvery must be >= 1")
    val key = s"appendL0|$sigTable|$bandTable|$batchTag"
    if (appliedIndexOps.contains(key)) return
    val rowsPerBand = numHashes / bands
    val sigs = graft.core.CacheScope.persist(
      minhashSigs(batch, idCol, textCol, shingleSize, numHashes))
    sigs.write.mode("append").format("parquet").saveAsTable(l0Of(sigTable))
    lshBands(sigs, "id", "sig", bands, rowsPerBand)
      .select(fusedBandKey.as("bkey"), col("id"))
      .write.mode("append").format("parquet").saveAsTable(l0Of(bandTable))
    appliedIndexOps.add(key)
    // fold cadence: count this session's pending L0 generations from the
    // registry (zero IO; registry and L0 tables are both session-scoped).
    // Pending markers are a SEPARATE namespace from the idempotence keys:
    // folds clear pending markers (folded generations no longer count
    // toward the next fold) but must never clear the append keys — a
    // replayed batchTag after a fold would otherwise re-append rows the
    // fold already moved into the main level.
    appliedIndexOps.add(s"pendingL0|$sigTable|$bandTable|$batchTag")
    val prefix = s"pendingL0|$sigTable|$bandTable|"
    var pending = 0
    val it = appliedIndexOps.iterator()
    while (it.hasNext) if (it.next().startsWith(prefix)) pending += 1
    if (pending >= foldEvery) foldDedupIndexL0(batch.sparkSession,
      sigTable, bandTable)
    ()
  }

  /** Fold the L0 side tables into the main bucketed level: read the main
    * level's raw parquet (NOT the bucketed scan — see [[indexCompact]]'s
    * exchange-elision trap) plus L0, rewrite as one sorted file per bucket
    * via write-to-sibling + catalog rename, drop L0. O(main + L0) parquet
    * IO, zero recompute (no shingling, no signing); after the fold the
    * probe's no-L0 fast path and full sort-elision are restored. Safe to
    * call with no pending L0 (no-op). */
  def foldDedupIndexL0(spark: org.apache.spark.sql.SparkSession,
      sigTable: String, bandTable: String): Unit = {
    Seq(sigTable, bandTable).foreach { t =>
      val l0 = l0Of(t)
      if (spark.catalog.tableExists(l0)) {
        val cat = spark.sessionState.catalog
        val meta = cat.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t))
        val spec = meta.bucketSpec.getOrElse(
          sys.error(s"foldDedupIndexL0('$t'): not a bucketed table"))
        val l0Meta = cat.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(l0))
        val merged = spark.read.parquet(meta.location.toString)
          .unionByName(spark.read.parquet(l0Meta.location.toString))
        val tmp = t + "_folding"
        graft.operators.ScaleOps.writeBucketed(
          merged, tmp, spec.numBuckets, spec.bucketColumnNames)
        spark.sql(s"DROP TABLE $t")
        spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
        spark.sql(s"DROP TABLE $l0")
      }
    }
    // folded generations are no longer pending: clear their PENDING markers
    // so the next fold counts only new generations. The appendL0 idempotence
    // keys stay — a replayed batchTag must remain a no-op after its rows
    // were folded into the main level.
    val prefix1 = s"pendingL0|$sigTable|$bandTable|"
    val it = appliedIndexOps.iterator()
    val toDrop = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val k = it.next(); if (k.startsWith(prefix1)) toDrop += k
    }
    toDrop.foreach(appliedIndexOps.remove)
  }

  /** Drop both halves of a standing dedup index (and forget their
    * maintenance guards) so the next [[buildDedupIndex]] rebuilds from
    * scratch — the torn-index repair path: after a crash that may have
    * landed between a corpus swap and the matching [[indexAppend]] (or
    * mid-append), the CORPUS TABLE is the source of truth and an
    * O(corpus) rebuild on the rare replay is the honest recovery.
    * Leveled L0 side tables are part of the index and drop with it. */
  def dropDedupIndex(spark: org.apache.spark.sql.SparkSession,
      sigTable: String, bandTable: String): Unit =
    appliedIndexOps.synchronized {
      Seq(sigTable, bandTable, l0Of(sigTable), l0Of(bandTable)).foreach { t =>
        if (spark.catalog.tableExists(t)) spark.sql(s"DROP TABLE $t")
      }
      val dead = appliedIndexOps.iterator()
      val toDrop = scala.collection.mutable.ArrayBuffer.empty[String]
      while (dead.hasNext) {
        val k = dead.next()
        if (k.contains(s"|$sigTable|") || k.contains(s"|$bandTable|") ||
            k.endsWith(s"|$sigTable") || k.endsWith(s"|$bandTable"))
          toDrop += k
      }
      toDrop.foreach(appliedIndexOps.remove)
    }

  /** Per-bucket compaction of a standing bucketed table: rewrite into
    * exactly one sorted file per bucket (the
    * [[graft.operators.ScaleOps.writeBucketed]] layout), restoring the
    * sort-free merge-scan shape that [[indexAppend]]'s extra per-bucket
    * files suspend. Write-to-sibling + catalog rename, so a reader never
    * observes a half-compacted table; O(corpus) parquet IO, zero
    * recompute. Idempotent per (session, table, tag). */
  def indexCompact(spark: org.apache.spark.sql.SparkSession, table: String,
      tag: String): Unit = appliedIndexOps.synchronized {
    // key recorded after the rename lands, same rationale as indexAppend
    val key = s"compact|$table|$tag"
    if (appliedIndexOps.contains(key)) return
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      sys.error(s"indexCompact('$table'): not a bucketed table"))
    val tmp = table + "_compacting"
    // Read the RAW parquet files, not the catalog table: a bucketed scan
    // reports a hash partitioning that already satisfies the write-side
    // repartition, so Spark elides the exchange and each multi-file
    // bucket passes through as multiple write tasks — the "compacted"
    // table would keep 2+ files per bucket and never regain sort
    // propagation. The plain file scan has no partitioning to satisfy
    // anything, so writeBucketed's repartition actually runs and lands
    // exactly one sorted file per bucket.
    graft.operators.ScaleOps.writeBucketed(
      spark.read.parquet(meta.location.toString), tmp,
      spec.numBuckets, spec.bucketColumnNames)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    appliedIndexOps.add(key)
    ()
  }

  /** Corpus version diff: per-doc status between two snapshots of a
    * document table — the audit step of dataset versioning (pairs with
    * [[graft.sources.VersionedTable]]'s snapshot writes: "what changed
    * between v3 and v4, and how much re-tokenization does it trigger").
    * Returns (id, status ∈ added | removed | changed | unchanged).
    *
    * Scale shape: content hashed map-side next to each scan (only
    * (id, md5) pairs move), one id-keyed full outer join — co-partitioned
    * if both snapshots are bucketed by id, a plain hash shuffle otherwise. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"), md5(col(textCol)).as("_h_old"))
    val n = newDf.select(col(idCol).as("id"), md5(col(textCol)).as("_h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_h_old").isNull, "added")
          .when(col("_h_new").isNull, "removed")
          .when(col("_h_old") =!= col("_h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** SimHash bit width (stableHash provides 60 usable bits; 32 keeps the plan
    * compact while preserving near-dup recall on word unigrams). */
  val SimhashBits = 32

  /** SimHash over word unigrams: bit b of the signature is the sign of
    * Σ_tokens (2*bit_b(h(token)) - 1). Per-row higher-order fold — narrow, no
    * shuffle, token hashes materialized once in `_th`. Interpreted eval; for
    * corpora where that dominates use [[simhashSigs]]. */
  def withSimhash(df: DataFrame, textCol: String, out: String): DataFrame = {
    val hashed = df.withColumn("_th",
      transform(tokens(col(textCol)), t => Hashing.stableHash(t)))
    val sig = (0 until SimhashBits).map { b =>
      val bitSum = aggregate(col("_th"), lit(0L),
        (s, h) => s + shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1)
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.withColumn(out, sig).drop("_th")
  }

  /** SimHash signatures: one fused codegen'd loop per row
    * ([[graft.functions.SimhashSig]]) — tokenize, md5, per-bit ±1 counts,
    * sign-pack, all in a single JIT-compiled call. Zero shuffle. Values
    * identical to [[withSimhash]] and [[simhashSigsAgg]] (property-tested).
    * Returns (idCol, out). */
  def simhashSigs(df: DataFrame, idCol: String, textCol: String,
      out: String = "simhash"): DataFrame =
    df.select(col(idCol),
      graft.functions.SimhashSig(col(textCol), SimhashBits).as(out))

  /** The same signatures via explode → codegen'd md5 → 32 bit-sum
    * aggregates — the built-in-operator twin [[simhashSigs]] must always
    * agree with (property-tested). The shuffle carries ONLY (id, 32 longs)
    * per doc with map-side partial aggregation; kept as the semantic oracle
    * / no-extension-point fallback. Returns (idCol, out). */
  def simhashSigsAgg(df: DataFrame, idCol: String, textCol: String,
      out: String = "simhash"): DataFrame = {
    val bitAggs = (0 until SimhashBits).map { b =>
      sum(shiftright(col("_h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"_b$b")
    }
    val packed = (0 until SimhashBits).map { b =>
      when(col(s"_b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .select(col(idCol), Hashing.stableHash(col("_t")).as("_h"))
      .groupBy(col(idCol))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col(idCol), packed.as(out))
  }

  /** Hamming distance between two simhash signatures (near-dup if small). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** True n-gram Jaccard similarity for candidate pairs that share at least one
    * shingle, via an inverted index (explode → self-join on shingle → count).
    * `minShared` prunes the long tail before the join output explodes.
    * At scale: the shuffle key is the shingle hash; hot shingles (stopword
    * n-grams) are the skew risk — mitigated by dropping shingles that appear in
    * more than `maxDocFreq` docs (standard df-cut, also improves precision). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5, maxDocFreq: Long = 100,
      broadcastHot: Boolean = true,
      joinHint: Option[String] = Some("shuffle_hash"),
      packIds: Boolean = true): DataFrame = {
    // persist the exploded inverted index ONCE: the hot-shingle aggregate,
    // the per-doc size aggregate, and both self-join sides all read it, and
    // each would otherwise re-run the full scan+shingle explode.
    // CacheScope-registered: the session owner drains after the action.
    // (At 100 TB the cached explode is large — MEMORY_AND_DISK spills; the
    // warehouse-scale twin is writing the index to parquet once.)
    // The index carries the 8-byte shingle HASH, not the shingle string
    // ([[graft.functions.ShingleHashes]] — fused shingle+hash+distinct per
    // row): identity is all the join and the counts use, and a long key
    // shrinks the cached index, the shuffle, and the hash-join probe. The
    // oracle computes identical hashes, so results match by construction.
    val sh = graft.core.CacheScope.persist(
      df.select(col(idCol).as("id"),
        explode(graft.functions.ShingleHashes(col(textCol), n)).as("sh")))
    // df-cut via an aggregated hot-shingle set, NOT `count(*) OVER
    // (PARTITION BY sh)`: the window sorts the FULL exploded table with no
    // partial aggregation, while groupBy collapses map-side to one row per
    // distinct shingle before anything shuffles. The hot set is small by
    // construction (≤ total shingle occurrences / maxDocFreq), so the
    // anti-join broadcasts — a cheap map-side lookup each consumer repeats
    // against the cached index; on a boilerplate-heavy corpus where the hot
    // set isn't small, pass broadcastHot = false and AQE picks at runtime.
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDocFreq).select("sh")
    // the culled index is persisted TOO: it feeds both self-join sides and
    // the sizes aggregate, and each would otherwise replay the hot-set
    // shuffle + the full anti-join pass over the cached explode (measured:
    // the hot aggregate ran 3× per query before this)
    val filtered = graft.core.CacheScope.persist(cullHot(sh, hot, broadcastHot))
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("n_sh"))
    // shuffle_hash (default), NOT broadcast: AQE sees a sub-threshold build
    // side at test scale and picks BHJ, but building+shipping the ENTIRE
    // inverted index as a broadcast relation is 3× slower even here and
    // impossible at corpus scale — the hint pins the hash-partition-on-
    // shingle bucket join. The df-cut is what bounds a bucket's in-memory
    // hash build; running with a huge maxDocFreq (or pathological residual
    // skew) is what joinHint = None (AQE skew-split) or Some("merge")
    // (spillable sort-merge) is for. The pair aggregate itself goes through
    // [[sharedCounts]] (packed single-long key by default).
    val pairs = sharedCounts(filtered, joinHint, packIds)
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "shared", "jaccard")
  }

  /** Fuzzy near-dup pairs by edit distance, with blocking: docs self-join
    * only within `blockCols` groups (never a global cross join), compare on a
    * `prefixLen`-char prefix, keep pairs within `maxDist`. Levenshtein is
    * O(len²) per pair, so at scale BOTH caps matter: blocking bounds the pair
    * count, the prefix bounds the DP table. Spark's three-arg
    * `levenshtein(l, r, threshold)` abandons a pair's DP early once the
    * distance provably exceeds the cap (returns -1, filtered here) — the
    * right primitive when most pairs are far apart.
    *
    * `bandChars > 0` adds a CONTENT band to the block key: candidates must
    * also share their first `bandChars` characters (standard prefix
    * blocking from the record-linkage literature). This is the scale
    * switch: attribute blocks like (lang, source) have bounded CARDINALITY,
    * so block SIZE grows linearly with the corpus and pair count grows
    * quadratically — measured 65× time at 10× corpus. Content bands grow
    * in NUMBER with the corpus while sizes stay bounded by true
    * near-duplicate density, restoring linear scaling (measured 10×-corpus
    * time drops to ~linear with bandChars = 16). The trade is recall at
    * the head: a pair whose first `bandChars` chars differ is not
    * reported — acceptable for the template/license/boilerplate copies
    * this operator exists to catch, which share their head verbatim. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], prefixLen: Int, maxDist: Int,
      bandChars: Int = 0): DataFrame = {
    // repartition on the block key WITH an explicit partition count: the DP
    // work is compute-heavy on byte-tiny rows, and AQE's size-based
    // coalescing would happily merge a column-only repartition down to one
    // partition — serializing the whole compare loop onto a single core.
    // An explicit count is exempt from coalescing.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val blockKey: Seq[String] =
      if (bandChars > 0) blockCols :+ "_band" else blockCols
    val base = df.select(
      (blockCols.map(col) :+ col(idCol).as("id")) :+
        substring(col(textCol), 1, prefixLen).as("pfx"): _*)
    val banded =
      if (bandChars > 0) base.withColumn("_band",
        substring(col("pfx"), 1, bandChars))
      else base
    val narrow = banded.repartition(parts, blockKey.map(col): _*)
    val renamed = narrow.select(
      (blockKey.map(col) :+ col("id").as("id_b")) :+ col("pfx").as("pfx_b"): _*)
    // `dist >= 0` is the COMPLETE threshold filter: the three-arg
    // levenshtein returns -1 past the cap, so one conjunct means the DP
    // runs once per candidate in the join condition instead of once per
    // comparison operator (Catalyst pushes this predicate into the join).
    narrow.join(renamed, blockKey)
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        levenshtein(col("pfx"), col("pfx_b"), maxDist).as("dist"))
      .where(col("dist") >= 0)
  }

  /** Benchmark decontamination: corpus documents sharing at least `minShared`
    * distinct word n-grams with ANY document of a reference (benchmark/eval)
    * set are flagged for removal — the standard guard against test-set
    * leakage into training data. Returns (id, shared_ngrams) per
    * contaminated corpus doc.
    *
    * Scale shape: inverted-index semi-join — both sides explode to
    * (shingle, id) with the shuffle keyed on the shingle; the reference side
    * keeps only DISTINCT shingles (its doc identity is irrelevant), so the
    * join output is bounded by corpus-shingle × ref-shingle-set overlap, not
    * by reference size. Ubiquitous shingles (df > maxDocFreq in the corpus)
    * are cut first — they signal boilerplate, not leakage, and they are the
    * join's skew risk. */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      n: Int = 5, minShared: Long = 5, maxDocFreq: Long = 1000,
      broadcastHot: Boolean = true,
      maxDocFreqFrac: Option[Double] = None): DataFrame = {
    // both sides of the semi-join carry the 8-byte shingle hash, not the
    // string ([[graft.functions.ShingleHashes]]) — see [[ngramJaccardPairs]]
    val corpusSh = corpus.select(col(idCol).as("id"),
      explode(graft.functions.ShingleHashes(col(textCol), n)).as("sh"))
    // same aggregated df-cut as [[ngramJaccardPairs]] — the windowed
    // count-over-shingle formulation has no map-side combine; broadcastHot
    // = false hands the anti-join strategy to AQE for unbounded hot sets.
    //
    // `maxDocFreqFrac` replaces the ABSOLUTE cap with a fraction of corpus
    // size — the scale-safe setting for large corpora. An absolute cap is
    // scale-DEPENDENT in the worst way for this operator: when a benchmark
    // doc has been duplicated across the corpus (leakage at its most
    // rampant), its shingles' df grows with the corpus, crosses any fixed
    // cap, and the cull silently deletes the evidence — measured on the
    // 2000× curation stress, decon recall DROPPED 3× vs 1000× under the
    // absolute default. A shingle in >frac of all docs is boilerplate at
    // every scale; one in 0.02% is a leak signature at every scale. The
    // cutoff rides a broadcast 1-row corpus count — no driver action.
    val hotBase = corpusSh.groupBy("sh").agg(count(lit(1)).as("df"))
    val hot = maxDocFreqFrac match {
      case None => hotBase.where(col("df") > maxDocFreq).select("sh")
      case Some(frac) =>
        hotBase
          .crossJoin(broadcast(
            corpus.agg(count(lit(1)).as("n_corpus"))))
          .where(col("df").cast("double") >
            col("n_corpus").cast("double") * frac)
          .select("sh")
    }
    val culled = cullHot(corpusSh, hot, broadcastHot)
    val refSh = reference
      .select(explode(graft.functions.ShingleHashes(col(refTextCol), n)).as("sh"))
      .distinct()
    culled.join(refSh, "sh")
      .groupBy("id").agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /** Contamination rate per provenance bucket: [[contaminatedIds]] rolled
    * up by source — the report that turns a flat droplist into a
    * decision ("source X is 40% benchmark-leaked: drop the source, not
    * the docs"). One row per source with corpus size, contaminated
    * count, and the truncating micro rate.
    *
    * Scale shape: the contamination semi-join is [[contaminatedIds]]
    * unchanged; the rollup joins its (id)-grain output back to the
    * (id, source) projection once and aggregates per source — bounded
    * |sources| output, map-side combined. */
  def contaminationBySource(corpus: DataFrame, idCol: String,
      textCol: String, sourceCol: String, reference: DataFrame,
      refTextCol: String, n: Int = 5, minShared: Long = 5,
      maxDocFreq: Long = 1000): DataFrame = {
    val bad = contaminatedIds(corpus, idCol, textCol, reference, refTextCol,
      n, minShared, maxDocFreq)
    val src = corpus.select(col(idCol).as("id"), col(sourceCol).as("source"))
    val perSrc = src.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val badSrc = src.join(bad.select("id"), Seq("id"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_contaminated"))
    perSrc.join(badSrc, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("rate_micro",
        expr("(n_contaminated * 1000000L) div n_docs"))
  }

  /** SimHash near-dup pairs via band-bucketed self-join: the signature's
    * `bands` fixed-width slices are the join keys — two docs within
    * `maxHamming` < bands differing bits MUST agree on at least one slice
    * (pigeonhole), so candidate recall is exact, and the only false
    * candidates are random slice collisions (≈ n²·bands / 2^sliceWidth —
    * negligible until n approaches 2^sliceWidth, when more/wider bands are
    * due). The exact hamming re-check runs once per distinct candidate.
    * Cheapest of the near-dup pair generators: the signature is one long,
    * so the whole pipeline shuffles (id, long) tuples only. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 1, bands: Int = 2,
      joinHint: Option[String] = Some("shuffle_hash")): DataFrame =
    bandedHammingPairs(simhashSigs(df, idCol, textCol, "sig"), idCol, "sig",
      maxHamming, bands, joinHint)

  /** Band-bucket candidate pairs over ANY precomputed `bits`-wide signature
    * column (32-bit simhash over text, 64-bit perceptual aHash over
    * images, …): split the signature into `bands` equal bit-bands, equi-join
    * on (band index, band value), keep pairs within `maxHamming`.
    * Pigeonhole-exact recall when `maxHamming < bands` (a pair within the
    * cap must agree on at least one whole band). `bits` must match the
    * signature's real width — banding fewer bits keeps recall (diffs in
    * unbanded bits can't hide a close pair from the banded ones) but lets
    * pairs agreeing only on the banded prefix flood the candidate set.
    * The signature frame shuffles as (id, long) only. */
  def bandedHammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, bands: Int,
      joinHint: Option[String] = Some("shuffle_hash"),
      bits: Int = SimhashBits): DataFrame = {
    require(bits % bands == 0, "bands must divide the signature width")
    require(maxHamming < bands,
      s"recall guarantee needs maxHamming < bands (got $maxHamming, $bands)")
    val width = bits / bands
    // width == 64 (bits=64, bands=1, maxHamming=0 — legal above): Scala's
    // shift is mod 64, so (1L << 64) - 1 would be 0 and every row would land
    // in band_val 0 — a full cross-product self-join (correct via the
    // hamming recheck, quadratically wrong as a plan)
    val mask = if (width == 64) -1L else (1L << width) - 1
    // persist: feeds both sides of the band self-join (recompute trap).
    // CacheScope-registered so a session running many queries over the same
    // corpus doesn't pin one signature cache per call forever.
    val s = graft.core.CacheScope.persist(
      sigs.select(col(idCol).as("id"), col(sigCol).as("sig")))
    val banded = s.select(col("id"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    // shuffle_hash (default): locally neutral (the cost here is the
    // signature agg), but pins the bucket-join shape that holds when banded
    // can't broadcast; joinHint = None / Some("merge") for corpora where a
    // single band value floods one bucket past what a hash build tolerates
    hinted(banded.as("l"), joinHint)
      .join(hinted(banded.as("r"), joinHint), Seq("band_idx", "band_val"))
      .where(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hammingDistance(col("l.sig"), col("r.sig")).as("hamming"))
      .distinct() // a pair colliding in k bands appears k times
      .where(col("hamming") <= maxHamming)
  }

  /** Corpus-level boilerplate stripping — the segment/"line"-dedup pass of
    * CCNet/RefinedWeb-lineage pipelines, adapted to single-line documents:
    * a doc's non-overlapping `segWords`-word segments are hashed per-row
    * ([[graft.functions.SegmentHashes]] — no occurrence-level token
    * shuffle), and a segment whose hash occurs in >= `maxDocFreq` DISTINCT
    * documents is boilerplate (headers, navigation chrome, license
    * blurbs) — every occurrence of it is dropped. Returns per-doc removal
    * accounting: (doc_id, n_tokens, n_segs, n_dropped, kept_tokens) with
    * kept_tokens = n_tokens − n_dropped·segWords (the trailing partial
    * segment never drops).
    *
    * Scale shape — only the (small) hot set is ever cached:
    *   - doc frequency: `array_distinct` dedups within-doc repeats PER ROW
    *     (no global (hash, doc) distinct exchange), and the hash-keyed
    *     count combines map-side, so only each partition's distinct hashes
    *     shuffle; the hot RESULT (segments in >= maxDocFreq docs) persists
    *     and materializes eagerly — see the comment in the body for why;
    *   - the verdict pass is explode_outer → LEFT join against the
    *     broadcast hot set (size-guarded; beyond ~8M hot segments it
    *     degrades to a shuffle join) → ONE id-keyed aggregate whose
    *     partials collapse map-side to one row per doc (a doc's segments
    *     are contiguous — they come from one input row), so the only
    *     exchange is doc-grain. No id-keyed join back to the corpus;
    *   - n_segs needs no aggregate: [[graft.functions.SegmentHashes]]
    *     tokenizes exactly like `split(text, ' ')` (empty tokens included)
    *     and emits floor(n_tokens / w) segments, so n_segs is per-row
    *     integer arithmetic on n_tokens. */
  def boilerplateStrip(df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 8, maxDocFreq: Long = 3,
      maxBroadcastHot: Long = 8000000L): DataFrame = {
    val segArr = graft.functions.SegmentHashes(col(textCol), segWords)
    // Materialize the hot set BEFORE planning the verdict join: leaving the
    // aggregate inline in one plan measured 45x slower at 2.5M docs (290s
    // vs 6.4s) even though the printed plan was the same broadcast join —
    // the single fused plan re-derives the build side and falls off the
    // codegen fast path. The count doubles as the broadcast-size guard:
    // a broadcast HashedRelation costs ~30-50 bytes per single-long key
    // (UnsafeRow + hash-map overhead, not the raw 8 bytes), so the 8M-key
    // cap admits ~250-400 MB on the driver and per executor — sized for the
    // 100g heaps jrun.sh configures, not for a default 1g executor; an
    // adversarially boilerplate-heavy corpus beyond that degrades to a
    // shuffle join instead of blowing the driver.
    val hot = graft.core.CacheScope.persist(
      df.select(explode(array_distinct(segArr)).as("seg_hash"))
        .groupBy("seg_hash").agg(count(lit(1)).as("df_docs"))
        .where(col("df_docs") >= maxDocFreq)
        .select("seg_hash"))
    val nHot = hot.count()
    val hotTagged = hot.withColumn("is_hot", lit(1))
    // record which branch the guard took at volume (the funnel audits in
    // BASELINE.md cite it); silent below 1M so verify/bench logs stay clean
    if (nHot > 1000000L) System.err.println(
      s"[boilerplateStrip] hot segments=$nHot join=" +
        (if (nHot <= maxBroadcastHot) "broadcast" else "shuffle"))
    // maxBroadcastHot: the branch cap is a parameter so the shuffle
    // degradation path is FORCEABLE (0 = always shuffle) — replica corpora
    // can't grow distinct hot segments past the default 8M cap, so without
    // the knob the fallback would only ever run in unit tests
    val hotSide = if (nHot <= maxBroadcastHot) broadcast(hotTagged) else hotTagged
    df.select(col(idCol).as("id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"),
        // explode_outer: zero-segment and null-text docs keep their row
        // (null seg_hash never matches hot → n_dropped 0)
        explode_outer(segArr).as("seg_hash"))
      .join(hotSide, Seq("seg_hash"), "left")
      .groupBy("id")
      .agg(first(col("n_tokens")).as("n_tokens"),
        coalesce(sum(col("is_hot")), lit(0L)).cast("long").as("n_dropped"))
      .select(col("id"),
        col("n_tokens"),
        // null text mirrors the old aggregate path: 0 segments
        coalesce(expr(s"n_tokens div $segWords"), lit(0L)).as("n_segs"),
        col("n_dropped"),
        (col("n_tokens") - col("n_dropped") * segWords).as("kept_tokens"))
  }

  /** Shingle CONTAINMENT pairs: `shared / min(|A|, |B|)` instead of Jaccard's
    * `shared / |A ∪ B|` — the signal Jaccard structurally misses: a document
    * quoted whole inside a much longer one scores `|A| / |A ∪ B| ≈ 0` on
    * Jaccard but 1.0 on containment. The standard second dedup pass after
    * near-dup removal (catches quote-expansion, boilerplate-wrapped reposts,
    * chunk-of-a-longer-doc leaks into eval sets).
    *
    * Identical physical shape to [[ngramJaccardPairs]] — shared inverted
    * index, df-cut, shingle-keyed self-join, id-only pairs — so the same
    * 100 TB story holds; only the final scalar differs. `minShared` prunes
    * single-shingle coincidences before the size join. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minContainment: Double = 0.8, minShared: Long = 2,
      maxDocFreq: Long = 100, broadcastHot: Boolean = true,
      joinHint: Option[String] = Some("shuffle_hash"),
      packIds: Boolean = true): DataFrame = {
    // one persisted explode feeds the hot-set aggregate, the sizes
    // aggregate, and both self-join sides (see ngramJaccardPairs for why
    // groupBy-hot beats a count window, and why the index carries 8-byte
    // shingle hashes, not strings)
    val sh = graft.core.CacheScope.persist(
      df.select(col(idCol).as("id"),
        explode(graft.functions.ShingleHashes(col(textCol), n)).as("sh")))
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDocFreq).select("sh")
    // persisted like the raw explode: three consumers (two self-join sides,
    // sizes) would otherwise each replay the hot-set shuffle + anti-join
    val filtered = graft.core.CacheScope.persist(cullHot(sh, hot, broadcastHot))
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val pairs = sharedCounts(filtered, joinHint, packIds)
      .where(col("shared") >= minShared)
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("containment",
        col("shared").cast("double") / least(col("n_a"), col("n_b")))
      .where(col("containment") >= minContainment)
      // the CONTAINED side (fewer shingles; ties → the larger id, so the
      // survivor choice stays deterministic) — what a dedup pass drops
      .withColumn("contained_id",
        when(col("n_a") < col("n_b"), col("id_a"))
          .when(col("n_b") < col("n_a"), col("id_b"))
          .otherwise(greatest(col("id_a"), col("id_b"))))
      .select("id_a", "id_b", "shared", "containment", "contained_id")
  }

  /** Content-defined chunking ([[graft.functions.CdcChunks]]): one row per
    * chunk — (id, chunk_idx, start_tok, end_tok, chunk_hash) with 1-based
    * inclusive token ranges. Boundaries come from a rolling window hash of
    * the CONTENT, so a passage shifted by an edit elsewhere re-chunks (and
    * re-hashes) identically — the shifted/embedded duplication that
    * fixed-width segmenting ([[boilerplateStrip]]'s 8-word segments)
    * structurally misses.
    *
    * Scale shape: chunking is a NARROW per-row map (one fused codegen pass,
    * zero shuffle); the explode emits tokens/expected-chunk-length rows per
    * doc carrying three longs each. Everything downstream (dup-chunk
    * detection, chunk-level decontamination) is a chunk_hash-keyed groupBy
    * with map-side combine. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 16): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(graft.functions.CdcChunks(col(textCol), window, divisor)))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col.start_tok").as("start_tok"), col("col.end_tok").as("end_tok"),
        col("col.chunk_hash").as("chunk_hash"))

  /** The same chunking expressed with built-in higher-order functions — the
    * O(n·window) interpreted twin [[cdcChunks]] must always agree with
    * (property-tested); kept as the semantic oracle and the
    * no-extension-point fallback shape. */
  def cdcChunksDeclarative(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 16): DataFrame = {
    import Hashing.P
    val B = 257L
    val toks = tokens(col("_text"))
    val hs = transform(toks, t => Hashing.stableHash31(t))
    // fold over the w-token window ending at 1-based position i
    def roll(i: Column) = aggregate(
      slice(hs, (i - window + 1).cast("int"), lit(window)), lit(0L),
      (acc, h) => (acc * B + h) % P)
    // guard: Spark's sequence(a, b) runs DESCENDING when b < a (DuckDB's
    // range is empty) — a doc shorter than the window has no boundary slots
    val positions = when(size(toks) >= window,
      sequence(lit(window.toLong), size(toks).cast("long")))
      .otherwise(array().cast("array<long>"))
    val bpos = filter(positions, i => roll(i) % divisor === 0)
    val ends = when(
      coalesce(element_at(bpos, -1), lit(-1L)) === size(toks).cast("long"),
      bpos).otherwise(concat(bpos, array(size(toks).cast("long"))))
    df.select(col(idCol).as("id"), col(textCol).as("_text"))
      .withColumn("_ends", ends)
      .select(col("id"), col("_text"),
        posexplode(transform(col("_ends"), (e, k) => struct(
          when(k === 0, lit(1L))
            .otherwise(element_at(col("_ends"), k) + 1).as("start_tok"),
          e.as("end_tok")))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col.start_tok").as("start_tok"), col("col.end_tok").as("end_tok"),
        Hashing.stableHash31(concat_ws(" ",
          slice(tokens(col("_text")), col("col.start_tok").cast("int"),
            (col("col.end_tok") - col("col.start_tok") + 1).cast("int"))))
          .as("chunk_hash"))
  }

  /** Chunks appearing in more than one DISTINCT document — the dup-chunk
    * report CDC exists for (embedded quotes, shifted boilerplate, licensed
    * passages): (chunk_hash, n_occurrences, n_docs, first_doc). One
    * chunk_hash-keyed aggregate over the narrow chunk table. */
  def cdcDupChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 16, minDocs: Long = 2): DataFrame =
    cdcChunks(df, idCol, textCol, window, divisor)
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("id")).as("n_docs"),
        min("id").as("first_doc"))
      .where(col("n_docs") >= minDocs)

  /** Chunk-grain decontamination — the CDC companion of [[contaminatedIds]]:
    * corpus docs sharing at least `minShared` DISTINCT chunk hashes with ANY
    * reference (benchmark/eval) document are flagged. Where n-gram
    * decontamination scores short overlaps, chunk hashes only collide on
    * entire content-defined spans — long verbatim passages — so this pass
    * has near-zero false-positive rate on topical overlap and survives the
    * reference text being EMBEDDED at any offset (the chunk boundaries
    * travel with the content). Returns (id, shared_chunks).
    *
    * Scale shape: both sides chunk in a narrow fused pass; the reference
    * side collapses to DISTINCT hashes (its doc identity is irrelevant), so
    * the join output is bounded by corpus-chunk × ref-chunk-set overlap,
    * never by reference size; the shuffle key is the 31-bit chunk hash. */
  def contaminatedIdsByChunk(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      window: Int = 8, divisor: Int = 16, minShared: Long = 1): DataFrame = {
    val c = cdcChunks(corpus, idCol, textCol, window, divisor)
      .select(col("id"), col("chunk_hash")).distinct()
    // the reference needs no id column — only its distinct chunk hashes
    val r = cdcChunks(reference.select(lit(0L).as("_rid"), col(refTextCol)),
        "_rid", refTextCol, window, divisor)
      .select("chunk_hash").distinct()
    c.join(r, "chunk_hash")
      .groupBy("id").agg(count(lit(1)).as("shared_chunks"))
      .where(col("shared_chunks") >= minShared)
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct shingles
    * whose global first appearance (min id over the corpus) is the doc
    * itself. The crawl-health metric behind "is batch N still adding
    * content, or re-crawling what we have?" — aggregate novelty per
    * source/batch falls out of one more groupBy on the result.
    *
    * Scale shape: ONE shingle-keyed exchange — `min(id)` as an unbounded
    * window over `partitionBy(sh)` — then a doc-keyed aggregate whose
    * partials collapse map-side. No join (the round-12 100× audit caught
    * the previous groupBy + join-back shape at 12.0× in the second
    * decade: the first-seen build side crossed the per-task in-memory
    * hash threshold and spilled); the window is sort-based, so at any
    * scale it streams through disk instead of building an in-memory
    * relation, and no cache of the exploded set is held at all. A hot
    * shingle still costs rows proportional to its frequency, not
    * frequency². */
  def noveltyRates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(graft.functions.ShingleHashes(col(textCol), n)).as("sh"))
    sh.withColumn("first_id",
        min("id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") < col("id"), 1L).otherwise(0L)).as("n_seen"))
      .withColumn("novelty",
        round(lit(1.0) - col("n_seen").cast("double") / col("n_shingles"), 6))
  }

  /** EXACT repeated-substring spans, at n-gram grain: for every document,
    * the maximal token ranges `[span_start, span_end]` in which EVERY
    * length-`n` token window occurs at least `minCount` times corpus-wide
    * (in-document repeats included). This is the exact-substring dedup cut
    * from the dedup literature — the pass that removes verbatim licenses,
    * headers, and templated passages that document-level MinHash can't see
    * because the surrounding text differs — restricted to n-token
    * resolution: a repeated substring of length L ≥ n tokens is reported
    * exactly (as the span of its L−n+1 constituent windows); repeats
    * shorter than n tokens are invisible by design.
    *
    * Scale shape (why this is NOT a suffix array): the classic construction
    * is a corpus-wide suffix sort — a global order no shuffle key
    * decomposes. At n-gram grain the same cut becomes embarrassingly
    * key-partitioned: one fused scan emits positional window hashes
    * ([[graft.functions.PositionalShingleHashes]] — 8-byte keys, no shingle
    * strings), a hash-keyed groupBy counts occurrences (map-side combine;
    * one row per DISTINCT window survives), a semi-join marks the repeated
    * positions, and the span merge is a per-document window — partitioned
    * by id, skew-free. Every stage keys on hash or id; nothing global.
    * Hot-window skew mirrors [[ngramJaccardPairs]]'s: a semi-join probe
    * costs rows ∝ frequency (not frequency²), so no df-cut is needed.
    *
    * Returns (id, span_start, span_end, n_windows): token positions,
    * 0-based, `span_end` = start of the span's LAST window + n − 1 =
    * inclusive end of the repeated text itself. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minCount: Long = 2,
      joinHint: Option[String] = Some("shuffle_hash"),
      broadcastRepeated: Option[Boolean] = None,
      maxBroadcastHashes: Long = 4000000L): DataFrame = {
    // persisted: the occurrence count and the position mark both read it,
    // and each would otherwise re-run the scan + window-hash explode
    // (CacheScope-registered; the session owner drains after the action)
    val grams = graft.core.CacheScope.persist(
      df.select(col(idCol).as("id"),
        posexplode(graft.functions.PositionalShingleHashes(col(textCol), n))
          .as(Seq("pos", "h"))))
    // Broadcasting the repeated set spares the full grams exchange on `h`
    // (the spans below re-shuffle on id anyway, so the semi-join's hash
    // partitioning buys nothing downstream) — but the set is bounded only
    // by the count of distinct windows occurring >= minCount, which is
    // data-sized on boilerplate-heavy corpora: an UNCONDITIONAL broadcast
    // is exactly the ship-the-whole-set failure mode the near-dup paths
    // warn against. Default (None) therefore GATES on the measured size:
    // persist the aggregate, count it (one driver long — the aggregate is
    // reused by the join, so nothing recomputes), and broadcast only under
    // `maxBroadcastHashes` (4M longs ≈ 32 MB map-side); above it, the
    // pinned shuffle_hash bucket join takes over. Some(true)/Some(false)
    // force either path when the corpus shape is known a priori.
    val repeated = graft.core.CacheScope.persist(
      grams.groupBy("h").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= minCount).select("h"))
    val doBroadcast = broadcastRepeated.getOrElse(
      repeated.count() <= maxBroadcastHashes)
    val hits =
      if (doBroadcast) grams.join(broadcast(repeated), Seq("h"), "left_semi")
      else hinted(grams, joinHint).join(hinted(repeated, joinHint), Seq("h"), "left_semi")
    // merge adjacent repeated positions into maximal spans: a gap in `pos`
    // starts a new span (standard gaps-and-islands, both windows id-local)
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1, -2).over(byPos) === 1, 0L).otherwise(1L))
      .withColumn("span",
        sum("brk").over(byPos.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("id", "span")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + lit(n) - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("span")
  }

  /** Cross-tag duplicate pairs by content fingerprint, JOIN-FREE: documents
    * sharing an exact [[graft.operators.TextAnalysis.fingerprint]] but
    * carrying different `tagCol` values (language, source, license…) —
    * q159's cross-language leak detector, re-expressed as ONE aggregation
    * instead of a fingerprint self-join. The self-join form computes the
    * md5-per-token fingerprint on BOTH sides (the broadcast tier has no
    * exchange to reuse) and shuffles the corpus twice at the sort-merge
    * tier; this form fingerprints once, shuffles once on fp, and expands
    * pairs inside each duplicate group.
    *
    * Scale shape: one corpus-sized exchange keyed on fingerprint; group
    * sizes are duplicate multiplicities (corpus-sparse by construction),
    * and the pair expansion is group-local — output volume is identical
    * to the join form (both are Σ C(|group|,2)-bounded), with no
    * quadratic intermediate beyond what the answer itself contains.
    * Members sort by (id, tag) inside the group, so `i < j` implies
    * `id_i < id_j` and the output is deterministic.
    *
    * NULL fingerprints (NULL text) are dropped before grouping — the
    * equality self-join this replaces never matches NULLs, so a NULL
    * group would be pure divergence. Same-tag-only groups are killed
    * INSIDE the aggregate (`size(collect_set(tag)) > 1` — tag
    * cardinality is small: languages, sources): a mass-duplicated
    * boilerplate group whose members all share one tag would otherwise
    * expand m² in one task and then filter every pair to nothing.
    * `maxGroupSize` (None = exhaustive, the oracle's shape) additionally
    * skips genuine cross-tag mega-groups, mirroring
    * [[minhashCandidates]]'s maxBucketSize: a group of m docs emits up
    * to C(m,2) pairs, and one degenerate cluster can dominate the job.
    *
    * Returns (id_a, id_b, tag_a, tag_b) with id_a < id_b, tag_a ≠ tag_b
    * (strict: duplicate id values never pair with themselves, matching
    * the join form's `a.id < b.id`). */
  def crossTagDupPairs(df: DataFrame, idCol: String, tagCol: String,
      textCol: String, maxGroupSize: Option[Int] = None): DataFrame =
    crossTagDupPairsFromFp(
      df.select(col(idCol).as("id"), col(tagCol).as("tag"),
        graft.operators.TextAnalysis.fingerprint(col(textCol)).as("fp"))
        .where(col("fp").isNotNull),
      maxGroupSize)

  /** [[crossTagDupPairs]] over a PRE-FINGERPRINTED (id, tag, fp) relation —
    * the layout-aware entry point: feed it a table bucketed on `fp`
    * ([[graft.operators.ScaleOps.ensureBucketed]]) and the fp-keyed
    * aggregation runs exchange-free (the bucketed scan's hash partitioning
    * satisfies the aggregate's distribution), so repeated dup sweeps over
    * a warehoused corpus pay the fingerprint shuffle once at write time —
    * the q212 bucketed-fact pattern applied to the dedup family. Callers
    * own the NULL-fp precondition (ensure `fp IS NOT NULL` at write). */
  def crossTagDupPairsFromFp(fp: DataFrame,
      maxGroupSize: Option[Int] = None): DataFrame = {
    val grouped = fp.groupBy("fp")
      .agg(sort_array(collect_list(struct(col("id"), col("tag"))))
        .as("members"),
        size(collect_set(col("tag"))).as("n_tags"))
      .where(size(col("members")) > 1 && col("n_tags") > 1)
      .drop("n_tags")
    val groups = maxGroupSize match {
      case None => grouped
      case Some(cap) => grouped.where(size(col("members")) <= cap)
    }
    groups
      .select(col("members"), posexplode(col("members")).as(Seq("i", "a")))
      .select(col("i"), col("a"),
        posexplode(col("members")).as(Seq("j", "b")))
      .where(col("i") < col("j") && col("a.id") < col("b.id") &&
        col("a.tag") =!= col("b.tag"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.tag").as("tag_a"), col("b.tag").as("tag_b"))
  }
}
