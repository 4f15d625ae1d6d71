package graft

/** Session-lifetime cache hygiene: the round-2 driver bench showed operator
  * persists accumulating across a sequential 55-query run (pinned blocks,
  * CacheManager plan-matching stale entries, 2-11× inflation on q43/q49/q50).
  * This guards the fix: running the cache-sharing queries back-to-back in ONE
  * session, with the owner-side drain between them, must return the
  * persistent-RDD set to its baseline every time.
  *
  * q43 and q49 deliberately run in this order — both build the same simhash
  * signature sub-plan, which is exactly the CacheManager plan-match collision
  * the round-2 bench log surfaced ("Asked to cache already cached data" /
  * "...cannot be recomputed after unpersisting").
  */
class CacheHygieneSpec extends SparkSpec {

  test("sequential cache-sharing queries release all storage") {
    val sc = spark.sparkContext
    graft.core.CacheScope.drain() // start clean regardless of suite order
    val baseline = sc.getPersistentRDDs.keySet
    val names = Seq("q43_components", "q49_simhash_pairs", "q50_set_ops",
      "q19_dedup_minhash", "q21_dedup_ngram_jaccard",
      // round-5 persisting operators: segment table (q66), IVF assignment
      // (q68), score table (q69), and the q57/q71 pair share the minhash
      // candidate sub-plan — the same collision class as q43/q49
      "q66_boilerplate_strip", "q68_semantic_dedup", "q69_quality_gate",
      "q57_dedup_clusters", "q71_quality_keepers",
      // containment (q75) persists the same shingle inverted index q21
      // does — same release contract; novelty (q77) persists NOTHING
      // since the round-13 window rewrite and stays here to prove it;
      // the composed report (q80) stacks three persisting operators
      "q75_containment_pairs", "q77_novelty_rate", "q80_corpus_report")
    for (name <- names) {
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n >= 0)
      graft.core.CacheScope.drain()
      assert(graft.core.CacheScope.pending == 0)
      val leaked = sc.getPersistentRDDs.keySet -- baseline
      assert(leaked.isEmpty,
        s"$name left persistent RDDs pinned after drain: ids $leaked")
    }
  }

  test("draining between calls keeps repeated operator runs leak-free") {
    import graft.operators.Dedup
    val sc = spark.sparkContext
    graft.core.CacheScope.drain()
    val baseline = sc.getPersistentRDDs.keySet
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (_ <- 1 to 3) {
      Dedup.simhashPairs(docs, "doc_id", "text").count()
      graft.core.CacheScope.drain()
    }
    assert((sc.getPersistentRDDs.keySet -- baseline).isEmpty)
  }

  test("drain is thread-scoped: concurrent queries can't release each other") {
    import graft.core.CacheScope
    CacheScope.drain()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // a "query" in flight on another thread: registers a persist and parks
    @volatile var otherPending = -1
    @volatile var otherCachedAfter = false
    val registered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val other = new Thread(() => {
      val sigs = CacheScope.persist(
        graft.operators.Dedup.simhashSigs(docs, "doc_id", "text"))
      sigs.count()
      registered.countDown()
      release.await()
      // this thread's registration must still be alive and cached
      otherPending = CacheScope.pending
      otherCachedAfter = sigs.storageLevel.useMemory
      CacheScope.drain()
    })
    other.start()
    registered.await()
    // main thread runs and drains its own query — must NOT touch the other's
    CacheScope.persist(docs.select("doc_id")).count()
    assert(CacheScope.pending == 1)
    CacheScope.drain()
    assert(CacheScope.pending == 0)
    release.countDown()
    other.join()
    assert(otherPending == 1, "other thread's registration was drained away")
    assert(otherCachedAfter, "other thread's persist was unpersisted")
    // session-shutdown sweep catches scopes from exited threads
    val ghost = new Thread(() =>
      CacheScope.persist(docs.select("lang")).count(): Unit)
    ghost.start(); ghost.join()
    CacheScope.drainAll()
    assert(CacheScope.pending == 0)
  }
}
