package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-6 curation operators: pattern redaction, deterministic shard
  * shuffle, context-window chunking, naive-Bayes label prediction. */
class CurationRound6Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- redactPatterns

  test("redactPatterns: counts on original text, every match rewritten") {
    val df = Seq(
      (1L, "call customer or supplier about the scan"),
      (2L, "sort sort sort"),
      (3L, "nothing to hide")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPatterns(df, "doc_id", "text",
        Seq("ent" -> "\\b(customer|supplier)\\b",
            "op" -> "\\b(scan|sort)\\b"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq ===
      Seq(
        (1L, 2L, 1L, "call <ENT> or <ENT> about the <OP>"),
        (2L, 0L, 3L, "<OP> <OP> <OP>"),
        (3L, 0L, 0L, "nothing to hide")))
  }

  test("redactPatterns: a class matching inside words is contained by \\b") {
    val df = Seq((1L, "scanner is not a scan")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPatterns(df, "doc_id", "text",
      Seq("op" -> "\\bscan\\b")).collect()
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getString(2) === "scanner is not a <OP>")
  }

  // --------------------------------------------------------- shardShuffle

  test("shardShuffle: total deterministic permutation, shards partition rows") {
    val df = (0L until 500L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val out = ScaleOps.shardShuffle(df, "doc_id", numShards = 8)
      .select("doc_id", "shard", "pos").collect()
    assert(out.length === 500)
    // every row appears once; (shard, pos) is a key
    assert(out.map(_.getLong(0)).toSet.size === 500)
    assert(out.map(r => (r.getInt(1), r.getLong(2))).toSet.size === 500)
    // positions within a shard are 1..count, dense
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // rerun is bit-identical (no randomness state)
    val again = ScaleOps.shardShuffle(df, "doc_id", numShards = 8)
      .select("doc_id", "shard", "pos").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ===
      again.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("shardShuffle: order breaks source run-length correlation") {
    // 2 sources in contiguous blocks; after the shuffle, the first shard's
    // read order must interleave them (probability of NOT interleaving in
    // the first 10 slots is ~2^-9 under the hash permutation)
    val df = (0L until 200L).map(i => (i, if (i < 100) "a" else "b"))
      .toDF("doc_id", "src")
    val first = ScaleOps.shardShuffle(df, "doc_id", numShards = 1)
      .orderBy("pos").limit(10).select("src").collect().map(_.getString(0))
    assert(first.toSet.size === 2, s"first 10 reads all one source: ${first.mkString}")
  }

  test("shardShuffle: numShards = 1 yields one shard with a global order") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val out = ScaleOps.shardShuffle(df, "doc_id", 1).collect()
    assert(out.map(_.getAs[Int]("shard")).toSet === Set(0))
  }

  // -------------------------------------------------------- chunkByTokens

  test("chunkByTokens: coverage, overlap, and tail semantics") {
    // 10 tokens, chunk 4, overlap 2 (stride 2): starts 0,2,4,6 — last start
    // is the first whose window reaches the end
    val df = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, "doc_id", "text", 4, 2)
      .orderBy("chunk_idx").collect()
    assert(out.length === 4)
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 4L, 4L, 4L))
    // reconstruct expected hashes
    val toks = (0 until 10).map(i => s"t$i")
    val exp = Seq(0, 2, 4, 6).map(s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(toks.slice(s, s + 4).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(out.map(_.getString(3)).toSeq === exp)
  }

  test("chunkByTokens: short docs produce exactly one chunk") {
    val df = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, "doc_id", "text", 16, 4)
      .collect()
    assert(out.count(_.getLong(0) == 1L) === 1)
    assert(out.count(_.getLong(0) == 2L) === 1)
    // empty string splits to [""] — one 1-token chunk
    assert(out.find(_.getLong(0) == 2L).get.getLong(2) === 1L)
  }

  test("chunkByTokens: zero overlap tiles the doc; no chunk is redundant") {
    val df = Seq((1L, (0 until 9).map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, "doc_id", "text", 4, 0)
      .orderBy("chunk_idx").collect()
    // 9 tokens / stride 4: starts 0, 4, 8 → sizes 4, 4, 1
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 4L, 1L))
  }

  test("chunkByTokens: rejects overlap >= chunkTokens") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(df, "doc_id", "text", 4, 4)
    }
  }

  // --------------------------------------------------- naiveBayesPredict

  test("naiveBayesPredict: separable labels are recovered exactly") {
    val rows = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, "aa aa bb", "A") else (i.toLong, "cc cc dd", "B")
    }
    val out = TextAnalysis.naiveBayesPredict(
        rows.toDF("doc_id", "text", "lab"), "doc_id", "text", "lab")
      .collect()
    assert(out.length === 30)
    assert(out.forall(_.getAs[Boolean]("correct")))
  }

  test("naiveBayesPredict: posterior matches hand-computed micro-nat sum") {
    // 2 docs, 2 classes; vocab {x, y}, V=2
    val df = Seq((1L, "x x y", "p"), (2L, "y y", "q")).toDF("doc_id", "text", "lab")
    val out = TextAnalysis.naiveBayesPredict(df, "doc_id", "text", "lab")
      .orderBy("id").collect()
    // class p: ckt(x)=2, ckt(y)=1, ctot=3; class q: ckt(y)=2, ctot=2
    def q(x: Double) = math.round(math.log(x) * 1e6)
    val llpx = q(3.0 / 5.0); val llpy = q(2.0 / 5.0)
    val llqx = q(1.0 / 4.0); val llqy = q(3.0 / 4.0)
    val prior = q(0.5)
    val d1p = prior + 2 * llpx + 1 * llpy
    val d1q = prior + 2 * llqx + 1 * llqy
    val r1 = out.head
    assert(r1.getAs[String]("predicted") === (if (d1p >= d1q) "p" else "q"))
    assert(r1.getAs[Long]("post_q") === math.max(d1p, d1q))
  }

  test("naiveBayesPredict: tie in posterior breaks by class name") {
    // two classes with mirrored corpora: doc "m" scores identically under
    // both → predicted must be the lexicographically first class
    val df = Seq((1L, "m", "a"), (2L, "m", "b")).toDF("doc_id", "text", "lab")
    val out = TextAnalysis.naiveBayesPredict(df, "doc_id", "text", "lab")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("predicted")).toSeq === Seq("a", "a"))
  }

  // --------------------------------------------- naiveBayesHashedPredict

  test("naiveBayesHashedPredict: separable labels recovered, fixed dim") {
    val rows = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, "aa aa bb", "A") else (i.toLong, "cc cc dd", "B")
    }
    val out = TextAnalysis.naiveBayesHashedPredict(
        rows.toDF("doc_id", "text", "lab"), "doc_id", "text", "lab", dim = 64)
      .collect()
    assert(out.length === 30)
    assert(out.forall(_.getAs[Boolean]("correct")))
  }

  test("naiveBayesHashedPredict: posterior matches the hand-computed " +
      "hashed-bucket micro-nat sum") {
    // 2 docs, 2 classes; with a huge dim the tokens {x, y} land in two
    // distinct buckets, so the math is the exact model's with V -> dim
    val dim = 1 << 16
    val df = Seq((1L, "x x y", "p"), (2L, "y y", "q")).toDF("doc_id", "text", "lab")
    val out = TextAnalysis.naiveBayesHashedPredict(df, "doc_id", "text",
        "lab", dim).orderBy("id").collect()
    def q(x: Double) = math.round(math.log(x) * 1e6)
    // class p: ckt(bx)=2, ckt(by)=1, ctot=3; class q: ckt(by)=2, ctot=2
    val llpx = q(3.0 / (3 + dim)); val llpy = q(2.0 / (3 + dim))
    val llqx = q(1.0 / (2 + dim)); val llqy = q(3.0 / (2 + dim))
    val prior = q(0.5)
    val d1p = prior + 2 * llpx + 1 * llpy
    val d1q = prior + 2 * llqx + 1 * llqy
    val r1 = out.head
    assert(r1.getAs[String]("predicted") === (if (d1p >= d1q) "p" else "q"))
    assert(r1.getAs[Long]("post_q") === math.max(d1p, d1q))
  }

  test("naiveBayesHashedPredict: model width is dim-bound, not vocab-bound") {
    // 500 distinct tokens into dim = 8: collisions pool counts but every
    // doc still scores and the argmax is deterministic
    val rows = (0 until 100).map { i =>
      (i.toLong, s"tok${i % 50} tok${(i * 7) % 50} tok${(i * 13) % 50}",
        if (i % 2 == 0) "A" else "B")
    }
    val out = TextAnalysis.naiveBayesHashedPredict(
        rows.toDF("doc_id", "text", "lab"), "doc_id", "text", "lab", dim = 8)
      .collect()
    assert(out.length === 100)
    assert(out.forall(r => r.getAs[String]("predicted") == "A" ||
      r.getAs[String]("predicted") == "B"))
  }
}
