package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the inverted-index pair pipeline (q21/q75)
  * at a given sfDir — times each sub-plan's action separately to locate the
  * dominant cost. `sbt "runMain graft.tools.StageProbe [sfDir]"`. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("WARN")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")

    def timeIt[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // warmup full query once (codegen, scan metadata)
    graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.1, maxDocFreq = 20).count()
    graft.core.CacheScope.drain()

    for (_ <- 1 to 2) {
      val sh = graft.core.CacheScope.persist(
        docs.select(col("doc_id").as("id"),
          explode(graft.functions.ShingleHashes(col("text"), 3)).as("sh")))
      timeIt("persist_index")(sh.count())
      val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .where(col("df") > 20).select("sh")
      timeIt("hot_agg")(hot.count())
      val filtered = sh.join(broadcast(hot), Seq("sh"), "left_anti")
      val sizes = filtered.groupBy("id").agg(count(lit(1)).as("n_sh"))
      timeIt("sizes")(sizes.count())
      val pairs = filtered.as("a").hint("shuffle_hash")
        .join(filtered.as("b").hint("shuffle_hash"), "sh")
        .where(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
      timeIt("selfjoin_pairagg")(pairs.count())
      timeIt("full_query")(
        graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.1, maxDocFreq = 20).count())
      graft.core.CacheScope.drain()

      // packed-key variant: one long pair key through the aggregate
      val packed = filtered.as("a").hint("shuffle_hash")
        .join(filtered.as("b").hint("shuffle_hash"), "sh")
        .where(col("a.id") < col("b.id"))
        .select(shiftleft(col("a.id"), 32).bitwiseOR(col("b.id")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("shared"))
        .select(shiftright(col("pk"), 32).as("id_a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"), col("shared"))
      timeIt("packed_pairagg")(packed.count())

      // packed with a loud 31-bit guard (the safe default at scale)
      def guarded(c: Column): Column =
        when(c.between(0L, Int.MaxValue.toLong), c)
          .otherwise(raise_error(lit("pair-key packing needs ids in [0, 2^31)")))
      val packedG = filtered.as("a").hint("shuffle_hash")
        .join(filtered.as("b").hint("shuffle_hash"), "sh")
        .where(col("a.id") < col("b.id"))
        .select(shiftleft(guarded(col("a.id")), 32)
          .bitwiseOR(guarded(col("b.id"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("shared"))
        .select(shiftright(col("pk"), 32).as("id_a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"), col("shared"))
      timeIt("packed_guarded")(packedG.count())

      // packed + sizes carried through the aggregate via min/max over pk halves
      val withN = filtered.join(sizes, "id")
      val packed2 = withN.as("a").hint("shuffle_hash")
        .join(withN.as("b").hint("shuffle_hash"), "sh")
        .where(col("a.id") < col("b.id"))
        .select(shiftleft(col("a.id"), 32).bitwiseOR(col("b.id")).as("pk"),
          col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
        .groupBy("pk").agg(count(lit(1)).as("shared"),
          first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      timeIt("packed_carry_sizes")(packed2.count())

      // bucket alternative: groupBy-collect_list, pairs from in-bucket explode
      val sh2 = graft.core.CacheScope.persist(
        docs.select(col("doc_id").as("id"),
          explode(graft.functions.ShingleHashes(col("text"), 3)).as("sh")))
      val hot2 = sh2.groupBy("sh").agg(count(lit(1)).as("df"))
        .where(col("df") > 20).select("sh")
      val buckets = sh2.join(broadcast(hot2), Seq("sh"), "left_anti")
        .groupBy("sh").agg(collect_list(col("id")).as("ids"))
      val pairs2 = buckets
        .select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a"), explode(col("ids")).as("b"))
        .where(col("a") < col("b"))
        .groupBy(col("a").as("id_a"), col("b").as("id_b"))
        .agg(count(lit(1)).as("shared"))
      timeIt("bucket_pairagg")(pairs2.count())
      graft.core.CacheScope.drain()

      // no-persist variant: rely on exchange reuse / recompute
      val sh3 = docs.select(col("doc_id").as("id"),
        explode(graft.functions.ShingleHashes(col("text"), 3)).as("sh"))
      val hot3 = sh3.groupBy("sh").agg(count(lit(1)).as("df"))
        .where(col("df") > 20).select("sh")
      val filtered3 = sh3.join(broadcast(hot3), Seq("sh"), "left_anti")
      val sizes3 = filtered3.groupBy("id").agg(count(lit(1)).as("n_sh"))
      val pairs3 = filtered3.as("a").hint("shuffle_hash")
        .join(filtered3.as("b").hint("shuffle_hash"), "sh")
        .where(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= 1)
      val full3 = pairs3
        .join(sizes3.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes3.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("jaccard",
          col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
        .where(col("jaccard") >= 0.1)
      timeIt("nopersist_full")(full3.count())

      // q89 repeatedSpans staging: where do its ~0.65 s go? (floor audit)
      val grams = graft.core.CacheScope.persist(
        docs.select(col("doc_id").as("id"),
          posexplode(graft.functions.PositionalShingleHashes(col("text"), 8))
            .as(Seq("pos", "h"))))
      timeIt("q89_persist_grams")(grams.count())
      val repeated = grams.groupBy("h").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2).select("h")
      timeIt("q89_repeated_agg")(repeated.count())
      timeIt("q89_full")(
        graft.operators.Dedup.repeatedSpans(docs, "doc_id", "text").count())
      graft.core.CacheScope.drain()

      // q89 FUSED candidate: fold positions into the count aggregate
      // (collect_list) — one pass over grams, no cache, no semi-join.
      // Trade-off being measured: the fused aggregate shuffles the FULL
      // grams volume on h (collect_list partials don't compress map-side,
      // where count-only collapses to one row per distinct window per
      // partition) and a corpus-hot window materializes its whole
      // position list in ONE aggregation buffer — the skew/volume reasons
      // the semi-join stays the 100-TB default if this doesn't win big.
      timeIt("q89_fused") {
        val byPos = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("pos")
        val unb = org.apache.spark.sql.expressions.Window.unboundedPreceding
        docs.select(col("doc_id").as("id"),
            posexplode(graft.functions.PositionalShingleHashes(col("text"), 8))
              .as(Seq("pos", "h")))
          .groupBy("h").agg(count(lit(1)).as("cnt"),
            collect_list(struct(col("id"), col("pos"))).as("ps"))
          .where(col("cnt") >= 2)
          .select(explode(col("ps")).as("p"))
          .select(col("p.id").as("id"), col("p.pos").as("pos"))
          .withColumn("brk",
            when(col("pos") - lag("pos", 1, -2).over(byPos) === 1, 0L)
              .otherwise(1L))
          .withColumn("span", sum("brk").over(byPos.rowsBetween(unb, 0)))
          .groupBy("id", "span")
          .agg(min("pos").cast("long").as("span_start"),
            (max("pos") + lit(8) - 1).cast("long").as("span_end"),
            count(lit(1)).as("n_windows"))
          .count()
      }
    }
    s.stop()
  }
}
