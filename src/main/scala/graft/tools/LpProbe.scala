package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: decompose q147 (label propagation) cost — edge derivation vs
  * per-round join+aggregate — and A/B the round-join layout: adjacency
  * re-shuffled every round (current) vs adjacency repartitioned+sorted on
  * the join key ONCE at persist time (the §2.4 shared-exchange shape).
  * `scripts/jrun.sh graft.tools.LpProbe [sfDir] [reps]`. */
object LpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("WARN")

    def timeIt(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LP $name ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    def pairs = {
      val items = s.read.parquet(s"$sfDir/lineitem.parquet")
        .where(col("l_quantity") >= 35)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      items.as("i").join(items.as("j"),
          col("i.o") === col("j.o") && col("i.p") < col("j.p"))
        .select(col("i.p").as("a"), col("j.p").as("b"))
    }

    // order-free multiset checksum: sum of per-row xxhash64(id, lbl) — a
    // linear id*31+lbl sum is not collision-resistant (swapping label
    // assignments between two ids preserves it; r17 ADVICE), and the
    // coalesce guards the empty-result case (sum over zero rows is NULL,
    // which would NPE instead of reporting a mismatch)
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(coalesce(sum(xxhash64(col("id"), col("lbl"))), lit(0L)))
        .head().getLong(0)

    // variant: adjacency repartitioned+sorted on the join key once
    def lpRepart(edges: org.apache.spark.sql.DataFrame, rounds: Int) = {
      val canon = graft.core.CacheScope.persist(edges
        .select(least(col("a"), col("b")).cast("long").as("a"),
          greatest(col("a"), col("b")).cast("long").as("b"))
        .where(col("a") =!= col("b")).distinct())
      val adj = graft.core.CacheScope.persist(
        canon.select(col("a").as("v"), col("b").as("x"))
          .unionAll(canon.select(col("b").as("v"), col("a").as("x")))
          .repartition(col("x")).sortWithinPartitions("x"))
      var labels = graft.core.CacheScope.persist(
        adj.select(col("v").as("id")).distinct()
          .withColumn("lbl", col("id")))
      for (_ <- 1 to rounds) {
        val next = graft.core.CacheScope.persist(adj
          .join(labels.select(col("id").as("x"), col("lbl")), "x")
          .groupBy(col("v"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("v").as("id"))
          .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("best"))
          .select(col("id"), col("best.lbl").as("lbl")))
        labels = next
      }
      labels
    }

    // warmup
    graft.operators.Components.labelPropagation(pairs, "a", "b", 3).count()
    graft.core.CacheScope.drain()

    for (r <- 1 to reps) {
      println(s"--- pass $r ---")
      timeIt("edges_only") {
        val canon = graft.core.CacheScope.persist(pairs
          .select(least(col("a"), col("b")).cast("long").as("a"),
            greatest(col("a"), col("b")).cast("long").as("b"))
          .where(col("a") =!= col("b")).distinct())
        val n = canon.count()
        graft.core.CacheScope.drain(); n
      }
      for (rounds <- Seq(1, 3)) {
        timeIt(s"current_r$rounds") {
          val out = graft.operators.Components
            .labelPropagation(pairs, "a", "b", rounds)
          val n = out.count()
          graft.core.CacheScope.drain(); n
        }
      }
      timeIt("repart_r3") {
        val out = lpRepart(pairs, 3)
        val n = out.count()
        graft.core.CacheScope.drain(); n
      }
    }
    // equality proof: identical (id, lbl) multiset via order-free checksum
    val a = graft.operators.Components.labelPropagation(pairs, "a", "b", 3)
    val ca = checksum(a); val na = a.count()
    graft.core.CacheScope.drain()
    val b = lpRepart(pairs, 3)
    val cb = checksum(b); val nb = b.count()
    graft.core.CacheScope.drain()
    println(s"LP equal: rows $na==$nb ${na == nb}, checksum $ca==$cb ${ca == cb}")
    s.stop()
  }
}
