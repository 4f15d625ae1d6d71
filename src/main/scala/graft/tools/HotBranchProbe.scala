package graft.tools

import org.apache.spark.sql.functions._

/** Volume probe for [[graft.operators.Dedup.boilerplateStrip]]'s hot-set
  * size guard: run the broadcast branch and the FORCED shuffle branch
  * (`maxBroadcastHot = 0`) over the same corpus and print wall times plus
  * an output checksum (doc count, Σ n_dropped, Σ kept_tokens) — the
  * at-volume companion to CurationOpsSpec's row-for-row equality spec.
  * The 40M-doc funnel runs never trip the guard (replica corpora add
  * occurrence volume, not distinct segments), so the degradation path's
  * cost and correctness at volume are only measurable by forcing it.
  *
  * Usage: `HotBranchProbe <docsDir> [maxDocFreq] [reps]` */
object HotBranchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mdf = args.lift(1).map(_.toLong).getOrElse(3L)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val s = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    Seq(("broadcast", 8000000L), ("shuffle", 0L)).foreach { case (name, cap) =>
      def pass(): (Long, Long, Long) = {
        val r = graft.operators.Dedup
          .boilerplateStrip(docs, "doc_id", "text", maxDocFreq = mdf,
            maxBroadcastHot = cap)
          .agg(count(lit(1)), sum("n_dropped"), sum("kept_tokens")).head()
        graft.core.CacheScope.drain()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      pass() // discarded warmup
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val sums = pass()
        val t = (System.nanoTime() - t0) / 1e9
        (t, sums)
      }
      val sums = walls.head._2
      println(f"PROBE $name%-9s min=${walls.map(_._1).min}%.2f s " +
        f"all=${walls.map(w => f"${w._1}%.2f").mkString(",")} " +
        s"docs=${sums._1} dropped=${sums._2} kept=${sums._3}")
      require(walls.map(_._2).distinct.size == 1, "pass checksums diverged")
    }
  }
}
