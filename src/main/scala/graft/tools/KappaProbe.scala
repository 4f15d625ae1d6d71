package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of q180 (rater kappa = lang-id heuristic vs
  * naive-Bayes labels + agreement aggregate) — q180 carries a ~2-4 s cost
  * already at the 1x tier, and the round-15 verdict asked WHAT fixed work
  * dominates before data scales (item 7). Times each sub-plan's action
  * separately: the heuristic labeler scan, the NB posterior chain (train +
  * score + argmax window), the join + confusion aggregate, then the whole
  * query. `scripts/jrun.sh graft.tools.KappaProbe [sfDir] [reps]`. */
object KappaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val s = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    s.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysis

    def timeIt(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"KAPPAPROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      graft.core.CacheScope.drain()
    }

    // warmup: full query once (codegen, scan metadata, JIT)
    graft.QueryCatalog.all.find(_.name == "q180_rater_kappa").get
      .run(s, sfDir).count()
    graft.core.CacheScope.drain()

    for (_ <- 1 to reps) {
      val d = graft.core.EventTs.toNanos(
        s.read.parquet(s"$sfDir/documents.parquet"))
      val heur = d.select(col("doc_id"),
        TextAnalysis.langIdGuess(col("text")).as("lang_heur"))
      timeIt("heur_scan")(heur.count())
      val nb = TextAnalysis.naiveBayesPredict(d, "doc_id", "text", "lang")
        .select(col("id").as("doc_id"), col("predicted"))
      timeIt("nb_chain")(nb.count())
      timeIt("join_agg") {
        graft.operators.DataChecks.raterAgreement(
          heur.join(nb, "doc_id"), col("lang_heur"), col("predicted"))
          .count()
      }
      timeIt("full_q180") {
        graft.QueryCatalog.all.find(_.name == "q180_rater_kappa").get
          .run(s, sfDir).count()
      }
    }
    s.stop()
  }
}
