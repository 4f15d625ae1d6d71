package graft.tools

/** Dev tool: quantify the guide-§1.4 measurement gap between the bench's
  * historical timed action (`.count()`, which lets the optimizer prune
  * columns and terminal sorts) and the noop sink (computes every column of
  * every row). One JVM, discarded warmup per query, `reps` timed passes of
  * each action interleaved; the action ORDER ALTERNATES per pass (count
  * first on odd passes, noop first on even — r17 ADVICE: a fixed order
  * systematically warms page cache/JIT for whichever action runs second,
  * biasing the reported ratio; alternation cancels the effect across reps).
  * `scripts/jrun.sh graft.tools.NoopProbe q1,q2,... [sfDir] [reps]`. */
object NoopProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val q = graft.QueryCatalog.all.find(_.name == name)
        .getOrElse(sys.error(s"no such query: $name"))
      q.run(s, sfDir).count() // warmup
      graft.core.CacheScope.drain()
      def timeAction(f: => Unit): Double = {
        val t0 = System.nanoTime()
        f
        val t = (System.nanoTime() - t0) / 1e9
        graft.core.CacheScope.drain()
        t
      }
      (1 to reps).foreach { r =>
        val countFirst = r % 2 == 1
        def runCount(): Double = timeAction { q.run(s, sfDir).count(); () }
        def runNoop(): Double = timeAction {
          q.run(s, sfDir).write.format("noop").mode("overwrite").save()
        }
        val (tCount, tNoop) =
          if (countFirst) { val c = runCount(); (c, runNoop()) }
          else { val n = runNoop(); (runCount(), n) }
        val order = if (countFirst) "count-first" else "noop-first"
        println(f"NOOP $name pass$r count=$tCount%.3f s noop=$tNoop%.3f s " +
          f"ratio=${tNoop / tCount}%.2f ($order)")
      }
    }
    s.stop()
  }
}
