package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the second-decade scale audit (BASELINE.md "100× spot check",
  * widened per round-11 verdict item 2). For each named catalog query and
  * each data directory, runs one discarded warmup then `reps` timed passes
  * and prints a `SCALEAUDIT <query> <dir> <median_s> <rows>` line; the
  * 10×→100× ratio of those medians is the second-decade factor BASELINE.md
  * records. One JVM per DIRECTORY (not per query) keeps session startup out
  * of the numbers while `CacheScope.drain()` between queries keeps every
  * timed pass cold, matching Bench methodology.
  *
  * Usage: `ScaleAudit q01_group_sum,q17_week_to_month <dir> [reps]` */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = graft.QueryCatalog.all.find(_.name == name)
        .getOrElse(sys.error(s"no such query: $name"))
      var rows = 0L
      rows = q.run(spark, dir).count() // discarded warmup
      graft.core.CacheScope.drain()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = q.run(spark, dir).count()
        graft.core.CacheScope.drain()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = times(times.size / 2)
      println(f"SCALEAUDIT $name $dir $median%.2f s ($rows rows) all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
