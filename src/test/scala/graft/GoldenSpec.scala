package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.security.MessageDigest

/** Frozen-output regression gate: every catalog query's sf0.001 result is
  * canonicalized (rows rendered and sorted, so physical row order never
  * matters) and md5'd against a checked-in manifest. Catches unintended
  * semantic drift from `sbt test` alone — no DuckDB needed — between rounds.
  *
  * Intentional changes: regenerate with
  *   GRAFT_GOLDEN_REGEN=true sbt "testOnly graft.GoldenSpec"
  * (env var — tests run in a forked JVM that doesn't see sbt -D flags)
  * and commit the updated manifest alongside the change.
  */
class GoldenSpec extends SparkSpec {

  private val manifestPath = Paths.get("src/test/resources/golden/manifest.tsv")

  private def canonicalHash(name: String): String = {
    val df = QueryCatalog.all.find(_.name == name).get.run(spark, sfDir)
    val rendered = df.collect().map { row =>
      (0 until row.length).map { i =>
        if (row.isNullAt(i)) "\u0000" else String.valueOf(row.get(i))
      }.mkString("\u0001")
    }.sorted
    val md = MessageDigest.getInstance("MD5")
    rendered.foreach(r => md.update(r.getBytes("UTF-8")))
    md.update(df.columns.mkString(",").getBytes("UTF-8"))
    // owner-side drain per query: queries sharing persisted sub-plans
    // (q43/q49) would otherwise trip CacheManager plan-match collisions
    // inside this single test
    graft.core.CacheScope.drain()
    md.digest().map("%02x".format(_)).mkString
  }

  test("every catalog query matches its frozen sf0.001 output hash") {
    val regen = sys.env.get("GRAFT_GOLDEN_REGEN").contains("true")
    val names = QueryCatalog.all.map(_.name)
    val hashes = names.map(n => n -> canonicalHash(n))

    if (regen) {
      Files.createDirectories(manifestPath.getParent)
      Files.writeString(manifestPath,
        hashes.map { case (n, h) => s"$n\t$h" }.mkString("", "\n", "\n"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      info(s"regenerated ${hashes.size} golden hashes")
    } else {
      assert(Files.exists(manifestPath),
        "golden manifest missing — regenerate with GRAFT_GOLDEN_REGEN=true sbt \"testOnly graft.GoldenSpec\"")
      val want = Files.readAllLines(manifestPath).toArray(Array.empty[String])
        .filter(_.nonEmpty).map(_.split("\t")).map(a => a(0) -> a(1)).toMap
      val drifted = hashes.filter { case (n, h) => want.get(n).exists(_ != h) }
      assert(drifted.isEmpty,
        s"output drift in: ${drifted.map(_._1).mkString(", ")} — if intentional, " +
          "regenerate the manifest")
      val missing = hashes.collect { case (n, _) if !want.contains(n) => n }
      assert(missing.isEmpty,
        s"queries without goldens: ${missing.mkString(", ")} — regenerate the manifest")
    }
  }
}
