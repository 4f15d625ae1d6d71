package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.TableRegistry
import graft.sources.AuditLog

/** End-to-end driver sequence over the fixtures: staging overwrite, versioned
  * historical append with monotone versions, audit INITIATED/COMPLETED rows
  * (S1:1261-1304 lifecycle). */
class ChannelJobsSpec extends SparkSpec {

  test("full run: staging + historical + audit; reruns bump the version") {
    NvsFixtures.registerAll(spark)
    val dir = Files.createTempDirectory("graft_jobs").toString
    val cfg = ChannelJobs.JobConfig(outDir = dir, batchId = "t1")
    val registry = new TableRegistry(spark)

    val w1 = ChannelJobs.run(spark, cfg, Some(registry))
    assert(w1.map(_.table) == Seq("tam_nvs", "digital_nvs"))
    assert(w1.forall(_.version == 1L))
    assert(w1.forall(_.rows > 0))

    // staging readable through the refreshed registry, counts match
    assert(registry.table("tam_nvs_staging").count() == w1.head.rows)
    assert(registry.table("digital_nvs_staging").count() == w1(1).rows)
    assert(registry.tablesMatching("staging").size == 2)

    // second run: staging overwritten (same count), historical appends v2
    val w2 = ChannelJobs.run(spark, cfg.copy(batchId = "t2"), None)
    assert(w2.forall(_.version == 2L))
    val hist = spark.read.parquet(s"$dir/digital_nvs_historical")
    assert(hist.select("version").distinct().count() == 2)
    // each snapshot is the full table (append-only snapshots, not deltas)
    assert(hist.where(col("version") === 1).count() == w1(1).rows)
    assert(hist.where(col("version") === 2).count() == w2(1).rows)

    // audit trail: one INITIATED marker + one COMPLETED row per table, per run
    val audit = AuditLog.read(spark, s"$dir/audit_log")
    assert(audit.where(col("log_id_status") === "INITIATED").count() == 2)
    val completed = audit.where(col("log_id_status") === "COMPLETED")
    assert(completed.count() == 4)
    val counts = completed.where(col("batch_id") === "t1")
      .select("table_name", "rows_updated").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == w1.map(w => w.table -> w.rows).toMap)
  }
}
