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

  test("EnvConfig: two-env INI selects by argument; missing section raises " +
      "the reference's error") {
    val ini = Files.createTempFile("graft_cfg", ".ini")
    Files.writeString(ini, """
      |# per-environment job configuration (S1:23-40,50-91 shape)
      |[dev]
      |out_dir = /tmp/graft_dev_out
      |batch_id = dev1
      |folder_names = {"normalized": "normalized_dev", "landing": "landing_dev"}
      |
      |[prod]
      |out_dir = /data/graft_prod_out
      |batch_id = prod1
      |output_files: 64
      |athena_database = {"normalized": "norm_db", "landing": "land_db"}
      |""".stripMargin)
    val cfg = EnvConfig.readConfigFile(ini.toString)
    // env is a runtime argument (getResolvedOptions shape), not compile-time
    val dev = EnvConfig.fromArgs(
      Array("--config", ini.toString, "--environment", "dev"))
    val prod = EnvConfig.fromArgs(
      Array("--config", ini.toString, "--environment", "prod"))
    assert(dev.outDir == "/tmp/graft_dev_out" && dev.batchId == "dev1")
    assert(dev.outputFiles == 8) // case-class default when the key is absent
    assert(prod.outDir == "/data/graft_prod_out" && prod.outputFiles == 64)
    // JSON-valued options sub-key-indexed like json.loads(...)['normalized']
    assert(cfg.getJson("dev", "folder_names", "normalized") == "normalized_dev")
    assert(cfg.getJson("prod", "athena_database", "landing") == "land_db")
    // check_config_section: message verbatim from S1:39-40
    val err = intercept[IllegalArgumentException] {
      EnvConfig.jobConfig(cfg, "staging")
    }
    assert(err.getMessage ==
      "Environment details doesn't exist in configuration file")
  }

  test("EnvConfig feeds a real run: the INI-selected env drives the job") {
    NvsFixtures.registerAll(spark)
    val dir = Files.createTempDirectory("graft_cfg_run").toString
    val ini = Files.createTempFile("graft_cfg_run", ".ini")
    Files.writeString(ini,
      s"[test]\nout_dir = $dir\nbatch_id = cfgrun\noutput_files = 2\n")
    val cfg = EnvConfig.fromArgs(
      Array("--config", ini.toString, "--environment", "test"))
    val writes = ChannelJobs.run(spark, cfg, None)
    assert(writes.map(_.table) == Seq("tam_nvs", "digital_nvs"))
    assert(writes.forall(_.rows > 0))
    assert(new java.io.File(s"$dir/tam_nvs_staging").exists())
  }

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
