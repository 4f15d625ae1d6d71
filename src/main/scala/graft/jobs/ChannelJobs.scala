package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.core.TableRegistry
import graft.sources.{AuditLog, VersionedTable}

/** Job driver sequencing — the reference's `__main__` lifecycle
  * (`S1:1261-1304` = `/root/reference/PySpark_Scripts/
  * stage_1_hcp_channel_all_hardcode.py`):
  *
  *   audit INITIATED → nvs_tam → nvs_digital → catalog refresh → audit COMPLETED
  *
  * Each job materializes ONE DataFrame (persist → count → staging overwrite →
  * versioned append, S1:185-222,1086-1125): the six digital views are lazy
  * plan aliases that Catalyst inlines and optimizes as a whole — only the
  * final union is ever executed (SURVEY §3). We add the `unpersist` the
  * reference leaks (SURVEY §4, harmless there, correct here).
  *
  * Scale notes: the persist covers exactly two actions (count + write) per
  * job; `coalesce(8)` mirrors the reference's output-file sizing — at real
  * scale pass `outputFiles` sized to ~128MB-1GB per file. The versioned
  * append touches only the new `version=` partition directory.
  */
object ChannelJobs {

  final case class JobConfig(
      outDir: String,
      script: String = "stage_1_channel_all",
      layer: String = "normalized",
      batchId: String = "b1",
      outputFiles: Int = 8)

  final case class TableWrite(table: String, rows: Long, version: Long)

  /** persist → count → overwrite staging → versioned historical append
    * (S1:185-222 for tam, S1:1086-1125 for digital). */
  def materialize(s: SparkSession, df: DataFrame, table: String,
      cfg: JobConfig): TableWrite = {
    val persisted = df.persist()
    try {
      val n = persisted.count() // ACTION 1 — executes + caches (S1:188)
      persisted.coalesce(cfg.outputFiles)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"${cfg.outDir}/${table}_staging") // ACTION 2, from cache (S1:191)
      val hist = new VersionedTable(s, s"${cfg.outDir}/${table}_historical",
        cfg.outputFiles)
      val v = hist.snapshot(persisted) // max(version)+1 append (S1:208-222)
      TableWrite(table, n, v)
    } finally {
      persisted.unpersist()
      // materialize runs the job's terminal actions, so it is the session
      // owner in the CacheScope contract: release operator-internal persists
      // (NvsPipeline's allHcp union) here, or a rerun re-persisting the
      // identical plan trips CacheManager's "already cached" plan-match
      graft.core.CacheScope.drain()
    }
  }

  /** `nvs_tam` (S1:93-225). */
  def runTam(s: SparkSession, cfg: JobConfig): TableWrite =
    materialize(s, NvsPipeline.tamCe(s), "tam_nvs", cfg)

  /** `nvs_digital` (S1:227-1128): six lazy views, one materialized union. */
  def runDigital(s: SparkSession, cfg: JobConfig): TableWrite =
    materialize(s, NvsPipeline.combined(s), "digital_nvs", cfg)

  /** Full driver sequence (S1:1279-1304). `registry.refresh` stands in for the
    * Glue crawler (M-6): re-reads written parquet footers so downstream
    * consumers see the new tables through the catalog. */
  def run(s: SparkSession, cfg: JobConfig,
      registry: Option[TableRegistry] = None): Seq[TableWrite] = {
    val auditPath = s"${cfg.outDir}/audit_log"
    val start = new java.sql.Timestamp(System.currentTimeMillis()).toString
    AuditLog.initiated(s, auditPath, cfg.script, cfg.layer, cfg.batchId, start)

    val writes = Seq(runTam(s, cfg), runDigital(s, cfg))

    registry.foreach { r =>
      r.register("tam_nvs_staging", s"${cfg.outDir}/tam_nvs_staging")
      r.register("digital_nvs_staging", s"${cfg.outDir}/digital_nvs_staging")
    }
    AuditLog.completed(s, auditPath, writes.map(w => w.table -> w.rows),
      cfg.script, cfg.layer, cfg.batchId, start)
    writes
  }
}
