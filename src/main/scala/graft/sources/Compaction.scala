package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for a parquet table directory — the operational
  * counterpart of the streaming sinks: micro-batch appends and per-version
  * snapshots accumulate file counts that degrade every later scan (driver
  * file-listing time, task-per-file scheduling, row-group fragmentation).
  * Compaction rewrites the table at a target bytes-per-file with an atomic
  * directory swap.
  *
  * Greenfield machinery (the reference's nearest analog is its fixed
  * `coalesce(8)` before every write, S1:191/222 — a file-COUNT knob that
  * ignores data size; this sizes from measured bytes).
  *
  * Scale notes: target partition count = ceil(on-disk bytes / targetBytes),
  * applied with `repartition` (even output files from a full shuffle —
  * `coalesce` would merge uneven neighbors and keep stragglers). The swap
  * is rename-based and single-writer (same posture as VersionedTable:
  * faithful to the reference's non-transactional layout; a table format
  * with commit protocol drops in without changing callers). Readers racing
  * the swap see the old or the new directory, never a mix, on POSIX
  * renames.
  */
object Compaction {

  /** On-disk parquet bytes under `path` (driver-side listing — the same
    * metadata walk every scan's planning already performs). */
  def tableBytes(spark: SparkSession, path: String): Long = {
    val fs = new java.io.File(path)
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else if (f.getName.endsWith(".parquet")) f.length()
      else 0L
    walk(fs)
  }

  def parquetFileCount(spark: SparkSession, path: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(path))
  }

  /** Rewrite `path` at `targetBytes` per output file. Returns
    * (filesBefore, filesAfter). The rewrite lands in `path__compact`, the
    * old directory moves to `path__old`, the new one renames into place,
    * and the old data is deleted last — crash windows leave either the
    * original or the finished table plus debris, never a partial table. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes > 0")
    val before = parquetFileCount(spark, path)
    val bytes = tableBytes(spark, path)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = path + "__compact"
    val old = path + "__old"
    spark.read.parquet(path).repartition(parts)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new java.io.File(path)
    val oldDir = new java.io.File(old)
    deleteRecursively(oldDir)
    require(dir.renameTo(oldDir), s"swap failed: $path -> $old")
    require(new java.io.File(tmp).renameTo(dir), s"swap failed: $tmp -> $path")
    deleteRecursively(oldDir)
    (before, parquetFileCount(spark, path))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
