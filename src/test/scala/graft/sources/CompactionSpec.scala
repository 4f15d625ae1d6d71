package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Compaction must preserve content exactly, cut the file count to the
  * byte-target arithmetic, and leave no swap debris behind. */
class CompactionSpec extends SparkSpec {

  private def fragmented(): String = {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(64)
      .write.parquet(dir)
    dir
  }

  test("compact: content identical, file count at the byte target, no debris") {
    val dir = fragmented()
    val before = spark.read.parquet(dir)
    val wantRows = before.count()
    val wantSum = before.agg(sum("l_quantity")).head.getDouble(0)
    val bytes = Compaction.tableBytes(spark, dir)

    val (nBefore, nAfter) = Compaction.compact(spark, dir,
      targetBytes = bytes / 4 + 1) // → exactly 4 output partitions
    assert(nBefore == 64)
    assert(nAfter == 4, s"expected 4 files, got $nAfter")

    val after = spark.read.parquet(dir)
    assert(after.count() == wantRows)
    assert(after.agg(sum("l_quantity")).head.getDouble(0) == wantSum)
    assert(after.schema == before.schema)
    // swap left neither the temp nor the old directory behind
    assert(!new java.io.File(dir + "__compact").exists())
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("compact: a table already under one target file stays one file") {
    val dir = fragmented()
    val (_, nAfter) = Compaction.compact(spark, dir,
      targetBytes = Long.MaxValue)
    assert(nAfter == 1)
    assert(spark.read.parquet(dir).count() ==
      spark.read.parquet(s"$sfDir/lineitem.parquet").count())
  }

  test("planBins: conservation, oversize singletons, bounded bin waste") {
    import org.apache.spark.sql.functions._
    val target = 1000L
    // deterministic mixed fixture: sizes cycle through small and oversize
    val files = spark.range(200).select(
      (col("id") % 7).cast("string").as("part_key"),
      col("id").as("file_id"),
      (col("id") * 137 % 1700 + 1).as("bytes"))
    val plan = Compaction.planBins(files, target).collect()
    // every input file appears exactly once, bytes unchanged
    assert(plan.length == 200)
    assert(plan.map(_.getLong(1)).sorted.toSeq == (0L until 200L))
    assert(plan.map(_.getLong(2)).sum ==
      files.agg(sum("bytes")).head.getLong(0))
    // oversize files (bytes >= target) are singleton negative bins
    val byBin = plan.groupBy(r => (r.getString(0), r.getLong(3)))
    byBin.foreach { case ((_, bin), rows) =>
      if (bin < 0) {
        assert(rows.length == 1 && rows.head.getLong(2) >= target)
      } else {
        // packed bins hold only small files and waste at most one file:
        // next-fit-by-offset keeps every bin under 2x target
        assert(rows.forall(_.getLong(2) < target))
        assert(rows.map(_.getLong(2)).sum < 2 * target,
          s"bin $bin exceeds the 2x bound")
      }
    }
    // packed bins are contiguous in file order within a partition
    plan.filter(_.getLong(3) >= 0).groupBy(_.getString(0)).foreach {
      case (_, rows) =>
        val ordered = rows.sortBy(_.getLong(1)).map(_.getLong(3))
        assert(ordered.sameElements(ordered.sorted),
          "bin ids must be nondecreasing in file order")
    }
  }
}
