package graft.core

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.VersionedTable

/** Direct specs for the core/io layer (the jobs exercise these indirectly;
  * these pin the contracts). */
class TableRegistrySpec extends SparkSpec {

  test("register/table/refresh/listing contract") {
    val reg = TableRegistry.forDir(spark, sfDir)
    assert(TableRegistry.testTables.forall(reg.contains))
    assert(reg.table("nation").count() > 0)
    // listing probe (the Athena list_table_metadata stand-in)
    assert(reg.tablesMatching("ation") == Seq("nation"))
    // refresh re-reads the footer and re-registers the same data
    val before = reg.table("region").count()
    assert(reg.refresh("region").count() == before)
    intercept[RuntimeException](reg.refresh("no_such_table"))
  }
}

class VersionedTableSpec extends SparkSpec {

  test("empty → v1 → v2; latest and at() read single snapshots") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_vt").toString + "/t"
    val vt = new VersionedTable(spark, path, outputFiles = 1)
    assert(vt.latestVersion.isEmpty)
    assert(vt.latest.isEmpty)

    assert(vt.snapshot(Seq((1, "a"), (2, "b")).toDF("id", "v")) == 1L)
    assert(vt.snapshot(Seq((1, "a2"), (2, "b2"), (3, "c")).toDF("id", "v")) == 2L)
    assert(vt.latestVersion.contains(2L))
    assert(vt.latest.count() == 3)
    assert(vt.at(1).count() == 2)
    // snapshots are whole-table copies, not deltas
    assert(spark.read.parquet(path).count() == 5)
    // version is a partition column → the at() scan prunes to one directory
    val plan = vt.at(1).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("version"))
  }
}

class SessionsSpec extends SparkSpec {

  test("session carries the semantics the port depends on") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    // nanos-as-long makes events readable (would throw without it)
    val ev = graft.core.EventTs.toNanos(spark.read.parquet(s"$sfDir/events.parquet"))
    assert(ev.schema("ts").dataType.typeName == "long")
    assert(ev.count() > 0)
  }

  test("EventTs.toNanos folds both physical ts encodings to the same nanos") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a long-ns frame passes through untouched
    val asLong = Seq((1L, 1700000000123456000L)).toDF("event_id", "ts")
    assert(graft.core.EventTs.toNanos(asLong).collect()
      .map(_.getLong(1)).toSeq == Seq(1700000000123456000L))
    // the same instant as TIMESTAMP (µs precision) folds to identical nanos
    val asTs = asLong.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    assert(asTs.schema("ts").dataType.typeName == "timestamp")
    assert(graft.core.EventTs.toNanos(asTs).collect()
      .map(_.getLong(1)).toSeq == Seq(1700000000123456000L))
    // frames without a ts column are untouched
    val noTs = Seq((1L, "x")).toDF("event_id", "payload")
    assert(graft.core.EventTs.toNanos(noTs).schema.fieldNames.toSeq ==
      Seq("event_id", "payload"))
  }
}
