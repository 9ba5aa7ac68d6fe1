package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The partitioned-lake write path: hive-layout partitioning must
  * prune at the directory level (PartitionFilters, zero data IO for
  * excluded days), dynamic overwrite must touch only the partitions
  * being refreshed, and the one-file-per-partition routing must hold.
  * This is the 100 TB storage contract — a day-ranged query over a
  * year of data reads 1/365th of the files, before any row group
  * statistics are even consulted. */
class PartitionedLakeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("lake").toString + "/events"

  private def eventsByDay = Tables(spark, dir, "events")
    .withColumn("day", to_date(col("ts")))

  test("partition-filtered reads list only the matching directories") {
    val path = freshPath()
    Export.partitionedParquet(eventsByDay, path, Seq("day"))
    val someDay = eventsByDay.select(min(col("day"))).head().getDate(0)

    val read = spark.read.parquet(path).filter(col("day") === lit(someDay))
    // the plan prunes via PartitionFilters, not a post-scan Filter
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no PartitionFilters:\n$plan")

    // parity: partitioned round-trip loses no rows (collect() runs
    // THIS Dataset's plan, so its scan metrics fill in — count()
    // would execute a separate aggregate plan)
    val expected = eventsByDay.filter(col("day") === lit(someDay)).count()
    assert(read.collect().length == expected)

    // and the EXECUTED scan touched exactly one partition directory
    // (inputFiles reflects the unpruned relation — the scan metrics
    // are the pruning ground truth)
    val scan = read.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metrics("numFiles").value == 1,
      s"pruned scan read ${scan.metrics("numFiles").value} files")
  }

  test("dynamic partition overwrite refreshes only the loaded day") {
    val path = freshPath()
    Export.partitionedParquet(eventsByDay, path, Seq("day"))
    val days = eventsByDay.select(col("day")).distinct()
      .orderBy("day").collect().map(_.getDate(0))
    assert(days.length >= 2, "need two days for the refresh test")
    val (keep, refresh) = (days.head, days.last)

    val before = spark.read.parquet(path)
      .filter(col("day") === lit(keep)).count()

    // refreshed day: the same rows re-tagged so the change is visible
    val patch = eventsByDay.filter(col("day") === lit(refresh))
      .withColumn("event_type", lit("reloaded"))
    Export.overwritePartitions(patch, path, Seq("day"))

    val after = spark.read.parquet(path)
    assert(after.filter(col("day") === lit(keep)).count() == before,
      "untouched partition changed under dynamic overwrite")
    val refreshed = after.filter(col("day") === lit(refresh))
    assert(refreshed.count() > 0)
    assert(refreshed.filter(col("event_type") =!= "reloaded").count() == 0,
      "refreshed partition still carries pre-overwrite rows")
  }

  test("compact rewrites a fragmented directory into few files, same rows") {
    val path = freshPath()
    val df = Tables(spark, dir, "events")
    df.repartition(40).write.mode("overwrite").parquet(path)
    val before = spark.read.parquet(path)
    val rows = before.count()
    assert(before.inputFiles.length >= 40)
    Export.compact(spark, path) // default 128 MB target → 1 file here
    val after = spark.read.parquet(path)
    assert(after.inputFiles.length == 1,
      s"expected 1 compacted file, got ${after.inputFiles.length}")
    assert(after.count() == rows)
    assert(new java.io.File(path + "__compact_tmp").exists() == false &&
      new java.io.File(path + "__compact_old").exists() == false)
  }

  test("partition routing writes one file per partition, re-split only when oversized") {
    val path = freshPath()
    Export.partitionedParquet(eventsByDay, path, Seq("day"))
    val perDir = spark.read.parquet(path).inputFiles
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDir.values.forall(_.length == 1),
      s"a partition has multiple files despite fitting maxRecordsPerFile")

    val tiny = freshPath()
    Export.partitionedParquet(eventsByDay, tiny, Seq("day"),
      maxRecordsPerFile = 10L)
    val perDirTiny = spark.read.parquet(tiny).inputFiles
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDirTiny.values.exists(_.length > 1),
      "maxRecordsPerFile=10 should split the larger day partitions")
  }
}
