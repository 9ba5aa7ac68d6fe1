package graft.streaming

import graft.SparkSpec
import graft.sources.Versioned
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class VersionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("a replayed micro-batch commits exactly once (txn dedup)") {
    val path = java.nio.file.Files.createTempDirectory("vsink").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")

    val v0 = VersionedSink.commitBatch(b0, path, "app", batchId = 0)
    // crash-replay of batch 0: same appId + batchId → same version,
    // no new snapshot, no double rows
    val v0r = VersionedSink.commitBatch(b0, path, "app", batchId = 0)
    assert(v0 == v0r)
    assert(Versioned.latestVersion(path) == v0)
    val v1 = VersionedSink.commitBatch(b1, path, "app", batchId = 1)
    assert(v1 == v0 + 1)
    assert(Versioned.read(spark, path).count() == 3)
    // replays of BOTH batches after a restart: still 3 rows, head fixed
    VersionedSink.commitBatch(b0, path, "app", 0)
    VersionedSink.commitBatch(b1, path, "app", 1)
    assert(Versioned.latestVersion(path) == v1)
    assert(Versioned.read(spark, path).count() == 3)
    // a DIFFERENT app's batch 0 is a new transaction, not a replay
    val v2 = VersionedSink.commitBatch(b1, path, "other", 0)
    assert(v2 == v1 + 1)
  }

  test("streaming end-to-end: each micro-batch is one snapshot version") {
    val path = java.nio.file.Files.createTempDirectory("vsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vsinkc").toString
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "x"), (2L, "y"))
    src.addData((3L, "z"))
    val q = VersionedSink
      .versionedAppend(src.toDS().toDF("id", "v"), path, "e2e", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val head = Versioned.latestVersion(path)
    assert(head >= 0)
    assert(Versioned.read(spark, path).count() == 3)
    // every committed version is a readable snapshot (time travel
    // across micro-batch boundaries)
    (0 to head).foreach { v =>
      assert(Versioned.read(spark, path, Some(v)).count() <= 3)
    }
    // restarting the SAME pipeline over the same checkpoint replays
    // nothing new: head and rows unchanged
    val q2 = VersionedSink
      .versionedAppend(src.toDS().toDF("id", "v"), path, "e2e", ckpt)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(Versioned.latestVersion(path) == head)
    assert(Versioned.read(spark, path).count() == 3)
  }

  test("concurrent committers of the SAME txn collapse to one version") {
    // a zombie executor re-running a batch concurrently with its
    // replacement is the nastiest replay: both race the same token
    val path = java.nio.file.Files.createTempDirectory("vsink").toString
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val futures = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            gate.await()
            VersionedSink.commitBatch(batch, path, "app", batchId = 0)
          }
        })
      }
      gate.countDown()
      val versions = futures
        .map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // all four racers report the SAME committed version
      assert(versions.toSet.size == 1, s"split-brain txn: $versions")
    } finally pool.shutdownNow()
    assert(Versioned.latestVersion(path) == 0)
    assert(Versioned.read(spark, path).count() == 2)
  }

  test("txn manifests round-trip through vacuum and plain commits") {
    val path = java.nio.file.Files.createTempDirectory("vsink").toString
    VersionedSink.commitBatch(Seq((1L, "a")).toDF("id", "v"), path, "app", 0)
    // plain (txn-less) commits interleave fine with txn commits
    val v1 = Versioned.commit(Seq((2L, "b")).toDF("id", "v"), path,
      overwrite = false)
    VersionedSink.commitBatch(Seq((3L, "c")).toDF("id", "v"), path, "app", 1)
    assert(Versioned.read(spark, path).count() == 3)
    // vacuum to the head: the batch-0 txn manifest is gone, so a
    // very-late replay of batch 0 re-commits (the documented
    // beyond-retention contract) — rows grow, head advances
    val head = Versioned.latestVersion(path)
    Versioned.vacuum(path, head)
    val vNew = VersionedSink.commitBatch(
      Seq((1L, "a")).toDF("id", "v"), path, "app", 0)
    assert(vNew == head + 1)
    assert(v1 >= 0)
  }
}
