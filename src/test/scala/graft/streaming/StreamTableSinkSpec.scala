package graft.streaming

import graft.SparkSpec
import graft.sources.{GraftCatalog, Versioned}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `writeStream.toTable` ([[StreamTableSink]]): streaming writes by
  * table NAME must be exactly-once (epoch txn tokens in the manifest
  * ledger), land through the guarded commit path (constraints and
  * races included), and honor output modes (append → append commits,
  * complete → per-epoch overwrite snapshots). */
class StreamTableSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String = java.nio.file.Files
    .createTempDirectory("graft_stsink").toString
  private var seq = 0
  private def freshCat(wh: String): String = {
    seq += 1
    val cat = s"gsink$seq"
    GraftCatalog.register(spark, cat, wh)
    cat
  }
  private def ckptDir(): String = java.nio.file.Files
    .createTempDirectory("graft_stsink_ckpt").toString

  test("toTable appends: one exactly-once commit per micro-batch, restart replays nothing") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    val path = s"$wh/sink"
    spark.sql(s"CREATE TABLE $cat.sink (id BIGINT, v STRING)")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val ckpt = ckptDir()
    def run(): Unit = {
      val q = src.toDS().toDF("id", "v").writeStream
        .option("checkpointLocation", ckpt)
        .toTable(s"$cat.sink")
      try q.processAllAvailable() finally q.stop()
    }
    src.addData((1L, "x"), (2L, "y"))
    run()
    assert(spark.sql(s"SELECT id, v FROM $cat.sink").as[(Long, String)]
      .collect().toSet == Set((1L, "x"), (2L, "y")))
    val head1 = Versioned.latestVersion(path)
    // the epoch landed with its stream token in the ledger — the
    // manifest log IS the sink's transaction log
    val txns = Versioned.history(spark, path)
      .select("txn").as[Option[String]].collect().flatten
    assert(txns.exists(_.startsWith("stream:")), s"no stream token: " +
      txns.mkString(", "))
    // second batch over the SAME checkpoint: appends once
    src.addData((3L, "z"))
    run()
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.sink")
      .head.getLong(0) == 3L)
    val head2 = Versioned.latestVersion(path)
    assert(head2 > head1)
    // restart with NOTHING new: no version churn (empty epochs skip)
    run()
    assert(Versioned.latestVersion(path) == head2)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.sink")
      .head.getLong(0) == 3L)
    // the per-query stage dir is cleaned after every commit
    val stage = new java.io.File(s"$path/.stream_stage")
    assert(!stage.exists() ||
      stage.listFiles().forall(_.listFiles().isEmpty),
      "stage dirs must not accumulate")
  }

  test("streaming commits pass through the engine guards: a CHECK constraint fails the epoch") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    val path = s"$wh/gated"
    spark.sql(s"CREATE TABLE $cat.gated (id BIGINT, v STRING)")
    Versioned.addConstraint(spark, path, "id >= 0")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData((-1L, "bad"))
    val q = src.toDS().toDF("id", "v").writeStream
      .option("checkpointLocation", ckptDir())
      .toTable(s"$cat.gated")
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop() }
    assert(Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).exists(t =>
        String.valueOf(t.getMessage).contains("constraint")),
      s"constraint violation must surface: ${e.getMessage}")
    // nothing published: head is still the add_constraint metadata
    // commit (v0 create, v1 constraint) — the epoch never landed
    assert(Versioned.latestVersion(path) == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.gated")
      .head.getLong(0) == 0L)
  }

  test("streaming epochs honor the table's PARTITIONED BY policy: hive layout, pruning intact") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    val path = s"$wh/part"
    spark.sql(s"CREATE TABLE $cat.part (id BIGINT, d STRING) " +
      "PARTITIONED BY (d)")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "a"), (2L, "b"), (3L, "a"))
    val q = src.toDS().toDF("id", "d").writeStream
      .option("checkpointLocation", ckptDir())
      .toTable(s"$cat.part")
    try q.processAllAvailable() finally q.stop()
    val head = Versioned.latestVersion(path)
    // the epoch's dir carries the partition spec (hive layout)
    assert(Versioned.partSpecIds(path, head).nonEmpty,
      "streamed epoch must land under the declared partition policy")
    // an equality on the partition column prunes whole dirs under SQL
    GraftCatalog.lastVersionedScan.set(("", -1, -1))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.part " +
      "WHERE d = 'a'").head.getLong(0) == 2L)
    val (p, read, tot) = GraftCatalog.lastVersionedScan.get()
    assert(p == path && read < tot,
      s"partition pruning must engage on streamed dirs ($read/$tot)")
  }

  test("complete mode materializes a streaming aggregate as per-trigger overwrite snapshots") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    val path = s"$wh/agg"
    spark.sql(s"CREATE TABLE $cat.agg (v STRING, n BIGINT)")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[String]
    val ckpt = ckptDir()
    def run(): Unit = {
      val q = src.toDS().toDF("v").groupBy("v")
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .toTable(s"$cat.agg")
      try q.processAllAvailable() finally q.stop()
    }
    src.addData("a", "a", "b")
    run()
    assert(spark.sql(s"SELECT v, n FROM $cat.agg").as[(String, Long)]
      .collect().toSet == Set(("a", 2L), ("b", 1L)))
    src.addData("a", "c")
    run()
    // head REPLACED (overwrite per epoch), totals cumulative
    assert(spark.sql(s"SELECT v, n FROM $cat.agg").as[(String, Long)]
      .collect().toSet == Set(("a", 3L), ("b", 1L), ("c", 1L)))
    // earlier trigger's snapshot still time-travels
    val head = Versioned.latestVersion(path)
    val modes = Versioned.history(spark, path)
      .filter(col("version") > 0).select("mode").as[String]
      .collect().toSet
    assert(modes == Set("overwrite"), s"complete-mode epochs must " +
      s"overwrite, got $modes")
    assert(Versioned.read(spark, path, Some(head - 1))
      .as[(String, Long)].collect().toSet ==
      Set(("a", 2L), ("b", 1L)))
  }
}
