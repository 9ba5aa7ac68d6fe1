package graft.streaming

import graft.SparkSpec
import graft.sources.Versioned
import org.apache.spark.sql.functions._

/** Streaming materialized-view maintenance from the stored change
  * feed: mirror + grouped aggregate stay equal to a from-scratch
  * computation across inserts/updates/deletes, vanished groups leave
  * the aggregate, non-invertible aggregates (max) stay exact, and a
  * replayed batch converges (exactly-once via the manifest ledger). */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_mv").toString

  test("CDF-fed aggregate equals from-scratch across the lifecycle; replay converges") {
    val source = tmp(); val mirror = tmp() + "/m"; val agg = tmp() + "/a"
    val ckpt = tmp() + "/c"
    Versioned.commit(
      Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L))
        .toDF("k", "grp", "amt"), source, overwrite = false)
    Versioned.commit(Versioned.read(spark, source, Some(0)).limit(0),
      mirror, overwrite = false)
    val aggs = Seq[(String, org.apache.spark.sql.Column)](
      ("sum_amt", sum(col("amt"))), ("max_amt", max(col("amt"))))
    def feed() = Versioned.readChangeStream(spark, source)
      .drop("_commit_version")
      .withColumnRenamed("_change_type", "change_type")
    val q = MaterializedAgg.start(feed(), Seq("k"), Seq("grp"), aggs,
      mirror, agg, appId = "mv1", ckpt)
    try {
      q.processAllAvailable()
      assert(Versioned.read(spark, agg)
        .select("grp", "n_rows", "sum_amt", "max_amt")
        .as[(String, Long, Long, Long)].collect().toSet ==
        Set(("g1", 2L, 30L, 20L), ("g2", 1L, 30L, 30L)))
      // v1: update k=2 (g1 sum changes), insert k=4 into a NEW group,
      // delete k=3 — g2 must VANISH from the aggregate
      Versioned.applyChangeFeed(spark, source,
        Seq((2L, "g1", 25L, "update"), (4L, "g3", 40L, "insert"),
          (3L, "g2", 0L, "delete"))
          .toDF("k", "grp", "amt", "change_type"), Seq("k"))
      q.processAllAvailable()
      val got = Versioned.read(spark, agg)
        .select("grp", "n_rows", "sum_amt", "max_amt")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == Set(("g1", 2L, 35L, 25L), ("g3", 1L, 40L, 40L)), got)
      // the aggregate equals a from-scratch computation over the head
      val scratch = Versioned.read(spark, source).groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum("amt").as("sum_amt"),
          max("amt").as("max_amt"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == scratch)
      // mirror is the keyed head
      assert(Versioned.read(spark, mirror).as[(Long, String, Long)]
        .collect().toSet == Versioned.read(spark, source)
        .as[(Long, String, Long)].collect().toSet)
    } finally q.stop()
    // crash-replay: re-apply the last batch with the SAME batchId —
    // the mirror merge dedupes on its txn token and the recompute
    // re-derives identical rows; nothing changes
    val aggHead = Versioned.latestVersion(agg)
    val replay = Versioned.readChanges(spark, source, 1, 1)
      .drop("_commit_version")
      .withColumnRenamed("_change_type", "change_type")
    MaterializedAgg.applyBatch(replay, Seq("k"), Seq("grp"), aggs,
      mirror, agg, appId = "mv1", batchId = 1L)
    assert(Versioned.read(spark, agg)
      .select("grp", "n_rows", "sum_amt", "max_amt")
      .as[(String, Long, Long, Long)].collect().toSet ==
      Set(("g1", 2L, 35L, 25L), ("g3", 1L, 40L, 40L)))
    assert(Versioned.latestVersion(agg) == aggHead,
      "replayed batch must not publish new aggregate versions")
  }
}
