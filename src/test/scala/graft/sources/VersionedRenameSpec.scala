package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RENAME COLUMN through name-mode column mapping
  * ([[Versioned.renameColumn]], Manifest.colMap): physical names are
  * immutable, logical names are metadata — so renames move zero
  * bytes, old files read under the new name, time travel shows each
  * version's own name, drop-then-re-add yields nulls (never
  * resurrected bytes), and the change feed crosses a rename
  * exactly-once. */
class VersionedRenameSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String = java.nio.file.Files
    .createTempDirectory("graft_vrename").toString

  test("rename: old files read under the new name; time travel keeps each version's own name") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "v", "amt"), path, overwrite = false) // v0
    val v1 = Versioned.renameColumn(path, "amt", "amount")
    assert(v1 == 1)
    // head: new name, OLD files' values visible under it (zero rewrite)
    val head = Versioned.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "v", "amount"))
    assert(head.select("k", "amount").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
    // time travel below the rename: the OLD name
    assert(Versioned.read(spark, path, Some(0)).columns.toSeq ==
      Seq("k", "v", "amt"))
    // appends AFTER the rename arrive under the new logical name and
    // mix with pre-rename files in one snapshot
    Versioned.commit(Seq((3L, "c", 30L)).toDF("k", "v", "amount"),
      path, overwrite = false)
    assert(Versioned.read(spark, path)
      .agg(sum("amount")).head.getLong(0) == 60L)
    // rename AGAIN: a → b → c chains through the same physical name
    Versioned.renameColumn(path, "amount", "amt_usd")
    assert(Versioned.read(spark, path)
      .select("k", "amt_usd").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("rename guards: missing column, collision, reserved, constraint reference") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 10L)).toDF("k", "v", "amt"),
      path, overwrite = false)
    Versioned.addConstraint(spark, path, "amt > 0")
    intercept[RuntimeException](
      Versioned.renameColumn(path, "nope", "x"))
    intercept[Exception](
      Versioned.renameColumn(path, "v", "AMT")) // folded collision
    intercept[Exception](
      Versioned.renameColumn(path, "v", "__dv_rel")) // reserved
    intercept[RuntimeException](
      Versioned.renameColumn(path, "amt", "amount")) // in constraint
    // a rename of an untouched column still lands
    assert(Versioned.renameColumn(path, "v", "val") == 2)
  }

  test("drop-then-re-add yields nulls, not resurrected bytes; rename composes") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 7L)).toDF("k", "v", "x"),
      path, overwrite = false) // v0: x=7 in file bytes
    Versioned.dropColumn(path, "x") // v1
    Versioned.commit(Seq((2L, "b", 99L)).toDF("k", "v", "x"),
      path, overwrite = false) // v2: reborn x, fresh physical
    val rows = Versioned.read(spark, path)
      .select("k", "x").as[(Long, Option[Long])].collect().toMap
    assert(rows(2L).contains(99L) && rows(1L).isEmpty,
      s"ghost column: $rows")
    // renaming the reborn column keeps its fresh physical binding
    Versioned.renameColumn(path, "x", "y")
    val rows2 = Versioned.read(spark, path)
      .select("k", "y").as[(Long, Option[Long])].collect().toMap
    assert(rows2(2L).contains(99L) && rows2(1L).isEmpty)
    // and v0 time travel still shows the ORIGINAL x bytes
    assert(Versioned.read(spark, path, Some(0))
      .select("x").as[Long].collect().toSeq == Seq(7L))
  }

  test("renamed partition column: pruned reads keep skipping (physical dirs unchanged)") {
    val path = tmpTable()
    Versioned.commitPartitioned(
      Seq((1L, "p1"), (2L, "p2"), (3L, "p1")).toDF("k", "p"),
      path, "p", overwrite = false)
    Versioned.renameColumn(path, "p", "part")
    val (df, read, total) = Versioned.readPartitionPruned(
      spark, path, "part", Seq("p1"))
    assert(df.columns.toSeq == Seq("k", "part"))
    assert(df.select("k").as[Long].collect().toSet == Set(1L, 3L))
    assert(read < total, s"no pruning: $read/$total")
    // appends under the renamed spec still prune with the old dirs
    Versioned.commitPartitioned(Seq((4L, "p1")).toDF("k", "part"),
      path, "part", overwrite = false)
    val (df2, r2, t2) = Versioned.readPartitionPruned(
      spark, path, "part", Seq("p1"))
    assert(df2.select("k").as[Long].collect().toSet == Set(1L, 3L, 4L))
    assert(r2 < t2)
  }

  test("rename composes with deletion vectors and clustered stats skipping") {
    val path = tmpTable()
    Versioned.commitClustered((1L to 100L).map(i => (i, i * 2))
      .toDF("a", "b"), path, "a", "b", files = 4, overwrite = false)
    Versioned.deleteWhereDV(spark, path, col("a") === 5L)
    Versioned.renameColumn(path, "a", "key")
    // DV mask still applies under the new name
    val keys = Versioned.read(spark, path).select("key")
      .as[Long].collect().toSet
    assert(!keys.contains(5L) && keys.size == 99)
    // range-clustered read prunes by the NEW logical name (stats
    // sidecars carry the physical one)
    val (df, kept, total) = Versioned.readRangeClustered(
      spark, path, "key", 10, 20)
    assert(df.columns.toSeq == Seq("key", "b"))
    assert(df.select("key").as[Long].collect().toSet ==
      (10L to 20L).toSet)
    assert(kept < total, s"no file skipping: $kept/$total")
  }

  test("restore across a rename: the rolled-back head carries its own names and mapping") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, 10L)).toDF("k", "amt"), path,
      overwrite = false) // v0: names (k, amt)
    Versioned.renameColumn(path, "amt", "amount") // v1
    Versioned.commit(Seq((2L, 20L)).toDF("k", "amount"), path,
      overwrite = false) // v2: files under the SAME physical 'amt'
    // RESTORE to v0: the head is v0's content AND v0's names again
    val v3 = Versioned.restore(path, 0)
    val head = Versioned.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "amt"))
    assert(head.as[(Long, Long)].collect().toSeq == Seq((1L, 10L)))
    // appends against the restored head use the restored mapping —
    // the old logical name is live again
    Versioned.commit(Seq((3L, 30L)).toDF("k", "amt"), path,
      overwrite = false)
    assert(Versioned.read(spark, path).agg(sum("amt"))
      .head.getLong(0) == 40L)
    // the renamed era still time-travels under ITS names
    assert(Versioned.read(spark, path, Some(2)).columns.toSeq ==
      Seq("k", "amount"))
    assert(Versioned.read(spark, path, Some(2)).agg(sum("amount"))
      .head.getLong(0) == 30L)
    // and renaming AGAIN after the restore keeps working
    Versioned.renameColumn(path, "amt", "value")
    assert(Versioned.read(spark, path).agg(sum("value"))
      .head.getLong(0) == 40L)
    assert(v3 == 3)
  }

  test("change feed crosses a rename exactly-once (checkpointed subscriber)") {
    val path = tmpTable()
    val mirror = java.nio.file.Files
      .createTempDirectory("graft_vrename_mirror").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_vrename_ckpt").toString
    Versioned.commit(Seq((1L, 10L)).toDF("k", "x"), path,
      overwrite = false) // v0
    // subscriber pass 1: consume v0 under the ORIGINAL names
    def drainOnce(): Unit = {
      val q = Versioned.readChangeStream(spark, path)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", mirror).start()
      try q.processAllAvailable() finally q.stop()
    }
    drainOnce()
    val pass1 = spark.read.parquet(mirror)
    assert(pass1.columns.contains("x") && pass1.count() == 1)
    // rename + new append, then the SAME checkpoint resumes: only the
    // new rows arrive (exactly-once), under a schema whose physical
    // file layout never changed
    Versioned.renameColumn(path, "x", "y") // v1 (meta: empty feed)
    Versioned.commit(Seq((2L, 20L)).toDF("k", "y"), path,
      overwrite = false) // v2
    drainOnce()
    // exactly-once across the rename: 2 rows total (v0 once, v2 once,
    // the meta commit's empty feed contributing nothing, no replays)
    assert(spark.read.parquet(mirror).count() == 2)
    assert(spark.read.parquet(mirror).select("k")
      .as[Long].collect().toSet == Set(1L, 2L))
    // a FRESH subscriber reads the whole feed under the NEW name
    val fresh = Versioned.readChanges(spark, path, 0, 2)
    assert(fresh.columns.contains("y") && !fresh.columns.contains("x"))
    assert(fresh.select("k", "y").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
  }

  test("historical feed reads survive an OVERWRITE after a rename (era-free physical names)") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, 10L)).toDF("k", "amt"), path,
      overwrite = false) // v0: physical name 'amt'
    Versioned.renameColumn(path, "amt", "amount") // v1: colMap amount->amt
    Versioned.commit(Seq((2L, 20L)).toDF("k", "amount"), path,
      overwrite = false) // v2: feed files still carry physical 'amt'
    // the OVERWRITE resets the data chain but must NOT reset the
    // physical-name continuity: pre-overwrite feed dirs carry 'amt',
    // and the head schema must keep reading them as 'amount'
    Versioned.commit(Seq((9L, 90L)).toDF("k", "amount"), path,
      overwrite = true) // v3
    val below = Versioned.readChanges(spark, path, 0, 2)
      .filter(col("_change_type") === "insert")
      .select("k", "amount").as[(Long, Long)].collect().toSet
    // the regression this guards: v0/v2 rows null-filling 'amount'
    assert(below == Set((1L, 10L), (2L, 20L)),
      s"historical feed lost renamed-column values: $below")
    // and the post-overwrite append keeps composing
    Versioned.commit(Seq((10L, 100L)).toDF("k", "amount"), path,
      overwrite = false) // v4
    assert(Versioned.readChanges(spark, path, 4, 4)
      .select("k", "amount").as[(Long, Long)].collect().toSet ==
      Set((10L, 100L)))
  }

  test("a column dropped before an OVERWRITE cannot haunt the feed when re-added after it") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, 7L)).toDF("k", "x"), path,
      overwrite = false) // v0: feed files carry x=7 bytes
    Versioned.dropColumn(path, "x") // v1: tombstone 'x'
    // overwrite WITHOUT x: tombstones must survive the overwrite —
    // the feed dirs of the old era still carry 'x' bytes
    Versioned.commit(Seq(Tuple1(2L)).toDF("k"), path,
      overwrite = true) // v2
    Versioned.addColumn(path, "x", "BIGINT") // v3: must get a FRESH physical
    Versioned.commit(Seq((3L, 33L)).toDF("k", "x"), path,
      overwrite = false) // v4
    // v0's feed rows must show x = NULL under the head schema (the
    // reborn column never existed for them) — not the old 7
    val birth = Versioned.readChanges(spark, path, 0, 0)
      .select("k", "x").as[(Long, Option[Long])].collect().toSet
    assert(birth == Set((1L, None)),
      s"dropped bytes resurrected through the feed: $birth")
    assert(Versioned.readChanges(spark, path, 4, 4)
      .select("k", "x").as[(Long, Option[Long])].collect().toSet ==
      Set((3L, Some(33L))))
  }
}
