package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution beyond column ADDS: lossless TYPE WIDENING
  * (byte→short→int→long, float→double — neither old nor new files
  * rewrite; the manifest adopts the widest type ever committed and
  * Spark 4's parquet readers upcast narrower file bytes under the
  * wider read schema) and DROP COLUMN as a metadata-only commit with
  * physical-name tombstones (re-adding a dropped name would let the
  * explicit-schema read resurrect the old files' bytes — the
  * ghost-column bug — so it fails loudly). */
class VersionedEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String = java.nio.file.Files
    .createTempDirectory("graft_vevolve").toString

  test("int→long widening: old int32 files read under the widened schema") {
    val path = tmpTable()
    // v0 writes k as INT (int32 parquet pages)
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"),
      path, overwrite = false)
    assert(Versioned.read(spark, path).schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // v1 appends k as LONG — accepted, manifest widens, v0's files stay
    Versioned.commit(Seq((3000000000L, "c")).toDF("k", "v"),
      path, overwrite = false)
    val head = Versioned.read(spark, path)
    assert(head.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(head.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3000000000L, "c")))
    // a NARROWER append after the widening is equally fine: its int32
    // file reads widened under the long manifest type
    Versioned.commit(Seq((4, "d")).toDF("k", "v"), path,
      overwrite = false)
    assert(Versioned.read(spark, path).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"),
        (3000000000L, "c"), (4L, "d")))
    // time travel at v0 still reads the ORIGINAL int type
    assert(Versioned.read(spark, path, Some(0)).schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("float→double widening; off-ladder drift still fails loudly") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, 1.5f)).toDF("k", "x"), path,
      overwrite = false)
    Versioned.commit(Seq((2L, 2.25)).toDF("k", "x"), path,
      overwrite = false)
    assert(Versioned.read(spark, path).as[(Long, Double)]
      .collect().toSet == Set((1L, 1.5), (2L, 2.25)))
    // long→int is NARROWING of the manifest type ONLY when the
    // manifest never saw the wide type — here x is DOUBLE; a string
    // arrival is plain corruption
    val err = intercept[RuntimeException] {
      Versioned.commit(Seq((3L, "nope")).toDF("k", "x"), path,
        overwrite = false)
    }
    assert(err.getMessage.contains("type drift"))
  }

  test("dropColumn hides the column at the head, keeps it in history, and tombstones the name") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "v", "secret"), path, overwrite = false)
    val v1 = Versioned.dropColumn(path, "secret")
    assert(v1 == 1)
    // head no longer shows the column; bytes did not move
    val head = Versioned.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "v"))
    assert(head.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // time travel still shows it (each version reads under its schema)
    assert(Versioned.read(spark, path, Some(0)).columns.toSeq ==
      Seq("k", "v", "secret"))
    // appends WITHOUT the column proceed normally
    Versioned.commit(Seq((3L, "c")).toDF("k", "v"), path,
      overwrite = false)
    assert(Versioned.read(spark, path).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // RE-ADDING the dropped name works — column mapping hands the
    // reborn column a FRESH physical name, so v0's files (which still
    // hold 10/20 under the old physical 'secret') null-fill it: the
    // ghost-column resurrection is structurally impossible
    Versioned.commit(Seq((4L, "d", 99L)).toDF("k", "v", "secret"),
      path, overwrite = false)
    val reborn = Versioned.read(spark, path)
      .select("k", "secret").as[(Long, Option[Long])].collect().toMap
    assert(reborn(4L).contains(99L))
    assert(reborn(1L).isEmpty && reborn(2L).isEmpty && reborn(3L).isEmpty,
      s"old files resurrected dropped bytes: $reborn")
    // an OVERWRITE resets the baseline (no old files left to haunt)
    Versioned.commit(Seq((9L, "z", 7L)).toDF("k", "v", "secret"),
      path, overwrite = true)
    assert(Versioned.read(spark, path).columns.toSeq ==
      Seq("k", "v", "secret"))
    assert(Versioned.read(spark, path).as[(Long, String, Long)]
      .collect().toSeq == Seq((9L, "z", 7L)))
  }

  test("tombstone and drift guards fold case (Spark resolves names case-insensitively)") {
    // committing 'SECRET' after dropColumn("secret") is the SAME
    // column under Spark's default case-insensitive resolution — the
    // fresh-physical assignment must fire for it too, or the
    // explicit-schema read would resurrect v0's bytes
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 10L)).toDF("k", "v", "secret"),
      path, overwrite = false)
    // drop may be spelled in ANY case; the tombstone records the
    // physical name
    Versioned.dropColumn(path, "SeCrEt")
    assert(Versioned.read(spark, path).columns.toSeq == Seq("k", "v"))
    Versioned.commit(Seq((2L, "b", 99L)).toDF("k", "v", "SECRET"),
      path, overwrite = false)
    val rows = Versioned.read(spark, path)
      .select("k", "SECRET").as[(Long, Option[Long])].collect().toMap
    assert(rows(2L).contains(99L))
    assert(rows(1L).isEmpty,
      s"re-cased re-add resurrected dropped bytes: $rows")
    // a re-cased arrival of a LIVE column is that column, not an add:
    // same-type append under a different spelling commits cleanly and
    // the manifest keeps ONE column
    val p2 = tmpTable()
    Versioned.commit(Seq((1L, 5L)).toDF("k", "x"), p2, overwrite = false)
    Versioned.commit(Seq((2L, 6L)).toDF("k", "X"), p2, overwrite = false)
    assert(Versioned.read(spark, p2).columns.map(_.toLowerCase).toSeq ==
      Seq("k", "x"))
    assert(Versioned.read(spark, p2).as[(Long, Long)].collect().toSet ==
      Set((1L, 5L), (2L, 6L)))
    // re-cased TYPE DRIFT is still drift, still loud
    val e2 = intercept[RuntimeException] {
      Versioned.commit(Seq((3L, "s")).toDF("k", "X"), p2,
        overwrite = false)
    }
    assert(e2.getMessage.contains("type drift"))
  }

  test("addColumn: metadata-only nullable add, null-fills history, fresh physical after a drop") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path,
      overwrite = false) // v0
    val v1 = Versioned.addColumn(path, "score", "BIGINT")
    assert(v1 == 1)
    // metadata-only: same single data dir, old row null-fills
    assert(Versioned.dataDirIds(path, v1).size == 1)
    val head = Versioned.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "v", "score"))
    assert(head.select("score").head.isNullAt(0))
    // data commits then populate it; time travel below the add
    // never shows it
    Versioned.commit(Seq((2L, "b", 9L)).toDF("k", "v", "score"),
      path, overwrite = false)
    assert(Versioned.read(spark, path).agg(sum("score"))
      .head.getLong(0) == 9L)
    assert(Versioned.read(spark, path, Some(0)).columns.toSeq ==
      Seq("k", "v"))
    // guards: existing (folded), reserved
    intercept[Exception](Versioned.addColumn(path, "V", "STRING"))
    intercept[Exception](Versioned.addColumn(path, "ct", "STRING"))
    // add-after-drop reserves a fresh physical: the manifest maps it
    Versioned.dropColumn(path, "score")
    Versioned.addColumn(path, "score", "BIGINT")
    assert(Versioned.read(spark, path).filter(col("k") === 2L)
      .select("score").head.isNullAt(0),
      "metadata re-add resurrected dropped bytes")
  }

  test("dropColumn guards: last column, live partition column, constraint reference") {
    val path = tmpTable()
    Versioned.commitPartitioned(
      Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("k", "v", "p"),
      path, "p", overwrite = false)
    Versioned.addConstraint(spark, path, "k > 0")
    val e1 = intercept[RuntimeException](
      Versioned.dropColumn(path, "p"))
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[RuntimeException](
      Versioned.dropColumn(path, "k"))
    assert(e2.getMessage.contains("constraint"))
    val e3 = intercept[RuntimeException](
      Versioned.dropColumn(path, "nope"))
    assert(e3.getMessage.contains("no column"))
    Versioned.dropColumn(path, "v")
    val one = tmpTable()
    Versioned.commit(Seq(Tuple1(1L)).toDF("k"), one, overwrite = false)
    val e4 = intercept[RuntimeException](
      Versioned.dropColumn(one, "k"))
    assert(e4.getMessage.contains("last column"))
  }

  test("dropColumn composes with the change feed: meta commit feeds empty, later changes flow") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 1L)).toDF("k", "v", "junk"),
      path, overwrite = false)
    Versioned.dropColumn(path, "junk")                      // v1 meta
    Versioned.commit(Seq((2L, "b")).toDF("k", "v"), path,
      overwrite = false)                                    // v2
    val ch = Versioned.readChanges(spark, path, 0, 2)
    // feed reads under the HEAD schema: 'junk' is projected away even
    // for v0's feed files; the meta commit contributes zero rows
    assert(ch.columns.toSeq ==
      Seq("k", "v", "_commit_version", "_change_type"))
    val got = ch.select("k", "_commit_version", "_change_type")
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((1L, 0, "insert"), (2L, 2, "insert")))
    // the widened/narrowed epoch accounting is untouched: no bump
    assert(Versioned.feedEpoch(path, 2) == 0)
  }

  test("widened feed reads: pre-widening int32 feed files upcast under the head feed schema") {
    val path = tmpTable()
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), path,
      overwrite = false)                       // v0 feed files: int32 k
    Versioned.commit(Seq((3000000000L, "b")).toDF("k", "v"), path,
      overwrite = false)                       // widens the head to long
    // readChanges reads the WHOLE feed under the HEAD schema — v0's
    // zero-copy linked files still hold int32 pages and must upcast
    val got = Versioned.readChanges(spark, path, 0, 1)
      .select("k", "v", "_commit_version", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    assert(got == Set((1L, "a", 0, "insert"),
      (3000000000L, "b", 1, "insert")))
  }

  test("streaming feed subscriber survives a dropColumn across a checkpoint restart") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 99L)).toDF("k", "v", "junk"),
      path, overwrite = false)
    val ckpt = tmpTable()
    val out = tmpTable() + "/sink"
    def start() = Versioned.readChangeStream(spark, path)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append")
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // schema change lands while the subscriber is down
    Versioned.dropColumn(path, "junk")                    // v1, empty feed
    Versioned.commit(Seq((2L, "b")).toDF("k", "v"), path,
      overwrite = false)                                  // v2
    // the restarted reader resolves the NEW (narrower) feed schema;
    // already-seen v0 files are not replayed, v2 arrives once
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val sunk = spark.read.option("mergeSchema", "true").parquet(out)
      .select("k", "_commit_version", "_change_type")
      .as[(Long, Int, String)].collect().toSet
    assert(sunk == Set((1L, 0, "insert"), (2L, 2, "insert")))
  }

  test("widening composes with clustered commits: per-version index prunes, widened schema reads") {
    val path = tmpTable()
    // clustered commit with int32 k; its min/max sidecar is int-typed
    Versioned.commitClustered(
      (1 to 100).map(i => (i, i * 2)).toDF("k", "w"),
      path, "k", "w", files = 4, overwrite = false)
    // widening append (long) — indexed under its own (long) sidecar
    Versioned.commitClustered(
      Seq((3000000000L, 6000000000L)).toDF("k", "w"),
      path, "k", "w", files = 1, overwrite = false)
    val (df, kept, total) = Versioned.readRangeClustered(
      spark, path, "k", 1.0, 10.0)
    // the v0 sidecar still skips files; the widened manifest schema
    // governs the read (k is LONG even for int32 pages)
    assert(kept < total, s"no skipping: $kept/$total")
    assert(df.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.select("k").as[Long].collect().toSet ==
      (1L to 10L).toSet)
    // the widened row is reachable through its own range
    val (df2, _, _) = Versioned.readRangeClustered(
      spark, path, "k", 2.9e9, 3.1e9)
    assert(df2.select("k").as[Long].collect().toSet ==
      Set(3000000000L))
  }

  test("commitIndexed: plain appends gain min/max file skipping without re-clustering") {
    val path = tmpTable()
    // two "daily batches" already range-clustered by arrival (the
    // time-ordered ingest shape) — indexed, not z-ordered
    Versioned.commitIndexed(
      (1 to 100).map(i => (i.toLong, i * 2L)).toDF("k", "w")
        .repartition(4), path, Seq("k", "w"), overwrite = false)
    Versioned.commitIndexed(
      (101 to 200).map(i => (i.toLong, i * 2L)).toDF("k", "w")
        .repartition(4), path, Seq("k", "w"), overwrite = false)
    val (df, kept, total) = Versioned.readRangeClustered(
      spark, path, "k", 120.0, 140.0)
    // the first commit's files all miss [120, 140]: skipped wholesale
    assert(total >= 8 && kept < total, s"no skipping: $kept/$total")
    assert(df.select("k").as[Long].collect().toSet ==
      (120L to 140L).toSet)
    // plain read still sees everything (the sidecar is read-path-only)
    assert(Versioned.read(spark, path).count() == 200L)
  }

  test("dropColumn racing a concurrent append: the loser re-derives, tombstone and schema stay consistent") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, "a", 10L)).toDF("k", "v", "junk"),
      path, overwrite = false)
    var fired = false
    Versioned.prePublishHook = () => {
      if (!fired) {
        fired = true
        // the racer lands an append WITH the column inside
        // dropColumn's derive→publish window
        Versioned.commit(Seq((2L, "b", 20L)).toDF("k", "v", "junk"),
          path, overwrite = false): Unit
      }
    }
    try {
      val v = Versioned.dropColumn(path, "junk")
      assert(fired, "race hook never fired")
      // ledger: v0 seed, v1 racer append, v2 the drop (re-derived
      // against the post-append head, so the racer's rows survive
      // minus the column)
      assert(v == 2)
      assert(Versioned.read(spark, path).columns.toSeq == Seq("k", "v"))
      assert(Versioned.read(spark, path).as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (2L, "b")))
      // and the tombstone's fresh-physical assignment bites commits
      // derived AFTER the race: the reborn column null-fills for the
      // racer's rows instead of resurrecting their dropped bytes
      Versioned.commit(Seq((3L, "c", 30L)).toDF("k", "v", "junk"),
        path, overwrite = false)
      val rows = Versioned.read(spark, path)
        .select("k", "junk").as[(Long, Option[Long])].collect().toMap
      assert(rows(3L).contains(30L))
      assert(rows(1L).isEmpty && rows(2L).isEmpty,
        s"post-race re-add resurrected dropped bytes: $rows")
    } finally Versioned.prePublishHook = () => ()
  }

  test("widening composes with deletion vectors and compaction") {
    val path = tmpTable()
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), path,
      overwrite = false)                                    // int32
    Versioned.commit(Seq((5000000000L, "c")).toDF("k", "v"), path,
      overwrite = false)                                    // widens
    Versioned.deleteWhereDV(spark, path, col("k") === 2L)
    assert(Versioned.read(spark, path).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (5000000000L, "c")))
    Versioned.compact(spark, path, 1)
    val after = Versioned.read(spark, path)
    assert(after.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(after.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (5000000000L, "c")))
  }

  test("alterColumns: a failing op mid-list publishes NOTHING (atomic multi-change ALTER)") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, 10L)).toDF("k", "v"), path,
      overwrite = false)
    val head = Versioned.latestVersion(path)
    // op 2 collides with op 1's own addition -> the WHOLE statement
    // must fail with the ledger untouched, not leave 'a' behind
    intercept[Exception] {
      Versioned.alterColumns(path, Seq(
        Versioned.ColumnOp.Add("a", "BIGINT"),
        Versioned.ColumnOp.Add("a", "INT"))) }
    assert(Versioned.latestVersion(path) == head)
    assert(Versioned.read(spark, path).columns.toSeq == Seq("k", "v"))
    // ...and a consistent list lands as ONE metadata commit
    val v = Versioned.alterColumns(path, Seq(
      Versioned.ColumnOp.Add("a", "BIGINT"),
      Versioned.ColumnOp.Rename("a", "b"),
      Versioned.ColumnOp.Drop("v")))
    assert(v == head + 1)
    assert(Versioned.read(spark, path).columns.toSeq == Seq("k", "b"))
  }

  test("updateWhereDV: zero matches is a pure no-op; unknown SET column fails before IO") {
    val path = tmpTable()
    Versioned.commit(Seq((1L, 10L)).toDF("k", "v"), path,
      overwrite = false)
    val r = Versioned.updateWhereDV(spark, path, col("k") === 99L,
      Seq("v" -> lit(0L)))
    assert(r.version == 0 && r.deletedRows == 0L) // no commit published
    assert(Versioned.latestVersion(path) == 0)
    val e = intercept[Exception] {
      Versioned.updateWhereDV(spark, path, col("k") === 1L,
        Seq("nope" -> lit(0L))) }
    assert(e.getMessage.contains("no column 'nope'"))
    // assignment CASTS to the declared column type (SQL semantics)
    Versioned.updateWhereDV(spark, path, col("k") === 1L,
      Seq("v" -> lit(2.9)))
    assert(Versioned.read(spark, path).select("v").as[Long].head() == 2L)
  }
}
