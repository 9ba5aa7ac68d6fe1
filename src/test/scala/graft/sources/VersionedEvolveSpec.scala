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

  test("nested ADD: metadata-only, null-fills history, later commits populate, feed follows") {
    val path = tmpTable()
    Versioned.commit(
      Seq((1L, (10, "x"))).toDF("k", "meta"), path, overwrite = false)
    // ALTER ... ADD COLUMN meta.flag STRING — one metadata commit
    val v = Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Add("meta.flag", "STRING")))
    assert(v == 1)
    // pre-existing row null-fills the new nested field
    val head = Versioned.read(spark, path)
    assert(head.selectExpr("k", "meta._1", "meta.flag")
      .as[(Long, Int, Option[String])].collect().toSet ==
      Set((1L, 10, None)))
    // a later commit populates it (implicit struct-shape merge)
    Versioned.commit(spark.sql(
      "SELECT 2L AS k, named_struct('_1', 20, '_2', 'y', " +
        "'flag', 'hot') AS meta"), path, overwrite = false)
    assert(Versioned.read(spark, path)
      .selectExpr("k", "meta.flag").as[(Long, Option[String])]
      .collect().toSet == Set((1L, None), (2L, Some("hot"))))
    // time travel below the add still shows the NARROW struct
    assert(!Versioned.read(spark, path, Some(0)).schema("meta")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("flag"))
    // the change feed reads every era under the HEAD schema: the
    // pre-add insert's feed rows null-fill the nested field
    val feed = Versioned.readChanges(spark, path, 0,
      Versioned.latestVersion(path))
    assert(feed.selectExpr("k", "meta.flag", "_change_type")
      .as[(Long, Option[String], String)].collect().toSet ==
      Set((1L, None, "insert"), (2L, Some("hot"), "insert")))
  }

  test("nested WIDEN: int leaf upcasts under the widened schema; off-ladder rejected") {
    val path = tmpTable()
    Versioned.commit(
      Seq((1L, (10, 1.5f))).toDF("k", "meta"), path, overwrite = false)
    // explicit nested widen via ALTER
    Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Widen("meta._1", "BIGINT")))
    assert(Versioned.read(spark, path).selectExpr("meta._1")
      .schema.head.dataType ==
      org.apache.spark.sql.types.LongType)
    assert(Versioned.read(spark, path).selectExpr("meta._1")
      .as[Long].collect().toSet == Set(10L))
    // implicit nested widen at a data commit (float→double leaf)
    Versioned.commit(spark.sql(
      "SELECT 2L AS k, named_struct('_1', 20L, '_2', " +
        "CAST(2.25 AS DOUBLE)) AS meta"), path, overwrite = false)
    assert(Versioned.read(spark, path).selectExpr("meta._2")
      .as[Double].collect().toSet == Set(1.5, 2.25))
    // off-ladder nested drift is loud — both through ALTER...
    val e1 = intercept[Exception] { Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Widen("meta._1", "STRING"))) }
    assert(e1.getMessage.contains("lossless"), e1.getMessage)
    // ...and through a data commit
    val e2 = intercept[Exception] { Versioned.commit(spark.sql(
      "SELECT 3L AS k, named_struct('_1', 'nope', '_2', " +
        "CAST(1 AS DOUBLE)) AS meta"), path, overwrite = false) }
    assert(e2.getMessage.contains("drift"), e2.getMessage)
  }

  test("nested RENAME is metadata-only: old files read under the new name; feed crosses it") {
    val path = tmpTable()
    Versioned.commit(
      Seq((1L, (10, "x"))).toDF("k", "meta"), path, overwrite = false)
    Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Rename("meta._2", "tag")))
    // the OLD file's bytes surface under the new logical name
    assert(Versioned.read(spark, path).selectExpr("meta.tag")
      .as[String].collect().toSet == Set("x"))
    // new commits write under the new logical name (physical name
    // immutable underneath) and read back united with the old era
    Versioned.commit(spark.sql(
      "SELECT 2L AS k, named_struct('_1', 20, 'tag', 'y') AS meta"),
      path, overwrite = false)
    assert(Versioned.read(spark, path).selectExpr("k", "meta.tag")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "y")))
    // time travel below the rename shows the OLD name
    assert(Versioned.read(spark, path, Some(0)).schema("meta")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("_1", "_2"))
    // the feed reads BOTH eras under the head's names
    assert(Versioned.readChanges(spark, path, 0,
        Versioned.latestVersion(path))
      .selectExpr("k", "meta.tag").as[(Long, String)]
      .collect().toSet == Set((1L, "x"), (2L, "y")))
  }

  test("nested DROP tombstones the field: a data-commit re-add is refused, ALTER re-add null-fills") {
    val path = tmpTable()
    Versioned.commit(
      Seq((1L, (10, "ghost"))).toDF("k", "meta"), path,
      overwrite = false)
    Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Drop("meta._2")))
    assert(Versioned.read(spark, path).schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("_1"))
    // a data commit trying to bring `_2` back is the GHOST hazard —
    // historical feed files still carry the old bytes — so it is loud
    val e = intercept[Exception] { Versioned.commit(spark.sql(
      "SELECT 2L AS k, named_struct('_1', 20, '_2', 'new') AS meta"),
      path, overwrite = false) }
    assert(e.getMessage.contains("ALTER TABLE"), e.getMessage)
    // ALTER re-add assigns a FRESH physical leaf: history null-fills,
    // the old 'ghost' bytes never resurface
    Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Add("meta._2", "STRING")))
    assert(Versioned.read(spark, path).selectExpr("k", "meta._2")
      .as[(Long, Option[String])].collect().toSet ==
      Set((1L, None)))
    Versioned.commit(spark.sql(
      "SELECT 2L AS k, named_struct('_1', 20, '_2', 'new') AS meta"),
      path, overwrite = false)
    assert(Versioned.read(spark, path).selectExpr("k", "meta._2")
      .as[(Long, Option[String])].collect().toSet ==
      Set((1L, None), (2L, Some("new"))))
  }

  test("nested guards: missing path, non-struct traversal, last-field drop, bad new name") {
    val path = tmpTable()
    Versioned.commit(
      Seq((1L, (10, "x"))).toDF("k", "meta"), path, overwrite = false)
    val miss = intercept[Exception] { Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Widen("meta.nope", "BIGINT"))) }
    assert(miss.getMessage.contains("no field 'nope'"), miss.getMessage)
    val nonStruct = intercept[Exception] { Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Add("k.sub", "INT"))) }
    assert(nonStruct.getMessage.contains("not a struct"),
      nonStruct.getMessage)
    Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Drop("meta._2")))
    val last = intercept[Exception] { Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Drop("meta._1"))) }
    assert(last.getMessage.contains("last field"), last.getMessage)
    val dottedNew = intercept[Exception] { Versioned.alterColumns(path,
      Seq(Versioned.ColumnOp.Rename("meta._1", "a.b"))) }
    assert(dottedNew.getMessage.contains("bare field name"),
      dottedNew.getMessage)
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
