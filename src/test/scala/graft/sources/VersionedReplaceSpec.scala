package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Predicate-scoped atomic OVERWRITE ([[Versioned.replaceWhere]] and
  * its SQL surface `INSERT OVERWRITE … PARTITION (…)` /
  * `DataFrameWriterV2.overwrite(cond)`): ONE commit removes every
  * live row in the predicate's scope and lands the batch in its
  * place, nothing outside the scope moves. Load-bearing claims: a
  * provably partition-aligned scope DROPS whole dirs metadata-only
  * (zero existing bytes moved, zero mask rows), any unprovable
  * residue falls to a row-exact deletion-vector mask, incoming rows
  * outside the scope fail loudly BEFORE any commit, the change feed
  * classifies the replace (deletes + inserts), time travel shows the
  * pre-replace snapshot, the re-landed dir keeps the table's
  * partition layout (and its pruning), and a lost commit race
  * re-derives against the new head. */
class VersionedReplaceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String = java.nio.file.Files
    .createTempDirectory("graft_replace").toString

  private def freshWarehouse(): String = java.nio.file.Files
    .createTempDirectory("graft_replace_sql").toString

  private var seq = 0
  private def freshCat(wh: String): String = {
    seq += 1
    val cat = s"grepl$seq"
    GraftCatalog.register(spark, cat, wh)
    cat
  }

  private def regionRows(region: String, lo: Long, hi: Long) =
    (lo to hi).map(k => (k, region, k * 10)).toDF("k", "region", "v")

  private val spec = Seq(Versioned.PartField("region", None))

  test("partition-aligned replace drops the covered dir whole: zero mask rows, others untouched") {
    val path = tmpTable()
    Versioned.commitPartitionedSpec(regionRows("EU", 1, 40), path, spec)
    Versioned.commitPartitionedSpec(regionRows("US", 41, 80), path, spec)
    Versioned.commitPartitionedSpec(regionRows("AP", 81, 99), path, spec)
    val dirsBefore = Versioned.dataDirIds(path, 2)
    val batch = regionRows("EU", 201, 210)
    val r = Versioned.replaceWhere(spark, path, batch,
      col("region") === "EU", Seq("region" -> Set("EU")))
    assert(r.droppedDirs == 1 && r.carriedDirs == 2 &&
      r.maskedRows == 0L,
      s"expected a metadata-only dir drop, got $r")
    // the EU dir left the chain; US/AP dirs carried BY REFERENCE
    val dirsAfter = Versioned.dataDirIds(path, r.version)
    assert(dirsAfter.size == 3 &&
      dirsBefore.count(dirsAfter.contains) == 2)
    assert(Versioned.dvDirIds(path, r.version).isEmpty)
    // content: new EU rows + untouched US/AP
    val got = Versioned.read(spark, path)
      .as[(Long, String, Long)].collect().toSet
    val want = ((201L to 210L).map(k => (k, "EU", k * 10)) ++
      (41L to 80L).map(k => (k, "US", k * 10)) ++
      (81L to 99L).map(k => (k, "AP", k * 10))).toSet
    assert(got == want)
    // time travel: the pre-replace snapshot still shows old EU rows
    assert(Versioned.read(spark, path, Some(2))
      .filter(col("region") === "EU").count() == 40L)
    // feed: classified delete pre-images + insert rows
    val feed = Versioned.readChanges(spark, path, r.version, r.version)
    assert(feed.filter(col("_change_type") === "delete").count() == 40L)
    assert(feed.filter(col("_change_type") === "insert").count() == 10L)
    // the re-landed dir keeps the table's layout: a pruned read on
    // region still skips before IO
    val (pruned, read, total) =
      Versioned.readPartitionPruned(spark, path, "region", Seq("EU"))
    assert(read < total, s"expected pruning, read $read of $total")
    assert(pruned.count() == 10L)
  }

  test("unprovable scope falls to the row-exact DV mask: dirs carried, mask ∝ matches") {
    val path = tmpTable()
    // one dir holding ALL regions — no per-dir proof possible
    val mixed = regionRows("EU", 1, 30)
      .union(regionRows("US", 31, 60))
    Versioned.commit(mixed, path, overwrite = false)
    val dirsBefore = Versioned.dataDirIds(path, 0)
    val r = Versioned.replaceWhere(spark, path,
      regionRows("EU", 101, 105), col("region") === "EU",
      Seq("region" -> Set("EU")))
    assert(r.droppedDirs == 0 && r.maskedRows == 30L,
      s"expected a mask-tier replace, got $r")
    assert(Versioned.dataDirIds(path, r.version).take(1) == dirsBefore)
    assert(Versioned.dvDirIds(path, r.version).size == 1)
    val got = Versioned.read(spark, path)
      .as[(Long, String, Long)].collect().toSet
    val want = ((101L to 105L).map(k => (k, "EU", k * 10)) ++
      (31L to 60L).map(k => (k, "US", k * 10))).toSet
    assert(got == want)
  }

  test("mixed layouts: the aligned dir drops, the mixed dir masks — one commit, row-exact") {
    val path = tmpTable()
    Versioned.commitPartitionedSpec(regionRows("EU", 1, 20), path, spec)
    val mixed = regionRows("EU", 21, 35).union(regionRows("US", 36, 50))
    Versioned.commit(mixed, path, overwrite = false)
    val r = Versioned.replaceWhere(spark, path,
      regionRows("EU", 301, 303), col("region") === "EU",
      Seq("region" -> Set("EU")))
    assert(r.droppedDirs == 1 && r.maskedRows == 15L,
      s"expected drop + mask in one commit, got $r")
    val got = Versioned.read(spark, path)
      .as[(Long, String, Long)].collect().toSet
    val want = ((301L to 303L).map(k => (k, "EU", k * 10)) ++
      (36L to 50L).map(k => (k, "US", k * 10))).toSet
    assert(got == want)
    // the feed's deletes cover BOTH tiers' pre-images
    val feed = Versioned.readChanges(spark, path, r.version, r.version)
    assert(feed.filter(col("_change_type") === "delete").count() == 35L)
  }

  test("scope gate: a batch row outside the predicate fails loudly, head unmoved") {
    val path = tmpTable()
    Versioned.commitPartitionedSpec(regionRows("EU", 1, 10), path, spec)
    val headBefore = Versioned.latestVersion(path)
    val bad = regionRows("EU", 100, 100)
      .union(regionRows("US", 101, 101)) // outside the scope
    val e = intercept[Exception] {
      Versioned.replaceWhere(spark, path, bad,
        col("region") === "EU", Seq("region" -> Set("EU")))
    }
    assert(e.getMessage.contains("NOT matching the replace predicate"),
      e.getMessage)
    assert(Versioned.latestVersion(path) == headBefore)
  }

  test("a lost commit race re-derives: rows appended mid-replace are in the new scope") {
    val path = tmpTable()
    Versioned.commitPartitionedSpec(regionRows("EU", 1, 10), path, spec)
    // a racer lands MORE EU rows (a mixed dir — mask tier) between
    // the derive and the publish; the retry must re-derive and mask
    // them too, or they would survive the replace
    var fired = false
    Versioned.prePublishHook = () => {
      if (!fired) {
        fired = true
        Versioned.commit(regionRows("EU", 11, 15), path,
          overwrite = false): Unit
      }
    }
    try {
      val r = Versioned.replaceWhere(spark, path,
        regionRows("EU", 501, 502), col("region") === "EU",
        Seq("region" -> Set("EU")))
      assert(r.version == Versioned.latestVersion(path))
    } finally Versioned.prePublishHook = () => ()
    val got = Versioned.read(spark, path)
      .as[(Long, String, Long)].collect().toSet
    assert(got == (501L to 502L).map(k => (k, "EU", k * 10)).toSet,
      s"racer's EU rows must not survive the replace, got $got")
  }

  test("SQL: INSERT OVERWRITE PARTITION replaces one partition metadata-only; bare OVERWRITE still truncates") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, region STRING,
        v BIGINT) PARTITIONED BY (region)""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'EU', id * 10 " +
      "FROM range(1, 41)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'US', id * 10 " +
      "FROM range(41, 81)")
    val headBefore = Versioned.latestVersion(path)
    spark.sql(s"INSERT OVERWRITE $cat.t PARTITION (region = 'EU') " +
      "SELECT id, id * 100 FROM range(201, 206)")
    val head = Versioned.latestVersion(path)
    assert(head == headBefore + 1)
    // metadata-only: EU dir dropped, US carried, zero mask
    assert(Versioned.dataDirIds(path, head).size == 3) // v0 empty + US + new
    assert(Versioned.dvDirIds(path, head).isEmpty)
    val got = spark.sql(s"SELECT k, region, v FROM $cat.t")
      .as[(Long, String, Long)].collect().toSet
    val want = ((201L to 205L).map(k => (k, "EU", k * 100)) ++
      (41L to 80L).map(k => (k, "US", k * 10))).toSet
    assert(got == want)
    // bare INSERT OVERWRITE keeps the truncate semantics
    spark.sql(s"INSERT OVERWRITE $cat.t " +
      "SELECT id, 'AP', id FROM range(1, 4)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 3L)
  }

  test("SQL: writerV2 overwrite(condition) routes through replaceWhere row-exactly") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, grp STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a', 10), (2, 'b', 20)," +
      " (3, 'a', 30)")
    Seq((9L, "a", 90L)).toDF("k", "grp", "v")
      .writeTo(s"$cat.t").overwrite(col("grp") === "a")
    val got = spark.sql(s"SELECT k, grp, v FROM $cat.t")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((9L, "a", 90L), (2L, "b", 20L)))
    // merge-on-read: the original dir carried, one mask dir
    val head = Versioned.latestVersion(path)
    assert(Versioned.dvDirIds(path, head).size == 1)
  }

  test("replaceDynamic: only the partitions the batch touches are replaced; aligned dirs drop") {
    val path = tmpTable()
    Versioned.commitWithProps(regionRows("EU", 1, 10).limit(0), path,
      overwrite = false, props = Map("partCol" -> "region")) // v0 policy
    Versioned.commitPartitionedSpec(regionRows("EU", 1, 10), path, spec)
    Versioned.commitPartitionedSpec(regionRows("US", 11, 20), path, spec)
    Versioned.commitPartitionedSpec(regionRows("AP", 21, 30), path, spec)
    val r = Versioned.replaceDynamic(spark, path,
      regionRows("EU", 101, 103).union(regionRows("AP", 104, 105)))
    assert(r.droppedDirs == 2 && r.maskedRows == 0L,
      s"EU and AP dirs should drop whole, got $r")
    val got = Versioned.read(spark, path)
      .as[(Long, String, Long)].collect().toSet
    val want = ((101L to 103L).map(k => (k, "EU", k * 10)) ++
      (104L to 105L).map(k => (k, "AP", k * 10)) ++
      (11L to 20L).map(k => (k, "US", k * 10))).toSet
    assert(got == want, "US (untouched partition) must survive")
  }

  test("replaceDynamic multi-field policy is tuple-exact, not a per-column cross product") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, d STRING, g STRING)
        PARTITIONED BY (d, g)""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'd1', 'a'), " +
      "(2, 'd1', 'b'), (3, 'd2', 'a'), (4, 'd2', 'b')")
    // touches tuples (d1,a) and (d2,b) ONLY — (d1,b) and (d2,a) must
    // survive even though their column values each appear in the batch
    val r = Versioned.replaceDynamic(spark, path,
      Seq((10L, "d1", "a"), (11L, "d2", "b")).toDF("k", "d", "g"))
    assert(r.maskedRows == 2L, s"exactly the two touched tuples, got $r")
    val got = spark.sql(s"SELECT k, d, g FROM $cat.t")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((10L, "d1", "a"), (11L, "d2", "b"),
      (2L, "d1", "b"), (3L, "d2", "a")))
  }

  test("SQL: INSERT OVERWRITE under dynamic mode and writerV2.overwritePartitions") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, region STRING)
        PARTITIONED BY (region)""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'EU' FROM range(1, 11)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'US' FROM range(11, 21)")
    val mode = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(mode)
    try {
      spark.conf.set(mode, "dynamic")
      spark.sql(s"INSERT OVERWRITE $cat.t " +
        "SELECT id, 'EU' FROM range(100, 103)")
    } finally spark.conf.set(mode, prev)
    val got = spark.sql(s"SELECT k, region FROM $cat.t")
      .as[(Long, String)].collect().toSet
    assert(got == ((100L to 102L).map((_, "EU")) ++
      (11L to 20L).map((_, "US"))).toSet,
      s"dynamic overwrite must keep the untouched US partition: $got")
    // the EU dir was aligned — dropped whole, no mask
    val head = Versioned.latestVersion(path)
    assert(Versioned.dvDirIds(path, head).isEmpty)
    // writerV2: the conf-independent dynamic surface
    Seq((200L, "US")).toDF("k", "region")
      .writeTo(s"$cat.t").overwritePartitions()
    val got2 = spark.sql(s"SELECT k, region FROM $cat.t")
      .as[(Long, String)].collect().toSet
    assert(got2 == Set((200L, "US")) ++
      (100L to 102L).map((_, "EU")).toSet)
  }

  test("replaceDynamic: NULL partition values replace the hive default-partition dir") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, region STRING)
        PARTITIONED BY (region)""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, NULL), (2, 'EU')")
    val r = Versioned.replaceDynamic(spark, path,
      Seq((10L, null.asInstanceOf[String])).toDF("k", "region"))
    assert(r.version > 0)
    val got = spark.sql(s"SELECT k, region FROM $cat.t")
      .as[(Long, Option[String])].collect().toSet
    assert(got == Set((10L, None), (2L, Some("EU"))),
      s"the NULL partition replaced, EU survived: $got")
  }

  test("replaceDynamic on an unpartitioned table is loud") {
    val path = tmpTable()
    Versioned.commit(regionRows("EU", 1, 5), path, overwrite = false)
    val e = intercept[Exception] {
      Versioned.replaceDynamic(spark, path, regionRows("EU", 6, 7))
    }
    assert(e.getMessage.contains("declares no partitioning"),
      e.getMessage)
  }

  test("replaceWhere enforces CHECK constraints on the batch: loud, head unmoved") {
    val path = tmpTable()
    Versioned.commitPartitionedSpec(regionRows("EU", 1, 10), path, spec)
    Versioned.addConstraint(spark, path, "v >= 0")
    val headBefore = Versioned.latestVersion(path)
    val bad = Seq((100L, "EU", -5L)).toDF("k", "region", "v")
    val e = intercept[Exception] {
      Versioned.replaceWhere(spark, path, bad,
        col("region") === "EU", Seq("region" -> Set("EU")))
    }
    assert(e.getMessage.contains("constraint"), e.getMessage)
    assert(Versioned.latestVersion(path) == headBefore)
    // a clean batch still lands under the same constraint
    val r = Versioned.replaceWhere(spark, path,
      regionRows("EU", 200, 201), col("region") === "EU",
      Seq("region" -> Set("EU")))
    assert(r.version == headBefore + 1)
  }

  test("replaceDynamic composes with column mapping: renamed partition column still drops dirs") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, region STRING)
        PARTITIONED BY (region)""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'EU' FROM range(1, 11)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'US' FROM range(11, 21)")
    // rename the partition column: physical name (directories on
    // disk) stays, the policy and predicates follow the logical name
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN region TO zone")
    val r = Versioned.replaceDynamic(spark, path,
      Seq((100L, "EU")).toDF("k", "zone"))
    assert(r.droppedDirs == 1 && r.maskedRows == 0L,
      s"the renamed column's EU dir must still prove the drop: $r")
    val got = spark.sql(s"SELECT k, zone FROM $cat.t")
      .as[(Long, String)].collect().toSet
    assert(got == Set((100L, "EU")) ++ (11L to 20L).map((_, "US")))
    // plain INSERT also follows the renamed policy (pre-fix it died
    // with "no column 'region' to partition by")
    spark.sql(s"INSERT INTO $cat.t VALUES (500, 'AP')")
    val head = Versioned.latestVersion(path)
    assert(Versioned.partSpecIds(path, head).values.toSeq
      .contains("zone") ||
      Versioned.partSpecIds(path, head).values.exists(_.nonEmpty),
      "the new dir records a partition spec under the renamed policy")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE zone = 'AP'")
      .head.getLong(0) == 1L)
  }

  test("DROP COLUMN of the partition-policy column is refused even after a full compact") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, region STRING)
        PARTITIONED BY (region)""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'EU' FROM range(1, 11)")
    // a full compact flattens the per-dir specs — pre-fix, the drop
    // then succeeded and every later INSERT died "no column 'region'
    // to partition by"
    Versioned.compact(spark, path, targetFiles = 1)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t DROP COLUMN region")
    }
    assert(e.getMessage.contains("PARTITIONED BY"), e.getMessage)
    // the policy still works: INSERT lands laid out
    spark.sql(s"INSERT INTO $cat.t VALUES (100, 'US')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE region = 'US'")
      .head.getLong(0) == 1L)
  }

  test(".partitions reflects a replace: the re-landed value's accounting resets") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, region STRING)
        PARTITIONED BY (region)""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'EU' FROM range(1, 1001)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'US' FROM range(2001, 3001)")
    val before = spark.sql("SELECT part_value, n_files, n_dirs FROM " +
      s"$cat.t.partitions WHERE part_value = 'region=EU'").head
    spark.sql(s"INSERT OVERWRITE $cat.t PARTITION (region = 'EU') " +
      "SELECT id FROM range(1, 4)")
    val after = spark.sql("SELECT part_value, n_files, n_dirs FROM " +
      s"$cat.t.partitions WHERE part_value = 'region=EU'").head
    assert(after.getLong(2) == 1L, s"one dir after the re-land: $after")
    assert(after.getLong(1) <= before.getLong(1),
      s"no more files than before: $before -> $after")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE region = 'EU'")
      .head.getLong(0) == 3L)
  }

  test("time-transform policy: the re-landed batch keeps days(ts) layout and prunes") {
    val wh = freshWarehouse()
    val path = s"$wh/t"
    val cat = freshCat(wh)
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, ts TIMESTAMP,
        grp STRING) PARTITIONED BY (days(ts), grp)""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
        timestamp'2024-01-05 10:00:00', 'a' FROM range(1, 21)""")
    spark.sql(s"""INSERT INTO $cat.t SELECT id,
        timestamp'2024-01-06 10:00:00', 'b' FROM range(21, 41)""")
    // replace grp='a' whole (each INSERT landed one aligned dir)
    val r = Versioned.replaceWhere(spark, path,
      spark.sql("""SELECT id AS k, timestamp'2024-01-05 11:00:00' AS
          ts, 'a' AS grp FROM range(900, 903)"""),
      col("grp") === "a", Seq("grp" -> Set("a")))
    assert(r.droppedDirs == 1 && r.maskedRows == 0L, s"got $r")
    // the new dir recorded the full transform spec
    val specs = Versioned.partSpecIds(path, r.version)
    assert(specs.values.exists(_.startsWith("days(ts)")),
      s"specs: $specs")
    // a timestamp-range read prunes to the re-landed day's dirs
    val (df, read, total) = Versioned.readPartitionPrunedTime(spark,
      path, "ts", java.time.LocalDateTime.of(2024, 1, 5, 0, 0),
      java.time.LocalDateTime.of(2024, 1, 5, 23, 59))
    assert(read < total, s"expected pruning, read $read of $total")
    assert(df.count() == 3L)
  }
}
