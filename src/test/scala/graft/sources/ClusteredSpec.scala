package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteredSpec extends SparkSpec {
  import spark.implicits._

  // two independent uniform dimensions: a linear sort on x gives
  // files that each span the FULL y domain (no y-skipping possible);
  // the z-order write must bound both
  private def grid() = (0 until 20000).map { i =>
    val x = (i * 7919L) % 10000 // co-prime stride: uniform, unordered
    val y = (i * 104729L) % 10000
    (i.toLong, x, y)
  }.toDF("id", "x", "y").repartition(8)

  test("z-clustered files skip on BOTH dimensions; results stay exact") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val zpath = s"$base/z"
    Clustered.writeClustered(grid(), zpath, "x", "y", files = 16)

    // narrow range on x
    val (dfx, keptX, totX) = Clustered.readRange(spark, zpath, "x", 100, 600)
    assert(totX == 16)
    assert(keptX < totX, s"x-range read $keptX of $totX files — no skipping")
    // narrow range on y — the dimension a linear sort cannot bound
    val (dfy, keptY, totY) = Clustered.readRange(spark, zpath, "y", 100, 600)
    assert(keptY < totY, s"y-range read $keptY of $totY files — no skipping")

    // row-level exactness vs a full-scan oracle
    val wantX = grid().filter(col("x").between(100, 600))
      .select("id").as[Long].collect().toSet
    assert(dfx.select("id").as[Long].collect().toSet == wantX)
    val wantY = grid().filter(col("y").between(100, 600))
      .select("id").as[Long].collect().toSet
    assert(dfy.select("id").as[Long].collect().toSet == wantY)
  }

  test("linear layout cannot skip the second dimension — z-order can") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val lin = s"$base/linear"
    // the comparison layout: same file count, sorted by x only
    grid().repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(lin)
    Clustered.writeStats(spark, lin, Seq("x", "y"))
    val (_, keptLin, totLin) = Clustered.readRange(spark, lin, "y", 100, 600)
    val (_, keptZ, totZ) =
      Clustered.readRange(spark, s"$base/linear", "x", 100, 600)
    // x-sorted files skip on x...
    assert(keptZ < totZ)
    // ...but every x-sorted file spans the full y domain: zero skipped
    assert(keptLin == totLin,
      s"linear layout unexpectedly skipped y files ($keptLin/$totLin)")
  }

  test("bloom file index: point lookups skip files ranges cannot") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val path = s"$base/t"
    // ids UNIFORM across files (hash layout): every file's [min, max]
    // id range spans nearly the full domain — min/max skipping is
    // useless here, which is exactly the bloom index's case
    (0 until 20000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartition(16, col("id")).write.mode("overwrite").parquet(path)
    Clustered.writeStats(spark, path, Seq("id"))
    Clustered.writeBloomIndex(spark, path, "id", expectedPerFile = 2000)

    val (_, keptRange, totRange) =
      Clustered.readRange(spark, path, "id", 7777, 7777)
    assert(keptRange == totRange,
      "hash layout should defeat range skipping (the control)")
    val (df, keptB, totB) = Clustered.readEquality(spark, path, "id", 7777L)
    assert(totB == 16)
    assert(keptB < totB, s"bloom kept $keptB of $totB files — no skipping")
    assert(df.select("payload").as[String].collect().toSeq == Seq("p7777"))
    // absent key: bloom may keep a few false-positive files but the
    // residual filter returns zero rows
    val (dfAbs, _, _) = Clustered.readEquality(spark, path, "id", 999999L)
    assert(dfAbs.count() == 0)
  }

  test("bloom probe hashes with the column's own type (int column, long probe)") {
    // XxHash64 hashes IntegerType and LongType differently; the probe
    // must cast the literal to the INDEXED column's type or every
    // lookup with a wider literal false-negatives (ADVICE r8)
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val path = s"$base/t"
    (0 until 5000).map(i => (i, s"p$i")).toDF("id", "payload") // id: INT
      .repartition(8, col("id")).write.mode("overwrite").parquet(path)
    Clustered.writeBloomIndex(spark, path, "id", expectedPerFile = 1000)
    val (df, kept, tot) = Clustered.readEquality(spark, path, "id", 4321L)
    assert(kept >= 1 && kept <= tot)
    assert(df.select("payload").as[String].collect().toSeq == Seq("p4321"))
    // incompatible probe type fails loudly instead of silently skipping
    val err = intercept[IllegalArgumentException] {
      Clustered.readEquality(spark, path, "id", "not-a-number")
    }
    assert(err.getMessage.contains("does not convert"))
  }

  test("prune is distributed: 8k-file synthetic index, survivors-only collect") {
    // the index tables are data, not driver state: synthesize a stats
    // sidecar the size of a 10⁴-file table and prune it — the driver
    // sees only the surviving file names, never the full index
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val path = s"$base/t"
    // tiny real data dir supplies the authoritative column schema
    Seq((0L, "seed")).toDF("v", "payload")
      .write.mode("overwrite").parquet(path)
    (0 until 8000).map(i => (s"f$i", i * 10L, i * 10L + 9L))
      .toDF("file", "lo_v", "hi_v")
      .write.mode("overwrite").parquet(Clustered.statsPath(path))
    val (keep, total) = Clustered.pruneRange(spark, path, "v", 100, 119)
    assert(total == 8000)
    assert(keep.toSet == Set("f10", "f11"))

    // bloom index at the same scale: 8000 one-key blooms, point probe
    (0 until 8000).map(i => (s"f$i", i.toLong)).toDF("file", "k")
      .groupBy("file")
      .agg(graft.ops.Bloom.bloomAgg(col("k"), 10L).as("bloom"))
      .write.mode("overwrite").parquet(Clustered.bloomPath(path, "v"))
    val (keepB, totalB) = Clustered.pruneEquality(spark, path, "v", 4321L)
    assert(totalB == 8000)
    assert(keepB.contains("f4321"))
    assert(keepB.size < 400, // ~1/8000 true + fp rate, far under 5%
      s"bloom pruned nothing: ${keepB.size} of $totalB survived")
  }

  test("non-numeric clustering keys are rejected loudly") {
    val df = Seq((1L, "a", 2L)).toDF("id", "name", "v")
    val err = intercept[IllegalArgumentException] {
      Clustered.writeClustered(df,
        java.nio.file.Files.createTempDirectory("zorder").toString + "/z",
        "name", "v", files = 2)
    }
    assert(err.getMessage.contains("must be numeric"))
  }

  test("string stat values (quotes included) survive the sidecar round-trip") {
    // the r8 JSON sidecar interpolated raw values — a quote-bearing
    // string key corrupted it; the parquet sidecar stores native
    // typed values, and a range prune on a non-numeric column keeps
    // every file (cast-null → keep: unknown never justifies a skip)
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val path = s"$base/t"
    Seq((1L, "say \"hi\"", 10L), (2L, "plain", 20L))
      .toDF("id", "tag", "v").repartition(2)
      .write.mode("overwrite").parquet(path)
    Clustered.writeStats(spark, path, Seq("tag", "v"))
    val side = spark.read.parquet(Clustered.statsPath(path))
    assert(side.count() >= 1)
    val tags = side.select("lo_tag").as[String].collect().toSet
    assert(tags.contains("say \"hi\"") || tags.contains("plain"))
    val (keep, total) = Clustered.pruneRange(spark, path, "tag", 0, 1)
    assert(keep.size == total, "non-numeric bounds must never skip")
  }

  test("morton interleave matches a bit-by-bit reference for random pairs") {
    // the Column cascade in writeClustered must BE the textbook
    // interleave — verify against an independent per-bit construction
    def ref(a: Int, b: Int): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val rnd = new scala.util.Random(7)
    val pairs = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535)) ++
      Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val df = pairs.toDF("a", "b")
      .withColumn("z", graft.sources.Clustered.mortonForTest(
        col("a").cast("long"), col("b").cast("long")))
    val got = df.select("a", "b", "z").as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ref(a, b), s"morton($a, $b)")
    }
  }

  test("null clustering keys write safely and range reads stay exact") {
    val withNulls = (0 until 5000).map { i =>
      val x: java.lang.Long = if (i % 17 == 0) null else (i * 7919L) % 10000
      (i.toLong, x, (i * 104729L) % 10000)
    }.toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val zpath = s"$base/z"
    Clustered.writeClustered(withNulls, zpath, "x", "y", files = 8)
    // row count survives the clustered rewrite (nulls included)
    assert(spark.read.parquet(zpath).count() == 5000)
    val (df, kept, tot) = Clustered.readRange(spark, zpath, "x", 100, 600)
    assert(kept <= tot)
    val want = withNulls.filter(col("x").between(100, 600))
      .select("id").as[Long].collect().toSet
    assert(df.select("id").as[Long].collect().toSet == want)
  }

  test("empty keep-set and null-safe read still return exact rows") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val zpath = s"$base/z"
    Clustered.writeClustered(grid(), zpath, "x", "y", files = 4)
    val (df, kept, tot) =
      Clustered.readRange(spark, zpath, "x", 20000, 30000)
    assert(kept == 0 && tot == 4)
    assert(df.count() == 0)
  }
}
