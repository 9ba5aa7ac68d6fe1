package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order clustered writes + file-level min/max statistics + a
  * skipping read path — the data-skipping triad every large-scale
  * table format (Delta OPTIMIZE ZORDER, Iceberg sort orders, Hudi
  * clustering) builds on, here as plain parquet + a JSON sidecar so
  * the mechanism is inspectable.
  *
  * WHY at 100 TB: partition pruning only cuts the dimension you
  * partitioned by. Queries that filter on a SECOND (or third) column
  * still scan every file of the surviving partitions unless files are
  * *clustered* so each covers a narrow range of those columns too.
  * Interleaving the bits of the clustering keys (a Morton / Z-value)
  * and range-partitioning + sorting by it gives every output file a
  * tight bounding box in ALL clustered dimensions at once; a
  * min/max-per-file index then skips most files for a selective
  * range predicate on ANY clustered column — no engine changes, just
  * layout. This composes with [[Export.partitionedParquet]]: partition
  * by the coarse dimension, z-cluster inside each partition.
  *
  * Scale shape: the only extra cost over a plain write is one 1-row
  * min/max aggregate (broadcast), one range shuffle on the z-value
  * (replacing the write's existing shuffle, not adding one), a
  * per-partition sort (spillable), and one post-write stats scan that
  * reads ONLY the clustered columns (column-pruned). Stats are one
  * JSON row per FILE — index size grows with file count, not rows.
  */
object Clustered {

  /** 16-bit Morton interleave of `a` and `b` (both already normalized
    * to [0, 65535]): spreads each value's bits to even positions via
    * the classic mask-shift cascade, then ORs `b`'s odd-shifted
    * spread. Pure Column arithmetic — codegen'd, no UDF. */
  private def morton16(a: Column, b: Column): Column = {
    // spread 16 bits to 32 (bits end up at even positions)
    def spread(x: Column): Column = {
      val s1 = shiftleft(x, 8).bitwiseOR(x).bitwiseAND(lit(0x00FF00FFL))
      val s2 = shiftleft(s1, 4).bitwiseOR(s1).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = shiftleft(s2, 2).bitwiseOR(s2).bitwiseAND(lit(0x33333333L))
      shiftleft(s3, 1).bitwiseOR(s3).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Test hook: the interleave as a Column, for property checks
    * against an independent bit-by-bit construction. */
  private[sources] def mortonForTest(a: Column, b: Column): Column =
    morton16(a, b)

  /** Write `df` as parquet z-clustered on two numeric columns:
    * min/max-normalize each to 16 bits (one broadcast 1-row
    * aggregate), interleave into a Morton value, range-partition into
    * `files` buckets and sort within each — every file gets a tight
    * (c1, c2) bounding box. Then stage the per-file min/max stats
    * sidecar via [[writeStats]]. Degenerate domains (min == max)
    * normalize to 0 — clustering on a constant is a no-op, not an
    * error. */
  def writeClustered(df: DataFrame, path: String, c1: String, c2: String,
      files: Int): Unit = {
    val spark = df.sparkSession
    val mm = df.agg(
      min(col(c1)).as("lo1"), max(col(c1)).as("hi1"),
      min(col(c2)).as("lo2"), max(col(c2)).as("hi2"))
    def norm(c: Column, lo: Column, hi: Column): Column =
      when(hi > lo,
        round((c.cast("double") - lo.cast("double")) /
          (hi.cast("double") - lo.cast("double")) * 65535.0)
          .cast("long"))
        .otherwise(lit(0L))
    df.crossJoin(broadcast(mm))
      .withColumn("__z",
        morton16(norm(col(c1), col("lo1"), col("hi1")),
          norm(col(c2), col("lo2"), col("hi2"))))
      .drop("lo1", "hi1", "lo2", "hi2")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    writeStats(spark, path, Seq(c1, c2))
  }

  /** Compute and stage the per-file min/max index for `cols`: one
    * column-pruned scan of the written files grouped by
    * `input_file_name` → `<path>/_graft_stats.json` (a driver-side
    * file-count-sized artifact, the same scale class as the format's
    * own footer list). */
  def writeStats(spark: SparkSession, path: String,
      cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))
    val rows = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per FILE — bounded by the file count
    val json = rows.map { r =>
      val f = r.getAs[String]("file")
      val kv = cols.flatMap { c =>
        Seq(s""""lo_$c":${r.get(r.fieldIndex(s"lo_$c"))}""",
          s""""hi_$c":${r.get(r.fieldIndex(s"hi_$c"))}""")
      }.mkString(",")
      s"""{"file":"$f",$kv}"""
    }.mkString("[", ",", "]")
    Files.writeString(Paths.get(path, "_graft_stats.json"),
      s"""{"cols":[${cols.map("\"" + _ + "\"").mkString(",")}],"files":$json}""")
  }

  /** Per-file BLOOM index for equality skipping — the complement of
    * the min/max index: a point lookup on a high-cardinality key
    * (doc id, user id) rarely prunes on ranges (every file's [lo, hi]
    * spans it) but a per-file bloom answers "definitely not here" in
    * a few KB per file. Built with Spark's own BloomFilterAggregate
    * over `input_file_name()` (one column-pruned scan, map-side
    * partials), probed driver-side with the IDENTICAL xxhash64.
    * False positives only cost an extra file read; false negatives
    * cannot happen. */
  def writeBloomIndex(spark: SparkSession, path: String, c: String,
      expectedPerFile: Long = 100000L): Unit = {
    val rows = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(graft.ops.Bloom.bloomAgg(col(c), expectedPerFile).as("bloom"))
      .collect() // one row per FILE
    val json = rows.map { r =>
      val b = r.getAs[Array[Byte]]("bloom")
      val b64 =
        if (b == null) "" else java.util.Base64.getEncoder.encodeToString(b)
      s"""{"file":"${r.getAs[String]("file")}","bloom":"$b64"}"""
    }.mkString("[", ",", "]")
    Files.writeString(Paths.get(path, s"_graft_bloom_$c.json"),
      s"""{"col":"$c","files":$json}""")
  }

  /** Equality-skipping read: drop every file whose bloom proves the
    * key absent, read the rest, re-apply the exact predicate. A file
    * with an empty/missing bloom (all-null column chunk) is KEPT —
    * unknown can never justify a skip. Returns (frame, filesRead,
    * filesTotal) so callers can assert real pruning. */
  def readEquality(spark: SparkSession, path: String, c: String,
      value: Any): (DataFrame, Int, Int) = {
    val raw = Files.readString(Paths.get(path, s"_graft_bloom_$c.json"))
    val entries = raw.split("""\{"file":""").drop(1).toSeq
    val h = graft.ops.Bloom.hash64(value)
    val files = entries.map { e =>
      val f = e.drop(1).takeWhile(_ != '"')
      val b64 = e.split("\"bloom\":\"", 2)(1).takeWhile(_ != '"')
      (f, b64)
    }
    val keep = files.collect {
      case (f, b64) if b64.isEmpty ||
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(b64)))
          .mightContainLong(h) => f
    }
    val df =
      if (keep.isEmpty)
        spark.read.parquet(path).filter(col(c) === lit(value)).limit(0)
      else spark.read.parquet(keep: _*).filter(col(c) === lit(value))
    (df, keep.size, files.size)
  }

  /** File-skipping read: keep only files whose [lo, hi] range for
    * `c` overlaps [lo, hi] (interval-overlap test on the sidecar —
    * a driver-side file-list filter, exactly how format readers prune
    * on footer stats), read just those, and re-apply the predicate
    * for row-level exactness. Returns (frame, filesRead, filesTotal)
    * so callers — and the spec — can assert real skipping. */
  def readRange(spark: SparkSession, path: String, c: String,
      lo: Double, hi: Double): (DataFrame, Int, Int) = {
    val raw = Files.readString(Paths.get(path, "_graft_stats.json"))
    // sidecar is self-authored (writeStats): flat fields, no nesting
    val entries = raw.split("""\{"file":""").drop(1).toSeq
    // `null` stats (an all-null column chunk) parse to NaN → the file
    // is KEPT: unknown bounds can never justify a skip
    def num(s: String, k: String): Double = {
      val v = s.split(s""""$k":""", 2)(1).takeWhile(ch =>
        ch.isDigit || ch == '.' || ch == '-' || ch == 'E' || ch == 'e')
      if (v.isEmpty) Double.NaN else v.toDouble
    }
    val files = entries.map { e =>
      val f = e.drop(1).takeWhile(_ != '"')
      (f, num(e, s"lo_$c"), num(e, s"hi_$c"))
    }
    val keep = files.collect { case (f, flo, fhi)
      if flo.isNaN || fhi.isNaN || (fhi >= lo && flo <= hi) => f }
    val df =
      if (keep.isEmpty)
        spark.read.parquet(path).filter(col(c) >= lo && col(c) <= hi)
          .limit(0)
      else spark.read.parquet(keep: _*)
        .filter(col(c) >= lo && col(c) <= hi)
    (df, keep.size, files.size)
  }
}
