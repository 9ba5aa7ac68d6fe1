package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Export path: the reference's publish step (capital_sendas.py:571-603)
  * — format date columns as strings, select the publish column subset,
  * and write csv/json/xlsx (the reference's own
  * `COPY ... TO 'capital_sendas.xlsx'`, via [[Xlsx.write]]).
  */
object Export {

  /** Publish projection: date columns → `fmt` strings (nulls stay
    * null), then the exact column subset in order. Column names are
    * taken LITERALLY — the reference publishes columns like
    * `DX_PRINCIPAL.0` and `GRUPO QX` (capital_sendas.py:585-593),
    * which a bare col() would mis-parse as struct access. */
  def publish(df: DataFrame, dateCols: Seq[String], fmt: String,
      columns: Seq[String]): DataFrame = {
    def lit(name: String) = col(s"`$name`")
    val formatted = dateCols.foldLeft(df)((d, c) =>
      d.withColumn(c, date_format(lit(c), fmt)))
    formatted.select(columns.map(lit): _*)
  }

  /** Header'd CSV. `singleFile` coalesces to one part — only for
    * small driver-style exports (the reference's comprobar.csv);
    * large outputs keep their partitioning. */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false,
      delimiter: String = ","): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite")
      .option("header", "true").option("delimiter", delimiter)
      .csv(path)
  }

  /** Newline-delimited JSON export. */
  def json(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite").json(path)
  }

  /** Single-workbook xlsx export — the reference's final publish
    * format (capital_sendas.py:599-603). Report-sized outputs only:
    * the rows stream through the driver ([[Xlsx.write]]). */
  def xlsx(df: DataFrame, path: String): Unit = Xlsx.write(df, path)

  /** Hive-layout partitioned parquet lake write. At 100 TB the
    * partition column IS the coarse index: a day/source-partitioned
    * layout turns date-ranged scans into directory listings
    * (PartitionFilters prune before any IO). The repartition on the
    * partition columns routes each partition's rows to one task —
    * one file per partition per write instead of one per (task ×
    * partition), which is the small-file problem at its source;
    * `maxRecordsPerFile` re-splits only genuinely oversized
    * partitions. */
  def partitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    df.repartition(partitionCols.map(c => col(s"`$c`")): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory (or one
    * partition of it) into ~`targetFileBytes` files. Streaming sinks
    * and incremental appends accrete files; a scan over 10k tiny
    * files pays 10k opens and a task per file, so periodic compaction
    * is part of the lake contract. The file count comes from the
    * CURRENT on-disk size (cheap driver-side listing, no data read),
    * then one repartition rewrite. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.hadoop.fs.Path
    // Resolve through the Hadoop FileSystem of the path's scheme —
    // java.io.File would silently size a non-local path as 0 bytes
    // (→ nFiles=1) and its renames would fail.
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(dir).getLength
    val nFiles = math.max(1, (bytes / targetFileBytes).toInt +
      (if (bytes % targetFileBytes > 0) 1 else 0))
    val df = spark.read.parquet(path)
    val tmp = new Path(path + "__compact_tmp")
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    // Swap by rename: the NEW data is fully written before the old is
    // touched, so every byte exists on disk at all times. A crash
    // between the two renames leaves the table readable at
    // `path__compact_old` (recover by renaming it back) — directory
    // renames aren't jointly atomic on HDFS/posix, so that one-step
    // recovery window is the best a rename swap can do.
    val old = new Path(path + "__compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(dir, old), s"compact: cannot move $path aside")
    require(fs.rename(tmp, dir), s"compact: cannot move $tmp into place")
    fs.delete(old, true)
    ()
  }

  /** Incremental lake refresh: overwrite ONLY the partitions present
    * in `df` (dynamic partition overwrite), leaving all others
    * untouched — the daily-load idiom. A static overwrite here would
    * drop the whole table for a one-day refresh. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    df.repartition(partitionCols.map(c => col(s"`$c`")): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
