package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Multi-file batch loading: pick the latest batch by a filename date
  * token, promote an in-data header row, and append batches with
  * cross-batch dedup.
  *
  * Reference: capital_sendas.py:80-107 — lists `produccion_*.xlsx`,
  * keeps files whose `_`-token-1 (yyyymm) equals the max, promotes
  * the first data row to column names, and anti-joins each new batch
  * against what is already loaded. File selection is driver-side name
  * logic (as in the reference); everything row-shaped is distributed.
  */
object BatchLoad {

  final case class Batch(files: Seq[String], anoMes: String, mes: Int)

  /** Latest batch among `paths` by the yyyymm prefix of the
    * `tokenIdx`-th `sep`-separated filename token. Files of the max
    * yyyymm sort descending (reference keeps that order). */
  def latestBatch(paths: Seq[String], sep: String = "_",
      tokenIdx: Int = 1): Option[Batch] = {
    val keyed = paths.flatMap { p =>
      val name = p.split('/').last
      val toks = name.split(sep)
      if (toks.length > tokenIdx && toks(tokenIdx).length >= 6)
        Some(toks(tokenIdx).take(6) -> p)
      else None
    }
    if (keyed.isEmpty) None
    else {
      val maxKey = keyed.map(_._1).max
      val files = keyed.filter(_._1 == maxKey).map(_._2)
        .sorted(Ordering[String].reverse)
      Some(Batch(files, maxKey, maxKey.takeRight(2).toInt))
    }
  }

  /** Promote the first input row to column names and drop it.
    *
    * For sheets that arrive headerless (the reference's xlsx loads
    * put the header in row 0). The header is the first row of
    * partition 0 — read with a single-partition `runJob`, NOT a
    * zipWithIndex (which launches a per-partition count pass over the
    * whole input) — and only partition 0 drops its first row; every
    * other partition streams through untouched. One O(1) job total.
    * All columns must be strings.
    */
  def promoteHeader(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    require(df.schema.fields.forall(_.dataType == StringType),
      "promoteHeader expects all-string columns (raw sheet load)")
    val rdd = df.rdd
    require(rdd.getNumPartitions > 0, "promoteHeader: empty input")
    val firstOfP0 = spark.sparkContext.runJob(
      rdd, (it: Iterator[org.apache.spark.sql.Row]) => it.take(1).toSeq,
      Seq(0)).head
    val headerNames = firstOfP0 match {
      case Seq(row) => row.toSeq.map(v => if (v == null) "" else v.toString)
      case _ => throw new IllegalArgumentException(
        "promoteHeader: partition 0 is empty (header must lead the first file)")
    }
    val rows = rdd.mapPartitionsWithIndex(
      (i, it) => if (i == 0) it.drop(1) else it,
      preservesPartitioning = true)
    spark.createDataFrame(rows, df.schema).toDF(headerNames: _*)
  }

  /** Append a new batch to the accumulated frame, dropping rows that
    * already exist (anti-join on all columns, null-safe) — the
    * reference's incremental concat (capital_sendas.py:112-125). */
  def appendIncremental(acc: Option[DataFrame], batch: DataFrame): DataFrame =
    acc match {
      case None => batch
      case Some(a) =>
        import graft.ops.EtlOps.RichDF
        a.unionByName(batch.antiJoinAll(a))
    }

  /** Drift-tolerant append: monthly sheets gain and lose columns over
    * the years; align both sides on the union of columns (missing →
    * null) before the same all-columns dedup append. Column ORDER
    * follows the accumulated side, new columns append at the end. */
  def appendWithDrift(acc: Option[DataFrame], batch: DataFrame): DataFrame =
    acc match {
      case None => batch
      case Some(a) =>
        import graft.ops.EtlOps.RichDF
        import org.apache.spark.sql.functions.{col, lit}
        val newCols = batch.columns.filterNot(a.columns.contains)
        val aAll = newCols.foldLeft(a)((d, c) =>
          d.withColumn(c, lit(null).cast(batch.schema(c).dataType)))
        val bAll = aAll.columns.toIndexedSeq.map { c =>
          if (batch.columns.contains(c)) col(c)
          else lit(null).cast(a.schema(c).dataType).as(c)
        }
        aAll.unionByName(batch.select(bAll: _*).antiJoinAll(aAll))
    }

  /** Load a latest-batch set of CSV files with header promotion off
    * (header comes as data) or on. The reference's xlsx sheets also
    * load natively — see [[loadLatestXlsx]]. */
  def loadLatestCsv(spark: SparkSession, paths: Seq[String],
      headerInData: Boolean): Option[DataFrame] =
    latestBatch(paths).map { b =>
      b.files.foldLeft(Option.empty[DataFrame]) { (acc, f) =>
        val raw = spark.read
          .option("header", (!headerInData).toString)
          .option("inferSchema", "false")
          .csv(f)
        val df = if (headerInData) promoteHeader(raw) else raw
        Some(appendIncremental(acc, df))
      }.get
    }

  /** Latest-batch xlsx load — the reference's actual input format
    * (`read_excel` of `produccion_*.xlsx`, capital_sendas.py:46,
    * :101-107): pick the newest yyyymm batch, parse each workbook
    * distributed ([[Xlsx.read]]), promote the in-sheet header, and
    * append with cross-batch dedup. */
  def loadLatestXlsx(spark: SparkSession, paths: Seq[String]):
      Option[DataFrame] =
    latestBatch(paths).map { b =>
      b.files.foldLeft(Option.empty[DataFrame]) { (acc, f) =>
        val df = promoteHeader(Xlsx.read(spark, Seq(f)))
        Some(appendIncremental(acc, df))
      }.get
    }
}
