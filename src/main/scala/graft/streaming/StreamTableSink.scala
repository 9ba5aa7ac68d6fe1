package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

import graft.sources.Versioned

/** `spark.writeStream.toTable("g.t")` — exactly-once streaming
  * writes through the table NAME, the write-side complement of the
  * catalog's `readStream.table` support: a SQL-surface user can now
  * both consume and PRODUCE versioned tables without a line of Scala.
  *
  * Shape (the DSv2 `StreamingWrite` contract):
  *
  *  1. executors stage each epoch's rows as parquet parts under
  *     `<table>/.stream_stage/<queryId>/e<epochId>/` — written with
  *     Spark's OWN row codec ([[org.apache.spark.sql.execution
  *     .datasources.parquet.ParquetWriteSupport]]), so types
  *     round-trip exactly as a batch write would store them. File
  *     names carry the task id, so speculative/retried tasks never
  *     collide; only files the driver ACKNOWLEDGED (commit messages)
  *     are committed.
  *  2. the driver's epoch commit re-reads the acknowledged files as
  *     ONE distributed frame and lands it through
  *     [[Versioned.commitTxn]] with the idempotence token
  *     `stream:<queryId>:<epochId>` — the SAME guarded commit path
  *     every batch write uses: CHECK constraints, schema ledger,
  *     column mapping, change feed, optimistic-concurrency races —
  *     nothing re-implemented. The token makes crash-replays
  *     exactly-once (a replayed epoch finds its token in the ledger
  *     and skips; the manifest ledger IS the sink's transaction log,
  *     same as [[VersionedSink]]).
  *
  * Cost model: one extra parquet round-trip per MICRO-BATCH (stage →
  * re-read → commit), never per table — the price of funnelling
  * every write through the one guarded commit path. The stage dir is
  * removed after every commit (and on abort); a crash can orphan one
  * epoch dir, reclaimed by the next successful epoch of the same
  * query (the per-query stage root is re-listed, stale epoch dirs
  * below the committed watermark are dropped).
  *
  * Output modes: `append` commits each epoch as an append;
  * `complete` (the builder's truncate flag) commits each epoch as an
  * overwrite — a streaming aggregate materializes as a versioned
  * table whose history is one snapshot per trigger.
  */
object StreamTableSink {

  private[graft] def stageRoot(path: String, queryId: String): String =
    s"$path/.stream_stage/$queryId"

  /** One staged part file, acknowledged by its writer task. */
  private[graft] final case class StagedFile(file: String)
      extends WriterCommitMessage

  /** Hadoop conf for [[org.apache.spark.sql.execution.datasources
    * .parquet.ParquetWriteSupport]] — the keys `prepareWrite` would
    * have copied from the session (init asserts the timestamp type
    * key is present). Pinned, not session-derived: executors have no
    * session, and the staged bytes are re-read by the committing
    * session immediately, so the only contract that matters is
    * Spark 4 defaults (UTC micros, no legacy layout, CORRECTED
    * rebase — same as every other parquet file this engine writes). */
  private def writeConf(schema: StructType): Configuration = {
    val conf = new Configuration()
    org.apache.spark.sql.execution.datasources.parquet
      .ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, "UTC")
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    // the schema converter parses this with toBoolean and its
    // ConfigEntry default stringifies to "null" — must be explicit
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf
  }

  /** Executor-side epoch staging: one parquet part per task, written
    * through Spark's own WriteSupport (no UnsafeRow copies leak:
    * ParquetWriteSupport reads fields positionally per row).
    *
    * File names carry a per-RUN salt beside the partition/task ids:
    * task ids restart from 0 in a new application, so a crash-replayed
    * epoch could otherwise collide with the crashed run's leftover
    * part file in the same `e<epochId>` dir — and ParquetWriter's
    * CREATE mode would throw, burning task retries before the replay
    * lands. The salt is drawn once on the driver (the factory is
    * constructed there and serialized to executors), so within one
    * run the partition/task ids keep retried tasks apart exactly as
    * before. */
  private[graft] final class StageWriterFactory(stageRoot: String,
      schema: StructType) extends StreamingDataWriterFactory
      with org.apache.spark.sql.connector.write.DataWriterFactory {
    private val runSalt: String =
      java.util.UUID.randomUUID().toString.take(8)
    /** Batch writes stage as epoch 0 — the one-shot shape
      * [[graft.sources.DynamicOverwriteBatch]] commits. */
    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] =
      createWriter(partitionId, taskId, 0L)
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] = {
      val dir = s"$stageRoot/e$epochId"
      Files.createDirectories(Paths.get(dir))
      val file = s"$dir/part-$partitionId-$taskId-$runSalt.parquet"
      new DataWriter[InternalRow] {
        // builder subclass: the only public way to hand ParquetWriter
        // a custom WriteSupport
        private final class B(p: org.apache.hadoop.fs.Path)
            extends org.apache.parquet.hadoop.ParquetWriter.Builder[
              InternalRow, B](p) {
          override def self(): B = this
          override def getWriteSupport(c: Configuration)
              : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
            new org.apache.spark.sql.execution.datasources.parquet
              .ParquetWriteSupport
        }
        private var n = 0L
        // Path from the File's URI, not "file://$file" string concat:
        // Hadoop parses the string as a URI, so a warehouse path
        // carrying URI-significant characters (spaces, %, #) would be
        // mangled; File.toURI percent-escapes them correctly.
        private lazy val writer = new B(
          new org.apache.hadoop.fs.Path(new java.io.File(file).toURI))
          .withConf(writeConf(schema))
          .withCompressionCodec(org.apache.parquet.hadoop.metadata
            .CompressionCodecName.SNAPPY)
          .build()
        override def write(row: InternalRow): Unit = {
          writer.write(row); n += 1
        }
        override def commit(): WriterCommitMessage = {
          if (n > 0) { writer.close(); StagedFile(file) }
          else StagedFile("") // empty task: nothing staged, nothing acked
        }
        override def abort(): Unit = {
          try if (n > 0) writer.close()
          finally Files.deleteIfExists(Paths.get(file)): Unit
        }
        override def close(): Unit = ()
      }
    }
  }

  /** The driver half: epoch commits through the guarded engine path. */
  final class VersionedStreamingWrite(path: String, schema: StructType,
      queryId: String, truncate: Boolean) extends StreamingWrite {
    private val root = stageRoot(path, queryId)

    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : StreamingDataWriterFactory =
      new StageWriterFactory(root, schema)

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.collect {
        case StagedFile(f) if f.nonEmpty => f }
      val spark = SparkSession.active
      // an empty APPEND epoch commits nothing (no version churn; the
      // skip is idempotent under replay because it writes nothing) —
      // an empty COMPLETE epoch is a real truncate and must land
      if (files.nonEmpty || truncate) {
        val df =
          if (files.nonEmpty)
            spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            schema)
        val token = Some(s"stream:$queryId:$epochId")
        // the table's declared partition policy (CREATE TABLE …
        // PARTITIONED BY) binds streaming epochs exactly like batch
        // INSERTs — hive layout, per-dir spec, pruning intact
        Versioned.tableProps(path).get("partCol") match {
          case Some(s) => Versioned.commitPartitionedSpec(df, path,
            Versioned.parsePartSpec(s), overwrite = truncate,
            txn = token): Unit
          case None => Versioned.commitTxn(df, path,
            overwrite = truncate, txn = token): Unit
        }
      }
      cleanupThrough(epochId)
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit =
      dropDir(Paths.get(root, s"e$epochId"))

    /** Drop this epoch's stage dir and any STALE sibling an earlier
      * crash orphaned (their epochs are ≤ ours: the engine commits
      * epochs in order, so anything at or below the just-committed
      * id is either committed — token in the ledger — or aborted). */
    private def cleanupThrough(epochId: Long): Unit = {
      val r = Paths.get(root)
      if (!Files.isDirectory(r)) return
      val ls = Files.list(r)
      try ls.iterator().forEachRemaining { d =>
        val n = d.getFileName.toString
        if (n.startsWith("e") &&
            n.drop(1).toLongOption.exists(_ <= epochId))
          dropDir(d)
      } finally ls.close()
    }

    private def dropDir(p: java.nio.file.Path): Unit = {
      if (!Files.exists(p)) return
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q): Unit)
      finally w.close()
    }
  }
}
