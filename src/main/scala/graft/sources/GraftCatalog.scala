package graft.sources

import java.util

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL front door for [[Versioned]] tables — a DataSource V2
  * `TableCatalog` so a SQL user reaches every snapshot capability
  * through plain query text, including Spark's native time-travel
  * syntax:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", warehouseDir)
  *   spark.sql("SELECT * FROM graft.sales")                     // head
  *   spark.sql("SELECT * FROM graft.sales VERSION AS OF 3")     // commit v3
  *   spark.sql("SELECT * FROM graft.sales TIMESTAMP AS OF '…'") // as-of
  * }}}
  *
  * Identifiers map to table roots under the configured `warehouse`
  * directory (`graft.ns.t` → `<warehouse>/ns/t`). `loadTable` pins the
  * version AT RESOLUTION time — every query is a consistent snapshot
  * even while commits race it, the same guarantee [[Versioned.read]]
  * gives the Scala API.
  *
  * Execution reuses the snapshot read's DISTRIBUTED plan instead of
  * re-deriving one: the scan is a [[V1Scan]] whose relation builds
  * `Versioned.read(...)` — the union of explicit-schema parquet scans
  * plus the deletion-vector anti-join — so DV-masked and evolved
  * snapshots are exactly as correct through SQL as through the Scala
  * API, and the physical work stays whole-stage-codegen parquet
  * batches on executors (the RDD handoff carries no driver
  * materialization). Filter and column pushdown are real: the V2
  * pushdown calls land on the inner DataFrame, where Catalyst pushes
  * them into the parquet readers ([[translateFilter]] covers the
  * standard `sources.Filter` algebra; anything it can't express is
  * rejected back to Spark, which keeps it on top — double-filtering
  * safe, never wrong).
  *
  * Writes: `INSERT INTO` / `INSERT OVERWRITE` are supported and go
  * THROUGH [[Versioned.commit]] — the V1 write bridge's
  * `InsertableRelation` hands the fully-resolved micro-plan to the
  * same commit path every Scala caller uses, so SQL inserts get the
  * identical arbiter race loop, constraint enforcement, schema
  * drift/widening ledger, column-mapping physical naming, and change
  * feed. `ALTER TABLE … ADD/RENAME/DROP COLUMN` map onto the guarded
  * Versioned metadata commits (addColumn/renameColumn/dropColumn) —
  * full SQL schema evolution with the same tombstone and
  * column-mapping guarantees. CREATE/DROP TABLE stay Scala-API-only:
  * table creation IS a data commit here, and table removal is a
  * filesystem operation this catalog deliberately refuses to own.
  */
class GraftCatalog extends TableCatalog {
  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(sys.error(
      s"GraftCatalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catName

  private def pathOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name())).mkString("/")

  private def tableAt(ident: Identifier, version: Int): Table = {
    val spark = SparkSession.active
    new VersionedSqlTable(s"$catName.${ident.toString}",
      pathOf(ident), version,
      Versioned.schemaAt(spark, pathOf(ident), version))
  }

  /** Head read — the version pins here, at resolution. */
  override def loadTable(ident: Identifier): Table = {
    val head =
      try Versioned.latestVersion(pathOf(ident))
      catch { case _: Exception => -1 }
    if (head < 0) throw new NoSuchTableException(ident)
    tableAt(ident, head)
  }

  /** `VERSION AS OF <n>` — Spark hands the literal as a string. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException => sys.error(
        s"GraftCatalog: VERSION AS OF wants the integer commit " +
          s"version, got '$version'")
    }
    try { Versioned.schemaAt(SparkSession.active, pathOf(ident), v) }
    catch { case _: Exception => throw new NoSuchTableException(ident) }
    tableAt(ident, v)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch;
    * manifests stamp millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    tableAt(ident, Versioned.versionAt(pathOf(ident), timestamp / 1000L))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = java.nio.file.Paths.get(
      (warehouse +: namespace).mkString("/"))
    if (!java.nio.file.Files.isDirectory(dir))
      throw new NoSuchNamespaceException(namespace)
    val out = scala.collection.mutable.ArrayBuffer.empty[Identifier]
    val s = java.nio.file.Files.list(dir)
    try s.forEach { p =>
      if (java.nio.file.Files.isDirectory(p.resolve("_versions")))
        out += Identifier.of(namespace, p.getFileName.toString)
    } finally s.close()
    out.toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-only SQL: create tables with Versioned.commit")

  /** SQL schema evolution — `ALTER TABLE … ADD/RENAME/DROP COLUMN`
    * map onto the GUARDED Versioned entry points (each one its own
    * metadata commit with its own race loop, tombstones, and
    * column-mapping bookkeeping — the generic change never bypasses a
    * guard). Everything else (SET properties, type changes — widening
    * happens implicitly at data commits) is unsupported and loud. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val path = pathOf(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "GraftCatalog: nested ADD COLUMN is not supported")
        Versioned.addColumn(path, add.fieldNames()(0),
          add.dataType().sql): Unit
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames().length == 1,
          "GraftCatalog: nested RENAME COLUMN is not supported")
        Versioned.renameColumn(path, ren.fieldNames()(0),
          ren.newName()): Unit
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "GraftCatalog: nested DROP COLUMN is not supported")
        Versioned.dropColumn(path, del.fieldNames()(0)): Unit
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: unsupported ALTER TABLE change $other — " +
          "type widening happens implicitly at data commits; " +
          "constraints via Versioned.addConstraint")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-only SQL: Versioned has no table drop")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-only SQL: move the table directory instead")
}

/** One pinned snapshot (table path + commit version) as a V2 table.
  * Reads serve the PINNED version (snapshot-consistent per query);
  * writes always commit against the live head — the commit loop
  * re-reads it, exactly like the Scala API. */
private[sources] final class VersionedSqlTable(ident: String,
    path: String, pinned: Int, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def version(): String = pinned.toString
  override def capabilities(): util.Set[TableCapability] =
    // V1_BATCH_WRITE (not BATCH_WRITE): the write IS a V1Write
    // bridge — Spark's exec path calls toInsertableRelation only
    // when the table declares the V1 capability
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new VersionedScanBuilder(path, pinned, tableSchema)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new VersionedWriteBuilder(path)
}

/** INSERT INTO (append) / INSERT OVERWRITE (truncate) as ONE
  * [[Versioned.commit]] each — the V1 write bridge: Spark resolves
  * and aligns the query against the table schema, then hands the
  * frame to `InsertableRelation.insert`, which is exactly the Scala
  * commit path (arbiter race loop, txn ledger, constraints,
  * widening, column mapping, change feed — nothing bypassed). */
private[sources] final class VersionedWriteBuilder(path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var overwrite = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation
          : org.apache.spark.sql.sources.InsertableRelation =
        new org.apache.spark.sql.sources.InsertableRelation {
          override def insert(data: DataFrame, ow: Boolean): Unit =
            Versioned.commit(data, path,
              overwrite = overwrite || ow): Unit
        }
    }
}

/** V2 pushdown surface: accepted filters and the pruned column set
  * are REPLAYED onto the inner snapshot DataFrame, where Catalyst
  * pushes them into the parquet scans — the explain-visible
  * `PushedFilters` a SQL user expects from a real table. */
private[sources] final class VersionedScanBuilder(path: String,
    pinned: Int, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rejected) = filters.partition(f =>
      GraftCatalog.translateFilter(f).isDefined)
    accepted = ok
    rejected // Spark keeps these on top
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new VersionedV1Scan(path, pinned, required, accepted)
}

/** The scan: a [[V1Scan]] bridging to the snapshot DataFrame's RDD.
  * The handoff is plan-level — `buildScan` hands Spark the DISTRIBUTED
  * row RDD of the filtered, pruned snapshot read (parquet batches +
  * DV anti-join on executors); nothing collects on the driver. */
private[sources] final class VersionedV1Scan(path: String, pinned: Int,
    required: StructType, accepted: Array[Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-versioned $path v$pinned " +
      s"pushed=[${accepted.mkString(", ")}]"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val rel = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def needConversion: Boolean = true
      override def buildScan(): org.apache.spark.rdd.RDD[
          org.apache.spark.sql.Row] = {
        val spark = context.sparkSession
        var df = Versioned.read(spark, path, Some(pinned))
        // replay what the V2 pushdown ACCEPTED: rejected filters are
        // Spark's to apply on top, so no filter evaluates zero times
        accepted.flatMap(GraftCatalog.translateFilter)
          .foreach(c => df = df.filter(c))
        df.select(required.fieldNames.map(org.apache.spark.sql
          .functions.col).toIndexedSeq: _*).rdd
      }
    }
    rel.asInstanceOf[T]
  }
}

object GraftCatalog {
  import org.apache.spark.sql.functions.{col, lit, not}

  /** `sources.Filter` → `Column` for the standard pushdown algebra.
    * None = inexpressible here (e.g. AlwaysTrue subtypes added later)
    * → rejected back to Spark, which evaluates it post-scan. */
  private[sources] def translateFilter(f: Filter): Option[Column] =
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) =>
        Some(col(a).isin(vs.toIndexedSeq.map(lit(_)): _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) =>
        Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) => for {
        lc <- translateFilter(l); rc <- translateFilter(r)
      } yield lc && rc
      case sources.Or(l, r) => for {
        lc <- translateFilter(l); rc <- translateFilter(r)
      } yield lc || rc
      case sources.Not(c) => translateFilter(c).map(not)
      case _ => None
    }

  /** Wire the catalog onto a LIVE session (catalogs resolve lazily,
    * so a runtime conf set is enough — no session rebuild). */
  def register(spark: SparkSession, catalogName: String,
      warehouseDir: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$catalogName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalogName.warehouse",
      warehouseDir)
  }
}
