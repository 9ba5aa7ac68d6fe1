package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, OutputStreamWriter}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Dependency-free xlsx (ECMA-376 OOXML SpreadsheetML) read/write on
  * the JDK only: `java.util.zip` for the container, StAX
  * (`javax.xml.stream`) for the sheet XML.
  *
  * The reference's entire I/O surface is Excel — `read_excel` loads of
  * `produccion_*.xlsx` / `bases_norte.xlsx` and the final
  * `COPY ... TO 'capital_sendas.xlsx'` export
  * (capital_sendas.py:46, :599-603). Here:
  *
  *  - READ is distributed: Spark's `binaryFile` source ships each
  *    workbook's bytes to an executor, which parses it with StAX —
  *    many monthly sheets parse in parallel, none touch the driver.
  *    Cells come back as raw strings (shared-string-resolved); date
  *    serials stay numeric text — convert with [[serialToTimestamp]].
  *  - WRITE streams `toLocalIterator` into a single workbook on the
  *    driver: an xlsx is a report artifact (the reference writes one
  *    final sheet), not a warehouse format; at scale the data path is
  *    parquet and this is the last-mile export.
  */
object Xlsx {

  /** "AB12" → 0-based column index (27). */
  def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def readEntries(bytes: Array[Byte],
      wanted: String => Boolean): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e: ZipEntry = zin.getNextEntry
    while (e != null) {
      if (wanted(e.getName)) {
        val buf = new ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = zin.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = zin.read(tmp) }
        out += e.getName -> buf.toByteArray
      }
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  private def staxReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // untrusted workbook content: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = staxReader(bytes)
    val out = Vector.newBuilder[String]
    var inSi = false
    val cur = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => cur.append(r.getElementText)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += cur.toString
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Parse the first worksheet of a workbook's bytes into rows of
    * strings. Cell gaps (skipped column refs) become empty strings;
    * shared strings and inline strings resolve to their text; numbers
    * (incl. date serials) keep their literal form. */
  def parseSheet(bytes: Array[Byte]): Vector[Vector[String]] = {
    val entries = readEntries(bytes, n =>
      n == "xl/sharedStrings.xml" ||
        (n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml")))
    val shared = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetName = entries.keys.filter(_.startsWith("xl/worksheets/"))
      .toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException("xlsx: no worksheet"))
    val r = staxReader(entries(sheetName))
    val rows = Vector.newBuilder[Vector[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellIdx = -1
    var cellType = ""
    var inV = false
    var inIs = false
    val v = new StringBuilder
    def put(idx: Int, value: String): Unit = {
      while (row.length < idx) row += ""
      if (row.length == idx) row += value else row(idx) = value
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" if row != null =>
              val ref = r.getAttributeValue(null, "r")
              cellIdx = if (ref != null) colIndex(ref) else row.length
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              v.clear()
            case "is" => inIs = true
            case "v" => inV = true
            case "t" if inIs => v.append(r.getElementText)
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "is" => inIs = false
            case "c" if cellIdx >= 0 =>
              val value = cellType match {
                case "s" =>
                  val i = v.toString.trim.toInt
                  if (i < shared.length) shared(i) else ""
                case _ => v.toString
              }
              put(cellIdx, value)
              cellIdx = -1
            case "row" if row != null =>
              rows += row.toVector; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** WIDTH-ONLY sheet scan: the widest row's cell count, from one
    * streaming pass over the sheet XML that tracks column indexes
    * only — no shared-strings parse, no value assembly, no row
    * buffering. The schema-agreement job ([[read]]) needs exactly
    * this, so it no longer pays a full [[parseSheet]] per file just
    * to learn the column count (two passes over the XML are
    * structurally required — the global width must exist before any
    * row can pad — but the first pass is now a counter). */
  private[sources] def sheetWidth(bytes: Array[Byte]): Int = {
    val entries = readEntries(bytes, n =>
      n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
    val sheetName = entries.keys.toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException("xlsx: no worksheet"))
    val r = staxReader(entries(sheetName))
    var width = 0
    var rowCells = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => rowCells = 0
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              rowCells =
                (if (ref != null) colIndex(ref) + 1 else rowCells + 1)
                  .max(rowCells)
              width = math.max(width, rowCells)
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    width
  }

  /** Distributed read: every workbook in `paths` is shipped whole to
    * an executor (binaryFile) and StAX-parsed there. The column count
    * is the widest row across all files; short rows pad with "". All
    * columns are strings (`_c0`.._cN) — compose with
    * [[BatchLoad.promoteHeader]] when row 0 carries the header. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .load(paths: _*)
      .select("path", "content")
      .as[(String, Array[Byte])]
    // one small job to agree on width — a count-only streaming scan
    // of each sheet's XML ([[sheetWidth]]), not a full parse; file
    // count is batch-sized, not row-sized
    val width = bin.map { case (_, bytes) => sheetWidth(bytes) }
      .collect().maxOption.getOrElse(0)
    require(width > 0, "xlsx read: no cells in any input")
    val schema = StructType((0 until width)
      .map(i => StructField(s"_c$i", StringType, nullable = true)))
    val rows = bin.flatMap { case (_, bytes) =>
      parseSheet(bytes).map(r => Row.fromSeq(r.padTo(width, "")))
    }(org.apache.spark.sql.Encoders.row(schema))
    rows.toDF()
  }

  /** Excel date serial (days since 1899-12-30, fraction = time of
    * day) → timestamp, the conversion pandas `read_excel` applies to
    * date-styled cells. String column in, timestamp out. */
  def serialToTimestamp(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val days = c.cast("double")
    to_timestamp(lit("1899-12-30")) +
      make_dt_interval(lit(0), lit(0), lit(0), days * 86400d)
  }

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ()
      case c => b.append(c)
    }
    b.toString
  }

  private def colRef(idx: Int): String = {
    var i = idx + 1; val b = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; b.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    b.toString
  }

  /** Last-mile export: stream `df` into a single one-sheet workbook at
    * `path` (driver-side `toLocalIterator` — constant memory; an xlsx
    * is a report artifact like the reference's capital_sendas.xlsx,
    * not a warehouse format). Numeric columns write as numbers,
    * everything else as inline strings; row 1 is the header. */
  def write(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields
    val numeric = fields.map(_.dataType match {
      case _: NumericType => true
      case _ => false
    })
    val zout = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      val w = new OutputStreamWriter(zout, "UTF-8")
      w.write(content); w.flush(); zout.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    zout.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new OutputStreamWriter(zout, "UTF-8")
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def writeRow(rn: Int, cells: Seq[(String, Boolean)]): Unit = {
      w.write(s"""<row r="$rn">""")
      cells.zipWithIndex.foreach { case ((value, isNum), i) =>
        if (value != null) {
          val ref = colRef(i) + rn
          if (isNum) w.write(s"""<c r="$ref"><v>${esc(value)}</v></c>""")
          else w.write(
            s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(value)}</t></is></c>""")
        }
      }
      w.write("</row>")
    }
    writeRow(1, fields.map(f => (f.name, false)).toSeq)
    var rn = 2
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      writeRow(rn, (0 until r.length).map { i =>
        (if (r.isNullAt(i)) null else r.get(i).toString, numeric(i))
      })
      rn += 1
    }
    w.write("</sheetData></worksheet>")
    w.flush(); zout.closeEntry(); zout.close()
  }
}
