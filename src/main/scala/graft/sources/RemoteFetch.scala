package graft.sources

import java.io.{FileOutputStream, InputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** URL → staging-file ingest for remote lookup tables.
  *
  * Reference: `descargaExcel` pulls three shared lookup workbooks over
  * HTTPS and loads each into a frame (capital_sendas.py:29-65, with
  * the share-link `?download=1` normalization at :41-42). The engine
  * equivalent: fetch on the driver into a staging directory (lookups
  * are dim-sized — the fetch is not the distributed path), then load
  * the staged file through the normal distributed readers
  * ([[Xlsx.read]] / csv / parquet). The staged artifact also gives
  * re-runs a local copy to fall back on.
  */
object RemoteFetch {

  /** The reference's share-link normalization: drop the query string,
    * ask for the raw download (capital_sendas.py:41-42). */
  def normalizeShareUrl(url: String): String =
    url.split('?')(0) + "?download=1"

  /** Fetch `url` into `stagingDir/name` with bounded retries and an
    * atomic rename (partial downloads never surface under the final
    * name). Returns the staged path. Supports any stream-openable
    * scheme (https, http, file). */
  def fetchToStaging(url: String, stagingDir: String,
      name: Option[String] = None, retries: Int = 3,
      backoffMs: Long = 500): Path = {
    val dir = Paths.get(stagingDir)
    Files.createDirectories(dir)
    val fileName = name.getOrElse {
      val base = url.split('?')(0).split('/').last
      if (base.nonEmpty) base else "download"
    }
    val target = dir.resolve(fileName)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < retries) {
      val tmp = Files.createTempFile(dir, s".$fileName.", ".part")
      try {
        val in: InputStream = new java.net.URI(url).toURL.openStream()
        try {
          val out = new FileOutputStream(tmp.toFile)
          try {
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally out.close()
        } finally in.close()
        Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        return target
      } catch {
        case e: Throwable =>
          Files.deleteIfExists(tmp)
          lastErr = e
          attempt += 1
          if (attempt < retries) Thread.sleep(backoffMs * attempt)
      }
    }
    throw new java.io.IOException(
      s"fetchToStaging: $url failed after $retries attempts", lastErr)
  }

  /** The reference's `descargaExcel` end-to-end: normalize the share
    * link, stage the workbook, parse it distributed, promote the
    * in-sheet header. */
  def loadXlsxLookup(spark: SparkSession, url: String,
      stagingDir: String): DataFrame = {
    val staged = fetchToStaging(normalizeShareUrl(url), stagingDir)
    BatchLoad.promoteHeader(Xlsx.read(spark, Seq(staged.toString)))
  }
}
