package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs batched per partition.
  *
  * Images decode for real: [[decodeImages]] runs `javax.imageio`
  * (JDK-built-in PNG/JPEG/GIF/BMP codecs) per partition on the
  * executors — dimensions, luminance histogram, mean luminance —
  * with corrupt payloads degrading to a null row, never a task
  * failure. Audio/video codecs aren't in the JVM, so [[fakeDecode]]
  * remains the deterministic stand-in for those modalities (and the
  * cross-engine oracle check, since DuckDB can reproduce it); a real
  * codec plugs into the same mapPartitions shape as decodeImages.
  */
object Multimodal {

  /** Canonical multimodal record schema: id + modality + raw payload +
    * typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))), nullable = true)))

  /** Wrap a text/binary-bearing DataFrame into the media schema.
    * `bytesCol` may be string (cast) or binary. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String,
      modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(bytesCol).cast("binary").as("content"),
      struct(
        length(col(bytesCol).cast("binary")).cast("long").as("n_bytes"),
        lit(mime).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("meta"))

  /** Deterministic stand-in for a real decoder: 8 pseudo-features from
    * the payload's md5. Pure Column expressions so the "decode" stays
    * inside codegen; a real codec would swap this for a per-partition
    * batched call. */
  def fakeDecode(content: org.apache.spark.sql.Column, dim: Int = 8)
      : org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      conv(substring(md5(concat(hex(content), i.cast("string"))), 1, 8),
        16, 10).cast("double") / lit(4294967296.0))

  /** Real image decode over the media schema: `javax.imageio` per
    * partition on the executors (PNG/JPEG/GIF/BMP ship with the JDK —
    * no native libs). Emits dimensions, an `histBins`-bin luminance
    * histogram (fractions, Rec.601 luma), and mean luminance in
    * [0,1]. Undecodable payloads yield (-1, -1, null, null) rather
    * than failing the task — at 100 TB some images WILL be corrupt.
    * One streaming iterator pass, one decoded image in memory at a
    * time per task. */
  def decodeImages(media: DataFrame, histBins: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null || bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null)
            (id, -1, -1, null: Array[Double], null: java.lang.Double)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val hist = new Array[Long](histBins)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) * 299 +
                  ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                hist(lum * histBins / 256) += 1
                sum += lum
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            (id, w, h, hist.map(_.toDouble / n),
              java.lang.Double.valueOf(sum / n / 255.0))
          }
        }
      }.toDF("media_id", "width", "height", "lum_hist", "lum_mean")
  }

  /** Real image resize over the media schema: decode with
    * `javax.imageio`, scale onto a `targetW`×`targetH` canvas with
    * bilinear interpolation (`java.awt.Graphics2D` — JDK built-in,
    * no native libs), re-encode as PNG. Same per-partition streaming
    * shape and corrupt-payload degradation (null bytes) as
    * [[decodeImages]]; one image in memory at a time per task. */
  def resizeImages(media: DataFrame, targetW: Int,
      targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null || bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null) (id, null: Array[Byte])
          else {
            val out = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            (id, buf.toByteArray)
          }
        }
      }.toDF("media_id", "resized")
  }

  /** Deterministic RGB test pattern for image id `m`, encoded as a
    * REAL PNG through `javax.imageio` — the checked-path corpus
    * generator. Dimensions and every pixel are integer functions of
    * (m, x, y), so an oracle that cannot run a codec can still
    * reproduce the DECODED pixels exactly (PNG is lossless: encode →
    * decode round-trips TYPE_INT_RGB bit-exactly). */
  def patternPng(m: Long): Array[Byte] = {
    val w = (16 + m % 17).toInt
    val h = (16 + m % 13).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((m * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((m * 11 + x + y * 2) % 256).toInt
        val b = ((m * 13 + x * 5 + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** Deterministic RGB test pattern for image id `m`, encoded as a
    * REAL (lossy) JPEG through `javax.imageio` — the corpus generator
    * for the checked JPEG path. The SMOOTH gradient (no hard edges)
    * keeps quantization error small, but unlike [[patternPng]] no
    * codec-less oracle can reproduce the decoded pixels: JPEG output
    * is encoder-defined. The checked contract is therefore
    * decode-ONCE-compare-twice (see q_jpeg_decode): both sides of the
    * compare run THIS encoder + the JDK decoder on identical inputs,
    * which is bit-deterministic within one runtime. */
  def patternJpeg(m: Long): Array[Byte] = {
    val w = (24 + m % 13).toInt
    val h = (24 + m % 11).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // smooth gradients (linear in x, y) — JPEG-friendly content
        val r = (((m * 5) % 64) + x * 3 + y * 2).toInt.min(255)
        val g = (((m * 3) % 64) + x * 2 + y * 3).toInt.min(255)
        val b = (((m * 7) % 64) + x + y).toInt.min(255)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  /** Real image decode to integer luma-histogram features:
    * (media_id, width, height, h00..h{bins-1}) with
    * luma = (299·r + 587·g + 114·b) / 1000 (integer division) and
    * bucket = luma·bins / 256 — all-integer, so two decodes of the
    * same bytes agree bit-exactly on any engine. Per-partition
    * ImageIO streaming like [[decodeImages]]; corrupt payloads
    * degrade to (-1, -1, zero histogram), never task failures. */
  def decodeLumaHist(media: DataFrame, bins: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val decoded = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null || bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null) (id, -1, -1, Array.fill(bins)(0L))
          else {
            val w = img.getWidth
            val h = img.getHeight
            val hist = Array.fill(bins)(0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                val luma = (299 * r + 587 * g + 114 * b) / 1000
                hist(luma * bins / 256) += 1L
                x += 1
              }
              y += 1
            }
            (id, w, h, hist)
          }
        }
      }.toDF("media_id", "width", "height", "hist")
    decoded.select((Seq(col("media_id"), col("width"), col("height")) ++
      (0 until bins).map(i =>
        element_at(col("hist"), i + 1).as(f"h$i%02d"))): _*)
  }

  /** Real image decode to a canonical pixel transcript: (media_id,
    * width, height, pixel_hex) where pixel_hex is the row-major
    * lowercase `rrggbb` hex of every decoded pixel — the form an
    * engine without a codec can reconstruct and hash. Same
    * per-partition streaming shape and corrupt-payload degradation
    * ((-1, -1, null)) as [[decodeImages]]. */
  def decodePixelHex(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null || bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null) (id, -1, -1, null: String)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val sb = new java.lang.StringBuilder(w * h * 6)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y) & 0xffffff
                val s = Integer.toHexString(rgb)
                var pad = 6 - s.length
                while (pad > 0) { sb.append('0'); pad -= 1 }
                sb.append(s)
                x += 1
              }
              y += 1
            }
            (id, w, h, sb.toString)
          }
        }
      }.toDF("media_id", "width", "height", "pixel_hex")
  }

  /** Deterministic ANIMATED multi-frame GIF for media id `m`, encoded
    * through `javax.imageio`'s sequence writer — the checked-path
    * corpus generator for [[demuxGifFrames]]. Frames are
    * TYPE_BYTE_INDEXED over a 256-gray identity palette, so the GIF
    * encoder stores the index bytes verbatim (no quantization): every
    * decoded pixel equals the arithmetic pattern
    * gray = (m·7 + f·31 + x·3 + y·5) mod 256, and a codec-less oracle
    * reproduces the transcript exactly. Frame count 2 + m mod 4. */
  def patternGif(m: Long): Array[Byte] = {
    val w = (10 + m % 7).toInt
    val h = (10 + m % 5).toInt
    val nFrames = (2 + m % 4).toInt
    val gray = (0 until 256).map(_.toByte).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            ((m * 7 + f * 31 + x * 3 + y * 5) % 256).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    buf.toByteArray
  }

  /** REAL media demux: split a multi-frame container into one row per
    * frame via `javax.imageio`'s `ImageReader` —
    * `getNumImages(true)` / `read(i)` (GIF is the JDK-built-in
    * multi-frame container; a video demuxer implements this same
    * iterator against its own codec). Emits (media_id, frame_idx,
    * width, height, pixel_hex) with the [[decodePixelHex]] transcript
    * per frame; undecodable payloads degrade to one
    * (-1, -1, -1, null) row, never a task failure. One container
    * decoded at a time per task. */
  def demuxGifFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val corrupt = (id: Long) => Iterator((id, -1L, -1, -1, null: String))
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) corrupt(id)
          else {
            // close/dispose in finally: a read(i) throwing mid-container
            // must not leak the input stream or the reader's buffers
            var iis: javax.imageio.stream.ImageInputStream = null
            var reader: javax.imageio.ImageReader = null
            try {
              iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) corrupt(id)
              else {
                reader = readers.next()
                // seekForwardOnly=false: getNumImages(true) must scan
                reader.setInput(iis, false)
                // a recognized-but-gutted container can scan to ZERO
                // complete images — that must be the corrupt row, not
                // zero output rows (silent row loss downstream)
                val n = reader.getNumImages(true)
                if (n <= 0) corrupt(id)
                else {
                // materialized (not lazy) so finally's dispose is safe
                val rows = (0 until n).map { i =>
                  val img = reader.read(i)
                  val w = img.getWidth
                  val h = img.getHeight
                  val sb = new java.lang.StringBuilder(w * h * 6)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y) & 0xffffff
                      val s = Integer.toHexString(rgb)
                      var pad = 6 - s.length
                      while (pad > 0) { sb.append('0'); pad -= 1 }
                      sb.append(s)
                      x += 1
                    }
                    y += 1
                  }
                  (id, i.toLong, w, h, sb.toString)
                }
                rows.iterator
                }
              }
            } catch {
              case scala.util.control.NonFatal(_) => corrupt(id)
            } finally {
              if (reader != null) reader.dispose()
              if (iis != null)
                try iis.close()
                catch { case scala.util.control.NonFatal(_) => () }
            }
          }
        }
      }.toDF("media_id", "frame_idx", "width", "height", "pixel_hex")
  }

  /** Uniform frame sampling plumbing: emit `nSamples` frame rows per
    * media row, frame i at index floor(i·(nFrames-1)/(nSamples-1))
    * (first and last frames always included; a single sample takes
    * frame 0). The frame PAYLOAD is the declared stub — a
    * deterministic byte-slice of the container (video codecs aren't
    * in this JVM); a real demuxer swaps into the slice expression.
    * Everything else — the explode to frame rows, the schema, the
    * per-row bounded cost — is the real 100 TB shape. Pure Column
    * expressions, no shuffle. */
  def sampleFrames(media: DataFrame, nFramesCol: org.apache.spark.sql.Column,
      nSamples: Int, frameBytes: Int = 64): DataFrame = {
    require(nSamples > 0)
    val nf = greatest(nFramesCol.cast("long"), lit(1L))
    val idx =
      if (nSamples == 1) lit(0L)
      else floor(col("__s") * (nf - 1) / (nSamples - 1)).cast("long")
    media
      .withColumn("__s", explode(sequence(lit(0), lit(nSamples - 1))))
      .withColumn("frame_idx", idx)
      // stub frame payload: a deterministic container slice
      .withColumn("frame", substring(col("content"),
        (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes)))
      .drop("__s")
      .dropDuplicates("media_id", "frame_idx")
  }

  /** Deterministic 16-bit mono PCM WAV for media id `m`, encoded
    * through `javax.sound.sampled` (the JDK's built-in audio stack) —
    * the checked-path corpus generator for [[decodeWav]]. Every
    * sample is an integer function of (m, i):
    * s = (m·31 + i·7) mod 65536 − 32768, and PCM is lossless, so a
    * codec-less oracle reproduces the decoded samples exactly.
    * Frame count 400 + m mod 100 at 8 kHz. */
  def patternWav(m: Long): Array[Byte] = {
    val n = (400 + m % 100).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((m * 31 + i * 7) % 65536 - 32768).toInt
      data(2 * i) = (s & 0xff).toByte // little-endian PCM
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  /** REAL audio decode over the media schema: `javax.sound.sampled`
    * per partition on the executors (WAV/PCM ships with the JDK — no
    * native libs). Parses the container format for real (sample
    * rate, frame count, endianness), streams the PCM frames once,
    * and emits per-clip stats plus an md5 over the comma-joined
    * int16 sample transcript — the form an engine without a codec
    * can reconstruct and hash. Undecodable payloads degrade to one
    * (-1, -1, …, null) row, never a task failure; one clip in
    * memory at a time per task. */
  def decodeWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val corrupt = (id: Long) =>
      (id, -1, -1L, 0, 0, 0L, null: String)
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) corrupt(id)
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            // the 2-bytes-per-frame decode below is mono 16-bit signed
            // PCM ONLY — a stereo or 8-bit WAV is a VALID container this
            // loop would silently mis-decode (read half the PCM bytes as
            // if mono), so anything else degrades to the corrupt row
            if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16 ||
                fmt.getEncoding !=
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
              ais.close()
              corrupt(id)
            } else {
            val n = ais.getFrameLength.toInt
            val raw = ais.readAllBytes()
            ais.close()
            val big = fmt.isBigEndian
            val sb = new java.lang.StringBuilder(n * 7)
            var mn = Int.MaxValue
            var mx = Int.MinValue
            var sum = 0L
            var i = 0
            while (i < n) {
              val lo = raw(2 * i) & 0xff
              val hi = raw(2 * i + 1) & 0xff
              val v = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
              if (i > 0) sb.append(',')
              sb.append(v)
              if (v < mn) mn = v
              if (v > mx) mx = v
              sum += v
              i += 1
            }
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(sb.toString.getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString
            (id, fmt.getSampleRate.toInt, n.toLong, mn, mx, sum, md)
            }
          } catch { case scala.util.control.NonFatal(_) => corrupt(id) }
        }
      }.toDF("media_id", "sample_rate", "n_frames", "smin", "smax",
        "ssum", "sample_md5")
  }

  /** [[sampleFrames]]' uniform-index policy applied to REAL demuxed
    * frames — the composition the byte-slice stub declared as its
    * swap point: [[demuxGifFrames]] splits the container, then frame
    * i of n survives when i ∈ {floor(s·(n-1)/(nSamples-1))} (first
    * and last always kept; a single sample keeps frame 0). The frame
    * count rides a media_id window over the already-demuxed rows —
    * no second decode pass, no shuffle beyond the window's. */
  def sampleRealFrames(media: DataFrame, nSamples: Int): DataFrame = {
    require(nSamples > 0)
    val frames = demuxGifFrames(media)
    if (nSamples == 1) return frames.filter(col("frame_idx") === 0)
    import org.apache.spark.sql.expressions.Window
    val n = count(lit(1)).over(Window.partitionBy(col("media_id")))
    frames.withColumn("__n", n)
      .filter(array_contains(
        transform(sequence(lit(0L), lit(nSamples - 1L)),
          s => floor(s * (col("__n") - 1) / (nSamples - 1)).cast("long")),
        col("frame_idx")))
      .drop("__n")
  }

  /** Batched per-partition feature extraction over the media schema —
    * the shape a real decoder plugs into: one iterator pass, bounded
    * memory, no driver involvement. Emits (media_id, n_bytes,
    * feat_mean) from the stub decode. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val narrow: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
    narrow.mapPartitions { it =>
      it.map { case (id, bytes) =>
        // stub decode: byte-sum + length stand in for codec output
        val b = if (bytes == null) Array.emptyByteArray else bytes
        var s = 0L
        var i = 0
        while (i < b.length) { s += (b(i) & 0xff); i += 1 }
        (id, b.length.toLong,
          if (b.length == 0) 0.0 else s.toDouble / b.length / 255.0)
      }
    }.toDF("media_id", "n_bytes", "feat_mean")
  }
}
