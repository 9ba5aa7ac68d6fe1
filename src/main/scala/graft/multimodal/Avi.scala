package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL video container demux, dependency-free: an uncompressed-AVI
  * (RIFF) parser + writer over plain byte arithmetic — no codec
  * libraries exist in this JVM, but the AVI *container* with BI_RGB
  * (uncompressed 24-bit DIB) frames needs none, the same way
  * GIF/WAV/PNG ride the JDK built-ins. This closes the modality
  * matrix: the frame PAYLOAD here is real decoded pixels from a real
  * demuxed container, not a byte-slice stub.
  *
  * Layout handled (and produced): `RIFF('AVI ' LIST('hdrl' avih
  * LIST('strl' strh strf)) LIST('movi' 00db…) idx1)`, little-endian
  * throughout, word-aligned chunks, bottom-up BGR rows padded to 4
  * bytes. The demuxer trusts the parsed strf BITMAPINFOHEADER
  * (biWidth/biHeight/biBitCount/biCompression), walks the movi list
  * chunk-by-chunk, and degrades ANY malformed/compressed/truncated
  * container to one (-1, -1, -1, null) row — never a task failure.
  */
object Avi {

  // ------------------------------------------------------------ write

  /** Deterministic multi-frame uncompressed AVI for media id `m` —
    * the checked-path corpus generator for [[demuxAviFrames]].
    * Grayscale pixels (B=G=R) follow
    * gray = (m·11 + f·29 + x·3 + y·5) mod 256 (top-down coords;
    * rows are stored bottom-up in the DIB as the format demands), so
    * a codec-less oracle reproduces the decoded transcript exactly.
    * Dims 10+m%7 × 10+m%5, frame count 2 + m mod 4, 10 fps. */
  def patternAvi(m: Long): Array[Byte] = {
    val w = (10 + m % 7).toInt
    val h = (10 + m % 5).toInt
    val nf = (2 + m % 4).toInt
    val rowSize = (w * 3 + 3) & ~3
    val frameSize = rowSize * h

    def frameBytes(f: Int): Array[Byte] = {
      val d = new Array[Byte](frameSize)
      var y = 0
      while (y < h) {
        val base = (h - 1 - y) * rowSize // bottom-up storage
        var x = 0
        while (x < w) {
          val g = ((m * 11 + f * 29 + x * 3 + y * 5) % 256).toByte
          d(base + x * 3) = g     // B
          d(base + x * 3 + 1) = g // G
          d(base + x * 3 + 2) = g // R
          x += 1
        }
        y += 1
      }
      d
    }

    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def fcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))

    // sizes, inner-first (all chunk bodies here are even — no pads)
    val strhSize = 56; val strfSize = 40; val avihSize = 56
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
    val moviSize = 4 + nf * (8 + frameSize)
    val idx1Size = 16 * nf
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    fcc("RIFF"); u32(riffSize); fcc("AVI ")
    fcc("LIST"); u32(hdrlSize); fcc("hdrl")
    fcc("avih"); u32(avihSize)
    u32(100000L)                // dwMicroSecPerFrame (10 fps)
    u32(frameSize * 10L)        // dwMaxBytesPerSec
    u32(0); u32(0x10)           // padding, flags (AVIF_HASINDEX)
    u32(nf); u32(0); u32(1)     // totalFrames, initialFrames, streams
    u32(frameSize); u32(w); u32(h) // suggestedBufSize, width, height
    u32(0); u32(0); u32(0); u32(0) // reserved
    fcc("LIST"); u32(strlSize); fcc("strl")
    fcc("strh"); u32(strhSize)
    fcc("vids"); fcc("DIB ")
    u32(0); u16(0); u16(0)      // flags, priority, language
    u32(0); u32(1); u32(10)     // initialFrames, scale, rate
    u32(0); u32(nf)             // start, length
    u32(frameSize); u32(0xffffffffL); u32(0) // bufSize, quality, sampleSize
    u16(0); u16(0); u16(w); u16(h) // rcFrame
    fcc("strf"); u32(strfSize)
    u32(strfSize); u32(w); u32(h)  // biSize, biWidth, biHeight
    u16(1); u16(24)                // biPlanes, biBitCount
    u32(0); u32(frameSize)         // biCompression (BI_RGB), biSizeImage
    u32(0); u32(0); u32(0); u32(0) // pels/clr fields
    fcc("LIST"); u32(moviSize); fcc("movi")
    var f = 0
    while (f < nf) {
      fcc("00db"); u32(frameSize); out.write(frameBytes(f))
      f += 1
    }
    fcc("idx1"); u32(idx1Size)
    f = 0
    while (f < nf) {
      fcc("00db"); u32(0x10) // AVIIF_KEYFRAME
      u32(4L + f * (8L + frameSize)); u32(frameSize)
      f += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ read

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private final case class Header(width: Int, height: Int,
      bitCount: Int, compression: Long)

  /** Demuxed frames of one AVI payload, or None for anything
    * malformed: bad magic, lying sizes, a compressed stream
    * (biCompression ≠ 0), non-24-bit frames, or truncated movi data.
    * Frames come back top-down as (idx, w, h, rrggbb-hex). */
  private def parseAvi(bytes: Array[Byte]): Option[Seq[(Long, Int, Int, String)]] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    var header: Option[Header] = None
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // walk chunks in [off, end); descend into hdrl/strl/movi lists
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val f = fourcc(bytes, off)
        val size = u32(bytes, off + 4)
        if (size < 0 || off + 8 + size > end) return
        val body = off + 8
        if (f == "LIST" && size >= 4) {
          val lt = fourcc(bytes, body)
          walk(body + 4, body + size.toInt, inMovi || lt == "movi")
        } else if (f == "avih" && size >= 40 && header.isEmpty) {
          // keep avih dims only until strf arrives (strf is the
          // bitmap's own truth; avih is a fallback for streams
          // missing it)
          header = Some(Header(u32(bytes, body + 32).toInt,
            u32(bytes, body + 36).toInt, 24, 0L))
        } else if (f == "strf" && size >= 20) {
          header = Some(Header(u32(bytes, body + 4).toInt,
            u32(bytes, body + 8).toInt, u16(bytes, body + 14),
            u32(bytes, body + 16)))
        } else if (inMovi && f.length == 4 &&
            (f.endsWith("db") || f.endsWith("dc"))) {
          frames += ((body, size.toInt))
        }
        off = body + size.toInt + (size.toInt & 1) // word alignment
      }
    }
    walk(12, bytes.length, inMovi = false)
    header match {
      case Some(Header(w, h, bits, comp))
          if w > 0 && h > 0 && bits == 24 && comp == 0L &&
            frames.nonEmpty =>
        val rowSize = (w * 3 + 3) & ~3
        if (frames.exists { case (_, sz) => sz < rowSize * h }) None
        else Some(frames.zipWithIndex.map { case ((foff, _), i) =>
          val sb = new java.lang.StringBuilder(w * h * 6)
          var y = 0
          while (y < h) {
            val base = foff + (h - 1 - y) * rowSize // bottom-up rows
            var x = 0
            while (x < w) {
              val b = bytes(base + x * 3) & 0xff
              val g = bytes(base + x * 3 + 1) & 0xff
              val r = bytes(base + x * 3 + 2) & 0xff
              val rgb = (r << 16) | (g << 8) | b
              val s = Integer.toHexString(rgb)
              var pad = 6 - s.length
              while (pad > 0) { sb.append('0'); pad -= 1 }
              sb.append(s)
              x += 1
            }
            y += 1
          }
          (i.toLong, w, h, sb.toString)
        }.toSeq)
      case _ => None
    }
  }

  /** [[Multimodal.demuxGifFrames]]' contract over AVI: one row per
    * demuxed frame — (media_id, frame_idx, width, height, pixel_hex)
    * — with undecodable payloads degrading to one (-1, -1, -1, null)
    * row. One container decoded at a time per task. */
  def demuxAviFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val corrupt = (id: Long) => Iterator((id, -1L, -1, -1, null: String))
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val parsed =
            try { if (bytes == null) None else parseAvi(bytes) }
            catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some(rows) =>
              rows.iterator.map { case (i, w, h, hex) => (id, i, w, h, hex) }
            case None => corrupt(id)
          }
        }
      }.toDF("media_id", "frame_idx", "width", "height", "pixel_hex")
  }
}
