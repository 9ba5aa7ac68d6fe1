package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("JPEG decode: real lossy decode stays within codec tolerance of the pattern") {
    // q_jpeg_decode's oracle is decode-once-compare-twice (self-
    // agreement) — THIS test is the independent truth anchor: the
    // decoded luma histogram must sit close to the PRE-ENCODE
    // pattern's arithmetic histogram, so a decoder returning garbage
    // (right schema, wrong pixels) cannot hide behind stability.
    val media = spark.range(24).as[Long].repartition(4)
      .mapPartitions(it => it.map(m => (m, Multimodal.patternJpeg(m))))
      .toDF("media_id", "content")
    val got = Multimodal.decodeLumaHist(media, bins = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2),
          (0 until 16).map(i => r.getLong(3 + i)))).toMap
    (0L until 24L).foreach { m =>
      val (w, h, hist) = got(m)
      // dims are exact (JPEG never changes geometry)
      assert(w == (24 + m % 13).toInt && h == (24 + m % 11).toInt)
      assert(hist.sum == w.toLong * h, s"histogram lost pixels for $m")
      // arithmetic histogram of the pre-encode pattern
      val ref = Array.fill(16)(0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = (((m * 5) % 64) + x * 3 + y * 2).toInt.min(255)
          val g = (((m * 3) % 64) + x * 2 + y * 3).toInt.min(255)
          val b = (((m * 7) % 64) + x + y).toInt.min(255)
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          ref(luma * 16 / 256) += 1L
          x += 1
        }
        y += 1
      }
      // codec tolerance: total variation ≤ 15% of pixels (smooth
      // gradients quantize gently; garbage pixels would blow this)
      val tv = (0 until 16).map(i => math.abs(hist(i) - ref(i))).sum / 2
      assert(tv <= (w.toLong * h * 15) / 100,
        s"media $m drifted $tv of ${w * h} pixels from the pattern")
    }
    // corrupt payloads degrade, never fail
    val bad = Seq((99L, Array[Byte](1, 2, 3)), (100L, null))
      .toDF("media_id", "content")
    val rows = Multimodal.decodeLumaHist(bad, bins = 16).collect()
    assert(rows.forall(r => r.getInt(1) == -1 && r.getInt(2) == -1))
  }

  test("asMedia produces the canonical media schema") {
    val media = Multimodal.asMedia(
      Seq((1L, "hello"), (2L, "")).toDF("id", "payload"),
      "id", "payload", "text", "text/plain")
    assert(media.schema("content").dataType == BinaryType)
    assert(media.schema("meta").dataType.isInstanceOf[StructType])
    val m = media.select(col("media_id"), col("meta.n_bytes"))
      .as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 5L, 2L -> 0L))
  }

  test("extractFeatures runs batched per partition with bounded state") {
    val media = Multimodal.asMedia(
      Seq((1L, "abc"), (2L, "")).toDF("id", "p"), "id", "p",
      "text", "text/plain")
    val feats = Multimodal.extractFeatures(media)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(feats(1L)._1 == 3L && feats(1L)._2 > 0.0)
    assert(feats(2L) == ((0L, 0.0)))
  }

  test("decodeImages decodes real PNGs: dims, luminance, corrupt → null") {
    import java.awt.image.BufferedImage
    import java.awt.Color
    def png(w: Int, h: Int, paint: (Int, Int) => Color): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, paint(x, y).getRGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val white = png(4, 2, (_, _) => Color.WHITE)
    val black = png(3, 3, (_, _) => Color.BLACK)
    val halfRed = png(2, 2, (x, _) => if (x == 0) Color.RED else Color.WHITE)
    val corrupt = Array[Byte](1, 2, 3, 4)
    val media = spark.createDataFrame(Seq(
      (1L, white), (2L, black), (3L, halfRed), (4L, corrupt)))
      .toDF("media_id", "content")
      .repartition(3) // decode must run wherever the rows land
    val got = Multimodal.decodeImages(media, histBins = 8)
      .as[(Long, Int, Int, Array[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 4 && got(1L)._3 == 2)
    assert(got(1L)._5.get == 1.0) // all-white: mean luminance 255/255
    assert(got(1L)._4.last == 1.0) // every pixel in the top bin
    assert(got(2L)._5.get == 0.0 && got(2L)._4.head == 1.0)
    // half red: Rec.601 luma of pure red = 76 → bin 2 of 8; mean in (0,1)
    assert(got(3L)._4(2) == 0.5 && got(3L)._4.last == 0.5)
    assert(got(3L)._5.get > 0.5 && got(3L)._5.get < 1.0)
    assert(got(4L)._2 == -1 && got(4L)._4 == null && got(4L)._5.isEmpty)
  }

  test("resizeImages scales real pixels (bilinear) and degrades on corrupt") {
    import java.awt.image.BufferedImage
    import java.awt.Color
    def png(w: Int, h: Int, c: Color): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c.getRGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = spark.createDataFrame(Seq(
      (1L, png(8, 4, Color.WHITE)), (2L, Array[Byte](9, 9, 9))))
      .toDF("media_id", "content")
    val resized = Multimodal.resizeImages(media, 4, 2)
    // decode the resized payloads back: dims must be the target,
    // and a solid color survives interpolation exactly
    val back = Multimodal.decodeImages(
      resized.withColumnRenamed("resized", "content"))
      .as[(Long, Int, Int, Array[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(back(1L)._2 == 4 && back(1L)._3 == 2 && back(1L)._5.get == 1.0)
    assert(back(2L)._2 == -1) // corrupt in → null resized → null decode
  }

  test("sampleFrames: uniform indices incl. first/last, stub slice is the container slice") {
    val media = Multimodal.asMedia(
      // 300 bytes → 4 "frames" of 64 (nf = 300 div 64 = 4)
      Seq((1L, "ab" * 150)).toDF("id", "p"), "id", "p",
      "video_stub", "application/octet-stream")
    val got = Multimodal
      .sampleFrames(media, expr("meta.n_bytes div 64"), 4, 64)
      .select(col("frame_idx"), length(col("frame")).as("len"))
      .as[(Long, Int)].collect().sortBy(_._1)
    // nf=4 → sampled indices floor(s*3/3) for s=0..3 = 0,1,2,3
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // every slice fits: frame 3 covers bytes 193-256 of 300
    assert(got.forall(_._2 == 64))
    // fewer frames than samples → distinct indices only
    val one = Multimodal.asMedia(
      Seq((1L, "xy")).toDF("id", "p"), "id", "p", "video_stub", "b")
    val g1 = Multimodal.sampleFrames(one, expr("meta.n_bytes div 64"), 4, 64)
      .select("frame_idx").as[Long].collect()
    assert(g1.toSeq == Seq(0L))
  }

  test("patternPng → real decode round-trips the pattern exactly (PNG lossless)") {
    // the q_image_decode contract: encode the deterministic pattern as
    // a REAL PNG, decode through the production path, and the pixel
    // transcript equals the arithmetic pattern — per pixel, not hashed
    val m = 5L
    val media = spark.createDataFrame(Seq((m, Multimodal.patternPng(m))))
      .toDF("media_id", "content")
    val (id, w, h, hex) = Multimodal.decodePixelHex(media)
      .as[(Long, Int, Int, String)].collect().head
    assert(id == m && w == (16 + m % 17).toInt && h == (16 + m % 13).toInt)
    val want = new StringBuilder
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((m * 7 + x * 3 + y * 5) % 256).toInt
      val g = ((m * 11 + x + y * 2) % 256).toInt
      val b = ((m * 13 + x * 5 + y) % 256).toInt
      want.append(f"$r%02x$g%02x$b%02x")
    }
    assert(hex == want.toString)
    // corrupt payloads degrade, never fail the task
    val bad = spark.createDataFrame(Seq((9L, Array[Byte](1, 2, 3))))
      .toDF("media_id", "content")
    val (_, bw, _, bhex) = Multimodal.decodePixelHex(bad)
      .as[(Long, Int, Int, String)].collect().head
    assert(bw == -1 && bhex == null)
  }

  test("patternGif → demuxGifFrames round-trips every frame losslessly") {
    val media = Seq(
      (0L, Multimodal.patternGif(0)),
      (5L, Multimodal.patternGif(5)),
      (7L, Array.empty[Byte]),
      (9L, "not a gif".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val got = Multimodal.demuxGifFrames(media)
      .as[(Long, Long, Int, Int, String)].collect()
      .groupBy(_._1)

    def expectHex(m: Long, f: Long, w: Int, h: Int): String = {
      val sb = new StringBuilder
      for (y <- 0 until h; x <- 0 until w) {
        val g = ((m * 7 + f * 31 + x * 3 + y * 5) % 256).toInt
        sb.append(f"$g%02x$g%02x$g%02x")
      }
      sb.toString
    }
    // id 0: w=10 h=10, 2 frames; id 5: w=15 h=10, 3 frames
    assert(got(0L).length == 2 && got(5L).length == 3)
    for ((m, w, h) <- Seq((0L, 10, 10), (5L, 15, 10));
         row <- got(m)) {
      val (_, f, gw, gh, hex) = row
      assert(gw == w && gh == h, s"frame dims $gw x $gh for media $m")
      assert(hex == expectHex(m, f, w, h),
        s"frame $f of media $m decoded to different pixels")
    }
    // corrupt payloads degrade to one (-1, -1, null) row each
    for (bad <- Seq(7L, 9L)) {
      assert(got(bad).length == 1 && got(bad).head._3 == -1 &&
        got(bad).head._5 == null)
    }
  }

  test("patternWav → decodeWav round-trips PCM samples losslessly") {
    val media = Seq(
      (5L, Multimodal.patternWav(5)),
      (9L, Array.empty[Byte]),
      (11L, "not audio".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val got = Multimodal.decodeWav(media)
      .as[(Long, Int, Long, Int, Int, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // id 5: 405 frames at 8 kHz, samples (5*31 + i*7) % 65536 - 32768
    val samples = (0 until 405).map(i => ((5 * 31 + i * 7) % 65536 - 32768))
    val (_, rate, n, mn, mx, sum, md) = got(5L)
    assert(rate == 8000 && n == 405L)
    assert(mn == samples.min && mx == samples.max)
    assert(sum == samples.map(_.toLong).sum)
    val expectMd = java.security.MessageDigest.getInstance("MD5")
      .digest(samples.mkString(",").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(md == expectMd)
    // corrupt payloads degrade to a (-1, …, null) row
    for (bad <- Seq(9L, 11L))
      assert(got(bad)._2 == -1 && got(bad)._7 == null)
  }

  test("decodeWav routes valid-but-unsupported formats to the corrupt row") {
    // a VALID stereo 16-bit WAV (frameSize=4) — the mono decode loop
    // would silently read only half its PCM bytes; the format guard
    // must degrade it instead of mis-decoding
    def wav(channels: Int, bits: Int): Array[Byte] = {
      val n = 64
      val bytesPerFrame = channels * bits / 8
      val data = Array.tabulate[Byte](n * bytesPerFrame)(i => (i * 3).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, bits, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val media = Seq(
      (1L, wav(2, 16)), // stereo 16-bit
      (2L, wav(1, 8)),  // mono 8-bit
      (3L, Multimodal.patternWav(3))) // supported control
      .toDF("media_id", "content")
    val got = Multimodal.decodeWav(media)
      .as[(Long, Int, Long, Int, Int, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == -1 && got(1L)._7 == null)
    assert(got(2L)._2 == -1 && got(2L)._7 == null)
    assert(got(3L)._2 == 8000 && got(3L)._7 != null)
  }

  test("sampleRealFrames keeps uniformly spaced REAL frames, first/last included") {
    // id 1 → 3 frames, id 3 → 5 frames (nFrames = 2 + m % 4)
    val media = Seq(
      (1L, Multimodal.patternGif(1)),
      (3L, Multimodal.patternGif(3)))
      .toDF("media_id", "content")
    val got = Multimodal.sampleRealFrames(media, 3)
      .select("media_id", "frame_idx")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // 3 of 3 frames → all; 3 of 5 → {0, 2, 4}
    assert(got(1L) == Seq(0L, 1L, 2L))
    assert(got(3L) == Seq(0L, 2L, 4L))
    val one = Multimodal.sampleRealFrames(media, 1)
      .select("frame_idx").as[Long].collect()
    assert(one.toSeq == Seq(0L, 0L))
  }

  test("fakeDecode is deterministic and bounded [0,1)") {
    val f = Seq("payload").toDF("t")
      .select(Multimodal.fakeDecode(col("t").cast("binary"), 4).as("f"))
      .as[Seq[Double]].collect()
    assert(f(0).length == 4)
    assert(f(0).forall(x => x >= 0.0 && x < 1.0))
    val f2 = Seq("payload").toDF("t")
      .select(Multimodal.fakeDecode(col("t").cast("binary"), 4).as("f"))
      .as[Seq[Double]].collect()
    assert(f(0) == f2(0))
  }
}
