package graft.multimodal

import graft.SparkSpec

/** Fuzz the JDK-backed media decoders the way the AVI demuxer is
  * fuzzed: seeded-random byte flips and truncations of VALID
  * containers plus pure garbage, asserting the 100 TB degrade
  * contract — every payload yields its corrupt/null row or a
  * self-consistent decode, and no exception ever escapes to fail the
  * task. The JDK image readers are known to throw beyond
  * IOException on crafted input (runtime exceptions from the PNG/GIF
  * plugins), which is exactly what this spec pins down.
  */
class MediaFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def mutants(rnd: scala.util.Random, valid: Long => Array[Byte],
      n: Int): Seq[(Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var id = 0L
    for (_ <- 1 to n) { // single-byte flips
      val b = valid(1L + rnd.nextInt(20)).clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      out += ((id, b)); id += 1
    }
    for (_ <- 1 to n / 2) { // 4-dart multi-byte flips
      val b = valid(1L + rnd.nextInt(20)).clone()
      for (_ <- 1 to 4) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      out += ((id, b)); id += 1
    }
    for (_ <- 1 to n / 2) { // truncations
      val b = valid(1L + rnd.nextInt(20))
      out += ((id, b.take(rnd.nextInt(b.length)))); id += 1
    }
    for (sz <- Seq(0, 1, 8, 64, 2048)) { // garbage
      val b = new Array[Byte](sz); rnd.nextBytes(b)
      out += ((id, b)); id += 1
    }
    out.toSeq
  }

  test("fuzzed PNG payloads never fail decode/pixel-hex/resize tasks") {
    val cases = mutants(new scala.util.Random(7L), Multimodal.patternPng, 60)
    val media = cases.toDF("media_id", "content")
    val ids = cases.map(_._1).toSet

    val dec = Multimodal.decodeImages(media)
      .as[(Long, Int, Int, Array[Double], Option[Double])].collect()
    assert(dec.map(_._1).toSet == ids)
    dec.foreach { r =>
      if (r._2 == -1) assert(r._4 == null && r._5.isEmpty, s"mixed corrupt $r")
      else {
        assert(r._2 > 0 && r._3 > 0, s"bad dims $r")
        assert(math.abs(r._4.sum - 1.0) < 1e-9, s"histogram not a pmf $r")
        assert(r._5.exists(m => m >= 0.0 && m <= 1.0), s"lum out of range $r")
      }
    }

    val hex = Multimodal.decodePixelHex(media)
      .as[(Long, Int, Int, String)].collect()
    assert(hex.map(_._1).toSet == ids)
    hex.foreach { r =>
      if (r._2 == -1) assert(r._4 == null)
      else assert(r._4.length == r._2 * r._3 * 6, s"transcript len $r")
    }

    val rs = Multimodal.resizeImages(media, 8, 8)
      .as[(Long, Array[Byte])].collect()
    assert(rs.map(_._1).toSet == ids)
    rs.filter(_._2 != null).foreach { r =>
      // surviving mutants must re-decode to exactly the target canvas
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r._2))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8)
    }
  }

  test("fuzzed GIF payloads never fail the frame demux task") {
    val cases = mutants(new scala.util.Random(11L), Multimodal.patternGif, 60)
    val got = Multimodal.demuxGifFrames(cases.toDF("media_id", "content"))
      .as[(Long, Long, Int, Int, String)].collect().groupBy(_._1)
    assert(got.keySet == cases.map(_._1).toSet)
    got.foreach { case (m, rs) =>
      if (rs.exists(_._3 == -1))
        assert(rs.length == 1 && rs.head._5 == null, s"media $m mixed corrupt")
      else rs.foreach { r =>
        assert(r._3 > 0 && r._4 > 0 && r._5.length == r._3 * r._4 * 6,
          s"media $m inconsistent frame $r")
      }
    }
  }

  test("fuzzed WAV payloads never fail the audio decode task") {
    val cases = mutants(new scala.util.Random(13L), Multimodal.patternWav, 60)
    val got = Multimodal.decodeWav(cases.toDF("media_id", "content"))
      .as[(Long, Int, Long, Int, Int, Long, String)].collect()
    assert(got.map(_._1).toSet == cases.map(_._1).toSet)
    got.foreach { r =>
      if (r._2 == -1) assert(r._7 == null, s"corrupt row carries md5 $r")
      else assert(r._7 != null && r._7.length == 32, s"bad md5 $r")
    }
  }
}
