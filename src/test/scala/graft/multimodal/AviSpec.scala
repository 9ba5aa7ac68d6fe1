package graft.multimodal

import graft.SparkSpec

class AviSpec extends SparkSpec {
  import spark.implicits._

  private def expectedHex(m: Long, f: Int): String = {
    val w = (10 + m % 7).toInt
    val h = (10 + m % 5).toInt
    val sb = new StringBuilder
    for (y <- 0 until h; x <- 0 until w) {
      val g = ((m * 11 + f * 29 + x * 3 + y * 5) % 256).toInt
      sb.append(f"$g%02x$g%02x$g%02x")
    }
    sb.toString
  }

  test("patternAvi → demuxAviFrames round-trips every frame's pixels") {
    val ids = Seq(1L, 2L, 6L, 13L)
    val media = ids.map(m => (m, Avi.patternAvi(m)))
      .toDF("media_id", "content")
    val got = Avi.demuxAviFrames(media)
      .as[(Long, Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (m <- ids) {
      val nf = (2 + m % 4).toInt
      assert(got(m).length == nf, s"media $m frame count")
      for ((row, f) <- got(m).zipWithIndex) {
        assert(row._2 == f.toLong)
        assert(row._3 == (10 + m % 7).toInt && row._4 == (10 + m % 5).toInt)
        assert(row._5 == expectedHex(m, f), s"media $m frame $f pixels")
      }
    }
  }

  test("malformed, truncated and compressed containers degrade to the corrupt row") {
    val good = Avi.patternAvi(4L)
    // flip the compression field to something ≠ BI_RGB: find strf and
    // corrupt biCompression (a compressed stream must not be decoded
    // as if raw)
    val compressed = good.clone()
    val strfAt = good.sliding(4).indexWhere(w =>
      new String(w.toArray, "US-ASCII") == "strf")
    compressed(strfAt + 8 + 16) = 1 // biCompression = 1 (BI_RLE8)
    val media = Seq(
      (1L, null: Array[Byte]),
      (2L, "not a riff container".getBytes("UTF-8")),
      (3L, good.take(good.length / 2)), // truncated mid-movi
      (4L, compressed),
      (5L, Avi.patternAvi(5L))) // control
      .toDF("media_id", "content")
    val got = Avi.demuxAviFrames(media)
      .as[(Long, Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.toSeq).toMap
    for (bad <- Seq(1L, 2L, 3L, 4L)) {
      assert(got(bad).length == 1 && got(bad).head._3 == -1 &&
        got(bad).head._5 == null, s"media $bad should be corrupt")
    }
    assert(got(5L).length == (2 + 5 % 4) && got(5L).forall(_._5 != null))
  }
}
