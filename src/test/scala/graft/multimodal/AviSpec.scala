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

  test("fuzz: mutated/truncated/garbage containers never fail a task") {
    // the 100 TB contract for a binary parser on untrusted bytes:
    // ANY input yields frames or the one corrupt row — no exception
    // escapes to kill the task. Deterministic seed so failures replay.
    val rnd = new scala.util.Random(4242L)
    val cases = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var id = 0L
    // single-byte mutations of valid containers (headers, sizes,
    // dims, payload — wherever the dart lands)
    for (_ <- 1 to 120) {
      val b = Avi.patternAvi(1L + rnd.nextInt(20)).clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      cases += ((id, b)); id += 1
    }
    // multi-byte mutations (4 darts: whole size/dim fields flip)
    for (_ <- 1 to 60) {
      val b = Avi.patternAvi(1L + rnd.nextInt(20)).clone()
      for (_ <- 1 to 4) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      cases += ((id, b)); id += 1
    }
    // random truncations (incl. mid-header and mid-frame)
    for (_ <- 1 to 40) {
      val b = Avi.patternAvi(1L + rnd.nextInt(20))
      cases += ((id, b.take(rnd.nextInt(b.length)))); id += 1
    }
    // pure garbage and degenerate payloads
    for (n <- Seq(0, 1, 7, 11, 12, 13, 64, 4096)) {
      val b = new Array[Byte](n); rnd.nextBytes(b)
      cases += ((id, b)); id += 1
    }
    val media = cases.toSeq.toDF("media_id", "content")
    // would throw (failing the test) if any payload escaped the
    // degrade contract
    val rows = Avi.demuxAviFrames(media)
      .as[(Long, Long, Int, Int, String)].collect()
    val byId = rows.groupBy(_._1)
    assert(byId.keySet == cases.map(_._1).toSet, "every payload yields rows")
    byId.foreach { case (m, rs) =>
      val corrupt = rs.exists(_._3 == -1)
      if (corrupt)
        assert(rs.length == 1 && rs.head._5 == null, s"media $m mixed corrupt")
      else rs.foreach { r =>
        // surviving mutants must still be self-consistent: positive
        // dims and a transcript of exactly w*h pixels
        assert(r._3 > 0 && r._4 > 0 && r._5.length == r._3 * r._4 * 6,
          s"media $m inconsistent frame $r")
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
