package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

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
