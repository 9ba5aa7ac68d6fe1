package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunks cover all tokens with the requested overlap") {
    // 11 tokens, size 5, stride 3 → starts 0,3,6: the last FULL
    // window already reaches token 11, so no extra tail chunk
    val doc = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunker.chunkTokens(doc, "text", "doc_id", 5, 3)
      .select(col("chunk_id"), col("toks"))
      .as[(Int, Seq[String])].collect().toMap
    assert(got(0) == (1 to 5).map(i => s"t$i"))
    assert(got(1) == (4 to 8).map(i => s"t$i"))
    assert(got(2) == (7 to 11).map(i => s"t$i"))
    assert(got.size == 3)
    // a short tail appears only when stride leaves a remainder:
    // 12 tokens → starts 0,3,6,9 with a 3-token final chunk
    val doc12 = Seq((1L, (1 to 12).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got12 = Chunker.chunkTokens(doc12, "text", "doc_id", 5, 3)
      .select(col("chunk_id"), col("toks"))
      .as[(Int, Seq[String])].collect().toMap
    assert(got12.size == 4 && got12(3) == (10 to 12).map(i => s"t$i"))
  }

  test("a doc shorter than one chunk yields exactly one chunk; empty yields none") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val got = Chunker.chunkTokens(docs, "text", "doc_id", 5, 3)
      .select("doc_id", "chunk_id").as[(Long, Int)].collect()
    assert(got.toSeq == Seq((1L, 0)))
  }

  test("packBins: bins respect the start-offset rule and never span shards") {
    val rows = Seq(
      ("s1", 1L, 300L), ("s1", 2L, 300L), ("s1", 3L, 300L),
      ("s2", 4L, 600L))
      .toDF("shard", "id", "w")
    val got = Chunker.packBins(rows, Seq(col("id")), "w", 512L, Seq("shard"))
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // s1 offsets: 0, 300, 600 → bins 0, 0, 1 (bin 0 over-fills by one row)
    assert(got(1L) == 0L && got(2L) == 0L && got(3L) == 1L)
    // s2 restarts at offset 0 regardless of s1's totals
    assert(got(4L) == 0L)
  }
}
