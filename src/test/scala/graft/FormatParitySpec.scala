package graft

/** The same driver queries over csv/json-staged copies of the tables
  * must produce byte-identical results to the parquet run — the
  * "wider format support" guarantee is parity, not just parseability.
  * Doubles survive because Spark writes shortest-repr text and parses
  * it back to the same bits; timestamps carry explicit micros. */
class FormatParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def parity(staged: Map[String, String],
      queries: Seq[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("staged").toString
    staged.foreach { case (name, fmt) =>
      Tables.stage(spark, dir, name, tmp, fmt)
    }
    queries.foreach { q =>
      val fromParquet = SparkEntry.queries(q)(spark, dir)
        .collect().map(_.toString).toSeq
      val fromStaged = SparkEntry.queries(q)(spark, tmp)
        .collect().map(_.toString).toSeq
      assert(fromStaged.nonEmpty, s"$q: empty result over staged input")
      assert(fromStaged == fromParquet, s"$q differs over ${staged.values.toSet}")
    }
  }

  test("csv-staged tables reproduce parquet results exactly") {
    parity(
      Map("lineitem" -> "csv", "orders" -> "csv", "customer" -> "csv",
        "events" -> "csv"),
      Seq("q1_agg", "q3_join_agg", "q_window_rank", "q_sessionize",
        "q_json_extract"))
  }

  test("json-staged tables reproduce parquet results exactly") {
    parity(
      Map("embeddings" -> "json", "documents" -> "json"),
      Seq("q_embed_lsh", "q_fingerprint", "q_lang_id"))
  }

  test("orc-staged tables reproduce parquet results exactly") {
    // ORC is the one columnar alternative with native Spark support
    // in this build (no spark-avro connector jar) — covers typed
    // arrays (embeddings) and micros timestamps (events) without a
    // schema sidecar.
    parity(
      Map("lineitem" -> "orc", "orders" -> "orc", "events" -> "orc",
        "documents" -> "orc", "embeddings" -> "orc"),
      Seq("q1_agg", "q_sessionize", "q_fingerprint", "q_embed_lsh",
        "q_fill_forward"))
  }
}
