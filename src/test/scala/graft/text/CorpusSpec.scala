package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "common alpha common"),   // 'common' repeats inside one doc
    (2L, "common beta"),
    (3L, "common gamma"),
    (4L, "common"))                 // reduces to nothing after strip
    .toDF("doc_id", "text")

  test("tokenDocFreq counts documents, not occurrences") {
    val df = Corpus.tokenDocFreq(docs, "text", "doc_id")
      .as[(String, Long)].collect().toMap
    assert(df("common") == 4) // appears twice in doc 1, counted once
    assert(df("alpha") == 1 && df("beta") == 1)
  }

  test("commonTokens applies a strict rational threshold") {
    // > 3/4 of 4 docs ⇒ df must be 4: only 'common'
    val got = Corpus.commonTokens(docs, "text", "doc_id", 3, 4)
      .as[String].collect().toSet
    assert(got == Set("common"))
  }

  test("postings are ascending, distinct per doc, df-capped") {
    val got = Corpus.postings(docs, "text", "doc_id")
      .select("token", "df", "postings")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("common") == ((4L, "1-2-3-4"))) // doc 1 repeat counted once
    assert(got("alpha") == ((1L, "1")))
    val capped = Corpus.postings(docs, "text", "doc_id", maxDf = 1)
      .select("token").as[String].collect().toSet
    assert(capped == Set("alpha", "beta", "gamma")) // 'common' stop-listed
  }

  test("stripCommonCounts keeps emptied docs with n_after = 0") {
    val got = Corpus.stripCommonCounts(docs, "text", "doc_id", 3, 4)
      .select("doc_id", "n_before", "n_after")
      .as[(Long, Int, Long)].collect()
      .map { case (id, b, a) => id -> ((b, a)) }.toMap
    assert(got(1L) == ((3, 1L))) // 'common' x2 stripped, 'alpha' kept
    assert(got(2L) == ((2, 1L)))
    assert(got(4L) == ((1, 0L))) // emptied but present
  }
}
