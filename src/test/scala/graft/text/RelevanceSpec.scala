package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, hand-countable term stats
  private def docs = Seq(
    (1L, "apple apple banana"),
    (2L, "apple cherry"),
    (3L, "banana banana banana cherry"),
    (4L, "date"))
    .toDF("doc_id", "text")

  test("termFreq and docFreq count occurrences vs documents") {
    val tf = Relevance.termFreq(docs, "text", "doc_id")
      .as[(Long, String, Long)].collect()
      .map { case (d, t, n) => (d, t) -> n }.toMap
    assert(tf((1L, "apple")) == 2 && tf((3L, "banana")) == 3)
    val df = Relevance.docFreq(
      Relevance.termFreq(docs, "text", "doc_id"))
      .as[(String, Long)].collect().toMap
    assert(df == Map("apple" -> 2, "banana" -> 2, "cherry" -> 2, "date" -> 1))
  }

  test("tfidfTopK ranks rarer-and-more-frequent terms first") {
    val top = Relevance.tfidfTopK(docs, "text", "doc_id", 2)
      .as[(Long, Int, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // doc 1: apple tf=2 df=2 → 2·(5/3); banana tf=1 df=2 → 5/3
    assert(top(1L) == Seq("apple", "banana"))
    // doc 3: banana tf=3 beats cherry tf=1 (same df)
    assert(top(3L) == Seq("banana", "cherry"))
    // doc 4: single rare term
    assert(top(4L) == Seq("date"))
  }

  test("tfidfTopK breaks exact score ties by token") {
    val tied = Seq((1L, "zeta alpha")).toDF("doc_id", "text")
    val got = Relevance.tfidfTopK(tied, "text", "doc_id", 2)
      .orderBy("rank").select("token").as[String].collect().toSeq
    assert(got == Seq("alpha", "zeta")) // equal tf/df → lexicographic
  }

  test("bm25 favors the doc with more query-term mass, shorter length") {
    val scores = Relevance.bm25(docs, "text", "doc_id", Seq("apple"))
      .as[(Long, Double)].collect().toMap
    // only docs 1 and 2 contain 'apple'; doc 1 has tf=2
    assert(scores.keySet == Set(1L, 2L))
    assert(scores(1L) > scores(2L))
  }

  test("bm25 sums term scores in fixed order (multi-term)") {
    val s = Relevance.bm25(docs, "text", "doc_id",
      Seq("apple", "banana", "cherry"))
      .as[(Long, Double)].collect().toMap
    // doc 3 hits banana(3) + cherry(1); doc 4 hits nothing → absent
    assert(s.contains(3L) && !s.contains(4L))
    assert(s(3L) > s(2L))
  }

  test("logIdf is the classic smoothed form") {
    val got = spark.range(1).select(
      Relevance.logIdf(lit(9L), lit(4L)).as("v")).as[Double].head()
    assert(math.abs(got - (math.log(10.0 / 5.0) + 1.0)) < 1e-12)
  }
}
