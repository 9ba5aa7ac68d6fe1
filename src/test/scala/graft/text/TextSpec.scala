package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import TextFunctions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens split on non-alphanumerics, keep apostrophes, drop empties") {
    val got = Seq("It's  a test—really!").toDF("t")
      .select(tokens(col("t"))).as[Seq[String]].first()
    assert(got == Seq("it's", "a", "test", "really"))
  }

  test("shingles: short text yields empty set, k-grams distinct") {
    val df = Seq("ab", "aaaa").toDF("t")
      .select(col("t"), shingles(col("t"), 3).as("s"))
    val m = df.as[(String, Seq[String])].collect().toMap
    assert(m("ab") == Seq())
    assert(m("aaaa") == Seq("aaa")) // distinct
  }

  test("bigrams: adjacent pairs, empty under 2 tokens") {
    val df = Seq("a b c", "solo", "").toDF("t")
      .select(col("t"), bigramsFromTokens(tokens(col("t"))).as("b"),
        bigramPairsFromTokens(tokens(col("t"))).as("p"))
    val m = df.select("t", "b").as[(String, Seq[String])].collect().toMap
    assert(m("a b c") == Seq("a b", "b c"))
    assert(m("solo") == Seq() && m("") == Seq())
    val pairs = df.filter(col("t") === "a b c")
      .select(explode(col("p"))).select("col.w1", "col.w2")
      .as[(String, String)].collect().toSeq
    assert(pairs == Seq(("a", "b"), ("b", "c")))
  }

  test("fingerprint is invariant to token order and duplication") {
    val fps = Seq("the cat sat", "sat the cat the").toDF("t")
      .select(fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("quality metrics are 0 on empty text, bounded otherwise") {
    val df = Seq("", "the quick brown fox is on the run").toDF("t")
      .select(stopwordRatio(col("t")).as("sw"),
        uniqueTokenRatio(col("t")).as("uq"),
        qualityScore(col("t")).as("q"))
    val rows = df.as[(Double, Double, Double)].collect()
    assert(rows(0) == ((0.0, 0.0, 0.0)))
    assert(rows(1)._1 > 0 && rows(1)._2 > 0 && rows(1)._3 <= 1.0)
  }

  test("langId picks the profile with most stopword hits, ties to " +
      "earlier code") {
    val m = Seq("el que de la y en un", "the cat of the dog is in")
      .toDF("t").select(col("t"), langId(col("t"))).as[(String, String)]
      .collect().toMap
    assert(m("el que de la y en un") == "es")
    assert(m("the cat of the dog is in") == "en")
  }

  test("simhash: identical texts collide, near-identical are close") {
    val sigs = Seq("the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "completely different words entirely here now")
      .toDF("t").select(SimHash.simhash60(col("t"))).as[Long].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhashPairs finds the duplicate pair via band join") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally unrelated content goes here"))
      .toDF("doc_id", "text")
    val pairs = SimHash.simhashPairs(docs, "text", "doc_id", 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }
}
