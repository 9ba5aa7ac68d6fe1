package graft.text

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"))
    .toDF("doc_id", "text")

  test("gramHashes emits distinct n-gram hashes, none under n tokens") {
    val g = Contamination.gramHashes(train, "text", "doc_id", 5)
    // doc 1: 9 tokens → 5 grams; doc 2: 8 tokens → 4 grams
    val counts = g.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 5L, 2L -> 4L))
    val tiny = Seq((9L, "one two three")).toDF("doc_id", "text")
    assert(Contamination.gramHashes(tiny, "text", "doc_id", 5).isEmpty)
  }

  test("report flags exact substring carry-over, not fresh text") {
    val test = Seq(
      // contains train doc 1's first 5-gram verbatim
      (10L, "note the quick brown fox jumps again and again today"),
      // same vocabulary, different order → no 5-gram overlap
      (11L, "dog lazy the over jumps fox brown quick the"),
      (12L, "completely novel material nothing shared here at all"))
      .toDF("doc_id", "text")
    val r = Contamination.report(train, test, "text", "doc_id", 5)
      .select("doc_id", "n_hit", "contaminated")
      .as[(Long, Long, Int)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(10L)._1 >= 1 && r(10L)._2 == 1)
    assert(r(11L) == ((0L, 0)))
    assert(r(12L) == ((0L, 0)))
  }

  test("duplicate grams inside one test doc count once") {
    val test = Seq(
      (20L, "a b c d e a b c d e")) // the 5-gram "a b c d e" twice
      .toDF("doc_id", "text")
    val g = Contamination.gramHashes(test, "text", "doc_id", 5)
    // positions: abcde bcdea cdeab deabc eabcd abcde → 5 distinct
    assert(g.count() == 5)
    assert(g.distinct().count() == 5)
  }
}
