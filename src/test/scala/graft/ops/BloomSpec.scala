package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-prefiltered join ≡ plain inner join (false positives pruned
  * by the exact join), including the ambiguity-prone same-key-name
  * shape, null keys, and an empty dim (null bloom ⇒ empty result,
  * matching the empty plain join). Plus the scale claim: with
  * broadcast joins off, the might_contain probe filter sits BELOW the
  * probe side's shuffle exchange — non-matching rows never shuffle.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("prefilteredJoin equals the plain inner join (distinct key names)") {
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "x"), (9L, "y"))
      .toDF("fk", "payload")
    val dim = Seq((1L, "d1"), (3L, "d3"), (5L, "d5")).toDF("dk", "dval")
    val got = Bloom.prefilteredJoin(fact, "fk", dim, "dk", 100L)
    val want = fact.join(dim, col("fk") === col("dk"))
    assert(sortedRows(got) == sortedRows(want))
  }

  test("same key name on both sides resolves (no AnalysisException)") {
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload")
    val dim = Seq((1L, 10L), (3L, 30L)).toDF("k", "dval")
    val got = Bloom.prefilteredJoin(fact, "k", dim, "k", 100L)
    // both k columns survive, like the plain aliased join
    assert(got.columns.count(_ == "k") == 2)
    assert(got.count() == 2)
  }

  test("null keys drop on both sides, like the plain inner join") {
    val fact = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "n"),
      (java.lang.Long.valueOf(3L), "c")).toDF("fk", "payload")
    val dim = Seq((java.lang.Long.valueOf(3L), "d3"),
      (null.asInstanceOf[java.lang.Long], "dn")).toDF("dk", "dval")
    val got = Bloom.prefilteredJoin(fact, "fk", dim, "dk", 100L)
    val want = fact.join(dim, col("fk") === col("dk"))
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() == 1)
  }

  test("empty dim yields the empty join, not a failure") {
    val fact = Seq((1L, "a")).toDF("fk", "payload")
    val dim = Seq((1L, "d")).toDF("dk", "dval").filter(lit(false))
    assert(Bloom.prefilteredJoin(fact, "fk", dim, "dk", 100L).count() == 0)
  }

  test("probe filter sits below the shuffle exchange (scale shape)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.range(0, 10000).select(col("id").as("fk"),
        md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 10000, 97).select(col("id").as("dk"))
      val df = Bloom.prefilteredJoin(fact, "fk", dim, "dk", 1000L)
      val plan = df.queryExecution.executedPlan.toString
      // the bloom probe must appear in the plan at all…
      assert(plan.contains("might_contain"),
        s"no bloom probe in plan:\n$plan")
      // …and below the probe-side exchange: in the plan tree the
      // Filter(might_contain…) line is INDENTED UNDER an Exchange
      // (printed after it), never the other way around on that branch
      val lines = plan.linesIterator.toSeq
      val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning(fk"))
      val probeIdx = lines.indexWhere(_.contains("might_contain"))
      assert(exIdx >= 0 && probeIdx > exIdx,
        s"might_contain filter not below the probe exchange:\n$plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
