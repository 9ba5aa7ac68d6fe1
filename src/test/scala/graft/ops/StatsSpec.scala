package graft.ops

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("percentileDisc picks the smallest value whose rank hits ceil(p*n)") {
    // group g: values 10..100 step 10 (n=10)
    val df = (1 to 10).map(i => ("g", i.toLong * 10, i.toLong))
      .toDF("grp", "v", "k")
    val row = Stats.percentileDisc(df, Seq("grp"), "v", "k",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .select("n", "p50", "p90", "p99")
      .as[(Long, Long, Long, Long)].head()
    // ceil(0.5·10)=5 → 50; ceil(0.9·10)=9 → 90; ceil(0.99·10)=10 → 100
    assert(row == ((10L, 50L, 90L, 100L)))
  }

  test("n=1 group returns its only value at every percentile") {
    val df = Seq(("a", 7L, 1L)).toDF("grp", "v", "k")
    val row = Stats.percentileDisc(df, Seq("grp"), "v", "k",
      Seq(("p50", 1, 2), ("p99", 99, 100)))
      .select("p50", "p99").as[(Long, Long)].head()
    assert(row == ((7L, 7L)))
  }

  test("result is independent of input row order") {
    val base = (1 to 101).map(i => ("g", i.toLong, i.toLong))
    val fwd = base.toDF("grp", "v", "k")
    val rev = base.reverse.toDF("grp", "v", "k").repartition(7)
    val ps = Seq(("p50", 1, 2), ("p90", 9, 10))
    val a = Stats.percentileDisc(fwd, Seq("grp"), "v", "k", ps).collect()
    val b = Stats.percentileDisc(rev, Seq("grp"), "v", "k", ps).collect()
    assert(a.sameElements(b))
  }
}
