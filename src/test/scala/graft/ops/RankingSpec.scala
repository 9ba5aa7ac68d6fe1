package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("global withRank equals the single-sort row_number") {
    val df = (1 to 500).map { i =>
      (i.toLong, (i * 37 % 91).toLong) // dup-heavy order values
    }.toDF("k", "v").repartition(7)
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .select("k", "rk").as[(Long, Long)].collect().toMap
    val got = Ranking.withRank(df, Nil, Seq(col("v"), col("k")), "rk", "n")
      .select("k", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("grouped withRank equals the per-group row_number, n is group size") {
    val df = (1 to 300).map { i =>
      ("g" + (i % 3), i.toLong, (i * 17 % 23).toLong)
    }.toDF("g", "k", "v").repartition(5)
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("v"), col("k"))).cast("long"))
      .select("g", "k", "rk").as[(String, Long, Long)].collect().toSet
    val out = Ranking.withRank(df, Seq("g"), Seq(col("v"), col("k")),
      "rk", "n")
    assert(out.select("g", "k", "rk").as[(String, Long, Long)]
      .collect().toSet == want)
    assert(out.groupBy("g").agg(max("n")).as[(String, Long)]
      .collect().toMap == Map("g0" -> 100L, "g1" -> 100L, "g2" -> 100L))
  }

  test("desc order and repartitioning do not change ranks") {
    val df = (1 to 200).map(i => (i.toLong, (i * 7 % 31).toLong))
      .toDF("k", "v")
    val want = df.withColumn("rk", row_number().over(
        Window.orderBy(col("v").desc, col("k"))).cast("long"))
      .select("k", "rk").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 3, 11)) {
      val got = Ranking.withRank(df.repartition(parts), Nil,
          Seq(col("v").desc, col("k")), "rk")
        .select("k", "rk").as[(Long, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("global withPrefixSums equals the single-sort running sums") {
    // Distinct order keys (the documented precondition: aggregate to
    // distinct keys first), two sum columns at once.
    val df = (1 to 400).map { i =>
      (i.toLong, (i * 37 % 91).toLong, (i * 13 % 17).toLong)
    }.toDF("v", "a", "b").repartition(9)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("a_cum", sum(col("a")).over(w))
      .withColumn("b_cum", sum(col("b")).over(w))
      .select("v", "a_cum", "b_cum").as[(Long, Long, Long)]
      .collect().toSet
    val got = Ranking.withPrefixSums(df, Nil, Seq(col("v")), Seq("a", "b"))
      .select("v", "a_cum", "b_cum").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == want)
  }

  test("grouped withPrefixSums equals per-group running sums, any parts") {
    val df = (1 to 300).map { i =>
      ("g" + (i % 3), i.toLong, (i * 17 % 23).toLong)
    }.toDF("g", "v", "a")
    val w = Window.partitionBy("g").orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("a_cum", sum(col("a")).over(w))
      .select("g", "v", "a_cum").as[(String, Long, Long)].collect().toSet
    for (parts <- Seq(1, 4, 13)) {
      val got = Ranking.withPrefixSums(df.repartition(parts), Seq("g"),
          Seq(col("v")), Seq("a"))
        .select("g", "v", "a_cum").as[(String, Long, Long)]
        .collect().toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("a dominant hot (group, v) key ranks correctly AND spreads across slices") {
    // 50% of one group's rows share the same order VALUE — the skew
    // shape VERDICT r8 flagged. The contract's unique tiebreaker does
    // two jobs here: it makes the rank deterministic, and because it
    // participates in the RANGE key, the range partitioner can split
    // the hot equal-value run across slices (slice boundaries may
    // fall inside the run) — the hot key does not serialize into one
    // task the way a hash-partitioned window would force.
    val n = 20000
    val df = (0 until n).map { i =>
      val v = if (i % 2 == 0) 42L else 100L + (i % 1000)
      ("g", v, i.toLong)
    }.toDF("g", "v", "id").repartition(8)
    val ranked = Ranking.withRank(df, Seq("g"),
      Seq(col("v"), col("id")), "rk", "cnt")
    // exact: ranks are the permutation induced by the (v, id) total
    // order, group count rides along
    val got = ranked.select("v", "id", "rk", "cnt")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == n && got.forall(_._4 == n))
    got.sortBy(t => (t._1, t._2)).zipWithIndex.foreach {
      case ((v, id, rk, _), idx) =>
        assert(rk == idx + 1L, s"rank of ($v, $id)")
    }
    // distribution: replicate withRank's range partitioning and check
    // the hot run's rows land in MULTIPLE slices. Pinned to 8 slices,
    // NOT the session conf: at 2 slices the single sampled boundary
    // can land exactly at the hot run's edge (the run is exactly half
    // the rows), putting the whole run in one slice — a sampling
    // artifact of the replica, not a property failure. At 8 slices
    // the 50%-of-rows run spans ~4 boundary targets; only a
    // pathological reservoir sample could keep it whole.
    val parts = 8
    val hotSlices = df
      .repartitionByRange(parts, col("g"), col("v"), col("id"))
      .withColumn("pid", spark_partition_id())
      .filter(col("v") === 42L)
      .select("pid").distinct().count()
    assert(hotSlices > 1,
      s"hot key serialized into $hotSlices slice(s) — the tiebreaker " +
        "must keep the equal-value run splittable")
  }

  test("range-slice assignment is frozen: one materialized shuffle feeds both branches") {
    // r10 live bug: repartitionByRange draws its slice boundaries
    // from reservoir samples whose selection depends on shuffle-fetch
    // arrival order — nondeterministic across jobs. The local-window
    // branch and the offsets branch each consumed the ranged frame;
    // when the exchange re-executed per branch, a boundary-adjacent
    // row could land in different slices and every downstream offset
    // from that boundary on was silently wrong — AND the same
    // returned DataFrame answered differently on successive actions.
    // The fix stages the ranged frame. Pinned both ways: structurally
    // (the executed plan consumes a materialized RDD scan, with NO
    // live range exchange left to re-run) and behaviorally (repeated
    // executions all equal the single-sort windowed truth).
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 100000, 1L))
      .toDF("v", "b").groupBy("v").agg(sum("b").as("b"))
    val got = Ranking.withPrefixSums(df.repartition(8), Nil,
      Seq(col("v")), Seq("b"))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"ranged frame not staged — live exchange subject to re-sampling:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"live range exchange still in the consuming plan:\n$plan")
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("tc", sum(col("b")).over(w))
      .select("v", "tc").as[(Long, Long)].collect().toMap
    (1 to 3).foreach { i =>
      val g = got.select("v", "b_cum").as[(Long, Long)].collect().toMap
      assert(g == want, s"execution $i diverged from the windowed truth")
    }
  }

  test("ntileFromRank reproduces ntile(k) for every n in 1..23") {
    for (n <- 1 to 23) {
      val df = (1 to n).map(i => (i.toLong, (i * 13 % 7).toLong))
        .toDF("k", "v")
      val want = df.withColumn("t",
          ntile(5).over(Window.orderBy(col("v"), col("k"))))
        .select("k", "t").as[(Long, Int)].collect().toMap
      val got = Ranking.withRank(df, Nil, Seq(col("v"), col("k")), "rk", "n")
        .withColumn("t", Ranking.ntileFromRank(col("rk"), col("n"), 5))
        .select("k", "t").as[(Long, Int)].collect().toMap
      assert(got == want, s"n=$n")
    }
  }
}
