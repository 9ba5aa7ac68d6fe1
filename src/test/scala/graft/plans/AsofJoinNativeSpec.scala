package graft.plans

import graft.SparkSpec
import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of: latest right ≤ ts per key, null when none, null keys safe") {
    val left = Seq(
      (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-early"),
      (2L, 50L, "l-c"), (3L, 7L, "l-nomatch"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 8L, "r1@8"), (1L, 15L, "r1@15"), (1L, 21L, "r1@21"),
      (2L, 50L, "r2@50"), (4L, 1L, "r4"))
      .toDF("rk", "rts", "rv")
    val got = AsofJoinNative.asof(left, right, "k", "rk", "ts", "rts")
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(got == Map(
      "l-a" -> Some("r1@8"),      // 8 ≤ 10 < 15
      "l-b" -> Some("r1@15"),     // latest ≤ 20
      "l-early" -> None,          // nothing ≤ 5
      "l-c" -> Some("r2@50"),     // ts equality joins
      "l-nomatch" -> None))       // key absent on the right
  }

  test("native exec equals the tagged-union rewrite on real events/orders") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("d"))
    val o = graft.Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    val rewrite = AsofJoin.asof(e, o, "user_id", "o_custkey", "d", "od",
        Seq("last_orderkey"))
      .select(col("event_id"), col("last_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    val native = AsofJoinNative.asof(e, o, "user_id", "o_custkey", "d", "od")
      .select(col("event_id"), col("last_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native.nonEmpty && native == rewrite)
  }

  test("FilterPushdown pushes left-only predicates through the custom node") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("d"))
    val o = graft.Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    val joined = AsofJoinNative.asof(e, o, "user_id", "o_custkey", "d", "od")
      .filter(col("event_id") < 100 && col("last_orderkey").isNotNull)
    val plan = joined.queryExecution.executedPlan.toString
    // the left-only predicate must reach the events parquet scan;
    // the right-side predicate must stay above the join
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]"),
      plan)
    val expected = e.filter(col("event_id") < 100).count()
    assert(joined.count() <= expected)
    assert(joined.count() ==
      AsofJoinNative.asof(e.filter(col("event_id") < 100), o,
        "user_id", "o_custkey", "d", "od")
        .filter(col("last_orderkey").isNotNull).count())
  }

  test("native exec plans cluster+sort on both sides, no cartesian") {
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "lv")
    val right = Seq((1L, 8L, "r")).toDF("rk", "rts", "rv")
    val plan = AsofJoinNative.asof(left, right, "k", "rk", "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan) // nodeName strips "Exec"
    assert(plan.contains("Sort [k") && plan.contains("Sort [rk"), plan)
    assert(plan.contains("Exchange hashpartitioning(k") &&
      plan.contains("Exchange hashpartitioning(rk"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
