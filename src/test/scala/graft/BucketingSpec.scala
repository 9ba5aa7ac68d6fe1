package graft

import org.apache.spark.sql.functions._

/** The co-located-join story: facts bucketed on the join key join
  * WITHOUT any Exchange — at 100 TB, bucketing the big tables on
  * their join keys once at write time removes the per-query shuffle
  * entirely. Local warehouse, real `bucketBy` writes, plan-asserted.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previous run that died mid-test leaves the managed location
    // behind without a catalog entry — remove the directory too
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
  }

  test("bucketed fact-fact join plans no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    dropTable("li_b")
    dropTable("ord_b")
    Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    // facts would never broadcast at real scale; force the planner
    // into the shuffle-vs-bucketed decision the test is about
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (j, plan) = try {
      val j = spark.table("li_b").join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      (j, j.queryExecution.executedPlan.toString)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // SortMergeJoin over bucket-aligned scans: the only exchange
    // allowed is the one for the final aggregation on o_custkey
    val joinPart = plan.split("SortMergeJoin")(1)
    assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles on the join key:\n$plan")
    assert(plan.contains("Bucketed: true"), "scans not bucket-aligned")
    // and it computes the right thing
    val expect = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(j.as[(Long, Long)].collect().toMap == expect)
    dropTable("li_b")
    dropTable("ord_b")
  }
}
