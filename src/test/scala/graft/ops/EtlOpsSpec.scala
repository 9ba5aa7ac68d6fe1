package graft.ops

import graft.SparkSpec
import graft.ops.EtlOps.RichDF
import org.apache.spark.sql.functions._

class EtlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("antiJoinAll matches null keys like pandas indicator merge") {
    val a = Seq((1, Some("x")), (2, None), (3, Some("z")))
      .toDF("id", "v")
    val b = Seq((1, Some("x")), (2, None)).toDF("id", "v")
    val got = a.antiJoinAll(b).select("id").as[Int].collect().sorted
    assert(got.toSeq == Seq(3)) // (2, null) matches via <=>
  }

  test("dedupFirst keeps exactly the first row per key by tie-break") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30)).toDF("k", "o", "v")
    val got = df.dedupFirst(Seq("k"), Seq(col("o")))
      .select("k", "v").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (2, 30)))
  }

  test("firstMatchJoin never fans out") {
    val facts = Seq(1, 1, 2, 3).toDF("k")
    val lookup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val got = facts.firstMatchJoin(lookup, Seq("k"), Seq(col("v")))
    assert(got.count() == 4) // row count preserved
    assert(got.filter(col("k") === 1 && col("v") =!= "a").count() == 0)
    assert(got.filter(col("k") === 3).select("v").first().isNullAt(0))
  }

  test("coalesceLookup falls back fine -> coarse") {
    val facts = Seq((1, 10), (1, 11), (2, 10)).toDF("k1", "k2")
    val lookup = Seq((1, 10, "fine_v"), (1, 99, "coarse_v"))
      .toDF("k1", "k2", "v")
    val got = facts.coalesceLookup(lookup, Seq("k1", "k2"), Seq("k1"), "v",
        Seq(col("v")))
      .select("k1", "k2", "v").as[(Int, Int, String)].collect().toSet
    assert(got == Set((1, 10, "fine_v"), (1, 11, "coarse_v"), (2, 10, null)))
  }

  test("coalesceLookup broadcast is adaptive: hinted when small, dropped when over threshold") {
    def bhjCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("BroadcastHashJoin"))
    val facts = (1 to 2000).map(i => (i % 50, i % 7)).toDF("k1", "k2")
    val lookup = (1 to 2000).map(i => (i % 50, i % 7, s"v$i"))
      .toDF("k1", "k2", "v")
    val q = facts.coalesceLookup(lookup, Seq("k1", "k2"), Seq("k1"), "v",
      Seq(col("v")))
    // default threshold (10MB): both lookup sides broadcast
    assert(bhjCount(q) == 2, "small lookups must still broadcast")
    // 1-byte threshold: estimate exceeds it → hint dropped, NO
    // broadcast anywhere (a forced hint would ignore the threshold)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val q2 = facts.coalesceLookup(lookup, Seq("k1", "k2"), Seq("k1"), "v",
        Seq(col("v")))
      assert(bhjCount(q2) == 0,
        "fact-sized lookup must not carry a forced broadcast hint")
      val got = q2.select("k1", "k2", "v").distinct().count()
      assert(got > 0) // same results through the shuffle plan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("dedupMarkFirst flags only the first row per key") {
    val df = Seq((1, 1), (1, 2), (2, 1)).toDF("k", "o")
    val got = df.dedupMarkFirst(Seq("k"), Seq(col("o")), "f")
      .select("k", "o", "f").as[(Int, Int, Int)].collect().toSet
    assert(got == Set((1, 1, 1), (1, 2, 0), (2, 1, 1)))
  }

  test("cappedGroupMark: ≤3 total, ≤2 per contiguous sub-group " +
      "(validacion_Qx semantics)") {
    // one invoice group, tipologias scanned T desc: T2,T2,T2,T1,T1
    val df = Seq(
      ("F1", "T2", 1), ("F1", "T2", 2), ("F1", "T2", 3),
      ("F1", "T1", 4), ("F1", "T1", 5))
      .toDF("fac", "tip", "ln")
    val got = df.cappedGroupMark(Seq("fac"), "tip",
        Seq(col("tip").desc, col("ln").asc), 3, 2, "v")
      .select("ln", "v").as[(Int, Int)].collect().toMap
    // T2: first two marked; third skipped (per-sub cap);
    // T1: first marked (total hits 3), second blocked by total cap
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 0, 4 -> 1, 5 -> 0))
  }

  test("gapMark: marks first and >gap since last MARKED; string ids " +
      "and separator-colliding keys are safe") {
    val df = Seq(
      // group (a, b): days 1, 3, 4, 9 — mark 1st; 3 (gap2) no; 4 (gap3
      // since day1) no...  wait gap>3: day9 - day1 = 8 > 3 -> mark
      ("a", "b", "2024-01-01 00:00:00", "e1"),
      ("a", "b", "2024-01-03 00:00:00", "e2"),
      ("a", "b", "2024-01-04 00:00:00", "e3"),
      ("a", "b", "2024-01-09 00:00:00", "e4"),
      // key ("ab","") must NOT collide with ("a","b")
      ("ab", "", "2024-01-03 00:00:00", "e5"))
      .toDF("g1", "g2", "tss", "id")
      .withColumn("ts", to_timestamp(col("tss")))
    val got = df.gapMark(Seq("g1", "g2"), "ts", "id", 3, "v")
      .select("id", "v").as[(String, Int)].collect().toMap
    assert(got == Map("e1" -> 1, "e2" -> 0, "e3" -> 0, "e4" -> 1,
      "e5" -> 1))
  }

  test("upsert: updates win on match (even with null values), inserts land, " +
      "rest persist") {
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "s", "v")
    val updates = Seq((2L, null.asInstanceOf[String], 99), (9L, "new", 90))
      .toDF("k", "s", "v")
    val got = target.upsert(updates, Seq("k"))
      .as[(Long, Option[String], Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some("a"), 10),
      (2L, None, 99), // matched: update's null s STILL wins
      (3L, Some("c"), 30),
      (9L, Some("new"), 90)))
  }

  test("upsert self-lineage: both sides derived from one frame stay disjoint") {
    val base = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)).toDF("k", "v")
    val got = base.filter(col("k") % 2 === 0)
      .upsert(base.filter(col("k") >= 3).select(col("k"),
        (col("v") * 100).as("v")), Seq("k"))
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, 20), (3L, 3000), (4L, 4000)))
  }
}
