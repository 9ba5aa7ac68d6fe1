package graft

import graft.ops.EtlOps.RichDF
import graft.sources.BatchLoad
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Algebraic laws of the incremental operators, ScalaCheck-driven:
  * replays and re-applies MUST be no-ops (idempotence) or the
  * cross-batch/upsert story breaks on retry. Small generated frames,
  * low case counts — the laws, not the volume, are the point. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(20)

  private def rows: Gen[List[(Long, String, Int)]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(1L, 6L)
      s <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 9)
    } yield (k, s, v))

  private def df(xs: List[(Long, String, Int)]): DataFrame =
    xs.toDF("k", "s", "v")

  private def canon(d: DataFrame): Set[(Long, String, Int)] =
    d.as[(Long, String, Int)].collect().toSet

  test("upsert is idempotent: applying the same deduped batch twice = once") {
    val prop = Prop.forAll(rows, rows) { (t0, u0) =>
      val target = df(t0).dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val updates = df(u0).dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val once = target.upsert(updates, Seq("k"))
      val twice = once.upsert(updates, Seq("k"))
      canon(once) == canon(twice)
    }
    assert(check(params, prop).passed)
  }

  test("appendIncremental is idempotent: replaying a batch adds nothing") {
    val prop = Prop.forAll(rows, rows) { (a0, b0) =>
      val acc = df(a0).distinct()
      val batch = df(b0).distinct()
      val once = BatchLoad.appendIncremental(Some(acc), batch)
      val twice = BatchLoad.appendIncremental(Some(once), batch)
      canon(once) == canon(twice) &&
        canon(once) == (canon(acc) ++ canon(batch))
    }
    assert(check(params, prop).passed)
  }

  test("dedupFirst is idempotent and key-unique") {
    val prop = Prop.forAll(rows) { xs =>
      val once = df(xs).dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val twice = once.dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val keys = once.select("k").as[Long].collect()
      canon(once) == canon(twice) && keys.length == keys.distinct.length
    }
    assert(check(params, prop).passed)
  }
}
