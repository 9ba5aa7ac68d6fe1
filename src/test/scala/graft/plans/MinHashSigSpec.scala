package graft.plans

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import scala.util.Random

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native signature is bit-identical to the declarative per-perm folds") {
    val rnd = new Random(11)
    val rows = (1 to 150).map { _ =>
      Array.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % 4294967296L)
    }
    val df = rows.toDF("hs")
    val got = df.select(
      TextFunctions.minhashFromHashes(col("hs"), 16).as("native"),
      TextFunctions.minhashFromHashesFold(col("hs"), 16).as("fold"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(got.length == rows.length)
    got.foreach { case (n, f) => assert(n == f) }
  }

  test("null array, empty array, and null elements mirror the fold") {
    val df = Seq(
      Some(Seq[Option[Long]](Some(5L), None, Some(9L))), // nulls skipped
      Some(Seq.empty[Option[Long]]),                     // empty → all-null sig
      None                                               // null → all-null sig
    ).toDF("hs")
    val got = df.select(
      TextFunctions.minhashFromHashes(col("hs"), 4).as("native"),
      TextFunctions.minhashFromHashesFold(col("hs"), 4).as("fold"))
      .as[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])].collect()
    got.foreach { case (n, f) =>
      // twin builds array(null,...) for the degenerate cases — compare
      // slot-by-slot (both non-null arrays of equal content)
      assert(n.isDefined && f.isDefined && n.get == f.get, s"($n, $f)")
    }
  }

  test("registers as a SQL function via extensions") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_minhash_sig(array(CAST(7 AS BIGINT), CAST(42 AS BIGINT)), 3)")
      .as[Seq[Long]].first()
    val want = Seq(Tuple1(Seq(7L, 42L))).toDF("hs")
      .select(TextFunctions.minhashFromHashesFold(col("hs"), 3))
      .as[Seq[Long]].first()
    assert(got == want && got.length == 3)
  }
}
