package graft.plans

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

class HyperplaneSigSpec extends SparkSpec {
  import spark.implicits._

  test("native signature is bit-identical to the declarative fold on random vectors") {
    val rnd = new Random(7)
    val dim = 64
    val vecs = (1 to 200).map { _ =>
      Array.fill(dim)((rnd.nextGaussian() * 0.3).toFloat)
    } :+ Array.fill(dim)(0.0f) // all-zero vector: every proj == +0.0 → all '1'
    val df = vecs.toDF("v")
    val got = df.select(
      Similarity.hyperplaneSig(col("v"), dim, 8).as("native"),
      Similarity.hyperplaneSigFold(col("v"), dim, 8).as("fold"))
      .as[(String, String)].collect()
    assert(got.length == vecs.length)
    got.foreach { case (n, f) => assert(n == f) }
  }

  test("degenerate inputs sign all-zeros exactly like the fold") {
    // wrong length, null element, null vector — the fold's null
    // poisoning makes every plane fall through when(...) to '0'
    val df = Seq(
      Some(Array(1.0f, 2.0f)),          // length 2 ≠ dim 4
      Some(Array.empty[Float]),         // empty
      None                              // null vector
    ).toDF("v")
      .union(Seq(Tuple1(Seq[Option[Float]](Some(1.0f), None, Some(2.0f), Some(3.0f))))
        .toDF("v")) // null element at the right length
    val got = df.select(
      Similarity.hyperplaneSig(col("v").cast("array<float>"), 4, 6).as("native"),
      Similarity.hyperplaneSigFold(col("v").cast("array<float>"), 4, 6).as("fold"))
      .as[(String, String)].collect()
    got.foreach { case (n, f) =>
      assert(n == "000000" && f == "000000", s"($n, $f)")
    }
  }

  test("registers as a SQL function via extensions") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_hyperplane_sig(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 2, 4)")
      .as[String].first()
    val want = Seq(Tuple1(Array(0.5f, -0.25f))).toDF("v")
      .select(Similarity.hyperplaneSigFold(col("v"), 2, 4)).as[String].first()
    assert(got == want && got.length == 4)
  }
}
