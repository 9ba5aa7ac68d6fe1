package graft.plans

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class FloatVecDotSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.1f, -0.2f), Array(0.3f, 0.7f)),
    (Array.empty[Float], Array.empty[Float]))
    .toDF("a", "b")

  test("native dot is bit-identical to the declarative fold") {
    val got = pairs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("fold"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, f) => assert(n == f) }
  }

  test("mismatched lengths and null elements yield null (fold parity)") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b")),
      Similarity.dotFold(col("a"), col("b"))).collect()(0)
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("registers as a SQL function via extensions") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .as[Double].first()
    assert(got == 11.0)
  }
}
