package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Vectors are `array<float>` columns; all math is done as explicit
  * left-folds over doubles (`zip_with` + `aggregate`) so the result is
  * bit-reproducible by any IEEE-754 engine evaluating in the same
  * order — which is what lets the DuckDB oracle agree on ranks.
  */
object Similarity {

  /** Sequential-fold dot product with per-element double promotion. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * The baseline ANN path: broadcast the (small) query set against the
    * corpus — a map-side cross product, no shuffle of the corpus until
    * the final per-query top-k (tiny after filtering to k via window).
    * Returns (query_id, neighbor_id, rank); ties broken by neighbor id.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Random-hyperplane LSH bucket signature (SimHash-style) for the
    * scale path: vectors only compete within their bucket. Hyperplanes
    * are pseudo-random but deterministic (md5-seeded per (plane, dim)),
    * so signatures are engine-portable. */
  def hyperplaneSig(vec: Column, dim: Int, planes: Int): Column =
    concat((0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec,
          array((0 until dim).map { d =>
            // deterministic pseudo-random weight in [-0.5, 0.5)
            (conv(substring(md5(lit(s"hp:$p:$d")), 1, 8), 16, 10)
              .cast("double") / lit(4294967296.0)) - lit(0.5)
          }: _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Near-dup pairs by cosine ≥ threshold within a blocking column.
    * At 100 TB the block is an LSH signature ([[hyperplaneSig]]);
    * for verification any equi-block works. */
  def nearDupPairs(vectors: DataFrame, vecCol: String, idCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val v = vectors.select(col(blockCol).as("blk"),
      col(idCol).as("id"), col(vecCol).as("v"))
    val l = v.toDF("blk_a", "id_a", "v_a")
    val r = v.toDF("blk_b", "id_b", "v_b")
    l.join(r, col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
      .withColumn("score", cosine(col("v_a"), col("v_b")))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b")
  }
}
