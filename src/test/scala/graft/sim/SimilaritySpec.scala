package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.95f, 0.05f)),
    (4L, Array(-1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("partialTopK keeps the k best per query with id tie-break") {
    val it = Iterator((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9),
      (1L, 13L, 0.1), (2L, 20L, 0.3))
    val got = Similarity.partialTopK(it, 2).toSet
    // ties at 0.9: lower neighbor id (11) beats 12? both kept at k=2
    assert(got == Set((1L, 11L, 0.9), (1L, 12L, 0.9), (2L, 20L, 0.3)))
  }

  test("quantizeInt8: absmax scaling, exact codes, zero-vector safe") {
    val v = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 1.0f, -0.5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(v, "embedding", "vec_id")
      .as[(Long, Double, Seq[Long])].collect().sortBy(_._1)
    // amax 1.0 → scale 127: 63.5 rounds half-up to 64
    assert(got(0) == ((0L, 1.0, Seq(64L, -127L, 32L))))
    // zero vector: amax 0, all codes 0 (no div-by-zero)
    assert(got(1) == ((1L, 0.0, Seq(0L, 0L, 0L))))
    // amax 2.0 → scale 63.5: codes 127, 64 (63.5 half-up), -32
    assert(got(2) == ((2L, 2.0, Seq(127L, 64L, -32L))))
    assert(got.forall(_._3.forall(c => c >= -127 && c <= 127)))
  }

  test("bruteTopK ranks nearest vectors first") {
    val q = vecs.filter(col("vec_id") === 0)
    val got = Similarity.bruteTopK(vecs, q, "embedding", "vec_id", 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(got(1L) == 1) // most aligned
    assert(got.size == 2 && !got.contains(0L))
  }

  test("lshTopK only pairs vectors sharing a bucket and never exceeds k") {
    val q = vecs.filter(col("vec_id") === 0)
    val got = Similarity.lshTopK(vecs, q, "embedding", "vec_id",
      dim = 3, planes = 2, k = 3).collect()
    assert(got.length <= 3)
    assert(got.forall(_.getAs[Long]("query_id") == 0L))
  }

  test("kmeansStep reassigns a mislabeled vector and recomputes means") {
    // two tight groups on the x / y axes; vector 9 sits on the y axis
    // but starts mislabeled into group 0 → Lloyd moves it to group 1
    // and the updated centroids are the clean per-axis means
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.0f, 0.9f), 1),
      (9L, Array(0.0f, 0.95f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.kmeansStep(df, "embedding", "vec_id", "label")
      .as[(Int, Int, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // cluster 0 keeps {0, 1}: mean x = 0.95; cluster 1 gains 9:
    // mean y = (1.0 + 0.9 + 0.95) / 3 = 0.95
    assert(got((0, 1)) == (0.95, 2L) && got((0, 2)) == (0.0, 2L))
    assert(got((1, 1)) == (0.0, 3L) && got((1, 2)) == (0.95, 3L))
  }

  test("nearDupPairs honors threshold and block boundaries") {
    val blocked = vecs.withColumn("blk",
      when(col("vec_id") <= 1, "a").otherwise("b"))
    val got = Similarity.nearDupPairs(blocked, "embedding", "vec_id",
        "blk", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (2L, 3L))) // 4 is anti-aligned; cross-block never paired
  }

  test("semanticDedup drops lower-id-dominated vectors inside their cell") {
    // x-axis cell {0, 1, 9}, y-axis cell {2, 3}: 1 and 9 are near-dups
    // of 0 (cos ≈ 1 ≥ 0.9) so both carry dup_of = 0; 9 starts
    // mislabeled but the argmin reassigns it to the x cell first. 2
    // and 3 are mutual near-dups → 3 drops, 2 keeps (first seen).
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.0f, 0.9f), 1),
      (9L, Array(0.95f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.semanticDedup(df, "embedding", "vec_id",
        "label", 0.9)
      .as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(0L) == (0, 1, -1L) && got(1L) == (0, 0, 0L) &&
      got(9L) == (0, 0, 0L))
    assert(got(2L) == (1, 1, -1L) && got(3L) == (1, 0, 2L))
  }

  test("semanticDedup: kept set has no internal near-dup pair per cell") {
    // property on a deterministic pseudo-random corpus: after dedup,
    // re-running pair generation restricted to kept vectors inside
    // each cell at the same threshold finds nothing
    val rnd = new scala.util.Random(42)
    val df = (0L until 60L).map { i =>
      val base = Array.fill(4)(rnd.nextFloat() - 0.5f)
      (i, base, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val verdict = Similarity.semanticDedup(df, "embedding", "vec_id",
      "label", 0.95)
    val kept = df.join(verdict.filter(col("keep") === 1)
        .select(col("vec_id")), "vec_id")
      .join(verdict.select(col("vec_id"), col("cluster")), "vec_id")
    val residual = Similarity.nearDupPairs(kept, "embedding", "vec_id",
      "cluster", 0.95)
    assert(residual.count() == 0)
  }
}
