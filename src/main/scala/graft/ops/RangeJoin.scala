package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval containment join (point ∈ [start, end]) without an equi
  * key — the second member of the temporal-join pair next to
  * [[AsofJoin]].
  *
  * Naively this is a non-equi join: Spark plans a (broadcast) nested
  * loop — O(|points|·|intervals|) comparisons, the classic scale
  * cliff. The scale path manufactures an equi key: quantize time into
  * fixed buckets, explode each interval over the buckets it covers,
  * tag each point with its single bucket, and equi-join on the bucket
  * before the exact BETWEEN filter. Each (point, interval) match
  * surfaces exactly once — in the point's own bucket — so no dedup
  * pass is needed. Shuffle volume is |points| + Σ(interval length /
  * bucket) instead of a cross product; pick `bucketMicros` near the
  * median interval length so the explode factor stays ~2.
  */
object RangeJoin {

  /** points(ptCol: micros long) ⨝ intervals([startCol, endCol]:
    * micros long, inclusive) on containment. Output: every point row
    * joined with every containing interval's columns. Column name
    * overlap must be resolved by the caller (alias beforehand). */
  def bucketedRangeJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val b = lit(bucketMicros)
    // floor-div on longs: micros are non-negative in practice, but
    // pmod keeps negatives correct too
    def bucketOf(c: Column): Column = floor(c / b).cast("long")
    val iv = intervals.withColumn("__rj_b",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pt = points.withColumn("__rj_b", bucketOf(col(ptCol)))
    pt.join(iv, Seq("__rj_b"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__rj_b")
  }
}
