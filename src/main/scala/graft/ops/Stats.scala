package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics over integer-valued columns.
  *
  * `percentile_disc` semantics — the smallest value whose rank
  * reaches ceil(p·n) — computed with INTEGER arithmetic only
  * (rank·den ≥ n·num, no float rank thresholds), so results are
  * identical on every engine and under any partitioning.
  *
  * Shape: one shuffle on the group key (window sort), then an
  * ordinary partial-aggregated groupBy on the same key — no
  * per-group collection, no driver work; group cardinality bounds
  * nothing (each group streams through its window partition).
  */
object Stats {

  /** Exact discrete percentiles per group. `ps` are (label,
    * numerator, denominator) rational percentiles, e.g.
    * ("p90", 9, 10). `orderCol` must be integer-typed; `tieCol`
    * makes the within-group order total (determinism of rank
    * assignment — the VALUE picked is tie-invariant, but keep the
    * contract strict). */
  def percentileDisc(df: DataFrame, groupCols: Seq[String],
      orderCol: String, tieCol: String,
      ps: Seq[(String, Int, Int)]): DataFrame = {
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*)
      .orderBy(col(orderCol), col(tieCol))
    val wAll = Window.partitionBy(grp: _*)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val pcols: Seq[Column] = ps.map { case (label, num, den) =>
      // rn >= ceil(n * num/den)  ⇔  rn * den >= n * num  (exact ints).
      // rn is IntegerType — widen to long BEFORE multiplying so groups
      // past ~Int.MaxValue/den rows don't overflow (ANSI would throw);
      // n from count() is already long, so n*num widens on its own,
      // but keep num small (≤ den ≤ ~1000 by contract).
      min(when(col("__rn").cast("long") * den >= col("__n") * num,
        col(orderCol))).as(label)
    }
    ranked.groupBy(grp: _*)
      .agg(max(col("__n")).as("n"), pcols: _*)
  }
}
