package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the right row with the
  * greatest `rightTs` ≤ the left row's `leftTs`, matching on an
  * equi-key.
  *
  * Spark has no native as-of join; the classic scalable rewrite is a
  * tagged union + one window pass: interleave both sides sorted by
  * (key, ts, side), carry the right side's payload forward with
  * `last(ignoreNulls)` over rows-unbounded-preceding, keep the left
  * rows. ONE shuffle on the key — never a range cross-join, never a
  * per-key collect, so it survives 100 TB on either side. Ties
  * (rightTs == leftTs) match, right-before-left within a timestamp.
  *
  * `right` must be unique per (key, ts) — pre-aggregate if not
  * (otherwise "the" as-of row is ill-defined).
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__k", col(leftKey)).withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAll = payloadCols.foldLeft(lTagged)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val rTagged = right
      .withColumn("__k", col(rightKey)).withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rAll = leftCols.foldLeft(rTagged)((d, c) =>
      if (payloadCols.contains(c) || c == "__k" || c == "__ts" || c == "__side") d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (leftCols ++ payloadCols).distinct :+ "__k" :+ "__ts" :+ "__side"
    val unioned = lAll.selectExpr(cols.map(c => s"`$c`"): _*)
      .unionByName(rAll.selectExpr(cols.map(c => s"`$c`"): _*))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__k", "__ts", "__side")
  }
}
