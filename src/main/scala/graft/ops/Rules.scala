package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative re-expression of the reference's sequential masked
  * updates and rule-priority row selection.
  *
  * The reference mutates a `validacion` column through an ordered
  * chain of `df.loc[mask, col] = value` statements
  * (capital_sendas.py:413-488, 562-568) and picks one candidate row
  * per group by an ordered list of predicates
  * (capital_sendas.py:217-257, asignar_tipologia). Both are pure
  * row-local / window logic — no sequential driver loop survives the
  * rewrite, so everything stays in whole-stage codegen.
  */
object Rules {

  /** Apply an ordered chain of masked updates to one target column.
    *
    * Semantics match sequential `df.loc[mask_i, target] = value_i`:
    * LATER rules overwrite earlier ones where both masks hit, rows no
    * mask hits keep `init`. Compiled to one nested CASE expression
    * (reverse fold), evaluated in a single map pass — the 100 TB cost
    * is a projection, nothing more.
    */
  def chainUpdate(df: DataFrame, target: String, init: Column,
      rules: Seq[(Column, Column)]): DataFrame = {
    val expr = rules.foldLeft(init) { case (prev, (mask, value)) =>
      when(mask, value).otherwise(prev)
    }
    df.withColumn(target, expr)
  }

  /** Pick one row per group by rule priority: the first predicate (in
    * order) that any row of the group satisfies wins, and among rows
    * satisfying it the first by `order` is kept.
    *
    * Reference: asignar_tipologia (capital_sendas.py:217-257) —
    * PEDIATRIA-if-age<14, else GINECOLOGIA-if-F, else first neutral
    * row. Rows matching no predicate never win; groups where no row
    * matches any predicate produce no output row (the reference drops
    * `Valida == ''`).
    *
    * One window over the group key — a single shuffle, no per-group
    * python-style loop.
    */
  def priorityPick(df: DataFrame, groupKeys: Seq[String],
      predicates: Seq[Column], order: Seq[Column]): DataFrame = {
    val prio = predicates.zipWithIndex.foldRight(lit(Int.MaxValue): Column) {
      case ((p, i), rest) => when(p, lit(i)).otherwise(rest)
    }
    val w = Window.partitionBy(groupKeys.map(col).toIndexedSeq: _*)
      .orderBy((col("__prio").asc +: order).toIndexedSeq: _*)
    df.withColumn("__prio", prio)
      .filter(col("__prio") =!= Int.MaxValue)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }

  /** Flag rows whose `groupCol` value appears in at least one row
    * satisfying `markerPred` — the reference's "factura contains
    * servicio 132P01" semi-join rule (capital_sendas.py:444-456).
    * The marker key set is aggregated then broadcast: the big side is
    * never shuffled.
    */
  def semiMarker(df: DataFrame, groupCol: String, markerPred: Column,
      flag: String): DataFrame = {
    val markers = df.filter(markerPred)
      .select(col(groupCol).as("__mk")).distinct()
    df.join(broadcast(markers), col(groupCol) === col("__mk"), "left")
      .withColumn(flag, col("__mk").isNotNull)
      .drop("__mk")
  }

  /** [[semiMarker]] as a window: one shuffle on the group key, zero
    * re-derivation of `df`. Prefer this when `df` is an expensive
    * unpersisted subtree (the join form evaluates it twice — once for
    * the rows, once for the distinct marker set); prefer the join
    * form when the frame is persisted or the marker set must come
    * from a DIFFERENT frame. Identical results. */
  def semiMarkerWindow(df: DataFrame, groupCol: String,
      markerPred: Column, flag: String): DataFrame =
    df.withColumn(flag,
      // coalesce: a group whose every markerPred is null has a null
      // max — the join form yields false there, so match it exactly
      coalesce(max(markerPred.cast("int"))
        .over(Window.partitionBy(col(groupCol))) === 1, lit(false)))
}
