package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date parsing / derivation from the reference load path.
  *
  * The reference parses JS-style date strings ("Mon Jan 05 2024
  * 10:00:00", first 24 chars) with an explicit format, shifts +5h to
  * undo an upstream timezone mangle, month-filters, then buckets
  * day-differences into years/months/days (EDAD 1 / EDAD 2)
  * (capital_sendas.py:136-147, 165-168). All pure Column expressions.
  */
object Dates {

  /** Parse the reference's 24-char "EEE MMM dd yyyy HH:mm:ss" slice
    * with a +`offsetHours` correction; unparseable → null (coerce).
    * The weekday token is redundant and Spark's parser rejects 'E'
    * patterns for parsing, so chars 5..24 are parsed. */
  def parseRefDate(s: Column, offsetHours: Int): Column =
    try_to_timestamp(substring(s, 5, 20), lit("MMM dd yyyy HH:mm:ss")) +
      expr(s"INTERVAL $offsetHours HOURS")

  /** Numeric age bucket: days/365 when ≥ 1 year, days/30 when ≥ 1
    * month, else raw days (integer floor division, like pandas `//`
    * on the non-negative day counts the reference sees). */
  def edadNum(days: Column): Column =
    when(days >= 365, floor(days / 365))
      .when(days >= 30, floor(days / 30))
      .otherwise(days).cast("long")

  /** Unit label matching [[edadNum]]'s bucket. */
  def edadUnit(days: Column): Column =
    when(days >= 365, lit("Años"))
      .when(days >= 30, lit("Meses"))
      .otherwise(lit("Días"))
}
