package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-derived ETL operators as DataFrame extensions.
  *
  * Each operator re-expresses a pandas pattern from
  * /root/reference/capital_sendas.py as a declarative, shuffle-aware
  * Spark transformation: `groupby().apply(python_fn)` becomes window
  * functions, `update`-by-index becomes CASE rewrites, `merge` +
  * `drop_duplicates` becomes a windowed dedup + join. Everything except
  * [[EtlOps.RichDF.gapMark]] stays inside whole-stage codegen.
  */
object EtlOps {

  /** Broadcast `lookup` only when Catalyst's size estimate fits the
    * session's autoBroadcastJoinThreshold. A forced `broadcast()`
    * hint overrides the threshold unconditionally — correct for a
    * true dimension, an executor/driver OOM when the "lookup" is
    * fact-sized (the reference joins lineitem-derived lookups, which
    * grow with the fact table). Without the hint the planner still
    * auto-broadcasts anything genuinely small, so dropping it never
    * costs the broadcast — it only stops lying about size. */
  private def adaptiveBroadcast(lookup: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val thresh = GraftBridge.broadcastThreshold(lookup.sparkSession)
    if (thresh > 0 && GraftBridge.sizeEstimate(lookup) <= thresh)
      broadcast(lookup)
    else lookup
  }

  implicit class RichDF(val df: DataFrame) {

    /** Anti-join on ALL shared columns with null-safe equality.
      *
      * Reference: cross-batch dedup when concatenating monthly xlsx
      * loads (capital_sendas.py:112-125 — pandas indicator merge +
      * `left_only`). Pandas matches NaN keys in merges, hence `<=>`.
      * Scale: a shuffle hash anti-join on the row hash; no driver work.
      */
    def antiJoinAll(other: DataFrame): DataFrame = {
      // Alias both sides so the per-column condition can never resolve
      // both references to one attribute when `other` shares lineage
      // with `df` (the dataframe-API self-join trap: df(c) <=> o(c)
      // logs "trivially true equals predicate" and relies on Spark's
      // disambiguation heuristic).
      val l = df.alias("__aja_l")
      val r = other.select(df.columns.map(col).toIndexedSeq: _*)
        .alias("__aja_r")
      val cond = df.columns
        .map(c => col(s"__aja_l.`$c`") <=> col(s"__aja_r.`$c`"))
        .reduce(_ && _)
      l.join(r, cond, "left_anti")
    }

    /** MERGE/upsert re-expressed on plain tables: rows of `updates`
      * replace same-key rows of the target, unmatched update rows
      * insert, unmatched target rows persist. One full-outer join on
      * the key + per-column coalesce — the Delta/Iceberg MERGE INTO
      * shape without a table format, for pipelines that rewrite
      * partitions instead (the reference rewrites its whole monthly
      * output, capital_sendas.py:571-603). `keys` must be unique on
      * BOTH sides (enforce upstream with dedupFirst). */
    def upsert(updates: DataFrame, keys: Seq[String]): DataFrame = {
      val l = df.alias("__ups_t")
      // explicit presence marker: "the update side matched" must not
      // be inferred from key nullness (null keys are legal with <=>),
      // and a null VALUE in a matched update row must still win
      val r = updates.select(df.columns.map(col).toIndexedSeq: _*)
        .withColumn("__u_present", lit(true)).alias("__ups_u")
      val cond = keys.map(k => col(s"__ups_t.`$k`") <=> col(s"__ups_u.`$k`"))
        .reduce(_ && _)
      val merged = df.columns.map { c =>
        if (keys.contains(c))
          coalesce(col(s"__ups_t.`$c`"), col(s"__ups_u.`$c`")).as(c)
        else
          when(col("__ups_u.__u_present"), col(s"__ups_u.`$c`"))
            .otherwise(col(s"__ups_t.`$c`")).as(c)
      }
      l.join(r, cond, "full_outer").select(merged.toIndexedSeq: _*)
    }

    /** Keep the first row per key, ordered by `tieBreak` — the engine's
      * deterministic version of pandas `drop_duplicates(keep='first')`
      * (capital_sendas.py:159, 179, 191, 270). */
    def dedupFirst(keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
        .orderBy(tieBreak.toIndexedSeq: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

    /** First-match left join: dedup `lookup` to one row per key before
      * joining so the join cannot fan out.
      *
      * Reference: every enrichment join (capital_sendas.py:157-160,
      * 268-271) does `merge(lookup.drop_duplicates(key), how='left')`.
      * Scale: lookups are dims — broadcast them (no shuffle of the
      * fact side). Pass broadcastLookup=false for large lookups.
      */
    def firstMatchJoin(lookup: DataFrame, keys: Seq[String],
        tieBreak: Seq[Column], broadcastLookup: Boolean = true): DataFrame = {
      val first = new RichDF(lookup).dedupFirst(keys, tieBreak)
      df.join(if (broadcastLookup) broadcast(first) else first,
        keys.toIndexedSeq, "left")
    }

    /** Two-level lookup with fallback: join on `fineKeys`; where that
      * misses, fall back to a `coarseKeys` match; the enriched value is
      * `coalesce(fine, coarse)`.
      *
      * Reference: tipologia assignment — H1-H5 match on
      * (SERVICIO, NOM_CENTROCOS), everything else on SERVICIO, merged
      * via fillna (capital_sendas.py:170-198).
      */
    def coalesceLookup(lookup: DataFrame, fineKeys: Seq[String],
        coarseKeys: Seq[String], valueCol: String,
        tieBreak: Seq[Column]): DataFrame = {
      val fineRows = new RichDF(lookup).dedupFirst(fineKeys, tieBreak)
      val fine = fineRows
        .select((fineKeys :+ valueCol).map(col).toIndexedSeq: _*)
        .withColumnRenamed(valueCol, "__fine")
      // With nested keys the coarse winner = winner-of-winners over
      // the fine representatives (first-by-a-total-order is
      // transitive), so the second dedup runs over |fine| rows
      // instead of re-scanning the whole lookup.
      val coarseSrc =
        if (coarseKeys.forall(fineKeys.contains)) fineRows else lookup
      val coarse = new RichDF(coarseSrc).dedupFirst(coarseKeys, tieBreak)
        .select((coarseKeys :+ valueCol).map(col).toIndexedSeq: _*)
        .withColumnRenamed(valueCol, "__coarse")
      // adaptive, not forced: the reference's lookups are sometimes
      // lineitem-derived (fact-sized) — hint only what fits
      df.join(adaptiveBroadcast(fine), fineKeys.toIndexedSeq, "left")
        .join(adaptiveBroadcast(coarse), coarseKeys.toIndexedSeq, "left")
        .withColumn(valueCol, coalesce(col("__fine"), col("__coarse")))
        .drop("__fine", "__coarse")
    }

    /** Flag the first row of each key combination with 1, the rest 0 —
      * pandas `~duplicated(keys)` (capital_sendas.py:395-410, 546-559,
      * the Egreso and Qx1 rules). */
    def dedupMarkFirst(keys: Seq[String], order: Seq[Column],
        flag: String): DataFrame = {
      val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
        .orderBy(order.toIndexedSeq: _*)
      df.withColumn(flag,
        when(row_number().over(w) === 1, 1).otherwise(0))
    }

    /** Capped per-group marking: scanning each `groupKeys` group in
      * `scanOrder` (sub-groups must be contiguous in that order), mark a
      * row iff fewer than `maxPerSub` rows of its `subKey` value and
      * fewer than `maxTotal` rows overall have been marked.
      *
      * Reference: validacion_Qx (capital_sendas.py:326-380) — a
      * sequential python loop per invoice; here two window functions
      * (rank within sub-group + running count of eligible rows), fully
      * codegen'd, one shuffle on the group key.
      */
    def cappedGroupMark(groupKeys: Seq[String], subKey: String,
        scanOrder: Seq[Column], maxTotal: Int, maxPerSub: Int,
        flag: String): DataFrame = {
      val wSub = Window.partitionBy((groupKeys :+ subKey).map(col).toIndexedSeq: _*)
        .orderBy(scanOrder.toIndexedSeq: _*)
      val wScan = Window.partitionBy(groupKeys.map(col).toIndexedSeq: _*)
        .orderBy(scanOrder.toIndexedSeq: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // one exchange feeds both windows: hash(groupKeys) satisfies the
      // clustered distribution of (groupKeys :+ subKey) too, so wSub
      // becomes an in-partition sort instead of a second shuffle
      df.repartition(groupKeys.map(col).toIndexedSeq: _*)
        .withColumn("__elig",
          when(row_number().over(wSub) <= maxPerSub, 1).otherwise(0))
        .withColumn("__cum", sum(col("__elig")).over(wScan))
        .withColumn(flag,
          when(col("__elig") === 1 && col("__cum") <= maxTotal, 1).otherwise(0))
        .drop("__elig", "__cum")
    }

    /** Stateful gap marking: within each `groupKeys` group ordered by
      * (`tsCol`, `idCol`), mark a row iff it is the group's first or
      * strictly more than `gapDays` days have passed since the last
      * MARKED row.
      *
      * Reference: validacion_C5 (capital_sendas.py:504-543). The state
      * ("timestamp of the last marked row") makes this inexpressible as
      * a window function, so: project to (group, ts, id), one shuffle
      * (`repartition` on group) + in-partition sort, then a single
      * sequential pass per partition (`mapPartitions` — groups are
      * contiguous, state resets at group boundaries), and a join back
      * on the unique `idCol`. No per-group in-memory materialization,
      * no driver collect — safe for arbitrarily many groups.
      */
    def gapMark(groupKeys: Seq[String], tsCol: String, idCol: String,
        gapDays: Int, flag: String): DataFrame =
      df.join(gapFlags(groupKeys, tsCol, idCol, gapDays, flag),
          col(idCol).cast("string") === col("__gapid"), "left")
        .drop("__gapid")

    /** The narrow flag frame behind [[gapMark]]: just
      * `(__gapid string, flag int)`, one row per input row. Callers
      * that already hold a wide frame partitioned by some key can join
      * this back themselves (e.g. on a composite key that reuses the
      * existing partitioning) instead of paying [[gapMark]]'s built-in
      * uid-keyed join. */
    def gapFlags(groupKeys: Seq[String], tsCol: String, idCol: String,
        gapDays: Int, flag: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      // Length-prefixed key parts: unambiguous for any string values
      // (separator-only concat would still collide on values containing
      // the separator); nulls encode distinctly from empty strings.
      val keyParts = groupKeys.map { c =>
        val s = col(c).cast("string")
        when(s.isNull, lit("n:"))
          .otherwise(concat(length(s).cast("string"), lit(":"), s))
      }
      // Ids ride along as strings so any id type works; the join back is
      // on the string form of the original column (must be row-unique).
      val narrow = df.select(
          concat_ws("|", keyParts.toIndexedSeq: _*).as("k"),
          unix_micros(col(tsCol).cast("timestamp")).as("ts"),
          col(idCol).cast("string").as("id"))
        .as[(String, Long, String)]
        .repartition(col("k"))
        .sortWithinPartitions(col("k"), col("ts"), col("id"))
      narrow.mapPartitions { it =>
        var cur: String = null
        var last = Long.MinValue
        it.map { case (k, ts, id) =>
          val mark = k != cur || (ts - last) / 86400000000L > gapDays
          if (mark) { cur = k; last = ts }
          (id, if (mark) 1 else 0)
        }
      }.toDF("__gapid", flag)
    }
  }
}
