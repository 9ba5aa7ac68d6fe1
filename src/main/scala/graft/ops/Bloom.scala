package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered equi-join — the 100 TB shuffle-avoidance
  * pattern: when the probe side is huge and the build side is
  * selective but too large to broadcast as a hash-join, a bloom
  * filter over the build keys (a few MB regardless of row width)
  * broadcasts to every probe task and drops rows that cannot match
  * BEFORE the probe side shuffles. False positives are pruned by the
  * exact join that follows, so the composed operator is semantically
  * identical to the plain join — only cheaper.
  *
  * Built on Spark's own `BloomFilterAggregate` /
  * `BloomFilterMightContain` (the expressions behind AQE's injected
  * runtime filters), keyed through `xxhash64` on both sides, surfaced
  * through [[GraftBridge]]. Reference analog: the lookup joins in
  * /root/reference/capital_sendas.py:217-241 (pandas merges) — at
  * scale the fact side must not shuffle rows the dimension filter
  * already excludes.
  */
object Bloom {

  /** Aggregate a key column into a serialized bloom filter (binary). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftBridge.expression(key))), expectedItems)
        .toAggregateExpression())

  /** Driver-side xxhash64 of a literal value AS the indexed column's
    * type `dt` — EXACTLY the hash [[bloomAgg]] inserted (same Catalyst
    * expression, same seed, same input type), so a deserialized filter
    * can be probed off-cluster (file-index pruning) with zero false
    * negatives. The type matters: XxHash64 hashes IntegerType and
    * LongType (and Float/Double) DIFFERENTLY, so probing an INT-column
    * bloom with a Long literal without the cast silently misses —
    * files containing the key would be skipped (ADVICE r8). */
  def hash64(value: Any, dt: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    val l = Literal(value)
    require(Cast.canCast(l.dataType, dt),
      s"bloom probe: cannot cast ${l.dataType} value to indexed type $dt")
    // TRY-mode cast: an unconvertible value nulls (instead of throwing
    // under ANSI) and the require below turns it into a loud, typed
    // error — never a silent all-files-skipped probe
    val key =
      if (l.dataType == dt) l
      else Cast(l, dt, Some("UTC"), EvalMode.TRY)
    require(value == null || key.eval(null) != null,
      s"bloom probe: value '$value' does not convert to indexed type $dt")
    new XxHash64(Seq(key)).eval(null).asInstanceOf[Long]
  }

  /** Membership probe against a bloom built by [[bloomAgg]]. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(
      BloomFilterMightContain(
        GraftBridge.expression(bloom),
        new XxHash64(Seq(GraftBridge.expression(key)))))

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side
    * pre-filtered through a bloom over the dim keys. The bloom rides
    * a SCALAR SUBQUERY (the only shape `might_contain` accepts, and
    * the same one AQE's injected runtime filters use): it evaluates
    * once, broadcasts as a literal to every probe task, and the
    * probe filter sits below the fact side's exchange. The exact
    * equi-join then removes bloom false positives, so the result is
    * exactly the plain inner join's.
    */
  def prefilteredJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloomDf = dim.agg(bloomAgg(col(dimKey), expectedItems).as("__bloom"))
    val bloom = GraftBridge.column(
      ScalarSubquery(bloomDf.queryExecution.analyzed))
    // Alias both sides: with factKey == dimKey (the common equi-join
    // shape) unqualified columns would resolve ambiguously after the
    // join. An empty dim yields a null bloom -> mightContain is null
    // -> all probe rows drop, matching the empty plain join.
    fact.alias("__f")
      .filter(mightContain(bloom, col(s"__f.$factKey")))
      .join(dim.alias("__d"), col(s"__f.$factKey") === col(s"__d.$dimKey"))
  }
}
