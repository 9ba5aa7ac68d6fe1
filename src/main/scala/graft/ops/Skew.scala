package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join split handles most runtime skew, but a join key
  * with a few giant values (the classic null-key / default-key skew)
  * still funnels one key's rows through few tasks when the build side
  * must shuffle too. Salting splits each hot key into `saltBuckets`
  * sub-keys: the big side gets a deterministic salt derived from a
  * second column, the small side replicates ×saltBuckets. Results are
  * identical to the unsalted join; only the partitioning changes.
  */
object Skew {

  /** Salted equi-join: `facts ⋈ dim` on `key`, with the fact side's
    * rows spread over `saltBuckets` sub-partitions per key. `spread`
    * names a fact column whose murmur hash picks the bucket
    * (deterministic — no rand(), so retries/speculation are safe).
    * `dim` is replicated ×saltBuckets (keep it the small side). */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      spread: String, saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val fs = facts.withColumn("__salt",
      pmod(hash(col(spread)), lit(saltBuckets)))
    val ds = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // shuffle_hash hint: salting only matters when the build side
    // must shuffle — if the dim fit in a broadcast, the caller should
    // broadcast instead of salt. Without the hint, small test inputs
    // get auto-broadcast and the salt exercises nothing.
    fs.join(ds.hint("shuffle_hash"), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
