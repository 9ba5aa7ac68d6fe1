package graft.ops

import org.apache.spark.sql.DataFrame

/** Iteration-state staging for iterative algorithms (connected
  * components, PageRank): each round's frame must be materialized
  * with its lineage truncated, or the plan grows with the iteration
  * count and a single failure recomputes the whole history.
  *
  * Recovery contract: `localCheckpoint` keeps blocks on executors —
  * fast, but losing an executor mid-query loses its blocks AND the
  * lineage that could rebuild them, failing the query. When the
  * session has a RELIABLE checkpoint dir configured
  * (`sc.setCheckpointDir(<lake path>)` — the standard Spark knob),
  * [[StagedDF.staged]] upgrades to `df.checkpoint()`: blocks go to
  * the fault-tolerant store and a lost executor re-READS them
  * instead of recomputing from nothing. Cluster deployments point
  * the dir at the lake; sandbox/local runs leave it unset and keep
  * the fast executor-memory path. Proven by StagingSpec. */
object Staging {
  implicit final class StagedDF(private val df: DataFrame) extends AnyVal {
    /** Lineage-truncating materialization: reliable `checkpoint()`
      * when a checkpoint dir is set, `localCheckpoint()` otherwise. */
    def staged: DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
  }
}
