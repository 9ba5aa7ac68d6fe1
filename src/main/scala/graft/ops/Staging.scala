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
      * when a checkpoint dir is set, `localCheckpoint()` otherwise.
      *
      * LAZY (eager = false): the eager form ran a dedicated count()
      * job per staged frame — one extra job round-trip per call, ~40
      * calls across the hot queries. Lazily-marked checkpoints are
      * materialized by the FIRST consuming job and finalized at that
      * job's end (Spark backfills any partitions the job skipped
      * before truncating lineage), so the determinism contract is
      * unchanged: every consumer after that job reads the same frozen
      * blocks, and concurrent first-consumers serialize per-partition
      * on the block-manager write lock. */
    def staged: DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
  }
}
