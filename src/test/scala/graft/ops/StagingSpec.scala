package graft.ops

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Recovery semantics of iteration-state staging (Staging.staged):
  * with no checkpoint dir the fast executor-local path runs; with a
  * reliable dir configured (the cluster deployment: point it at the
  * lake), iteration state is persisted to the fault-tolerant store,
  * so an executor loss re-reads blocks instead of failing the query
  * — the artifact files on disk are the proof the state left the
  * executors. Results must be identical on both paths. */
class StagingSpec extends SparkSpec {
  import Staging.StagedDF
  import spark.implicits._

  private def chain(n: Int) =
    (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")

  test("staged falls back to localCheckpoint when no dir is configured") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val df = chain(10).staged
    assert(df.count() == 10) // materialized, usable
  }

  test("with a checkpoint dir, iterative CC persists state to the reliable store and converges to the same labels") {
    val want = Dedup.connectedComponentsStar(chain(60))
      .as[(Long, Long)].collect().toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft_reliable_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val got = Dedup.connectedComponentsStar(chain(60))
        .as[(Long, Long)].collect().toSet
      assert(got == want) // identical labels on the reliable path
      assert(got.map(_._2) == Set(0L)) // one 61-node chain component
      // the proof the state left the executors: RDD checkpoint
      // artifacts exist under the reliable dir
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .count()
      assert(files > 0, s"no checkpoint artifacts under $dir")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir)): Unit
    }
  }
}
