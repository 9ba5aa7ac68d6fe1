package graft.sources

import graft.{SparkEntry, SparkSpec, Tables}

/** Scan fence for q_lake_roundtrip: the driver row proves the
  * write→read→aggregate VALUES survive the lake; this spec proves the
  * read side's executed scan touched ONLY the purchase partition's
  * files — directory-level pruning before any IO, the property that
  * makes the hive layout worth anything at 100 TB. Runs the EXACT
  * plan the driver row runs (SparkEntry.lakeRoundtripRead).
  */
class LakeRoundtripSpec extends SparkSpec {

  test("q_lake_roundtrip's executed scan reads only the purchase partition") {
    val dir = "/root/testdata/sf0.001"
    val lake = SparkEntry.lakeRoundtripPath(dir)
    val src = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    Export.partitionedParquet(src, lake, Seq("event_type"))
    val df = SparkEntry.lakeRoundtripRead(spark, lake, src.schema)
    // collect() executes THIS Dataset's plan, filling its scan metrics
    // (count() would build and run a separate plan)
    val rows = df.collect()
    assert(rows.nonEmpty, "round-trip read produced no rows")

    // the aggregate makes the plan adaptive — unwrap AQE wrappers and
    // query stages to reach the executed scan node
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).head
    val purchaseFiles = new java.io.File(lake + "/event_type=purchase")
      .listFiles.count(_.getName.endsWith(".parquet"))
    val allFiles = spark.read.parquet(lake).inputFiles.length
    assert(purchaseFiles < allFiles,
      "fence is vacuous: only one partition exists on disk")
    assert(scan.metrics("numFiles").value == purchaseFiles,
      s"executed scan read ${scan.metrics("numFiles").value} files; " +
        s"the purchase partition holds $purchaseFiles of $allFiles")
  }
}
