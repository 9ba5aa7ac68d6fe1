package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.metrics.source.CodegenMetrics

/** Throwaway diagnostic: split a query's first-run cost into
  * plan-build, janino-compile (CodegenMetrics delta), and execution. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session exactly like Bench does
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // warm the SAME query shape on the smallest SF: does the codegen
    // cache + JIT carry over to the big-SF first run?
    if (sys.env.contains("PROBE_WARM_SHAPE")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[probe] shape-warm ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    def snap() = (
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum,
      CodegenMetrics.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getSnapshot.getValues.sum)

    (1 to 3).foreach { i =>
      val c0 = snap()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val c1 = snap()
      spark.catalog.clearCache()
      println(f"[probe] run$i plan=${(t1 - t0) / 1e9}%.2fs exec=${(t2 - t1) / 1e9}%.2fs " +
        f"compiles=${c1._1 - c0._1} compileMs=${c1._2 - c0._2} bytecode=${c1._3 - c0._3}")
    }
    spark.stop()
  }
}
