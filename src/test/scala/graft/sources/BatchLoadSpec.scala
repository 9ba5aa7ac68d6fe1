package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class BatchLoadSpec extends SparkSpec {
  import spark.implicits._

  test("latestBatch keeps only the max yyyymm token, sorted desc") {
    val b = BatchLoad.latestBatch(Seq(
      "/x/produccion_20240101_a.xlsx", "/x/produccion_20240205_b.xlsx",
      "/x/produccion_20240228_c.xlsx", "/x/readme.txt")).get
    assert(b.anoMes == "202402")
    assert(b.mes == 2)
    assert(b.files == Seq("/x/produccion_20240228_c.xlsx",
      "/x/produccion_20240205_b.xlsx"))
    assert(BatchLoad.latestBatch(Seq("/x/readme.txt")).isEmpty)
  }

  test("promoteHeader lifts row 0 to column names, keeps the rest") {
    val df = Seq(("COL_A", "COL_B"), ("1", "x"), ("2", "y"))
      .toDF("_c0", "_c1")
    val got = BatchLoad.promoteHeader(df)
    assert(got.columns.toSeq == Seq("COL_A", "COL_B"))
    assert(got.as[(String, String)].collect().toSet ==
      Set(("1", "x"), ("2", "y")))
  }

  test("promoteHeader header read is one single-task job, not a full pass") {
    // 8 partitions, header leading partition 0
    val rows = ("COL_A", "COL_B") +: (1 to 10000).map(i => (i.toString, "v"))
    val rdd = spark.sparkContext.parallelize(rows, 8)
    val df = spark.createDataFrame(rdd).toDF("_c0", "_c1")
    val tracker = spark.sparkContext.statusTracker
    spark.sparkContext.setJobGroup("ph-probe", "promoteHeader header read")
    val got = try BatchLoad.promoteHeader(df)
      finally spark.sparkContext.clearJobGroup()
    // status updates are async — poll for the probe group's jobs
    def probeJobs() = tracker.getJobIdsForGroup("ph-probe")
    val deadline = System.currentTimeMillis() + 10000
    while (probeJobs().isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    Thread.sleep(200) // let any (unexpected) extra job surface
    val jobs = probeJobs()
    assert(jobs.length == 1, s"expected 1 header-read job, got ${jobs.length}")
    val nTasks = jobs.flatMap(tracker.getJobInfo(_)).flatMap(_.stageIds())
      .flatMap(tracker.getStageInfo(_)).map(_.numTasks()).sum
    assert(nTasks == 1, s"header read ran $nTasks tasks (full pass?)")
    assert(got.columns.toSeq == Seq("COL_A", "COL_B"))
    assert(got.count() == 10000)
  }

  test("appendWithDrift aligns drifting schemas, dedups shared rows") {
    val a = Seq(("1", "x"), ("2", "y")).toDF("ID", "VAL")
    // batch gained NEW, lost VAL
    val b = Seq(("2", "n2"), ("3", "n3")).toDF("ID", "NEW")
    val got = BatchLoad.appendWithDrift(Some(a), b)
    assert(got.columns.toSeq == Seq("ID", "VAL", "NEW"))
    val rows = got.as[(String, Option[String], Option[String])]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("1", Some("x"), None),
      ("2", Some("y"), None), // old row persists
      ("2", None, Some("n2")), // drifted row is NOT the same row
      ("3", None, Some("n3"))))
  }

  test("loadLatestCsv end-to-end: header-in-data files, incremental dedup") {
    val dir = Files.createTempDirectory("batchload").toFile
    def write(name: String, lines: Seq[String]): String = {
      val f = new java.io.File(dir, name)
      Files.write(f.toPath,
        lines.mkString("\n").getBytes("UTF-8"))
      f.getAbsolutePath
    }
    // two files in the latest batch share one row -> deduped once
    val f1 = write("produccion_20240210_1.csv",
      Seq("ID,VAL", "1,a", "2,b"))
    val f2 = write("produccion_20240215_2.csv",
      Seq("ID,VAL", "2,b", "3,c"))
    val old = write("produccion_20230101_0.csv",
      Seq("ID,VAL", "9,z"))
    val got = BatchLoad.loadLatestCsv(spark, Seq(f1, f2, old),
      headerInData = true).get
    assert(got.columns.toSeq == Seq("ID", "VAL"))
    val rows = got.as[(String, String)].collect().toSet
    assert(rows == Set(("1", "a"), ("2", "b"), ("3", "c")))
  }
}
