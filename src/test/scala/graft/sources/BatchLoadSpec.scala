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
