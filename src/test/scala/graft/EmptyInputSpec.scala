package graft

/** Every driver query must run (not crash) over EMPTY tables — the
  * day-one production incident class: an empty partition, a filter
  * that matches nothing, a cold-start landing dir. Aggregations over
  * nothing, windows with no rows, sketch pipelines with no pairs and
  * the mapPartitions state machines all have to degrade to zero rows
  * (or, for generated spines, zero-filled rows), never to an
  * exception. */
class EmptyInputSpec extends SparkSpec {

  test("all queries run over empty tables") {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("empty").toString
    Tables.all.foreach { t =>
      Tables(spark, src, t).limit(0).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
