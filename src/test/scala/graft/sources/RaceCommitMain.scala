package graft.sources

import org.apache.spark.sql.SparkSession

/** Child-JVM half of [[VersionedCrossProcessSpec]]: a SEPARATE
  * process (own JVM, own SparkSession, own page cache handles) racing
  * appends against the parent test on the same table path — the
  * in-process thread races prove the optimistic loop's logic, this
  * proves the PRIMITIVE: link(2)'s create-exclusive contract holds
  * across processes, which is exactly what an HDFS
  * rename-no-overwrite / object-store conditional-put deployment
  * relies on.
  *
  * Protocol (file handshake, no shared memory): the child touches
  * `<sync>/ready` once its session is up, then spins until the parent
  * creates `<sync>/go`, then fires `n` single-row appends plus ONE
  * commitTxn with the shared token (the cross-process exactly-once
  * probe). Exit 0 on success; any exception exits nonzero with the
  * stack on stdout (the spec asserts on it). */
object RaceCommitMain {
  def main(args: Array[String]): Unit = {
    // optional 6th arg: an ExternalLog coordination dir — the child
    // then commits through the CAS-log arbiter instead of link(2),
    // making the cross-process proof cover BOTH arbiters
    val (path, sync, label, nStr, sharedTxn) = args match {
      case Array(p, s, l, n, t) => (p, s, l, n, t)
      case Array(p, s, l, n, t, logDir) =>
        Versioned.arbiter = new CommitArbiter.ExternalLog(
          java.nio.file.Paths.get(logDir))
        (p, s, l, n, t)
    }
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-race-child")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ready = java.nio.file.Paths.get(sync, "ready")
    val go = java.nio.file.Paths.get(sync, "go")
    java.nio.file.Files.createFile(ready)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(go)) {
      require(System.nanoTime() < deadline, "parent never said go")
      Thread.sleep(20)
    }
    (1 to n).foreach { i =>
      Versioned.commit(Seq((label, i)).toDF("who", "i"), path,
        overwrite = false): Unit
    }
    Versioned.commitTxn(Seq((s"$label:txn", 0)).toDF("who", "i"), path,
      overwrite = false, txn = Some(sharedTxn)): Unit
    spark.stop()
    sys.exit(0)
  }
}
