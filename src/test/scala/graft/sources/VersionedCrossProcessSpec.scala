package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CROSS-PROCESS commit race on the versioned table: a second JVM
  * ([[RaceCommitMain]], launched with this fork's own classpath and
  * JDK-17 module opens) races appends against this process on the
  * same table path, overlap forced by a file handshake. The
  * in-process thread specs (VersionedSpec) prove the optimistic
  * loop's LOGIC; this proves the PRIMITIVE — link(2)'s fail-if-exists
  * contract holds between processes, the exact property an
  * HDFS rename-no-overwrite / object-store conditional-put deployment
  * substitutes in. Claims gated: no lost commits (every append from
  * both sides lands exactly once), a contiguous manifest ledger, and
  * cross-process txn dedup (the shared token commits ONCE whichever
  * process wins). */
class VersionedCrossProcessSpec extends SparkSpec {
  import spark.implicits._

  test("two JVMs race appends: no lost commits, contiguous ledger, txn dedup across processes") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_xproc").toString
    val sync = java.nio.file.Files
      .createTempDirectory("graft_xproc_sync").toString
    val out = java.nio.file.Paths.get(sync, "child.out").toFile
    Versioned.commit(Seq(("seed", 0)).toDF("who", "i"), path,
      overwrite = false)

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val n = 5
    val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
      "graft.sources.RaceCommitMain",
      path, sync, "child", n.toString, "race:shared"))
    val pb = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(out)
    pb.environment().put("SPARK_LOCAL_IP", "127.0.0.1")
    val proc = pb.start()
    try {
      // handshake: wait for the child's session, then fire both sides
      val ready = java.nio.file.Paths.get(sync, "ready")
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(ready)) {
        require(System.nanoTime() < deadline,
          s"child never became ready; output:\n${slurp(out)}")
        Thread.sleep(50)
      }
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(sync, "go"))
      (1 to n).foreach { i =>
        Versioned.commit(Seq(("parent", i)).toDF("who", "i"), path,
          overwrite = false): Unit
      }
      Versioned.commitTxn(Seq(("parent:txn", 0)).toDF("who", "i"),
        path, overwrite = false, txn = Some("race:shared")): Unit
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"child timed out; output:\n${slurp(out)}")
      assert(proc.exitValue() == 0,
        s"child failed rc=${proc.exitValue()}; output:\n${slurp(out)}")
    } finally { proc.destroyForcibly(): Unit }

    // ledger: seed + 5 parent + 5 child + ONE shared-txn commit —
    // contiguous versions 0..11, nothing lost, nothing doubled
    val head = Versioned.latestVersion(path)
    assert(head == 11, s"expected head 11, got $head")
    (0 to head).foreach { v =>
      assert(Versioned.dataDirIds(path, v).nonEmpty,
        s"manifest v$v unreadable")
      assert(Versioned.dataDirIds(path, v).size == v + 1,
        s"v$v carries ${Versioned.dataDirIds(path, v).size} dirs — " +
          "an append lost its parent chain")
    }
    val rows = Versioned.read(spark, path)
      .as[(String, Int)].collect().toSeq
    assert(rows.size == 12, s"expected 12 rows, got ${rows.size}")
    assert(rows.count(_._1 == "parent") == n)
    assert(rows.count(_._1 == "child") == n)
    assert(rows.filter(_._1 == "parent").map(_._2).sorted == (1 to n))
    assert(rows.filter(_._1 == "child").map(_._2).sorted == (1 to n))
    // cross-process exactly-once: the shared txn landed exactly one
    // commit — exactly ONE of the two ":txn" rows exists
    val txnRows = rows.filter(_._1.endsWith(":txn"))
    assert(txnRows.size == 1,
      s"shared txn landed ${txnRows.size} commits: $txnRows")
  }

  test("publishManifest seam: an APPEND losing an injected race retries; nothing lost") {
    // the deterministic in-process twin of the cross-process race:
    // the hook (now inside publishManifest, the one deployment seam)
    // lands a competing append inside THIS append's derive→publish
    // window; the create-exclusive loss must re-derive and stack on
    // the racer's head — both rows land exactly once
    val path = java.nio.file.Files
      .createTempDirectory("graft_seam").toString
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path,
      overwrite = false)
    var fired = false
    Versioned.prePublishHook = () => {
      if (!fired) {
        fired = true
        Versioned.commit(Seq((9L, "racer")).toDF("k", "v"), path,
          overwrite = false): Unit
      }
    }
    try {
      val v = Versioned.commit(Seq((2L, "b")).toDF("k", "v"), path,
        overwrite = false)
      assert(fired)
      assert(v == 2) // v0 seed, v1 racer, v2 this append's retry
      assert(Versioned.read(spark, path).as[(Long, String)]
        .collect().toSet ==
        Set((1L, "a"), (9L, "racer"), (2L, "b")))
    } finally Versioned.prePublishHook = () => ()
  }

  test("two JVMs race appends over the ExternalLog arbiter: same ledger guarantees") {
    // the CAS-log arbiter models DynamoDB-class coordination — an
    // inherently CROSS-PROCESS claim; the 16-thread in-JVM race
    // (VersionedArbiterSpec) shares a heap, this shares only files
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlog").toString
    val logDir = java.nio.file.Files
      .createTempDirectory("graft_xlog_log").toString
    val sync = java.nio.file.Files
      .createTempDirectory("graft_xlog_sync").toString
    val out = java.nio.file.Paths.get(sync, "child.out").toFile
    val prev = Versioned.arbiter
    Versioned.arbiter = new CommitArbiter.ExternalLog(
      java.nio.file.Paths.get(logDir))
    try {
      Versioned.commit(Seq(("seed", 0)).toDF("who", "i"), path,
        overwrite = false)
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val n = 5
      val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.sources.RaceCommitMain",
        path, sync, "child", n.toString, "xlog:shared", logDir))
      val pb = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(out)
      pb.environment().put("SPARK_LOCAL_IP", "127.0.0.1")
      val proc = pb.start()
      try {
        val ready = java.nio.file.Paths.get(sync, "ready")
        val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
        while (!java.nio.file.Files.exists(ready)) {
          require(System.nanoTime() < deadline,
            s"child never became ready; output:\n${slurp(out)}")
          Thread.sleep(50)
        }
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(sync, "go"))
        (1 to n).foreach { i =>
          Versioned.commit(Seq(("parent", i)).toDF("who", "i"), path,
            overwrite = false): Unit
        }
        Versioned.commitTxn(Seq(("parent:txn", 0)).toDF("who", "i"),
          path, overwrite = false, txn = Some("xlog:shared")): Unit
        assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
          s"child timed out; output:\n${slurp(out)}")
        assert(proc.exitValue() == 0,
          s"child failed rc=${proc.exitValue()}; output:\n${slurp(out)}")
      } finally { proc.destroyForcibly(): Unit }
      val head = Versioned.latestVersion(path)
      assert(head == 11, s"expected head 11, got $head")
      (0 to head).foreach { v =>
        assert(Versioned.dataDirIds(path, v).size == v + 1,
          s"v$v carries ${Versioned.dataDirIds(path, v).size} dirs — " +
            "an append lost its parent chain")
      }
      val rows = Versioned.read(spark, path)
        .as[(String, Int)].collect().toSeq
      assert(rows.size == 12, s"expected 12 rows, got ${rows.size}")
      assert(rows.count(_._1 == "parent") == n)
      assert(rows.count(_._1 == "child") == n)
      assert(rows.count(_._1.endsWith(":txn")) == 1,
        s"shared txn not exactly-once: $rows")
    } finally Versioned.arbiter = prev
  }

  test("ExternalLog dead winner: a JVM killed between claim and publish is recovered by the next process") {
    // the child claims slot v0 and HALTS (no shutdown hooks) before
    // publishing; this process then loses the same slot and must
    // finish the dead winner's publish before reporting the loss —
    // arbiter postcondition 2, proven with nothing shared but files
    val table = java.nio.file.Files
      .createTempDirectory("graft_crash").toString
    val logDir = java.nio.file.Files
      .createTempDirectory("graft_crash_log").toString
    val out = java.nio.file.Paths
      .get(logDir, "crash-child.out").toFile
    val winnerPayload = """{"version":0,"mode":"crash-test","dataDirs":[]}"""
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin, "-cp", cp, "graft.sources.CrashClaimMain",
      table, logDir, "0", winnerPayload)
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(out).start()
    assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      s"crash child hung; output:\n${slurp(out)}")
    assert(proc.exitValue() == 42, // halt(42) fired INSIDE the window
      s"crash child rc=${proc.exitValue()} (wanted halt 42); " +
        s"output:\n${slurp(out)}")
    // the slot is claimed but unpublished: the manifest must NOT
    // exist yet (the child died before step 3)
    val manifest = java.nio.file.Paths.get(table, "_versions", "v0.json")
    assert(!java.nio.file.Files.exists(manifest),
      "child published before crashing — the window closed too late")
    // this process contends the same slot: it must LOSE (the dead
    // child holds the claim) and RECOVER the child's payload
    val arb = new CommitArbiter.ExternalLog(
      java.nio.file.Paths.get(logDir))
    val won = arb.putIfAbsent(table, 0, "{\"loser\":true}".getBytes("UTF-8"))
    assert(!won, "the dead winner's claim was stolen")
    assert(java.nio.file.Files.exists(manifest),
      "loser reported the loss without recovering the dead winner")
    val recovered = new String(
      java.nio.file.Files.readAllBytes(manifest), "UTF-8")
    assert(recovered == winnerPayload,
      s"recovered bytes are not the winner's: $recovered")
    // idempotent: a second loser re-recovers to the same bytes
    assert(!arb.putIfAbsent(table, 0, "x".getBytes("UTF-8")))
    assert(new String(java.nio.file.Files.readAllBytes(manifest),
      "UTF-8") == winnerPayload)
  }

  private def slurp(f: java.io.File): String =
    if (f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .takeRight(4000)
    else "(no output)"
}
