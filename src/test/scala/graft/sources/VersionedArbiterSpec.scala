package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Contract proof for [[CommitArbiter.ExternalLog]] — the commit
  * coordinator for stores with NO fail-if-exists write (legacy-S3
  * semantics, every PUT overwrites): slot CAS through an external
  * log, overwrite-only writes against the store, and crash recovery
  * of a winner that died between claiming and publishing. */
class VersionedArbiterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("ExternalLog: N racing claimers — exactly one wins, all see the manifest") {
    val table = tmpDir("graft_arb_race")
    val arb = new CommitArbiter.ExternalLog(
      Paths.get(tmpDir("graft_arb_log")))
    val n = 16
    val payloads = (0 until n).map(i => s"""{"writer":$i}""")
    val results = new Array[Boolean](n)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        results(i) = arb.putIfAbsent(table, 0,
          payloads(i).getBytes("UTF-8"))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.count(identity) == 1, "exactly one CAS winner")
    val winner = results.indexOf(true)
    val got = new String(Files.readAllBytes(
      Paths.get(table, "_versions", "v0.json")), "UTF-8")
    assert(got == payloads(winner),
      "the slot holds the WINNER's payload, nobody else's")
    // no staged temp debris survives the race
    val ls = Files.list(Paths.get(table, "_versions"))
    val leftover = try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith(".")).toList finally ls.close()
    assert(leftover.isEmpty, s"staged claim files leaked: $leftover")
  }

  test("ExternalLog: loser RECOVERS a winner that died before publishing") {
    val table = tmpDir("graft_arb_crash")
    val arb = new CommitArbiter.ExternalLog(
      Paths.get(tmpDir("graft_arb_log2")))
    // winner claims slot 0 then dies in the claim→publish window
    arb.postClaimHook = () => sys.error("simulated crash after CAS claim")
    intercept[RuntimeException] {
      arb.putIfAbsent(table, 0, """{"writer":"dead"}""".getBytes("UTF-8"))
    }
    arb.postClaimHook = () => ()
    assert(!Files.exists(Paths.get(table, "_versions", "v0.json")),
      "crashed winner never published")
    // a contender loses the claim AND completes the dead winner's
    // publish before reporting the loss (postcondition 2)
    val won = arb.putIfAbsent(table, 0,
      """{"writer":"late"}""".getBytes("UTF-8"))
    assert(!won, "the slot belongs to the dead winner")
    val got = new String(Files.readAllBytes(
      Paths.get(table, "_versions", "v0.json")), "UTF-8")
    assert(got == """{"writer":"dead"}""",
      "recovery publishes the CLAIMANT's payload, not the recoverer's")
  }

  test("ExternalLog: a LIVE winner publishing inside the loser's recovery window is not an error") {
    // the TOCTOU the r11 advice flagged: the loser checks
    // Files.exists(winnerStaged), the live winner then publishes AND
    // deletes its stage, and the loser's readAllBytes hits
    // NoSuchFileException — that is a CLEAN loss (the winner
    // published), not a failure that should abort a commit retry loop
    val table = tmpDir("graft_arb_toctou")
    val arb = new CommitArbiter.ExternalLog(
      Paths.get(tmpDir("graft_arb_log3")))
    // stage a claimed-but-unpublished slot, exactly as a slow winner
    // would leave it mid-protocol
    arb.postClaimHook = () => sys.error("pause the winner pre-publish")
    intercept[RuntimeException] {
      arb.putIfAbsent(table, 0, """{"writer":"slow"}""".getBytes("UTF-8"))
    }
    arb.postClaimHook = () => ()
    // the loser enters recovery; INSIDE its exists→read window the
    // "live winner" finishes: publishes the manifest and deletes its
    // staged file (the hook runs the winner's steps 3+cleanup)
    arb.preRecoveryReadHook = () => {
      Files.write(Paths.get(table, "_versions", "v0.json"),
        """{"writer":"slow"}""".getBytes("UTF-8"))
      val vs = Files.list(Paths.get(table, "_versions"))
      val staged = try vs.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".claim-v0-"))
        .toList finally vs.close()
      staged.foreach(p => Files.deleteIfExists(p))
    }
    try {
      val won = arb.putIfAbsent(table, 0,
        """{"writer":"loser"}""".getBytes("UTF-8"))
      assert(!won, "the loser must report a clean loss, not throw")
    } finally arb.preRecoveryReadHook = () => ()
    val got = new String(Files.readAllBytes(
      Paths.get(table, "_versions", "v0.json")), "UTF-8")
    assert(got == """{"writer":"slow"}""",
      "the winner's publish survives the concurrent recovery")
  }

  test("Versioned commits compose end-to-end over the ExternalLog arbiter") {
    val table = tmpDir("graft_arb_e2e") + "/t"
    val arb = new CommitArbiter.ExternalLog(
      Paths.get(tmpDir("graft_arb_log3")))
    val prev = Versioned.arbiter
    Versioned.arbiter = arb
    try {
      Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
        table, overwrite = false)
      // two racing appenders: the loser's CAS failure must retry at
      // the next slot exactly like the link(2) path
      val t1 = new Thread(() => Versioned.commit(
        Seq((3L, "c")).toDF("k", "v"), table, overwrite = false))
      val t2 = new Thread(() => Versioned.commit(
        Seq((4L, "d")).toDF("k", "v"), table, overwrite = false))
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(Versioned.latestVersion(table) == 2)
      val ks = Versioned.read(spark, table)
        .select("k").as[Long].collect().toSet
      assert(ks == Set(1L, 2L, 3L, 4L))
    } finally Versioned.arbiter = prev
  }

  test("a commit whose arbiter crashed post-claim is durable after recovery") {
    val table = tmpDir("graft_arb_rec") + "/t"
    val arb = new CommitArbiter.ExternalLog(
      Paths.get(tmpDir("graft_arb_log4")))
    val prev = Versioned.arbiter
    Versioned.arbiter = arb
    try {
      Versioned.commit(Seq((1L, "base")).toDF("k", "v"),
        table, overwrite = false)
      // writer A claims v1 and dies before publishing: its commit()
      // throws, but the claim names its staged manifest
      val once = new AtomicBoolean(true)
      arb.postClaimHook = () =>
        if (once.getAndSet(false)) sys.error("crash after claim")
      intercept[RuntimeException] {
        Versioned.commit(Seq((2L, "dead-writer")).toDF("k", "v"),
          table, overwrite = false)
      }
      arb.postClaimHook = () => ()
      // writer B contends the same slot: its CAS loss triggers the
      // recovery publish of A's manifest, and its retry loop lands B
      // at the NEXT slot — the object-store commit-recovery
      // semantics: a claimed commit is durable once any contender
      // (or reader-side repair) finishes it
      Versioned.commit(Seq((3L, "live-writer")).toDF("k", "v"),
        table, overwrite = false)
      assert(Versioned.latestVersion(table) == 2)
      val vs = Versioned.read(spark, table)
        .select("v").as[String].collect().toSet
      assert(vs == Set("base", "dead-writer", "live-writer"),
        "the recovered commit's rows are visible alongside both others")
    } finally Versioned.arbiter = prev
  }
}
