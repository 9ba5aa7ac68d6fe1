package graft.sources

/** Child-JVM half of the cross-process DEAD-WINNER proof (see
  * VersionedCrossProcessSpec): claims an [[CommitArbiter.ExternalLog]]
  * slot and then HALTS the whole JVM between CLAIM and PUBLISH —
  * `Runtime.halt`, no shutdown hooks, no finally blocks — modeling a
  * committer machine dying mid-protocol. The parent process must then
  * recover the dead winner's staged payload before reporting its own
  * loss (arbiter postcondition 2), cross-process this time: the
  * in-JVM VersionedArbiterSpec proof relied on a shared heap;
  * this relies only on the coordination directory's files, which is
  * all a DynamoDB-class deployment has. No SparkSession — the
  * arbiter is pure file protocol, so the child is fast and the crash
  * window is exact. Exits 7 only if the claim LOST (the spec treats
  * that as a setup failure — the slot must be uncontended). */
object CrashClaimMain {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, logDir, vStr, payload) = args
    val arb = new CommitArbiter.ExternalLog(
      java.nio.file.Paths.get(logDir))
    arb.postClaimHook = () => Runtime.getRuntime.halt(42)
    arb.putIfAbsent(tablePath, vStr.toInt, payload.getBytes("UTF-8")): Unit
    sys.exit(7) // reachable only if the claim lost
  }
}
