package graft

/** Every driver-contract query must produce IDENTICAL rows (values
  * and order) regardless of the shuffle partitioning — the "would
  * this still be correct on a 1000-executor cluster" guard. Catches
  * float accumulation order-dependence, non-total ORDER BYs, and
  * partition-local state leaks (heap pre-reductions, gapMark's
  * sequential pass) in one sweep.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all queries are invariant to spark.sql.shuffle.partitions (5 vs 32)") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      def run(parts: Int): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try SparkEntry.queries(name)(spark, dir)
          .collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", 32)
      }
      val a = run(5)
      val b = run(32)
      assert(a == b, s"$name differs between 5 and 32 shuffle partitions")
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }
}
