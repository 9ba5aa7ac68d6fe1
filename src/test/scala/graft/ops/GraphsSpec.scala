package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** [[Graphs.kCore]] — the peel loop's fixpoint early-exit contract:
  * once a round removes zero edges, later rounds must emit the
  * converged counts WITHOUT executing their joins (the density guard
  * behind the sf1 probe note in SURVEY §4). */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Symmetric directed edges of: a K4 on {1,2,3,4} (a 3-core that
    * survives k=3 forever) plus a pendant vertex 5—1 (degree 1,
    * peeled in round 1; its removal leaves every K4 vertex still at
    * degree ≥ 3, so round 2 removes nothing → fixpoint after 2). */
  private def k4PlusPendant = {
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    (und ++ und.map { case (a, b) => (b, a) }).toDF("src", "dst")
  }

  test("kCore peels to the exact core and emits one row per round") {
    val out = Graphs.kCore(k4PlusPendant, k = 3, rounds = 4)
      .orderBy("round").collect()
    // after round 1 the pendant is gone: K4 = 4 nodes, 12 directed
    // edges; rounds 2-4 are the fixpoint repeated
    assert(out.toSeq == Seq(Row(1, 4L, 12L), Row(2, 4L, 12L),
      Row(3, 4L, 12L), Row(4, 4L, 12L)))
  }

  test("fixpoint early-exit: converged rounds never run their joins") {
    var ran = List.empty[Int]
    val out = Graphs.kCore(k4PlusPendant, k = 3, rounds = 4,
      onPeel = r => ran = ran :+ r).orderBy("round").collect()
    // round 1 peels the pendant; round 2 proves the fixpoint (zero
    // edges removed); rounds 3-4 are emitted from the converged
    // counts without executing — identical output, half the work
    assert(ran == List(1, 2))
    assert(out.toSeq == Seq(Row(1, 4L, 12L), Row(2, 4L, 12L),
      Row(3, 4L, 12L), Row(4, 4L, 12L)))
  }

  test("empty-from-round-1 graphs converge immediately") {
    // a single edge: both endpoints have degree 1 < 3 → round 1
    // empties the graph; round 2 observes zero removed (0 == 0) and
    // rounds 3-4 are skipped
    var ran = List.empty[Int]
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graphs.kCore(e, k = 3, rounds = 4,
      onPeel = r => ran = ran :+ r).orderBy("round").collect()
    assert(ran == List(1, 2))
    assert(out.toSeq == Seq(Row(1, 0L, 0L), Row(2, 0L, 0L),
      Row(3, 0L, 0L), Row(4, 0L, 0L)))
  }
}
