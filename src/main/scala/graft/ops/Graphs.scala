package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Staging.StagedDF

/** Graph primitives shared by the contract rows (q_triangle) and the
  * skew specs — the wedge-join core lives here so an adversarial
  * spec can prove the degree-orientation bound on the EXACT shipped
  * plan, not a lookalike.
  *
  * Scale contract (the reason this shape survives 100 TB): wedges
  * are generated per `src` of the DEGREE-ORIENTED edge set — every
  * edge points from its lower-(degree, id) endpoint to the higher —
  * so a hot vertex of degree d contributes wedges only through
  * neighbors that outrank it; out-degrees are bounded by √(2·E)
  * (Schank/Wagner's classic bound), total wedges by Σ C(d⁺, 2) —
  * never the C(d, 2) blow-up of a hub under naive orientation. */
object Graphs {

  /** (degree, id)-oriented edges of an undirected distinct (a, b)
    * edge set: (src, dst, dord) with ord(src) < ord(dst), dord =
    * dst's packed order key. d < 2^29 keeps the BIGINT pack
    * overflow-free. */
  private[graft] def orient(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val ordOf = (d: Column, id: Column) => d * lit(1L << 34) + id
    edges
      .join(deg.toDF("va", "da"), col("a") === col("va"))
      .join(deg.toDF("vb", "db"), col("b") === col("vb"))
      .select(
        when(ordOf(col("da"), col("a")) < ordOf(col("db"), col("b")),
          struct(col("a").as("src"), col("b").as("dst"),
            ordOf(col("db"), col("b")).as("dord")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"),
            ordOf(col("da"), col("a")).as("dord"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dord").as("dord"))
  }

  /** The bounded wedge frame: pairs (c1, c2) sharing an out-neighbor
    * src, ordered o1 < o2 so each wedge appears once. Its SIZE is the
    * Σ C(d⁺, 2) bound the spec asserts on adversarial graphs. */
  private[graft] def wedges(oriented: DataFrame): DataFrame =
    oriented.toDF("src", "c1", "o1")
      .join(oriented.toDF("src", "c2", "o2").withColumnRenamed("src", "s2"),
        col("src") === col("s2") && col("o1") < col("o2"))
      .select(col("c1"), col("c2"))

  /** Bounded k-core peel: `rounds` rounds of dropping every vertex
    * whose current degree is < `k` from a SYMMETRIC distinct directed
    * edge frame (src, dst), reporting the surviving (round, n_nodes,
    * n_dir_edges) after each round — the spam/bot-ring densest-
    * subgraph screen. The fixed round count keeps the operator
    * deterministic and its oracle expressible as unrolled SQL stages;
    * `rounds = Int.MaxValue`-style peel-to-fixpoint falls out of the
    * same loop because of the early exit below.
    *
    * Per round: ONE groupBy(src) degree count (symmetry makes
    * src-degree == full degree) + two left-semi joins, each a
    * hash-keyed shuffle ∝ SURVIVING edges; staged frames truncate
    * lineage so round r never recomputes rounds 1..r−1 — cost tracks
    * the shrinking graph, the 100 TB shape.
    *
    * EARLY EXIT (the density guard): when a round removes zero edges
    * the graph is a fixpoint — every vertex already has degree ≥ k,
    * so every later round is the identity. Remaining rounds emit the
    * converged counts without running their joins. On dense data
    * (where the k-core retains most edges — the probe's observed
    * 6.45× at 10× rows is this density effect, not the plan) the
    * peel converges in 1-2 rounds and the exit halves the work.
    * `onPeel` fires once per round whose joins actually RAN —
    * the spec's hook proving skipped rounds never execute. */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
            onPeel: Int => Unit = _ => ()): DataFrame = {
    val spark = edges.sparkSession
    var e = edges.staged
    var prevEdges = e.count()
    var converged: Option[(Long, Long)] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (r <- 1 to rounds) converged match {
      case Some((n, m)) => out += ((r, n, m))
      case None =>
        onPeel(r)
        val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select(col("src").as("v"))
        val keep2 = keep.toDF("v2")
        e = e.join(keep, e("src") === keep("v"), "left_semi")
          .join(keep2, col("dst") === keep2("v2"), "left_semi")
          .staged
        val row = e.agg(countDistinct(col("src")).as("n"),
          count(lit(1)).as("m")).head()
        val (n, m) = (row.getLong(0), row.getLong(1))
        out += ((r, n, m))
        if (m == prevEdges) converged = Some((n, m))
        prevEdges = m
    }
    import spark.implicits._
    out.toSeq.toDF("round", "n_nodes", "n_dir_edges")
  }

  /** Exact triangle count of an undirected distinct (a, b) edge set:
    * one row (n_nodes, n_edges, n_triangles). */
  def triangleCount(edges0: DataFrame): DataFrame = {
    val edges = edges0.select("a", "b")
      .staged // reused 4×: degrees, orient, close, count
    val oriented = orient(edges)
    val tri = wedges(oriented)
      .join(oriented.select(col("src").as("c1"), col("dst").as("c2")),
        Seq("c1", "c2"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(tri)
  }
}
