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
