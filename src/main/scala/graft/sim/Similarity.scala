package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Vectors are `array<float>` columns; all math is done as explicit
  * left-folds over doubles (`zip_with` + `aggregate`) so the result is
  * bit-reproducible by any IEEE-754 engine evaluating in the same
  * order — which is what lets the DuckDB oracle agree on ranks.
  */
object Similarity {

  /** Sequential-fold dot product with per-element double promotion —
    * the declarative reference form (allocates a zipped array/row). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Native codegen'd dot product ([[graft.plans.FloatVecDot]]):
    * numerically identical to [[dotFold]] (same left-to-right double
    * summation), no per-row allocation. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.FloatVecDot(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * The baseline ANN path: broadcast the (small) query set against the
    * corpus — a map-side cross product — then reduce to k candidates
    * per (query, input partition) with a bounded heap BEFORE anything
    * shuffles. The global window only sees ≤ partitions×|Q|×k rows, so
    * the |corpus|×|Q| scored product never hits the wire (at 100 TB the
    * full-product shuffle would be the bottleneck).
    * Returns (query_id, neighbor_id, rank); ties broken by neighbor id.
    * Ids must be integral (cast to long internally).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // norms are per-row — compute them once before the pair join so
    // each scored pair costs ONE dot product, not three.
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("score"))
      .as[(Long, Long, Double)]
    val reduced = scored.mapPartitions { it =>
      partialTopK(it, k)
    }.toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    reduced.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Per-partition bounded top-k per query: a size-k ordered buffer per
    * query id (worse-score-first so eviction is O(log k)). Order:
    * higher score wins, ties to the lower neighbor id. */
  private[sim] def partialTopK(it: Iterator[(Long, Long, Double)],
      k: Int): Iterator[(Long, Long, Double)] = {
    // (score asc, neighbor_id desc) priority ⇒ head is the weakest kept
    val ord = Ordering.by[(Long, Double), (Double, Long)] {
      case (nid, s) => (s, -nid)
    }
    val heaps = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Double)]]
    it.foreach { case (qid, nid, s) =>
      val h = heaps.getOrElseUpdate(qid,
        scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord.reverse))
      if (h.size < k) h.enqueue((nid, s))
      else if (ord.gt((nid, s), h.head)) { h.dequeue(); h.enqueue((nid, s)) }
    }
    heaps.iterator.flatMap { case (qid, h) =>
      h.iterator.map { case (nid, s) => (qid, nid, s) }
    }
  }

  /** LSH-bucketed ANN: corpus and queries are both signed with
    * [[hyperplaneSig]]; candidates are corpus vectors sharing the
    * query's bucket; per-query top-k among candidates (same bounded
    * heap pre-reduction as [[bruteTopK]]). The scale path: the join is
    * an equi-join on the signature — the corpus is shuffled once by
    * bucket, never cross-producted. Recall < 1.0 by construction;
    * increase `planes` for smaller buckets, decrease for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, planes: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"),
      hyperplaneSig(col(vecCol), dim, planes).as("sig"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"),
      hyperplaneSig(col(vecCol), dim, planes).as("qsig"))
    val scored = c.join(broadcast(q),
        col("sig") === col("qsig") && col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("score"))
      .as[(Long, Long, Double)]
    val reduced = scored.mapPartitions(partialTopK(_, k))
      .toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    reduced.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Random-hyperplane LSH bucket signature (SimHash-style) for the
    * scale path: vectors only compete within their bucket. Hyperplanes
    * are pseudo-random but deterministic (md5-seeded per (plane, dim)),
    * so signatures are engine-portable. Native codegen'd expression
    * ([[graft.plans.HyperplaneSig]]): the declarative twin below
    * allocates `planes` weight-array literals + zipped arrays per ROW
    * — measurable per-row cost on the LSH/IVF signing pass. */
  def hyperplaneSig(vec: Column, dim: Int, planes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.HyperplaneSig(
        org.apache.spark.sql.GraftBridge.expression(vec), dim, planes))

  /** Declarative twin of [[hyperplaneSig]] — bit-identical by the
    * differential spec; kept as the oracle-shaped reference form (the
    * DuckDB oracle SQL mirrors this fold). */
  def hyperplaneSigFold(vec: Column, dim: Int, planes: Int): Column =
    concat((0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec,
          array((0 until dim).map { d =>
            // deterministic pseudo-random weight in [-0.5, 0.5)
            (conv(substring(md5(lit(s"hp:$p:$d")), 1, 8), 16, 10)
              .cast("double") / lit(4294967296.0)) - lit(0.5)
          }: _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Per-group centroid components: explode vectors to (group, dim,
    * value) and aggregate — the IVF coarse-quantizer building block.
    * Component sums go through DECIMAL(18,9) so the result is
    * independent of row order (float sums are not), making centroids
    * reproducible across partitionings and engines. Returns
    * (group, pos 1-based, avg) — long/thin beats rebuilding arrays in
    * a shuffle, and downstream assignment joins on the group anyway.
    */
  def centroids(vectors: DataFrame, vecCol: String,
      groupCol: String): DataFrame =
    vectors
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)))
      .select(col("grp"), (col("pos") + 1).as("pos"),
        col("col").cast("decimal(18,9)").as("v"))
      .groupBy("grp", "pos")
      .agg((sum(col("v")).cast("double") / count(lit(1))).as("avg_raw"))
      .withColumn("avg", round(col("avg_raw"), 6))
      .drop("avg_raw")

  /** IVF-assembled ANN: the centroid building block composed into the
    * full route-and-probe query.
    *
    * Index side: the corpus coarse-partitions into cells (hyperplane
    * signature with `cellPlanes` planes → ≤ 2^cellPlanes inverted
    * lists), and each cell gets a decimal-sum centroid (row-order
    * proof, so the index is reproducible across partitionings).
    * Query side: each query scores the tiny centroid table (broadcast
    * hash join on a constant key — |Q|×cells rows, never the corpus),
    * keeps its `nprobe` nearest cells, and probes ONLY those cells via
    * an equi-join on the cell id — the corpus shuffles once by cell
    * and the scored candidate set is |Q|×(probed fraction of corpus).
    * Same bounded-heap pre-reduction as [[bruteTopK]] before anything
    * shuffles. Recall < 1.0 by construction (tune nprobe/cellPlanes).
    * Returns (query_id, neighbor_id, rank).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, cellPlanes: Int, nprobe: Int,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cells = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"),
      hyperplaneSig(col(vecCol), dim, cellPlanes).as("cell"))
    // assemble per-cell centroid arrays from the long/thin component
    // frame — ≤ 2^cellPlanes rows, broadcastable by construction
    val cent = centroids(cells.select(col("cell"), col("cv")), "cv", "cell")
      .groupBy(col("grp").as("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("avg")))).as("ps"))
      .select(col("cell"),
        transform(col("ps"), p => p.getField("avg")).as("centroid"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
    // route: every query against every centroid — an INTENDED nested
    // loop over a broadcast table bounded at 2^cellPlanes rows (the
    // one place IVF scans everything, and it's the tiny side)
    val wRoute = Window.partitionBy(col("query_id"))
      .orderBy(col("rscore").desc, col("cell"))
    val routed = q.crossJoin(broadcast(cent))
      .withColumn("rscore", dotFold(col("qv"), col("centroid")) /
        (col("qn") * sqrt(dotFold(col("centroid"), col("centroid")))))
      .withColumn("__rr", row_number().over(wRoute))
      .filter(col("__rr") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    // probe: equi-join on the cell id only
    val scored = cells.join(routed,
        cells("cell") === routed("cell") &&
          col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("score"))
      .as[(Long, Long, Double)]
    val reduced = scored.mapPartitions(partialTopK(_, k))
      .toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    reduced.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Near-dup pairs by cosine ≥ threshold within a blocking column.
    * At 100 TB the block is an LSH signature ([[hyperplaneSig]]);
    * for verification any equi-block works. `maxBlock` fails the job
    * loudly if a block would go quadratic on a skewed key. */
  /** Per-vector int8 absmax quantization — the compression step an
    * embedding store runs before ANN serving (4× smaller vectors,
    * integer dot products downstream). scale = 127/amax is computed
    * ONCE and then applied per element (`x * (127/amax)`, never
    * `(x*127)/amax`): with one fixed IEEE op order, any engine
    * reproduces the codes bit-exactly. Zero vectors quantize to all
    * zeros. Returns (id, amax, qvec: array<long> in [-127, 127]).
    * Pure per-row Column tree — no shuffle, stays in codegen. */
  def quantizeInt8(vectors: DataFrame, vecCol: String,
      idCol: String): DataFrame = {
    val amax = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val scale = when(col("amax") > 0, lit(127.0) / col("amax"))
      .otherwise(lit(0.0))
    vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
        amax.as("amax"))
      .select(col("id"), col("amax"),
        transform(col("v"), x => round(x.cast("double") * scale)
          .cast("long")).as("qvec"))
  }

  /** One EXACT Lloyd (k-means) iteration with reproducible floats —
    * the clustering primitive an embedding store runs to refine IVF
    * cells: init centroids = per-`initGroupCol` means (decimal sums,
    * rounded 6 — so both the init and every downstream double are
    * engine- and partitioning-identical); assignment = argmin of
    * squared L2 computed as a SEQUENTIAL fold over the zipped dims
    * (fixed evaluation order → bit-stable sums), ties on the smaller
    * cluster id via one lexicographic struct-min aggregate; update =
    * the same decimal-mean build over the new assignment. The
    * centroid table rides a bounded broadcast (k rows); the corpus is
    * scanned, never self-joined. Returns the updated centroids
    * long/thin: (cluster, pos 1-based, avg, n_vectors). */
  /** Bit-stable nearest-centroid assignment against the decimal
    * group-mean centroids: sequential-fold squared-L2 per (vector,
    * centroid) over a broadcast k-row centroid table, then a
    * struct-min argmin (ties break on the lower group id). The
    * shared first half of [[kmeansStep]] and [[semanticDedup]].
    * Returns (vid, cluster). */
  def assignToCentroids(vectors: DataFrame, vecCol: String,
      idCol: String, initGroupCol: String): DataFrame = {
    val cent = centroids(vectors.select(col(initGroupCol), col(vecCol)),
      vecCol, initGroupCol)
    val carr = cent.groupBy(col("grp"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("avg")))),
        s => s.getField("avg")).as("cvec"))
    val scored = vectors
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .crossJoin(broadcast(carr))
      .select(col("vid"), col("grp"),
        aggregate(zip_with(col("v"), col("cvec"),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
    scored.groupBy("vid")
      .agg(min(struct(col("d2"), col("grp"))).as("m"))
      .select(col("vid"), col("m.grp").as("cluster"))
  }

  def kmeansStep(vectors: DataFrame, vecCol: String, idCol: String,
      initGroupCol: String): DataFrame = {
    val assign = assignToCentroids(vectors, vecCol, idCol, initGroupCol)
    val joined = vectors
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(assign, "vid")
    val n = joined.groupBy(col("cluster")).agg(count(lit(1)).as("n_vectors"))
    centroids(joined.select(col("cluster"), col("v")), "v", "cluster")
      .join(n, col("grp") === col("cluster"))
      .select(col("grp").as("cluster"), col("pos"), col("avg"),
        col("n_vectors"))
  }

  def nearDupPairs(vectors: DataFrame, vecCol: String, idCol: String,
      blockCol: String, threshold: Double, maxBlock: Int = 10000): DataFrame = {
    val v = vectors.select(col(blockCol).as("blk"),
      col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(when(col("__bc") <= maxBlock, lit(true)).otherwise(
        raise_error(concat(lit(s"nearDupPairs: block over $maxBlock rows: "),
          col("blk").cast("string"))).cast("boolean")))
      .drop("__bc")
    val l = v.toDF("blk_a", "id_a", "v_a", "n_a")
    val r = v.toDF("blk_b", "id_b", "v_b", "n_b")
    l.join(r, col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
      .withColumn("score",
        dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b")
  }

  /** Semantic dedup in the SemDeDup shape (Abbas et al. 2023,
    * arXiv:2303.09540): coarse clusters bound the candidate set, and
    * inside each cluster a vector is DROPPED iff some lower-id
    * vector matches it at cosine ≥ threshold (first-seen-wins, the
    * deterministic stand-in for the paper's keep-one-per-group).
    * Assignment is the bit-stable [[assignToCentroids]] argmin;
    * candidate pairs come from [[nearDupPairs]] blocked on the
    * assigned cluster — pairwise work is bounded per cell, never
    * corpus-quadratic (at 100 TB the init groups are themselves a
    * k-means product, cells sized to the maxBlock guard).
    * Returns one row per vector: (vec_id, cluster, keep 1/0,
    * dup_of = lowest dominating id or -1). */
  def semanticDedup(vectors: DataFrame, vecCol: String, idCol: String,
      initGroupCol: String, threshold: Double): DataFrame = {
    val assign = assignToCentroids(vectors, vecCol, idCol, initGroupCol)
    val av = vectors.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(assign, "vid")
    val dom = nearDupPairs(av, "v", "vid", "cluster", threshold)
      .groupBy(col("id_b").as("vid"))
      .agg(min(col("id_a")).as("__dup"))
    av.select("vid", "cluster").join(dom, Seq("vid"), "left")
      .select(col("vid").as("vec_id"), col("cluster"),
        when(col("__dup").isNull, 1).otherwise(0).as("keep"),
        coalesce(col("__dup"), lit(-1L)).as("dup_of"))
  }
}
