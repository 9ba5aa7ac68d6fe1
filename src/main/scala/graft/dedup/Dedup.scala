package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._
import graft.ops.Staging.StagedDF

/** Deduplication pipelines for training-data curation.
  *
  * Design notes for 100 TB: nothing here ever builds an O(n²) pair
  * set. Exact dedup is a hash group-by; near-dup generates candidate
  * pairs only inside LSH buckets / blocking keys, then verifies with
  * the exact measure. All hashes are md5-derived (engine-portable).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical text (hashed). */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    docs.withColumn("__h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("__rn") === 1)
      .drop("__rn", "__h")
  }

  /** Chunk-level exact dedup — the duplicated-passage detector a
    * training pipeline runs INSIDE documents that are not themselves
    * duplicates (boilerplate headers, licence blocks, quoted
    * reposts; the non-overlapping cousin of Lee et al. 2022's
    * exact-substring dedup). Tokens group into fixed `width`-token
    * windows, each window hashes, and the global first occurrence of
    * every hash — lowest (doc, chunk_idx) — owns it; every other
    * occurrence counts as duplicated. Returns one row per doc:
    * (doc_id, n_chunks, n_dup_chunks).
    *
    * 100 TB shape: the only shuffle is the groupBy on the chunk
    * hash (corpus_tokens / width rows); ownership is a struct-min
    * aggregate, so a boilerplate chunk repeated a billion times
    * pre-reduces map-side instead of hammering one reducer the way
    * a per-hash window would. Never pairwise. The overlapping-
    * shingle variant is the same plan with a ×width denser key
    * stream. */
  def chunkDedup(docs: DataFrame, textCol: String, idCol: String,
      width: Int): DataFrame = {
    require(width > 0, s"chunkDedup: width must be positive, got $width")
    val chunks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), ((size(col("__ts")) - 1) / lit(width)).cast("int")),
        i => md5(array_join(
          slice(col("__ts"), i * width + 1, lit(width)), " ")))))
      .select(col("doc_id"), col("pos").as("chunk_idx"), col("col").as("__h"))
    val owner = chunks.groupBy("__h")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("__o"))
    chunks.join(owner, "__h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__o.doc_id") =!= col("doc_id") ||
            col("__o.chunk_idx") =!= col("chunk_idx"), 1L).otherwise(0L))
          .as("n_dup_chunks"))
  }

  /** Overlapping-shingle exact-substring dedup — the ×width denser
    * key-stream variant of [[chunkDedup]] and the closest
    * declarative analog of Lee et al. 2022's suffix-array
    * exact-substring dedup: EVERY `width`-token window (stride 1,
    * not stride `width`) hashes, so a duplicated passage is caught
    * at any alignment, not only when it starts on a chunk boundary.
    * Ownership and accounting are identical to chunkDedup: the
    * global first occurrence — lowest (doc_id, pos) — owns each
    * shingle hash; a doc's `n_dup_shingles` counts windows whose
    * content appears earlier anywhere in the corpus. Docs shorter
    * than `width` tokens emit no shingles (no partial windows — a
    * partial window would alias a full one's prefix).
    *
    * 100 TB shape: same single shuffle as chunkDedup (groupBy on
    * the shingle hash) with a corpus_tokens-sized key stream
    * instead of corpus_tokens/width — the struct-min ownership
    * still pre-reduces a billion-fold repeated boilerplate window
    * map-side. The cost multiplier vs chunkDedup is exactly ×width
    * more keys; that is the price of alignment-free detection and
    * the reason pipelines run THIS on suspect slices and the
    * chunk form corpus-wide. */
  def shingleDedup(docs: DataFrame, textCol: String, idCol: String,
      width: Int): DataFrame = {
    require(width > 0, s"shingleDedup: width must be positive, got $width")
    val shingles = docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= width)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), (size(col("__ts")) - width).cast("int")),
        i => md5(array_join(slice(col("__ts"), i + 1, lit(width)), " ")))))
      .select(col("doc_id"), col("pos").as("sh_idx"), col("col").as("__h"))
    val owner = shingles.groupBy("__h")
      .agg(min(struct(col("doc_id"), col("sh_idx"))).as("__o"))
    shingles.join(owner, "__h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__o.doc_id") =!= col("doc_id") ||
            col("__o.sh_idx") =!= col("sh_idx"), 1L).otherwise(0L))
          .as("n_dup_shingles"))
  }

  /** Candidate near-dup pairs via MinHash + LSH banding.
    *
    * doc → distinct char-k-shingles → nPerm minhash values → `bands`
    * band signatures; docs sharing any band signature become a
    * candidate pair (id_a < id_b). The band join is an equi-join on
    * (band_idx, band_hash) — shuffle-partitioned, never all-pairs.
    * Verify with [[jaccardPairs]] or a threshold on the true measure.
    */
  /** Banded MinHash-LSH signatures: (id, band, bandhash) rows, the
    * joinable form of a document's near-dup identity. Persist this
    * frame as the corpus signature ARTIFACT — incremental refreshes
    * ([[minhashLshIncrementalPairs]]) join new batches against it
    * without ever re-reading or re-signing the old corpus text. */
  def bandedSignatures(docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, nPerm: Int = 16, bands: Int = 4): DataFrame = {
    require(nPerm % bands == 0, "bands must divide nPerm")
    val rows = nPerm / bands
    // Materialize per-shingle hashes in their own projection so the
    // md5 work runs once, not once per permutation (CollapseProject
    // keeps expensive multi-referenced aliases separate). Min-sketches
    // ignore duplicates, so the cheaper non-distinct shingle form.
    def charShingleHashes(text: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.plans.CharShingleHashes(
          org.apache.spark.sql.GraftBridge.expression(text), shingleK, 8))
    val sig = docs
      .select(col(idCol).as("id"),
        charShingleHashes(col(textCol)).as("hs"))
      .select(col("id"), minhashFromHashes(col("hs"), nPerm).as("sig"))
    sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(concat_ws("_", (0 until rows).map(r =>
          element_at(col("sig"), b * rows + r + 1)): _*)))))
      .toDF("id", "band", "bandhash")
  }

  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, nPerm: Int = 16, bands: Int = 4): DataFrame = {
    // Both sides of the self-join read this subtree; the join's two
    // shuffle children are canonically identical, so ReuseExchange
    // materializes the shingle+minhash pipeline ONCE and replays the
    // shuffle files for the other side — no persist, no cache-manager
    // lifetime to manage (an un-released persist here leaked into
    // every later query of an r3 bench session). At warehouse scale
    // the signature table would be a written artifact instead
    // ([[bandedSignatures]] + [[minhashLshIncrementalPairs]]).
    val banded = bandedSignatures(docs, textCol, idCol, shingleK, nPerm, bands)
    val l = banded.toDF("id_a", "band_a", "h_a")
    val r = banded.toDF("id_b", "band_b", "h_b")
    l.join(r, col("band_a") === col("band_b") &&
        col("h_a") === col("h_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Incremental near-dup refresh: candidate pairs that TOUCH the new
    * batch — new↔old (vs the persisted [[bandedSignatures]] artifact)
    * and new↔new — without re-signing the old corpus. Equals the
    * full-corpus [[minhashLshPairs]] restricted to pairs with at
    * least one new id; old↔old pairs were already known to prior
    * runs. The band equi-join shape (never all-pairs) is unchanged. */
  def minhashLshIncrementalPairs(newBanded: DataFrame,
      artifactBanded: DataFrame): DataFrame = {
    val l = newBanded.toDF("id_a", "band_a", "h_a")
    val r = artifactBanded.unionByName(newBanded)
      .toDF("id_b", "band_b", "h_b")
    l.join(r, col("band_a") === col("band_b") &&
        col("h_a") === col("h_b") && col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** Exact shingle-Jaccard for candidate pairs: returns intersection /
    * union sizes plus the ratio. Threshold comparisons should use the
    * integer cross-multiplication form (`union*num <= inter*den`) to
    * avoid float boundary effects. */
  def jaccard(shA: Column, shB: Column): (Column, Column, Column) = {
    val inter = size(array_intersect(shA, shB))
    // inputs are distinct sets, so |A∪B| = |A|+|B|-|A∩B| — saves a
    // second hash-build per pair vs array_union.
    val uni = size(shA) + size(shB) - inter
    (inter, uni, when(uni > 0, inter.cast("double") / uni.cast("double"))
      .otherwise(lit(0.0)))
  }

  /** Connected components over a near-dup pair graph: the step that
    * turns PAIRS into CLUSTERS, so one canonical document per
    * component can be kept (pairs alone under-delete: A~B and B~C
    * must collapse to one survivor even when A≁C directly).
    *
    * Min-label propagation: every node starts labeled with its own
    * id; each round every node takes the min of its label and its
    * neighbors' labels; fixpoint = component = min id reachable. Each
    * round is one distributed join + aggregate over the (narrow)
    * label frame; `staged` (Staging.scala: reliable checkpoint when a
    * checkpoint dir is set, localCheckpoint otherwise) truncates
    * lineage so the plan
    * doesn't grow with iterations (blocks are reclaimed by the
    * context cleaner — no cache-manager persist). Rounds needed =
    * graph diameter — fine for dup clusters (tiny diameters); a
    * web-scale graph with long chains would switch to the
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce"), same API.
    *
    * Returns (id, comp) for every node that appears in `pairs`;
    * singleton documents never enter the pair graph and need no row.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 50): DataFrame = {
    val edges = pairs
      .select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .union(pairs
        .select(col(idB).cast("long").as("src"), col(idA).cast("long").as("dst")))
      .distinct()
      .staged // edges are reused every round — materialize once
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .staged
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIter) {
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select(edges("dst").as("id"), col("comp"),
          lit(null).cast("long").as("__old"))
      // The previous label rides the SAME aggregate (each id appears
      // exactly once in `labels`, so max ignoring the msgs' nulls
      // recovers it) — convergence is then a cheap scan over the
      // checkpointed blocks instead of a per-round shuffle join of
      // new labels against old.
      val updated = labels
        .select(col("id"), col("comp"), col("comp").as("__old"))
        .union(msgs)
        .groupBy("id")
        .agg(min(col("comp")).as("comp"), max(col("__old")).as("__old"))
        .staged
      converged = updated.filter(col("comp") =!= col("__old")).isEmpty
      labels = updated.select("id", "comp")
      iter += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIter rounds")
    labels
  }

  /** Connected components via large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the web-scale alternative to [[connectedComponents]]:
    * label propagation needs O(diameter) rounds, contraction needs
    * O(log² n) WHATEVER the diameter, so million-hop chains (linked
    * page graphs, citation chains) converge in ~20 rounds instead of
    * a million. Same API and output contract as
    * [[connectedComponents]]: (id, comp=min id in component) for
    * every node in `pairs`.
    *
    * large-star: each node points its LARGER neighbors at its
    * neighborhood min (never increases a label, strictly shrinks tall
    * trees); small-star: each node folds its smaller-or-equal
    * neighbors onto the min. Both are one groupBy + join over the
    * edge frame; convergence is an aggregate signature compare (one
    * tiny job, no edge-set anti-join). */
  def connectedComponentsStar(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 60): DataFrame = {
    def orient(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()

    var edges = orient(pairs
      .select(col(idA).cast("long").as("u"), col(idB).cast("long").as("v")))
      .staged

    def signature(e: DataFrame): (Long, String, String) = {
      // hash-sums through DECIMAL(38,0): a LONG sum of xxhash64 values
      // overflows (ANSI would throw); decimal is exact and
      // order-independent. TWO independent multiset hashes (the args
      // swapped give uncorrelated values) + the count make a collision
      // between different edge sets ~2^-128 — strong enough to be the
      // ONLY convergence check, so each round costs one driver job
      // instead of signature + exceptAll-confirm.
      def hsum(c: Column) = coalesce(sum(c.cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))
      val r = e.agg(count(lit(1)), hsum(xxhash64(col("u"), col("v"))),
        hsum(xxhash64(col("v"), col("u")))).head()
      (r.getLong(0), r.getDecimal(1).toPlainString,
        r.getDecimal(2).toPlainString)
    }

    var iter = 0
    var converged = edges.isEmpty
    var sig = if (converged) (0L, "0", "0") else signature(edges)
    while (!converged && iter < maxIter) {
      // large-star over the symmetric neighborhood: attach every
      // strictly-larger neighbor v of u to m = min(N(u) ∪ {u})
      val sym = edges
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = orient(sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
        .staged
      // small-star on the (u > v)-oriented edges: fold u and its
      // smaller neighbors onto the neighborhood min
      val mins2 = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = orient(ls.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v"))))
        .staged
      val newSig = signature(ss)
      converged = newSig == sig
      sig = newSig
      edges = ss
      iter += 1
    }
    require(converged || edges.isEmpty,
      s"connectedComponentsStar: no fixpoint after $maxIter rounds")
    // at the fixpoint every edge is (member, root); roots label themselves
    val out = edges.select(col("u").as("id"), col("v").as("comp"))
      .union(edges.select(col("v"), col("v")).distinct()
        .select(col("v").as("id"), col("v").as("comp")))
      .distinct()
    // nodes appearing ONLY as self-loops (x, x) never survive orient();
    // label them as their own singleton components so the output
    // contract ("a row for every node in pairs") matches
    // [[connectedComponents]] exactly
    val selfOnly = pairs
      .filter(col(idA).cast("long") === col(idB).cast("long"))
      .select(col(idA).cast("long").as("id")).distinct()
      .join(out.select("id"), Seq("id"), "left_anti")
    out.union(selfOnly.select(col("id"), col("id").as("comp")))
  }

  /** Blocked n-gram-Jaccard near-dup: all pairs within a blocking key
    * (e.g. language + length bucket), kept when Jaccard ≥ num/den
    * (exact rational compare). Blocking bounds the pair blow-up; at
    * scale the block key should include an LSH band. `maxBlock` is an
    * enforced guard: any block larger than it fails the job loudly
    * instead of silently going quadratic on a skewed key.
    *
    * Jaccard is computed over the 32-bit-hashed shingle space (long
    * compares in the pair loop, not string compares — the only form
    * that survives wide blocks at scale); a hash collision merging two
    * distinct shingles is ~2^-32 per pair and deterministic. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], shingleK: Int,
      num: Int, den: Int, maxBlock: Int = 10000): DataFrame =
    shingleBlockPairs(docs, textCol, idCol, blockCols, shingleK, maxBlock)
      .withColumn("union_n", col("na") + col("nb") - col("inter_n"))
      .withColumn("jaccard", when(col("union_n") > 0,
        col("inter_n").cast("double") / col("union_n").cast("double"))
        .otherwise(lit(0.0)))
      .filter(col("inter_n") * den >= col("union_n") * num)
      .select("id_a", "id_b", "inter_n", "union_n", "jaccard")

  /** Blocked shingle CONTAINMENT pairs — the asymmetric near-dup
    * signal (Broder's containment): c(a in b) = |A∩B| / |A|. Unlike
    * Jaccard it catches a short document embedded in a longer one,
    * where the union term dilutes the symmetric score below any
    * usable threshold. Kept when max(c_ab, c_ba) ≥ num/den — an exact
    * rational compare on the SMALLER side's size (|A∩B|·den ≥
    * min(|A|,|B|)·num), so no float enters the filter. Same blocked,
    * never-all-pairs shape and loud maxBlock guard as
    * [[ngramJaccardPairs]]. */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], shingleK: Int,
      num: Int, den: Int, maxBlock: Int = 10000): DataFrame =
    shingleBlockPairs(docs, textCol, idCol, blockCols, shingleK, maxBlock)
      .filter(col("inter_n") * den >= least(col("na"), col("nb")) * num)
      .select(col("id_a"), col("id_b"), col("inter_n"),
        col("na"), col("nb"),
        when(col("na") > 0, col("inter_n").cast("double")
          / col("na").cast("double")).otherwise(lit(0.0)).as("cont_ab"),
        when(col("nb") > 0, col("inter_n").cast("double")
          / col("nb").cast("double")).otherwise(lit(0.0)).as("cont_ba"))

  /** Shared pair frame behind [[ngramJaccardPairs]] /
    * [[containmentPairs]]: per-block id<id self-join over pre-sorted
    * 32-bit shingle-hash arrays, yielding (id_a, id_b, inter_n, na,
    * nb). The native merge-walk intersect does one pass per pair; the
    * maxBlock guard fails loudly before any block goes quadratic. */
  private def shingleBlockPairs(docs: DataFrame, textCol: String,
      idCol: String, blockCols: Seq[String], shingleK: Int,
      maxBlock: Int): DataFrame = {
    val wBlk = Window.partitionBy(blockCols.map(col).toIndexedSeq: _*)
    val shingleHashExpr = org.apache.spark.sql.GraftBridge.column(
      graft.plans.CharShingleHashes(
        org.apache.spark.sql.GraftBridge.expression(col(textCol)),
        shingleK, 8))
    val withSh = docs.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+
        array_sort(array_distinct(shingleHashExpr))
          .as("sh")).toIndexedSeq: _*)
      .withColumn("__bc", count(lit(1)).over(wBlk))
      .filter(when(col("__bc") <= maxBlock, lit(true)).otherwise(
        raise_error(concat(lit(s"shingleBlockPairs: block over $maxBlock rows: "),
          concat_ws(",", blockCols.map(col).toIndexedSeq: _*))).cast("boolean")))
      .drop("__bc")
    val l = withSh.toDF(blockCols.map(_ + "_a") ++ Seq("id_a", "sh_a"): _*)
    val r = withSh.toDF(blockCols.map(_ + "_b") ++ Seq("id_b", "sh_b"): _*)
    val blockCond = blockCols.map(c => col(c + "_a") === col(c + "_b"))
      .reduce(_ && _)
    // intersect once per pair: native merge walk over the pre-sorted
    // hash arrays (no per-pair hash-set build)
    def interCount(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.plans.SortedLongIntersectCount(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.GraftBridge.expression(b)))
    l.join(r, blockCond && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        interCount(col("sh_a"), col("sh_b")).as("inter_n"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
  }
}
