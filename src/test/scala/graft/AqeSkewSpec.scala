package graft

import org.apache.spark.sql.functions._

/** AQE is the engine's runtime answer to skew the static plan can't
  * see: a sort-merge join whose one hot key dwarfs the others must be
  * split by OptimizeSkewedJoin at execution time. `Skew.saltedJoin`
  * covers the planned case; this spec proves the adaptive case. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join") {
    val conf = Map(
      // enough partitions that the hot one towers over the median
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-sized thresholds so the hot partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k fact rows, 90% on one hot key; the md5 pad is
      // incompressible so the hot partition's shuffle bytes are real
      val facts = spark.range(0, 100000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100)
            .as("k"),
          md5(col("id").cast("string")).as("pad"))
      val dim = spark.range(0, 100)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("dv"))
      val j = facts.join(dim, "k").groupBy("dv")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("pad_len"))
      val rows = j.collect()
      assert(rows.map(_.getLong(1)).sum == 100000L)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot-bigram corpus: AQE splits the text-join shapes of " +
      "q_lm_coverage and q_contamination") {
    // Which text joins need AQE vs are structurally skew-proof:
    //  - q_lm_coverage (doc-grain bigram-hash ⟕ vocabulary) and
    //    q_contamination (doc n-gram hash ⨝ benchmark hashes) join on
    //    CONTENT-derived keys — one pathological token/bigram ("of
    //    the" at corpus scale) makes one reducer hot, so these rely
    //    on AQE skew-split (proven here on their join shapes);
    //  - q_minhash_lsh / q_simhash band joins are structurally
    //    bounded (band-hash buckets cap multiplicity), and
    //    q_tfidf / q_bm25 join df-capped vocabularies — no split
    //    needed there.
    val conf = Map(
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the de-skewed q_lm_coverage left frame: one row per
      // (doc, bigram-hash) with 90% of docs containing the hot bigram;
      // the md5 pad stands in for the row width so the hot partition's
      // shuffle bytes are real
      val bg = spark.range(0, 100000).select(
        col("id").as("doc_id"),
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 1000)
          .as("h"),
        md5(col("id").cast("string")).as("pad"),
        lit(3L).as("cnt"))
      val known = spark.range(0, 1000).select(col("id").as("kh"))

      // q_lm_coverage shape: left join to the vocabulary, per-doc rollup
      val cov = bg.join(known, col("h") === col("kh"), "left")
        .groupBy("doc_id")
        .agg(sum(when(col("kh").isNotNull, col("cnt")).otherwise(lit(0L)))
          .as("n_known"), max(length(col("pad"))).as("w"))
      assert(cov.collect().length == 100000)
      val covPlan = cov.queryExecution.executedPlan.toString
      assert(covPlan.contains("skew=true"),
        s"AQE did not split the lm_coverage-shaped hot key:\n$covPlan")

      // q_contamination shape: inner join against the benchmark set
      val cont = bg.join(known, col("h") === col("kh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      assert(cont.collect().nonEmpty)
      val contPlan = cont.queryExecution.executedPlan.toString
      assert(contPlan.contains("skew=true"),
        s"AQE did not split the contamination-shaped hot key:\n$contPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot hub in the triangle wedge join: the degree-orientation " +
      "bound holds (no AQE needed)") {
    // q_triangle's protection is STRUCTURAL, not adaptive: a hub of
    // degree 5000 under naive id-orientation would seed C(5000,2) ≈
    // 12.5M wedges through one key; degree orientation points every
    // spoke→hub edge AT the hub (spokes outrank nothing), so the hub
    // has out-degree ~0 and contributes ~no wedges. Run the SHIPPED
    // core (graft.ops.Graphs) on an adversarial star + a known
    // triangle set and assert both the count and the wedge bound.
    val n = 5000L
    val star = spark.range(1, n + 1)
      .select(lit(0L).as("a"), col("id").as("b"))
    // disjoint triangle block on ids ≥ 10^6: (base, base+1, base+2)
    val triIds = spark.range(0, 40).select((col("id") * 3 + 1000000L).as("x"))
    val triEdges = triIds.select(col("x").as("a"), (col("x") + 1).as("b"))
      .unionAll(triIds.select((col("x") + 1).as("a"), (col("x") + 2).as("b")))
      .unionAll(triIds.select(col("x").as("a"), (col("x") + 2).as("b")))
    val edges = star.unionAll(triEdges)
    val row = graft.ops.Graphs.triangleCount(edges).head()
    assert(row.getLong(row.fieldIndex("n_triangles")) == 40L)
    assert(row.getLong(row.fieldIndex("n_nodes")) == n + 1 + 120L)
    // the bound itself: the star contributes ZERO wedges (every spoke
    // has out-degree 1, the hub outranks nothing), each triangle ≤ 3
    val nWedges = graft.ops.Graphs
      .wedges(graft.ops.Graphs.orient(edges.select("a", "b"))).count()
    assert(nWedges <= 3 * 40L,
      s"wedge bound violated: $nWedges wedges from a hub graph")
  }

  test("hot dst in the PageRank contribution aggregate: map-side " +
      "partial aggregation pre-reduces the hot key") {
    // q_pagerank's per-iteration groupBy(dst).sum is skew-safe by
    // PARTIAL aggregation, not AQE: every map partition combines its
    // share of the hot dst before the exchange, so the hot reducer
    // receives ≤ #maps rows however many edges point at one node.
    // Star-in graph: ALL 50k edges point at node 0.
    val edges = spark.range(1, 50001)
      .select(col("id").as("src"), lit(0L).as("dst"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val pr = edges.select(col("src").as("id")).distinct()
      .unionAll(spark.range(0, 1).select(col("id")))
      .withColumn("pr", lit(1.0 / 50001))
    val contrib = edges.join(deg, "src")
      .join(pr, edges("src") === pr("id"))
      .select(col("dst").as("id"), (col("pr") / col("deg")).as("c"))
      .groupBy("id").agg(sum(col("c")).as("s"))
    val rows = contrib.collect()
    assert(rows.length == 1 && math.abs(rows.head.getDouble(1) -
      50000.0 / 50001) < 1e-9)
    // the plan fence: a partial_sum HashAggregate BEFORE the exchange
    val plan = contrib.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"),
      s"no map-side partial aggregate in the contribution plan:\n$plan")
  }

  test("hot boilerplate chunk in chunkDedup: the ownership aggregate " +
      "pre-reduces map-side, the hot reducer never sees every copy") {
    // Every one of 20k docs opens with the SAME 3-token licence
    // header and closes with a unique tail — the worst case for a
    // per-hash window (20k rows through one task), handled here by
    // the struct-min PARTIAL aggregate: each map partition emits one
    // candidate owner for the hot hash before the exchange.
    import spark.implicits._
    val docs = spark.range(0, 20000)
      .select(col("id").as("doc_id"),
        concat(lit("licensed under public terms "),
          lit("tail "), col("id").cast("string")).as("text"))
    val got = graft.dedup.Dedup.chunkDedup(docs, "text", "doc_id", 3)
    // doc 0 owns the header chunk; every other doc counts 1 dup
    // (its own copy) out of 2 chunks ("licensed under public" +
    // "terms tail <id>")
    val agg = got.agg(sum(col("n_dup_chunks")).cast("long"),
      sum(col("n_chunks")).cast("long")).as[(Long, Long)].head()
    assert(agg == ((19999L, 40000L)), s"unexpected dup totals: $agg")
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"no map-side partial min in the ownership plan:\n$plan")
  }
}
