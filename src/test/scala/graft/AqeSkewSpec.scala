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
}
