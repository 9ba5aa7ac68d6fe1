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
}
