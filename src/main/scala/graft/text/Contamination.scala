package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions.{hash60, tokens}

/** Train/test contamination detection: flag evaluation documents whose
  * word n-grams appear anywhere in the training split — the
  * decontamination check run before any benchmark number is trusted.
  *
  * Scale shape: each side reduces to DISTINCT n-gram hashes (64-bit
  * md5-derived, engine-reproducible) — the join is a long↔long
  * equi-join on the hash, never on text. The training side collapses
  * to one distinct-hash column (its size is bounded by corpus
  * vocabulary^n, typically ≪ corpus bytes); per-eval-document counts
  * come from one aggregation over the join result. No driver
  * collection, no all-pairs anywhere.
  */
object Contamination {

  /** Distinct hashed word n-grams per row: `(idCol, gh)`. Rows with
    * fewer than `n` tokens produce no grams. */
  def gramHashes(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(col(idCol), t.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(1), size(col("__t")) - (n - 1)),
          i => hash60(concat_ws(" ", slice(col("__t"), i, lit(n)))))))
        .as("gh"))
  }

  /** Contamination report for `test` against `train`: per test
    * document, total distinct grams, grams also present in train, and
    * a contaminated flag (exact integer compare). */
  def report(train: DataFrame, test: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val trainGrams = gramHashes(train, textCol, idCol, n)
      .select("gh").distinct()
    val testGrams = gramHashes(test, textCol, idCol, n)
    testGrams.join(trainGrams.withColumn("__hit", lit(1)), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_hit"),
        when(count(col("__hit")) > 0, 1).otherwise(0).cast("int")
          .as("contaminated"))
  }
}
