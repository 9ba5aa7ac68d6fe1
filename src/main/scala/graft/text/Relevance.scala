package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.tokens

/** Corpus relevance scoring — TF-IDF term extraction and BM25 document
  * ranking — for training-data curation (salient-term indexing, query-
  * targeted corpus selection).
  *
  * Shapes: term frequency is explode → one (doc, token) shuffle;
  * document frequency re-aggregates the tf frame (one vocabulary-sized
  * shuffle); corpus scalars (N, avgdl) ride a broadcast 1-row cross
  * join. Nothing is ever collected to the driver; top-k document
  * ranking uses orderBy+limit (TakeOrdered — per-partition heaps, no
  * global sort/single-partition window).
  *
  * Determinism: the idf weight is kept RATIONAL — `(N+1)/(df+1)`
  * rather than `ln((N+1)/(df+1))+1` — so every score is a fixed tree
  * of exact IEEE-754 ops on integers that any engine reproduces bit-
  * identically (ln is not correctly-rounded in all runtimes; ranks
  * must not depend on a libm's last ulp). [[logIdf]] provides the
  * classic log form for user pipelines where cross-engine bit
  * equality is not required.
  */
object Relevance {

  /** (idCol, token, tf): term frequency per document. */
  def termFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** (token, df): document frequency, derived from [[termFreq]]'s
    * output — one row per (doc, token) by construction, so a plain
    * count per token IS the document count; the corpus tokenizes once
    * per pipeline. */
  def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy("token").agg(count(lit(1)).as("df"))

  /** Classic smoothed log idf — for user pipelines (not oracle rows;
    * see the determinism note above). */
  def logIdf(nDocs: Column, df: Column): Column =
    log((nDocs + lit(1.0)) / (df + lit(1.0))) + lit(1.0)

  /** Top-k salient terms per document by rational TF-IDF weight
    * `tf * (N+1)/(df+1)`, ties broken by token (total order).
    * Output: (idCol, rank, token, tf, df). */
  def tfidfTopK(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    val tf = termFreq(docs, textCol, idCol)
    val df = docFreq(tf)
    val n = docs.agg(count(lit(1)).as("__nd"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("__score", col("tf").cast("double") *
        ((col("__nd") + lit(1.0)) / (col("df") + lit(1.0))))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"))
  }

  /** BM25 document scores for a fixed bag of query terms (k1 = 1.2,
    * b = 0.75). The idf factor is BM25's rational core
    * `(N - df + 0.5)/(df + 0.5)` without the enclosing log (same
    * monotonicity, engine-exact — see the object note). Term scores
    * land as pivoted columns and sum in FIXED textual order, so the
    * double result is identical under any partitioning.
    * Output: (idCol, score) — every document with ≥1 query-term hit. */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val toks = tokens(col(textCol))
    val dl = docs.select(col(idCol), size(toks).cast("long").as("__dl"))
    val stats = dl.agg(
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"),
      count(lit(1)).as("__nd"))
    val tf = termFreq(docs, textCol, idCol)
      .filter(col("token").isin(queryTerms.map(lit): _*))
    val df = docFreq(tf)
    val term = tf.join(df, "token")
      .join(dl, idCol).crossJoin(broadcast(stats))
      .withColumn("__ts",
        ((col("__nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              ((lit(1.0) - lit(b)) +
                lit(b) * (col("__dl").cast("double") / col("__avgdl"))))))
    // pivot to fixed columns → fixed addition order (float sums over
    // grouped rows would be partitioning-dependent)
    val aggs = queryTerms.map(q =>
      max(when(col("token") === q, col("__ts"))).as(s"__t_$q"))
    val pivoted = term.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val score = queryTerms.map(q => coalesce(col(s"`__t_$q`"), lit(0.0)))
      .reduceLeft(_ + _)
    pivoted.select(col(idCol), score.as("score"))
  }
}
