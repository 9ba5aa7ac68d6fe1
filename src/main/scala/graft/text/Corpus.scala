package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions.tokens

/** Corpus-level statistics for training-data curation — operations
  * whose unit is the corpus, not the row: document frequency, and
  * corpus-adaptive common-token (boilerplate/stopword) discovery and
  * removal. A fixed stopword list misses domain boilerplate; the
  * corpus itself says which tokens carry no signal.
  *
  * Shapes: token DF is explode(distinct tokens) → one count shuffle;
  * the common-token set is threshold-filtered from DF (a tiny frame —
  * vocabulary-sized) and broadcast into an anti-join against the
  * exploded corpus, so the full text never shuffles.
  */
object Corpus {

  /** (token, df): number of documents containing each token. */
  def tokenDocFreq(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))

  /** Tokens appearing in strictly more than num/den of all documents
    * (exact rational compare — no float threshold). */
  def commonTokens(docs: DataFrame, textCol: String, idCol: String,
      num: Int, den: Int): DataFrame = {
    val total = docs.agg(count(lit(1)).as("__nd"))
    tokenDocFreq(docs, textCol, idCol)
      .crossJoin(total)
      .filter(col("df") * den > col("__nd") * num)
      .select("token")
  }

  /** Inverted-index posting lists: per token, document frequency and
    * the ascending doc-id posting list (joined with '-'; pin with md5
    * for compact verification). At warehouse scale postings are a
    * written artifact sharded by token — the shape here (explode →
    * one groupBy(token)) IS the shard build; a df cap (`maxDf`)
    * bounds the largest posting a single reducer materializes, the
    * way real indexes stop-list their head terms. */
  def postings(docs: DataFrame, textCol: String, idCol: String,
      maxDf: Long = Long.MaxValue): DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        array_join(transform(sort_array(collect_list(col(idCol))),
          d => d.cast("string")), "-").as("postings"))
      .filter(col("df") <= maxDf)

  /** Per-document token counts before/after stripping the
    * corpus-common tokens: the boilerplate-removal accounting a
    * curation pipeline gates on. Documents reduced to nothing stay
    * (n_after = 0) — deletion is a downstream policy decision. */
  def stripCommonCounts(docs: DataFrame, textCol: String, idCol: String,
      num: Int, den: Int): DataFrame = {
    val common = commonTokens(docs, textCol, idCol, num, den)
    val kept = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(common), Seq("token"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_after"))
    docs.select(col(idCol),
        size(tokens(col(textCol))).as("n_before"))
      .join(kept, Seq(idCol), "left")
      .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
  }
}
