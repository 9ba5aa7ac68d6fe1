package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All functions are pure `Column` expression trees (whole-stage
  * codegen, no UDFs). Hashes are md5-derived so results are
  * reproducible by any engine (and by the DuckDB oracle).
  */
object TextFunctions {

  /** Lowercase word tokens: split on runs of non-alphanumerics. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9']+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Character k-gram shingles (distinct), for Jaccard/MinHash. */
  def shingles(text: Column, k: Int): Column =
    when(length(text) >= k,
      array_distinct(transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** 60-bit stable hash from md5 — reproducible across engines. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** MinHash signature: for seed i, min over shingles of
    * hash60(shingle || ':' || i). Classic Broder permutation
    * approximation; nPerm independent md5-salted hash families. */
  def minhashSignature(shingleSet: Column, nPerm: Int): Column =
    array((0 until nPerm).map { i =>
      array_min(transform(shingleSet,
        sh => hash60(concat(sh, lit(":" + i)))))
    }: _*)

  /** Document fingerprint: md5 over the sorted distinct token set —
    * robust to token order / duplication, cheap exact-near-dup key. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  private val stopwordsEn =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")

  /** Ratio of stopword tokens to all tokens (0 when empty). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(stopwordsEn.map(lit): _*)))
    when(size(toks) > 0,
      hits.cast("double") / size(toks).cast("double")).otherwise(lit(0.0))
  }

  /** Share of distinct tokens — low values indicate boilerplate/spam. */
  def uniqueTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean token length (0 when empty). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]-ish: favors some stopwords
    * (natural prose), diverse tokens, and mid-length words. Fixed
    * left-associated arithmetic so any IEEE-754 engine reproduces it. */
  def qualityScore(text: Column): Column =
    stopwordRatio(text) * lit(0.4) +
      uniqueTokenRatio(text) * lit(0.4) +
      when(meanTokenLen(text) >= 3.0 && meanTokenLen(text) <= 8.0, lit(0.2))
        .otherwise(lit(0.0))

  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est"),
    "zh" -> Seq("的", "了", "和", "是", "在"))

  /** Heuristic language ID: stopword-profile hit counts, ties broken by
    * language code order. N-gram-free so it stays codegen'd; a real
    * deployment would swap in a fastText-style model via mapInPandas. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langProfiles.map { case (code, words) =>
      code -> size(filter(toks, t => t.isin(words.map(lit): _*)))
    }
    // argmax with deterministic first-wins tie-break (codes sorted)
    scored.foldLeft((lit("und"), lit(-1))) { case ((bestL, bestS), (code, s)) =>
      (when(s > bestS, lit(code)).otherwise(bestL),
        when(s > bestS, s).otherwise(bestS))
    }._1
  }
}
