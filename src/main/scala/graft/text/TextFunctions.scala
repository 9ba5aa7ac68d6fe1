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

  /** Non-distinct k-gram shingles: min-based sketches (MinHash) are
    * distinctness-invariant, so skip the per-row hash-set build. */
  def shinglesAll(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  /** 60-bit stable hash from md5 — reproducible across engines. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** 32-bit stable hash from md5 (cheap base for derived hash
    * families — one md5 per value, not one per family member). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Universal-hash constants for permutation family i: (a, b) with
    * a < 2^30 so a*h32 + b stays below 2^63 (no overflow in either
    * engine). Deterministic, engine-independent. */
  private[graft] val MinhashP = 2147483647L // 2^31 - 1
  private[graft] def minhashAB(i: Int): (Long, Long) = (
    (2654435761L * (i + 1)) % 1073741789L + 1L,
    (40503L * (i + 7) * 104729L) % MinhashP)

  /** Per-shingle 32-bit hashes — materialize this ONCE (withColumn)
    * and feed [[minhashFromHashes]], so the md5 work is not repeated
    * per permutation (16× at nPerm=16). Native batch expression
    * ([[graft.plans.Md5PrefixHashes]]): one digest per element,
    * numerically identical to `transform(arr, hash32)`. */
  def shingleHashes(shingleSet: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.Md5PrefixHashes(
        org.apache.spark.sql.GraftBridge.expression(shingleSet), 8))

  /** MinHash signature from pre-hashed shingles: permutation i is the
    * universal hash (a_i * h + b_i) mod (2^31-1) — integer-exact in
    * any engine, one multiply+mod per shingle instead of an md5.
    * Native one-pass expression ([[graft.plans.MinHashSig]]): the
    * declarative twin below runs nPerm transform+array_min passes,
    * each allocating an intermediate array as long as the shingle
    * list, per row. */
  def minhashFromHashes(hashes: Column, nPerm: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.MinHashSig(
        org.apache.spark.sql.GraftBridge.expression(hashes), nPerm))

  /** Declarative twin of [[minhashFromHashes]] — bit-identical by the
    * differential spec. */
  def minhashFromHashesFold(hashes: Column, nPerm: Int): Column =
    array((0 until nPerm).map { i =>
      val (a, b) = minhashAB(i)
      array_min(transform(hashes, h => (lit(a) * h + lit(b)) % MinhashP))
    }: _*)

  /** MinHash signature straight from the shingle set (convenience;
    * prefer materializing [[shingleHashes]] first in pipelines). */
  def minhashSignature(shingleSet: Column, nPerm: Int): Column =
    minhashFromHashes(shingleHashes(shingleSet), nPerm)

  /** Adjacent token bigrams ("w1 w2") from a materialized token
    * array; empty when fewer than 2 tokens (NEVER call on unguarded
    * size<2 input via sequence — a descending sequence(1,0) would
    * fabricate grams). */
  def bigramsFromTokens(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "),
          element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Adjacent token pairs as structs (w1, w2) — for n-gram LM stats
    * where the two words group separately. */
  def bigramPairsFromTokens(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Document fingerprint: md5 over the sorted distinct token set —
    * robust to token order / duplication, cheap exact-near-dup key. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  private val stopwordsEn =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")

  // *FromTokens variants take an already-materialized token array so a
  // multi-metric projection tokenizes each document exactly once.

  /** Ratio of stopword tokens to all tokens (0 when empty). */
  def stopwordRatioFromTokens(toks: Column): Column = {
    val hits = size(filter(toks, t => t.isin(stopwordsEn.map(lit): _*)))
    when(size(toks) > 0,
      hits.cast("double") / size(toks).cast("double")).otherwise(lit(0.0))
  }
  def stopwordRatio(text: Column): Column =
    stopwordRatioFromTokens(tokens(text))

  /** Share of distinct tokens — low values indicate boilerplate/spam. */
  def uniqueTokenRatioFromTokens(toks: Column): Column =
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  def uniqueTokenRatio(text: Column): Column =
    uniqueTokenRatioFromTokens(tokens(text))

  /** Mean token length (0 when empty). */
  def meanTokenLenFromTokens(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  def meanTokenLen(text: Column): Column =
    meanTokenLenFromTokens(tokens(text))

  /** Composite quality score in [0,1]-ish: favors some stopwords
    * (natural prose), diverse tokens, and mid-length words. Fixed
    * left-associated arithmetic so any IEEE-754 engine reproduces it. */
  def qualityScoreFromTokens(toks: Column): Column =
    stopwordRatioFromTokens(toks) * lit(0.4) +
      uniqueTokenRatioFromTokens(toks) * lit(0.4) +
      when(meanTokenLenFromTokens(toks) >= 3.0 &&
        meanTokenLenFromTokens(toks) <= 8.0, lit(0.2))
        .otherwise(lit(0.0))
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(tokens(text))

  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est"),
    "zh" -> Seq("的", "了", "和", "是", "在"))

  /** Heuristic language ID: stopword-profile hit counts, first-max
    * wins. Expressed as array_max + array_position (first occurrence)
    * instead of a nested when-fold — the fold duplicates every score
    * subtree per level (2^profiles expression blow-up). */
  def langIdFromTokens(toks: Column): Column = {
    val scores = array(langProfiles.map { case (_, words) =>
      size(filter(toks, t => t.isin(words.map(lit): _*)))
    }: _*)
    val codes = array(langProfiles.map { case (code, _) => lit(code) }: _*)
    element_at(codes,
      array_position(scores, array_max(scores)).cast("int"))
  }
  def langId(text: Column): Column = langIdFromTokens(tokens(text))
}
