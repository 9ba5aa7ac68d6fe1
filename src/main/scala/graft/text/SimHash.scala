package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** SimHash near-duplicate detection (Charikar 2002, the classic
  * web-dedup sketch; see e.g. the Manku/Jain/Sarma WWW'07 paper on
  * Google's 64-bit simhash crawl dedup).
  *
  * Each document maps to a 60-bit signature: per bit position, sum
  * +1/-1 votes over its token hashes and keep the sign. Near-dups are
  * signature pairs within Hamming distance ≤ d. Pair generation never
  * goes all-pairs: with d ≤ 3 and 4 bands of 15 bits, any pair within
  * distance 3 shares at least one exact band (pigeonhole), so an
  * equi-join on (band, bandBits) finds all candidates — the standard
  * scale path. Hashes are md5-derived (engine-portable, oracle-able).
  */
object SimHash {

  // The Scala wrappers for shiftleft/shiftright only take Int shift
  // amounts; the SQL expressions accept columns — needed inside
  // higher-order-function lambdas where the shift is lambda-bound.
  private def shl(c: Column, n: Column) = call_function("shiftleft", c, n)
  private def shr(c: Column, n: Column) = call_function("shiftright", c, n)

  /** Per-token 60-bit hashes — materialize ONCE (withColumn) and feed
    * [[simhashFromHashes]]; one native digest per token
    * ([[graft.plans.Md5PrefixHashes]], identical to
    * `transform(tokens, hash60)`). */
  def tokenHashes(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.Md5PrefixHashes(
        org.apache.spark.sql.GraftBridge.expression(tokens(text)), 15))

  /** 60-bit simhash from pre-hashed tokens. Bit i is set iff at least
    * half the tokens have bit i set (votes = 2*ones - n >= 0).
    * Native one-pass expression ([[graft.plans.SimHash60]]); the
    * declarative fold form is kept for differential specs. */
  def simhashFromHashes(hashes: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.SimHash60(
        org.apache.spark.sql.GraftBridge.expression(hashes)))

  /** Declarative reference form: 60 independent integer folds. */
  def simhashFromHashesFold(hashes: Column): Column = {
    val n = size(hashes)
    val bits = (0 until 60).map { i =>
      val ones = aggregate(hashes, lit(0L),
        (acc, h) => acc + shr(h, lit(i)).bitwiseAND(1))
      when(ones * 2 >= n, shl(lit(1L), lit(i))).otherwise(lit(0L))
    }
    when(n === 0, lit(0L)).otherwise(bits.reduce(_ bitwiseOR _))
  }

  /** 60-bit simhash of the token multiset, as a non-negative long.
    * Convenience wrapper; pipelines should materialize
    * [[tokenHashes]] first. */
  def simhash60(text: Column): Column =
    simhashFromHashes(tokenHashes(text))

  /** Hamming distance between two 60-bit signatures. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with hamming(sig) ≤ maxDist via banded LSH.
    * Bands = maxDist + 1 (pigeonhole-complete). Returns
    * (id_a, id_b, dist), id_a < id_b, distinct. */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val bands = maxDist + 1
    val bandBits = 60 / bands
    val sigs = docs
      .select(col(idCol).as("id"), tokenHashes(col(textCol)).as("hs"))
      .select(col("id"), simhashFromHashes(col("hs")).as("sig"))
    val banded = sigs.select(col("id"), col("sig"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        shr(col("sig"), b * bandBits)
          .bitwiseAND((1L << bandBits) - 1))))
      .toDF("id", "sig", "band", "bits")
    val l = banded.toDF("id_a", "sig_a", "band_a", "bits_a")
    val r = banded.toDF("id_b", "sig_b", "band_b", "bits_b")
    l.join(r, col("band_a") === col("band_b") &&
        col("bits_a") === col("bits_b") && col("id_a") < col("id_b"))
      .withColumn("dist", hamming(col("sig_a"), col("sig_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist").distinct()
  }
}
