package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.tokens

/** Context-window preparation: fixed-size token chunking with overlap,
  * and token-budget bin packing — the two steps between a curated
  * corpus and a training batch.
  *
  * Chunking is per-row (explode over chunk starts — codegen'd, no
  * shuffle); packing is a running-sum window over a deterministic
  * order. Packing is sequential by nature, so the scale path shards
  * first (`shardCols`) and packs within shards — one shuffle on the
  * shard key, bins never span shards.
  */
object Chunker {

  /** One row per (doc, chunk): tokens sliced into `chunkSize`-token
    * windows every `stride` tokens (overlap = chunkSize - stride).
    * The final chunk may be short; empty documents yield no chunks.
    * Output: idCol, chunk_id (0-based), toks (the chunk's tokens). */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val n = size(col("__t"))
    // last chunk start index k*stride with k = ceil(max(n-size,0)/stride)
    val kmax = floor((greatest(n - chunkSize, lit(0)) + (stride - 1))
      / stride).cast("int")
    docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(n > 0)
      .withColumn("chunk_id", explode(sequence(lit(0), kmax)))
      .select(col(idCol), col("chunk_id"),
        slice(col("__t"), col("chunk_id") * stride + 1, lit(chunkSize))
          .as("toks"))
  }

  /** Running-sum bin packing: rows ordered by `orderCols` accumulate
    * `weightCol`, and a row lands in bin floor(startOffset / budget)
    * where startOffset is the cumulative weight before it. Bins are
    * capacity-approximate — over-filled by at most one row's weight —
    * which is the trade every distributed packer makes: exact
    * first-fit is inherently sequential, the offset form is ONE
    * window pass. `shardCols` bounds the sort: one shuffle on the
    * shard key, bins never span shards (at scale, always shard). */
  def packBins(rows: DataFrame, orderCols: Seq[Column], weightCol: String,
      budget: Long, shardCols: Seq[String] = Nil): DataFrame = {
    val w = (if (shardCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(shardCols.map(col).toIndexedSeq: _*))
      .orderBy(orderCols.toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(weightCol)) / budget).cast("long"))
      .drop("__cum")
  }
}
