package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs batched per partition.
  *
  * The decode itself is STUBBED (this container has no image/audio
  * codecs): [[fakeDecode]] derives a deterministic feature vector from
  * the bytes (length + md5-seeded values), so the Spark-side plumbing
  * — schema, batching, partitioning, spill behavior — is real and
  * testable while the codec is a drop-in replacement. In production
  * the stub body is swapped for an actual decoder (e.g. via JNI or a
  * `mapInPandas`-style Python worker); nothing else changes.
  */
object Multimodal {

  /** Canonical multimodal record schema: id + modality + raw payload +
    * typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))), nullable = true)))

  /** Wrap a text/binary-bearing DataFrame into the media schema.
    * `bytesCol` may be string (cast) or binary. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String,
      modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(bytesCol).cast("binary").as("content"),
      struct(
        length(col(bytesCol).cast("binary")).cast("long").as("n_bytes"),
        lit(mime).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("meta"))

  /** Deterministic stand-in for a real decoder: 8 pseudo-features from
    * the payload's md5. Pure Column expressions so the "decode" stays
    * inside codegen; a real codec would swap this for a per-partition
    * batched call. */
  def fakeDecode(content: org.apache.spark.sql.Column, dim: Int = 8)
      : org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      conv(substring(md5(concat(hex(content), i.cast("string"))), 1, 8),
        16, 10).cast("double") / lit(4294967296.0))

  /** Batched per-partition feature extraction over the media schema —
    * the shape a real decoder plugs into: one iterator pass, bounded
    * memory, no driver involvement. Emits (media_id, n_bytes,
    * feat_mean) from the stub decode. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val narrow: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
    narrow.mapPartitions { it =>
      it.map { case (id, bytes) =>
        // stub decode: byte-sum + length stand in for codec output
        val b = if (bytes == null) Array.emptyByteArray else bytes
        var s = 0L
        var i = 0
        while (i < b.length) { s += (b(i) & 0xff); i += 1 }
        (id, b.length.toLong,
          if (b.length == 0) 0.0 else s.toDouble / b.length / 255.0)
      }
    }.toDF("media_id", "n_bytes", "feat_mean")
  }
}
