package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registry for the driver's parquet tables (see TESTDATA.md).
  *
  * The reference loads xlsx batches + remote lookup tables
  * (capital_sendas.py:63-99); here every source is a columnar scan so
  * Catalyst can push filters/projections into the reader. At cluster
  * scale these would be partitioned parquet/iceberg paths; the API is
  * the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table carries TIMESTAMP(NANOS) parquet, which Spark
    // only reads as a nanos LONG (spark.sql.legacy.parquet.nanosAsLong
    // — set by Verify/Bench/specs); normalize to a micros timestamp so
    // downstream logic sees TimestampType (DuckDB truncates ns→us the
    // same way).
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
