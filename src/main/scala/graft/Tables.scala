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

  // csv timestamps must round-trip micros exactly (the default format
  // drops sub-millis)
  private val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Resolve `name` under `dir`: parquet if present (the fast path —
    * columnar, splittable, statistics), else csv/json staged by
    * [[stage]] with a `.schema` DDL sidecar (schema-exact — never
    * inference). Every driver query runs unchanged over any of the
    * three. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val pq = s"$dir/$name.parquet"
    if (new java.io.File(pq).exists()) {
      val df = spark.read.parquet(pq)
      // The events ts column has shipped as TIMESTAMP(NANOS) (read as a
      // nanos LONG under spark.sql.legacy.parquet.nanosAsLong — set by
      // Verify/Bench/specs) and as un-adjusted TIMESTAMP(MICROS) (read
      // as TIMESTAMP_NTZ since Spark infers NTZ when isAdjustedToUTC is
      // false). Normalize BOTH to a micros TimestampType here, the one
      // choke point every query loads through: downstream logic
      // (unix_micros, watermarks, windows) requires TimestampType. The
      // session TZ is pinned UTC, so the NTZ cast re-interprets the
      // wall-clock fields at the same instant DuckDB reads them.
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case Some(TimestampNTZType) =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => df
      }
    } else if (new java.io.File(s"$dir/$name.orc").exists()) {
      // ORC is self-describing and type-exact (arrays, timestamps at
      // micros) — no sidecar needed. Staged FROM the normalized frame,
      // so the events ts is already a micros TimestampType.
      spark.read.orc(s"$dir/$name.orc")
    } else {
      val ddlFile = java.nio.file.Paths.get(s"$dir/$name.schema")
      require(java.nio.file.Files.exists(ddlFile),
        s"Tables: no $name.parquet and no $name.schema sidecar in $dir")
      val ddl = java.nio.file.Files.readString(ddlFile)
      val csv = s"$dir/$name.csv"
      if (new java.io.File(csv).exists())
        // multiLine: staged text columns may carry embedded newlines;
        // a non-splittable read is acceptable for staged side inputs
        spark.read.schema(ddl).option("header", "true")
          .option("escape", "\"").option("multiLine", "true")
          .option("timestampFormat", tsFmt).csv(csv)
      else
        spark.read.schema(ddl).option("timestampFormat", tsFmt)
          .json(s"$dir/$name.json")
    }
  }

  /** Stage a table into `destDir` as csv or json with a schema DDL
    * sidecar, so [[apply]] reads it back schema-exact. csv cannot
    * carry array columns (embeddings) — use json for those. */
  def stage(spark: SparkSession, srcDir: String, name: String,
      destDir: String, format: String): Unit = {
    val df = apply(spark, srcDir, name)
    val w = df.write.mode("overwrite").option("timestampFormat", tsFmt)
    format match {
      case "csv" => w.option("header", "true").option("escape", "\"")
        .csv(s"$destDir/$name.csv")
      case "json" => w.json(s"$destDir/$name.json")
      case "orc" => w.orc(s"$destDir/$name.orc")
      case other => throw new IllegalArgumentException(
        s"Tables.stage: unsupported format $other")
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(destDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$destDir/$name.schema"), df.schema.toDDL)
  }

  /** Register every table under `dir` as a temp view, so the whole
    * surface is reachable through `spark.sql(...)` — the SQL front
    * door a reference user expects. Views are lazy: registration
    * costs nothing until a query reads one. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { name =>
      apply(spark, dir, name).createOrReplaceTempView(name)
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
