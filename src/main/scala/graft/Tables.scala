package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-supplied synthetic tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read the
  * parquet tables below. Filters/projections applied by callers are pushed
  * into the parquet scan by Catalyst (verify with `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  /** Loads a table, normalizing TIMESTAMP_NTZ parquet columns (how Spark 4
    * reads these pandas-written files) to session-TZ TIMESTAMP. Session TZ
    * is pinned UTC, so the wall-clock values are unchanged and match what
    * DuckDB sees. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` has been written with three different `ts` encodings
    * across driver testdata regenerations: nanosecond int64, microsecond
    * TIMESTAMP_NTZ, and microsecond TIMESTAMP_LTZ. Normalize all three to a
    * session-TZ microsecond TIMESTAMP so downstream `unix_micros(ts)` /
    * `cast(ts as bigint)` consumers work regardless of which shape the
    * current files use. Session TZ is pinned UTC, so wall-clock values (and
    * DuckDB agreement) are unchanged in every case.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division, NOT col/1000 (double division loses 1 µs on
        // ~12% of epoch-nano values — beyond double's 53-bit exact range)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
