package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated parquet test data
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * the scale-factor dir passed to each query.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes
  * filters/projections into the scan (PushedFilters / ReadSchema),
  * so downstream operators should express selection declaratively
  * rather than materializing intermediates.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical layouts across driver
    * testdata generations: parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects (PARQUET_TYPE_ILLEGAL), so it is read
    * as raw nanos via legacy.parquet.nanosAsLong and rebuilt with
    * `ts div 1000` (exact long arithmetic; `/` would coerce to double
    * whose 53-bit mantissa cannot hold epoch-nanos, and the div
    * truncation matches DuckDB's native nanos→micros) — and plain
    * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ and the
    * UTC session casts to TIMESTAMP as a wall-clock identity (DuckDB
    * reads the same file as naive TIMESTAMP, so oracle values agree).
    * Dispatch on the read schema so both generations load exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
