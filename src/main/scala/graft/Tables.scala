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
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
    * (legacy.parquet.nanosAsLong) and rebuild a micros timestamp.
    * `ts div 1000` stays in exact long arithmetic (the `/` operator
    * coerces to double, whose 53-bit mantissa cannot represent
    * epoch-nanos exactly) and matches DuckDB's native nanos→micros
    * truncation, so oracle comparisons stay exact.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
