package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md) plus
  * shared money-arithmetic helpers.
  *
  * Money semantics follow the reference (`bean/OrderInfo.scala:6-28`:
  * Double dollars, `Math.round(x*100)/100d` cents rounding —
  * `dws/OrderWideApp.scala:162-164`). To make results reproducible across
  * engines (Spark vs the DuckDB oracle) we do money math in integer
  * *cents* (Long): deterministic, associative, overflow-safe at 100 TB
  * (max order ~5e7 cents × 1e9 rows still < 2^63 when summed as Long).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** Normalize `events.ts` to a plain session-TZ TIMESTAMP regardless of
    * how the corpus parquet encodes it. The testdata generator has
    * shipped two encodings so far:
    *   - TIMESTAMP(NANOS): Spark 4 reads it only as Long via
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    *     [[GraftSession]]); the corpus values are micro-resolution, so
    *     `div 1000` is lossless.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *     TIMESTAMP_NTZ, which `withWatermark` REJECTS at analysis
    *     ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]) — cast to the
    *     session-TZ type (sessions run UTC, so the instant is
    *     unchanged).
    * Every reader — batch loader, Bench stream sections, drive mains —
    * must go through here so a corpus re-encode can't strand one path. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Dollars (Double) → integer cents (Long). `round` first so the cast
    * truncation cannot flip a xxx.9999 repr down by one cent. */
  def cents(c: Column): Column = round(c * lit(100), 0).cast("long")

  /** Integer cents (Long) → dollars (Double); exact for |cents| < 2^53. */
  def dollars(c: Column): Column = c / lit(100.0)
}
