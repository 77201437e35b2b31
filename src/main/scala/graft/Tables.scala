package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the driver's test tables (TESTDATA.md).
  *
  * Every query function receives `(spark, sfDir)` and goes through here, so
  * schema quirks are handled exactly once:
  *
  *  - `events.ts` is parquet TIMESTAMP(NANOS); with
  *    `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a Long of
  *    epoch-nanos. We derive `ts_ms` (epoch millis, what the reference's
  *    epoch-day math uses — floor(unix_ms/86400000), see SURVEY §2.8) and
  *    `event_time` (micro-precision timestamp) once here. DuckDB reads the
  *    same column natively as a ns timestamp, so oracle SQL uses
  *    `epoch_ms(ts)` / `CAST(ts AS DATE)` for the same values.
  *  - all other date columns arrive as `timestamp_ntz` and are used as-is.
  *
  * At 100 TB these reads are partitioned parquet scans; nothing here caches
  * or collects, every frame stays a lazy scan with pushdown intact.
  */
final case class Tables(spark: SparkSession, dir: String) {

  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = load("region")
  def nation: DataFrame = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame = load("part")
  def orders: DataFrame = load("orders")
  def lineitem: DataFrame = load("lineitem")
  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** events with `ts` kept as epoch-nanos Long, plus derived columns. */
  def events: DataFrame = {
    val raw = load("events")
    // integer `div`, not `/`: epoch-nanos (~1.7e18) exceeds a double's 2^53
    // exact-integer range, so floating division would corrupt low bits.
    raw
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("event_time", expr("timestamp_micros(ts div 1000)"))
  }
}
