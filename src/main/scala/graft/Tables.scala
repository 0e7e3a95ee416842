package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All timestamps are normalized to Spark `TimestampType` (microsecond
  * precision, session timezone pinned UTC) — the same resolution MEOS uses
  * for `timestamptz` (reference: `meos/src/temp.rs:50-52` returns i64 epoch
  * micros). The `events` table is stored as parquet `timestamp[ns]`, which
  * Spark 4 refuses to read natively; we read it as nanos-long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros with
  * integer division — identical semantics to DuckDB's ns→us read-time
  * truncation, so the oracle sees the same instants.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` as TimestampType (micros, truncated from ns). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      // `div` (integer division) — a double division would lose precision at
      // ~1.7e18 ns magnitudes (doubles carry 53 bits).
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
}
