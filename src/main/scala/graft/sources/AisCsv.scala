package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NOAA/MarineCadastre-style AIS CSV source — the reference's primary
  * input (serde aliases `meos/examples/04_to_file.rs:11-23`; Polars
  * header scan `meos-polars/examples/ais_to_db.rs:118-120`; dir-glob walk
  * `:100-115`).
  *
  * Spark's multi-path CSV reader subsumes the reference's hand-rolled
  * directory walk (a directory path IS a valid source), and schema-on-read
  * replaces the serde struct. Projection + rename + null-default mirror
  * `ais_to_db.rs:123-128` / `04_to_file.rs:21-23`.
  */
object AisCsv {

  /** The declared schema (FIXTURES.md A1). */
  val schema: StructType = StructType(Seq(
    StructField("MMSI", LongType),
    StructField("BaseDateTime", StringType),
    StructField("LAT", DoubleType),
    StructField("LON", DoubleType),
    StructField("VesselType", IntegerType)))

  /** Read one file or a directory of CSVs into the canonical posit frame:
    * (mmsi, t, lat, lon, vt) — timestamps parsed with the reference's
    * pinned UTC offset (`{t}+00`, `04_to_file.rs:147`), VesselType
    * null-defaulted to 0 (`04_to_file.rs:21-23`). */
  def read(spark: SparkSession, paths: String*): DataFrame =
    project(spark.read
      .option("header", "true")
      .schema(schema)
      .csv(paths: _*))

  /** `--limit` knob (`04_to_file.rs:81`: `take(limit)` input rows). */
  def readLimited(spark: SparkSession, limit: Int, paths: String*): DataFrame =
    read(spark, paths: _*).limit(limit)

  private def project(df: DataFrame): DataFrame = df.select(
    col("MMSI").as("mmsi"),
    to_timestamp(concat(col("BaseDateTime"), lit("+00")),
      "yyyy-MM-dd'T'HH:mm:ssX").as("t"),
    col("LAT").as("lat"),
    col("LON").as("lon"),
    coalesce(col("VesselType"), lit(0)).as("vt"))

  /** Structured-Streaming file source over the same directory layout: new
    * CSVs dropped into `dir` become micro-batches — the streaming twin of
    * the reference's batch directory walk, feeding
    * [[graft.streaming.StreamingAssembly]] unchanged. */
  def readStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 10): DataFrame =
    project(spark.readStream
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema)
      .csv(dir))
}
