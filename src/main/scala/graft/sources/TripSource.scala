package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meos.MeosFunctions

/** Reads the JSON-lines trip envelope back into temporal values — the
  * inverse of [[TripSink.writeJsonLines]] (and of the reference's file
  * sink, `meos/examples/04_to_file.rs:131-144`): each line
  * `{"id":…,"vt":…,"json":<hexwkb>}` decodes to (id, vt, trip struct).
  * Closes the loop: a trip file written by this engine (or by the
  * reference with our WKB layout) is a first-class source again.
  */
object TripSource {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("vt", IntegerType),
    StructField("json", StringType)))

  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(envelopeSchema).json(path)
      .select(col("id"), col("vt"),
        MeosFunctions.tgeompointFromHexWkb(col("json")).as("trip"))
}
