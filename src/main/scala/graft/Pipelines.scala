package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.meos.{Assembly, MeosFunctions, Temporal}
import graft.sources.TripSink

/** End-to-end pipelines — the reference's two entry points as single
  * declarative plans (SURVEY.md §3.1/§3.2): both `ais_to_db` and
  * `04_to_file` share one engine path here, proving the lifecycle claim.
  */
object Pipelines {

  /** scan → project → group-by-vessel → assemble (dedupe/monotonic inside
    * the UDAF) → HAVING min-trip-size → per-vessel trip struct with
    * vessel-type last-value (A7: deterministic `max_by`-style) —
    * the shared core of both reference pipelines.
    *
    * Input: canonical posit frame (mmsi, t, lat, lon, vt) from
    * [[graft.sources.AisCsv]] or any equivalent projection.
    */
  def assembleTrips(posits: DataFrame, minTripSize: Int = 1,
                    maxTripSize: Int = 0): DataFrame = {
    val asm = Assembly.tpointAssemble(maxTripSize)
    // content-derived tiebreak: stable across runs and partitionings
    // (unlike monotonically_increasing_id); rows identical in content sort
    // identically, so any winner is the same row
    val tie = xxhash64(col("t"), col("lon"), col("lat"), col("vt"))
    posits
      .withColumn("seq", tie)
      .withColumn("rn2", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("mmsi")
          .orderBy(desc("t"), desc("seq"))))
      .groupBy("mmsi")
      .agg(
        asm(unix_micros(col("t")), col("seq"), col("lon"), col("lat"))
          .as("s"),
        max(when(col("rn2") === 1, col("vt"))).as("vt"))
      .where(col("s.n") >= minTripSize)
      .select(col("mmsi"), col("vt"), col("s"),
        Assembly.tpointVal(col("s")).as("trip"))
  }

  /** `04_to_file` (§3.2): trips → JSON-lines `{"id":…,"vt":…,"json":…}`
    * with hex-WKB or MF-JSON payload (`04_to_file.rs:131-144`). */
  def aisToFile(posits: DataFrame, path: String, minTripSize: Int = 1,
                asMfJson: Boolean = false): DataFrame = {
    val trips = assembleTrips(posits, minTripSize)
    val payload: Column =
      if (asMfJson) MeosFunctions.tgeompointAsMfJson(col("trip"))
      else MeosFunctions.tgeompointAsHexWkb(col("trip"))
    TripSink.writeJsonLines(trips, col("mmsi"), col("vt"), payload, path)
    trips
  }
}
