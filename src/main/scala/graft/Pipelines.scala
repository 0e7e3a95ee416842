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
    * vessel-type last-value (A7: deterministic `max_by`) —
    * the shared core of both reference pipelines.
    *
    * Assembly goes through the salted two-phase path (SkewSpec-proven
    * equal to single-phase): the reference's "mega-vessel" case — one MMSI
    * carrying a huge share of the posits — spreads over `salts` reducers
    * in phase 1 instead of concentrating one reducer's heap; phase 2
    * linearly merges the pre-sorted partials. The vessel-type last-value
    * is a plain `max_by` aggregate (map-side combinable, skew-immune).
    *
    * Input: canonical posit frame (mmsi, t, lat, lon, vt) from
    * [[graft.sources.AisCsv]] or any equivalent projection.
    */
  def assembleTrips(posits: DataFrame, minTripSize: Int = 1,
                    maxTripSize: Int = 0, salts: Int = 16): DataFrame = {
    // content-derived tiebreak: stable across runs and partitionings
    // (unlike monotonically_increasing_id); rows identical in content sort
    // identically, so any winner is the same row
    val withTie = posits.withColumn("seq",
      xxhash64(col("t"), col("lon"), col("lat"), col("vt")))
    val trips = Assembly.tpointAssembleSalted(withTie,
      col("mmsi"), unix_micros(col("t")), col("seq"),
      col("lon"), col("lat"), salts = salts, maxSize = maxTripSize)
    val vtLast = withTie.groupBy("mmsi")
      .agg(max_by(col("vt"), struct(col("t"), col("seq"))).as("vt"))
    trips.join(vtLast, trips("k") === vtLast("mmsi"))
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
