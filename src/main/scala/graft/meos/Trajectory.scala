package graft.meos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Trajectory analytics over assembled sequences — derived measures a
  * MobilityDB user computes on `tgeompoint` trips (duration, path length,
  * speed; MEOS exposes these on the C `Temporal`). Pure array expressions
  * over the assembly output (epoch-micros + coordinate arrays): left-to-
  * right double folds, so every measure is oracle-reproducible.
  */
object Trajectory {

  /** Trip duration in (fractional) seconds: last t − first t. */
  def durationSec(t: Column): Column =
    (element_at(t, -1) - element_at(t, 1)).cast("double") / lit(1e6)

  /** Euclidean path length over consecutive 2-D points (planar — the
    * haversine variant drops in by swapping the step expression). */
  def pathLength(x: Column, y: Column): Column =
    when(size(x) >= 2, // sequence(0, -1) would descend on 1-posit trips
      aggregate(
        sequence(lit(0), size(x) - 2),
        lit(0.0),
        (acc, i) => {
          val dx = element_at(x, i + 2) - element_at(x, i + 1)
          val dy = element_at(y, i + 2) - element_at(y, i + 1)
          acc + sqrt(dx * dx + dy * dy)
        })).otherwise(lit(0.0))

  /** Geodesic path length in meters over (lon, lat) WGS-84 posits —
    * haversine per segment (the ingest stamps SRID=4326, so AIS trips are
    * lon/lat; planar [[pathLength]] is for projected/abstract coords). */
  def pathLengthMeters(lon: Column, lat: Column): Column = {
    val R = 6371008.8 // IUGG mean Earth radius
    when(size(lon) >= 2,
      aggregate(
        sequence(lit(0), size(lon) - 2),
        lit(0.0),
        (acc, i) => {
          val lat1 = radians(element_at(lat, i + 1))
          val lat2 = radians(element_at(lat, i + 2))
          val dLat = lat2 - lat1
          val dLon = radians(element_at(lon, i + 2)) -
            radians(element_at(lon, i + 1))
          val h = pow(sin(dLat / 2), 2) +
            cos(lat1) * cos(lat2) * pow(sin(dLon / 2), 2)
          acc + lit(2 * R) * asin(least(lit(1.0), sqrt(h)))
        })).otherwise(lit(0.0))
  }

  /** 1-D total variation (the tfloat analog of path length). */
  def totalVariation(v: Column): Column =
    when(size(v) >= 2,
      aggregate(
        sequence(lit(0), size(v) - 2),
        lit(0.0),
        (acc, i) => acc + abs(element_at(v, i + 2) - element_at(v, i + 1))))
      .otherwise(lit(0.0))

  /** Mean speed: path length / duration (null on zero/degenerate trips). */
  def avgSpeed(x: Column, y: Column, t: Column): Column =
    when(durationSec(t) > 0, pathLength(x, y) / durationSec(t))

  /** Largest time gap between consecutive posits, seconds — the measure
    * behind gap-based sequence splitting (a sequence set's raison d'être). */
  def maxGapSec(t: Column): Column =
    when(size(t) >= 2,
      aggregate(
        sequence(lit(0), size(t) - 2),
        lit(0L),
        (acc, i) => greatest(acc,
          element_at(t, i + 2) - element_at(t, i + 1)))
        .cast("double") / lit(1e6))

  case class GapSeg(seg: Int, t: Long, x: Double, y: Double)

  private val gapSegUdf =
    udf((t: Seq[Long], x: Seq[Double], y: Seq[Double], gapUs: Long) => {
      if (t == null) null
      else {
        // copy to arrays first: the Seq Spark hands a UDF is list-like —
        // indexed access is O(i), so looping t(i) directly is O(n²)
        val ta = t.toArray; val xa = x.toArray; val ya = y.toArray
        val out = Array.newBuilder[GapSeg]
        out.sizeHint(ta.length)
        var seg = 0
        var i = 0
        while (i < ta.length) {
          if (i > 0 && ta(i) - ta(i - 1) >= gapUs) seg += 1
          out += GapSeg(seg, ta(i), xa(i), ya(i))
          i += 1
        }
        out.result().toSeq
      }
    })

  /** Split one assembled (t, x, y) trip into maximal sub-sequences whose
    * internal gaps are < gapSec — producing the sequence-set shape
    * (`TSet`, `meos/src/tset.rs:10-13`: "set of disjoint sequences,
    * trajectory with gaps"). Returns array<struct<seg, t, x, y>>.
    *
    * A single linear pass carrying the running segment id (a UDF — array
    * expressions cannot carry per-element state without quadratic
    * recomputation or copying; the previous expression form did O(n²)
    * comparisons, 10¹⁰ on a 100k-posit mega-trip). Integer/long math only,
    * so results are exactly oracle-reproducible. */
  def gapSegments(t: Column, x: Column, y: Column, gapSec: Double): Column =
    gapSegUdf(t, x, y, lit((gapSec * 1e6).toLong))

  case class GapSegStat(seg: Int, n: Long, t0: Long, t1: Long,
                        xmin: Double, xmax: Double)

  private val gapSegStatsUdf =
    udf((t: Seq[Long], x: Seq[Double], gapUs: Long) => {
      if (t == null) null
      else {
        val ta = t.toArray; val xa = x.toArray
        val out = Array.newBuilder[GapSegStat]
        var seg = 0; var i = 0
        var n = 0L; var t0 = 0L; var t1 = 0L
        var xmin = 0.0; var xmax = 0.0
        while (i < ta.length) {
          if (i == 0 || ta(i) - ta(i - 1) >= gapUs) {
            if (n > 0) { out += GapSegStat(seg, n, t0, t1, xmin, xmax);
              seg += 1 }
            n = 0; t0 = ta(i); xmin = xa(i); xmax = xa(i)
          }
          n += 1; t1 = ta(i)
          if (xa(i) < xmin) xmin = xa(i)
          if (xa(i) > xmax) xmax = xa(i)
          i += 1
        }
        if (n > 0) out += GapSegStat(seg, n, t0, t1, xmin, xmax)
        out.result().toSeq
      }
    })

  /** Per-segment aggregates of the gap split in the SAME linear pass —
    * array<struct<seg, n, t0, t1, xmin, xmax>>, one element per segment.
    * Exactly the result of exploding [[gapSegments]] and re-aggregating
    * per (entity, seg) (integer/min/max math only — no float-sum order
    * sensitivity), but WITHOUT the per-posit explode: the downstream
    * shuffle carries one row per segment instead of one per posit, which
    * at 100 TB removes a full-data-volume exchange from the plan. */
  def gapSegmentStats(t: Column, x: Column, gapSec: Double): Column =
    gapSegStatsUdf(t, x, lit((gapSec * 1e6).toLong))
}
