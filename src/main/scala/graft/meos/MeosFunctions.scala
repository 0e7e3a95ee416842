package graft.meos

import java.time.Instant

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level API + SQL registration for the MEOS value algebra — the
  * UDF/UDAF surface of SURVEY.md §2.10. Parse/print/codec functions are
  * scalar UDFs over the open struct encodings (v1; promotion to codegen'd
  * Catalyst `Expression`s is the §7.1/PR-4 perf path if BENCH demands).
  *
  * SQL names mirror the MEOS C entry points the reference binds:
  * `tgeompoint_in` (`meos/src/tinst.rs:24`), `tsequence_out` →
  * `tgeompoint_out` (`tseq.rs:66-72`), `temporal_as_mfjson`
  * (`temp.rs:17-19`), `temporal_as_wkb`/`temporal_as_hexwkb`
  * (`temp.rs:21-38`), `tbox_in`/`tbox_out` (`tbox.rs:73-85,66-71`),
  * `stbox_in`/`stbox_out` (`stbox.rs:69-81,62-67`).
  */
object MeosFunctions {

  import TGeom.{GInst, GSeq, Val}
  import BoxText.{Span, STBoxV, TBoxV}

  // ---- Row → model reconstruction (UDF struct inputs arrive as Rows) ------

  private def instFromRow(r: Row): GInst = {
    // z is optional in the instant struct: columns built by the 2-D
    // assembly path carry no z field at all, parsed values carry a
    // nullable one — tolerate both shapes
    val z =
      if (r.schema != null && r.schema.fieldNames.contains("z"))
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue)
      else None
    GInst(r.getAs[java.sql.Timestamp]("t").toInstant,
      r.getAs[Double]("x"), r.getAs[Double]("y"), z)
  }

  private def seqFromRow(r: Row): GSeq =
    GSeq(r.getAs[scala.collection.Seq[Row]]("instants").map(instFromRow).toSeq,
      r.getAs[Int]("interp"), r.getAs[Boolean]("lower_inc"),
      r.getAs[Boolean]("upper_inc"))

  private def valFromRow(r: Row): Val =
    Val(r.getAs[Int]("subtype"), r.getAs[Int]("srid"), r.getAs[Int]("interp"),
      r.getAs[scala.collection.Seq[Row]]("sequences").map(seqFromRow).toSeq)

  private def spanDFromRow(r: Row): Span[Double] =
    Span(r.getAs[Double]("lo"), r.getAs[Double]("hi"),
      r.getAs[Boolean]("lo_inc"), r.getAs[Boolean]("hi_inc"))

  private def spanTFromRow(r: Row): Span[Instant] =
    Span(r.getAs[java.sql.Timestamp]("lo").toInstant,
      r.getAs[java.sql.Timestamp]("hi").toInstant,
      r.getAs[Boolean]("lo_inc"), r.getAs[Boolean]("hi_inc"))

  private def tboxFromRow(r: Row): TBoxV =
    TBoxV(Option(r.getAs[Row]("value")).map(spanDFromRow),
      Option(r.getAs[Row]("time")).map(spanTFromRow))

  private def stboxFromRow(r: Row): STBoxV =
    STBoxV(r.getAs[Int]("srid"),
      r.getAs[Double]("xmin"), r.getAs[Double]("ymin"),
      r.getAs[Double]("xmax"), r.getAs[Double]("ymax"),
      Option(r.getAs[java.lang.Double]("zmin")).map(_.doubleValue),
      Option(r.getAs[java.lang.Double]("zmax")).map(_.doubleValue),
      r.getAs[Boolean]("hasXY"),
      Option(r.getAs[Row]("time")).map(spanTFromRow))

  // ---- UDFs ----------------------------------------------------------------

  private val parseUdf = udf((wkt: String) => TGeom.parse(wkt))
  // dirty-data path: null instead of raising (cf. Spark's try_* family) —
  // at 100 TB a single malformed literal must not fail the job
  private val tryParseUdf = udf((wkt: String) =>
    scala.util.Try(TGeom.parse(wkt)).toOption)
  // guarded subtype constructors (TInst/TSeq/TSet::from_wkt with the
  // WrongTemporalType check, tinst.rs:32 / tseq.rs:36 / tset.rs:36)
  private val parseInstUdf = udf((wkt: String) => TGeom.parseInst(wkt))
  private val parseSeqUdf = udf((wkt: String) => TGeom.parseSeq(wkt))
  private val parseSetUdf = udf((wkt: String) => TGeom.parseSet(wkt))
  // tsequence_make's normalize=true path as a standalone op
  private val normalizeUdf = udf((v: Row) => TGeom.normalize(valFromRow(v)))
  /** The Spark session timezone at eval time — MEOS prints timestamptz
    * session-locally (golden `2001-01-01 00:00:00-05`, tbox.rs:138).
    * SQLConf.get is propagated to executors with each task, so this is
    * cluster-correct, not just local-mode. */
  private def sessionZone: java.time.ZoneId =
    java.time.ZoneId.of(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  private val printUdf = udf((v: Row, maxdd: Int) =>
    TGeom.print(valFromRow(v), maxdd, sessionZone))
  // full reference surface: temporal_as_mfjson(temp, with_bbox, variant,
  // precision, srs) — variant bit0 spaced, bit1 pretty (json-c flags;
  // the raw test passes 3, tests/01_hello_world.rs:18)
  private val mfJsonUdf = udf(
    (v: Row, withBbox: Boolean, variant: Int, precision: Int, srs: String) =>
      TGeom.toMfJson(valFromRow(v), withBbox, precision, variant, srs,
        sessionZone))
  // default binary codec = MobilityDB-layout extended WKB (MobilityWkb);
  // the round-1 self-described layout stays reachable as *_legacy
  // MF-JSON parse leg (no reference counterpart — the reference only
  // prints, temp.rs:17-19; this closes the codec matrix)
  private val fromMfJsonUdf = udf((s: String) => TGeom.fromMfJson(s))
  private val wkbUdf = udf((v: Row) => TGeom.toWkb(valFromRow(v)))
  private val hexWkbUdf = udf((v: Row) => TGeom.toHexWkb(valFromRow(v)))
  private val fromWkbUdf = udf((b: Array[Byte]) => TGeom.fromWkb(b))
  private val fromHexWkbUdf = udf((s: String) => TGeom.fromHexWkb(s))
  private val wkbLegacyUdf = udf((v: Row) => TGeom.toWkbLegacy(valFromRow(v)))
  private val hexWkbLegacyUdf =
    udf((v: Row) => TGeom.toHexWkbLegacy(valFromRow(v)))
  private val fromWkbLegacyUdf =
    udf((b: Array[Byte]) => TGeom.fromWkbLegacy(b))
  private val fromHexWkbLegacyUdf =
    udf((s: String) => TGeom.fromHexWkbLegacy(s))

  case class XY(x: Double, y: Double)
  private val valueAtUdf = udf((v: Row, at: java.sql.Timestamp) =>
    TGeom.valueAt(valFromRow(v), at.toInstant).map(p => XY(p._1, p._2)))

  private val tboxInUdf =
    udf((wkt: String) => BoxText.parseTBox(wkt, sessionZone))
  private val tboxOutUdf = udf((b: Row, maxdd: Int) =>
    BoxText.printTBox(tboxFromRow(b), maxdd, sessionZone))
  private val stboxInUdf =
    udf((wkt: String) => BoxText.parseSTBox(wkt, sessionZone))
  private val stboxOutUdf = udf((b: Row, maxdd: Int) =>
    BoxText.printSTBox(stboxFromRow(b), maxdd, sessionZone))
  private val tboxFromIntUdf = udf((i: Int) => BoxText.tboxFromInt(i))

  private val tboxContainsUdf = udf((a: Row, b: Row) =>
    BoxText.tboxContains(tboxFromRow(a), tboxFromRow(b)))
  private val tboxOverlapsUdf = udf((a: Row, b: Row) =>
    BoxText.tboxOverlaps(tboxFromRow(a), tboxFromRow(b)))
  private val tboxSameUdf = udf((a: Row, b: Row) =>
    BoxText.tboxSame(tboxFromRow(a), tboxFromRow(b)))
  private val stboxContainsUdf = udf((a: Row, b: Row) =>
    BoxText.stboxContains(stboxFromRow(a), stboxFromRow(b)))
  private val stboxOverlapsUdf = udf((a: Row, b: Row) =>
    BoxText.stboxOverlaps(stboxFromRow(a), stboxFromRow(b)))
  private val stboxSameUdf = udf((a: Row, b: Row) =>
    BoxText.stboxSame(stboxFromRow(a), stboxFromRow(b)))

  // ---- Column API ----------------------------------------------------------

  def tgeompointIn(wkt: Column): Column = parseUdf(wkt)
  def tgeompointTryIn(wkt: Column): Column = tryParseUdf(wkt)
  def tgeompointInstIn(wkt: Column): Column = parseInstUdf(wkt)
  def tgeompointSeqIn(wkt: Column): Column = parseSeqUdf(wkt)
  def tgeompointSeqSetIn(wkt: Column): Column = parseSetUdf(wkt)
  def tgeompointNormalize(v: Column): Column = normalizeUdf(v)
  def tgeompointOut(v: Column, maxdd: Int = 15): Column =
    printUdf(v, lit(maxdd))
  def tgeompointAsMfJson(v: Column, withBbox: Boolean = true,
                         precision: Int = 6, variant: Int = 0,
                         srs: String = null): Column =
    mfJsonUdf(v, lit(withBbox), lit(variant), lit(precision),
      lit(srs).cast("string"))
  def tgeompointFromMfJson(s: Column): Column = fromMfJsonUdf(s)
  def tgeompointAsWkb(v: Column): Column = wkbUdf(v)
  def tgeompointAsHexWkb(v: Column): Column = hexWkbUdf(v)
  def tgeompointFromWkb(b: Column): Column = fromWkbUdf(b)
  def tgeompointFromHexWkb(s: Column): Column = fromHexWkbUdf(s)
  def tgeompointAsWkbLegacy(v: Column): Column = wkbLegacyUdf(v)
  def tgeompointAsHexWkbLegacy(v: Column): Column = hexWkbLegacyUdf(v)
  def tgeompointFromWkbLegacy(b: Column): Column = fromWkbLegacyUdf(b)
  def tgeompointFromHexWkbLegacy(s: Column): Column = fromHexWkbLegacyUdf(s)
  def tgeompointValueAt(v: Column, at: Column): Column = valueAtUdf(v, at)

  /** Deep value equality (`temporal_eq`, guarded by same-subtype check in
    * the reference, `tinst.rs:53-57`): the struct encoding makes Spark's
    * native equality exactly value equality, subtype tag included. */
  def temporalEq(a: Column, b: Column): Column = a === b

  def tboxIn(wkt: Column): Column = tboxInUdf(wkt)
  def tboxOut(b: Column, maxdd: Int = 6): Column = tboxOutUdf(b, lit(maxdd))
  def stboxIn(wkt: Column): Column = stboxInUdf(wkt)
  def stboxOut(b: Column, maxdd: Int = 6): Column = stboxOutUdf(b, lit(maxdd))
  def tboxFromInt(i: Column): Column = tboxFromIntUdf(i)
  def tboxContainsW(a: Column, b: Column): Column = tboxContainsUdf(a, b)
  def tboxOverlapsW(a: Column, b: Column): Column = tboxOverlapsUdf(a, b)
  def tboxSameW(a: Column, b: Column): Column = tboxSameUdf(a, b)
  def stboxContainsW(a: Column, b: Column): Column = stboxContainsUdf(a, b)
  def stboxOverlapsW(a: Column, b: Column): Column = stboxOverlapsUdf(a, b)
  def stboxSameW(a: Column, b: Column): Column = stboxSameUdf(a, b)

  // temporal accessors over the codec Val struct (SQL-facing; the MEOS
  // names the reference binds: temporal_start_timestamptz, temp.rs:50-52)
  // Timestamp.from preserves the full µs precision of the Instant —
  // toEpochMilli would silently truncate sub-ms start timestamps while the
  // engine (and MEOS temporal_start_timestamptz) is µs-resolution.
  private val startTsUdf = udf((v: Row) =>
    java.sql.Timestamp.from(valFromRow(v).sequences.head.instants.head.t))
  private val numInstantsUdf = udf((v: Row) =>
    valFromRow(v).sequences.map(_.instants.size).sum)

  def tgeompointStartTs(v: Column): Column = startTsUdf(v)
  def tgeompointNumInstants(v: Column): Column = numInstantsUdf(v)

  /** Register the whole surface for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("tgeompoint_start_timestamptz", startTsUdf)
    spark.udf.register("tgeompoint_num_instants", numInstantsUdf)
    spark.udf.register("tgeompoint_in", parseUdf)
    spark.udf.register("tgeompoint_try_in", tryParseUdf)
    spark.udf.register("tgeompoint_inst_in", parseInstUdf)
    spark.udf.register("tgeompoint_seq_in", parseSeqUdf)
    spark.udf.register("tgeompoint_seqset_in", parseSetUdf)
    spark.udf.register("tgeompoint_normalize", normalizeUdf)
    spark.udf.register("tgeompoint_out", printUdf)
    spark.udf.register("tgeompoint_as_mfjson", mfJsonUdf)
    spark.udf.register("tgeompoint_as_wkb", wkbUdf)
    spark.udf.register("tgeompoint_as_hexwkb", hexWkbUdf)
    spark.udf.register("tgeompoint_from_wkb", fromWkbUdf)
    spark.udf.register("tgeompoint_from_hexwkb", fromHexWkbUdf)
    spark.udf.register("tgeompoint_as_wkb_legacy", wkbLegacyUdf)
    spark.udf.register("tgeompoint_as_hexwkb_legacy", hexWkbLegacyUdf)
    spark.udf.register("tgeompoint_from_wkb_legacy", fromWkbLegacyUdf)
    spark.udf.register("tgeompoint_from_hexwkb_legacy", fromHexWkbLegacyUdf)
    spark.udf.register("tgeompoint_value_at", valueAtUdf)
    spark.udf.register("tbox_in", tboxInUdf)
    spark.udf.register("tbox_out", tboxOutUdf)
    spark.udf.register("stbox_in", stboxInUdf)
    spark.udf.register("stbox_out", stboxOutUdf)
    spark.udf.register("tbox_from_int", tboxFromIntUdf)
    spark.udf.register("tbox_contains", tboxContainsUdf)
    spark.udf.register("tbox_overlaps", tboxOverlapsUdf)
    spark.udf.register("tbox_same", tboxSameUdf)
    spark.udf.register("stbox_contains", stboxContainsUdf)
    spark.udf.register("stbox_overlaps", stboxOverlapsUdf)
    spark.udf.register("stbox_same", stboxSameUdf)
  }
}
