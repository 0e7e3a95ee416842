package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.meos.{MeosFunctions, TGeom}
import graft.sources.AisCsv

/** End-to-end lifecycle: AIS CSV (the reference's real input format,
  * FIXTURES.md A1) → canonical posits → trajectory assembly → JSON-lines
  * sink with hex-WKB payload → decode and verify (§3.1/§3.2 round trip). */
class PipelineSpec extends SparkTestBase {

  private val csv =
    """MMSI,BaseDateTime,LAT,LON,VesselType
      |367000001,2024-01-01T00:00:00,29.95,-90.06,70
      |367000001,2024-01-01T00:01:00,29.96,-90.05,70
      |367000001,2024-01-01T00:01:00,29.96,-90.05,70
      |367000001,2024-01-01T00:00:30,29.99,-90.99,70
      |367000002,2024-01-01T00:00:30,27.10,-82.45,
      |""".stripMargin

  private def writeCsv(): String = {
    val dir = Files.createTempDirectory("ais")
    Files.writeString(dir.resolve("a.csv"), csv)
    dir.toString
  }

  test("AIS csv source: header schema, ts parse with +00, null-default vt") {
    val df = AisCsv.read(spark, writeCsv())
    assert(df.count() == 5)
    val r = df.where(col("mmsi") === 367000002L).collect()(0)
    assert(r.getAs[Int]("vt") == 0) // VesselType null → 0
    assert(r.getAs[java.sql.Timestamp]("t").toInstant ==
      TGeom.parseTs("2024-01-01 00:00:30"))
  }

  test("aisToFile: full pipeline to JSON-lines, hexwkb payload decodes " +
    "back to the assembled trip") {
    import spark.implicits._
    val out = Files.createTempDirectory("trips").toString + "/out"
    val trips = Pipelines.aisToFile(AisCsv.read(spark, writeCsv()), out)
    // dup-ts posit dropped: vessel 1 keeps 3 instants (00:00, 00:00:30,
    // 00:01), vessel 2 keeps 1
    val byId = trips.select(col("mmsi"), col("s.n").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(367000001L -> 3L, 367000002L -> 1L))

    val lines = spark.read.json(out)
    assert(lines.count() == 2)
    val hex = lines.where(col("id") === 367000001L)
      .select("json").as[String].collect()(0)
    val decoded = TGeom.fromHexWkb(hex)
    assert(decoded.subtype == TGeom.SubSequence)
    assert(decoded.srid == 4326)
    assert(decoded.sequences.head.instants.map(i => (i.x, i.y)) ==
      Seq((-90.06, 29.95), (-90.99, 29.99), (-90.05, 29.96)))
    // WKT print of the decoded trip is the ingest-form literal
    val wkt = TGeom.print(decoded)
    assert(wkt.startsWith("SRID=4326;[POINT(-90.06 29.95)@2024-01-01 00:00:00+00"))
  }

  test("aisToFile with MF-JSON payload") {
    import spark.implicits._
    val out = Files.createTempDirectory("tripsmf").toString + "/out"
    Pipelines.aisToFile(AisCsv.read(spark, writeCsv()), out, asMfJson = true)
    val j = spark.read.json(out).where(col("id") === 367000001L)
      .select("json").as[String].collect()(0)
    assert(j.contains("\"type\":\"MovingGeomPoint\""))
    assert(j.contains("\"interpolation\":\"Linear\""))
  }

  test("trip file written by the sink reads back as temporal values " +
    "(sink→source loop)") {
    val out = Files.createTempDirectory("loop").toString + "/out"
    val written = Pipelines.aisToFile(AisCsv.read(spark, writeCsv()), out)
    val back = graft.sources.TripSource.readJsonLines(spark, out)
      .select(col("id"),
        graft.meos.MeosFunctions.tgeompointNumInstants(col("trip")).as("n"),
        graft.meos.MeosFunctions.tgeompointOut(col("trip")).as("wkt"))
    val byId = back.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orig = written.select(col("mmsi"), col("s.n").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.view.mapValues(_.toLong).toMap == orig)
  }

  test("try-parse tolerates dirty WKT (nulls, not job failure)") {
    import spark.implicits._
    val r = Seq("POINT(1 1)@2000-01-01", "GARBAGE", null)
      .toDF("wkt")
      .select(graft.meos.MeosFunctions.tgeompointTryIn(col("wkt")).as("v"))
      .collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0) && r(2).isNullAt(0))
  }

  test("entry flagship still runs after pipeline refactors") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("tpointVal struct is accepted by every codec UDF") {
    val ais = AisCsv.read(spark, writeCsv())
    val trips = Pipelines.assembleTrips(ais)
    val r = trips.select(
      MeosFunctions.tgeompointOut(col("trip")).as("wkt"),
      MeosFunctions.tgeompointAsMfJson(col("trip")).as("mf"),
      MeosFunctions.tgeompointAsHexWkb(col("trip")).as("hex")).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[String]("wkt").contains("@"))
      assert(row.getAs[String]("mf").contains("datetimes"))
      assert(row.getAs[String]("hex").nonEmpty)
    }
  }
}
