package graft

import java.time.Instant

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.meos.{BoxText, TGeom, Temporal}
import graft.meos.TGeom.{GInst, GSeq, Val}

/** Codec goldens ported from the reference tests, UTC-re-pinned where the
  * reference renders local time (SURVEY.md §7.3):
  * WKT grammars `meos/examples/01_hello_world.rs:8-56`, TBox goldens
  * `meos/src/tbox.rs:131-151`, STBox goldens `meos/src/stbox.rs:113-124`,
  * predicate truth tables `tbox.rs:153-195`.
  */
class CodecSpec extends SparkTestBase {

  private def roundtrip(in: String, expected: String): Unit = {
    val v = TGeom.parse(in)
    assert(TGeom.print(v) == expected)
    // print → parse → print is stable
    assert(TGeom.print(TGeom.parse(TGeom.print(v))) == expected)
  }

  test("six WKT literal grammars parse and print canonically") {
    roundtrip("POINT(1 1)@2000-01-01",
      "POINT(1 1)@2000-01-01 00:00:00+00")
    roundtrip("{POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02}",
      "{POINT(1 1)@2000-01-01 00:00:00+00, POINT(2 2)@2000-01-02 00:00:00+00}")
    roundtrip("[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]",
      "[POINT(1 1)@2000-01-01 00:00:00+00, POINT(2 2)@2000-01-02 00:00:00+00]")
    roundtrip("Interp=Step;[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]",
      "Interp=Step;[POINT(1 1)@2000-01-01 00:00:00+00, " +
        "POINT(2 2)@2000-01-02 00:00:00+00]")
    roundtrip("{[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02], " +
      "[POINT(3 3)@2000-01-03, POINT(3 3)@2000-01-04]}",
      "{[POINT(1 1)@2000-01-01 00:00:00+00, " +
        "POINT(2 2)@2000-01-02 00:00:00+00], " +
        "[POINT(3 3)@2000-01-03 00:00:00+00, " +
        "POINT(3 3)@2000-01-04 00:00:00+00]}")
    roundtrip("SRID=4326;Point(-90.06 29.95)@2024-01-01T00:00:00+00",
      "SRID=4326;POINT(-90.06 29.95)@2024-01-01 00:00:00+00")
  }

  test("subtype tags follow the parse shape (lib.rs:30-34)") {
    assert(TGeom.parse("POINT(1 1)@2000-01-01").subtype == TGeom.SubInstant)
    assert(TGeom.parse("{POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02}")
      .subtype == TGeom.SubSequence)
    assert(TGeom.parse("[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]")
      .subtype == TGeom.SubSequence)
    assert(TGeom.parse(
      "{[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02], " +
        "[POINT(3 3)@2000-01-03, POINT(3 3)@2000-01-04]}")
      .subtype == TGeom.SubSequenceSet)
  }

  test("bounds inclusivity survives parse/print") {
    val v = TGeom.parse("(POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]")
    assert(!v.sequences.head.`lower_inc` && v.sequences.head.`upper_inc`)
    assert(TGeom.print(v).startsWith("(") && TGeom.print(v).endsWith("]"))
  }

  test("TBox WKT goldens (tbox.rs:131-151, UTC-pinned)") {
    def go(in: String, out: String): Unit =
      assert(BoxText.printTBox(BoxText.parseTBox(in)) == out)
    go("TBOX X([1.1, 4.0))", "TBOXFLOAT X([1.1, 4))")
    go("TBOX XT((4, 12),[2001-01-01, 2001-10-01])",
      "TBOXFLOAT XT((4, 12),[2001-01-01 00:00:00+00, 2001-10-01 00:00:00+00])")
    go("TBOX XT([1.0, 4.0),[2001-01-01, 2001-01-02])",
      "TBOXFLOAT XT([1, 4),[2001-01-01 00:00:00+00, 2001-01-02 00:00:00+00])")
    go("TBOX T([2001-01-01, 2001-01-02])",
      "TBOX T([2001-01-01 00:00:00+00, 2001-01-02 00:00:00+00])")
  }

  test("STBox WKT goldens (stbox.rs:113-124)") {
    def go(in: String, out: String): Unit =
      assert(BoxText.printSTBox(BoxText.parseSTBox(in)) == out)
    go("STBOX X((1.0, 2.0), (3.0, 4.0))", "STBOX X((1,2),(3,4))")
    go("STBOX Z((1.0, 2.0, 3.0), (4.0, 5.0, 6.0))", "STBOX Z((1,2,3),(4,5,6))")
  }

  test("TBox predicate truth tables on parsed boxes (tbox.rs:153-195)") {
    def tb(s: String) = BoxText.parseTBox(s)
    val d12 = tb("TBOX T([2001-01-01, 2001-01-02])")
    val d12b = tb("TBOX T([2001-01-01, 2001-01-02])")
    val d13 = tb("TBOX T([2001-01-01, 2001-01-03])")
    val feb = tb("TBOX T([2001-02-01, 2001-02-02])")
    val y2 = tb("TBOX T([2001-01-01, 2002-01-02])")
    val d22 = tb("TBOX T([2001-01-02, 2001-01-02])")
    assert(BoxText.tboxContains(d12, d12b))
    assert(!BoxText.tboxContains(d12, d13))
    assert(BoxText.tboxOverlaps(d12, d12b))
    assert(BoxText.tboxOverlaps(d12, d13))
    assert(!BoxText.tboxOverlaps(d12, feb))
    assert(BoxText.tboxSame(d12, d12b))
    assert(!BoxText.tboxSame(d12, y2))
    assert(d12 == d12b)
    assert(d22 != d12)
  }

  test("half-open span semantics: [1,2) does not contain its open end") {
    val a = BoxText.parseTBox("TBOX X([1.0, 2.0))")
    val point2 = BoxText.parseTBox("TBOX X([2.0, 2.0])")
    val point15 = BoxText.parseTBox("TBOX X([1.5, 1.5])")
    assert(!BoxText.tboxContains(a, point2))
    assert(BoxText.tboxContains(a, point15))
    assert(!BoxText.tboxOverlaps(a, point2))
  }

  private val genVal: Gen[Val] = {
    val genInst = for {
      us <- Gen.choose(0L, 4102444800000000L)
      x <- Gen.choose(-180.0, 180.0)
      y <- Gen.choose(-90.0, 90.0)
    } yield GInst(Instant.ofEpochSecond(us / 1000000L, us % 1000000L * 1000L),
      x, y)
    for {
      subtype <- Gen.oneOf(TGeom.SubInstant, TGeom.SubSequence,
        TGeom.SubSequenceSet)
      srid <- Gen.oneOf(0, 4326)
      interp <- Gen.oneOf(Temporal.InterpStep, Temporal.InterpLinear)
      nseq <- Gen.choose(1, 3)
      insts <- Gen.listOfN(4, genInst)
      li <- Gen.oneOf(true, false)
      ui <- Gen.oneOf(true, false)
    } yield subtype match {
      case TGeom.SubInstant =>
        Val(subtype, srid, Temporal.InterpNone,
          Seq(GSeq(insts.take(1), Temporal.InterpNone, `lower_inc` = true,
            `upper_inc` = true)))
      case TGeom.SubSequence =>
        Val(subtype, srid, interp, Seq(GSeq(insts, interp, li, ui)))
      case _ =>
        Val(subtype, srid, interp,
          (0 until nseq).map(_ => GSeq(insts, interp, li, ui)))
    }
  }

  test("WKB and HexWKB roundtrip (property)") {
    (1 to 200).foreach { i =>
      val v = genVal.pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(TGeom.fromWkb(TGeom.toWkb(v)) == v)
      assert(TGeom.fromHexWkb(TGeom.toHexWkb(v)) == v)
      assert(TGeom.toHexWkb(v).forall(c => c.isDigit || ('A' to 'F')
        .contains(c)))
    }
  }

  test("MobilityDB-layout WKB: golden bytes for the instant case " +
    "(pins field order, temptype code, flag packing, and the PG epoch)") {
    import graft.meos.MobilityWkb
    // POINT(1 1)@2000-01-01 == the PG epoch → t-field is exactly 0
    val v = TGeom.parse("POINT(1 1)@2000-01-01")
    assert(TGeom.toHexWkb(v) ==
      "01" +                // NDR
        "2800" +            // temptype 40 (T_TGEOMPOINT, v1.1.0 catalog) LE
        "01" +              // flags xSGZIITT: subtype=1, interp NONE, no SRID
        "000000000000F03F" + // x = 1.0
        "000000000000F03F" + // y = 1.0
        "0000000000000000")  // t = 0 µs since 2000-01-01
    // with SRID: flag bit 6 set, int32 4326 right after the flags byte
    val vs = TGeom.parse("SRID=4326;POINT(1 1)@2000-01-01")
    assert(TGeom.toHexWkb(vs).startsWith("01280041E6100000"))
    assert(MobilityWkb.PgEpochUs == 946684800000000L)
  }

  test("MobilityDB-layout WKB: golden bytes for sequence cases (pins the " +
    "packed subtype+interp bits, count/bounds order, day-scale epoch µs)") {
    // linear [P@2000-01-01, P@2000-01-02]: flags = subtype 2 | LINEAR(3)<<2
    val seq = TGeom.parse("[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]")
    assert(TGeom.toHexWkb(seq) ==
      "01" + "2800" +
        "0E" +               // 0x02 | (3 << 2) = 0x0E
        "02000000" +         // count = 2
        "03" +               // bounds: lower_inc | upper_inc
        "000000000000F03F" + "000000000000F03F" + "0000000000000000" +
        "0000000000000040" + "0000000000000040" +
        "0060D71D14000000")  // 86_400_000_000 µs (one day past PG epoch)
    // discrete {…}: same wire shape, interp DISCRETE(1) in bits 2-3
    val disc = TGeom.parse("{POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02}")
    assert(TGeom.toHexWkb(disc) ==
      "01" + "2800" + "06" + "02000000" + "03" +
        "000000000000F03F" + "000000000000F03F" + "0000000000000000" +
        "0000000000000040" + "0000000000000040" + "0060D71D14000000")
    // step Interp=Step;[…]: interp STEP(2) → 0x0A
    val step = TGeom.parse(
      "Interp=Step;[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]")
    assert(TGeom.toHexWkb(step).startsWith("0128000A"))
    // half-open upper bound drops the 0x02 bit
    val halfOpen = TGeom.parse(
      "[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02)")
    assert(TGeom.toHexWkb(halfOpen).startsWith("0128000E" + "02000000" + "01"))
  }

  test("MobilityDB-layout WKB: XDR (big-endian) roundtrips and is " +
    "byte-reversed per field vs NDR") {
    import graft.meos.MobilityWkb
    (1 to 100).foreach { i =>
      val v = genVal.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val xdr = MobilityWkb.toWkb(v, littleEndian = false)
      assert(xdr(0) == 0x00)
      assert(MobilityWkb.fromWkb(xdr) == v)
    }
  }

  test("legacy (round-1) WKB layout still roundtrips under *_legacy") {
    (1 to 100).foreach { i =>
      val v = genVal.pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(TGeom.fromWkbLegacy(TGeom.toWkbLegacy(v)) == v)
      assert(TGeom.fromHexWkbLegacy(TGeom.toHexWkbLegacy(v)) == v)
    }
  }

  test("WKT print/parse roundtrip preserves value (property)") {
    (1 to 200).foreach { i =>
      val v = genVal.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val reparsed = TGeom.parse(TGeom.print(v))
      assert(reparsed.subtype == v.subtype)
      assert(reparsed.srid == v.srid)
      assert(reparsed.sequences.map(_.instants.map(_.t)) ==
        v.sequences.map(_.instants.map(_.t)))
    }
  }

  test("TBox WKT print∘parse is a fixpoint (property)") {
    val genBox: Gen[String] = for {
      v1 <- Gen.choose(-1000.0, 1000.0)
      v2 <- Gen.choose(-1000.0, 1000.0)
      loInc <- Gen.oneOf("[", "(")
      hiInc <- Gen.oneOf("]", ")")
      d1 <- Gen.choose(1, 28)
      d2 <- Gen.choose(1, 28)
      kind <- Gen.oneOf("X", "T", "XT")
    } yield {
      val lo = math.min(v1, v2); val hi = math.max(v1, v2)
      val vspan = f"$loInc$lo%.3f, $hi%.3f$hiInc"
      val tspan = f"[2001-01-$d1%02d, 2001-02-$d2%02d]"
      kind match {
        case "X" => s"TBOX X($vspan)"
        case "T" => s"TBOX T($tspan)"
        case _ => s"TBOX XT($vspan,$tspan)"
      }
    }
    (1 to 200).foreach { i =>
      val wkt = genBox.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val once = BoxText.printTBox(BoxText.parseTBox(wkt))
      val twice = BoxText.printTBox(BoxText.parseTBox(once))
      assert(once == twice, s"not a fixpoint: $wkt -> $once -> $twice")
      // predicates are reflexive on any parsed box
      val b = BoxText.parseTBox(wkt)
      assert(BoxText.tboxOverlaps(b, b))
      assert(BoxText.tboxContains(b, b))
      assert(BoxText.tboxSame(b, b))
    }
  }

  test("MF-JSON shapes (temp.rs:17-19 with bbox; :40-47 without)") {
    val inst = TGeom.parse("POINT(1 1)@2000-01-01")
    val j = TGeom.toMfJson(inst)
    assert(j.contains("\"type\":\"MovingGeomPoint\""))
    assert(j.contains("\"coordinates\":[[1,1]]"))
    assert(j.contains("\"datetimes\":[\"2000-01-01T00:00:00+00\"]"))
    assert(j.contains("\"interpolation\":\"None\""))
    assert(j.contains("\"bbox\""))
    val noBbox = TGeom.toMfJson(inst, withBbox = false)
    assert(!noBbox.contains("bbox"))
    val seq = TGeom.parse("[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]")
    val js = TGeom.toMfJson(seq)
    assert(js.contains("\"interpolation\":\"Linear\""))
    assert(js.contains("\"lower_inc\":true"))
    val set = TGeom.parse("{[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02], " +
      "[POINT(3 3)@2000-01-03, POINT(3 3)@2000-01-04]}")
    assert(TGeom.toMfJson(set).contains("\"sequences\":["))
    // emitted JSON is machine-valid
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parsed = Seq(j, js).toDF("j")
      .select(from_json(col("j"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)).as("m"))
      .collect()
    assert(parsed.forall(!_.isNullAt(0)))
  }

  test("MF-JSON parse (no reference counterpart — the reference only " +
    "prints): print∘parse is identity across the six grammars and all " +
    "print variants; malformed inputs fail with clear errors") {
    val wkts = Seq(
      "POINT(1 1)@2000-01-01",
      "{POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02}",
      "[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]",
      "Interp=Step;[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]",
      "{[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02], " +
        "[POINT(3 3)@2000-01-03, POINT(3 3)@2000-01-04]}",
      "SRID=4326;Point(-90.06 29.95)@2024-01-01T00:00:00+00")
    for (w <- wkts; variant <- Seq(0, 1, 2, 3); bbox <- Seq(true, false)) {
      val v = TGeom.parse(w)
      val back = TGeom.fromMfJson(
        TGeom.toMfJson(v, withBbox = bbox, precision = 15,
          variant = variant))
      // roundtrip pinned on the canonical WKT print plus the identity-
      // bearing fields (bounds conventions ride the print)
      assert(TGeom.print(back) == TGeom.print(v), s"$w variant=$variant")
      assert(back.subtype == v.subtype && back.srid == v.srid &&
        back.interp == v.interp, s"$w variant=$variant")
    }
    // z-coordinates survive the roundtrip
    val z = TGeom.parse("POINT Z (1 2 3)@2000-01-01")
    assert(TGeom.print(TGeom.fromMfJson(TGeom.toMfJson(z, precision = 15)))
      == TGeom.print(z))
    // srs override that is not EPSG:<n> parses with srid 0 (name-only crs)
    assert(TGeom.fromMfJson(TGeom.toMfJson(TGeom.parse(wkts.head),
      srs = "urn:ogc:def:crs:EPSG::4326")).srid == 0)
    // malformed: wrong type, coordinate arity, count mismatch
    def bad(j: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](TGeom.fromMfJson(j))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"type":"MovingFloat","values":[1]}""", "MovingGeomPoint")
    bad("""{"type":"MovingGeomPoint","coordinates":[[1]],
          |"datetimes":["2000-01-01T00:00:00+00"],
          |"interpolation":"None"}""".stripMargin, "arity")
    bad("""{"type":"MovingGeomPoint","coordinates":[[1,1],[2,2]],
          |"datetimes":["2000-01-01T00:00:00+00"],
          |"interpolation":"Linear"}""".stripMargin, "coordinates vs")
    bad("not json at all {", "bad MF-JSON")
    bad("""{"type":"MovingGeomPoint","interpolation":"Linear",
          |"sequences":[{"coordinates":[],"datetimes":[]}]}""".stripMargin,
      "no instants")
    // and the UDF leg runs in-plan
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaUdf = Seq("POINT(1 1)@2000-01-01").toDF("wkt")
      .select(graft.meos.MeosFunctions.tgeompointOut(
        graft.meos.MeosFunctions.tgeompointFromMfJson(
          graft.meos.MeosFunctions.tgeompointAsMfJson(
            graft.meos.MeosFunctions.tgeompointIn(col("wkt")),
            precision = 15))).as("out"))
      .collect()(0).getAs[String]("out")
    assert(viaUdf == "POINT(1 1)@2000-01-01 00:00:00+00")
  }

  test("MF-JSON variant flags (json-c: bit0 spaced, bit1 pretty — the raw " +
    "test's variant 3, tests/01_hello_world.rs:18) and srs override") {
    val inst = TGeom.parse("POINT(1 1)@2000-01-01")
    val plain = TGeom.toMfJson(inst, withBbox = false)
    assert(!plain.contains(" ") && !plain.contains("\n"))
    val spaced = TGeom.toMfJson(inst, withBbox = false, variant = 1)
    assert(spaced.contains("\"type\": \"MovingGeomPoint\""))
    assert(!spaced.contains("\n"))
    val pretty = TGeom.toMfJson(inst, withBbox = false, variant = 2)
    assert(pretty.contains("\n  \"type\":\"MovingGeomPoint\""))
    val both = TGeom.toMfJson(inst, withBbox = false, variant = 3)
    assert(both.contains("\n  \"type\": \"MovingGeomPoint\""))
    assert(both.endsWith("\n}"))
    // all variants hold identical content
    assert(Seq(spaced, pretty, both)
      .map(_.replaceAll("[\\s\n]", "")).forall(_ == plain))
    // srs overrides the EPSG:<srid> crs name
    val withSrs = TGeom.toMfJson(inst, srs = "urn:ogc:def:crs:EPSG::4326")
    assert(withSrs.contains("\"name\":\"urn:ogc:def:crs:EPSG::4326\""))
    val sridDefault = TGeom.parse("SRID=4326;POINT(1 1)@2000-01-01")
    assert(TGeom.toMfJson(sridDefault).contains("\"name\":\"EPSG:4326\""))
  }

  test("TBox WKT goldens in the reference's ORIGINAL timezone " +
    "(America/New_York: -05 EST / -04 EDT across DST, tbox.rs:131-151)") {
    val ny = java.time.ZoneId.of("America/New_York")
    def rt(in: String) =
      BoxText.printTBox(BoxText.parseTBox(in, ny), 6, ny)
    assert(rt("TBOX X([1.1, 4.0))") == "TBOXFLOAT X([1.1, 4))")
    assert(rt("TBOX XT((4, 12),[2001-01-01, 2001-10-01])") ==
      "TBOXFLOAT XT((4, 12),[2001-01-01 00:00:00-05, " +
        "2001-10-01 00:00:00-04])")
    assert(rt("TBOX XT([1.0, 4.0),[2001-01-01, 2001-01-02])") ==
      "TBOXFLOAT XT([1, 4),[2001-01-01 00:00:00-05, " +
        "2001-01-02 00:00:00-05])")
    assert(rt("TBOX T([2001-01-01, 2001-01-02])") ==
      "TBOX T([2001-01-01 00:00:00-05, 2001-01-02 00:00:00-05])")
  }

  test("session-timezone rendering reproduces the reference's non-UTC " +
    "golden (2001-01-01 00:00:00-05, tbox.rs:138)") {
    val est = java.time.ZoneId.of("-05:00")
    val t = TGeom.parseTs("2001-01-01 00:00:00-05")
    assert(TGeom.fmtTs(t, est) == "2001-01-01 00:00:00-05")
    assert(TGeom.fmtTs(t) == "2001-01-01 05:00:00+00")
    // half-hour zones carry minutes (+05:30); WKT print follows the zone
    assert(TGeom.fmtTs(t, java.time.ZoneId.of("+05:30"))
      == "2001-01-01 10:30:00+05:30")
    val v = TGeom.parse("POINT(1 1)@2001-01-01 00:00:00-05")
    assert(TGeom.print(v, 15, est) == "POINT(1 1)@2001-01-01 00:00:00-05")
    // the Spark UDF surface follows spark.sql.session.timeZone
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val printed = Seq("POINT(1 1)@2001-01-01 00:00:00-05").toDF("wkt")
        .select(graft.meos.MeosFunctions.tgeompointOut(
          graft.meos.MeosFunctions.tgeompointIn(col("wkt"))).as("p"))
        .collect()(0).getAs[String]("p")
      assert(printed == "POINT(1 1)@2001-01-01 00:00:00-05")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("sub-µs fraction printing: no dangling dot, trailing zeros " +
    "stripped") {
    val t = TGeom.parseTs("2000-01-01 00:00:00.0000005") // 500 ns
    assert(TGeom.fmtTs(t) == "2000-01-01 00:00:00+00")
    val t2 = TGeom.parseTs("2000-01-01 00:00:00.123400")
    assert(TGeom.fmtTs(t2) == "2000-01-01 00:00:00.1234+00")
  }

  test("3-D (Z) temporal points: parse both spellings, print POINT Z, " +
    "roundtrip through MF-JSON coords and MobilityDB WKB with the Z flag") {
    val v = TGeom.parse("POINT Z (1 2 3)@2000-01-01")
    assert(v.sequences.head.instants.head.z == Some(3.0))
    assert(TGeom.parse("Point(1 2 3)@2000-01-01") == v) // no-Z spelling
    assert(TGeom.print(v) == "POINT Z (1 2 3)@2000-01-01 00:00:00+00")
    // WKT roundtrip keeps z
    assert(TGeom.parse(TGeom.print(v)) == v)
    // MF-JSON coordinates become triples
    assert(TGeom.toMfJson(v, withBbox = false)
      .contains("\"coordinates\":[[1,2,3]]"))
    // WKB: Z flag bit set, 8 extra bytes per instant, exact roundtrip
    assert(TGeom.fromWkb(TGeom.toWkb(v)) == v)
    val v2d = TGeom.parse("POINT(1 2)@2000-01-01")
    assert(TGeom.toWkb(v).length == TGeom.toWkb(v2d).length + 8)
    val seqZ = TGeom.parse(
      "[POINT Z (0 0 0)@2000-01-01, POINT Z (10 10 10)@2000-01-03]")
    assert(TGeom.fromWkb(TGeom.toWkb(seqZ)) == seqZ)
    assert(TGeom.fromHexWkb(TGeom.toHexWkb(seqZ)) == seqZ)
  }

  test("sequence normalization (tsequence_make normalize=true, " +
    "tseq.rs:60): collinear middles and repeated step values merge") {
    // linear: (5 5)@02 sits exactly on the 00→04 segment → dropped
    val lin = TGeom.parse(
      "[POINT(0 0)@2000-01-01, POINT(5 5)@2000-01-02, " +
        "POINT(10 10)@2000-01-03]")
    val nlin = TGeom.normalize(lin)
    assert(nlin.sequences.head.instants.map(_.x) == Seq(0.0, 10.0))
    // non-collinear middle survives
    val bent = TGeom.parse(
      "[POINT(0 0)@2000-01-01, POINT(5 6)@2000-01-02, " +
        "POINT(10 10)@2000-01-03]")
    assert(TGeom.normalize(bent) == bent)
    // step: repeated value dropped, changed value kept; last always kept
    val step = TGeom.parse(
      "Interp=Step;[POINT(1 1)@2000-01-01, POINT(1 1)@2000-01-02, " +
        "POINT(2 2)@2000-01-03, POINT(2 2)@2000-01-04]")
    val nstep = TGeom.normalize(step)
    assert(nstep.sequences.head.instants.map(i => (i.x, i.t)) ==
      Seq(step.sequences.head.instants.head,
        step.sequences.head.instants(2),
        step.sequences.head.instants(3)).map(i => (i.x, i.t)))
    // discrete sequences are untouched
    val disc = TGeom.parse(
      "{POINT(1 1)@2000-01-01, POINT(1 1)@2000-01-02}")
    assert(TGeom.normalize(disc) == disc)
    // normalized value prints/parses/WKBs like any other
    assert(TGeom.parse(TGeom.print(nlin)) == nlin)
    assert(TGeom.fromWkb(TGeom.toWkb(nstep)) == nstep)
    // SQL surface
    graft.meos.MeosFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(tgeompoint_normalize(tgeompoint_in(" +
        "'[POINT(0 0)@2000-01-01, POINT(5 5)@2000-01-02, " +
        "POINT(10 10)@2000-01-03]')).sequences[0].instants) AS n")
      .collect()(0).getAs[Int]("n")
    assert(n == 2)
  }

  test("normalize properties: idempotent, endpoint-preserving, drops " +
    "exactly the injected collinear midpoints, valueAt-invariant") {
    import java.time.Instant
    (1 to 50).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // base posits 1..n with random values, strictly increasing ts
      val base = (0 until 4 + rnd.nextInt(4)).map { i =>
        GInst(Instant.ofEpochSecond(i * 3600L + rnd.nextInt(600)),
          rnd.nextDouble() * 100, rnd.nextDouble() * 100)
      }
      // inject a collinear midpoint between some consecutive pairs,
      // computed with the SAME interpolation formula normalize checks
      def usOf(t: Instant) = t.getEpochSecond * 1000000L + t.getNano / 1000
      val withMids = base.sliding(2).flatMap { case Seq(a, c) =>
        if (rnd.nextBoolean()) {
          val tm = Instant.ofEpochSecond(
            (a.t.getEpochSecond + c.t.getEpochSecond) / 2)
          val f = (usOf(tm) - usOf(a.t)).toDouble / (usOf(c.t) - usOf(a.t))
          Seq(a, GInst(tm, a.x + f * (c.x - a.x), a.y + f * (c.y - a.y)))
        } else Seq(a)
      }.toSeq :+ base.last
      val v = Val(TGeom.SubSequence, 0, Temporal.InterpLinear,
        Seq(GSeq(withMids, Temporal.InterpLinear, `lower_inc` = true,
          `upper_inc` = true)))
      val n = TGeom.normalize(v)
      assert(TGeom.normalize(n) == n) // idempotent
      val ni = n.sequences.head.instants
      assert(ni.head == withMids.head && ni.last == withMids.last)
      // every injected midpoint dropped (base itself is random → kept)
      assert(ni.length <= base.length)
      // linear semantics unchanged at sampled timestamps
      (0 until 10).foreach { _ =>
        val t0 = usOf(withMids.head.t)
        val t1 = usOf(withMids.last.t)
        val at = Instant.ofEpochSecond(
          (t0 + rnd.nextLong(t1 - t0 + 1)) / 1000000L)
        (TGeom.valueAt(v, at), TGeom.valueAt(n, at)) match {
          case (Some((x1, y1)), Some((x2, y2))) =>
            assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
          case (a, b) => assert(a == b)
        }
      }
    }
  }

  test("guarded subtype constructors reject mismatched shapes " +
    "(WrongTemporalType, error.rs:3-13; guards at tinst.rs:32, " +
    "tseq.rs:36, tset.rs:36)") {
    val inst = "POINT(1 1)@2000-01-01"
    val seq = "[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]"
    val set = "{[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02], " +
      "[POINT(3 3)@2000-01-03, POINT(3 3)@2000-01-04]}"
    // right shape parses
    assert(TGeom.parseInst(inst).subtype == TGeom.SubInstant)
    assert(TGeom.parseSeq(seq).subtype == TGeom.SubSequence)
    assert(TGeom.parseSet(set).subtype == TGeom.SubSequenceSet)
    // wrong shape raises WrongTemporalType — every cross pairing
    for ((parse, ok) <- Seq[(String => TGeom.Val, String)](
        (TGeom.parseInst _, inst), (TGeom.parseSeq _, seq),
        (TGeom.parseSet _, set));
        wkt <- Seq(inst, seq, set) if wkt != ok) {
      val e = intercept[TGeom.WrongTemporalType](parse(wkt))
      assert(e.getMessage.contains("expected a different meos type"))
    }
    // malformed input still raises ParseError, not the subtype guard
    intercept[TGeom.ParseError](TGeom.parseInst("not wkt"))
    // SQL surface
    graft.meos.MeosFunctions.register(spark)
    assert(spark.sql(
      s"SELECT tgeompoint_inst_in('$inst').subtype AS s")
      .collect()(0).getAs[Int]("s") == TGeom.SubInstant)
    val thrown = intercept[Exception] {
      spark.sql(s"SELECT tgeompoint_inst_in('$seq')").collect()
    }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    assert(causes(thrown).exists(_.isInstanceOf[TGeom.WrongTemporalType]))
  }

  test("valueAt honors interpolation and bounds (tseq.rs:57-60 semantics)") {
    def at(v: Val, s: String) = TGeom.valueAt(v, TGeom.parseTs(s))
    val lin = TGeom.parse("[POINT(0 0)@2000-01-01, POINT(10 20)@2000-01-03]")
    assert(at(lin, "2000-01-02") == Some((5.0, 10.0)))
    assert(at(lin, "2000-01-01") == Some((0.0, 0.0)))
    assert(at(lin, "2000-01-03") == Some((10.0, 20.0)))
    assert(at(lin, "2000-01-04").isEmpty)
    val step = TGeom.parse(
      "Interp=Step;[POINT(0 0)@2000-01-01, POINT(10 20)@2000-01-03]")
    assert(at(step, "2000-01-02") == Some((0.0, 0.0)))
    assert(at(step, "2000-01-03") == Some((10.0, 20.0)))
    val openEnd = TGeom.parse("[POINT(0 0)@2000-01-01, POINT(10 20)@2000-01-03)")
    assert(at(openEnd, "2000-01-03").isEmpty)
    val disc = TGeom.parse("{POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02}")
    assert(at(disc, "2000-01-01") == Some((1.0, 1.0)))
    assert(at(disc, "2000-01-01 12:00:00").isEmpty)
  }

  test("spark UDF surface: parse → print → mfjson → wkb roundtrip in SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.meos.MeosFunctions.register(spark)
    val wkts = Seq(
      "POINT(1 1)@2000-01-01",
      "[POINT(1 1)@2000-01-01, POINT(2 2)@2000-01-02]",
      "SRID=4326;Point(-90.06 29.95)@2024-01-01T00:00:00+00")
    val df = wkts.toDF("wkt")
    df.createOrReplaceTempView("wkts")
    val out = spark.sql(
      """SELECT wkt,
        |       tgeompoint_out(tgeompoint_in(wkt), 15) AS printed,
        |       tgeompoint_as_mfjson(tgeompoint_in(wkt), true, 0, 6,
        |         cast(null as string)) AS mfjson,
        |       tgeompoint_out(tgeompoint_from_hexwkb(
        |         tgeompoint_as_hexwkb(tgeompoint_in(wkt))), 15) AS viaWkb
        |FROM wkts""".stripMargin).collect()
    out.foreach { r =>
      assert(r.getAs[String]("printed") == r.getAs[String]("viaWkb"))
      assert(r.getAs[String]("mfjson").contains("MovingGeomPoint"))
    }
    // box predicates via SQL
    val b = spark.sql(
      """SELECT tbox_contains(tbox_in('TBOX T([2001-01-01, 2001-01-02])'),
        |                     tbox_in('TBOX T([2001-01-01, 2001-01-02])')) AS c,
        |       tbox_out(tbox_in('TBOX X([1.1, 4.0))'), 6) AS w""".stripMargin)
      .collect()(0)
    assert(b.getAs[Boolean]("c"))
    assert(b.getAs[String]("w") == "TBOXFLOAT X([1.1, 4))")
    // int→TBox cast (tbox.rs:87-98): degenerate closed value span
    val i = spark.sql("SELECT tbox_out(tbox_from_int(5), 6) AS w")
      .collect()(0)
    assert(i.getAs[String]("w") == "TBOXFLOAT X([5, 5])")
  }
}
