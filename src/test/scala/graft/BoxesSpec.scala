package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.meos.Boxes

/** Box predicate truth tables, ported from the reference's unit tests:
  * contains `meos/src/tbox.rs:153-162`, overlaps `:164-173`, same
  * `:175-184`, plus STBox variants (`meos/src/stbox.rs`). Time-only boxes
  * are modeled with an unbounded value span.
  */
class BoxesSpec extends SparkTestBase {

  private def ts(s: String): Column = expr(s"timestamp '$s'")

  private def tboxT(t1: String, t2: String): Column =
    Boxes.tbox(lit(Double.MinValue), lit(Double.MaxValue), ts(t1), ts(t2))

  private def evalBool(c: Column): Boolean = {
    import spark.implicits._
    Seq(1).toDF("i").select(c.as("r")).collect()(0).getBoolean(0)
  }

  // tbox.rs:153-162 — contains on time spans
  test("tbox contains truth table") {
    assert(evalBool(Boxes.tboxContains(
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"),
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"))))
    assert(!evalBool(Boxes.tboxContains(
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"),
      tboxT("2001-01-01 00:00:00", "2001-01-03 00:00:00"))))
    assert(evalBool(Boxes.tboxContains(
      tboxT("2001-01-01 00:00:00", "2001-01-03 00:00:00"),
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"))))
  }

  // tbox.rs:164-173 — overlaps
  test("tbox overlaps truth table") {
    assert(evalBool(Boxes.tboxOverlaps(
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"),
      tboxT("2001-01-01 12:00:00", "2001-01-03 00:00:00"))))
    assert(!evalBool(Boxes.tboxOverlaps(
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"),
      tboxT("2001-02-01 00:00:00", "2001-02-02 00:00:00"))))
  }

  // tbox.rs:175-184 — same
  test("tbox same truth table") {
    assert(evalBool(Boxes.tboxSame(
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"),
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"))))
    assert(!evalBool(Boxes.tboxSame(
      tboxT("2001-01-01 00:00:00", "2001-01-02 00:00:00"),
      tboxT("2001-01-01 00:00:00", "2001-01-03 00:00:00"))))
  }

  test("contains implies overlaps (property over literal grid)") {
    for {
      a1 <- 0 to 3; a2 <- a1 to 3; b1 <- 0 to 3; b2 <- b1 to 3
    } {
      val a = Boxes.tbox(lit(a1.toDouble), lit(a2.toDouble),
        ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00"))
      val b = Boxes.tbox(lit(b1.toDouble), lit(b2.toDouble),
        ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00"))
      if (evalBool(Boxes.tboxContains(a, b)))
        assert(evalBool(Boxes.tboxOverlaps(a, b)))
    }
  }

  test("stbox contains/overlaps/same") {
    def box(x1: Double, x2: Double, y1: Double, y2: Double): Column =
      Boxes.stbox(lit(x1), lit(x2), lit(y1), lit(y2),
        ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00"))
    assert(evalBool(Boxes.stboxContains(box(0, 10, 0, 10), box(1, 2, 3, 4))))
    assert(!evalBool(Boxes.stboxContains(box(1, 2, 3, 4), box(0, 10, 0, 10))))
    assert(evalBool(Boxes.stboxOverlaps(box(0, 5, 0, 5), box(4, 9, 4, 9))))
    assert(!evalBool(Boxes.stboxOverlaps(box(0, 5, 0, 5), box(6, 9, 0, 5))))
    assert(evalBool(Boxes.stboxSame(box(1, 2, 3, 4), box(1, 2, 3, 4))))
    assert(!evalBool(Boxes.stboxSame(box(1, 2, 3, 4), box(1, 2, 3, 5))))
  }

  // ---- inclusivity-carrying columnar structs (SURVEY §1.4 full design) ----

  /** Columnar half-open predicates vs the row-wise BoxText reference
    * implementation, exhaustively over touching/overlapping/disjoint value
    * spans × all 16 inclusivity combinations. */
  test("columnar full tbox predicates == BoxText over inclusivity grid") {
    import graft.meos.BoxText
    val t1 = ts("2001-01-01 00:00:00")
    val t2 = ts("2001-01-02 00:00:00")
    val cases = Seq(
      ((0.0, 2.0), (2.0, 4.0)), // touch at one point
      ((0.0, 2.0), (1.0, 3.0)), // overlap
      ((0.0, 1.0), (2.0, 3.0)), // disjoint
      ((0.0, 4.0), (1.0, 2.0)), // containment
      ((1.0, 2.0), (1.0, 2.0))) // equal
    for {
      ((alo, ahi), (blo, bhi)) <- cases
      aLoI <- Seq(true, false); aHiI <- Seq(true, false)
      bLoI <- Seq(true, false); bHiI <- Seq(true, false)
    } {
      val aCol = Boxes.tboxFull(lit(alo), lit(ahi), t1, t2,
        lit(aLoI), lit(aHiI))
      val bCol = Boxes.tboxFull(lit(blo), lit(bhi), t1, t2,
        lit(bLoI), lit(bHiI))
      val aRow = BoxText.Span(alo, ahi, aLoI, aHiI)
      val bRow = BoxText.Span(blo, bhi, bLoI, bHiI)
      assert(evalBool(Boxes.tboxOverlapsFull(aCol, bCol)) ==
        BoxText.spanOverlaps(aRow, bRow),
        s"overlaps [$alo,$ahi]($aLoI,$aHiI) vs [$blo,$bhi]($bLoI,$bHiI)")
      assert(evalBool(Boxes.tboxContainsFull(aCol, bCol)) ==
        BoxText.spanContains(aRow, bRow),
        s"contains [$alo,$ahi]($aLoI,$aHiI) vs [$blo,$bhi]($bLoI,$bHiI)")
    }
  }

  test("half-open WKT literals flow to columnar predicates (the " +
      "tbox.rs:132 case: [1.1, 4.0) does not meet [4.0, 5.0] at the edge)") {
    import graft.meos.MeosFunctions
    def parsed(wkt: String): Column =
      Boxes.tboxFullFromParsed(MeosFunctions.tboxIn(lit(wkt)))
    val halfOpen = parsed("TBOXFLOAT X([1.1, 4.0))")
    val touching = parsed("TBOXFLOAT X([4.0, 5.0])")
    val inside = parsed("TBOXFLOAT X([2.0, 3.9])")
    assert(!evalBool(Boxes.tboxOverlapsFull(halfOpen, touching)),
      "open upper bound must not meet at 4.0")
    assert(evalBool(Boxes.tboxOverlapsFull(halfOpen, inside)))
    assert(evalBool(Boxes.tboxContainsFull(halfOpen, inside)))
    // closed twin DOES meet at the edge — the flags are load-bearing
    val closed = parsed("TBOXFLOAT X([1.1, 4.0])")
    assert(evalBool(Boxes.tboxOverlapsFull(closed, touching)))
  }

  test("bucketed full-box overlap join == nested loop over a mixed " +
      "half-open/closed/timeless corpus") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val t0 = base + rnd.nextInt(90 * 24) * 3600L * 1000
      val t1 = t0 + (1 + rnd.nextInt(72)) * 3600L * 1000
      val v0 = rnd.nextInt(50).toDouble
      (i.toLong, v0, v0 + 1 + rnd.nextInt(5),
        new java.sql.Timestamp(t0), new java.sql.Timestamp(t1),
        rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean(),
        rnd.nextBoolean(), i % 17 != 0) // ~6% timeless
    }.toDF("id", "vlo", "vhi", "tlo", "thi", "vloI", "vhiI", "tloI",
      "thiI", "hasT")
    val boxes = rows.select(col("id"), Boxes.tboxFull(
      col("vlo"), col("vhi"), col("tlo"), col("thi"),
      col("vloI"), col("vhiI"), col("tloI"), col("thiI"),
      hasT = col("hasT")).as("box"))
    val l = boxes.select(col("id").as("idA"), col("box").as("boxA"))
    val r = boxes.select(col("id").as("idB"), col("box").as("boxB"))
    val nested = l.join(r, col("idA") < col("idB") &&
      Boxes.tboxOverlapsFull(col("boxA"), col("boxB")))
      .select("idA", "idB").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bucketed = Boxes.tboxOverlapJoinBucketedFull(boxes, boxes,
      java.time.Duration.ofDays(2), (x, y) => x < y)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bucketed == nested)
    assert(nested.nonEmpty)
  }

  test("spatial bucketed stbox join == nested loop, sub-quadratic cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 300).map { i =>
      val x0 = rnd.nextDouble() * 100; val y0 = rnd.nextDouble() * 100
      val t0 = base + rnd.nextInt(240) * 3600L * 1000
      (i.toLong, x0, x0 + 1 + rnd.nextDouble() * 4,
        y0, y0 + 1 + rnd.nextDouble() * 4,
        new java.sql.Timestamp(t0),
        new java.sql.Timestamp(t0 + 24 * 3600L * 1000))
    }.toDF("id", "x1", "x2", "y1", "y2", "t1", "t2")
    val boxes = rows.select(col("id"), Boxes.stbox(col("x1"), col("x2"),
      col("y1"), col("y2"), col("t1"), col("t2")).as("box"))
    val l = boxes.select(col("id").as("idA"), col("box").as("boxA"))
    val r = boxes.select(col("id").as("idB"), col("box").as("boxB"))
    val nested = l.join(r, col("idA") < col("idB") &&
      Boxes.stboxOverlaps(col("boxA"), col("boxB")))
      .select("idA", "idB").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bucketed = Boxes.stboxOverlapJoinBucketed(boxes, boxes, 5.0, 5.0,
      (x, y) => x < y)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bucketed == nested)
    assert(nested.nonEmpty)
  }

  test("columnar full stbox honors period inclusivity and shared dims") {
    def b(t1s: String, t2s: String, loInc: Boolean, hiInc: Boolean): Column =
      Boxes.stboxFull(lit(0.0), lit(1.0), lit(0.0), lit(1.0),
        ts(t1s), ts(t2s), tminInc = lit(loInc), tmaxInc = lit(hiInc))
    // periods touching at one instant: meet only if both ends inclusive
    assert(evalBool(Boxes.stboxOverlapsFull(
      b("2001-01-01 00:00:00", "2001-01-02 00:00:00", true, true),
      b("2001-01-02 00:00:00", "2001-01-03 00:00:00", true, true))))
    assert(!evalBool(Boxes.stboxOverlapsFull(
      b("2001-01-01 00:00:00", "2001-01-02 00:00:00", true, false),
      b("2001-01-02 00:00:00", "2001-01-03 00:00:00", true, true))))
    // Z ignored unless both sides carry it
    val withZ = Boxes.stboxFull(lit(0.0), lit(1.0), lit(0.0), lit(1.0),
      ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00"),
      zmin = lit(5.0), zmax = lit(6.0), hasZ = lit(true))
    val noZ = b("2001-01-01 00:00:00", "2001-01-02 00:00:00", true, true)
    assert(evalBool(Boxes.stboxOverlapsFull(withZ, noZ)))
    val farZ = Boxes.stboxFull(lit(0.0), lit(1.0), lit(0.0), lit(1.0),
      ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00"),
      zmin = lit(50.0), zmax = lit(60.0), hasZ = lit(true))
    assert(!evalBool(Boxes.stboxOverlapsFull(withZ, farZ)))
  }
}
