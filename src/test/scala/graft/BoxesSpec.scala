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
}
