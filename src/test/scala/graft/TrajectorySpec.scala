package graft

import org.apache.spark.sql.functions._

import graft.meos.Trajectory

/** Trajectory measures + gap-based sequence splitting (the TSet shape). */
class TrajectorySpec extends SparkTestBase {

  import spark.implicits._

  private def tripDf = Seq((
    Seq(0L, 60000000L, 120000000L, 3720000000L), // 0s, 60s, 120s, 62min
    Seq(0.0, 3.0, 3.0, 10.0),
    Seq(0.0, 4.0, 4.0, 10.0))).toDF("t", "x", "y")

  test("duration, path length, speed, max gap") {
    val r = tripDf.select(
      Trajectory.durationSec(col("t")).as("d"),
      Trajectory.pathLength(col("x"), col("y")).as("len"),
      Trajectory.avgSpeed(col("x"), col("y"), col("t")).as("v"),
      Trajectory.maxGapSec(col("t")).as("gap"),
      Trajectory.totalVariation(col("x")).as("tv")).collect()(0)
    assert(r.getAs[Double]("d") == 3720.0)
    // 3-4-5 triangle (5.0) + zero step + straight diagonal
    val expectedLen = 5.0 + 0.0 + math.sqrt(49.0 + 36.0)
    assert(math.abs(r.getAs[Double]("len") - expectedLen) < 1e-12)
    assert(math.abs(r.getAs[Double]("v") - expectedLen / 3720.0) < 1e-15)
    assert(r.getAs[Double]("gap") == 3600.0)
    assert(r.getAs[Double]("tv") == 3.0 + 0.0 + 7.0)
  }

  test("haversine path length: LA to NYC ≈ 3936 km") {
    val r = Seq((Seq(-118.2437, -74.0060), Seq(34.0522, 40.7128)))
      .toDF("lon", "lat")
      .select(Trajectory.pathLengthMeters(col("lon"), col("lat")).as("m"))
      .collect()(0).getAs[Double]("m")
    assert(math.abs(r / 1000.0 - 3936.0) < 10.0, s"got ${r / 1000} km")
  }

  test("degenerate one-posit trip: zero length, null speed") {
    val r = Seq((Seq(5L), Seq(1.0), Seq(2.0))).toDF("t", "x", "y")
      .select(
        Trajectory.pathLength(col("x"), col("y")).as("len"),
        Trajectory.avgSpeed(col("x"), col("y"), col("t")).as("v")).collect()(0)
    assert(r.getAs[Double]("len") == 0.0)
    assert(r.isNullAt(1))
  }

  test("gapSegments splits at gaps >= threshold (sequence-set shape)") {
    val segs = tripDf.select(
      Trajectory.gapSegments(col("t"), col("x"), col("y"), gapSec = 600.0)
        .as("segs")).collect()(0)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("segs")
    assert(segs.map(_.getAs[Int]("seg")) == Seq(0, 0, 0, 1))
    assert(segs.map(_.getAs[Long]("t")) ==
      Seq(0L, 60000000L, 120000000L, 3720000000L))
  }

  test("gapSegments is linear: a 1e5-posit mega-trip splits correctly " +
    "(the former expression form did O(n²) comparisons here)") {
    val n = 100000
    // posits 1 s apart; every 1000th posit jumps 2 h → 100 segments
    val t = (0 until n).map(i =>
      i.toLong * 1000000L + (i / 1000).toLong * 7200000000L)
    val xs = (0 until n).map(_.toDouble)
    val df = Seq((t, xs, xs)).toDF("t", "x", "y")
    val t0 = System.nanoTime()
    val segs = df.select(
      Trajectory.gapSegments(col("t"), col("x"), col("y"), gapSec = 3600.0)
        .as("segs")).collect()(0)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("segs")
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(segs.length == n)
    val bySeg = segs.groupBy(_.getAs[Int]("seg"))
    assert(bySeg.size == 100)
    assert(bySeg.values.forall(_.length == 1000))
    assert(elapsedSec < 30.0, s"took $elapsedSec s — not linear?")
  }

  test("gapSegmentStats == explode(gapSegments) + per-seg aggregation " +
      "(the q36 equivalence, incl. on real sf0.001 trips)") {
    // synthetic trip with two gaps
    val df = tripDf
    val viaStats = df.select(explode(Trajectory.gapSegmentStats(
      col("t"), col("x"), 3600.0)).as("g"))
      .select("g.seg", "g.n", "g.t0", "g.t1", "g.xmin", "g.xmax")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    val viaExplode = df.select(explode(Trajectory.gapSegments(
      col("t"), col("x"), col("y"), 3600.0)).as("g"))
      .groupBy(col("g.seg").as("seg"))
      .agg(count(lit(1)).as("n"), min("g.t").as("t0"), max("g.t").as("t1"),
        min("g.x").as("xmin"), max("g.x").as("xmax"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(viaStats == viaExplode)
    assert(viaStats.size == 2)

    // real data: every assembled sf0.001 trip, both derivations agree
    val asm = graft.meos.Assembly.tfloatAssemble()
    val trips = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(asm(unix_micros(col("ts")), col("event_id"), col("value"))
        .as("s"))
    val a = trips.select(col("user_id"), explode(
      Trajectory.gapSegmentStats(col("s.t"), col("s.v"), 3600.0)).as("g"))
      .select(col("user_id"), col("g.seg"), col("g.n"), col("g.t0"),
        col("g.t1"), col("g.xmin"), col("g.xmax"))
      .collect().map(_.toSeq).toSet
    val b = trips.select(col("user_id"), explode(Trajectory.gapSegments(
      col("s.t"), col("s.v"), col("s.v"), 3600.0)).as("g"))
      .groupBy(col("user_id"), col("g.seg").as("seg"))
      .agg(count(lit(1)).as("n"), min("g.t").as("t0"), max("g.t").as("t1"),
        min("g.x").as("xmin"), max("g.x").as("xmax"))
      .select("user_id", "seg", "n", "t0", "t1", "xmin", "xmax")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}
