package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.meos.Assembly
import graft.meos.Assembly.FPosit

/** Unit + property tests for the trajectory-assembly Aggregator (A6):
  * sortedness, strictly-increasing timestamps (dup-ts dedupe, reference
  * `ais_to_db.rs:181-184`), truncation (`ais_to_db.rs:190-193`), and
  * merge-order insensitivity (required for map-side partial aggregation).
  */
class AssemblySpec extends SparkTestBase {

  /** Manual property driver (no scalatestplus in the offline cache). */
  private def forAllSampled[A](gen: Gen[A], n: Int = 100)(check: A => Unit)
      : Unit =
    (1 to n).foreach { i =>
      check(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def run(maxSize: Int, ps: Seq[FPosit]) = {
    val agg = new Assembly.TFloatAssembler(maxSize)
    agg.finish(ps.foldLeft(agg.zero)((b, p) => agg.reduce(b, p)))
  }

  test("finish sorts by (t, tie) and dedupes equal timestamps keeping " +
    "the smallest tiebreaker") {
    val out = run(0, Seq(
      FPosit(30, 1, 3.0), FPosit(10, 2, 1.0), FPosit(10, 1, 9.0),
      FPosit(20, 3, 2.0)))
    assert(out.t.toSeq == Seq(10L, 20L, 30L))
    assert(out.v.toSeq == Seq(9.0, 2.0, 3.0)) // t=10 keeps tie=1 (v=9.0)
    assert(out.n == 3)
  }

  test("maxSize truncates to the earliest posits") {
    val out = run(2, (1 to 10).map(i => FPosit(i * 100L, i.toLong, i.toDouble)))
    assert(out.t.toSeq == Seq(100L, 200L))
  }

  test("mid-stream trim with duplicate timestamps keeps distinct-ts " +
    "earliest (regression: raw-row cap crowded out distinct instants)") {
    // maxSize=2, many duplicate-t=1 rows force trim mid-stream; the final
    // trip must still be the 2 earliest DISTINCT timestamps [1, 2]
    val ps = (1 to 6).map(i => FPosit(1L, i.toLong, i.toDouble)) ++
      Seq(FPosit(2L, 10L, 20.0), FPosit(3L, 11L, 30.0))
    val out = run(2, ps)
    assert(out.t.toSeq == Seq(1L, 2L))
    assert(out.v.toSeq == Seq(1.0, 20.0)) // t=1 keeps tie=1
  }

  test("merge is order-insensitive (partial-agg safety)") {
    val gen = Gen.listOf(for {
      t <- Gen.choose(0L, 50L)
      tie <- Gen.choose(0L, 1000L)
      v <- Gen.choose(-100.0, 100.0)
    } yield FPosit(t, tie, v))
    val agg = new Assembly.TFloatAssembler(0)
    forAllSampled(gen) { ps =>
      val (l, r) = ps.splitAt(ps.length / 2)
      def fold(xs: Seq[FPosit]) =
        xs.foldLeft(agg.zero)((b, p) => agg.reduce(b, p))
      val ab = agg.finish(agg.merge(fold(l), fold(r)))
      val ba = agg.finish(agg.merge(fold(r), fold(l)))
      assert(ab.t.toSeq == ba.t.toSeq)
      // equal-t, equal-tie collisions make v ambiguous; compare only when
      // (t, tie) pairs are unique
      if (ps.map(p => (p.t, p.tie)).distinct.size == ps.size)
        assert(ab.v.toSeq == ba.v.toSeq)
      assert(ab.t.toSeq == ab.t.toSeq.sorted)
      assert(ab.t.toSeq.distinct.size == ab.t.length) // strictly increasing
    }
  }

  test("spark end-to-end: assembled per-user trip matches groupBy count " +
    "after dedupe") {
    import org.apache.spark.sql.functions._
    val asm = Assembly.tfloatAssemble()
    val got = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(asm(unix_micros(col("ts")), col("event_id"), col("value")).as("s"))
      .select(col("user_id"), col("s.n").as("n"),
        col("s.t").as("t"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ts = r.getAs[scala.collection.Seq[Long]]("t")
      assert(ts == ts.sorted)
      assert(ts.distinct.size == ts.size)
      assert(r.getAs[Long]("n") == ts.size.toLong)
    }
  }
}
