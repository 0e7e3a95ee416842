package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.plans.AsofJoin
import graft.streaming.StreamingAsof
import graft.streaming.StreamingAsof.{Enriched, Tagged}

/** Streaming as-of join vs the batch operator: the streaming result over
  * micro-batched input must equal [[AsofJoin.backward]] over the same
  * rows whenever references arrive no later than the first event they
  * enrich (the documented equivalence window). Also exercises: late
  * events answered from buffered history, equal-timestamp tie-breaks,
  * keys with no references, and buffer pruning. */
class StreamingAsofSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ref(uid: Long, t: String, rid: Long, rv: Double) =
    Tagged(uid, ts(t), 0, -1L, rid, rv)
  private def ev(uid: Long, t: String, eid: Long) =
    Tagged(uid, ts(t), 1, eid, -1L, 0.0)

  test("streaming as-of == batch as-of across micro-batches, incl. a " +
    "late event enriched from buffered history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val q = StreamingAsof.enrich(input.toDS())
      .writeStream.outputMode(StreamingAsof.outputMode)
      .format("memory").queryName("asof_out")
      .start()
    try {
      // batch 1: refs for user 1 (two, one same-ts duplicate pair) and an
      // event between them; user 2 has an event but NO refs -> null
      input.addData(
        ref(1, "2024-01-01 00:00:00", 100, 1.0),
        ref(1, "2024-01-01 00:10:00", 200, 2.0),
        ref(1, "2024-01-01 00:10:00", 201, 3.0), // tie: 201 wins
        ev(1, "2024-01-01 00:05:00", 1),
        ev(1, "2024-01-01 00:10:00", 2), // equal ts sees the ref
        ev(2, "2024-01-01 00:05:00", 3))
      q.processAllAvailable()
      // batch 2: a newer ref, an event after it, and a LATE event whose
      // correct reference is the OLD one still in the buffer
      input.addData(
        ref(1, "2024-01-01 00:20:00", 300, 4.0),
        ev(1, "2024-01-01 00:25:00", 4),
        ev(1, "2024-01-01 00:07:00", 5)) // late: must see ref 100, not 300
      q.processAllAvailable()

      val got = spark.table("asof_out").as[Enriched].collect()
        .map(e => e.event_id ->
          ((e.asof_ref_id.getOrElse(-1L), e.asof_ref_value.getOrElse(-1.0))))
        .toMap
      assert(got(1L) == ((100L, 1.0)))
      assert(got(2L) == ((201L, 3.0))) // equal-ts visible, largest rid wins
      assert(got(3L) == ((-1L, -1.0))) // no refs for the key
      assert(got(4L) == ((300L, 4.0)))
      assert(got(5L) == ((100L, 1.0))) // late event answered from history

      // equivalence with the batch operator on the union of all rows
      val leftDf = Seq(
        (1L, ts("2024-01-01 00:05:00"), 1L),
        (1L, ts("2024-01-01 00:10:00"), 2L),
        (2L, ts("2024-01-01 00:05:00"), 3L),
        (1L, ts("2024-01-01 00:25:00"), 4L),
        (1L, ts("2024-01-01 00:07:00"), 5L)
      ).toDF("user_id", "ts", "event_id")
      val rightDf = Seq(
        (1L, ts("2024-01-01 00:00:00"), 100L, 1.0),
        (1L, ts("2024-01-01 00:10:00"), 200L, 2.0),
        (1L, ts("2024-01-01 00:10:00"), 201L, 3.0),
        (1L, ts("2024-01-01 00:20:00"), 300L, 4.0)
      ).toDF("user_id", "ts", "ref_id", "ref_value")
      val batch = AsofJoin.backward(leftDf, rightDf, key = "user_id",
        leftTime = "ts", rightTime = "ts",
        payload = Seq("ref_id", "ref_value"), tieBreak = "ref_id")
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((if (r.isNullAt(3)) -1L else r.getAs[Long]("asof_ref_id")),
            (if (r.isNullAt(4)) -1.0
             else r.getAs[Double]("asof_ref_value"))))
        .toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("buffer pruning keeps the newest maxBuffer references (oldest " +
    "history ages out; recent lookups unaffected)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val q = StreamingAsof.enrich(input.toDS(), maxBuffer = 3)
      .writeStream.outputMode(StreamingAsof.outputMode)
      .format("memory").queryName("asof_prune")
      .start()
    try {
      input.addData(
        (1 to 5).map(i => ref(1, f"2024-01-01 00:0$i:00", 100L + i, i.toDouble)) :+
          ev(1, "2024-01-01 00:06:00", 1): _*)
      q.processAllAvailable()
      // a late event older than the pruned horizon finds nothing
      input.addData(ev(1, "2024-01-01 00:02:30", 2))
      q.processAllAvailable()
      val got = spark.table("asof_prune").as[Enriched].collect()
        .map(e => e.event_id -> e.asof_ref_id).toMap
      assert(got(1L).contains(105L)) // newest ref
      assert(got(2L).isEmpty) // refs at :01/:02 were pruned (kept :03-:05)
    } finally q.stop()
  }
}
