package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming backward as-of join — point-in-time enrichment of an event
  * stream with the latest reference row at-or-before each event, per key
  * (the streaming twin of [[graft.plans.AsofJoin.backward]]: "the user's
  * most recent signup as of this event", continuously).
  *
  * Shape: both streams are tagged and unioned, then ONE
  * `flatMapGroupsWithState` keyed by the join key holds a bounded,
  * time-sorted buffer of recent reference rows. Each micro-batch inserts
  * the batch's reference rows first (dedup at equal timestamps: largest
  * `ref_id` wins, mirroring the batch operator's tieBreak), then answers
  * the batch's events by binary search for the latest reference at-or-
  * before the event time — so a late EVENT still gets the historically
  * correct reference, as long as it falls inside the buffer horizon.
  *
  * Semantics vs batch: equivalent whenever every reference row arrives in
  * the same micro-batch as the first event it should enrich, or earlier
  * (within a batch, order never matters — references are indexed before
  * events are answered). A reference arriving in a LATER batch than an
  * already-emitted event cannot retract that event's enrichment — the
  * inherent append-mode limit of any stream-stream join without
  * retraction, same as Spark's built-in interval join.
  *
  * Scale: state per key is O(maxBuffer) — the reference history is pruned
  * oldest-first, never the event stream; keys partition across executors
  * like any keyed state. A production deployment would add a state TTL
  * (GroupStateTimeout) for keys gone cold; kept NoTimeout here so replay
  * tests are exact.
  */
object StreamingAsof extends Serializable {

  /** Unioned, tagged input: src=0 reference rows (`ref_id`/`ref_value`
    * meaningful), src=1 event rows (`event_id` meaningful). */
  case class Tagged(user_id: Long, ts: Timestamp, src: Int,
                    event_id: Long, ref_id: Long, ref_value: Double)

  case class RefRow(t: Long, refId: Long, refValue: Double)
  case class BufState(rights: Vector[RefRow])

  case class Enriched(user_id: Long, event_id: Long, ts: Timestamp,
                      asof_ref_id: Option[Long],
                      asof_ref_value: Option[Double])

  // µs ⇄ Timestamp conversions: [[Times]] (shared package-wide)
  private def micros(t: Timestamp): Long = Times.micros(t)
  private def tsFromMicros(us: Long): Timestamp = Times.tsFromMicros(us)

  /** Largest index i with `buf(i).t <= t`, or -1 — true binary search
    * (O(log n) probes over the sorted buffer, not a linear scan). */
  private def floorIdx(buf: Vector[RefRow], t: Long): Int = {
    var lo = 0
    var hi = buf.length - 1
    var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid).t <= t) { res = mid; lo = mid + 1 } else hi = mid - 1
    }
    res
  }

  /** Insert keeping the vector sorted by t; at equal t the largest refId
    * wins (replaces), mirroring AsofJoin's right-side dedup. */
  private def insert(buf: Vector[RefRow], r: RefRow): Vector[RefRow] = {
    val i = floorIdx(buf, r.t)
    if (i >= 0 && buf(i).t == r.t)
      if (r.refId >= buf(i).refId) buf.updated(i, r) else buf
    else (buf.take(i + 1) :+ r) ++ buf.drop(i + 1)
  }

  /** Latest reference at-or-before `t`, if any survives in the buffer. */
  private def lookup(buf: Vector[RefRow], t: Long): Option[RefRow] = {
    val i = floorIdx(buf, t)
    if (i >= 0) Some(buf(i)) else None
  }

  def enrich(tagged: Dataset[Tagged], maxBuffer: Int = 1024)
      : Dataset[Enriched] = {
    implicit val stateEnc = Encoders.product[BufState]
    implicit val outEnc = Encoders.product[Enriched]
    implicit val keyEnc = Encoders.scalaLong
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BufState, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        var buf = state.getOption.map(_.rights).getOrElse(Vector.empty)
        val batch = rows.toSeq
        // all of the batch's references become visible before any of the
        // batch's events are answered — within-batch arrival order is
        // irrelevant, exactly like the batch operator's union
        batch.iterator.filter(_.src == 0).foreach { r =>
          buf = insert(buf, RefRow(micros(r.ts), r.ref_id, r.ref_value))
        }
        if (buf.length > maxBuffer) buf = buf.takeRight(maxBuffer)
        state.update(BufState(buf))
        // deterministic output order (time, event_id) for replay tests
        batch.iterator.filter(_.src == 1).toSeq
          .sortBy(e => (micros(e.ts), e.event_id)).iterator.map { e =>
            val hit = lookup(buf, micros(e.ts))
            Enriched(uid, e.event_id, tsFromMicros(micros(e.ts)),
              hit.map(_.refId), hit.map(_.refValue))
          }
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
