package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trajectory assembly — the Structured-Streaming re-expression
  * of the reference's batch-only pipeline (SURVEY.md §2.9). The suggestive
  * fragments it realizes:
  *  - the commented-out incremental flush (emit partial trips every
  *    `batch_size` posits, `meos/examples/04_to_file.rs:97-102`);
  *  - the sink's merge-on-conflict upsert, which is exactly streaming
  *    upsert semantics (`update(trips.trip, EXCLUDED.trip, true)`,
  *    `meos-polars/examples/ais_to_db.rs:160`).
  *
  * State per entity = the open trip buffer — the same shape as the batch
  * UDAF buffer ([[graft.meos.Assembly]]); the monotonic-time rule (P4,
  * `04_to_file.rs:91-96`) is applied per micro-batch: rows are time-sorted
  * within the batch, and any posit at or before the last accepted
  * timestamp is dropped — the reference's own policy for out-of-order
  * arrivals. Late data beyond the watermark never reaches the operator.
  *
  * Scale posture: state is bounded by `maxTripSize` (P7 truncation), keyed
  * by entity — Spark distributes/checkpoints it per shuffle partition, so
  * a 100 TB replay is bounded by (entities × maxTripSize), not input size.
  */
// Serializable: the flatMapGroupsWithState closures call module-private
// helpers, which makes them capture the module instance itself
object StreamingAssembly extends Serializable {

  // µs ⇄ Timestamp conversions live in [[Times]] (shared package-wide;
  // static module access — closures capture nothing)
  private def tsFromMicros(us: Long): Timestamp = Times.tsFromMicros(us)

  case class EventIn(user_id: Long, ts: Timestamp, event_id: Long,
                     value: Double)
  case class TripState(lastTs: Long, t: Vector[Long], v: Vector[Double])
  case class TripUpdate(user_id: Long, n_posits: Long, start_ts: Timestamp,
                        end_ts: Timestamp, last_value: Double)

  /** Update-mode stateful assembly: one [[TripUpdate]] per entity per
    * micro-batch that touched it. */
  def assemble(events: Dataset[EventIn], maxTripSize: Int = 0)
      : Dataset[TripUpdate] = {
    implicit val stateEnc = Encoders.product[TripState]
    implicit val outEnc = Encoders.product[TripUpdate]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[TripState, TripUpdate](
        GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        val prev = state.getOption.getOrElse(
          TripState(Long.MinValue, Vector.empty, Vector.empty))
        var lastTs = prev.lastTs
        var ts = prev.t
        var vs = prev.v
        // within-batch time order, deterministic tiebreak — then the
        // reference's monotonic rule against the running last timestamp
        def micros(t: Timestamp): Long = Times.micros(t)
        val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        sorted.foreach { e =>
          val us = micros(e.ts)
          val withinCap = maxTripSize <= 0 || ts.length < maxTripSize
          if (us > lastTs && withinCap) {
            lastTs = us
            ts :+= us
            vs :+= e.value
          }
        }
        val next = TripState(lastTs, ts, vs)
        state.update(next)
        TripUpdate(uid, ts.length.toLong,
          tsFromMicros(ts.headOption.getOrElse(0L)),
          tsFromMicros(ts.lastOption.getOrElse(0L)),
          vs.lastOption.getOrElse(Double.NaN))
      }
  }

  val outputMode: OutputMode = OutputMode.Update()

  // ---- gap-closed trips: watermark + flatMapGroupsWithState --------------

  case class ClosedTrip(user_id: Long, n_posits: Long, start_ts: Timestamp,
                        end_ts: Timestamp, t: Seq[Long], v: Seq[Double])

  /** Streaming twin of the batch gap-split (q36 /
    * [[graft.meos.Trajectory.gapSegments]]): a trip CLOSES when its
    * entity goes quiet for `gapSec` of event time — either observed
    * directly inside a batch (a posit lands ≥ gap after the previous one)
    * or via an event-time timeout once the watermark passes lastTs + gap.
    * Closed trips are emitted exactly once (Append mode); the open tail
    * stays in state. Late data beyond `lateness` never reaches the
    * operator. State per key is the open buffer, bounded by
    * `maxTripSize` — the same posture as [[assemble]].
    */
  def assembleGapSessions(events: Dataset[EventIn], gapSec: Long,
                          lateness: String = "5 minutes",
                          maxTripSize: Int = 0): Dataset[ClosedTrip] = {
    implicit val stateEnc = Encoders.product[TripState]
    implicit val outEnc = Encoders.product[ClosedTrip]
    implicit val keyEnc = Encoders.scalaLong
    val gapUs = gapSec * 1000000L
    def closed(uid: Long, st: TripState): ClosedTrip =
      ClosedTrip(uid, st.t.length.toLong,
        tsFromMicros(st.t.headOption.getOrElse(0L)),
        tsFromMicros(st.t.lastOption.getOrElse(0L)), st.t, st.v)
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TripState, ClosedTrip](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[TripState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap with no new posits: the open
            // trip is definitively closed
            val out = state.getOption.filter(_.t.nonEmpty)
              .map(closed(uid, _)).toIterator
            state.remove()
            out
          } else {
            val prev = state.getOption.getOrElse(
              TripState(Long.MinValue, Vector.empty, Vector.empty))
            var lastTs = prev.lastTs
            var ts = prev.t
            var vs = prev.v
            val emitted = Vector.newBuilder[ClosedTrip]
            def micros(t: Timestamp): Long = Times.micros(t)
            rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val us = micros(e.ts)
              if (us > lastTs) {
                // in-batch gap: close the current trip before starting anew
                if (ts.nonEmpty && us - lastTs >= gapUs) {
                  emitted += closed(uid, TripState(lastTs, ts, vs))
                  ts = Vector.empty; vs = Vector.empty
                }
                if (maxTripSize <= 0 || ts.length < maxTripSize) {
                  lastTs = us; ts :+= us; vs :+= e.value
                } // cap reached: drop, same as [[assemble]]'s P7 rule
              }
            }
            state.update(TripState(lastTs, ts, vs))
            if (lastTs != Long.MinValue)
              state.setTimeoutTimestamp(
                Math.floorDiv(lastTs, 1000L) + gapSec * 1000L)
            emitted.result().iterator
          }
      }
  }

  // ---- tgeompoint variant (the AIS stream itself: lon/lat posits) --------

  case class PositIn(mmsi: Long, t: Timestamp, seq: Long, lon: Double,
                     lat: Double)
  case class PointTripState(lastTs: Long, t: Vector[Long], x: Vector[Double],
                            y: Vector[Double])
  case class PointTripUpdate(mmsi: Long, n_posits: Long, start_ts: Timestamp,
                             end_ts: Timestamp, last_lon: Double,
                             last_lat: Double)

  /** 2-D analog of [[assemble]]: incremental tgeompoint trip per vessel. */
  def assemblePoints(posits: Dataset[PositIn], maxTripSize: Int = 0)
      : Dataset[PointTripUpdate] = {
    implicit val stateEnc = Encoders.product[PointTripState]
    implicit val outEnc = Encoders.product[PointTripUpdate]
    implicit val keyEnc = Encoders.scalaLong
    posits
      .groupByKey(_.mmsi)
      .mapGroupsWithState[PointTripState, PointTripUpdate](
        GroupStateTimeout.NoTimeout) { (mmsi, rows, state) =>
        val prev = state.getOption.getOrElse(
          PointTripState(Long.MinValue, Vector.empty, Vector.empty,
            Vector.empty))
        var lastTs = prev.lastTs
        var ts = prev.t
        var xs = prev.x
        var ys = prev.y
        def micros(t: Timestamp): Long = Times.micros(t)
        rows.toSeq.sortBy(p => (micros(p.t), p.seq)).foreach { p =>
          val us = micros(p.t)
          if (us > lastTs && (maxTripSize <= 0 || ts.length < maxTripSize)) {
            lastTs = us
            ts :+= us; xs :+= p.lon; ys :+= p.lat
          }
        }
        state.update(PointTripState(lastTs, ts, xs, ys))
        PointTripUpdate(mmsi, ts.length.toLong,
          tsFromMicros(ts.headOption.getOrElse(0L)),
          tsFromMicros(ts.lastOption.getOrElse(0L)),
          xs.lastOption.getOrElse(Double.NaN),
          ys.lastOption.getOrElse(Double.NaN))
      }
  }
}
