package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.ext.Text

/** Streaming NEAR-duplicate detection — the firehose twin of the batch
  * minhash-LSH dedup (qx3/qx11), completing the streaming × dedup matrix
  * next to [[StreamingDedup]]'s exact-fingerprint variant.
  *
  * Contract: a document is flagged when ANY of its minhash band keys was
  * seen within the horizon — "drop if similar to anything seen", the
  * standard firehose contract (slightly aggressive vs batch connected
  * components: in a chain a~b~c where b was dropped, c still matches b's
  * bands — exactly how production stream dedup behaves, because waiting
  * for the keep/drop verdict of every earlier doc would serialize the
  * stream). The query emits the DROP LOG — (doc_id, band, first_doc) per
  * colliding band — which is the artifact production pipelines persist;
  * kept docs = input ∖ distinct dropped ids, an anti-join the consumer
  * (or the spec) applies.
  *
  * Scale shape: state is keyed by BAND (partitions across executors like
  * any keyed state, no per-doc fan-in), one entry per live band key,
  * evicted two ways: an event-time timeout fires once the watermark
  * passes `lastSeen + horizon`, and a same-key arrival after a gap
  * longer than the horizon resets the entry instead of matching it (the
  * timeout alone cannot help when the stale key and its successor meet
  * in one micro-batch). Within a micro-batch, rows of a band group are
  * processed in (ts, doc_id) order, so replays are deterministic.
  */
object StreamingNearDup extends Serializable {

  /** Carries the ORIGINAL event-time column (`ts`) — the watermark is
    * tracked on that attribute, and projecting it away before the
    * stateful operator breaks EventTimeTimeout analysis. */
  case class BandRow(band: String, doc_id: Long, ts: java.sql.Timestamp)
  case class BandState(firstDoc: Long, lastSeenMicros: Long)
  case class Drop(doc_id: Long, band: String, first_doc: Long)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** `docs` must carry `doc_id`, `text`, and event-time `tsCol`.
    * `watermarkDelay` bounds late data (Spark interval string);
    * `horizonMicros` is the near-dup matching window. */
  def dropLog(docs: DataFrame, tsCol: String, watermarkDelay: String,
              horizonMicros: Long, bands: Int = 4, shingleK: Int = 3)
      : Dataset[Drop] = {
    implicit val stateEnc = Encoders.product[BandState]
    implicit val outEnc = Encoders.product[Drop]
    implicit val keyEnc = Encoders.STRING
    implicit val rowEnc = Encoders.product[BandRow]
    val exploded = docs
      .withColumn("toks", Text.tokens(col("text")))
      .where(size(col("toks")) >= shingleK)
      .withWatermark(tsCol, watermarkDelay)
      .select(
        explode(Text.lshBandsFromToks(col("toks"), bands, shingleK))
          .as("band"),
        col("doc_id"), col(tsCol).as("ts"))
      .as[BandRow]
    exploded.groupByKey(_.band)
      .flatMapGroupsWithState[BandState, Drop](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (band, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq
              .sortBy(r => (micros(r.ts), r.doc_id))
            var st = state.getOption
            val out = Seq.newBuilder[Drop]
            sorted.foreach { r =>
              val t = micros(r.ts)
              st match {
                case Some(s) if t - s.lastSeenMicros <= horizonMicros =>
                  out += Drop(r.doc_id, band, s.firstDoc)
                  // max, not assign: a LATE row (t < lastSeen, possible
                  // across micro-batches since flatMapGroupsWithState sees
                  // watermark-late input) must not rewind the sighting
                  // clock — that would both evict the entry early and let
                  // a true near-dup inside the horizon re-enter as fresh
                  st = Some(s.copy(lastSeenMicros =
                    math.max(s.lastSeenMicros, t)))
                case _ =>
                  // fresh key, or the previous sighting aged past the
                  // horizon — this doc becomes the new first-seen
                  st = Some(BandState(r.doc_id, t))
              }
            }
            st.foreach { s =>
              state.update(s)
              // flatMapGroupsWithState does NOT pre-filter late input
              // (only aggregations/dropDuplicates do): a very late band
              // row could put lastSeen+horizon BEHIND the watermark, and
              // Spark rejects past-watermark timeouts with an exception —
              // clamp to watermark+1ms so the stale entry still evicts,
              // just on the next watermark advance
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(
                s.lastSeenMicros / 1000 + horizonMicros / 1000, wm + 1))
            }
            out.result().iterator
          }
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
