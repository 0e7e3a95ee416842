package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Text

/** Streaming exact deduplication — the firehose twin of the batch
  * `qx1_dedup_exact` fingerprint dedup (no reference counterpart; the
  * reference is batch-only, SURVEY.md §2.9).
  *
  * Uses `dropDuplicatesWithinWatermark`, not `dropDuplicates`: the plain
  * variant keeps every fingerprint ever seen (state grows without bound —
  * fatal on an unbounded stream), while the watermark variant evicts
  * fingerprints once the event-time watermark passes them, so state is
  * bounded by the dedup horizon × ingest rate regardless of how long the
  * stream runs. Semantics: a doc is dropped if a doc with the same
  * content fingerprint arrived within the watermark horizon; duplicates
  * farther apart than the horizon are re-admitted (the standard
  * time-bounded dedup contract).
  */
object StreamingDedup {

  /** `docs` must contain `text` and the event-time column `tsCol`.
    * Returns the stream with exact duplicates (by normalized-content
    * fingerprint, [[Text.fingerprint]]) dropped within `horizon`. */
  def dedupByFingerprint(docs: DataFrame, tsCol: String,
                         horizon: String): DataFrame =
    docs.withColumn("fp", Text.fingerprint(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")
}
