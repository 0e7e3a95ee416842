package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Text

/** Streaming trending-terms: top-k tokens per event-time window — the
  * firehose twin of the batch per-source vocabulary rollups (qx30's rank
  * stage; no reference counterpart, the reference is batch-only,
  * SURVEY.md §2.9).
  *
  * Built as CHAINED stateful aggregations in append mode (supported
  * natively since Spark 3.4 — no hand-rolled state):
  *
  *   1. `groupBy(window(ts), term).count()` — per-window term counts,
  *      finalized when the watermark passes the window end;
  *   2. `groupBy(window).agg(collect_list(struct(cnt, term)))` — the
  *      closed window's vocabulary gathered in one row;
  *   3. a STATELESS sort+slice picks the top k (count desc, term asc for
  *      determinism at ties).
  *
  * State posture at scale: stage 1's state is (open windows × distinct
  * terms) — bounded by the watermark horizon, partitioned by (window,
  * term), map-side partial counts absorb the heavy hitters. Stage 2 holds
  * one in-flight row per open window whose size is the window's distinct
  * vocabulary; for corpora where that is too wide, cap the carry by
  * pre-filtering stage 1's output on a minimum count (the `minCount`
  * knob) — the standard guard, exact for any term whose true count meets
  * the floor.
  */
object StreamingTopTerms {

  /** `docs` must contain `text` and the event-time column `tsCol`.
    * Emits one row per closed window: (win_start, win_end, top) where
    * `top` is the top-`k` (term, cnt) structs, count-descending. */
  def topTerms(docs: DataFrame, tsCol: String, watermarkDelay: String,
               windowDur: String, k: Int, minCount: Long = 1L)
      : DataFrame = {
    val counts = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol).as("ts"), explode(Text.tokens(col("text")))
        .as("term"))
      .groupBy(window(col("ts"), windowDur), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    counts
      .groupBy(col("window"))
      .agg(collect_list(struct(col("cnt"), col("term"))).as("vocab"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        slice(array_sort(col("vocab"), (l, r) => {
          // count DESC, term ASC at ties — deterministic emission order
          val lc = l.getField("cnt"); val rc = r.getField("cnt")
          val lt = l.getField("term"); val rt = r.getField("term")
          when(lc > rc, lit(-1)).when(lc < rc, lit(1))
            .when(lt < rt, lit(-1)).when(lt > rt, lit(1))
            .otherwise(lit(0))
        }), 1, k).as("top"))
  }
}
