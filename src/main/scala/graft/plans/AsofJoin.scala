package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the
  * latest right row with the same key and `rightTime <= leftTime`
  * (time-series point-in-time enrichment — "the user's most recent signup
  * / the instrument's last quote as of this event").
  *
  * Implementation is the union-tag trick, not a range probe: tag right
  * rows src=0 and left rows src=1, union, ONE window partitioned by key
  * and ordered by (time, src) propagates the last non-null payload
  * forward (`last(..., ignoreNulls)` over an unbounded-preceding row
  * frame), keep the left rows. At same (key, time) the right row sorts
  * before the left row, so "at or before" includes equal timestamps.
  *
  * Scale shape: a single shuffle on the join key (the window exchange) —
  * no per-row subquery, no range join explosion, no broadcast requirement
  * on either side; skew follows the key distribution exactly like any
  * windowed aggregation. Spark has no native as-of join (pandas-on-Spark
  * `merge_asof` rewrites to a range join that needs bounds); this is the
  * declarative equivalent with deterministic tie behavior.
  *
  * The right side is first deduplicated to one row per (key, time) by
  * descending `tieBreak` — required for cross-engine determinism (DuckDB's
  * native ASOF JOIN, used as the oracle twin, leaves same-timestamp ties
  * unspecified otherwise).
  */
object AsofJoin {

  /** @param payload  right-side columns to attach, renamed `asof_<name>`
    * @param tieBreak right-side column ordering same-(key,time) duplicates;
    *                 the row with the LARGEST value wins */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String], tieBreak: String): DataFrame =
    joinImpl(left, right, key, leftTime, rightTime, payload, tieBreak,
      forward = false)

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * ("the next maintenance slot / the next quote after this event").
    * Same one-shuffle union-tag plan with the time axis reversed; at
    * equal timestamps the right row is still visible to the left row,
    * and same-(key,time) right duplicates resolve to the largest
    * tieBreak, mirroring [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payload: Seq[String], tieBreak: String): DataFrame =
    joinImpl(left, right, key, leftTime, rightTime, payload, tieBreak,
      forward = true)

  private def joinImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       payload: Seq[String], tieBreak: String,
                       forward: Boolean): DataFrame = {
    val wDedup = Window.partitionBy(col(key), col(rightTime))
      .orderBy(col(tieBreak).desc)
    val r1 = right
      .withColumn("__rn", row_number().over(wDedup))
      .where(col("__rn") === 1)
      .select(col(key).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__src"),
        struct(payload.map(col): _*).as("__p"))
    val l1 = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__src"), struct(left.columns.map(col): _*).as("__l"))
    // forward flips the time sort; src stays ascending so the right row
    // at an equal timestamp still precedes the left row in the frame
    val w = Window.partitionBy("__k")
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l1.unionByName(r1, allowMissingColumns = true)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__src") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
