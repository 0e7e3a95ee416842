package graft

import org.apache.spark.sql.DataFrame

/** Shared lineage cut for frames that feed several consumers (self-join
  * sides, iterative supersteps): materialize once instead of re-running
  * the producing pipeline per consumer.
  *
  * Durability posture: when the session has a checkpoint dir configured
  * (`sparkContext.setCheckpointDir` → durable storage on a real cluster),
  * use a RELIABLE checkpoint — `localCheckpoint` keeps blocks on executor
  * memory/disk only, so losing one executor after lineage truncation kills
  * the job. Without a checkpoint dir (local runs, tests) fall back to
  * `localCheckpoint`: same semantics, no durability, zero setup.
  */
object Materialize {

  /** `eager = false` defers materialization to first use (right for
    * query-shaped code that only declares the plan); `eager = true` blocks
    * until written (right between iterative supersteps, where the caller
    * immediately consumes the result anyway). */
  def cut(df: DataFrame, eager: Boolean = false): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
