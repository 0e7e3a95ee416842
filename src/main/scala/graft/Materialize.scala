package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Every persistent-RDD id pinned by a [[cut]] in this JVM. Lets
    * [[releaseAll]] free exactly the cut-created scratch state without
    * evicting caches other code may own. */
  private val cutIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** The RDD ids a checkpoint pinned, read straight off the returned
    * Dataset's plan — `checkpoint`/`localCheckpoint` both hand back a
    * Dataset over a [[org.apache.spark.sql.execution.LogicalRDD]] leaf
    * wrapping the (to-be-)persisted RDD. Unlike a before/after
    * `getPersistentRDDs` keyset diff, this cannot misattribute an RDD a
    * CONCURRENT thread persisted in the window (which releaseAll would
    * then wrongly evict). On the reliable-checkpoint path the id names a
    * non-persistent RDD (blocks live in the checkpoint dir), so release
    * on it is a harmless no-op. */
  private def pinnedIds(out: DataFrame): Set[Int] =
    out.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet

  /** Datasets pinned through the [[cut]] persist path (lazy cuts), so
    * [[releaseAll]] can uncache exactly what cuts created. */
  private val persistedCuts =
    java.util.concurrent.ConcurrentHashMap
      .newKeySet[org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]]()

  /** Lazy-cut strategy switch (system property `graft.cut.mode`):
    * `persist` (default) shares the frame across consumers through the
    * block-manager cache — no materialization job, no lineage
    * truncation, spill-to-disk storage level; `checkpoint` forces the
    * pre-round-8 localCheckpoint/checkpoint behavior. Eager cuts
    * (iterative supersteps) ALWAYS checkpoint: they exist to truncate
    * lineage so superstep plans can't grow without bound, which persist
    * does not do. Measured at sf0.1 (QProf, steady state): the
    * checkpoint job + block writes cost ~0.5-1 s per cut at bench data
    * sizes, which dominated every cut-bearing query's runtime (qx36
    * 4.1 s → 1.5 s under persist). */
  private def lazyCutsPersist: Boolean =
    sys.props.getOrElse("graft.cut.mode", "persist") != "checkpoint"

  /** `eager = false` defers materialization to first use (right for
    * query-shaped code that only declares the plan); `eager = true` blocks
    * until written (right between iterative supersteps, where the caller
    * immediately consumes the result anyway).
    *
    * `checkpoint = true` forces the checkpoint path for a lazy cut —
    * measured per call site: deep DERIVATION CHAINS of cuts (a cut
    * aggregated into a second cut, re-joined against the first — the
    * Models facts, the curation pipeline's shared tok frame) lose cache
    * substitution for one consumer under persist and silently recompute
    * their producing shuffle, while flat "one frame, N self-join sides"
    * shapes (gram/band/signature staging) gain ~1-6 s per query by
    * skipping the checkpoint job. Flat shapes keep the persist default;
    * chained facts pass `checkpoint = true`.
    *
    * CALLER OBLIGATION: a persist-mode lazy cut holds a strong Dataset
    * reference in [[persistedCuts]] until [[releaseAll]] runs — Bench,
    * Verify, and QProf all call it per query, but any long-lived session
    * that calls cut() without a matching releaseAll accumulates pinned
    * cache entries (and on a real cluster, a persist cut trades the
    * reliable checkpoint's durability for recompute-from-lineage on
    * executor loss — acceptable for scratch frames inside one query,
    * wrong for state that must survive a superstep boundary, which is
    * why eager cuts always checkpoint). */
  /** `serialized` swaps the block storage to MEMORY_AND_DISK_SER on
    * both block-manager-backed paths — the default persist cut and the
    * localCheckpoint cut (no checkpoint dir configured). For a WIDE
    * frame (per-doc token arrays, embedding columns) consumed a
    * handful of times, object-per-row storage is the block-manager hog
    * (header + array wrapper per row) and the spill-sensitivity lever
    * behind the r13 qe31/qx81 driver-sidecar inflation; SER batches
    * shrink the footprint at the cost of one deserialize per read.
    * With a checkpoint dir set, reliable-checkpoint reads come from
    * the checkpoint files, so the flag has nothing to change (see the
    * inline note below). */
  def cut(df: DataFrame, eager: Boolean = false,
          checkpoint: Boolean = false,
          serialized: Boolean = false): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (!eager && !checkpoint && lazyCutsPersist) {
      val out = df.persist(
        if (serialized)
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
        else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persistedCuts.add(out)
      out
    } else {
      // `serialized` (LOCAL-checkpoint cuts only): store the blocks as
      // serialized partition batches instead of per-row UnsafeRow
      // objects — for a WIDE fact consumed a handful of times (the
      // Models gram facts), object-per-row storage is the single-JVM
      // memory hog (header + array-wrapper per row), while SER batches
      // cost one deserialize per read. This is what let qx36's 100×
      // probe fit the default 8 GB harness heap. When a checkpoint dir
      // IS configured the flag is moot, not ignored-by-accident: a
      // reliable checkpoint's reads come from the checkpoint FILES
      // (already-serialized on durable storage), not block-manager
      // row objects, so there is no in-memory object-per-row copy for
      // SER to shrink.
      val out =
        if (sc.getCheckpointDir.isDefined) df.checkpoint(eager)
        else if (serialized) df.localCheckpoint(eager,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        else df.localCheckpoint(eager)
      pinnedIds(out).foreach(cutIds.add)
      out
    }
  }

  /** Cut + report which persistent-RDD ids the cut pinned, so iterative
    * callers can free a superseded generation with [[release]] instead of
    * waiting for the GC-driven ContextCleaner (which, under a long job,
    * may never run before the block manager fills and starts evicting).
    * On the reliable-checkpoint path the ids name non-persistent RDDs
    * (blocks live in the checkpoint dir) and release is a no-op.
    */
  def cutTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val out = cut(df, eager = true)
    (out, pinnedIds(out))
  }

  /** Drop the blocks a [[cutTracked]] call pinned. Only call once every
    * consumer of that generation has been materialized past it (an eager
    * cut of the NEXT generation severs the dependence). */
  def release(spark: SparkSession, ids: Set[Int]): Unit = {
    val live = spark.sparkContext.getPersistentRDDs
    ids.foreach { id =>
      live.get(id).foreach(_.unpersist(blocking = false))
      cutIds.remove(id)
    }
  }

  /** Free every block pinned by a [[cut]] — scratch-state cleanup between
    * independent jobs (the bench harness calls this per query so one
    * query's lineage-cut blocks don't squat in the block manager and
    * evict the next query's shuffle/broadcast state). Releases ONLY
    * cut-created ids, so a suite-level `.cache()` owned by other code
    * survives (all cuts in this codebase are consumed within their own
    * query, so between queries every cut block is garbage). */
  def releaseAll(spark: SparkSession): Unit = {
    val live = spark.sparkContext.getPersistentRDDs
    val it = cutIds.iterator()
    while (it.hasNext) {
      live.get(it.next()).foreach(_.unpersist(blocking = false))
      it.remove()
    }
    val pit = persistedCuts.iterator()
    while (pit.hasNext) {
      // unpersist through the Dataset so the CacheManager entry (plan-
      // fragment match) goes with the blocks, not just the RDD storage
      try pit.next().unpersist(blocking = false)
      catch { case _: Throwable => () }
      pit.remove()
    }
  }
}
