package graft

import org.apache.spark.sql.functions._

/** Planted-invariant specs for the round-9 work — the semDedup hot-cell
  * guard foremost: the capped formulation must bound work on a collapsed
  * embedding distribution (the qe18 anisotropy failure mode) while
  * agreeing exactly with the uncapped one whenever no cell exceeds the
  * cap. */
class Round9Spec extends SparkTestBase {
  import spark.implicits._

  test("semDedup hot-cell cap: a fully collapsed corpus (every vector " +
    "identical → one hot cell) chunks by id-rank; each chunk keeps its " +
    "min id and dominates the rest, so pair work is n·cap, not n²") {
    val n = 40
    val cap = 8
    val emb = (0 until n).map(i => (i.toLong, Seq.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val out = ext.Similarity.semDedup(emb, tau = 0.9, nlist = 4,
      cellCap = cap).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out.size == n)
    // identical vectors tie to one cell; chunks are id-runs of `cap`
    (0 until n).foreach { i =>
      val chunkMin = (i / cap) * cap
      val (kept, dupOf) = out(i.toLong)
      if (i == chunkMin) {
        assert(kept && dupOf.isEmpty, s"vec $i should head its chunk")
      } else {
        assert(!kept && dupOf.contains(chunkMin.toLong),
          s"vec $i should be dominated by chunk head $chunkMin, " +
            s"got $dupOf")
      }
    }
  }

  test("semDedup cap is a no-op when every cell is under it: capped and " +
    "uncapped runs agree row-for-row on the fixture embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val key = Some(s"$sfDir|round9spec|nlist=16|iters=5")
    val uncapped = ext.Similarity.semDedup(emb, 0.4, cellCap = 0,
      cacheKey = key).orderBy("vec_id").collect().toSeq
    val capped = ext.Similarity.semDedup(emb, 0.4, cellCap = 4096,
      cacheKey = key).orderBy("vec_id").collect().toSeq
    assert(capped == uncapped)
    assert(capped.nonEmpty)
  }

  test("session_window boundary rule: an event at EXACTLY lastTs+gap " +
    "MERGES (inclusive session end), one tick past the gap opens a new " +
    "session — the rule the qs7 twin's strict > break encodes") {
    val gapUs = 10_000_000L // 10 s
    def sessions(ts: Seq[Long]): Seq[Long] = {
      val df = ts.map(u => (1L, new java.sql.Timestamp(u / 1000L)))
        .toDF("user_id", "ts")
      df.groupBy(col("user_id"), session_window(col("ts"), "10 seconds"))
        .agg(count(lit(1)).as("n"))
        .select(col("n")).collect().map(_.getLong(0)).toSeq.sorted
    }
    assert(sessions(Seq(0L, gapUs)) == Seq(2L),
      "exact-gap event must merge into the session")
    assert(sessions(Seq(0L, gapUs + 1000L)) == Seq(1L, 1L),
      "one tick past the gap must open a new session")
  }

  test("semDedup capped run is conservative: every vector it keeps " +
    "includes all vectors the uncapped run keeps (under-merge only)") {
    val emb = Tables.embeddings(spark, sfDir)
    val key = Some(s"$sfDir|round9spec|nlist=16|iters=5")
    def keptSet(cap: Int): Set[Long] =
      ext.Similarity.semDedup(emb, 0.4, cellCap = cap, cacheKey = key)
        .where(col("kept")).select("vec_id").collect()
        .map(_.getLong(0)).toSet
    val uncappedKept = keptSet(0)
    val tightKept = keptSet(8)
    assert(uncappedKept.subsetOf(tightKept),
      "chunking may only miss dominations, never invent them")
  }
}
