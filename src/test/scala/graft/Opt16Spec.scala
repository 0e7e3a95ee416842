package graft

import org.apache.spark.sql.functions._

/** Round-16 OPTIMIZATION pins: the fused sweep reshapes must be
  * value-identical to the per-setting formulations they replaced.
  *
  * qe25 (semDedupSweep): the three per-cap semDedup legs collapsed
  * into one pair pass exploiting power-of-two chunk-count nesting —
  * this spec recomputes every cap through the UNCHANGED semDedup and
  * compares counts.
  *
  * qx59 (band sweep): the three bandedPairs legs collapsed into one
  * min-collide-position pass exploiting position-prefixed band values
  * — this spec recomputes every band setting through the UNCHANGED
  * bandedPairs and compares candidate/hit counts.
  */
class Opt16Spec extends SparkTestBase {

  test("semDedupSweep == per-cap semDedup on a multi-cell corpus with " +
    "hot cells (both chunked and unchunked cap regimes exercised)") {
    import spark.implicits._
    // 40 vectors in 2 natural clusters plus exact-dup runs, so small
    // caps chunk (cell_n > cap) and the big cap does not
    val emb = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Seq(1.0f, 0.0f, 0.0f, 0.0f)
      else Seq(0.0f, 1.0f, 0.0f, 0.0f)
      val jitter = (i / 10).toFloat * 0.01f
      (i.toLong, base.map(_ + jitter), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val caps = Seq(4, 8, 4096)
    val key = Some("r16spec-sweep")
    val fused = ext.Similarity
      .semDedupSweep(emb, 0.4, caps, nlist = 4, cacheKey = key)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val legged = caps.sorted.map { cap =>
      val rows = ext.Similarity
        .semDedup(emb, 0.4, nlist = 4, cellCap = cap, cacheKey = key)
        .agg(sum(when(col("kept"), 1L).otherwise(0L)),
          sum(when(!col("kept"), 1L).otherwise(0L)))
        .collect().head
      (cap.toLong, rows.getLong(0), rows.getLong(1))
    }
    assert(fused.toSeq == legged,
      s"fused=${fused.toSeq} vs per-cap=$legged")
  }

  test("qx59 fused min-collide-position sweep == per-setting " +
    "bandedPairs legs on the fixture corpus") {
    val dir = sfDir
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", ext.Text.tokens(col("text")))
      .where(size(col("toks")) >= 3)
    val mh = docs.select(col("doc_id"),
      ext.Text.lshBandsFromToks(col("toks"), bands = 8).as("mh"))
    // per-setting legs through the UNCHANGED production bandedPairs
    val legged = Seq(2, 4, 8).map { b =>
      val sig = mh.select(col("doc_id"),
        explode(slice(col("mh"), 1, b)).as("band"))
      b.toLong -> ext.Dedup.bandedPairs(sig)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }.toMap
    // the fused query's n_cand per setting must equal the leg counts
    val fused = SparkEntry.queries("qx59_band_sweep")(spark, dir)
      .select("bands", "n_cand").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(2L, 4L, 8L).foreach { b =>
      // a setting with zero candidates emits no row (the HAVING contract)
      assert(fused.getOrElse(b, 0L) == legged(b).size.toLong,
        s"bands=$b fused=${fused.get(b)} legged=${legged(b).size}")
    }
  }
}
