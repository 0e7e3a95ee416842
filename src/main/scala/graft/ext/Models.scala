package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained hashed-feature models for curation gates — the
  * "cheap classifier" tier of an LLM data pipeline (DSIR importance
  * weights, fastText-style Naive Bayes) with no external model file.
  *
  * Both operate on a FIXED B-bucket feature space (unigram ∪ bigram
  * 60-bit gram keys mod B, the qx16/qx31 hashing): model frames are
  * ≤ B (or labels × B) rows no matter the corpus size, so they
  * broadcast against the (doc, bucket) fact, which shuffles once at
  * ≤ doc-length grain — corpus size never enters a join key's
  * cardinality.
  *
  * Bit-parity discipline — EXACT INTEGER LOG-SPACE, not the qx34
  * value-ordered fold: each per-bucket log-likelihood is scaled to a
  * BIGINT of nano-nats (`round(ln(..)·1e9)` — the same 9-decimal
  * quantization as `round(x, 9)`, expressed in integer space), so the
  * per-doc score is a plain commutative integer SUM — no collect_list,
  * no array_sort, partial-aggregable map-side — and cross-engine
  * equality (and NB's argmax tie-break) is exact by construction.
  * Overflow headroom: |ln p| < 25 ⇒ |li| < 2.5e10; k·li < ~5e14 per
  * bucket; ≤ B buckets per doc ⇒ |score| < 5e18 < 2⁶³.
  *
  * The gram stream is deliberately NOT lineage-cut: its two consumers
  * (the doc-grain fact rollup and the model rollup) each re-run the
  * pushed-down scan + fused hash kernel — cheap CPU over a pruned
  * column — where materializing the exploded stream would write ~10×
  * the corpus (at 100 TB, a petabyte of scratch) to save that one
  * re-scan. Measured faster uncut even at sf0.1. */
object Models {

  val DefaultBuckets = 8192

  /** (doc_id, <carry cols>, b) — one row per unigram+bigram occurrence,
    * bucketed into the fixed feature space. `docs` must carry
    * `doc_id` and a `toks` array column (≥ 3 tokens — caller filters). */
  def bucketedGrams(docs: DataFrame, carry: Seq[String],
                    buckets: Int = DefaultBuckets): DataFrame = {
    import graft.meos.NativeExpressions.shingleHashes
    docs.select((col("doc_id") +: carry.map(col) :+
        explode(concat(shingleHashes(col("toks"), 1),
          shingleHashes(col("toks"), 2))).as("h")): _*)
      .select((col("doc_id") +: carry.map(col) :+
        (col("h") % buckets).as("b")): _*)
  }

  /** DSIR importance weights (Xie et al. 2023): per-doc
    * Σ_b k_b·(ln p̂_target(b) − ln p̂_source(b)) with add-0.5 smoothing
    * over the fixed bucket space; `isTarget` marks the high-quality
    * reference slice. Docs absent from `docs` (caller's length filter)
    * are the caller's to re-attach. Returns (doc_id, n_grams,
    * dsir_weight). */
  def dsirWeights(docs: DataFrame, isTarget: Column,
                  buckets: Int = DefaultBuckets): DataFrame = {
    val hb = bucketedGrams(docs.withColumn("tgt", isTarget), Seq("tgt"),
      buckets)
    val occ = hb.groupBy("doc_id", "b").agg(count(lit(1)).as("k"))
    // one (tgt, b) rollup feeds both models and both totals — CUT, so
    // its four consumers read a ≤ 2B-row materialized frame instead of
    // each re-running the gram stream (the fact is read exactly twice:
    // occ + this)
    val ctb = graft.Materialize.cut(
      hb.groupBy("tgt", "b").agg(count(lit(1)).as("c")))
    val cs = ctb.groupBy("b").agg(sum(col("c")).as("c"))
    val ct = ctb.where(col("tgt")).select(col("b"), col("c"))
    val ns = cs.agg(sum(col("c")).cast("double").as("n"))
    val nt = ct.agg(coalesce(sum(col("c")), lit(0L)).cast("double")
      .as("m"))
    val lam = cs.join(ct.withColumnRenamed("c", "tc"), Seq("b"), "left")
      .crossJoin(broadcast(ns))
      .crossJoin(broadcast(nt))
      .select(col("b"), round((
        log((coalesce(col("tc"), lit(0L)).cast("double") + lit(0.5)) /
          (col("m") + lit(0.5) * buckets)) -
        log((col("c").cast("double") + lit(0.5)) /
          (col("n") + lit(0.5) * buckets))) * 1e9, 0).cast("long")
        .as("lam_n"))
    occ.join(lam, "b")
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_grams"),
        sum(col("k") * col("lam_n")).as("w_n"))
      .select(col("doc_id"), col("n_grams"),
        (col("w_n").cast("double") / 1e9).as("dsir_weight"))
  }

  /** Multinomial Naive Bayes over the bucket space, trained on `docs`'s
    * own `labelCol` and applied back to it: per-label bucket
    * log-likelihoods (add-0.5) + log prior, argmax per doc with the
    * smallest label breaking exact ties. Unobserved buckets contribute
    * the same smoothed constant to every class and cannot move an
    * argmax, so the model grid covers observed buckets only. Returns
    * (doc_id, label, pred, correct). */
  def nbClassify(docs: DataFrame, labelCol: String,
                 buckets: Int = DefaultBuckets): DataFrame = {
    val hb = bucketedGrams(docs.withColumn("lbl", col(labelCol)),
      Seq("lbl"), buckets)
    val occ = hb.groupBy("doc_id", "b").agg(count(lit(1)).as("k"))
    // the (label, b) rollup feeds the likelihood grid, totals, and the
    // observed-bucket set — CUT (≤ labels×B rows), so the fact stream is
    // read exactly twice (occ + this)
    val clb = graft.Materialize.cut(
      hb.groupBy("lbl", "b").agg(count(lit(1)).as("c")))
    val nl = clb.groupBy("lbl").agg(sum(col("c")).as("nl"))
    val grid = clb.select("b").distinct().crossJoin(broadcast(nl))
    val plb = grid.join(clb, Seq("lbl", "b"), "left")
      .select(col("lbl"), col("b"), round(log(
        (coalesce(col("c"), lit(0L)).cast("double") + lit(0.5)) /
          (col("nl").cast("double") + lit(0.5) * buckets)) * 1e9, 0)
        .cast("long").as("lnp_n"))
    val labeled = docs.select(col("doc_id"), col(labelCol).as("label"))
    val nDocs = labeled.count()
    val prior = labeled.groupBy(col("label").as("lbl"))
      .agg(round(log(count(lit(1)).cast("double") / nDocs.toDouble) * 1e9,
        0).cast("long").as("lnprior_n"))
    val score = occ.join(plb, "b")
      .groupBy("doc_id", "lbl")
      .agg(sum(col("k") * col("lnp_n")).as("w_n"))
      .join(broadcast(prior), "lbl")
      .select(col("doc_id"), col("lbl"),
        (col("w_n") + col("lnprior_n")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lbl"))
    score.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .join(labeled, "doc_id")
      .select(col("doc_id"), col("label"), col("lbl").as("pred"),
        (col("lbl") === col("label")).as("correct"))
  }
}
