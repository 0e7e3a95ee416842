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
  * cardinality. Fold discipline: ln rounded at 9 per bucket, per-doc
  * sums folded in value order (bit parity with the DuckDB twins,
  * qx34 precedent).
  */
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
    val hb = graft.Materialize.cut(
      bucketedGrams(docs.withColumn("tgt", isTarget), Seq("tgt"), buckets))
    val occ = hb.groupBy("doc_id", "b").agg(count(lit(1)).as("k"))
    val cs = hb.groupBy("b").agg(count(lit(1)).as("c"))
    val ct = hb.where(col("tgt")).groupBy("b").agg(count(lit(1)).as("c"))
    val ns = cs.agg(sum(col("c")).cast("double").as("n"))
    val nt = ct.agg(coalesce(sum(col("c")), lit(0L)).cast("double")
      .as("m"))
    val lam = cs.join(ct.withColumnRenamed("c", "tc"), Seq("b"), "left")
      .crossJoin(broadcast(ns))
      .crossJoin(broadcast(nt))
      .select(col("b"), round(
        log((coalesce(col("tc"), lit(0L)).cast("double") + lit(0.5)) /
          (col("m") + lit(0.5) * buckets)) -
        log((col("c").cast("double") + lit(0.5)) /
          (col("n") + lit(0.5) * buckets)), 9).as("lam"))
    occ.join(lam, "b")
      .select(col("doc_id"), col("k"),
        (col("k").cast("double") * col("lam")).as("w"))
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_grams"),
        array_sort(collect_list(col("w"))).as("ws"))
      .select(col("doc_id"), col("n_grams"),
        aggregate(col("ws"), lit(0.0), (a, x) => a + x)
          .as("dsir_weight"))
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
    val hb = graft.Materialize.cut(
      bucketedGrams(docs.withColumn("lbl", col(labelCol)), Seq("lbl"),
        buckets))
    val occ = hb.groupBy("doc_id", "b").agg(count(lit(1)).as("k"))
    val clb = hb.groupBy("lbl", "b").agg(count(lit(1)).as("c"))
    val nl = clb.groupBy("lbl").agg(sum(col("c")).as("nl"))
    val grid = hb.select("b").distinct().crossJoin(broadcast(nl))
    val plb = grid.join(clb, Seq("lbl", "b"), "left")
      .select(col("lbl"), col("b"), round(log(
        (coalesce(col("c"), lit(0L)).cast("double") + lit(0.5)) /
          (col("nl").cast("double") + lit(0.5) * buckets)), 9).as("lnp"))
    val labeled = docs.select(col("doc_id"), col(labelCol).as("label"))
    val nDocs = labeled.count()
    val prior = labeled.groupBy(col("label").as("lbl"))
      .agg(round(log(count(lit(1)).cast("double") / nDocs.toDouble), 9)
        .as("lnprior"))
    val score = occ.join(plb, "b")
      .select(col("doc_id"), col("lbl"),
        (col("k").cast("double") * col("lnp")).as("w"))
      .groupBy("doc_id", "lbl")
      .agg(array_sort(collect_list(col("w"))).as("ws"))
      .join(broadcast(prior), "lbl")
      .select(col("doc_id"), col("lbl"),
        (aggregate(col("ws"), lit(0.0), (a, x) => a + x) +
          col("lnprior")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lbl"))
    score.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .join(labeled, "doc_id")
      .select(col("doc_id"), col("label"), col("lbl").as("pred"),
        (col("lbl") === col("label")).as("correct"))
  }
}
