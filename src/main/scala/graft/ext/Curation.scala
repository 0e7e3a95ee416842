package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] The end-to-end training-data curation pipeline — the canonical
  * sequence a 100 TB corpus runs before tokenization, composed from this
  * engine's own operators into ONE declarative plan:
  *
  *   1. benchmark partition   (the held-out eval set is never training data)
  *   2. quality gate          (composite score, qx7)
  *   3. repetition gate       (Gopher top-term/top-bigram ratios, qx15)
  *   4. near-dup dedup        (minhash-LSH connected components, qx11)
  *   5. decontamination       (shared n-gram with the benchmark set, qx13)
  *   6. stratified sampling   (deterministic hash threshold per lang, qx12)
  *
  * Every stage's flag is computed independently over the corpus (narrow
  * maps + the already-scaled dedup/decontam shapes), then drops are
  * ATTRIBUTED by stage priority — how production pipelines report loss
  * accounting. All math is the oracle-parity arithmetic of the underlying
  * queries, so the whole pipeline hash-matches its DuckDB twin.
  */
object Curation {

  /** (doc_id, top_term_ratio, top_bigram_ratio) — the qx15 ratios. */
  def repetitionRatios(docs: DataFrame): DataFrame =
    repetitionRatiosFromToks(
      docs.withColumn("toks", Text.tokens(col("text"))))

  /** [[repetitionRatios]] over a pre-tokenized frame (doc_id, toks).
    * A doc's tokens all live in its own row, so both Gopher ratios are a
    * NARROW MAP over the one-pass max-run kernel (k=1 terms, k=2
    * bigrams) — the explode + groupBy + max + join formulation this
    * replaces shuffled every token twice. Counts are exact integers and
    * the single double division matches the DuckDB twins bit-for-bit. */
  def repetitionRatiosFromToks(tok: DataFrame): DataFrame = {
    import graft.meos.NativeExpressions.maxRunCount
    tok.select(col("doc_id"),
      when(size(col("toks")) >= 1,
        maxRunCount(col("toks"), 1).cast("double") /
          size(col("toks")).cast("double"))
        .otherwise(lit(0.0)).as("top_term_ratio"),
      when(size(col("toks")) >= 2,
        maxRunCount(col("toks"), 2).cast("double") /
          (size(col("toks")) - 1).cast("double"))
        .otherwise(lit(0.0)).as("top_bigram_ratio"))
  }

  private val obsSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Full pipeline verdict per document: (doc_id, kept, drop_reason)
    * with `drop_reason` null for kept docs. All flag frames join back on
    * doc_id — co-partitioned shuffles AQE coalesces; nothing here is
    * quadratic or driver-side.
    *
    * `observationName` labels the run's CollectMetrics row; the default
    * is unique per call (`curation-<n>`) so concurrent or interleaved
    * executions in one session stay attributable — pass an explicit name
    * when a listener needs to await a SPECIFIC run. */
  def pipeline(docs: DataFrame, minScore: Double = 6.5,
               maxTermRatio: Double = 0.2, maxBigramRatio: Double = 0.18,
               observationName: String = s"curation-${obsSeq.incrementAndGet()}",
               clustersFlag: Option[DataFrame] = None)
      : DataFrame = {
    // tokenize ONCE for all five stages — a lineage cut shares the
    // (doc_id, lang, n_chars, toks) frame across quality, repetition,
    // minhash-dedup and both decontamination sides (the uncut form
    // re-scanned and re-split the corpus four times)
    val tok = graft.Materialize.cut(docs
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("toks")),
      checkpoint = true)
    val probe = tok.where(col("doc_id") % 97 === 0)
    val train = tok.where(col("doc_id") % 97 =!= 0)
    val quality = tok
      .select(col("doc_id"),
        Text.qualityScore(col("toks"), col("n_chars")).as("score"))
    val rep = repetitionRatiosFromToks(tok)
      .select(col("doc_id"),
        (col("top_term_ratio") > maxTermRatio ||
          col("top_bigram_ratio") > maxBigramRatio).as("repetitive"))
    // `clustersFlag` (round 17): the dedup stage's (doc_id, keeper) flag
    // is exactly [[Dedup.minhashClusters]] over the same corpus, which
    // the qx11/qz7 family already stages per dir — a caller holding that
    // staged fact passes it here instead of re-running the banding + CC
    // chain (eager cuts, a count, a driver union-find) on every
    // evaluation. Default None keeps the self-contained live chain.
    val clusters = clustersFlag.getOrElse(
      Dedup.minhashClustersFromToks(tok)
        .select(col("doc_id"), col("keeper")))
    val contam = Dedup.decontaminateFromToks(train, probe)
      .select(col("doc_id"), col("contaminated"))
    val keepBelow = when(col("lang") === "en", lit("40000000"))
      .when(col("lang") === "zh", lit("80000000"))
      .otherwise(lit("c0000000"))
    tok.select(col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string")), 1, 8).as("bucket"))
      .join(quality, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("drop_reason",
        when(col("doc_id") % 97 === 0, lit("benchmark"))
          .when(col("score") < minScore, lit("quality"))
          .when(col("repetitive"), lit("repetition"))
          .when(!coalesce(col("keeper"), lit(true)), lit("near_dup"))
          .when(coalesce(col("contaminated"), lit(false)), lit("contaminated"))
          .when(col("bucket") >= keepBelow, lit("sampled_out")))
      .select(col("doc_id"), col("drop_reason").isNull.as("kept"),
        col("drop_reason"))
      // free data-quality accounting: CollectMetrics rides the existing
      // pass (no second scan, no action) and surfaces total/kept/dropped
      // per run through QueryExecutionListener.observedMetrics — at
      // 100 TB a separate count() audit would cost another full read
      .observe(observationName,
        count(lit(1)).as("docs_total"),
        sum(when(col("drop_reason").isNull, 1L).otherwise(0L))
          .as("docs_kept"))
  }
}
