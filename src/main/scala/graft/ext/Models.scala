package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  * One-pass fact discipline: the gram stream is exploded ONCE, rolled
  * straight up to the (doc, bucket) occurrence fact `occ`, and `occ` is
  * the only materialized frame — the model rollup derives from `occ` by
  * a second aggregation (Σk per (slice, bucket) ≡ the raw per-bucket
  * count), never from a second explode. The raw exploded stream itself
  * is never cut: it is ~10× the corpus (at 100 TB, a petabyte of
  * scratch), while `occ` is the smallest frame both consumers can share
  * and is needed for scoring regardless. */
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
    // ONE explode: the (doc, bucket) fact is the only materialized frame
    // (tgt rides along — functionally dependent on doc_id, so the extra
    // key changes nothing but makes the model rollup derivable below)
    val occ = graft.Materialize.cut(
      hb.groupBy("doc_id", "tgt", "b").agg(count(lit(1)).as("k")),
      checkpoint = true)
    // the (tgt, b) model rollup DERIVES from occ (Σk ≡ the raw per-bucket
    // count) — no second gram-stream pass; cut again (≤ 2B rows) so its
    // four consumers read the tiny frame, not 4× re-agg occ
    val ctb = graft.Materialize.cut(
      occ.groupBy("tgt", "b").agg(sum(col("k")).as("c")),
      checkpoint = true)
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
                 buckets: Int = DefaultBuckets,
                 labelSource: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // dictionary-encode the label BEFORE the gram explode: the fact rows
    // and both checkpointed cuts carry a compact integer code instead of
    // a string (round-9 probe finding: the fact's per-row weight is what
    // blew the single-JVM heap at 100×). The dict is ≤ |labels| rows —
    // the row_number window is a one-task sort of a handful of rows, and
    // the attach is a broadcast. Codes order by label so the min-code
    // tie-break below still means min-LABEL (oracle rule unchanged).
    //
    // `labelSource` (round 17): the dict subtree is evaluated THREE
    // times (the hb attach + the two name attaches at the end), and when
    // it derives from `docs` — a ≥3-token-filtered tokenized frame —
    // each evaluation re-scans and re-splits the full text column just
    // to apply a filter the label distinct doesn't need. A caller may
    // pass the UNFILTERED table instead: its label set is a superset,
    // codes stay label-ordered (so every tie-break and min-code argument
    // is order-isomorphic on any subset), and labels absent from `docs`
    // never reach occ/clb/prior/score, so the OUTPUT is unchanged —
    // only the dict legs drop from full-text scans to a pruned
    // label-column scan. (A lazy persist of the dict was tried instead
    // and REJECTED: the InMemoryRelation defeated downstream broadcast
    // planning — 0 → 2 SortMergeJoins on the occ⋈plb fact join.)
    val dict = broadcast(
      labelSource.getOrElse(docs)
        .select(col(labelCol).as("lbl")).distinct()
        .withColumn("lblc",
          // GLOBAL-WINDOW BOUND (label-vocab): ≤ |labels| rows
          row_number().over(Window.orderBy("lbl")).cast("long")))
    val hb = bucketedGrams(
      docs.withColumn("lbl", col(labelCol)).join(dict, "lbl"),
      Seq("lblc"), buckets)
    // ONE explode: the (doc, bucket) fact is the only gram-stream pass
    // (lblc rides along, functionally dependent on doc_id). SERIALIZED
    // block storage: the fact is the one frame whose footprint scales
    // with corpus × doc length, so it spills compactly instead of
    // holding object-per-row blocks
    val occ = graft.Materialize.cut(
      hb.groupBy("doc_id", "lblc", "b").agg(count(lit(1)).as("k")),
      checkpoint = true, serialized = true)
    // the (label, b) model rollup derives from occ — no second explode;
    // cut again (≤ labels×B rows) for its consumers
    val clb = graft.Materialize.cut(
      occ.groupBy("lblc", "b").agg(sum(col("k")).as("c")),
      checkpoint = true)
    val nl = clb.groupBy("lblc").agg(sum(col("c")).as("nl"))
    val grid = clb.select("b").distinct().crossJoin(broadcast(nl))
    val plb = grid.join(clb, Seq("lblc", "b"), "left")
      .select(col("lblc"), col("b"), round(log(
        (coalesce(col("c"), lit(0L)).cast("double") + lit(0.5)) /
          (col("nl").cast("double") + lit(0.5) * buckets)) * 1e9, 0)
        .cast("long").as("lnp_n"))
    // (doc, own-label) derives from the materialized fact — `docs` is a
    // filtered tokenized frame, so reading it again would re-run the
    // tokenize+filter scan over the raw corpus once per consumer; occ
    // covers exactly the same doc set (≥ 3 tokens ⇒ ≥ 1 gram). ONE
    // doc-grain rollup (cut, persist path — flat shape) now feeds both
    // the prior and the final own-label join; round 9 ran the identical
    // aggregation twice
    val docLbl = graft.Materialize.cut(
      occ.groupBy("doc_id").agg(first(col("lblc")).as("lblc")))
    // prior fully in-plan: label counts + the one-row total fold into
    // the same frame (a driver-side count() here would serialize a whole
    // extra corpus job before the score stage can even be submitted)
    val lblCnt = docLbl.groupBy("lblc").agg(count(lit(1)).as("nd"))
    val prior = lblCnt
      .crossJoin(broadcast(lblCnt.agg(sum(col("nd")).as("ntot"))))
      .select(col("lblc"),
        round(log(col("nd").cast("double") / col("ntot").cast("double")) *
          1e9, 0).cast("long").as("lnprior_n"))
    // occ's ride-along lblc is the doc's OWN label — drop it before the
    // score join, where `lblc` means the candidate label from plb
    val score = occ.drop("lblc").join(plb, "b")
      .groupBy("doc_id", "lblc")
      .agg(sum(col("k") * col("lnp_n")).as("w_n"))
      .join(broadcast(prior), "lblc")
      .select(col("doc_id"), col("lblc"),
        (col("w_n") + col("lnprior_n")).as("score"))
    // argmax as a plain aggregate: min_by over (−score, lblc) picks the
    // max score with the smallest label breaking exact ties — exact in
    // integer log-space, partial-aggregable map-side, and needs no sort
    // exchange or window machinery (scores are bounded ≪ 2⁶³, so the
    // negation cannot overflow). Codes are label-ordered, so min code
    // == min label — the tie-break the oracle states.
    score.groupBy("doc_id")
      .agg(min_by(col("lblc"), struct(-col("score"), col("lblc")))
        .as("predc"))
      .join(docLbl, "doc_id")
      .join(broadcast(dict.select(col("lblc"), col("lbl").as("label"))),
        "lblc")
      .join(broadcast(dict.select(col("lblc").as("predc"),
        col("lbl").as("pred"))), "predc")
      .select(col("doc_id"), col("label"), col("pred"),
        (col("pred") === col("label")).as("correct"))
  }

  /** Per-source distribution shift: KL(source ‖ corpus) over a hashed
    * feature space, from a pre-aggregated (source, b, k) occurrence
    * fact (b = bucket, k = occurrences). Same exact-integer-log-space
    * discipline as the classifiers: the one double computation
    * (p·ln(p/q), add-0.5 smoothing over the OBSERVED corpus buckets) is
    * rounded to nano-nat BIGINTs per (source, bucket), and each
    * source's KL is then a plain commutative integer SUM. The corpus
    * marginals derive from the fact by re-aggregation (no second corpus
    * pass); everything after the fact is ≤ |sources| × buckets rows,
    * with the one-row total as a broadcast cross join. KL ≥ 0 holds up
    * to the ±0.5 nano-nat per-bucket rounding. Returns
    * (source, n_toks, n_buckets, kl_nn). */
  def klPerSource(fact: DataFrame, buckets: Int = 4096): DataFrame = {
    val half = buckets * 0.5
    val corpus = fact.groupBy("b").agg(sum(col("k")).as("ck"))
    val ns = fact.groupBy("source").agg(sum(col("k")).as("nsrc"))
    val ntot = corpus.agg(sum(col("ck")).as("ntot"))
    ns.crossJoin(corpus)
      .join(fact, Seq("source", "b"), "left")
      .crossJoin(ntot)
      .select(col("source"), col("nsrc"), col("b"),
        coalesce(col("k"), lit(0L)).as("k"), col("ck"), col("ntot"))
      .withColumn("p",
        (col("k").cast("double") + lit(0.5)) /
          (col("nsrc").cast("double") + lit(half)))
      .withColumn("q",
        (col("ck").cast("double") + lit(0.5)) /
          (col("ntot").cast("double") + lit(half)))
      .withColumn("c_nn",
        round(col("p") * log(col("p") / col("q")) * lit(1e9), 0)
          .cast("long"))
      .groupBy("source", "nsrc")
      .agg(sum(when(col("k") > 0, lit(1L)).otherwise(lit(0L)))
        .as("n_buckets"),
        sum(col("c_nn")).as("kl_nn"))
      .select(col("source"), col("nsrc").as("n_toks"),
        col("n_buckets"), col("kl_nn"))
  }
}
