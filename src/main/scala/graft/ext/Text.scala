package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication primitives for LLM-data pipelines —
  * the [EXT] operator family (SURVEY.md §2, BASELINE.json north star).
  * No reference counterpart; designed Spark-first:
  *
  *  - everything is a codegen-friendly `Column` expression (no UDFs in the
  *    hot path) so Catalyst prunes/pushes around them and whole-stage
  *    codegen keeps them in one pass over the data;
  *  - hash functions are md5-based so the DuckDB oracle can recompute them
  *    bit-identically (both engines implement standard md5 → lowercase hex;
  *    lexicographic min over fixed-width hex == numeric min);
  *  - at 100 TB the shingle/minhash stage is a narrow map (no shuffle);
  *    only the band-bucket join shuffles, on short hex-string keys.
  */
object Text {

  /** Whitespace tokenization — split on single space, mirroring DuckDB's
    * `string_split(text, ' ')` for oracle parity. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word k-shingles. Empty array when the doc has fewer than k tokens
    * (DuckDB `range(n)` with negative n is empty; we guard explicitly). */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k), i =>
        concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** One minhash: lexicographic min of seeded md5 over the shingle set.
    * Null when the shingle set is empty. */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$seed:"), s))))

  /** Full b×r signature as an array of band keys: band i concatenates r
    * minhashes (seeds i*r … i*r+r-1). Join docs on a shared band key →
    * LSH candidate pairs. The common r=1 shape runs as the one-pass
    * native kernel (bit-identical — NativeExprSpec — including null/empty
    * arrays and null elements, which follow the composed `array_min`
    * semantics; the composed form re-walks the shingle array per seed
    * through interpreted HOFs). */
  def lshBands(sh: Column, bands: Int, rowsPerBand: Int = 1): Column =
    if (rowsPerBand == 1)
      graft.meos.NativeExpressions.minhashBands(sh, bands)
    else lshBandsComposed(sh, bands, rowsPerBand)

  /** The whole `shingles(toks) |> lshBands` chain fused into one native
    * pass over the TOKEN array — no shingle strings materialized. Use
    * when band keys are the ONLY consumer of the shingles (qx2/qx3/qx19
    * and the dedup-cluster path); bit-identical to the staged form. */
  def lshBandsFromToks(toks: Column, bands: Int, shingleK: Int = 3): Column =
    graft.meos.NativeExpressions.minhashShingleBands(toks, shingleK, bands)

  /** Pure-built-in composition of [[lshBands]] — the readable
    * specification of the kernel; kept for the parity spec. */
  def lshBandsComposed(sh: Column, bands: Int, rowsPerBand: Int = 1): Column =
    array((0 until bands).map { b =>
      concat((0 until rowsPerBand)
        .map(r => minhash(sh, b * rowsPerBand + r)): _*)
    }: _*)

  /** Scale-path minhash: one xxhash64 per shingle per seed — stays numeric
    * end-to-end (no hex-string allocation), fully codegen'd via Spark's
    * built-in XxHash64 expression. Not oracle-comparable (DuckDB's hash
    * differs), so used by the Spark-only scale queries; the md5 variant
    * above is the cross-engine-checkable twin. */
  def minhashFast(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => xxhash64(lit(seed), s)))

  def lshBandsFast(sh: Column, bands: Int, rowsPerBand: Int = 1): Column =
    array((0 until bands).map { b =>
      concat_ws("|", (0 until rowsPerBand)
        .map(r => minhashFast(sh, b * rowsPerBand + r)): _*)
    }: _*)

  /** SimHash-32 over a pre-hashed token array (one md5 per token, reused
    * across all 32 bit positions): bit p = majority vote of the high bit of
    * hex digit p. Returned as a 32-char '0'/'1' string — directly
    * comparable, and hamming distance = count of differing positions.
    *
    * NB: every reference to `tokenHashes` duplicates its expression tree,
    * and this form references it 33 times — fine for literals/tests, a
    * 33× recompute if the argument is itself an md5 transform. Hot queries
    * should stage [[simhashCounts]] → [[simhashFromCounts]] through
    * aliased projections instead (qx4 does). */
  def simhash32(tokenHashes: Column): Column =
    concat((1 to 32).map { p =>
      val highs = aggregate(tokenHashes, lit(0), (acc, h) =>
        acc + when(instr(lit("89abcdef"), substring(h, p, 1)) > 0, 1)
          .otherwise(0))
      when(lit(2) * highs >= size(tokenHashes), lit("1")).otherwise(lit("0"))
    }: _*)

  /** Single-pass per-position high-bit counts for SimHash-32: ONE
    * traversal of the token hashes building a 32-wide counter array
    * (vs 32 separate aggregate passes). */
  def simhashCounts(tokenHashes: Column): Column =
    aggregate(tokenHashes, array_repeat(lit(0), 32),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(1), lit(32)), p =>
          when(instr(lit("89abcdef"), substring(h, p, lit(1))) > 0, 1)
            .otherwise(0)),
        (a, b) => a + b))

  /** Majority vote over pre-computed [[simhashCounts]] — identical output
    * to [[simhash32]]. */
  def simhashFromCounts(counts: Column, n: Column): Column =
    concat((1 to 32).map { p =>
      when(lit(2) * element_at(counts, p) >= n, lit("1")).otherwise(lit("0"))
    }: _*)

  def tokenMd5s(toks: Column): Column = transform(toks, t => md5(t))

  /** Jaccard similarity of two shingle arrays (distinct-set semantics —
    * matches DuckDB `list_intersect`/`list_distinct` lengths). */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast("double")
    val u = (size(array_distinct(a)) + size(array_distinct(b))).cast("double") -
      size(array_intersect(a, b))
    i / u
  }

  /** Exact-dedup fingerprint: md5 of lowercased, whitespace-collapsed text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Bottom-k sketch: the k smallest shingle hashes, sorted — a compact
    * document fingerprint whose overlap estimates resemblance. */
  def bottomK(sh: Column, k: Int = 4, seed: Int = 0): Column =
    slice(array_sort(transform(sh, s => md5(concat(lit(s"$seed:"), s)))),
      1, k)

  /** Winnowing fingerprint set (Schleimer et al. — the MOSS algorithm):
    * the distinct minima of every w-window over a positional gram-hash
    * array; a doc shorter than one window contributes its global min.
    * GUARANTEE (what bottom-k only gives probabilistically): any token
    * run of ≥ w+k-1 tokens shared by two docs yields a full window of w
    * shared gram hashes in both, whose minimum lands in both fingerprint
    * sets. Set semantics (distinct VALUES, not positions) make the
    * usual rightmost-min tie-break irrelevant, so both engines agree
    * exactly. Pure per-row array math — narrow at any scale. */
  def winnowFps(hs: Column, w: Int = 4): Column =
    array_distinct(graft.meos.NativeExpressions.slidingMin(hs, w))

  /** Pure-built-in composition of the [[winnowFps]] window-min pass —
    * the readable specification of the native kernel, kept for the
    * parity spec. O(m·w) through interpreted HOF lambdas where the
    * kernel's monotonic deque is O(m). */
  def winnowFpsComposed(hs: Column, w: Int = 4): Column =
    array_distinct(
      when(size(hs) >= w,
        transform(sequence(lit(0), size(hs) - w), i =>
          array_min(slice(hs, i + 1, lit(w)))))
        .otherwise(array(array_min(hs))))

  // ---- language ID (deterministic stopword-count heuristic) ---------------

  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  def stopwordScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t =>
      words.map(w => t === lit(w)).reduce(_ || _)))

  /** Predicted language = argmax stopword-occurrence count; ties break to
    * the alphabetically-first language code (the CASE evaluation order —
    * mirrored verbatim in the oracle SQL). */
  def langId(toks: Column): Column =
    langIdFromScores(
      StopwordSets.map { case (l, ws) => l -> stopwordScore(toks, ws) })

  /** The argmax CASE over ALREADY-STAGED per-language score columns.
    * Each score is referenced ~4× by the comparison chain, and
    * higher-order filters get no subexpression elimination — inlining
    * `stopwordScore` here re-walks the token array per reference (up to
    * 25 passes/row); staging the 5 scores through a projection first
    * makes it 5 (qx6 does). */
  def langIdFromScores(scores: Seq[(String, Column)]): Column =
    scores.init.foldRight(lit(scores.last._1)) { case ((l, s), elseC) =>
      val geAll = scores.filter(_._1 != l).map(s2 => s >= s2._2)
        .reduce(_ && _)
      when(geAll, lit(l)).otherwise(elseC)
    }

  // ---- quality scoring ----------------------------------------------------

  /** Mean token length (integer char counts, one double division). */
  def avgWordLen(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")

  def stopwordRatio(toks: Column): Column =
    StopwordSets.map { case (_, ws) => stopwordScore(toks, ws) }
      .reduce(_ + _).cast("double") / size(toks).cast("double")

  /** Composite quality score — deterministic arithmetic only (ratios of
    * integer counts), so the oracle reproduces it bit-for-bit. */
  def qualityScore(toks: Column, nChars: Column): Column =
    stopwordRatio(toks) * lit(100.0) +
      avgWordLen(toks) +
      nChars.cast("double") / lit(1000.0)

  /** BPE-ish token count: alpha runs, digit runs, or single non-space
    * symbols (same RE2/Java-compatible pattern in the oracle). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** PII / volatile-token scrub classes, applied IN THIS ORDER — order
    * is semantics: URLs are masked before UUIDs and digit runs so a
    * path-embedded id is counted as part of its URL, not double-counted;
    * digit runs go last as the catch-all (the qx27 digit pass widened).
    * Every pattern is in the Java∩RE2 common subset so the DuckDB twin
    * runs the identical regex. */
  val PiiClasses: Seq[(String, String, String)] = Seq(
    ("n_email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("n_url", "https?://[^\\s]+", "<URL>"),
    ("n_uuid", "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
      "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}", "<UUID>"),
    ("n_num", "[0-9]{2,}", "<NUM>"))

  /** Sequential PII scrub: each class counts its matches on the text AS
    * LEFT BY THE PREVIOUS CLASS, then masks them — the counts are the
    * per-document audit record production redaction logs. Pure codegen'd
    * string expressions in one projection (no UDF, no shuffle); returns
    * struct(n_email, n_url, n_uuid, n_num, text) with `text` fully
    * scrubbed. */
  def scrubPii(text: Column): Column = {
    val (cols, scrubbed) = PiiClasses.foldLeft(
      (Seq.empty[Column], text)) { case ((acc, t), (name, re, mask)) =>
      (acc :+ size(regexp_extract_all(t, lit(re), lit(0)))
        .cast("long").as(name),
        regexp_replace(t, re, mask))
    }
    struct(cols :+ scrubbed.as("text"): _*)
  }
}
