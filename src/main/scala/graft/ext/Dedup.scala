package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-level deduplication: candidate pairs (from LSH banding or any
  * similarity join) → connected components → one keeper per cluster.
  *
  * The component algorithm is iterative min-label propagation — each
  * superstep joins current labels across the edge set and keeps the
  * minimum; converges in O(graph diameter) supersteps (near-dup graphs
  * are shallow — dup clusters are cliques or near-cliques, so 2-3
  * rounds). Each superstep is one shuffle on node id; a lineage cut
  * ([[graft.Materialize]]) keeps plans bounded. This is the standard
  * large-scale CC shape (cf. Hash-to-Min / large-small-star literature).
  */
object Dedup {

  /** Cut lineage between supersteps — the shared reliable-when-possible
    * helper, EAGER on purpose: measured against a lazy cut (materialize
    * inside the checksum job), eager is ~25% faster here — the checksum
    * then aggregates over a plain materialized-block scan instead of
    * dragging the full superstep lineage through AQE re-planning. */
  private def cut(df: DataFrame): DataFrame =
    graft.Materialize.cut(df, eager = true)

  /** Partition-local contraction pre-pass: union-find over each
    * partition's edges, emitting one (node → partition-local min root)
    * star edge per distinct node seen in that partition. Connectivity is
    * preserved exactly — local unions only follow actual edges, and a
    * node split across partitions carries a star edge from each, linking
    * the stars — so min-label propagation on the contracted graph yields
    * the same components. The payoff is scale-shaped: a partition's
    * internal clique/chain structure (the common LSH-band shape) collapses
    * from O(edges) rows to O(nodes) rows BEFORE the first shuffle, and
    * the effective diameter drops to the number of partition hops, so the
    * iterative phase runs fewer supersteps over a smaller edge set. */
  private def contract(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("d1").cast("long"), col("d2").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          // union by min id: roots stay the partition-local min, which
          // seeds the global min-label iteration one hop closer to done
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keys.toArray.iterator.map(n => (n, find(n)))
      }
      .toDF("d1", "d2")
  }

  /** edges(d1, d2) → (node, cluster) where cluster = min node id reachable.
    * Nodes = every endpoint.
    *
    * Hybrid finish: after the partition-local contraction the surviving
    * star graph is O(distinct nodes) edges — on real near-dup workloads
    * orders of magnitude below the corpus. When it fits under
    * `driverFinishEdges` (default 200k edges ≈ 3 MB of longs — a bounded,
    * centroid-style driver structure, NOT corpus-proportional), a driver
    * union-find finishes in one collect instead of paying 2 scheduled
    * jobs per superstep; bigger graphs run the distributed min-label
    * loop unchanged. This is the standard iterate-while-big / finish-
    * small CC shape; both paths provably produce the same labels
    * (ExtSpec pins equality on random graphs). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          driverFinishEdges: Long = 200000L): DataFrame = {
    val spark = edges.sparkSession
    val star = contract(edges)
    val (e, eBlocks) = graft.Materialize.cutTracked(
      star.select(col("d1").as("a"), col("d2").as("b"))
        .union(star.select(col("d2").as("a"), col("d1").as("b")))
        .distinct())
    val nEdges = e.count() // cheap: aggregates over materialized blocks
    if (nEdges <= driverFinishEdges) {
      import spark.implicits._
      val pairs = e.select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent(rb) = ra
        else if (rb < ra) parent(ra) = rb
      }
      val labels = parent.keys.toSeq.sorted.map(n => (n, find(n)))
      graft.Materialize.release(spark, eBlocks)
      lastSupersteps.set(0)
      return spark.createDataset(labels).toDF("node", "cluster")
    }
    var (labels, labelBlocks) = graft.Materialize.cutTracked(
      e.select(col("a").as("node")).distinct()
        .withColumn("cluster", col("node")))
    // label sums strictly decrease while any label still shrinks (min-
    // propagation is monotone), so a checksum equality is a sound and
    // cheap convergence test — one aggregate instead of a join per round
    def checksum(df: DataFrame): Long = {
      val r = df.agg(sum("cluster")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0) // empty graph: sum is NULL
    }
    var converged = false
    var i = 0
    var prevSum = checksum(labels)
    while (!converged && i < maxIter) {
      // POINTER JUMPING (round-16; the planted-chain probe showed
      // plain min-propagation needs DIAMETER supersteps — the
      // partition-local contraction leaves a cross-partition chain of
      // per-slice roots whose depth scales with the partition count,
      // and a deep graph exhausts maxIter UNCONVERGED): each superstep
      // first relabels THROUGH the label table (cluster ← label of the
      // node `cluster` names — a monotone min, since label(x) ≤ x
      // always), which roughly halves every node's distance to its
      // component root, then hops one edge as before. Jump + hop
      // converges in O(log diameter) rounds — 2000-deep chains finish
      // in ≲10 supersteps where the hop-only loop needed the full
      // depth. ADAPTIVE: the first 3 rounds hop plainly — real dup
      // graphs (star-shaped clusters) converge there and never pay
      // the jump join — and only a loop still unconverged at round 3
      // (the deep-graph signature) escalates to jumping. The jump is
      // a self-join of the CUT label frame (both sides read
      // materialized blocks — no recompute), so each round still pays
      // exactly one checkpoint; the left join's coalesce guards a
      // missing root row, which cannot occur (every cluster value is
      // a node id present in the label table).
      val jumped = if (i < 3) labels else labels.as("x")
        .join(labels.select(col("node").as("cluster"),
          col("cluster").as("c2")).as("y"), Seq("cluster"), "left")
        .select(col("node"),
          coalesce(col("c2"), col("cluster")).as("cluster"))
      val viaNeighbors = e
        .join(jumped, e("b") === jumped("node"))
        .select(e("a").as("node"), col("cluster"))
      val (next, nextBlocks) = graft.Materialize.cutTracked(
        jumped.union(viaNeighbors)
          .groupBy("node").agg(min("cluster").as("cluster")))
      val nextSum = checksum(next)
      // `next` is eagerly materialized → the previous generation's blocks
      // are dead; free them NOW so an N-superstep run pins 2 generations,
      // not N (GC-driven cleanup is too lazy for long iterative jobs)
      graft.Materialize.release(spark, labelBlocks)
      labels = next
      labelBlocks = nextBlocks
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    lastSupersteps.set(i)
    graft.Materialize.release(spark, eBlocks)
    labels
  }

  /** Superstep count of the last [[connectedComponents]] distributed
    * loop in this JVM (0 for driver-finished graphs) — a probe/spec
    * diagnostic, not an API: the scale contract is O(log diameter)
    * rounds, and this is what pins it. */
  private[graft] val lastSupersteps =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Delta dedup against an already-ingested corpus — the snapshot-
    * ingestion posture: a new dump dedups against the EXISTING corpus's
    * banded LSH index instead of re-clustering everything. The hot-band
    * cap applies on the INDEX side ([[bandedPairs]] discipline — one
    * boilerplate band cannot make the probe quadratic); candidates are
    * refined by exact distinct-3-gram Jaccard ≥ `minJaccard` over 60-bit
    * keys, so the band stage only bounds work, never decides. Both
    * frames need (doc_id, toks); docs under 3 tokens never band or gram
    * (callers re-attach them). Returns (doc_id, dup_of, is_new) for
    * incoming docs that banded. At 100 TB the index is a materialized
    * banded table and each dump's probe is index-bounded work, not
    * corpus². */
  def deltaDedup(existing: DataFrame, incoming: DataFrame,
                 bands: Int = 4, bandCap: Int = DefaultBandCap,
                 minJaccard: Double = 0.5): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      df.where(size(col("toks")) >= 3)
    def bandsOf(df: DataFrame): DataFrame = prep(df)
      .select(col("doc_id"),
        explode(Text.lshBandsFromToks(col("toks"), bands)).as("band"))
    val idx = bandsOf(existing)
      .select(col("doc_id").as("old_id"), col("band"))
    val idxCapped =
      if (bandCap <= 0) idx
      else idx.join(
        idx.groupBy("band").agg(count(lit(1)).as("n"))
          .where(col("n") > bandCap).drop("n"),
        Seq("band"), "left_anti")
    val cand = bandsOf(incoming)
      .select(col("doc_id").as("new_id"), col("band"))
      .join(idxCapped, "band")
      .select("new_id", "old_id").distinct()
    def gramsOf(df: DataFrame): DataFrame = prep(df)
      .select(col("doc_id"), explode(array_distinct(
        graft.meos.NativeExpressions.shingleHashes(col("toks"), 3)))
        .as("g"))
    val gOld = graft.Materialize.cut(gramsOf(existing))
    val gNew = graft.Materialize.cut(gramsOf(incoming))
    val szOld = gOld.groupBy("doc_id").agg(count(lit(1)).as("szo"))
    val szNew = gNew.groupBy("doc_id").agg(count(lit(1)).as("szn"))
    val inter = gNew.withColumnRenamed("doc_id", "new_id")
      .join(cand, "new_id")
      .join(gOld.select(col("doc_id").as("old_id"), col("g")),
        Seq("old_id", "g"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("ninter"))
    val dups = inter
      .join(szNew.select(col("doc_id").as("new_id"), col("szn")),
        "new_id")
      .join(szOld.select(col("doc_id").as("old_id"), col("szo")),
        "old_id")
      .where(col("ninter").cast("double") /
        (col("szn") + col("szo") - col("ninter")).cast("double")
        >= minJaccard)
      .groupBy("new_id").agg(min(col("old_id")).as("dup_of"))
    prep(incoming).select(col("doc_id"))
      .join(dups, col("doc_id") === col("new_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNull.as("is_new"))
  }

  /** Benchmark decontamination: for every corpus doc, the number of
    * DISTINCT word k-shingles it shares with ANY probe/benchmark doc, plus
    * a contaminated flag. Both frames need (doc_id, text). Scale shape:
    * the probe side's distinct shingles are benchmark-sized (small) →
    * broadcast hash join against one narrow corpus-side explode; docs
    * with zero overlap survive via the left join. */
  def decontaminate(corpus: DataFrame, probe: DataFrame,
                    k: Int = 3): DataFrame =
    decontaminateFromToks(
      corpus.withColumn("toks", Text.tokens(col("text"))),
      probe.withColumn("toks", Text.tokens(col("text"))), k)

  /** [[decontaminate]] over pre-tokenized frames (doc_id, toks) — lets a
    * composed pipeline (qp1) tokenize the corpus ONCE for all stages. */
  def decontaminateFromToks(corpus: DataFrame, probe: DataFrame,
                            k: Int = 3): DataFrame = {
    def shingled(df: DataFrame): DataFrame = df
      .where(size(col("toks")) >= k)
      .withColumn("sh", Text.shingles(col("toks"), k))
    val probeSh = shingled(probe)
      .select(explode(col("sh")).as("g")).distinct()
    val corpusSh = shingled(corpus)
      .select(col("doc_id"), explode(array_distinct(col("sh"))).as("g"))
    val hits = corpusSh.join(broadcast(probeSh), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    corpus.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= 1)
  }

  /** Default hot-band cap for production LSH self-joins: a band bucket of
    * size n contributes n(n-1)/2 candidate pairs, so a single hot band
    * (license boilerplate, templated pages — THE common case in a web
    * crawl) makes the join quadratic on its own. Dropping buckets over the
    * cap BEFORE the join bounds total work to cap × |sig| rows regardless
    * of the corpus's duplication structure, at a bounded recall cost for
    * NEAR-duplicates: a near-dup pair differs in content, so it is
    * overwhelmingly re-found via one of its colder bands (standard
    * practice — cf. Spark MLlib's MinHashLSH guidance and Lee et al.
    * 2022 §4). That argument is structurally false for EXACT duplicates
    * (every band of every copy is identical, so all are hot together) —
    * which is why [[minhashClustersFromToks]] collapses exact-content
    * groups BEFORE banding; callers composing [[bandedPairs]] directly
    * must either do the same or accept that over-cap exact-dup groups
    * produce no pairs. */
  val DefaultBandCap = 64

  /** Candidate pairs from a banded signature frame (doc_id, band), with
    * the hot-band guard applied BEFORE the self-join. The size filter
    * rides the same band-keyed shuffle as the join — one extra aggregate,
    * no extra scan of the corpus. `bandCap <= 0` disables the guard
    * (raw enumeration — only for bounded inputs or diagnostics). */
  def bandedPairs(sig: DataFrame,
                  bandCap: Int = DefaultBandCap): DataFrame = {
    // guard as an ANTI join against the OVER-cap bands: that set is tiny
    // (≤ |sig|/cap distinct keys, near-empty on healthy corpora), so AQE
    // broadcasts it and the common case costs one small-side agg — the
    // inner-join-the-small-bands spelling shuffled the full band
    // vocabulary back into the probe
    val side =
      if (bandCap <= 0) sig
      else sig.join(
        sig.groupBy("band").agg(count(lit(1)).as("n"))
          .where(col("n") > bandCap).drop("n"),
        Seq("band"), "left_anti")
    val a = side.select(col("doc_id").as("d1"), col("band"))
    val b = side.select(col("doc_id").as("d2"), col("band"))
    a.join(b, Seq("band")).where(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  /** Content-defined chunking (the LBFS/rsync boundary rule): a chunk
    * boundary falls AFTER 1-based token position i (i < n) when that
    * token's 60-bit md5 key ≡ 0 (mod boundaryMod) — boundaries are a
    * function of the CONTENT, so inserting a token early in a doc
    * re-fingerprints only the chunk it lands in; every chunk after the
    * next boundary is byte-identical to the original's (the
    * shift-resistance fixed-stride chunking fundamentally lacks).
    * Input: (doc_id, toks); output: one row per (doc_id, chunk_id) with
    * the chunk's 60-bit content key `k`. Boundary detection, chunk
    * slicing and fingerprinting are all per-row ARRAY ops — a narrow
    * map plus a bounded explode, no token-grain shuffle — and every
    * downstream agg/join runs on the 8-byte key. */
  def cdcChunks(docs: DataFrame, boundaryMod: Int = 16): DataFrame =
    docs
      .select(col("doc_id"), posexplode(
        graft.meos.NativeExpressions.cdcChunkKeys(col("toks"), boundaryMod))
        .as(Seq("cid", "k")))
      .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
        col("k"))

  /** Pure-built-in composition of [[cdcChunks]] — the readable
    * specification of the native kernel, kept for the parity spec. Two
    * md5 passes through interpreted HOFs (per-token boundary test with a
    * hex parse, then a built chunk string per chunk) where the kernel
    * digests token bytes once, incrementally. */
  def cdcChunksComposed(docs: DataFrame, boundaryMod: Int = 16): DataFrame = {
    val withChunks = docs
      .withColumn("n", size(col("toks")))
      .withColumn("bp",
        // guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) where the
        // oracle's range(1, 1) is empty — single-token docs must
        // produce no interior boundaries
        when(col("n") >= 2,
          filter(sequence(lit(1), col("n") - 1), i =>
            conv(substring(md5(element_at(col("toks"), i)), 1, 15), 16, 10)
              .cast("long") % boundaryMod === 0))
          .otherwise(array().cast("array<int>")))
      .withColumn("starts",
        concat(array(lit(1)), transform(col("bp"), x => x + 1)))
      .withColumn("ends", concat(col("bp"), array(col("n"))))
    withChunks
      .select(col("doc_id"), col("toks"), col("ends"),
        posexplode(col("starts")).as(Seq("cid", "st")))
      .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
        col("st"), element_at(col("ends"), col("cid") + 1).as("en"),
        col("toks"))
      .select(col("doc_id"), col("chunk_id"),
        conv(substring(md5(concat_ws(" ",
          slice(col("toks"), col("st"), col("en") - col("st") + 1))),
          1, 15), 16, 10).cast("long").as("k"))
  }

  /** Full minhash-dedup: docs → shingles → LSH candidate pairs → connected
    * components → cluster per doc (docs with no near-dup form their own
    * cluster). Returns (doc_id, cluster, keeper). */
  def minhashClusters(docs: DataFrame, bands: Int = 4,
                      bandCap: Int = DefaultBandCap): DataFrame =
    minhashClustersFromToks(
      docs.withColumn("toks", Text.tokens(col("text"))), bands, bandCap)

  /** [[minhashClusters]] over a pre-tokenized frame (doc_id, toks).
    * `bandCap` (default on) is the hot-band guard of [[bandedPairs]].
    *
    * Exact-content PRE-COLLAPSE: identical token streams share ALL their
    * bands, so an above-cap group of exact duplicates is precisely the
    * mass the hot-band guard drops — uncollapsed, the most-duplicated
    * content (license boilerplate at crawl scale) would be the one class
    * that escapes a capped dedup, because "some other band is colder"
    * can never hold when every band of every copy is identical. So:
    * one md5 fingerprint per doc (narrow), one fingerprint-keyed rollup
    * picks a representative (min doc_id) per distinct content, LSH runs
    * on representatives only, and the cluster label propagates back
    * through the fingerprint. Exact duplicates can never escape, the
    * cap's recall argument only has to hold for genuinely-distinct
    * near-duplicates, and every added step is linear and hash-keyed. */
  def minhashClustersFromToks(docs: DataFrame, bands: Int = 4,
                              bandCap: Int = DefaultBandCap): DataFrame = {
    // fp = xxhash64 over the token ARRAY (native one-pass, no string
    // rebuild; only the GROUPING matters — the DuckDB twins group by
    // md5 of the space-joined tokens, an identical partition of the
    // corpus since tokens cannot contain the separator)
    val base = graft.Materialize.cut(docs
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        xxhash64(col("toks")).as("fp"),
        Text.lshBandsFromToks(col("toks"), bands).as("bands")),
      checkpoint = true)
    // ONE fp-keyed aggregate picks the representative. first(bands) is
    // deterministic here (every row of a group carries the identical
    // array) and partial-aggregates map-side — a 10k-copy hot group
    // ships one row per partition instead of 10k rows into a single
    // reducer, so the collapse itself cannot skew (the window spelling
    // would funnel exactly the boilerplate mass this exists to tame)
    val repSig = graft.Materialize.cut(base.groupBy("fp")
      .agg(min(col("doc_id")).as("doc_id"),
        first(col("bands")).as("bands")),
      checkpoint = true)
    val sig = repSig.select(col("doc_id"), explode(col("bands")).as("band"))
    val pairs = bandedPairs(sig, bandCap)
    val cc = connectedComponents(pairs)
    // cluster label PER FP first (repSig-sized frame ⋈ the small cc set —
    // AQE broadcasts cc), then one fp-keyed join carries it to every doc;
    // joining cc after the doc-grain expansion would run the broadcast
    // probe over the duplicated rows instead of once per distinct content
    val fpCluster = repSig.select(col("fp"), col("doc_id").as("rep"))
      .join(cc, col("rep") === cc("node"), "left")
      .select(col("fp"),
        coalesce(col("cluster"), col("rep")).as("cluster"))
    val expanded = base.select(col("doc_id"), col("fp"))
      .join(fpCluster, Seq("fp"))
      .select(col("doc_id"), col("cluster"))
    docs.select(col("doc_id"))
      .join(expanded, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .withColumn("keeper", col("cluster") === col("doc_id"))
  }

  /** Integer-exact PageRank over an undirected pair set — 5 (default)
    * power steps declared as ONE plan (a Scala fold; no driver loop).
    * All arithmetic is BIGINT: rank mass in nano-units, damping 0.85 as
    * exact 17/20, per-edge contribution `pr div deg` — cross-row sums
    * are order-independent, so an oracle twin reproduces every step
    * bit-for-bit with zero float plumbing. High-rank nodes in a
    * near-dup graph are boilerplate hubs (their removal collapses the
    * most candidate pairs). Scale shape: edges+degrees cut once, reused
    * by every step; each step is one edge-grain shuffle over the capped
    * pair set. Nodes outside the graph are excluded (their rank is the
    * uniform floor by definition). Input: (d1, d2) candidate pairs.
    * Output: (doc_id, deg, pr_n). */
  def pagerankNano(pairs: DataFrame, iters: Int = 5): DataFrame = {
    val edges = cut(
      pairs.select(col("d1").as("src"), col("d2").as("dst"))
        .union(pairs.select(col("d2").as("src"), col("d1").as("dst"))))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgeDeg = cut(edges.join(deg, Seq("src")))
    val n1 = deg.agg(count(lit(1)).as("n"))
    // The rank frame carries ONLY (doc_id, n, pr_n) through the fold: the
    // old spelling kept deg on it and left-joined each step's contrib back
    // onto the previous frame, referencing `pr` TWICE per step — the
    // unrolled single plan therefore DOUBLED per step (2^iters copies of
    // the init/deg subtree; 105 Exchanges at iters=5, and analysis/
    // optimization time to match). The edge set is symmetric (both
    // directions unioned) and self-loop-free, so every node with deg ≥ 1
    // receives ≥ 1 contribution in every step: the left join's
    // coalesce(s, 0) NEVER fired and the node set is invariant — an inner
    // edge join computes the identical sum over the identical node set
    // (Opt17Spec pins new == old on random graphs). deg re-attaches once
    // after the last step. One `pr` reference per step ⇒ plan LINEAR in
    // iters: one edge join + one doc-grain rollup per step.
    val init = deg.select(col("src").as("doc_id"))
      .crossJoin(broadcast(n1))
      .withColumn("pr_n", expr("CAST(1000000000 AS BIGINT) div n"))
      .select(col("doc_id"), col("n"), col("pr_n"))
    val after = (1 to iters).foldLeft(init) { (pr, _) =>
      edgeDeg
        .join(pr.select(col("doc_id").as("src"), col("n"), col("pr_n")),
          Seq("src"))
        .select(col("dst").as("doc_id"), col("n"),
          expr("pr_n div deg").as("c"))
        .groupBy("doc_id")
        // max(n) of the constant row count == n (exact BIGINT) — carried
        // through the agg so no per-step re-crossJoin of the one-row total
        .agg(max(col("n")).as("n"), sum(col("c")).as("s"))
        .select(col("doc_id"), col("n"),
          expr("(150000000 div n) + ((17 * s) div 20)").as("pr_n"))
    }
    after
      .join(deg.select(col("src").as("doc_id"), col("deg")), Seq("doc_id"))
      .select(col("doc_id"), col("deg"), col("pr_n"))
  }

  /** LINE-grain boilerplate removal — the CCNet/RefinedWeb curation pass
    * at the one standard dedup grain the family lacked (doc: qx1/qx11,
    * prefix: qz2, span: qx23, chunk: qx42, frame: qm4): hash each line,
    * roll up document frequency per line hash, strip every line that
    * appears in >= minDf distinct documents (nav bars, cookie banners,
    * boilerplate headers/footers), and reassemble the survivors in
    * original order.
    *
    * Scale shape: the line key is computed in the scan projection
    * (trim+md5 of the line, never the document); the df rollup is one
    * hash agg with map-side combine over those keys; the hot set
    * (df >= minDf) is a tiny frame AQE broadcasts back against the
    * line stream — no sort, no pair join, the qx1 plan at line grain.
    * The exploded line frame is cut once and feeds both the rollup and
    * the reassembly. At 100 TB the md5 string key would narrow to a
    * 64-bit hash; md5 is kept here for oracle parity (the repo's
    * one-hash rule).
    *
    * Whitespace-only lines are never counted and never removed (they
    * carry document structure, not boilerplate). Output: one row per
    * input document — (doc_id, n_lines, n_kept, out_text) with out_text
    * NULL when every line was boilerplate. */
  def lineDedup(docs: DataFrame, minDf: Long = 5L,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val lines = docs
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol),
        "\n", -1)))
      .select(col("doc_id"), col("pos"), col("col").as("line"))
      .withColumn("k",
        when(trim(col("line")) =!= "", md5(trim(col("line")))))
    val staged = cut(lines)
    val hot = staged.where(col("k").isNotNull)
      .groupBy("k").agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
      .select(col("k"), lit(true).as("hot"))
    staged.join(hot, Seq("k"), "left")
      .withColumn("keep", col("hot").isNull)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sort_array(collect_list(when(col("keep"),
          struct(col("pos"), col("line"))))).as("ks"))
      .select(col("doc_id"), col("n_lines"),
        size(col("ks")).cast("long").as("n_kept"),
        when(size(col("ks")) > 0,
          array_join(transform(col("ks"), _.getField("line")), "\n"))
          .as("out_text"))
  }
}
