package graft

import org.apache.spark.sql.functions._

/** Round-12 pins: the global-window audit lint (VERDICT r11 item 2) and
  * the qe35 indexed-leg equivalences (item 3). */
class Round12Spec extends SparkTestBase {

  // ---- global-window lint -------------------------------------------------
  //
  // An unpartitioned `Window.orderBy` plans as ONE task holding its whole
  // input — correct only when that input is provably bounded (the qx81
  // round-11 `weak`: a "vocabulary-grain" window is NOT bounded on a web
  // corpus). Discipline: every such site must carry a
  // `GLOBAL-WINDOW BOUND (<class>): <why>` marker within the 8 preceding
  // lines, with <class> one of the audited categories below; and the
  // per-file site COUNT is pinned, so a new global window fails this spec
  // until its bound is named and the count consciously updated.

  private val allowedClasses = Set("post-limit", "distinct-value",
    "calendar", "label-vocab", "inherent-global-report")

  private val expectedSites = Map(
    "src/main/scala/graft/queries/ExtQueries.scala" -> 26,
    "src/main/scala/graft/queries/CoreQueries.scala" -> 1,
    "src/main/scala/graft/ext/Models.scala" -> 1)

  test("global-window lint: every unpartitioned Window.orderBy in main " +
    "sources carries a GLOBAL-WINDOW BOUND marker of an audited class, " +
    "and the per-file site counts match the audit") {
    val marker = """GLOBAL-WINDOW BOUND \(([a-z-]+)\)""".r
    val root = new java.io.File("src/main/scala")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val found = scala.collection.mutable.Map.empty[String, Int]
    walk(root).foreach { f =>
      val rel = f.getPath
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      var n = 0
      (0 until lines.size()).foreach { i =>
        if (lines.get(i).contains("Window.orderBy")) {
          n += 1
          val ctx = (math.max(0, i - 8) to i)
            .map(lines.get).mkString("\n")
          val m = marker.findFirstMatchIn(ctx)
          assert(m.isDefined,
            s"$rel:${i + 1}: unpartitioned Window.orderBy without a " +
              "GLOBAL-WINDOW BOUND marker in the preceding 8 lines — " +
              "name the bound (or partition the window) before shipping")
          assert(allowedClasses.contains(m.get.group(1)),
            s"$rel:${i + 1}: unknown bound class '${m.get.group(1)}'")
        }
      }
      if (n > 0) found(rel) = n
    }
    assert(found.toMap == expectedSites,
      s"global-window site census changed: found $found, audit says " +
        s"$expectedSites — re-audit the new/moved sites and update both")
  }

  // ---- qx66 / qx84 rewrites: TakeOrdered replaced the vocab window --------

  test("qx66 and qx84 plans: the vocabulary rank windows are gone — " +
    "top-k is a TakeOrdered heap, and any remaining window sits ABOVE " +
    "it (post-limit rows only)") {
    def plan(q: String): String = SparkEntry.queries(q)(spark, sfDir)
      .queryExecution.executedPlan.toString
    val p66 = plan("qx66_burstiness")
    assert(p66.contains("TakeOrderedAndProject"), p66)
    // tree prints top-down: the rank window's CHILD (the TakeOrdered)
    // must appear after it — i.e. the window consumes ≤ 30 rows
    assert(p66.indexOf("TakeOrderedAndProject") > p66.indexOf("Window ["),
      p66)
    val p84 = plan("qx84_kwic_collocates")
    assert(!p84.contains("Window ["), p84)
    assert(p84.contains("TakeOrderedAndProject"), p84)
  }

  // ---- qe35 indexed leg: exact at covering settings ------------------------

  test("ivfKnnPrenorm at COVERING settings (nprobe = nlist) equals " +
    "bruteForceKnn row for row — the qe9 exhaustive argument: every " +
    "corpus vector sits in exactly one cell and every query probes all " +
    "cells, so the candidate set IS the cross product") {
    val emb = Tables.embeddings(spark, sfDir)
    val anchors = emb.where(col("vec_id") < 100)
    val key = Some(s"$sfDir|nlist=16|iters=5")
    val indexed = ext.Similarity
      .ivfKnnPrenorm(emb, anchors, 5, nlist = 16, nprobe = 16,
        cacheKey = key)
      .select("q_id", "n_id", "rank")
    val brute = ext.Similarity.bruteForceKnn(emb, anchors, 5)
      .select("q_id", "n_id", "rank")
    assert(indexed.exceptAll(brute).isEmpty &&
      brute.exceptAll(indexed).isEmpty,
      "indexed-at-covering and brute top-5 diverge")
    assert(indexed.count() == brute.count())
  }

  // ---- trip-envelope DataSourceV2 ------------------------------------------

  test("trip-envelope DSv2: roundtrips the sink's lines, prunes the " +
    "payload column out of the scan, and plans one input partition " +
    "per line file") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("r12-envelope").toString
    val df = Seq((1L, 1, "AABB"), (2L, 1, "CCDD"), (3L, 2, "EEFF"))
      .toDF("id", "vt", "payload")
    graft.sources.TripSink.writeJsonLines(df.repartition(2), col("id"),
      col("vt"), col("payload"), path)
    val back = spark.read.format("trip-envelope").load(path)
    assert(back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 1, "AABB"), (2L, 1, "CCDD"), (3L, 2, "EEFF")))
    // column pruning reaches the scan: a projection of id alone must
    // not carry the (byte-dominant) payload column in the read schema
    val p = back.select("id").queryExecution.executedPlan.toString
    assert(p.contains("struct<id:bigint>"), p)
    assert(!p.contains("json:string"), p)
    // file-grain partition planning: read parallelism == sink files
    val nFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(nFiles >= 2, s"expected a multi-file sink, got $nFiles")
    assert(back.rdd.getNumPartitions == nFiles)
  }
}
