package graft

import org.apache.spark.sql.functions._

/** Round-13 pins: the broadcast-bound lint (VERDICT r12 items 1–2) and the
  * q44/q62 no-static-hint plans. A `broadcast(...)` hint pins the build side
  * in the DRIVER regardless of size — correct only when the wrapped frame is
  * provably bounded (fixed dim, one-row agg, fit state, query anchors…).
  * The r12 `weak` marks (q44 supplier, q62 customer) were SF-proportional
  * tables behind static hints — exactly what this lint now rejects.
  */
class Round13Spec extends SparkTestBase {

  // ---- broadcast-bound lint ------------------------------------------------
  //
  // Every `broadcast(` site under queries/ must classify as bounded:
  //   auto classes (derived from the argument text, chasing bare/dotted
  //   identifiers to their `val` definitions, dot-continuation aware):
  //     fixed-dim    — nation/region (25/5 rows at EVERY scale factor)
  //     fit-literal  — lastFitted* broadcast model state
  //     post-limit   — frame below an explicit .limit(k)
  //     one-row-agg  — global (or groupBy(lit(…))) aggregate
  //     enum-group   — groupBy on a bounded-vocabulary key only
  //   or carry a `BROADCAST BOUND (<class>)` marker within the 8 preceding
  //   lines, with <class> in the audited marker set below. The per-file
  //   census is pinned so a new broadcast site fails this spec until its
  //   bound is named and the census consciously updated.

  private val enumKeys = Set("source", "dow", "hod", "lang", "label",
    "event_type", "rule", "hh")

  private val markerClasses = Set("fit-state", "query-anchors",
    "anchor-top-k", "enum-group", "benchmark-set", "sketch-table",
    "fixed-k", "one-row-agg", "post-limit", "fixed-dim")

  private val expectedCensus = Map(
    // r14: +3 one-row bound aggs (q79 anchor, q81/q83 global bounds)
    // r15: +1 — q91's DPP build side (marked post-limit: ≤64 rows)
    "src/main/scala/graft/queries/CoreQueries.scala" -> 10,
    // r14: +3 eval-index broadcasts (qx96/qx97/qp11, marked
    // benchmark-set); the qe31 fusion kept both its marked sites
    "src/main/scala/graft/queries/ExtQueries.scala" -> 96) // qe40 anchors + qz69 span agg + qz70 tot/fit + qz73 tot/qtl + qz74 tot (one-row aggs) + qp10 cls (marked enum-group) + qe42 probes (marked query-anchors)

  private def balancedArg(text: String, start: Int): String = {
    var depth = 1
    var i = start
    while (i < text.length && depth > 0) {
      val c = text.charAt(i)
      if (c == '(') depth += 1 else if (c == ')') depth -= 1
      i += 1
    }
    text.substring(start, i - 1)
  }

  private def classifyText(t: String): Option[String] = {
    if (t.contains("Tables.nation") || t.contains("Tables.region"))
      Some("fixed-dim")
    else if (t.contains("lastFitted")) Some("fit-literal")
    else if (t.contains(".limit(")) Some("post-limit")
    else if (t.contains(".agg(")) {
      val gbs = """groupBy\(([^)]*)\)""".r
        .findAllMatchIn(t).map(_.group(1)).toSeq
      val keyRe = """"([A-Za-z_0-9]+)"""".r
      val bad = gbs.filter { g =>
        !g.startsWith("lit(") && {
          val keys = keyRe.findAllMatchIn(g).map(_.group(1)).toSeq
          keys.isEmpty || !keys.forall(enumKeys.contains)
        }
      }
      if (bad.nonEmpty) None
      else if (gbs.exists(g => !g.startsWith("lit("))) Some("enum-group")
      else Some("one-row-agg")
    } else None
  }

  /** Resolve `val <ident> = …` above line `ln` (1-based), capturing
    * dot-continuation lines (the fluent style) and unbalanced parens. */
  private def valRhs(lines: Array[String], ident: String,
      ln: Int): Option[(String, Int)] = {
    val re = ("""\bval\s+""" + java.util.regex.Pattern.quote(ident) +
      """\s*(=|:)""").r
    var j = ln - 1
    while (j > math.max(0, ln - 200)) {
      if (re.findFirstIn(lines(j - 1)).isDefined) {
        val buf = new StringBuilder(lines(j - 1))
        var k = j
        def unbalanced = buf.count(_ == '(') > buf.count(_ == ')')
        while (k < lines.length && (unbalanced ||
            lines(k).trim.startsWith("."))) {
          buf.append('\n').append(lines(k)); k += 1
        }
        return Some((buf.toString, j))
      }
      j -= 1
    }
    None
  }

  private def classify(lines: Array[String], argText: String, ln: Int,
      depth: Int): Option[String] = {
    classifyText(argText).orElse {
      val head = """^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\.|\s*$)""".r
      if (depth >= 3) None
      else head.findFirstMatchIn(argText.takeWhile(_ != '\n') + "\n")
        .orElse(head.findFirstMatchIn(argText)) match {
        case Some(m) =>
          valRhs(lines, m.group(1), ln).flatMap { case (rhs, j) =>
            val rhs2 = rhs.replaceFirst("""^\s*val\s+\w+\s*=\s*""", "")
            classify(lines, rhs2, j, depth + 1)
          }
        case None => None
      }
    }
  }

  test("broadcast-bound lint: every broadcast() in queries/ wraps a " +
    "provably bounded frame or carries a BROADCAST BOUND marker of an " +
    "audited class, and the per-file site census matches the audit") {
    val marker = """BROADCAST BOUND \(([a-z-]+)\)""".r
    val dir = new java.io.File("src/main/scala/graft/queries")
    val files = dir.listFiles().filter(_.getName.endsWith(".scala")).sorted
    val found = scala.collection.mutable.Map.empty[String, Int]
    files.foreach { f =>
      val rel = f.getPath
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath))
      val lines = src.split("\n", -1)
      // char offset of each line start, for offset -> line mapping
      val offs = lines.scanLeft(0)((a, l) => a + l.length + 1)
      def lineno(pos: Int): Int = {
        var lo = 0; var hi = lines.length - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (offs(mid) <= pos) lo = mid else hi = mid - 1
        }
        lo + 1
      }
      var n = 0
      val bc = "broadcast("
      var idx = src.indexOf(bc)
      while (idx >= 0) {
        n += 1
        val ln = lineno(idx)
        val arg = balancedArg(src, idx + bc.length)
        val auto = classify(lines, arg, ln, 0)
        if (auto.isEmpty) {
          val ctx = (math.max(0, ln - 9) until ln).map(lines)
            .mkString("\n")
          val m = marker.findFirstMatchIn(ctx)
          assert(m.isDefined,
            s"$rel:$ln: broadcast() of an unproven frame without a " +
              "BROADCAST BOUND marker in the preceding 8 lines — name " +
              "the bound (or drop the hint and let AQE decide, the q39 " +
              s"rule) before shipping. Argument: ${arg.take(80)}")
          assert(markerClasses.contains(m.get.group(1)),
            s"$rel:$ln: unknown broadcast bound class '${m.get.group(1)}'")
        }
        idx = src.indexOf(bc, idx + bc.length)
      }
      if (n > 0) found(rel) = n
    }
    assert(found.toMap == expectedCensus,
      s"broadcast site census changed: found ${found.toMap}, audit says " +
        s"$expectedCensus — re-audit the new/moved sites and update both")
  }

  // ---- q64: dynamic partition pruning fires --------------------------------

  test("q64 fact scan carries a DynamicPruningExpression in its " +
    "PartitionFilters — the pruning set exists only inside the filtered " +
    "orders dim, so a plan without it reads all 7 year partitions") {
    val df = SparkEntry.queries("q64_dynamic_partition_prune")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning predicate in the q64 fact scan:\n$plan")
    // and the pruning must be subquery/broadcast-reuse, not a static
    // partition filter smuggled in: no literal year anywhere in the scan
    assert(!plan.contains("yr#" + "x = 199"), plan)
  }

  // ---- q65: VARIANT parse once, below the aggregate -------------------------

  test("q65 parses JSON to VARIANT exactly once, in the scan-stage " +
    "projection — the agg consumes typed variant_get columns, never " +
    "re-parsing text per access") {
    val df = SparkEntry.queries("q65_variant_props")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // parse_json prints as a static_invoke of VariantExpressionEvalUtils
    val needle = "VariantExpressionEvalUtils.parseJson"
    val n = needle.r.findAllIn(plan).size
    assert(n == 1, s"expected exactly one parse_json site, got $n:\n$plan")
    // tree prints top-down: the aggregate must print BEFORE the
    // parse_json projection (i.e. the parse sits below it)
    assert(plan.indexOf("HashAggregate") >= 0 &&
      plan.indexOf("HashAggregate") < plan.indexOf(needle), plan)
    // and the typed accesses are variant_get over the parsed column
    assert("variant_get".r.findAllIn(plan).size == 2, plan)
  }

  // ---- q67: filtered rank window plans as WindowGroupLimit ------------------

  test("q67's rank<=3 filter rewrites to WindowGroupLimit — per-group " +
    "top-k prunes map-side BEFORE the window shuffle, so the exchange " +
    "carries ~3·|groups| rows, not the whole aggregate") {
    val plan = SparkEntry.queries("q67_group_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  // ---- q69: null-safe equality is still an equi-join ------------------------

  test("q69's <=> condition plans as a hash-partitionable join (NULL is " +
    "one bucket), never a nested-loop fallback") {
    val plan = SparkEntry.queries("q69_null_safe_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  // ---- q44 / q62: the r12 weak marks are gone ------------------------------

  test("q44 and q62 carry NO static join hint anywhere in the analyzed " +
    "plan — supplier/customer are SF-proportional, so the join strategy " +
    "is AQE's call (the q39 rule)") {
    Seq("q44_waiting_supplier", "q62_fk_quality_audit").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val analyzed = df.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint") &&
        !analyzed.contains("UnresolvedHint"),
        s"$q analyzed plan still carries a join hint:\n$analyzed")
    }
  }
}
