package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Round-17 OPTIMIZATION pins: rewrites must be value-identical to the
  * formulations they replaced.
  *
  * qz8 (pagerankNano): the fold used to reference the previous step's
  * frame twice (contrib side + left-join side), doubling the unrolled
  * plan per step (105 Exchanges at iters=5). The rewrite carries only
  * (doc_id, n, pr_n) through the fold — an inner edge join per step —
  * and re-attaches deg once at the end. This spec re-implements the OLD
  * left-join spelling verbatim and pins equality on random graphs
  * (including isolated-pair and star shapes).
  */
class Opt17Spec extends SparkTestBase {

  /** The pre-round-17 pagerankNano spelling, verbatim (the reference). */
  private def pagerankNanoOld(pairs: DataFrame, iters: Int = 5)
      : DataFrame = {
    val edges = Materialize.cut(
      pairs.select(col("d1").as("src"), col("d2").as("dst"))
        .union(pairs.select(col("d2").as("src"), col("d1").as("dst"))),
      eager = true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgeDeg = Materialize.cut(edges.join(deg, Seq("src")),
      eager = true)
    val n1 = deg.agg(count(lit(1)).as("n"))
    val init = deg.select(col("src").as("doc_id"), col("deg"))
      .crossJoin(broadcast(n1))
      .withColumn("pr_n", expr("CAST(1000000000 AS BIGINT) div n"))
    val after = (1 to iters).foldLeft(init) { (pr, _) =>
      val contrib = edgeDeg
        .join(pr.select(col("doc_id").as("src"), col("pr_n")),
          Seq("src"))
        .select(col("dst").as("doc_id"), expr("pr_n div deg").as("c"))
        .groupBy("doc_id").agg(sum(col("c")).as("s"))
      pr.drop("pr_n").join(contrib, Seq("doc_id"), "left")
        .withColumn("pr_n", expr("(150000000 div n) + " +
          "((17 * coalesce(s, CAST(0 AS BIGINT))) div 20)"))
        .drop("s")
    }
    after.select(col("doc_id"), col("deg"), col("pr_n"))
  }

  test("pagerankNano (linear-plan rewrite) == old left-join spelling " +
    "on random graphs, a star, and an isolated pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random graph: 60 nodes, ~120 distinct d1<d2 pairs
    val random = (1 to 120).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    // star: hub 1000 to 20 leaves; isolated pair (2000, 2001)
    val star = (1 to 20).map(i => (1000L, 1000L + i))
    val fixtures = Seq(
      "random" -> random,
      "star+pair" -> (star :+ (2000L, 2001L))
    )
    for ((name, pairsSeq) <- fixtures; iters <- Seq(1, 5)) {
      val pairs = pairsSeq.toDF("d1", "d2")
      val neu = ext.Dedup.pagerankNano(pairs, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val old = pagerankNanoOld(pairs, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(neu.toSeq == old.toSeq,
        s"$name iters=$iters: new=${neu.take(5).toSeq}… vs " +
          s"old=${old.take(5).toSeq}…")
      Materialize.releaseAll(spark)
    }
  }
}
