package graft

import org.apache.spark.sql.SparkSession

/** The injected optimizer rule turns the SQL spelling of a box-overlap
  * theta join (J2's conjunction pattern) into the bucketed equi-join —
  * no nested-loop/cartesian — with output identical to the naive plan. */
class OverlapJoinRuleSpec extends SparkTestBase {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    spark // force the shared session/context up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        // force the non-broadcast path so the rule (not BNLJ-broadcast)
        // must handle the theta join
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(s2)
      finally s2.conf.set("spark.graft.overlapJoin.enabled", "true")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  private def boxesSql(s: SparkSession): Unit = {
    Tables.events(s, sfDir)
      .groupBy("user_id")
      .agg(graft.meos.Boxes.tboxAgg(
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("ts")).as("box"))
      .selectExpr("user_id AS id", "box.vmin vmin", "box.vmax vmax",
        "box.tmin tmin", "box.tmax tmax")
      .createOrReplaceTempView("boxes")
  }

  private val OverlapSql =
    """SELECT a.id AS u1, b.id AS u2
      |FROM boxes a JOIN boxes b
      |  ON a.tmin <= b.tmax AND b.tmin <= a.tmax
      | AND a.vmin <= b.vmax AND b.vmin <= a.vmax
      | AND a.id < b.id
      |ORDER BY u1, u2""".stripMargin

  test("SQL overlap join gets the bucketed plan, not a nested loop") {
    withExtSession { s =>
      boxesSql(s)
      s.conf.set("spark.graft.overlapJoin.bucketWidthSeconds",
        7L * 24 * 3600)
      val df = s.sql(OverlapSql)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"expected bucketed equi-join, got:\n$plan")
      assert(plan.contains("Generate explode"),
        s"expected bucket explode in plan:\n$plan")

      // output identical to the rule-disabled naive plan
      val fast = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      s.conf.set("spark.graft.overlapJoin.enabled", "false")
      val naive = s.sql(OverlapSql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fast == naive)
      assert(fast.nonEmpty)
    }
  }

  test("rule keeps duplicate rows faithfully (no dedup distortion)") {
    withExtSession { s =>
      import s.implicits._
      // two identical left rows must each pair with the match — and a
      // multi-bucket-overlap pair must appear exactly once (canonical
      // bucket), matching inner-join multiset semantics
      Seq((1L, "2024-01-01 00:00:00", "2024-03-01 00:00:00"),
          (1L, "2024-01-01 00:00:00", "2024-03-01 00:00:00"),
          (2L, "2024-01-15 00:00:00", "2024-02-15 00:00:00"))
        .toDF("id", "lo", "hi")
        .selectExpr("id", "CAST(lo AS TIMESTAMP) tmin",
          "CAST(hi AS TIMESTAMP) tmax")
        .createOrReplaceTempView("iv")
      s.conf.set("spark.graft.overlapJoin.bucketWidthSeconds", 24L * 3600)
      val rows = s.sql(
        """SELECT a.id, b.id FROM iv a JOIN iv b
          |ON a.tmin <= b.tmax AND b.tmin <= a.tmax AND a.id < b.id
          |""".stripMargin)
      val plan = rows.queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode"), s"rule did not fire:\n$plan")
      val got = rows.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        .sorted
      assert(got == Seq((1L, 2L), (1L, 2L)))
    }
  }
}
