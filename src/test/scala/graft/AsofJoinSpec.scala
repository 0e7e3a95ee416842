package graft

import org.apache.spark.sql.functions._

import graft.plans.AsofJoin

/** Semantics and plan shape of the union-tag backward as-of join. */
class AsofJoinSpec extends SparkTestBase {

  test("backward as-of: latest right at-or-before, equal-ts inclusive, " +
    "ties by largest tieBreak, null when no prior right") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // before any right row for key 100 -> null
      (2L, 100L, 20L), // equal ts to right row at 20 -> sees it
      (3L, 100L, 25L), // between 20 and 30 -> sees 20's payload
      (4L, 100L, 30L), // equal ts to the DUPLICATE right rows at 30
      (5L, 200L, 99L)  // key with no right rows at all -> null
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (100L, 20L, 1000L, 1.0),
      (100L, 30L, 2000L, 2.0), // duplicate (key, ts):
      (100L, 30L, 2001L, 3.0), //   largest tieBreak (2001) must win
      (100L, 50L, 3000L, 4.0)  // after every left row -> never seen
    ).toDF("user_id", "t", "rid", "rv")
    val got = AsofJoin.backward(left, right, key = "user_id",
      leftTime = "t", rightTime = "t",
      payload = Seq("rid", "rv"), tieBreak = "rid")
      .orderBy("event_id")
      .select("event_id", "asof_rid", "asof_rv")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, null, null),
      (2L, 1000L, 1.0),
      (3L, 1000L, 1.0),
      (4L, 2001L, 3.0),
      (5L, null, null)))
  }

  test("forward as-of: earliest right at-or-after, equal-ts inclusive, " +
    "null when nothing follows") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 5L),  // before 20 -> next right is 20
      (2L, 100L, 20L), // equal ts -> sees 20
      (3L, 100L, 25L), // between 20 and 30 -> 30's payload (dup: 2001)
      (4L, 100L, 55L), // after every right row -> null
      (5L, 200L, 1L)   // key with no right rows -> null
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (100L, 20L, 1000L),
      (100L, 30L, 2000L),
      (100L, 30L, 2001L) // duplicate (key, ts): largest tieBreak wins
    ).toDF("user_id", "t", "rid")
    val got = AsofJoin.forward(left, right, key = "user_id",
      leftTime = "t", rightTime = "t",
      payload = Seq("rid"), tieBreak = "rid")
      .orderBy("event_id")
      .select("event_id", "asof_rid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(got.toSeq == Seq(
      (1L, 1000L), (2L, 1000L), (3L, 2001L), (4L, null), (5L, null)))
  }

  test("the as-of plan is join-free (union + window, one key shuffle)") {
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val signups = Tables.events(spark, sfDir)
      .where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    val df = AsofJoin.backward(events, signups, "user_id", "ts", "ts",
      Seq("signup_id"), "signup_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(df.count() == events.count())
  }

  test("matches an independent per-row scan on the events table") {
    // brute-force point-in-time lookup on a 1-user slice
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id") === 7)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .collect()
    val signups = ev.filter(_.getString(2) == "signup")
      .map(r => (r.getTimestamp(1), r.getLong(0), r.getDouble(3)))
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val expected = ev.map { r =>
      val t = r.getTimestamp(1)
      val prior = signups.filter(s => !s._1.after(t))
      val best = if (prior.isEmpty) null
        else prior.maxBy(s => (us(s._1), s._2))._2
      (r.getLong(0), best)
    }.toMap
    val events = Tables.events(spark, sfDir)
      .where(col("user_id") === 7).select("event_id", "user_id", "ts")
    val su = Tables.events(spark, sfDir)
      .where(col("event_type") === "signup" && col("user_id") === 7)
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    val got = AsofJoin.backward(events, su, "user_id", "ts", "ts",
      Seq("signup_id"), "signup_id")
      .select("event_id", "asof_signup_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got == expected)
  }
}
