package graft

import org.apache.spark.sql.functions._

/** Bucketed-layout co-location: the write-once-shuffle-never contract. */
class LayoutSpec extends SparkTestBase {

  test("same-bucketed tables join AND aggregate with zero exchanges") {
    val events = Tables.events(spark, sfDir)
    Layout.writeBucketed(events.select("event_id", "user_id", "ts", "value"),
      "ev_bucketed", "user_id", buckets = 8, sortCols = Seq("user_id"))
    Layout.writeBucketed(
      events.groupBy("user_id").agg(count(lit(1)).as("n_total")),
      "ag_bucketed", "user_id", buckets = 8, sortCols = Seq("user_id"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("ev_bucketed")
        .join(spark.table("ag_bucketed"), "user_id")
      val jp = joined.queryExecution.executedPlan.toString
      // the join would normally be SMJ with two shuffles; bucketing
      // satisfies the distribution on both sides -> no exchange at all
      assert(jp.contains("SortMergeJoin"), jp)
      assert(!jp.contains("Exchange hashpartitioning"), jp)
      assert(joined.count() == events.count())
      // keyed aggregation on the bucketed table also runs exchange-free
      val agg = spark.table("ev_bucketed")
        .groupBy("user_id").agg(sum("value").as("s"))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange hashpartitioning"), ap)
      assert(agg.count() == events.select("user_id").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS ag_bucketed")
    }
  }
}
