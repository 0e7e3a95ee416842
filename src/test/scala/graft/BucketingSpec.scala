package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the scale technique for repeated
  * fact-to-fact joins (SURVEY §4: "bucketing for co-located joins"): both
  * sides bucketed+sorted on the join key join with NO shuffle exchange. */
class BucketingSpec extends SparkTestBase {

  test("bucketed join plans without a shuffle on either side") {
    Tables.lineitem(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("ord_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
        .groupBy("l_orderkey").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // co-located: no Exchange feeds the join (only the final agg may
      // shuffle — and even that folds into the bucketed partitioning)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
