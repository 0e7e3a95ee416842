package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiler (dev tool): run named queries from
  * [[SparkEntry.queries]] twice each through the noop sink and print
  * wall-times — first run shows planning+codegen cost, second the
  * steady state. Usage: `sbt "runMain graft.QProf qx5_ngram_jaccard"`;
  * `SPARK_GRAFT_SF_DIR` overrides the default sf0.1 input. */
object QProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    for (q <- args.filterNot(_.startsWith("--"))) {
      if (explain) {
        val df = SparkEntry.queries(q)(spark, dir)
        // run once so AQE finalizes the plan (ReusedExchange etc. shows)
        df.write.format("noop").mode("overwrite").save()
        println(s"=== $q ===")
        println(df.queryExecution.executedPlan.toString)
      } else for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(s"$q run$r ${(System.nanoTime() - t0) / 1e9}s")
        Materialize.releaseAll(spark) // same per-query hygiene as Bench
      }
    }
    spark.stop()
  }
}
