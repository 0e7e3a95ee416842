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
    // shuffle accounting across each run's stages (scale-probe signal:
    // shuffle bytes should scale ~linearly with input or better)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          shufWrite.addAndGet(sc.stageInfo.taskMetrics
            .shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(sc.stageInfo.taskMetrics
            .shuffleReadMetrics.totalBytesRead)
        }
      })
    for (q <- args.filterNot(_.startsWith("--"))) {
      if (explain) {
        val df = SparkEntry.queries(q)(spark, dir)
        // run once so AQE finalizes the plan (ReusedExchange etc. shows)
        df.write.format("noop").mode("overwrite").save()
        println(s"=== $q ===")
        println(df.queryExecution.executedPlan.toString)
      } else for (r <- 1 to 2) {
        shufWrite.set(0L); shufRead.set(0L)
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        // listener events drain async; give the bus a beat before reading
        // (dev tool — a fixed pause beats reaching into private[spark])
        Thread.sleep(400)
        println(f"$q run$r $t%.3fs shufW=${shufWrite.get} " +
          f"shufR=${shufRead.get}")
        Materialize.releaseAll(spark) // same per-query hygiene as Bench
      }
    }
    spark.stop()
  }
}
