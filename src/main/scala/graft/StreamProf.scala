package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler for the qs replay family: runs a named query
  * twice and prints each streaming micro-batch's durationMs breakdown
  * from the progress log, so the per-row constant can be attributed
  * (startup vs per-batch planning vs state commit vs sink). */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"  [started ${System.nanoTime() / 1000000}ms]")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durMs=${p.durationMs} evTime=${p.eventTime}")
        p.stateOperators.foreach(so =>
          println(s"    state op=${so.operatorName} commit=${so.commitTimeMs}ms " +
            s"update=${so.allUpdatesTimeMs}ms removal=${so.allRemovalsTimeMs}ms " +
            s"rows=${so.numRowsTotal} mem=${so.memoryUsedBytes}"))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    for (q <- args; r <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$q run$r ${(System.nanoTime() - t0) / 1e9}%.3fs")
      Materialize.releaseAll(spark)
    }
    spark.stop()
  }
}
