package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (test scope; not part of the library):
  * `Test/runMain graft.DevProfile <queryName> [reps]` times one declared
  * query through the noop sink with the Bench session config. */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    SparkEntry.queries("q01_scan_project")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[profile] $name reps=${times.map(t => f"$t%.2f").mkString(",")} median=${times.sorted.apply(reps / 2)}%.2f")
    spark.stop()
  }
}
