package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-join probe (SCALEPROBE evidence for the Round10Spec pins):
  * builds the planted hot-key fixture at `SKEW_N` rows (default 2M —
  * 95% of the fact on one key), joins it to itself sort-merge, and
  * measures the SAME join three ways:
  *
  *   aqe-split  AQE skew-join split enabled (thresholds production-
  *              realistic relative to the fixture: 16 MB)
  *   no-split   AQE on, skew split disabled — the straggler baseline
  *   salted     the explicit Skew.saltedJoin path (32 salts)
  *
  * Prints wall seconds and the MAX single-task duration of the join
  * stage (the straggler signal the split exists to remove). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SKEW_N", "2000000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val maxTask = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxTask.getAndUpdate(m => math.max(m, te.taskInfo.duration))
      })

    // fact: 95% of rows on one key; dim: ONE row per key (the realistic
    // fact ⋈ dim shape — a self-join would make the hot key quadratic
    // BY DATA and measure the explosion, not the partitioning). The dim
    // is an independent frame: OptimizeSkewedJoin pattern-matches
    // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)), so an aggregate
    // between sort and shuffle opts the join out of the split
    val fact = spark.range(n).select(
      when(col("id") % 20 =!= 0, 1L)
        .otherwise(col("id") % 997).as("k"),
      col("id").as("row_id"))
    val dim = spark.range(997).select(col("id").as("k"),
      (col("id") * 10L).as("nk"))

    def run(tag: String, split: Boolean, salted: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        split.toString)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "16MB")
      maxTask.set(0L)
      val joined =
        if (salted) ext.Skew.saltedJoin(fact, dim, "k", "row_id", 32)
        else fact.join(dim, "k")
      val t0 = System.nanoTime()
      val agg = joined.agg(count(lit(1)), sum("nk"), sum("row_id"))
      val r = agg.collect()(0).getLong(0)
      val t = (System.nanoTime() - t0) / 1e9
      val plan = agg.queryExecution.executedPlan.toString
      val engaged = plan.contains("skewed") || plan.contains("skew=true")
      println(f"[skewprobe] $tag%-9s n=$n wall=$t%.1fs " +
        f"maxTask=${maxTask.get() / 1000.0}%.1fs rows=$r skewRead=$engaged")
    }
    run("warmup", split = true, salted = false)
    run("aqe-split", split = true, salted = false)
    run("no-split", split = false, salted = false)
    run("salted", split = false, salted = true)
    spark.stop()
  }
}
