package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiler (dev tool): run named queries from
  * [[SparkEntry.queries]] twice each through the noop sink and print
  * wall-times — first run shows planning+codegen cost, second the
  * steady state. Usage: `sbt "runMain graft.QProf qx5_ngram_jaccard"`;
  * `SPARK_GRAFT_SF_DIR` overrides the default sf0.1 input. */
object QProf {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CONF: semicolon-separated extra session confs
    // ("k=v;k=v") — the A/B lever for config experiments (AQE
    // coalescing grain, codegen, etc.) without editing this file.
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .collect { case Array(k, v) => (k.trim, v.trim) }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same core count AND derived AQE grain as the bench session, so
    // steady-state numbers here predict bench medians at ANY
    // SPARK_GRAFT_CPUS, not just 32 (ADVICE r16; override via
    // SPARK_GRAFT_CONF)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (adv, minPart) = Bench.derivedAqeGrain(dir, cpus.toInt)
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        adv.toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        minPart.toString)
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0)((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explain = args.contains("--explain")
    // --pressure: run every query under INDUCED DISK PRESSURE — a
    // background writer hammering the same disk the block manager
    // spills/persists to (spark.local.dir, i.e. java.io.tmpdir here).
    // This is the testable form of the driver-box condition under which
    // the r12/r13 sidecars selectively inflated the Materialize-heavy
    // queries (qe31/qx81): an idle-box QProf can't reproduce
    // block-manager I/O contention, a saturating writer can. The writer
    // streams 64 MB bursts with fsync, ~200-400 MB/s sustained.
    val pressure = args.contains("--pressure")
    @volatile var stopPressure = false
    val pressureThread = if (!pressure) None else Some {
      val t = new Thread(() => {
        val buf = new Array[Byte](1 << 20)
        new java.util.Random(42).nextBytes(buf)
        val tmp = java.nio.file.Paths.get(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"))
        var i = 0L
        while (!stopPressure) {
          val f = tmp.resolve(s"qprof-pressure-$i.bin")
          val ch = java.nio.channels.FileChannel.open(f,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            var j = 0
            while (j < 64 && !stopPressure) {
              ch.write(java.nio.ByteBuffer.wrap(buf)); j += 1
            }
            ch.force(false)
          } finally ch.close()
          java.nio.file.Files.deleteIfExists(f)
          i += 1
        }
      }, "qprof-pressure")
      t.setDaemon(true)
      t.start()
      println("[pressure writer ON: 64MB fsync bursts to tmpdir]")
      t
    }
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
        // `formatted` is what the round deliverables pin plan claims
        // against (Exchange count, join strategy, PushedFilters); the
        // executedPlan tree (post-AQE) follows for ReusedExchange/final
        // stage shape, which formatted-on-the-logical-plan can't show.
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        println("--- executed (post-AQE) ---")
        println(df.queryExecution.executedPlan.toString)
      } else if (args.contains("--jobs")) {
        // Job-grain decomposition of one query: how many Spark jobs one
        // noop run submits (each is a sequential driver round-trip —
        // eager builder actions, AQE stage materializations, the final
        // write), their summed wall, and the gap (= driver-side work:
        // analysis, optimization, AQE re-planning, codegen lookups).
        val nJobs = new java.util.concurrent.atomic.AtomicLong()
        val jobMs = new java.util.concurrent.atomic.AtomicLong()
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        val nStages = new java.util.concurrent.atomic.AtomicLong()
        val nTasks = new java.util.concurrent.atomic.AtomicLong()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              nJobs.incrementAndGet()
              starts.put(j.jobId, System.nanoTime())
              if (args.contains("--jobtrace"))
                println(s"  [job ${j.jobId}] stages=${j.stageInfos.map(si =>
                  s"${si.name.takeWhile(_ != '(')}:${si.numTasks}")
                  .mkString(",")} site=${Option(j.properties)
                  .flatMap(p => Option(p.getProperty(
                    "spark.job.description"))).getOrElse("-")}")
            }
            override def onJobEnd(
                j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              Option(starts.remove(j.jobId)).foreach(t0 =>
                jobMs.addAndGet((System.nanoTime() - t0) / 1000000L))
            }
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
                : Unit = {
              nStages.incrementAndGet()
              nTasks.addAndGet(sc.stageInfo.numTasks)
            }
          })
        for (r <- 1 to 2) {
          nJobs.set(0); jobMs.set(0); nStages.set(0); nTasks.set(0)
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(q)(spark, dir)
          val tBuild = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // listener drain
          println(f"$q jobs r$r wall=$t%.2fs build=$tBuild%.2fs " +
            f"nJobs=${nJobs.get} jobMs=${jobMs.get} " +
            f"nStages=${nStages.get} nTasks=${nTasks.get}")
          Materialize.releaseAll(spark)
        }
      } else if (args.contains("--phases")) {
        // Catalyst phase attribution (round-16 optimization evidence):
        // wall time of one noop run split into analysis/optimization/
        // physical-planning (QueryPlanningTracker) vs everything else
        // (execution + codegen). Two runs — run1 pays first-touch
        // codegen, run2 is the steady state the bench medians see.
        for (r <- 1 to 2) {
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(q)(spark, dir)
          val tBuild = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          val ph = df.queryExecution.tracker.phases
            .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
            .mkString(" ")
          println(f"$q phases r$r wall=$t%.2fs build=$tBuild%.2fs $ph")
          Materialize.releaseAll(spark)
        }
      } else for (r <- 1 to (if (args.contains("--dropcache")) 3 else 2)) {
        // --dropcache (VERDICT r15 #2's testable form of the qx81
        // cold-page-cache theory): drop the OS page cache before the
        // LAST run, so run2 = warm steady state and run3 = the same
        // bytes re-read from disk — the delta IS the page-cache
        // dependence of the staged-parquet design, measured, not
        // theorized. Root-only (dev box); failures are non-fatal.
        if (r == 3) {
          import scala.sys.process._
          ("sync" :: Nil).!
          ("sh" :: "-c" :: "echo 3 > /proc/sys/vm/drop_caches" :: Nil).!
          println(s"[$q: page cache dropped before run3]")
        }
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
    stopPressure = true
    pressureThread.foreach(_.join(3000))
    spark.stop()
  }
}
