package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types.StructType

import graft.sources.v2.TripEnvelopeMicroBatchStream

/** Round-14 pins. */
class Round14Spec extends SparkTestBase {

  private def plantEnvelopeDir(n: Int): String = {
    val d = Files.createTempDirectory("r14-env").toString
    (0 until n).foreach { i =>
      Files.write(Paths.get(d, f"part-$i%05d-$i.txt"),
        s"""{"id":$i,"vt":1,"json":"AB"}""".getBytes(StandardCharsets.UTF_8))
    }
    d
  }

  private def offsetOf(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o.json().toLong

  test("MicroBatchStream restart: latestOffset never regresses below a " +
    "checkpoint-recovered committed offset (ADVICE r13)") {
    spark.sparkContext.setLogLevel("ERROR") // touch the session first
    val dir = plantEnvelopeDir(9)
    val schema = StructType.fromDDL("id BIGINT, vt INT, json STRING")
    // fresh driver after restart: `admitted` is empty; Spark replays the
    // checkpointed end offset through deserializeOffset before asking
    // for the next latestOffset
    val restarted = new TripEnvelopeMicroBatchStream(dir, schema, 3)
    val committed = restarted.deserializeOffset("6")
    assert(offsetOf(committed) == 6L)
    // pre-fix this read 3 (empty prefix + maxFilesPerBatch) — a
    // regression Spark would commit, replanning (3,6] and re-delivering
    // committed files; with the floor it admits past 6 up to 6+3 = 9
    assert(offsetOf(restarted.latestOffset()) == 9L)
  }

  test("qz75 distributed footer walk: global per-table row-group " +
    "numbering over multi-file directory layouts matches a driver walk") {
    import scala.jdk.CollectionConverters._
    val d = Files.createTempDirectory("r14-layout").toString
    // stage every layout table as a DIRECTORY of part files so the
    // one-task-per-file parse and its base-offset renumbering are
    // actually exercised (the sf dirs are single-file)
    val tables = Seq("events", "documents", "embeddings", "lineitem",
      "orders")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").repartition(3)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    val out = SparkEntry.queries("qz75_parquet_layout")(spark, d)
      .collect()
    val conf = spark.sessionState.newHadoopConf()
    tables.foreach { t =>
      val rows = out.filter(_.getString(0) == t)
      // contiguous global numbering 0..n-1 per table
      assert(rows.map(_.getLong(1)).sorted.sameElements(
        rows.indices.map(_.toLong)), s"$t: non-contiguous row groups")
      // driver-walk twin: same (row_group → n_rows) assignment
      val p = new org.apache.hadoop.fs.Path(s"$d/$t.parquet")
      val fs = p.getFileSystem(conf)
      val files = fs.listStatus(p)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath).sortBy(_.getName)
      val want = files.flatMap { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getFooter.getBlocks.asScala.toList.map(b =>
          (b.getRowCount, b.getColumns.asScala.map(_.getTotalSize).sum))
        finally r.close()
      }.zipWithIndex.map { case ((n, c), i) => (i.toLong, n, c) }
      val got = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(got.sameElements(want), s"$t: footer rows diverge")
    }
  }

  test("MicroBatchStream restart: planInputPartitions also raises the " +
    "floor, and lost files past the floor fail fast") {
    val dir = plantEnvelopeDir(5)
    val schema = StructType.fromDDL("id BIGINT, vt INT, json STRING")
    val restarted = new TripEnvelopeMicroBatchStream(dir, schema, 2)
    // restart where Spark first replans the last uncommitted batch
    // (start=2, end=4) before asking for a new offset
    val parts = restarted.planInputPartitions(
      restarted.deserializeOffset("2"), restarted.deserializeOffset("4"))
    assert(parts.length == 2)
    assert(offsetOf(restarted.latestOffset()) == 5L) // 4 + 2 capped at 5
    // a second restart against a truncated listing must fail fast, not
    // silently regress: committed 5, but only 1 file survives
    val lossy = plantEnvelopeDir(1)
    val broken = new TripEnvelopeMicroBatchStream(lossy, schema, 2)
    broken.deserializeOffset("5")
    val e = intercept[IllegalArgumentException](broken.latestOffset())
    assert(e.getMessage.contains("lost files"))
  }
}
