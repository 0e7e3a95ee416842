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
