package graft.streaming

import java.net.URI

import org.apache.hadoop.conf.Configuration

/** `rawckpt://` — a local filesystem scheme WITHOUT the checksum layer,
  * for the replay harness's scratch checkpoints only.
  *
  * Why: Structured Streaming's per-micro-batch constant is dominated by
  * checkpoint-manager file ops (offset/commit WAL, one state-store delta
  * per store per batch — a stream-stream join keeps 4 stores × partition).
  * Hadoop's default `file://` is ChecksumFileSystem, so every one of
  * those tiny writes is TWO files (payload + .crc sidecar): measured on
  * this harness, that checksum layer alone is ~110 ms per join
  * micro-batch (state commit 250→140 ms, WAL 70→35 ms). CRC sidecars buy
  * nothing on same-JVM tmpfs scratch that dies with the process — the
  * replay never restarts a query from these checkpoints (class doc in
  * [[StreamingReplay]]); a real deployment points checkpointLocation at
  * durable storage whose integrity story (HDFS/S3 checksums) lives below
  * the FileSystem API anyway.
  *
  * Registering a NEW scheme (instead of overriding `fs.file.impl`)
  * scopes the change to exactly the checkpoint root: every other
  * file:// consumer — parquet sources, staged chunks, sinks — keeps the
  * default checksummed behavior. Both registrations are needed: Spark's
  * CheckpointFileManager prefers the FileContext API (AbstractFileSystem,
  * `fs.AbstractFileSystem.rawckpt.impl`) and falls back to FileSystem
  * (`fs.rawckpt.impl`). */
class RawCkptFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "rawckpt"
  override def getUri: URI = URI.create("rawckpt:///")
}

/** FileContext-side twin of [[RawCkptFileSystem]] (the (URI, Configuration)
  * constructor is the reflection contract for AbstractFileSystem impls). */
class RawCkptFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new RawCkptFileSystem, conf, "rawckpt", false)

object RawCkptFs {
  /** Idempotently register the scheme on the context's Hadoop conf. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    if (hc.get("fs.rawckpt.impl") == null) {
      hc.set("fs.rawckpt.impl", classOf[RawCkptFileSystem].getName)
      hc.set("fs.AbstractFileSystem.rawckpt.impl", classOf[RawCkptFs].getName)
    }
  }
}
