package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — the [EXT] media family. Media travel as
  * opaque `binary` columns with a typed metadata struct; the decode /
  * feature-extraction step is a batch-wise `mapPartitions` whose real body
  * (an image/audio codec) is STUBBED with a deterministic fake — the
  * container has no media libraries — while the Spark-side contract
  * (schema, batching shape, partitioning) is real and tested.
  *
  * At scale: media bytes stay columnar in parquet; metadata predicates
  * (mime, width, nbytes) prune at scan time because they're plain struct
  * fields; the decode stage is a narrow map with batch amortization and
  * no shuffle.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String,
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, mime: String, nbytes: Long,
                           features: Array[Float])

  /** Synthesize a media table from `documents` (deterministic: the UTF-8
    * bytes of the text play the role of an encoded image payload). */
  def synthMedia(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("image/fake").as("mime"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nbytes"))
        .as("meta"))

  /** STUB decode: a real implementation would hand each batch to a native
    * codec (e.g. JPEG decode + CNN embed). The deterministic fake derives
    * an 8-dim feature vector from byte statistics so the pipeline shape —
    * batch iteration, output schema, partition preservation — is
    * exercised end-to-end. */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // === STUB: replace with a real batched media decode ===
        batch.map { m =>
          val feats = new Array[Float](8)
          var i = 0
          while (i < m.bytes.length) {
            feats(i % 8) += (m.bytes(i) & 0xff).toFloat / 255f
            i += 1
          }
          MediaFeatures(m.doc_id, m.mime, m.bytes.length.toLong, feats)
        }
      }
    }
  }

  /** STUB resize: deterministic byte-level downsample standing in for an
    * image resize (real impl: decode → scale → re-encode in the batch
    * decode stage). Keeps payloads binary and the op expression-only:
    * picks `targetLen` evenly-spaced bytes. */
  def resizeStub(bytes: org.apache.spark.sql.Column, targetLen: Int)
      : org.apache.spark.sql.Column = {
    val n = octet_length(bytes)
    // === STUB: replace with a real decode→scale→encode ===
    val hx = hex(bytes)
    when(n <= targetLen, bytes).otherwise(
      unhex(array_join(
        transform(sequence(lit(0), lit(targetLen - 1)),
          i => substring(hx, (i * n).divide(targetLen).cast("int") * 2 + 1,
            lit(2))),
        "")))
  }

  /** Frame sampling for "video" payloads: every `stride`-th `frameLen`-byte
    * slice, as pure binary expressions (no UDF). */
  def sampleFrames(bytes: org.apache.spark.sql.Column, frameLen: Int,
                   stride: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0),
        greatest((octet_length(bytes) / (frameLen * stride)).cast("int") - 1,
          lit(0))),
      i => substring(bytes, i * frameLen * stride + 1, lit(frameLen)))
}
