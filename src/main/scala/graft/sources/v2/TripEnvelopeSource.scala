package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 READ connector for the JSON-lines trip envelope — the
  * inverse of [[graft.sources.TripSink.writeJsonLines]] and of the
  * reference's file sink (`meos/examples/04_to_file.rs:131-144`, one
  * `{"id":…,"vt":…,"json":<payload>}` object per line). This closes the
  * S3 source/sink loop as a FIRST-CLASS TABLE instead of the
  * `spark.read.json` shortcut in [[graft.sources.TripSource]]: Catalyst
  * plans against it like any v2 table, with
  *
  *  - COLUMN PRUNING pushed into the scan ([[SupportsPushDownRequiredColumns]]
  *    — `SELECT id FROM envelope` never materializes the hex payload,
  *    which dominates the bytes);
  *  - PARTITION PLANNING at file grain: the sink writes one line file
  *    per task, so read parallelism mirrors write parallelism and each
  *    [[InputPartition]] streams one file — no driver funnel, no
  *    whole-file buffering (the reader is line-iterator-shaped);
  *  - the Hadoop configuration is captured at PLANNING time and
  *    serialized to executors ([[SerializableConfiguration]]), so the
  *    same connector reads file://, hdfs:// or s3a:// URIs on a real
  *    cluster.
  *
  * Registered as format `"trip-envelope"` (and by class name). Usage:
  * `spark.read.format("trip-envelope").load(path)`. */
class TripEnvelopeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "trip-envelope"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TripEnvelopeTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "trip-envelope requires a path: spark.read.format(...).load(path)")
    new TripEnvelopeTable(path)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object TripEnvelopeTable {
  /** The envelope wire schema (`meos/examples/04_to_file.rs:142`):
    * id BIGINT, vt INT, json STRING (hex-WKB or MF-JSON payload). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("vt", IntegerType),
    StructField("json", StringType)))
}

class TripEnvelopeTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"trip_envelope($path)"
  override def schema(): StructType = TripEnvelopeTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new TripEnvelopeScanBuilder(path)
}

class TripEnvelopeScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TripEnvelopeTable.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TripEnvelopeScan(path, required)
}

class TripEnvelopeScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TripEnvelope $path ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side FILE LISTING only (metadata, never data): one
    // partition per line file, sorted for deterministic task numbering
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
      .map(st =>
        TripEnvelopeInputPartition(st.getPath.toUri.toString)
          : InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new TripEnvelopeReaderFactory(required.fieldNames, conf)
  }
}

case class TripEnvelopeInputPartition(file: String) extends InputPartition

class TripEnvelopeReaderFactory(fields: Array[String],
                                conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new TripEnvelopeReader(
      partition.asInstanceOf[TripEnvelopeInputPartition].file, fields,
      conf)
}

/** Streams one envelope file line by line; each line is parsed with
  * Jackson (already on Spark's classpath) and projected onto the pruned
  * read schema. Malformed lines fail loudly — the envelope is a wire
  * format, not a lake of unknowns. */
class TripEnvelopeReader(file: String, fields: Array[String],
                         conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  private val in = {
    val p = new HPath(java.net.URI.create(file))
    val fs = p.getFileSystem(conf.value)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p),
        java.nio.charset.StandardCharsets.UTF_8))
  }
  private var line: String = _

  override def next(): Boolean = {
    line = in.readLine()
    while (line != null && line.isEmpty) line = in.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val node = mapper.readTree(line)
    InternalRow.fromSeq(fields.toSeq.map {
      case "id" => node.get("id").asLong()
      case "vt" => node.get("vt").asInt()
      case "json" => UTF8String.fromString(node.get("json").asText())
      case other =>
        throw new IllegalArgumentException(s"unknown envelope field $other")
    })
  }

  override def close(): Unit = in.close()
}
