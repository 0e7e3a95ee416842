package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  SupportsReportStatistics, Statistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 connector for the JSON-lines trip envelope — both
  * directions of the reference's file sink
  * (`meos/examples/04_to_file.rs:131-144`, one `{"id":…,"vt":…,
  * "json":<payload>}` object per line).
  *
  * READ side (closes S3's source loop as a FIRST-CLASS TABLE instead of
  * the `spark.read.json` shortcut in [[graft.sources.TripSource]]):
  * Catalyst plans against it like any v2 table, with
  *
  *  - COLUMN PRUNING pushed into the scan ([[SupportsPushDownRequiredColumns]]
  *    — `SELECT id FROM envelope` never emits the hex payload, and the
  *    streaming parser SKIPS the payload token without materializing the
  *    string);
  *  - PARTITION PLANNING at file grain: the sink writes one line file
  *    per task, so read parallelism mirrors write parallelism and each
  *    [[InputPartition]] streams one file — no driver funnel, no
  *    whole-file buffering (the reader is line-iterator-shaped);
  *  - the Hadoop configuration is captured at PLANNING time and
  *    serialized to executors ([[SerializableConfiguration]]), so the
  *    same connector reads file://, hdfs:// or s3a:// URIs on a real
  *    cluster.
  *
  * WRITE side (the v2 twin of [[graft.sources.TripSink.writeJsonLines]],
  * byte-identical output — TripSinkSpec pins it): each task streams its
  * partition to one hidden temp file and RENAMES it visible on task
  * commit (rename is atomic per file on HDFS/local; readers ignore
  * dot/underscore names, so an aborted attempt is never visible).
  * `mode("overwrite")` maps to [[SupportsTruncate]]: visible files are
  * cleared once, driver-side, before tasks launch. No driver funnel —
  * rows never leave their executor.
  *
  * Registered as format `"trip-envelope"` (and by class name). Usage:
  * `spark.read.format("trip-envelope").load(path)` /
  * `df.write.format("trip-envelope").mode("overwrite").save(path)`
  * (columns must be id BIGINT, vt INT, json STRING — v2 writes resolve
  * by name). */
class TripEnvelopeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "trip-envelope"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TripEnvelopeTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "trip-envelope requires a path: spark.read.format(...).load(path)")
    // supportsExternalMetadata lets a caller pass .schema(...) to skip
    // inferSchema — but the envelope is a FIXED wire format, so a
    // mismatched external schema must fail HERE, at planning time, not
    // as a per-row "unknown envelope field" in some executor
    val want = TripEnvelopeTable.schema
    require(schema.fields.map(f => (f.name, f.dataType)).sameElements(
      want.fields.map(f => (f.name, f.dataType))),
      s"trip-envelope has the fixed wire schema ${want.catalogString}; " +
        s"got ${schema.catalogString}")
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

class TripEnvelopeTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"trip_envelope($path)"
  override def schema(): StructType = TripEnvelopeTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new TripEnvelopeScanBuilder(path,
        options.getInt("maxFilesPerBatch", Int.MaxValue))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TripEnvelopeWriteBuilder(path, info)
}

/** Scan builder with COLUMN PRUNING and FILTER PUSHDOWN: the connector
  * accepts `id` comparison filters and evaluates them INSIDE the
  * reader, where the id is the first ~20 bytes of each line — a
  * filtered scan never materializes (or even token-walks) the multi-KB
  * payload of a non-matching row. Only exactly-evaluable predicates
  * are accepted (id bounds + IsNotNull on any wire field, which is
  * vacuously true for this format); everything else stays post-scan. */
class TripEnvelopeScanBuilder(path: String, maxFilesPerBatch: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = TripEnvelopeTable.schema
  private var idLo: Long = Long.MinValue
  private var idHi: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) pushdown (partial — Spark sums the per-partition
    * counts): an ungrouped count over the envelope never parses a
    * line beyond the id head (or at all, when no id filter is
    * pushed) — the "how many trips landed" operational query costs
    * a line scan, not a JSON parse of every payload. Anything other
    * than a bare COUNT(*) is declined and planned normally. */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    val ok = agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[
        org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) countPushed = true
    ok
  }

  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo("id", v) => longOf(v).isDefined
      case GreaterThan("id", v) => longOf(v).isDefined
      case GreaterThanOrEqual("id", v) => longOf(v).isDefined
      case LessThan("id", v) => longOf(v).isDefined
      case LessThanOrEqual("id", v) => longOf(v).isDefined
      // wire fields are never null — vacuously true, fully handled
      case IsNotNull("id" | "vt" | "json") => true
      case _ => false
    }
    ok.foreach {
      case EqualTo("id", v) =>
        val x = longOf(v).get
        idLo = math.max(idLo, x); idHi = math.min(idHi, x)
      case GreaterThan("id", v) =>
        idLo = math.max(idLo, longOf(v).get + 1)
      case GreaterThanOrEqual("id", v) =>
        idLo = math.max(idLo, longOf(v).get)
      case LessThan("id", v) =>
        idHi = math.min(idHi, longOf(v).get - 1)
      case LessThanOrEqual("id", v) =>
        idHi = math.min(idHi, longOf(v).get)
      case _ => ()
    }
    pushed = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new TripEnvelopeScan(path, required, maxFilesPerBatch, idLo, idHi,
      countPushed)
}

class TripEnvelopeScan(path: String, required: StructType,
                       maxFilesPerBatch: Int = Int.MaxValue,
                       idLo: Long = Long.MinValue,
                       idHi: Long = Long.MaxValue,
                       countPushed: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType =
    if (countPushed)
      StructType(Seq(StructField("count(*)", LongType)))
    else required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(!countPushed,
      "aggregate pushdown is a batch-only capability")
    new TripEnvelopeMicroBatchStream(path, required, maxFilesPerBatch,
      idLo, idHi)
  }
  override def description(): String = {
    val f =
      if (idLo == Long.MinValue && idHi == Long.MaxValue) ""
      else s" PushedFilters: [id in [$idLo, $idHi]]"
    val a = if (countPushed) " PushedAggregation: [COUNT(*)]" else ""
    s"TripEnvelope $path ReadSchema: ${required.catalogString}$f$a"
  }

  private def visibleFiles(): Array[org.apache.hadoop.fs.FileStatus] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
  }

  /** Planner statistics from the LISTING only: total visible bytes. A
    * real sizeInBytes lets Catalyst/AQE make honest broadcast and
    * coalesce decisions for envelope joins instead of assuming the
    * conservative default (= "never broadcastable"). */
  override def estimateStatistics(): Statistics = {
    val bytes = visibleFiles().map(_.getLen).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side FILE LISTING only (metadata, never data): one
    // partition per line file, sorted for deterministic task numbering
    visibleFiles().map(st =>
      TripEnvelopeInputPartition(st.getPath.toUri.toString)
        : InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    if (countPushed)
      new TripEnvelopeCountReaderFactory(conf, idLo, idHi)
    else
      new TripEnvelopeReaderFactory(required.fieldNames, conf, idLo, idHi)
  }
}

/** Pushed-COUNT(*) reader: one partial-count row per line file. With
  * no pushed id bounds this is a pure line count — no JSON parse at
  * all; with bounds, only the ~20-byte id head of each line is
  * token-walked. */
class TripEnvelopeCountReaderFactory(conf: SerializableConfiguration,
                                     idLo: Long, idHi: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TripEnvelopeInputPartition].file
    new PartitionReader[InternalRow] {
      private val inner = new TripEnvelopeReader(file, 0, -1, -1, -1,
        conf, idLo, idHi)
      private var emitted = false
      private var n = 0L
      override def next(): Boolean = {
        if (emitted) return false
        while (inner.next()) n += 1
        true
      }
      override def get(): InternalRow = {
        emitted = true
        InternalRow(n)
      }
      override def close(): Unit = inner.close()
    }
  }
}

case class TripEnvelopeInputPartition(file: String) extends InputPartition

class TripEnvelopeReaderFactory(fields: Array[String],
                                conf: SerializableConfiguration,
                                idLo: Long = Long.MinValue,
                                idHi: Long = Long.MaxValue)
    extends PartitionReaderFactory {
  // field projection resolved ONCE here, not per row: slot index of each
  // envelope field in the pruned output row, or -1 when pruned away
  private val idSlot = fields.indexOf("id")
  private val vtSlot = fields.indexOf("vt")
  private val jsonSlot = fields.indexOf("json")
  require(fields.forall(Set("id", "vt", "json")),
    s"unknown envelope field(s): ${fields.mkString(",")}")

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new TripEnvelopeReader(
      partition.asInstanceOf[TripEnvelopeInputPartition].file,
      fields.length, idSlot, vtSlot, jsonSlot, conf, idLo, idHi)
}

/** Streams one envelope file line by line; each line is parsed with
  * Jackson's STREAMING API (already on Spark's classpath) so a pruned
  * payload field is token-skipped, never materialized as a String —
  * `SELECT id` pays parse cost proportional to the 20-byte head of each
  * line, not the multi-KB hex payload. Malformed lines fail loudly —
  * the envelope is a wire format, not a lake of unknowns. */
class TripEnvelopeReader(file: String, width: Int, idSlot: Int,
                         vtSlot: Int, jsonSlot: Int,
                         conf: SerializableConfiguration,
                         idLo: Long = Long.MinValue,
                         idHi: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {
  private val factory =
    new com.fasterxml.jackson.core.JsonFactory()
  private val in = {
    val p = new HPath(java.net.URI.create(file))
    val fs = p.getFileSystem(conf.value)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p),
        java.nio.charset.StandardCharsets.UTF_8))
  }
  private val filtered = idLo != Long.MinValue || idHi != Long.MaxValue
  private var line: String = _

  /** Pushed-filter check: token-walk only as far as the id field (the
    * ~20-byte line head on sink-written files), never touching the
    * payload of a non-matching row. */
  private def idMatches(l: String): Boolean = {
    import com.fasterxml.jackson.core.JsonToken
    val p = factory.createParser(l)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT,
        s"malformed envelope line: $l")
      var tok = p.nextToken()
      while (tok == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        p.nextToken()
        if (name == "id") {
          val v = p.getLongValue
          return v >= idLo && v <= idHi
        }
        p.skipChildren()
        tok = p.nextToken()
      }
      throw new IllegalArgumentException(
        s"envelope line without id: $l")
    } finally p.close()
  }

  override def next(): Boolean = {
    line = in.readLine()
    while (line != null &&
      (line.isEmpty || (filtered && !idMatches(line))))
      line = in.readLine()
    line != null
  }

  override def get(): InternalRow = {
    import com.fasterxml.jackson.core.JsonToken
    val row = new Array[Any](width)
    val p = factory.createParser(line)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT,
        s"malformed envelope line: $line")
      var tok = p.nextToken()
      while (tok == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        p.nextToken()
        name match {
          case "id" =>
            if (idSlot >= 0) row(idSlot) = p.getLongValue
          case "vt" =>
            if (vtSlot >= 0) row(vtSlot) = p.getIntValue
          case "json" =>
            if (jsonSlot >= 0)
              row(jsonSlot) = UTF8String.fromString(p.getText)
            else p.skipChildren() // pruned: skip, never materialize
          case other =>
            throw new IllegalArgumentException(
              s"unknown envelope field $other")
        }
        tok = p.nextToken()
      }
    } finally p.close()
    InternalRow.fromSeq(row.toSeq)
  }

  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------------------
// streaming read side
// ---------------------------------------------------------------------------

/** Offset for the envelope micro-batch stream: the admitted-prefix
  * LENGTH of the name-ordered file list. */
case class TripEnvelopeOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

/** MicroBatchStream over an envelope directory — the connector's third
  * direction (batch read / batch write / STREAMING read), so a landing
  * prefix of sink-committed line files can feed Structured Streaming
  * directly.
  *
  * Offset model: offsets index the NAME-ORDERED visible file list, so an
  * offset is reconstructible from a listing alone — a restart replans
  * `(start, end]` from the same sorted listing without any side log.
  * That is sound because (a) committed files are IMMUTABLE (the write
  * side renames a hidden temp into place, so a file is complete the
  * moment it is visible, and aborted attempts never surface) and (b)
  * arrivals are name-monotonic (the sink's `part-%05d` task numbering;
  * any producer whose names sort after existing ones qualifies — the
  * FileStreamSource landing convention). `maxFilesPerBatch` bounds each
  * admission — the rate-limit knob that keeps a cold start from reading
  * the whole landing zone as one giant micro-batch. */
class TripEnvelopeMicroBatchStream(path: String, required: StructType,
                                   maxFilesPerBatch: Int,
                                   idLo: Long = Long.MinValue,
                                   idHi: Long = Long.MaxValue)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // planning-time state only (driver): the admitted name-sorted prefix
  private var admitted: Vector[String] = Vector.empty
  // Monotonic floor: the largest offset this driver has SEEN — raised by
  // deserializeOffset (checkpoint recovery hands the committed offset
  // through here) and planInputPartitions. After a driver restart
  // `admitted` is empty; without the floor, latestOffset() would derive
  // the next offset from that empty prefix and return maxFilesPerBatch —
  // an offset REGRESSION below the checkpointed commit, which Spark
  // would commit and then replan, re-delivering already-committed files
  // (breaking exactly-once restart soundness).
  private var floor: Long = 0L
  private val conf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  private def listSorted(): Vector[String] = {
    val root = new HPath(path)
    val fs = root.getFileSystem(conf.value)
    if (!fs.exists(root)) Vector.empty
    else fs.listStatus(root)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.toUri.toString)
      .sorted.toVector
  }

  override def initialOffset(): Offset = TripEnvelopeOffset(0L)

  override def latestOffset(): Offset = {
    val all = listSorted()
    // restart path: rebuild the admitted prefix from the listing up to
    // the floor before admitting more (immutable files + name-monotonic
    // arrivals make the sorted listing's prefix stable, so the rebuilt
    // prefix is the same file set the pre-restart driver admitted)
    val base = math.max(admitted.length.toLong, floor)
    require(all.length.toLong >= base,
      s"envelope stream lost files: committed offset $base, " +
        s"listing ${all.length}")
    val take = math.min(all.length.toLong, base + maxFilesPerBatch)
    admitted = all.take(take.toInt)
    floor = math.max(floor, admitted.length.toLong)
    TripEnvelopeOffset(admitted.length.toLong)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[TripEnvelopeOffset].n.toInt
    val e = end.asInstanceOf[TripEnvelopeOffset].n.toInt
    // restart path: the admitted prefix is rebuilt from the listing —
    // name order makes indices stable across driver restarts
    if (admitted.length < e) admitted = listSorted().take(e)
    require(admitted.length >= e,
      s"envelope stream lost files: offset $e, listing ${admitted.length}")
    floor = math.max(floor, e.toLong)
    admitted.slice(s, e)
      .map(f => TripEnvelopeInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TripEnvelopeReaderFactory(required.fieldNames, conf, idLo, idHi)

  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    floor = math.max(floor, n)
    TripEnvelopeOffset(n)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ---------------------------------------------------------------------------
// write side
// ---------------------------------------------------------------------------

class TripEnvelopeWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TripEnvelopeBatchWrite(path, doTruncate)
  }
}

class TripEnvelopeBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) fs.mkdirs(root)
    else if (truncate) {
      // overwrite = clear VISIBLE files once, driver-side, before any
      // task launches (hidden temp files of a dead attempt go too)
      fs.listStatus(root).filter(_.isFile)
        .foreach(st => fs.delete(st.getPath, false))
    }
    new TripEnvelopeWriterFactory(path,
      new SerializableConfiguration(conf))
  }
  // per-task rename-on-commit already made files visible; the driver
  // commit only has to exist. An aborted job leaves only dot-files,
  // which every reader ignores.
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class TripEnvelopeWriterFactory(path: String,
                                conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new TripEnvelopeDataWriter(path, partitionId, taskId, conf)
}

private case class TripEnvelopeCommit(file: String)
    extends WriterCommitMessage

/** One task = one line file (mirroring the legacy text sink's layout and
  * the read side's file-grain parallelism). Bytes are produced by the
  * same Jackson generator family `to_json` uses, so each line is
  * byte-identical to [[graft.sources.TripSink.envelope]]'s output. */
class TripEnvelopeDataWriter(path: String, partitionId: Int, taskId: Long,
                             conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val visible = new HPath(path,
    f"part-$partitionId%05d-$taskId.txt")
  private val temp = new HPath(path,
    f".part-$partitionId%05d-$taskId.txt.inprogress")
  private val fs = visible.getFileSystem(conf.value)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(temp, true),
      java.nio.charset.StandardCharsets.UTF_8))
  private val factory = new com.fasterxml.jackson.core.JsonFactory()

  override def write(record: InternalRow): Unit = {
    val sw = new java.io.StringWriter(64)
    val g = factory.createGenerator(sw)
    g.writeStartObject()
    g.writeNumberField("id", record.getLong(0))
    g.writeNumberField("vt", record.getInt(1))
    g.writeStringField("json", record.getUTF8String(2).toString)
    g.writeEndObject()
    g.close()
    out.write(sw.toString)
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    require(fs.rename(temp, visible),
      s"trip-envelope: rename $temp -> $visible failed")
    TripEnvelopeCommit(visible.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(temp, false)
  }

  override def close(): Unit = ()
}
