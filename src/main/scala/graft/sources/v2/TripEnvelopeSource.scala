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
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
  private var required: StructType = TripEnvelopeTable.schema
  private var idLo: Long = Long.MinValue
  private var idHi: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[PushedEnvAgg] = None
  private var limit: Option[Int] = None
  private var topN: Option[(Boolean, Int)] = None // (ascending, k)

  // both SupportsPushDownLimit and SupportsPushDownTopN default this to
  // true; Scala requires the diamond to be resolved explicitly — and
  // PARTIAL is exactly this connector's contract for both (readers cap
  // or k-best per file, Spark applies the global limit / final sort)
  override def isPartiallyPushed(): Boolean = true

  /** TopN pushdown (PARTIAL — Spark re-sorts and re-limits): a single
    * ORDER BY id (either direction; id is never null so null ordering
    * is moot) with LIMIT k. Each reader keeps only its k best lines by
    * id from the head walk and fully parses just those; on an
    * id-DISJOINT layout the scan additionally plans only the range-
    * order file prefix covering k rows. Anything else (payload sort
    * keys, multi-key orders) is declined and planned normally. */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference,
      SortDirection}
    val ok = orders.length == 1 && (orders(0).expression() match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    if (ok) topN = Some(
      (orders(0).direction() == SortDirection.ASCENDING, l))
    ok
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown (PARTIAL — `isPartiallyPushed` stays true, so
    * Spark keeps the global limit): each reader stops after `limit`
    * admitted lines, and — when the id index covers every visible file
    * and no filter is pushed — the scan plans only the NAME-ORDER
    * PREFIX of files whose indexed row counts cover the limit. A
    * `LIMIT 10` over a million-file landing zone opens one file, not a
    * million. */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    true
  }

  /** Aggregate pushdown (partial — Spark finalizes over the
    * per-partition rows: COUNT partials re-sum, MIN/MAX re-min/max,
    * grouped partials re-group): any combination of COUNT(*),
    * MIN(id), MAX(id), optionally GROUP BY vt. None of these parse a
    * line beyond the id/vt head — the "how many trips landed / what
    * id range / per-type volume" operational queries cost a line
    * scan, not a JSON parse of every payload. Anything else
    * (aggregates over the payload, other group keys) is declined and
    * planned normally. */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{
      CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.{Expression,
      NamedReference}
    def named(e: Expression, f: String): Boolean = e match {
      case r: NamedReference => r.fieldNames.sameElements(Array(f))
      case _ => false
    }
    val groupOk = agg.groupByExpressions().isEmpty ||
      (agg.groupByExpressions().length == 1 &&
        named(agg.groupByExpressions()(0), "vt"))
    val fns = agg.aggregateExpressions().map {
      case _: CountStar => PushedEnvAgg.Count
      case m: Min if named(m.column, "id") => PushedEnvAgg.MinId
      case m: Max if named(m.column, "id") => PushedEnvAgg.MaxId
      case _ => -1
    }
    val ok = groupOk && fns.nonEmpty && !fns.contains(-1)
    if (ok) pushedAgg = Some(PushedEnvAgg(
      agg.groupByExpressions().nonEmpty, fns.toSeq))
    ok
  }

  /** Exact-integral values only (ADVICE r14): `Number.longValue()`
    * silently truncates a fractional comparand (id > 10.5 would push as
    * id > 10 — and because a pushed filter is reported fully handled,
    * Spark drops the post-scan copy, so truncation would return WRONG
    * rows, not just extra ones). Catalyst normally folds comparisons on
    * a LongType column to Long literals, so declining the exotic types
    * costs nothing; they stay post-scan and evaluate correctly. */
  private def longOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue())
    case i: java.lang.Integer => Some(i.longValue())
    case s: java.lang.Short => Some(s.longValue())
    case b: java.lang.Byte => Some(b.longValue())
    case _ => None // fractional / decimal / string: decline the push
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo("id", v) => longOf(v).isDefined
      // strict bounds at the Long extremes would overflow the ±1
      // half-open adjustment below (GreaterThan(id, Long.MaxValue)
      // wrapped idLo to Long.MinValue — an empty range silently turned
      // into a full scan, ADVICE r14). Decline; Spark keeps the filter
      // post-scan and evaluates it exactly (to zero rows).
      case GreaterThan("id", v) => longOf(v).exists(_ != Long.MaxValue)
      case GreaterThanOrEqual("id", v) => longOf(v).isDefined
      case LessThan("id", v) => longOf(v).exists(_ != Long.MinValue)
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
      pushedAgg, limit, topN)
}

/** A pushed envelope aggregation: optional GROUP BY vt plus the agg
  * list in Spark's declared order (so the partial-row schema zips
  * positionally with what the final aggregate expects). Functions are
  * small ints so the spec travels to executors without class baggage. */
case class PushedEnvAgg(groupByVt: Boolean, fns: Seq[Int]) {
  def describe: String = {
    val names = fns.map {
      case PushedEnvAgg.Count => "COUNT(*)"
      case PushedEnvAgg.MinId => "MIN(id)"
      case PushedEnvAgg.MaxId => "MAX(id)"
    }
    s"PushedAggregation: [${names.mkString(", ")}]" +
      (if (groupByVt) " PushedGroupBy: [vt]" else "")
  }
}
object PushedEnvAgg {
  val Count = 0
  val MinId = 1
  val MaxId = 2
}

class TripEnvelopeScan(path: String, required: StructType,
                       maxFilesPerBatch: Int = Int.MaxValue,
                       idLo: Long = Long.MinValue,
                       idHi: Long = Long.MaxValue,
                       agg: Option[PushedEnvAgg] = None,
                       limit: Option[Int] = None,
                       topN: Option[(Boolean, Int)] = None)
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  private def aggPushed: Boolean = agg.isDefined
  private def groupByVt: Boolean = agg.exists(_.groupByVt)

  /** REPORTED PARTITIONING (capability #9 — VERDICT r15 #5, the
    * connector analog of q55's bucketed layout): when the commit-time
    * id index PROVES every visible file holds exactly one id (min ==
    * max — the entity-per-file landing layout a per-trip producer
    * writes), the scan reports `KeyGroupedPartitioning(identity(id))`
    * and each partition carries its id as the partition key. An
    * id-grouped aggregation over the envelope then plans with ZERO
    * exchange — Spark's partial/final aggregate fuse over the scan's
    * own partitions (`spark.sql.sources.v2.bucketing.enabled` gates
    * the exec-side grouping; files sharing an id collapse into one
    * reader partition). The contract is honest by construction: the
    * key is reported ONLY when each file's rows provably share it, so
    * storage-partitioned planning can never misplace a row. Any
    * overlap (a multi-id file, an unindexed file, a pushed
    * aggregate/limit/TopN that re-plans the file set) falls back to
    * `UnknownPartitioning` = normal planning.
    *
    * Returns the (file, id) list under the pushed id bounds, or None
    * when the layout can't prove the property. Empty-range files
    * (min > max — a zero-row task's sentinel) hold no rows and are
    * excluded from both the report and the plan. */
  private def keyedFiles(): Option[Array[(String, Long)]] = {
    if (aggPushed || limit.isDefined || topN.isDefined) None
    else {
      val index = TripEnvelopeIdIndex.read(path)
      val files = visibleFiles()
      val entries =
        files.map(st => index.get(st.getPath.getName).map((st, _)))
      if (files.isEmpty || entries.exists(_.isEmpty)) None
      else {
        val live = entries.flatten
          .filter { case (_, (mn, mx, _)) => mn <= mx }
        if (live.nonEmpty &&
            live.forall { case (_, (mn, mx, _)) => mn == mx })
          Some(live
            .filter { case (_, (mn, _, _)) => mn >= idLo && mn <= idHi }
            .map { case (st, (mn, _, _)) =>
              (st.getPath.toUri.toString, mn) })
        else None
      }
    }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedFiles() match {
      case Some(kf) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            Array(org.apache.spark.sql.connector.expressions.Expressions
              .identity("id")), kf.length)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  /** REPORTED ORDERING (capability #10, with #9 the full bucketed-AND-
    * sorted analog of q55): on a single-id layout every partition's
    * rows trivially share one id, so "ordered by id ASC" is honest by
    * construction — and with both sides of an id equi-join reporting
    * the same key-grouped partitioning and ordering, Spark plans a
    * storage-partitioned SORT-MERGE join with NO exchange and NO sort
    * (Round16Spec pins the plan). At 100 TB this is the
    * entity-aligned join of two landing zones as a pure zip of
    * co-located files. Same fallback contract as #9: any layout that
    * can't prove the property reports nothing. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    keyedFiles() match {
      case Some(_) =>
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .sort(org.apache.spark.sql.connector.expressions.Expressions
            .column("id"),
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING))
      case None => Array.empty
    }

  override def readSchema(): StructType =
    agg match {
      case Some(a) =>
        val g = if (a.groupByVt)
          Seq(StructField("vt", IntegerType)) else Nil
        StructType(g ++ a.fns.map {
          case PushedEnvAgg.Count => StructField("count(*)", LongType)
          case PushedEnvAgg.MinId => StructField("min(id)", LongType)
          case PushedEnvAgg.MaxId => StructField("max(id)", LongType)
        })
      case None => required
    }
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(!aggPushed && limit.isEmpty && topN.isEmpty,
      "aggregate/limit/topN pushdown are batch-only capabilities")
    new TripEnvelopeMicroBatchStream(path, required, maxFilesPerBatch,
      idLo, idHi)
  }
  override def description(): String = {
    val f =
      if (idLo == Long.MinValue && idHi == Long.MaxValue) ""
      else s" PushedFilters: [id in [$idLo, $idHi]]"
    val a = agg.map(" " + _.describe).getOrElse("")
    val l = limit.map(n => s" PushedLimit: $n").getOrElse("")
    val t = topN.map { case (asc, k) =>
      s" PushedTopN: [id ${if (asc) "ASC" else "DESC"}] LIMIT $k"
    }.getOrElse("")
    s"TripEnvelope $path ReadSchema: ${required.catalogString}$f$a$l$t"
  }

  // ---- runtime filtering (capability #6): at execution time — after
  // a DPP subquery materializes the join's build side — Spark hands
  // the scan the observed join-key values, and the scan re-plans its
  // partitions against the commit-time id index, DROPPING whole files
  // whose [min(id), max(id)] contains none of them. The envelope
  // analog of parquet DPP (q64): file-grain pruning from metadata
  // only, no data read. Conservative by contract: a file missing from
  // the index (legacy text-sink output, foreign producers) is never
  // pruned, and the join re-evaluates its own condition, so pruning
  // can only skip provably-unmatchable IO.
  private var runtimeIds: Option[Set[Long]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("id"))

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal,
      NamedReference}
    // accept IN / = on id; anything else is ignored (runtime filters
    // are advisory pruning hints, never a correctness obligation)
    val sets = predicates.flatMap { p =>
      val isIdRef = p.children().headOption.exists {
        case r: NamedReference => r.fieldNames.sameElements(Array("id"))
        case _ => false
      }
      if ((p.name() == "IN" || p.name() == "=") && isIdRef) {
        val vs = p.children().drop(1).map {
          case l: Literal[_] => l.value match {
            case v: java.lang.Long => Some(v.longValue())
            case v: java.lang.Integer => Some(v.longValue())
            case _ => None
          }
          case _ => None
        }
        if (vs.nonEmpty && vs.forall(_.isDefined))
          Some(vs.flatten.toSet)
        else None
      } else None
    }
    if (sets.nonEmpty)
      runtimeIds = Some(sets.reduce(_ intersect _))
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

  /** Planner statistics from metadata only: total visible bytes from
    * the listing, row count from the commit-time id index when it
    * covers every visible file. A real sizeInBytes lets Catalyst/AQE
    * make honest broadcast and coalesce decisions for envelope joins
    * instead of assuming the conservative default (= "never
    * broadcastable"); a real numRows feeds join reorder. */
  override def estimateStatistics(): Statistics = {
    // POST-pushdown stats (ADVICE r15): this Scan already carries its
    // pushed id bounds / limit / TopN, and Catalyst/AQE read these
    // numbers as the scan's OUTPUT cardinality for join planning —
    // reporting the full listing when a filter was pushed over-reports
    // and can veto a broadcast that would fit. Files whose indexed
    // [min, max] cannot intersect the pushed range contribute neither
    // bytes nor rows; a pushed limit / TopN k caps the row estimate
    // (both readers admit at most that many per file, and the global
    // cut is tighter still). Unindexed files stay fully counted —
    // pruning facts only ever come from the index.
    val index = TripEnvelopeIdIndex.read(path)
    val files = visibleFiles().filter { f =>
      index.get(f.getPath.getName) match {
        case Some((mn, mx, _)) => mx >= idLo && mn <= idHi && mn <= mx
        case None => true
      }
    }
    val bytes = files.map(_.getLen).sum
    val rows =
      if (files.nonEmpty && files.forall(f => index.contains(f.getPath.getName))) {
        val full = files.map(f => index(f.getPath.getName)._3).sum
        val capped = (limit.map(_.toLong) ++ topN.map(_._2.toLong))
          .foldLeft(full)(math.min)
        java.util.OptionalLong.of(capped)
      } else java.util.OptionalLong.empty()
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // keyed layout (capability #9): one HasPartitionKey partition per
    // single-id file, so the reported KeyGroupedPartitioning holds at
    // the exec. Runtime join-key filtering composes — dropping whole
    // files preserves the grouping (every survivor still holds exactly
    // its one id).
    keyedFiles() match {
      case Some(kf) =>
        return kf
          .filter { case (_, id) => runtimeIds.forall(_.contains(id)) }
          .map { case (f, id) =>
            TripEnvelopeKeyedInputPartition(f, id): InputPartition }
      case None => ()
    }
    // driver-side FILE LISTING only (metadata, never data): one
    // partition per line file, sorted for deterministic task numbering.
    // When the directory carries a commit-time id index (_idindex.json,
    // written by the v2 sink), files whose [min(id), max(id)] cannot
    // intersect the pushed id range — or, after [[filter]], cannot
    // contain any runtime join-key value — are dropped HERE, before a
    // single data byte is read. Unindexed files are always kept.
    val index = TripEnvelopeIdIndex.read(path)
    val kept = visibleFiles().filter { st =>
      index.get(st.getPath.getName) match {
        case Some((mn, mx, _)) =>
          val rangeOk = mx >= idLo && mn <= idHi && mn <= mx
          rangeOk && runtimeIds.forall(ids =>
            ids.exists(v => v >= mn && v <= mx))
        case None => true
      }
    }
    // pushed-LIMIT file prefix: with NO row filtering in play (every
    // admitted line counts toward the limit) and exact indexed row
    // counts for every kept file, the name-order prefix covering
    // `limit` rows is provably sufficient — a LIMIT 10 over a
    // million-file landing zone opens one file
    val unfiltered = idLo == Long.MinValue && idHi == Long.MaxValue &&
      runtimeIds.isEmpty
    val allIndexed =
      kept.forall(st => index.contains(st.getPath.getName))
    def prefixCovering(files: Array[org.apache.hadoop.fs.FileStatus],
                       rows: Long) = {
      var need = rows
      files.takeWhile { st =>
        val take = need > 0
        need -= index(st.getPath.getName)._3
        take
      }
    }
    val chosen = (limit, topN) match {
      // (Some(l), None), not (Some(l), _): Spark pushes either a limit
      // or a TopN, never both — but if both were ever set, the
      // createReaderFactory below picks the TopN reader, and a
      // name-order prefix is NOT guaranteed to contain the k best ids
      // (wrong rows). Tighten the match so the limit prefix can never
      // pair with the TopN reader (ADVICE r15, defensive).
      case (Some(l), None) if unfiltered && allIndexed =>
        prefixCovering(kept, l.toLong)
      // pushed TopN over an id-DISJOINT layout (checkable from the
      // index): the k best ids live in the range-order file prefix —
      // sort kept files by their id range (min asc for ASC, max desc
      // for DESC) and plan only the prefix covering k rows. Ranges
      // that overlap disable the shortcut (a best id could hide in
      // any of them); readers still cap their per-file k-best.
      case (_, Some((asc, k))) if unfiltered && allIndexed && {
          val rs = kept.map(st => index(st.getPath.getName))
            .sortBy(_._1)
          rs.zip(rs.drop(1)).forall { case (a, b) => a._2 < b._1 }
        } =>
        val ordered =
          if (asc) kept.sortBy(st => index(st.getPath.getName)._1)
          else kept.sortBy(st => -index(st.getPath.getName)._2)
        prefixCovering(ordered, k.toLong)
      case _ => kept
    }
    val parts = chosen.map(st =>
      TripEnvelopeInputPartition(st.getPath.toUri.toString)
        : InputPartition)
    // pushed-aggregate contract over an EMPTY file set (ADVICE r14):
    // zero partitions means zero partial rows, and Spark finalizes a
    // partially-pushed COUNT as SUM of partials — NULL, not 0. One
    // synthetic partition (empty-string sentinel; its reader emits a
    // single all-zeros partial) keeps the ungrouped aggregate exact.
    // Grouped pushdown is naturally correct with zero partials (no
    // groups exist), so the sentinel is ungrouped-only.
    if (parts.isEmpty && aggPushed && !groupByVt)
      Array(TripEnvelopeInputPartition(""))
    else parts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    (agg, topN) match {
      case (Some(a), _) =>
        new TripEnvelopeAggReaderFactory(conf, idLo, idHi, a)
      case (None, Some((asc, k))) =>
        new TripEnvelopeTopNReaderFactory(required.fieldNames, conf,
          idLo, idHi, asc, k)
      case _ =>
        new TripEnvelopeReaderFactory(required.fieldNames, conf,
          idLo, idHi, limit.getOrElse(Int.MaxValue))
    }
  }
}

/** The commit-time per-file id index: `_idindex.json` in the envelope
  * directory maps each sink-written file name to its exact
  * [min(id), max(id), rows] — the file-skipping metadata parquet gets
  * from footers, at one JSON object per FILE (not per row group; the
  * envelope is a line format with no internal structure to index).
  * Written atomically (hidden temp + rename) on driver commit, merged
  * with any existing index so appends extend rather than clobber.
  * Readers treat it as advisory: a missing index, or a file the index
  * doesn't cover, disables pruning for exactly that file. */
object TripEnvelopeIdIndex {
  val FileName = "_idindex.json"

  def read(dir: String): Map[String, (Long, Long, Long)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new HPath(dir, FileName)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    try {
      import com.fasterxml.jackson.core.JsonToken
      val parser = new com.fasterxml.jackson.core.JsonFactory()
        .createParser(new java.io.InputStreamReader(in,
          java.nio.charset.StandardCharsets.UTF_8))
      require(parser.nextToken() == JsonToken.START_OBJECT,
        s"malformed $FileName")
      val b = Map.newBuilder[String, (Long, Long, Long)]
      var tok = parser.nextToken()
      while (tok == JsonToken.FIELD_NAME) {
        val name = parser.currentName()
        require(parser.nextToken() == JsonToken.START_ARRAY,
          s"malformed $FileName entry for $name")
        parser.nextToken(); val mn = parser.getLongValue
        parser.nextToken(); val mx = parser.getLongValue
        parser.nextToken(); val n = parser.getLongValue
        require(parser.nextToken() == JsonToken.END_ARRAY,
          s"malformed $FileName entry for $name")
        b += name -> ((mn, mx, n))
        tok = parser.nextToken()
      }
      b.result()
    } finally in.close()
  }

  /** Merge `entries` into the directory's index and publish it with a
    * rename (single-writer per job commit; concurrent jobs last-write-
    * win, and a lost entry only disables pruning for that file). */
  def write(dir: String,
            entries: Map[String, (Long, Long, Long)]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val root = new HPath(dir)
    val fs = root.getFileSystem(conf)
    val merged = (read(dir) ++ entries).toSeq.sortBy(_._1)
    val tmp = new HPath(dir, s".$FileName.inprogress")
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write(merged.map { case (f, (mn, mx, n)) =>
        val g = new java.io.StringWriter(32)
        val j = new com.fasterxml.jackson.core.JsonFactory()
          .createGenerator(g)
        j.writeString(f); j.close()
        s"${g.toString}:[$mn,$mx,$n]"
      }.mkString("{", ",", "}"))
    } finally out.close()
    fs.delete(new HPath(dir, FileName), false)
    require(fs.rename(tmp, new HPath(dir, FileName)),
      s"trip-envelope: publishing $FileName failed")
  }
}

/** Pushed-aggregate reader: one partial row per line file (or one
  * row per vt group in that file, when GROUP BY vt is pushed). With
  * no pushed id bounds and no grouping, COUNT is a pure line count —
  * no JSON parse at all; otherwise only the ~20-byte id/vt head of
  * each line is token-walked. The payload is never parsed. */
class TripEnvelopeAggReaderFactory(conf: SerializableConfiguration,
                                   idLo: Long, idHi: Long,
                                   agg: PushedEnvAgg)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = TripEnvelopePartitionFile.of(partition)
    new PartitionReader[InternalRow] {
      // (count, min, max) per vt group — or under key 0 when ungrouped
      private val acc =
        new java.util.TreeMap[Int, Array[Long]]()
      private var rows: Iterator[InternalRow] = _
      private var row: InternalRow = _

      private def accumulate(): Unit = {
        // empty-string sentinel (empty directory, ungrouped): no file
        // to read — the single all-zeros partial is emitted below
        if (file.nonEmpty) {
          val needVt = agg.groupByVt
          val trackId = agg.fns.exists(_ != PushedEnvAgg.Count)
          val inner = new TripEnvelopeReader(file,
            if (needVt) 1 else 0, -1,
            if (needVt) 0 else -1, -1, conf, idLo, idHi,
            needId = trackId)
          try while (inner.next()) {
            // the head-only walk: vt sits right after id on the wire,
            // so even the grouped read never reaches the payload token
            val vt = if (needVt) inner.get().getInt(0) else 0
            val a = acc.computeIfAbsent(vt,
              _ => Array(0L, Long.MaxValue, Long.MinValue))
            a(0) += 1
            if (trackId) {
              val id = inner.lastId
              if (id < a(1)) a(1) = id
              if (id > a(2)) a(2) = id
            }
          } finally inner.close()
        }
        if (acc.isEmpty && !agg.groupByVt)
          acc.put(0, Array(0L, Long.MaxValue, Long.MinValue))
        import scala.jdk.CollectionConverters._
        rows = acc.entrySet().iterator().asScala.map { e =>
          val a = e.getValue
          val aggVals: Seq[Any] = agg.fns.map {
            case PushedEnvAgg.Count => a(0)
            case PushedEnvAgg.MinId => if (a(0) == 0L) null else a(1)
            case PushedEnvAgg.MaxId => if (a(0) == 0L) null else a(2)
          }
          InternalRow.fromSeq(
            (if (agg.groupByVt) Seq(e.getKey) else Nil) ++ aggVals)
        }
      }

      override def next(): Boolean = {
        if (rows == null) accumulate()
        if (rows.hasNext) { row = rows.next(); true } else false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

case class TripEnvelopeInputPartition(file: String) extends InputPartition

/** Single-id file partition (capability #9): the one id all the file's
  * rows provably share (index min == max) IS the partition key that
  * Spark's key-grouped planning consumes — honest [[HasPartitionKey]]
  * by construction, never an approximation of a range. */
case class TripEnvelopeKeyedInputPartition(file: String, id: Long)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(id)
}

private[v2] object TripEnvelopePartitionFile {
  def of(p: InputPartition): String = p match {
    case TripEnvelopeInputPartition(f) => f
    case TripEnvelopeKeyedInputPartition(f, _) => f
  }
}

class TripEnvelopeReaderFactory(fields: Array[String],
                                conf: SerializableConfiguration,
                                idLo: Long = Long.MinValue,
                                idHi: Long = Long.MaxValue,
                                rowCap: Int = Int.MaxValue)
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
      TripEnvelopePartitionFile.of(partition),
      fields.length, idSlot, vtSlot, jsonSlot, conf, idLo, idHi,
      rowCap = rowCap)
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
                         idHi: Long = Long.MaxValue,
                         needId: Boolean = false,
                         rowCap: Int = Int.MaxValue)
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
  // `needId` (aggregate pushdown's MIN/MAX leg): run the head walk on
  // every line even without pushed bounds, so [[lastId]] is populated
  private val filtered =
    idLo != Long.MinValue || idHi != Long.MaxValue || needId
  private var line: String = _

  /** The id of the line [[next]] last admitted — only meaningful when
    * the head walk runs (pushed bounds or `needId`). */
  var lastId: Long = 0L

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
          lastId = v
          return v >= idLo && v <= idHi
        }
        p.skipChildren()
        tok = p.nextToken()
      }
      throw new IllegalArgumentException(
        s"envelope line without id: $l")
    } finally p.close()
  }

  private var admitted = 0

  override def next(): Boolean = {
    // pushed-LIMIT cap (partial pushdown — Spark still applies the
    // global limit): this reader never admits more than rowCap lines
    if (admitted >= rowCap) { line = null; return false }
    line = in.readLine()
    while (line != null &&
      (line.isEmpty || (filtered && !idMatches(line))))
      line = in.readLine()
    if (line != null) admitted += 1
    line != null
  }

  /** The admitted line's raw text (TopN readers buffer it). */
  private[v2] def currentLine: String = line

  override def get(): InternalRow =
    TripEnvelopeLineParser.parse(factory, line, width, idSlot, vtSlot,
      jsonSlot)

  override def close(): Unit = in.close()
}

private[v2] object TripEnvelopeLineParser {
  /** One envelope line → pruned InternalRow. Early exit once every
    * requested slot is filled: a head-only projection (SELECT id /
    * SELECT vt — including the aggregate reader's grouped walk) stops
    * tokenizing BEFORE the payload field, so the multi-KB hex string
    * is never even scanned. */
  def parse(factory: com.fasterxml.jackson.core.JsonFactory,
            line: String, width: Int, idSlot: Int, vtSlot: Int,
            jsonSlot: Int): InternalRow = {
    import com.fasterxml.jackson.core.JsonToken
    val row = new Array[Any](width)
    val p = factory.createParser(line)
    var remaining = width
    try {
      require(p.nextToken() == JsonToken.START_OBJECT,
        s"malformed envelope line: $line")
      var tok = p.nextToken()
      while (tok == JsonToken.FIELD_NAME && remaining > 0) {
        val name = p.currentName()
        p.nextToken()
        name match {
          case "id" =>
            if (idSlot >= 0) { row(idSlot) = p.getLongValue
              remaining -= 1 }
          case "vt" =>
            if (vtSlot >= 0) { row(vtSlot) = p.getIntValue
              remaining -= 1 }
          case "json" =>
            if (jsonSlot >= 0) {
              row(jsonSlot) = UTF8String.fromString(p.getText)
              remaining -= 1
            } else p.skipChildren() // pruned: skip, never materialize
          case other =>
            throw new IllegalArgumentException(
              s"unknown envelope field $other")
        }
        tok = p.nextToken()
      }
    } finally p.close()
    InternalRow.fromSeq(row.toSeq)
  }
}

/** Pushed-TopN reader: one k-best buffer per line file — the head walk
  * tracks each admitted line's id, a bounded heap keeps the k best by
  * id (smallest for ASC, largest for DESC), and only the k SURVIVORS
  * are ever fully parsed. Partial pushdown: Spark re-sorts and
  * re-limits the per-file survivors, so emit order is free. Memory is
  * k lines per open reader, however big the file. */
class TripEnvelopeTopNReaderFactory(fields: Array[String],
                                    conf: SerializableConfiguration,
                                    idLo: Long, idHi: Long,
                                    asc: Boolean, k: Int)
    extends PartitionReaderFactory {
  private val idSlot = fields.indexOf("id")
  private val vtSlot = fields.indexOf("vt")
  private val jsonSlot = fields.indexOf("json")
  require(fields.forall(Set("id", "vt", "json")),
    s"unknown envelope field(s): ${fields.mkString(",")}")

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = TripEnvelopePartitionFile.of(partition)
    new PartitionReader[InternalRow] {
      private val factory = new com.fasterxml.jackson.core.JsonFactory()
      private var kept: Iterator[String] = _
      private var row: InternalRow = _

      private def select(): Unit = {
        // heap root = the WORST of the current k-best: largest id for
        // ASC (evict it when a smaller arrives), smallest for DESC
        val heap = new java.util.PriorityQueue[(Long, String)](
          math.max(k, 1),
          (a: (Long, String), b: (Long, String)) =>
            if (asc) java.lang.Long.compare(b._1, a._1)
            else java.lang.Long.compare(a._1, b._1))
        val inner = new TripEnvelopeReader(file, 0, -1, -1, -1, conf,
          idLo, idHi, needId = true)
        try while (inner.next()) {
          if (heap.size < k) heap.add((inner.lastId, inner.currentLine))
          else {
            val worst = heap.peek()._1
            val better =
              if (asc) inner.lastId < worst else inner.lastId > worst
            if (better) { heap.poll(); heap.add((inner.lastId,
              inner.currentLine)) }
          }
        } finally inner.close()
        import scala.jdk.CollectionConverters._
        kept = heap.iterator().asScala.map(_._2).toVector.iterator
      }

      override def next(): Boolean = {
        if (kept == null) select()
        if (kept.hasNext) {
          row = TripEnvelopeLineParser.parse(factory, kept.next(),
            fields.length, idSlot, vtSlot, jsonSlot)
          true
        } else false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
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
  // commit publishes the id index (file → [min, max, rows]) that the
  // read side's static and runtime pruning consume. Data visibility
  // never depends on it — a crash between renames and here just means
  // an unindexed (never-pruned) directory.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.collect {
      case TripEnvelopeCommit(f, mn, mx, n) =>
        new HPath(f).getName -> ((mn, mx, n))
    }.toMap
    if (entries.nonEmpty) TripEnvelopeIdIndex.write(path, entries)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class TripEnvelopeWriterFactory(path: String,
                                conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new TripEnvelopeDataWriter(path, partitionId, taskId, conf)
}

private case class TripEnvelopeCommit(file: String, idMin: Long,
                                      idMax: Long, rows: Long)
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
  // exact per-file id bounds, carried to the driver commit for the
  // directory's _idindex.json (the read side's file-skipping metadata)
  private var idMin = Long.MaxValue
  private var idMax = Long.MinValue
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val id = record.getLong(0)
    if (id < idMin) idMin = id
    if (id > idMax) idMax = id
    rows += 1
    val sw = new java.io.StringWriter(64)
    val g = factory.createGenerator(sw)
    g.writeStartObject()
    g.writeNumberField("id", id)
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
    // an empty task's [MaxValue, MinValue] is an empty range — the
    // index prunes its (zero-line) file from every read, correctly
    TripEnvelopeCommit(visible.toString, idMin, idMax, rows)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(temp, false)
  }

  override def close(): Unit = ()
}
