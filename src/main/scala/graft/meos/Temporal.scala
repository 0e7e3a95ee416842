package graft.meos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal-value data model, re-expressed as plain Spark `StructType`s.
  *
  * The reference models a value-that-varies-over-time as one of three
  * subtypes — instant, sequence, sequence set (`meos/src/lib.rs:30-34`,
  * wrapping MEOS `TInstant`/`TSequence`/`TSequenceSet`). A sequence carries
  * bounds inclusivity, an interpolation mode, and an SRID
  * (`meos/src/tseq.rs:49-64`: `lower_inc=true`, `upper_inc=true`,
  * `interpType_LINEAR`, `normalize=false`).
  *
  * We deliberately encode these as open `StructType`s rather than a Spark
  * `UserDefinedType`: structs stay transparent to Catalyst (column pruning,
  * predicate pushdown, codegen all reach the subfields), write cleanly to
  * parquet, and remain comparable by the DuckDB oracle. See SURVEY.md §1.4.
  *
  * Two base types are provided:
  *  - `tfloat`  — temporal double  (instant = (t, v))
  *  - `tgeompoint` — temporal 2-D point (instant = (t, x, y)), SRID-stamped,
  *    matching the only base type the reference instantiates
  *    (`meos/src/tinst.rs:24` parses via `tgeompoint_in`).
  */
object Temporal {

  /** Interpolation modes (MEOS `interpType`): the reference constructs
    * sequences with LINEAR (`meos/src/tseq.rs:59`); discrete and step
    * sequences appear through WKT literals (`meos/examples/01_hello_world.rs`).
    */
  val InterpNone: Int = 0
  val InterpDiscrete: Int = 1
  val InterpStep: Int = 2
  val InterpLinear: Int = 3

  val DefaultSrid: Int = 4326 // ingest always stamps SRID=4326 (04_to_file.rs:146-148)

  // ---- schemas ------------------------------------------------------------

  val tfloatInstType: StructType = StructType(Seq(
    StructField("t", TimestampType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  val tpointInstType: StructType = StructType(Seq(
    StructField("t", TimestampType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  def seqType(instType: StructType): StructType = StructType(Seq(
    StructField("instants", ArrayType(instType, containsNull = false)),
    StructField("interp", IntegerType, nullable = false),
    StructField("lower_inc", BooleanType, nullable = false),
    StructField("upper_inc", BooleanType, nullable = false),
    StructField("srid", IntegerType, nullable = false)))

  val tfloatSeqType: StructType = seqType(tfloatInstType)
  val tpointSeqType: StructType = seqType(tpointInstType)

  def seqSetType(instType: StructType): StructType = StructType(Seq(
    StructField("sequences", ArrayType(seqType(instType), containsNull = false)),
    StructField("interp", IntegerType, nullable = false),
    StructField("srid", IntegerType, nullable = false)))

  // ---- constructors (Column functions) ------------------------------------

  def tfloatInst(t: Column, v: Column): Column =
    struct(t.as("t"), v.cast(DoubleType).as("v"))

  def tpointInst(t: Column, x: Column, y: Column): Column =
    struct(t.as("t"), x.cast(DoubleType).as("x"), y.cast(DoubleType).as("y"))

  /** Wrap a sorted array of instants into a sequence struct. */
  def tseqOf(instants: Column, interp: Int = InterpLinear,
             lowerInc: Boolean = true, upperInc: Boolean = true,
             srid: Int = 0): Column =
    struct(
      instants.as("instants"),
      lit(interp).as("interp"),
      lit(lowerInc).as("lower_inc"),
      lit(upperInc).as("upper_inc"),
      lit(srid).as("srid"))

  // ---- accessors ----------------------------------------------------------

  /** First instant's timestamp (MEOS `temporal_start_timestamptz`,
    * `meos/src/temp.rs:50-52`). */
  def startTimestamp(seq: Column): Column =
    element_at(seq.getField("instants"), 1).getField("t")

  def endTimestamp(seq: Column): Column =
    element_at(seq.getField("instants"), -1).getField("t")

  def numInstants(seq: Column): Column = size(seq.getField("instants"))

  /** The reference's total order on temporal values compares start
    * timestamps ONLY (`meos/src/tinst.rs:59-68`, `tseq.rs:89-98`). Expose it
    * explicitly so sorts are faithful to that quirk. */
  def startTsOrder(seq: Column): Column = startTimestamp(seq)
}
