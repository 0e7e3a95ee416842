package graft.meos

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Trajectory assembly — the engine's flagship aggregate (SURVEY.md A6).
  *
  * The reference builds a trip per entity by folding posits into a
  * `TSeq::make(instants, lower_inc=true, upper_inc=true, LINEAR,
  * normalize=false)` (`meos/src/tseq.rs:49-64`; call sites
  * `meos/examples/04_to_file.rs:113`, `meos-polars/examples/ais_to_db.rs:199`),
  * after (a) dropping out-of-order posits (`04_to_file.rs:91-96`) and
  * (b) skipping consecutive duplicate timestamps (`ais_to_db.rs:181-184`),
  * optionally truncating at `max_trip_size` (`ais_to_db.rs:190-193`).
  *
  * Spark-first re-expression: a typed `Aggregator` whose buffer is a bag of
  * posits, merged associatively across partial (map-side) aggregation, with
  * sort + duplicate-timestamp dedupe + truncation applied once at `finish`.
  * Distribution semantics:
  *  - reduce/merge are order-insensitive (shuffle order never changes the
  *    result); determinism comes from sorting by (t, tie) where `tie` is a
  *    caller-supplied unique tiebreaker (e.g. event_id).
  *  - duplicate timestamps keep the smallest tiebreaker — the deterministic
  *    analog of the reference's "keep first seen" rule.
  *  - when `maxSize > 0` the buffer is trimmed to the `maxSize` earliest
  *    posits whenever it doubles past the cap, so per-key state stays O(max)
  *    even for mega-entities (the 100 TB skew posture; SURVEY.md §7.3).
  *
  * Output arrays are primitive (epoch-micros Long + Double) for compact
  * shuffles; `Assembly.tfloatSeq`/`tpointSeq` lift them to the public
  * sequence struct of [[Temporal]].
  */
object Assembly {

  // ---- tfloat (1-D value) -------------------------------------------------

  case class FPosit(t: Long, tie: Long, v: Double)
  case class FBuf(var ps: Vector[FPosit])
  case class FSeq(t: Array[Long], v: Array[Double], n: Long)

  class TFloatAssembler(maxSize: Int)
      extends Aggregator[FPosit, FBuf, FSeq] {
    def zero: FBuf = FBuf(Vector.empty)
    def reduce(b: FBuf, p: FPosit): FBuf = { b.ps :+= p; trim(b); b }
    def merge(a: FBuf, b: FBuf): FBuf = { a.ps ++= b.ps; trim(a); a }
    // mid-stream trim must apply the SAME dedupe as finish before taking
    // the cap: keeping maxSize raw rows could let duplicate timestamps
    // crowd out distinct ones that belong in the final earliest-maxSize
    private def trim(b: FBuf): Unit =
      if (maxSize > 0 && b.ps.length > 2 * maxSize) {
        val sorted = b.ps.sortBy(p => (p.t, p.tie))
        val out = Vector.newBuilder[FPosit]
        var lastT = Long.MinValue
        var kept = 0
        val it = sorted.iterator
        while (it.hasNext && kept < maxSize) {
          val p = it.next()
          if (p.t != lastT) { out += p; lastT = p.t; kept += 1 }
        }
        b.ps = out.result()
      }
    def finish(b: FBuf): FSeq = {
      val sorted = b.ps.sortBy(p => (p.t, p.tie))
      val out = Vector.newBuilder[FPosit]
      var lastT = Long.MinValue
      var kept = 0
      val it = sorted.iterator
      while (it.hasNext && (maxSize <= 0 || kept < maxSize)) {
        val p = it.next()
        if (p.t != lastT) { out += p; lastT = p.t; kept += 1 }
      }
      val r = out.result()
      FSeq(r.map(_.t).toArray, r.map(_.v).toArray, r.length.toLong)
    }
    def bufferEncoder: Encoder[FBuf] = Encoders.product[FBuf]
    def outputEncoder: Encoder[FSeq] = Encoders.product[FSeq]
  }

  /** Column form: tfloatAssemble(maxSize)(unix_micros(ts), tie, value). */
  def tfloatAssemble(maxSize: Int = 0) =
    udaf(new TFloatAssembler(maxSize))

  // ---- tgeompoint (2-D point) --------------------------------------------

  case class PPosit(t: Long, tie: Long, x: Double, y: Double)
  case class PBuf(var ps: Vector[PPosit])
  case class PSeq(t: Array[Long], x: Array[Double], y: Array[Double], n: Long)

  class TPointAssembler(maxSize: Int)
      extends Aggregator[PPosit, PBuf, PSeq] {
    def zero: PBuf = PBuf(Vector.empty)
    def reduce(b: PBuf, p: PPosit): PBuf = { b.ps :+= p; trim(b); b }
    def merge(a: PBuf, b: PBuf): PBuf = { a.ps ++= b.ps; trim(a); a }
    // see TFloatAssembler.trim: dedupe-then-cap, matching finish
    private def trim(b: PBuf): Unit =
      if (maxSize > 0 && b.ps.length > 2 * maxSize) {
        val sorted = b.ps.sortBy(p => (p.t, p.tie))
        val out = Vector.newBuilder[PPosit]
        var lastT = Long.MinValue
        var kept = 0
        val it = sorted.iterator
        while (it.hasNext && kept < maxSize) {
          val p = it.next()
          if (p.t != lastT) { out += p; lastT = p.t; kept += 1 }
        }
        b.ps = out.result()
      }
    def finish(b: PBuf): PSeq = {
      val sorted = b.ps.sortBy(p => (p.t, p.tie))
      val out = Vector.newBuilder[PPosit]
      var lastT = Long.MinValue
      var kept = 0
      val it = sorted.iterator
      while (it.hasNext && (maxSize <= 0 || kept < maxSize)) {
        val p = it.next()
        if (p.t != lastT) { out += p; lastT = p.t; kept += 1 }
      }
      val r = out.result()
      PSeq(r.map(_.t).toArray, r.map(_.x).toArray, r.map(_.y).toArray,
        r.length.toLong)
    }
    def bufferEncoder: Encoder[PBuf] = Encoders.product[PBuf]
    def outputEncoder: Encoder[PSeq] = Encoders.product[PSeq]
  }

  def tpointAssemble(maxSize: Int = 0) =
    udaf(new TPointAssembler(maxSize))

  // ---- skew path: salted two-phase assembly -------------------------------

  /** Two-phase assembly for skewed entities (SURVEY.md §7.3: mega-vessels).
    * Phase 1 groups by (key, salt) — spreading one hot key over `salts`
    * reducers — and assembles partial trips; phase 2 merges the partial
    * (t, v) arrays per key with the same merge-append semantics as the
    * upsert sink. Identical output to single-phase assembly (spec-checked);
    * use when a single entity's posits exceed one executor's comfort.
    *
    * Mirrors the reference's own batching escape hatch (`batch_size`
    * chunking, `ais_to_db.rs:176`) — the chunk id is the salt.
    *
    * Caveat: with duplicate timestamps per key, phase 2 cannot see the
    * tiebreaker and keeps an arbitrary (but fixed per merge order) dup —
    * single-phase assembly keeps the smallest tiebreaker. Identical when
    * (key, t) is unique, the common case for sensor feeds.
    */
  def tfloatAssembleSalted(df: org.apache.spark.sql.DataFrame,
                           key: Column, t: Column, tie: Column, v: Column,
                           salts: Int = 16): org.apache.spark.sql.DataFrame = {
    val asm = tfloatAssemble()
    df.groupBy(key.as("k"), pmod(tie, lit(salts)).as("salt"))
      .agg(asm(t, tie, v).as("part"))
      .groupBy(col("k"))
      .agg(SeqMerge.merge(col("part.t"), col("part.v"), col("part.n"))
        .as("s"))
  }

  // ---- merging assembled sequences (phase-2 / rollup aggregate) -----------

  object SeqMerge {
    case class MBuf(var t: Vector[Long], var v: Vector[Double])

    /** Merges already-assembled FSeq structs: k-way merge by timestamp,
      * duplicate timestamps keep the first-merged occurrence — associative
      * and commutative apart from dup-ts ties, which the salted path makes
      * deterministic by salting on the tiebreaker. */
    class SeqMergeAggregator extends Aggregator[FSeq, MBuf, FSeq] {
      def zero: MBuf = MBuf(Vector.empty, Vector.empty)
      private def mergeInto(b: MBuf, t: Array[Long], v: Array[Double])
          : MBuf = {
        val nt = Vector.newBuilder[Long]
        val nv = Vector.newBuilder[Double]
        var i = 0; var j = 0
        var last = Long.MinValue
        while (i < b.t.length || j < t.length) {
          val takeLeft = j >= t.length || (i < b.t.length && b.t(i) <= t(j))
          val (ct, cv) = if (takeLeft) { val r = (b.t(i), b.v(i)); i += 1; r }
            else { val r = (t(j), v(j)); j += 1; r }
          if (ct != last) { nt += ct; nv += cv; last = ct }
        }
        b.t = nt.result(); b.v = nv.result(); b
      }
      def reduce(b: MBuf, s: FSeq): MBuf = mergeInto(b, s.t, s.v)
      def merge(a: MBuf, b: MBuf): MBuf =
        mergeInto(a, b.t.toArray, b.v.toArray)
      def finish(b: MBuf): FSeq =
        FSeq(b.t.toArray, b.v.toArray, b.t.length.toLong)
      def bufferEncoder: Encoder[MBuf] = Encoders.product[MBuf]
      def outputEncoder: Encoder[FSeq] = Encoders.product[FSeq]
    }

    val merge = udaf(new SeqMergeAggregator)
  }

  // ---- lifting raw assembled arrays to Temporal structs -------------------

  /** Lift an `FSeq` column (from tfloatAssemble) to a tfloat sequence struct
    * with the reference's construction defaults (incl/incl, LINEAR). */
  def tfloatSeq(fseq: Column, srid: Int = 0): Column =
    Temporal.tseqOf(
      zip_with(fseq.getField("t"), fseq.getField("v"),
        (t, v) => struct(timestamp_micros(t).as("t"), v.as("v"))),
      Temporal.InterpLinear, lowerInc = true, upperInc = true, srid = srid)

  /** Lift a `PSeq` column (from tpointAssemble) into the codec-compatible
    * temporal-value shape ([[TGeom.Val]]): a linear, closed-bounds
    * sequence — exactly `TSeq::make`'s construction defaults
    * (`meos/src/tseq.rs:57-60`). The result feeds every
    * [[MeosFunctions]] codec (WKT/MF-JSON/WKB). */
  def tpointVal(pseq: Column, srid: Int = Temporal.DefaultSrid): Column = {
    val instants = zip_with(
      zip_with(pseq.getField("t"), pseq.getField("x"),
        (t, x) => struct(t.as("t"), x.as("x"))),
      pseq.getField("y"),
      (tx, y) => struct(
        timestamp_micros(tx.getField("t")).as("t"),
        tx.getField("x").as("x"), y.as("y")))
    struct(
      lit(TGeom.SubSequence).as("subtype"),
      lit(srid).as("srid"),
      lit(Temporal.InterpLinear).as("interp"),
      array(struct(
        instants.as("instants"),
        lit(Temporal.InterpLinear).as("interp"),
        lit(true).as("lower_inc"),
        lit(true).as("upper_inc"))).as("sequences"))
  }

  /** Lift a `PSeq` column (from tpointAssemble) to a tgeompoint sequence
    * struct. */
  def tpointSeq(pseq: Column, srid: Int = Temporal.DefaultSrid): Column =
    Temporal.tseqOf(
      zip_with(
        zip_with(pseq.getField("t"), pseq.getField("x"),
          (t, x) => struct(t.as("t"), x.as("x"))),
        pseq.getField("y"),
        (tx, y) => struct(
          timestamp_micros(tx.getField("t")).as("t"),
          tx.getField("x").as("x"), y.as("y"))),
      Temporal.InterpLinear, lowerInc = true, upperInc = true, srid = srid)
}
