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

  /** Phase-1 output of the salted path: a partial trip that RETAINS the
    * tiebreaker array, so phase 2 can resolve duplicate timestamps across
    * salt groups exactly like single-phase assembly (smallest tie wins). */
  case class FTSeq(t: Array[Long], tie: Array[Long], v: Array[Double],
                   n: Long)
  case class PTSeq(t: Array[Long], tie: Array[Long], x: Array[Double],
                   y: Array[Double], n: Long)

  class TFloatPartialAssembler(maxSize: Int)
      extends Aggregator[FPosit, FBuf, FTSeq] {
    private val inner = new TFloatAssembler(maxSize)
    def zero: FBuf = inner.zero
    def reduce(b: FBuf, p: FPosit): FBuf = inner.reduce(b, p)
    def merge(a: FBuf, b: FBuf): FBuf = inner.merge(a, b)
    def finish(b: FBuf): FTSeq = {
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
      FTSeq(r.map(_.t).toArray, r.map(_.tie).toArray, r.map(_.v).toArray,
        r.length.toLong)
    }
    def bufferEncoder: Encoder[FBuf] = Encoders.product[FBuf]
    def outputEncoder: Encoder[FTSeq] = Encoders.product[FTSeq]
  }

  class TPointPartialAssembler(maxSize: Int)
      extends Aggregator[PPosit, PBuf, PTSeq] {
    private val inner = new TPointAssembler(maxSize)
    def zero: PBuf = inner.zero
    def reduce(b: PBuf, p: PPosit): PBuf = inner.reduce(b, p)
    def merge(a: PBuf, b: PBuf): PBuf = inner.merge(a, b)
    def finish(b: PBuf): PTSeq = {
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
      PTSeq(r.map(_.t).toArray, r.map(_.tie).toArray, r.map(_.x).toArray,
        r.map(_.y).toArray, r.length.toLong)
    }
    def bufferEncoder: Encoder[PBuf] = Encoders.product[PBuf]
    def outputEncoder: Encoder[PTSeq] = Encoders.product[PTSeq]
  }

  /** Two-phase assembly for skewed entities (SURVEY.md §7.3: mega-vessels).
    * Phase 1 groups by (key, salt) — spreading one hot key over `salts`
    * reducers — and assembles partial trips; phase 2 linearly merges the
    * pre-sorted partials per key (no re-sort — the per-posit sort work
    * happened distributed in phase 1). Identical output to single-phase
    * assembly on EVERY input (spec-checked, duplicate timestamps included:
    * the partials carry the tiebreaker, and cross-salt dup-ts collisions
    * keep the smallest tie exactly like the single-phase dedupe).
    *
    * Mirrors the reference's own batching escape hatch (`batch_size`
    * chunking, `ais_to_db.rs:176`) — the chunk id is the salt.
    *
    * `maxSize` caps state in BOTH phases: each salt group keeps its
    * earliest `maxSize` distinct-ts posits (a superset of the global
    * earliest `maxSize`), and the phase-2 merge re-caps — so per-task peak
    * memory is O(maxSize), never O(hot-key history).
    */
  def tfloatAssembleSalted(df: org.apache.spark.sql.DataFrame,
                           key: Column, t: Column, tie: Column, v: Column,
                           salts: Int = 16, maxSize: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    val part = udaf(new TFloatPartialAssembler(maxSize))
    val merge = udaf(new SeqMerge.TieMergeAggregator(maxSize))
    df.groupBy(key.as("k"), pmod(tie, lit(salts)).as("salt"))
      .agg(part(t, tie, v).as("p"))
      .groupBy(col("k"))
      .agg(merge(col("p.t"), col("p.tie"), col("p.v"), col("p.n")).as("s"))
  }

  /** 2-D (tgeompoint) variant of [[tfloatAssembleSalted]]. */
  def tpointAssembleSalted(df: org.apache.spark.sql.DataFrame,
                           key: Column, t: Column, tie: Column,
                           x: Column, y: Column,
                           salts: Int = 16, maxSize: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    val part = udaf(new TPointPartialAssembler(maxSize))
    val merge = udaf(new SeqMerge.PointTieMergeAggregator(maxSize))
    df.groupBy(key.as("k"), pmod(tie, lit(salts)).as("salt"))
      .agg(part(t, tie, x, y).as("p"))
      .groupBy(col("k"))
      .agg(merge(col("p.t"), col("p.tie"), col("p.x"), col("p.y"),
        col("p.n")).as("s"))
  }

  // ---- merging assembled sequences (phase-2 / rollup aggregate) -----------

  object SeqMerge {
    case class MBufT(var t: Vector[Long], var tie: Vector[Long],
                     var v: Vector[Double])
    case class MBufP(var t: Vector[Long], var tie: Vector[Long],
                     var x: Vector[Double], var y: Vector[Double])

    /** Tie-aware k-way merge of pre-sorted partial trips: runs are merged
      * by timestamp; a timestamp present in several runs keeps the posit
      * with the smallest tiebreaker — exactly the single-phase dedupe rule,
      * making the two-phase path equal to single-phase on every input.
      * Associative and commutative, so map-side combine is safe. */
    class TieMergeAggregator(maxSize: Int)
        extends Aggregator[FTSeq, MBufT, FSeq] {
      def zero: MBufT = MBufT(Vector.empty, Vector.empty, Vector.empty)
      private def mergeInto(b: MBufT, t2: Array[Long], tie2: Array[Long],
                            v2: Array[Double]): MBufT = {
        val nt = Vector.newBuilder[Long]
        val ntie = Vector.newBuilder[Long]
        val nv = Vector.newBuilder[Double]
        var i = 0; var j = 0
        while (i < b.t.length || j < t2.length) {
          if (j >= t2.length || (i < b.t.length && b.t(i) < t2(j))) {
            nt += b.t(i); ntie += b.tie(i); nv += b.v(i); i += 1
          } else if (i >= b.t.length || t2(j) < b.t(i)) {
            nt += t2(j); ntie += tie2(j); nv += v2(j); j += 1
          } else { // duplicate timestamp across runs: smallest tie wins
            if (b.tie(i) <= tie2(j)) {
              nt += b.t(i); ntie += b.tie(i); nv += b.v(i)
            } else { nt += t2(j); ntie += tie2(j); nv += v2(j) }
            i += 1; j += 1
          }
        }
        b.t = nt.result(); b.tie = ntie.result(); b.v = nv.result()
        capped(b)
      }
      private def capped(b: MBufT): MBufT = {
        if (maxSize > 0 && b.t.length > maxSize) {
          b.t = b.t.take(maxSize); b.tie = b.tie.take(maxSize)
          b.v = b.v.take(maxSize)
        }
        b
      }
      def reduce(b: MBufT, s: FTSeq): MBufT = mergeInto(b, s.t, s.tie, s.v)
      def merge(a: MBufT, b: MBufT): MBufT =
        mergeInto(a, b.t.toArray, b.tie.toArray, b.v.toArray)
      def finish(b: MBufT): FSeq =
        FSeq(b.t.toArray, b.v.toArray, b.t.length.toLong)
      def bufferEncoder: Encoder[MBufT] = Encoders.product[MBufT]
      def outputEncoder: Encoder[FSeq] = Encoders.product[FSeq]
    }

    /** 2-D variant of [[TieMergeAggregator]]. */
    class PointTieMergeAggregator(maxSize: Int)
        extends Aggregator[PTSeq, MBufP, PSeq] {
      def zero: MBufP =
        MBufP(Vector.empty, Vector.empty, Vector.empty, Vector.empty)
      private def mergeInto(b: MBufP, t2: Array[Long], tie2: Array[Long],
                            x2: Array[Double], y2: Array[Double]): MBufP = {
        val nt = Vector.newBuilder[Long]
        val ntie = Vector.newBuilder[Long]
        val nx = Vector.newBuilder[Double]
        val ny = Vector.newBuilder[Double]
        var i = 0; var j = 0
        while (i < b.t.length || j < t2.length) {
          if (j >= t2.length || (i < b.t.length && b.t(i) < t2(j))) {
            nt += b.t(i); ntie += b.tie(i); nx += b.x(i); ny += b.y(i)
            i += 1
          } else if (i >= b.t.length || t2(j) < b.t(i)) {
            nt += t2(j); ntie += tie2(j); nx += x2(j); ny += y2(j)
            j += 1
          } else {
            if (b.tie(i) <= tie2(j)) {
              nt += b.t(i); ntie += b.tie(i); nx += b.x(i); ny += b.y(i)
            } else { nt += t2(j); ntie += tie2(j); nx += x2(j); ny += y2(j) }
            i += 1; j += 1
          }
        }
        b.t = nt.result(); b.tie = ntie.result()
        b.x = nx.result(); b.y = ny.result()
        capped(b)
      }
      private def capped(b: MBufP): MBufP = {
        if (maxSize > 0 && b.t.length > maxSize) {
          b.t = b.t.take(maxSize); b.tie = b.tie.take(maxSize)
          b.x = b.x.take(maxSize); b.y = b.y.take(maxSize)
        }
        b
      }
      def reduce(b: MBufP, s: PTSeq): MBufP =
        mergeInto(b, s.t, s.tie, s.x, s.y)
      def merge(a: MBufP, b: MBufP): MBufP =
        mergeInto(a, b.t.toArray, b.tie.toArray, b.x.toArray, b.y.toArray)
      def finish(b: MBufP): PSeq =
        PSeq(b.t.toArray, b.x.toArray, b.y.toArray, b.t.length.toLong)
      def bufferEncoder: Encoder[MBufP] = Encoders.product[MBufP]
      def outputEncoder: Encoder[PSeq] = Encoders.product[PSeq]
    }
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
