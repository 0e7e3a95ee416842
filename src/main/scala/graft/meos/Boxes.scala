package graft.meos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounding boxes and their topological predicates (SURVEY.md §2.3, J1-J5).
  *
  * `TBox` = value span × time span (`meos/src/tbox.rs:19-21`); `STBox` =
  * x/y[/z] space × time (`meos/src/stbox.rs:16-18`). The predicates
  * `contains` / `overlaps` / `same` (`tbox.rs:100-110`, `stbox.rs:83-93`)
  * are exactly the spatiotemporal join conditions MobilityDB workloads use,
  * so they are exposed as plain boolean `Column` expressions usable both as
  * filters and as theta-join conditions — Catalyst keeps them pushdown- and
  * codegen-friendly because the box encoding is an open struct of doubles /
  * timestamps.
  *
  * v1 boxes built from data are closed (inclusive) on every bound — matching
  * the reference's constructed sequences (`lower_inc=upper_inc=true`,
  * `meos/src/tseq.rs:57-58`). Half-open bounds appear only through WKT
  * literals and are honored by the Wkt module's predicate variants.
  */
object Boxes {

  val tboxType: StructType = StructType(Seq(
    StructField("vmin", DoubleType), StructField("vmax", DoubleType),
    StructField("tmin", TimestampType), StructField("tmax", TimestampType)))

  val stboxType: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("xmax", DoubleType),
    StructField("ymin", DoubleType), StructField("ymax", DoubleType),
    StructField("tmin", TimestampType), StructField("tmax", TimestampType)))

  // ---- constructors -------------------------------------------------------

  def tbox(vmin: Column, vmax: Column, tmin: Column, tmax: Column): Column =
    struct(vmin.cast(DoubleType).as("vmin"), vmax.cast(DoubleType).as("vmax"),
      tmin.as("tmin"), tmax.as("tmax"))

  /** Degenerate box from a single value — `int_to_tbox`
    * (`meos/src/tbox.rs:87-98`): value span collapses to [v, v], no time. */
  def valueToTbox(v: Column): Column =
    struct(v.cast(DoubleType).as("vmin"), v.cast(DoubleType).as("vmax"),
      lit(null).cast(TimestampType).as("tmin"),
      lit(null).cast(TimestampType).as("tmax"))

  /** Aggregate constructor: the value×time extent of a group (A9). */
  def tboxAgg(v: Column, t: Column): Column =
    struct(min(v).cast(DoubleType).as("vmin"),
      max(v).cast(DoubleType).as("vmax"),
      min(t).as("tmin"), max(t).as("tmax"))

  def stbox(xmin: Column, xmax: Column, ymin: Column, ymax: Column,
            tmin: Column, tmax: Column): Column =
    struct(xmin.cast(DoubleType).as("xmin"), xmax.cast(DoubleType).as("xmax"),
      ymin.cast(DoubleType).as("ymin"), ymax.cast(DoubleType).as("ymax"),
      tmin.as("tmin"), tmax.as("tmax"))

  /** Aggregate constructor: spatial+time extent of a group of posits (A10). */
  def stboxAgg(x: Column, y: Column, t: Column): Column =
    struct(min(x).cast(DoubleType).as("xmin"),
      max(x).cast(DoubleType).as("xmax"),
      min(y).cast(DoubleType).as("ymin"),
      max(y).cast(DoubleType).as("ymax"),
      min(t).as("tmin"), max(t).as("tmax"))

  /** 3-D variant: the `STBOX Z` extent (`meos/src/stbox.rs:120`) of a
    * group of (x, y, z, t) posits. */
  def stboxAggZ(x: Column, y: Column, z: Column, t: Column): Column =
    struct(min(x).cast(DoubleType).as("xmin"),
      max(x).cast(DoubleType).as("xmax"),
      min(y).cast(DoubleType).as("ymin"),
      max(y).cast(DoubleType).as("ymax"),
      min(z).cast(DoubleType).as("zmin"),
      max(z).cast(DoubleType).as("zmax"),
      min(t).as("tmin"), max(t).as("tmax"))

  // ---- predicates (usable as filter or join condition) --------------------

  private def dimContains(alo: Column, ahi: Column, blo: Column,
                          bhi: Column): Column =
    (alo <= blo) && (bhi <= ahi)

  private def dimOverlaps(alo: Column, ahi: Column, blo: Column,
                          bhi: Column): Column =
    (alo <= bhi) && (blo <= ahi)

  /** A contains B on value and time (`contains_tbox_tbox`,
    * `meos/src/tbox.rs:100-102`). */
  def tboxContains(a: Column, b: Column): Column =
    dimContains(a("vmin"), a("vmax"), b("vmin"), b("vmax")) &&
      dimContains(a("tmin"), a("tmax"), b("tmin"), b("tmax"))

  /** Boxes intersect (`overlaps_tbox_tbox`, `meos/src/tbox.rs:104-106`). */
  def tboxOverlaps(a: Column, b: Column): Column =
    dimOverlaps(a("vmin"), a("vmax"), b("vmin"), b("vmax")) &&
      dimOverlaps(a("tmin"), a("tmax"), b("tmin"), b("tmax"))

  /** Equal extent (`same_tbox_tbox`, `meos/src/tbox.rs:108-110`). */
  def tboxSame(a: Column, b: Column): Column =
    (a("vmin") === b("vmin")) && (a("vmax") === b("vmax")) &&
      (a("tmin") === b("tmin")) && (a("tmax") === b("tmax"))

  /** Spatiotemporal containment (`meos/src/stbox.rs:83-85`). */
  def stboxContains(a: Column, b: Column): Column =
    dimContains(a("xmin"), a("xmax"), b("xmin"), b("xmax")) &&
      dimContains(a("ymin"), a("ymax"), b("ymin"), b("ymax")) &&
      dimContains(a("tmin"), a("tmax"), b("tmin"), b("tmax"))

  /** Spatiotemporal intersection (`meos/src/stbox.rs:87-89`). */
  def stboxOverlaps(a: Column, b: Column): Column =
    dimOverlaps(a("xmin"), a("xmax"), b("xmin"), b("xmax")) &&
      dimOverlaps(a("ymin"), a("ymax"), b("ymin"), b("ymax")) &&
      dimOverlaps(a("tmin"), a("tmax"), b("tmin"), b("tmax"))

  /** Equal spatiotemporal extent (`meos/src/stbox.rs:91-93`). */
  def stboxSame(a: Column, b: Column): Column =
    (a("xmin") === b("xmin")) && (a("xmax") === b("xmax")) &&
      (a("ymin") === b("ymin")) && (a("ymax") === b("ymax")) &&
      (a("tmin") === b("tmin")) && (a("tmax") === b("tmax"))

  /** Candidate stage of the bucketed overlap join, shared by the public
    * variants and unit-testable on its own: each box explodes into every
    * time bucket its [tmin, tmax] overlaps (and, when `valueWidth` is set,
    * every value cell its [vmin, vmax] overlaps — 2-D buckets), candidates
    * meet on bucket-id equality, and a CANONICAL-CELL predicate keeps each
    * pair exactly once — the cell containing `greatest(lo_A, lo_B)` per
    * dimension, a point both boxes cover whenever they overlap — so no
    * dedup pass is needed downstream. */
  private[graft] def bucketedCandidates(
      a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
      bucket: java.time.Duration, valueWidth: Option[Double])
      : org.apache.spark.sql.DataFrame = {
    val w = bucket.toNanos / 1000L // micros
    def withBuckets(df: org.apache.spark.sql.DataFrame, side: String) = {
      val t = df
        .select(col("id").as(s"id$side"), col("box").as(s"box$side"),
          explode(sequence(
            (unix_micros(col("box.tmin")) / w).cast("long"),
            (unix_micros(col("box.tmax")) / w).cast("long")))
            .as("bucket"))
      valueWidth match {
        case Some(vw) => t.select(col(s"id$side"), col(s"box$side"),
          col("bucket"),
          explode(sequence(
            floor(col(s"box$side.vmin") / vw).cast("long"),
            floor(col(s"box$side.vmax") / vw).cast("long")))
            .as("vcell"))
        case None => t
      }
    }
    val keys = "bucket" +: valueWidth.map(_ => "vcell").toSeq
    val tCanonical = col("bucket") ===
      (greatest(unix_micros(col("boxA.tmin")),
        unix_micros(col("boxB.tmin"))) / w).cast("long")
    val canonical = valueWidth match {
      case Some(vw) => tCanonical && (col("vcell") ===
        floor(greatest(col("boxA.vmin"), col("boxB.vmin")) / vw)
          .cast("long"))
      case None => tCanonical
    }
    withBuckets(a, "A").join(withBuckets(b, "B"), keys).where(canonical)
  }

  /** Scalable box-overlap join (the SURVEY §4.2 "range-join rule"
    * candidate, solved Spark-first instead of with a custom Strategy):
    * map each box to every time bucket its [tmin, tmax] overlaps
    * (explode — narrow), equi-join on bucket id (shuffle on ints — the
    * only wide op), then apply the exact overlap predicate. Pairs meeting
    * in several buckets are kept once by the canonical-cell predicate (see
    * [[bucketedCandidates]]) — cheaper than the old distinct pass, which
    * shuffled the full pre-dedup pair set. Work scales with (boxes ×
    * avg buckets spanned) instead of |A|×|B|; bucketWidth tunes the
    * tradeoff (≈ median box duration is a good default).
    *
    * HOT-BUCKET GUARD: one globally popular time window still degrades to
    * per-bucket all-pairs. `valueWidth` adds a second bucketing dimension
    * over the value span (2-D cells) so a hot time bucket spreads across
    * value cells; candidates then also require value-cell equality, which
    * bounds per-cell pair counts as long as values discriminate.
    *
    * Inputs need columns (id, box) each; output (idA, idB) pairs with
    * idA from `a`, deduped, exact — proven equal to the nested-loop
    * result in specs. */
  def tboxOverlapJoinBucketed(a: org.apache.spark.sql.DataFrame,
                              b: org.apache.spark.sql.DataFrame,
                              bucket: java.time.Duration,
                              pairFilter: (Column, Column) => Column =
                                (_, _) => lit(true),
                              valueWidth: Option[Double] = None)
      : org.apache.spark.sql.DataFrame =
    bucketedCandidates(a, b, bucket, valueWidth)
      // pairFilter (e.g. idA < idB for self-joins) cuts the candidate set
      // BEFORE the exact predicate
      .where(pairFilter(col("idA"), col("idB")) &&
        tboxOverlaps(col("boxA"), col("boxB")))
      .select(col("idA"), col("idB"))

  /** [[tboxOverlapJoinBucketed]] with widths chosen from the DATA in one
    * aggregate over `a`: time bucket = median box duration, and (when
    * `twoD`) value cell = median value span. Too-narrow buckets explode
    * long boxes into many rows; too-wide buckets degrade to per-bucket
    * all-pairs — the medians balance rows-per-box against
    * candidates-per-bucket without hand-tuning. Use `twoD = true` when
    * the time dimension may carry a globally hot window (the guard above);
    * it costs ~2× exploded rows for bounded per-cell work. */
  def tboxOverlapJoinBucketedAuto(a: org.apache.spark.sql.DataFrame,
                                  b: org.apache.spark.sql.DataFrame,
                                  pairFilter: (Column, Column) => Column =
                                    (_, _) => lit(true),
                                  twoD: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val medianRow = a.select(
      percentile_approx(
        unix_micros(col("box.tmax")) - unix_micros(col("box.tmin")),
        lit(0.5), lit(1000)).as("mt"),
      percentile_approx(col("box.vmax") - col("box.vmin"),
        lit(0.5), lit(1000)).as("mv"))
      .collect()(0)
    // empty/all-null input → arbitrary width (join output is empty anyway)
    val medianUs = if (medianRow.isNullAt(0)) 3600000000L
      else medianRow.getLong(0)
    val width = math.max(medianUs, 1000000L) // floor: 1 s buckets
    val vWidth = if (!twoD) None else Some {
      val mv = if (medianRow.isNullAt(1)) 1.0 else medianRow.getDouble(1)
      math.max(mv, 1e-9) // floor: degenerate all-point spans
    }
    tboxOverlapJoinBucketed(a, b, java.time.Duration.ofNanos(width * 1000L),
      pairFilter, vWidth)
  }

  /** The reference's box total order: `tbox_cmp`/`stbox_cmp`
    * (`meos/src/tbox.rs:46-57`, `stbox.rs:42-53`) — lexicographic over the
    * struct fields. Spark's native struct ordering matches; expose the box
    * struct itself as the sort key. */
  def boxOrder(box: Column): Column = box

  // ---- inclusivity-carrying columnar boxes (SURVEY §1.4's full design) ----
  //
  // The closed-bounds structs above stay the fast path for data-built
  // boxes (aggregated extents are always inclusive, tseq.rs:57-58). WKT
  // literals carry half-open spans (`TBOX X([1.1, 4.0))`, tbox.rs:132) —
  // these full structs keep that fidelity columnar, so half-open
  // predicates run as codegen'd expressions instead of the row-wise
  // BoxText UDFs.

  /** Spatial twin of [[tboxOverlapJoinBucketed]] for STBox (J4/J5's scale
    * path): each box explodes into every (x, y) grid cell its spatial
    * extent overlaps, candidates meet on cell equality (a shuffle on an
    * int pair — the only wide op), the canonical-cell predicate keeps
    * each pair exactly once, and the exact [[stboxOverlaps]] predicate
    * (time included) refines. Work scales with boxes × cells-per-box
    * instead of |A|×|B|; cell widths ≈ median extents are a good default.
    * Inputs need (id, box) with the [[stboxType]] struct. */
  def stboxOverlapJoinBucketed(a: org.apache.spark.sql.DataFrame,
                               b: org.apache.spark.sql.DataFrame,
                               xWidth: Double, yWidth: Double,
                               pairFilter: (Column, Column) => Column =
                                 (_, _) => lit(true))
      : org.apache.spark.sql.DataFrame = {
    def cells(lo: Column, hi: Column, w: Double): Column =
      sequence(floor(lo / w).cast("long"), floor(hi / w).cast("long"))
    def withCells(df: org.apache.spark.sql.DataFrame, side: String) = df
      .select(col("id").as(s"id$side"), col("box").as(s"box$side"),
        explode(cells(col("box.xmin"), col("box.xmax"), xWidth)).as("xc"))
      .select(col(s"id$side"), col(s"box$side"), col("xc"),
        explode(cells(col(s"box$side.ymin"), col(s"box$side.ymax"), yWidth))
          .as("yc"))
    val canonical =
      (col("xc") === floor(greatest(col("boxA.xmin"), col("boxB.xmin"))
        / xWidth).cast("long")) &&
        (col("yc") === floor(greatest(col("boxA.ymin"), col("boxB.ymin"))
          / yWidth).cast("long"))
    withCells(a, "A").join(withCells(b, "B"), Seq("xc", "yc"))
      .where(canonical && pairFilter(col("idA"), col("idB")) &&
        stboxOverlaps(col("boxA"), col("boxB")))
      .select(col("idA"), col("idB"))
  }

  /** Bucketed overlap join over inclusivity-carrying full boxes: the
    * bucket candidates treat bounds as closed (a superset of the half-open
    * truth), and [[tboxOverlapsFull]] refines exactly — so half-open WKT
    * boxes get the same scalable join shape as the closed fast path.
    * Boxes missing the time dimension (hasT = false) overlap everything
    * time-wise, so they are routed around the bucket join and cross-joined
    * against the other side (rare at scale: literal value-only boxes). */
  def tboxOverlapJoinBucketedFull(a: org.apache.spark.sql.DataFrame,
                                  b: org.apache.spark.sql.DataFrame,
                                  bucket: java.time.Duration,
                                  pairFilter: (Column, Column) => Column =
                                    (_, _) => lit(true))
      : org.apache.spark.sql.DataFrame = {
    val exact = (l: org.apache.spark.sql.DataFrame,
                 r: org.apache.spark.sql.DataFrame) =>
      l.join(r, pairFilter(col("idA"), col("idB")) &&
        tboxOverlapsFull(col("boxA"), col("boxB")))
        .select(col("idA"), col("idB"))
    val aT = a.where(col("box.hasT"))
    val bT = b.where(col("box.hasT"))
    val bucketed = bucketedCandidates(aT, bT, bucket, None)
      .where(pairFilter(col("idA"), col("idB")) &&
        tboxOverlapsFull(col("boxA"), col("boxB")))
      .select(col("idA"), col("idB"))
    val aNoT = a.where(!col("box.hasT"))
      .select(col("id").as("idA"), col("box").as("boxA"))
    val bNoT = b.where(!col("box.hasT"))
      .select(col("id").as("idB"), col("box").as("boxB"))
    val aAll = a.select(col("id").as("idA"), col("box").as("boxA"))
    val bAll = b.select(col("id").as("idB"), col("box").as("boxB"))
    // timeless × everything, and timed × timeless (timeless × timeless is
    // inside the first leg already — exclude it from the second)
    bucketed
      .unionByName(exact(aNoT, bAll))
      .unionByName(exact(
        aAll.where(col("boxA.hasT")), bNoT))
  }

  /** SURVEY §1.4's TBox mapping: span bounds + 4 inclusivity flags +
    * dimension-presence flags. */
  val tboxFullType: StructType = StructType(Seq(
    StructField("vmin", DoubleType), StructField("vmax", DoubleType),
    StructField("tmin", TimestampType), StructField("tmax", TimestampType),
    StructField("vmin_inc", BooleanType), StructField("vmax_inc", BooleanType),
    StructField("tmin_inc", BooleanType), StructField("tmax_inc", BooleanType),
    StructField("hasV", BooleanType), StructField("hasT", BooleanType)))

  /** Constructor with the closed-bounds defaults of data-built boxes. */
  def tboxFull(vmin: Column, vmax: Column, tmin: Column, tmax: Column,
               vminInc: Column = lit(true), vmaxInc: Column = lit(true),
               tminInc: Column = lit(true), tmaxInc: Column = lit(true),
               hasV: Column = lit(true), hasT: Column = lit(true)): Column =
    struct(vmin.cast(DoubleType).as("vmin"), vmax.cast(DoubleType).as("vmax"),
      tmin.as("tmin"), tmax.as("tmax"),
      vminInc.as("vmin_inc"), vmaxInc.as("vmax_inc"),
      tminInc.as("tmin_inc"), tmaxInc.as("tmax_inc"),
      hasV.as("hasV"), hasT.as("hasT"))

  /** Lift a WKT-parsed box (`MeosFunctions.tboxIn`'s nested-span shape)
    * to the flat columnar full struct — the bridge from literal parsing
    * to columnar predicates. */
  def tboxFullFromParsed(b: Column): Column =
    tboxFull(
      b("value")("lo"), b("value")("hi"), b("time")("lo"), b("time")("hi"),
      coalesce(b("value")("lo_inc"), lit(true)),
      coalesce(b("value")("hi_inc"), lit(true)),
      coalesce(b("time")("lo_inc"), lit(true)),
      coalesce(b("time")("hi_inc"), lit(true)),
      b("value").isNotNull, b("time").isNotNull)

  private def dimContainsI(alo: Column, ahi: Column, aloI: Column,
                           ahiI: Column, blo: Column, bhi: Column,
                           bloI: Column, bhiI: Column): Column =
    ((alo < blo) || (alo === blo && (aloI || !bloI))) &&
      ((ahi > bhi) || (ahi === bhi && (ahiI || !bhiI)))

  private def dimOverlapsI(alo: Column, ahi: Column, aloI: Column,
                           ahiI: Column, blo: Column, bhi: Column,
                           bloI: Column, bhiI: Column): Column = {
    val aMeets = (alo < bhi) || (alo === bhi && aloI && bhiI)
    val bMeets = (blo < ahi) || (blo === ahi && bloI && ahiI)
    aMeets && bMeets
  }

  /** Dimensions absent from either side are ignored (the BoxText
    * shared-dimension rule, mirroring MEOS's dimensionality handling). */
  private def sharedDim(aHas: Column, bHas: Column, pred: Column): Column =
    !(aHas && bHas) || pred

  /** Inclusivity-honoring contains over full structs — the columnar twin
    * of `BoxText.tboxContains` (truth-table equal, BoxesSpec). */
  def tboxContainsFull(a: Column, b: Column): Column =
    sharedDim(a("hasV"), b("hasV"),
      dimContainsI(a("vmin"), a("vmax"), a("vmin_inc"), a("vmax_inc"),
        b("vmin"), b("vmax"), b("vmin_inc"), b("vmax_inc"))) &&
      sharedDim(a("hasT"), b("hasT"),
        dimContainsI(a("tmin"), a("tmax"), a("tmin_inc"), a("tmax_inc"),
          b("tmin"), b("tmax"), b("tmin_inc"), b("tmax_inc")))

  /** Inclusivity-honoring overlaps over full structs (J2's half-open
    * semantics: `[1, 2)` does NOT meet `[2, 3]` at the open edge). */
  def tboxOverlapsFull(a: Column, b: Column): Column =
    sharedDim(a("hasV"), b("hasV"),
      dimOverlapsI(a("vmin"), a("vmax"), a("vmin_inc"), a("vmax_inc"),
        b("vmin"), b("vmax"), b("vmin_inc"), b("vmax_inc"))) &&
      sharedDim(a("hasT"), b("hasT"),
        dimOverlapsI(a("tmin"), a("tmax"), a("tmin_inc"), a("tmax_inc"),
          b("tmin"), b("tmax"), b("tmin_inc"), b("tmax_inc")))

  /** Same extent including inclusivity flags and dimensionality. */
  def tboxSameFull(a: Column, b: Column): Column = a === b

  /** STBox full struct: spatial bounds are always closed in MEOS — only
    * the period carries inclusivity (`stbox.rs` periods). */
  val stboxFullType: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("xmax", DoubleType),
    StructField("ymin", DoubleType), StructField("ymax", DoubleType),
    StructField("zmin", DoubleType), StructField("zmax", DoubleType),
    StructField("tmin", TimestampType), StructField("tmax", TimestampType),
    StructField("tmin_inc", BooleanType), StructField("tmax_inc", BooleanType),
    StructField("hasXY", BooleanType), StructField("hasZ", BooleanType),
    StructField("hasT", BooleanType)))

  def stboxFull(xmin: Column, xmax: Column, ymin: Column, ymax: Column,
                tmin: Column, tmax: Column,
                zmin: Column = lit(null).cast(DoubleType),
                zmax: Column = lit(null).cast(DoubleType),
                tminInc: Column = lit(true), tmaxInc: Column = lit(true),
                hasXY: Column = lit(true), hasZ: Column = lit(false),
                hasT: Column = lit(true)): Column =
    struct(xmin.cast(DoubleType).as("xmin"), xmax.cast(DoubleType).as("xmax"),
      ymin.cast(DoubleType).as("ymin"), ymax.cast(DoubleType).as("ymax"),
      zmin.cast(DoubleType).as("zmin"), zmax.cast(DoubleType).as("zmax"),
      tmin.as("tmin"), tmax.as("tmax"),
      tminInc.as("tmin_inc"), tmaxInc.as("tmax_inc"),
      hasXY.as("hasXY"), hasZ.as("hasZ"), hasT.as("hasT"))

  def stboxContainsFull(a: Column, b: Column): Column =
    sharedDim(a("hasXY"), b("hasXY"),
      dimContains(a("xmin"), a("xmax"), b("xmin"), b("xmax")) &&
        dimContains(a("ymin"), a("ymax"), b("ymin"), b("ymax"))) &&
      sharedDim(a("hasZ"), b("hasZ"),
        dimContains(a("zmin"), a("zmax"), b("zmin"), b("zmax"))) &&
      sharedDim(a("hasT"), b("hasT"),
        dimContainsI(a("tmin"), a("tmax"), a("tmin_inc"), a("tmax_inc"),
          b("tmin"), b("tmax"), b("tmin_inc"), b("tmax_inc")))

  def stboxOverlapsFull(a: Column, b: Column): Column =
    sharedDim(a("hasXY"), b("hasXY"),
      dimOverlaps(a("xmin"), a("xmax"), b("xmin"), b("xmax")) &&
        dimOverlaps(a("ymin"), a("ymax"), b("ymin"), b("ymax"))) &&
      sharedDim(a("hasZ"), b("hasZ"),
        dimOverlaps(a("zmin"), a("zmax"), b("zmin"), b("zmax"))) &&
      sharedDim(a("hasT"), b("hasT"),
        dimOverlapsI(a("tmin"), a("tmax"), a("tmin_inc"), a("tmax_inc"),
          b("tmin"), b("tmax"), b("tmin_inc"), b("tmax_inc")))
}
