package graft.meos

import java.time.Instant

/** WKT codecs + inclusivity-aware predicates for TBox / STBox — the box
  * algebra of `meos/src/tbox.rs` / `stbox.rs` (`tbox_in`/`tbox_out`
  * `:73-85,66-71`; `stbox_in`/`stbox_out` `:69-81,62-67`; predicates
  * `:100-110` / `:83-93`).
  *
  * Print fidelity (goldens `tbox.rs:131-151`, `stbox.rs:113-124`):
  *  - a value-spanned TBox prints as `TBOXFLOAT X([1.1, 4))` — type name
  *    becomes TBOXFLOAT, floats min-digit, span bounds chars preserved,
  *    ", " separator inside spans;
  *  - a time-only TBox prints as `TBOX T([.. +00, .. +00])` (timestamps in
  *    session tz — ours pinned UTC);
  *  - STBox corners print WITHOUT spaces: `STBOX X((1,2),(3,4))`.
  */
object BoxText {

  case class Span[A](lo: A, hi: A, `lo_inc`: Boolean, `hi_inc`: Boolean)

  case class TBoxV(value: Option[Span[Double]], time: Option[Span[Instant]])

  case class STBoxV(srid: Int,
                    xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                    zmin: Option[Double], zmax: Option[Double],
                    hasXY: Boolean, time: Option[Span[Instant]])

  private def fail(msg: String): Nothing = throw new TGeom.ParseError(msg)

  // ---- span predicates (inclusivity-aware) --------------------------------

  def spanContains[A](a: Span[A], b: Span[A])(implicit ord: Ordering[A])
      : Boolean = {
    val lowerOk = ord.lt(a.lo, b.lo) ||
      (ord.equiv(a.lo, b.lo) && (a.`lo_inc` || !b.`lo_inc`))
    val upperOk = ord.gt(a.hi, b.hi) ||
      (ord.equiv(a.hi, b.hi) && (a.`hi_inc` || !b.`hi_inc`))
    lowerOk && upperOk
  }

  def spanOverlaps[A](a: Span[A], b: Span[A])(implicit ord: Ordering[A])
      : Boolean = {
    def meets(lo: Span[A], hi: Span[A]) = ord.lt(lo.lo, hi.hi) ||
      (ord.equiv(lo.lo, hi.hi) && lo.`lo_inc` && hi.`hi_inc`)
    meets(a, b) && meets(b, a)
  }

  private implicit val instOrd: Ordering[Instant] =
    Ordering.by((i: Instant) => (i.getEpochSecond, i.getNano))

  /** Boxes compare dimension-wise; a dimension absent from either side is
    * ignored — MEOS requires matching dimensionality and we follow the
    * same spirit by comparing only shared dimensions. */
  def tboxContains(a: TBoxV, b: TBoxV): Boolean =
    (a.value, b.value, a.time, b.time) match {
      case (av, bv, at, bt) =>
        av.zip(bv).forall { case (x, y) => spanContains(x, y) } &&
          at.zip(bt).forall { case (x, y) => spanContains(x, y) }
    }

  def tboxOverlaps(a: TBoxV, b: TBoxV): Boolean =
    a.value.zip(b.value).forall { case (x, y) => spanOverlaps(x, y) } &&
      a.time.zip(b.time).forall { case (x, y) => spanOverlaps(x, y) }

  def tboxSame(a: TBoxV, b: TBoxV): Boolean = a == b

  // ---- TBox WKT ------------------------------------------------------------

  private def parseSpan[A](s: String, parseA: String => A): Span[A] = {
    val t = s.trim
    val lo = t.head match {
      case '[' => true
      case '(' => false
      case c => fail(s"bad span open '$c'")
    }
    val hi = t.last match {
      case ']' => true
      case ')' => false
      case c => fail(s"bad span close '$c'")
    }
    val parts = t.substring(1, t.length - 1).split(",")
    if (parts.length != 2) fail(s"bad span '$s'")
    Span(parseA(parts(0).trim), parseA(parts(1).trim), lo, hi)
  }

  /** Split `(4, 12),[2001-01-01, 2001-10-01]` into its two spans. */
  private def splitSpans(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '[' | '(' => depth += 1
        case ']' | ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def parseTBox(wkt: String): TBoxV = parseTBox(wkt, java.time.ZoneOffset.UTC)
  /** `zone` resolves offset-less timestamp literals (MEOS session-tz
    * semantics; the tbox.rs goldens assume America/New_York). */
  def parseTBox(wkt: String, zone: java.time.ZoneId): TBoxV = {
    def parseTsZ(s: String) = TGeom.parseTs(s, zone)
    val s = wkt.trim
    val up = s.toUpperCase
    val kindStart = up.indexOf("TBOX")
    if (kindStart != 0 && !(up.startsWith("TBOXFLOAT") ||
        up.startsWith("TBOXINT"))) fail(s"not a TBOX: '$wkt'")
    val afterName = s.substring(
      if (up.startsWith("TBOXFLOAT")) 9 else if (up.startsWith("TBOXINT")) 7
      else 4).trim
    val dims = afterName.takeWhile(c => c != '(' && c != '[').trim.toUpperCase
    // the body is wrapped in one outer paren pair: `X([1.1, 4.0))`,
    // `XT((4, 12),[...])`
    val wrapped = afterName.substring(dims.length).trim
    if (!wrapped.startsWith("(") || !wrapped.endsWith(")"))
      fail(s"bad TBOX body '$wrapped'")
    val body = wrapped.substring(1, wrapped.length - 1).trim
    dims match {
      case "X" =>
        TBoxV(Some(parseSpan(body, (_: String).toDouble)), None)
      case "T" =>
        TBoxV(None, Some(parseSpan(body, parseTsZ)))
      case "XT" =>
        val ss = splitSpans(body)
        if (ss.length != 2) fail(s"bad TBOX XT body '$body'")
        TBoxV(Some(parseSpan(ss(0), (_: String).toDouble)),
          Some(parseSpan(ss(1), parseTsZ)))
      case o => fail(s"bad TBOX dims '$o'")
    }
  }

  private def fmtSpan[A](sp: Span[A], fmtA: A => String): String =
    (if (sp.`lo_inc`) "[" else "(") + fmtA(sp.lo) + ", " + fmtA(sp.hi) +
      (if (sp.`hi_inc`) "]" else ")")

  def printTBox(b: TBoxV, maxdd: Int = 6,
                zone: java.time.ZoneId = java.time.ZoneOffset.UTC): String = {
    def ft(t: java.time.Instant) = TGeom.fmtTs(t, zone)
    (b.value, b.time) match {
      case (Some(v), None) =>
        s"TBOXFLOAT X(${fmtSpan(v, TGeom.fmtFloat(_: Double, maxdd))})"
      case (None, Some(t)) => s"TBOX T(${fmtSpan(t, ft)})"
      case (Some(v), Some(t)) =>
        s"TBOXFLOAT XT(${fmtSpan(v, TGeom.fmtFloat(_: Double, maxdd))}," +
          s"${fmtSpan(t, ft)})"
      case (None, None) => fail("empty TBOX")
    }
  }

  /** `int_to_tbox` (`tbox.rs:87-98`): degenerate closed value span. */
  def tboxFromInt(i: Int): TBoxV =
    TBoxV(Some(Span(i.toDouble, i.toDouble, `lo_inc` = true,
      `hi_inc` = true)), None)

  // ---- STBox WKT -----------------------------------------------------------

  private def parsePoint(s: String): Array[Double] = {
    val t = s.trim
    if (!t.startsWith("(") || !t.endsWith(")")) fail(s"bad point '$s'")
    t.substring(1, t.length - 1).split(",").map(_.trim.toDouble)
  }

  def parseSTBox(wkt: String): STBoxV =
    parseSTBox(wkt, java.time.ZoneOffset.UTC)
  def parseSTBox(wkt: String, zone: java.time.ZoneId): STBoxV = {
    def parseTsZ(s: String) = TGeom.parseTs(s, zone)
    var s = wkt.trim
    var srid = 0
    if (s.toUpperCase.startsWith("SRID=")) {
      val i = s.indexOf(';')
      srid = s.substring(5, i).trim.toInt
      s = s.substring(i + 1).trim
    }
    val up = s.toUpperCase
    if (!up.startsWith("STBOX")) fail(s"not an STBOX: '$wkt'")
    val afterName = s.substring(5).trim
    val dims = afterName.takeWhile(c => c != '(' && c != '[').trim.toUpperCase
    // one outer paren pair wraps the body: `X((1,2),(3,4))`,
    // `XT(((1,2),(3,4)),[t1, t2])`, `T([t1, t2])`
    val wrapped = afterName.substring(dims.length).trim
    if (!wrapped.startsWith("(") || !wrapped.endsWith(")"))
      fail(s"bad STBOX body '$wrapped'")
    val body = wrapped.substring(1, wrapped.length - 1).trim
    def corners(cs: String): (Array[Double], Array[Double]) = {
      val pts = splitSpans(cs).map(parsePoint)
      if (pts.length != 2) fail(s"bad STBOX corners '$cs'")
      (pts(0), pts(1))
    }
    dims match {
      case "X" | "Z" =>
        val (lo, hi) = corners(body)
        STBoxV(srid, lo(0), lo(1), hi(0), hi(1),
          if (dims == "Z") Some(lo(2)) else None,
          if (dims == "Z") Some(hi(2)) else None,
          hasXY = true, None)
      case "T" =>
        STBoxV(srid, 0, 0, 0, 0, None, None, hasXY = false,
          Some(parseSpan(body, parseTsZ)))
      case "XT" | "ZT" =>
        val parts = splitSpans(body)
        if (parts.length != 2) fail(s"bad STBOX $dims body '$body'")
        val region = parts(0).trim
        val (lo, hi) = corners(region.substring(1, region.length - 1))
        val sp = parseSpan(parts(1), parseTsZ)
        STBoxV(srid, lo(0), lo(1), hi(0), hi(1),
          if (dims == "ZT") Some(lo(2)) else None,
          if (dims == "ZT") Some(hi(2)) else None,
          hasXY = true, Some(sp))
      case o => fail(s"bad STBOX dims '$o'")
    }
  }

  def printSTBox(b: STBoxV, maxdd: Int = 6,
                 zone: java.time.ZoneId = java.time.ZoneOffset.UTC): String = {
    def f(v: Double) = TGeom.fmtFloat(v, maxdd)
    def ft(t: java.time.Instant) = TGeom.fmtTs(t, zone)
    val prefix = if (b.srid != 0) s"SRID=${b.srid};" else ""
    def corner(x: Double, y: Double, z: Option[Double]) = z match {
      case Some(zv) => s"(${f(x)},${f(y)},${f(zv)})"
      case None => s"(${f(x)},${f(y)})"
    }
    (b.hasXY, b.time) match {
      case (true, None) =>
        val d = if (b.zmin.isDefined) "Z" else "X"
        prefix + s"STBOX $d(${corner(b.xmin, b.ymin, b.zmin)}," +
          s"${corner(b.xmax, b.ymax, b.zmax)})"
      case (false, Some(t)) =>
        prefix + s"STBOX T(${fmtSpan(t, ft)})"
      case (true, Some(t)) =>
        val d = if (b.zmin.isDefined) "ZT" else "XT"
        prefix + s"STBOX $d((${corner(b.xmin, b.ymin, b.zmin)}," +
          s"${corner(b.xmax, b.ymax, b.zmax)}),${fmtSpan(t, ft)})"
      case (false, None) => fail("empty STBOX")
    }
  }

  def stboxContains(a: STBoxV, b: STBoxV): Boolean = {
    val xy = !a.hasXY || !b.hasXY ||
      (a.xmin <= b.xmin && b.xmax <= a.xmax &&
        a.ymin <= b.ymin && b.ymax <= a.ymax &&
        a.zmin.zip(b.zmin).forall { case (az, bz) => az <= bz } &&
        a.zmax.zip(b.zmax).forall { case (az, bz) => bz <= az })
    xy && a.time.zip(b.time).forall { case (x, y) => spanContains(x, y) }
  }

  def stboxOverlaps(a: STBoxV, b: STBoxV): Boolean = {
    val xy = !a.hasXY || !b.hasXY ||
      (a.xmin <= b.xmax && b.xmin <= a.xmax &&
        a.ymin <= b.ymax && b.ymin <= a.ymax &&
        a.zmin.zip(b.zmax).forall { case (az, bz) => az <= bz } &&
        b.zmin.zip(a.zmax).forall { case (bz, az) => bz <= az })
    xy && a.time.zip(b.time).forall { case (x, y) => spanOverlaps(x, y) }
  }

  def stboxSame(a: STBoxV, b: STBoxV): Boolean = a == b
}
