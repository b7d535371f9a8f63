package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal geometry engine for the ST_* function surface
  * (SURVEY §2.9; reference wraps GEOS in
  * source/libs/geometry/src/geomFunc.c). POINT / LINESTRING / POLYGON
  * (single outer ring) in WKT, with the predicate set the reference
  * exposes: intersects, equals, touches, covers, contains,
  * containsproperly. Pure Scala — exact for the rational coordinates
  * used in practice; boundary semantics follow GEOS (contains excludes
  * the boundary, covers includes it, touches means boundary-only
  * contact). */
object Geometry {

  sealed trait Geom
  final case class Pt(x: Double, y: Double) extends Geom
  final case class Line(pts: IndexedSeq[Pt]) extends Geom
  /** Closed outer ring (first == last vertex). */
  final case class Poly(ring: IndexedSeq[Pt]) extends Geom

  // ------------------------------------------------------------------
  // WKT parse / print
  // ------------------------------------------------------------------

  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

  def asText(g: Geom): String = g match {
    case Pt(x, y) => s"POINT (${num(x)} ${num(y)})"
    case Line(ps) =>
      s"LINESTRING (${ps.map(p => s"${num(p.x)} ${num(p.y)}").mkString(", ")})"
    case Poly(r) =>
      s"POLYGON ((${r.map(p => s"${num(p.x)} ${num(p.y)}").mkString(", ")}))"
  }

  private def parsePts(s: String): IndexedSeq[Pt] =
    s.split(",").toIndexedSeq.map { pair =>
      val xs = pair.trim.split("\\s+")
      Pt(xs(0).toDouble, xs(1).toDouble)
    }

  def parse(wkt: String): Option[Geom] = {
    if (wkt == null) return None
    val t = wkt.trim
    val up = t.toUpperCase
    try {
      if (up.startsWith("POINT")) {
        val inner = t.substring(t.indexOf('(') + 1, t.lastIndexOf(')'))
        val p = parsePts(inner); Some(p.head)
      } else if (up.startsWith("LINESTRING")) {
        val inner = t.substring(t.indexOf('(') + 1, t.lastIndexOf(')'))
        Some(Line(parsePts(inner)))
      } else if (up.startsWith("POLYGON")) {
        val a = t.indexOf("((") + 2; val b = t.indexOf("))")
        val ring = parsePts(t.substring(a, b))
        val closed = if (ring.head == ring.last) ring else ring :+ ring.head
        Some(Poly(closed))
      } else None
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------
  // Primitive predicates
  // ------------------------------------------------------------------

  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)

  /** p lies on segment [a, b]. */
  private def onSegment(p: Pt, a: Pt, b: Pt): Boolean =
    cross(a, b, p) == 0.0 &&
      p.x >= math.min(a.x, b.x) && p.x <= math.max(a.x, b.x) &&
      p.y >= math.min(a.y, b.y) && p.y <= math.max(a.y, b.y)

  /** Segments [a,b] and [c,d] share at least one point. */
  private def segIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    val d1 = cross(c, d, a); val d2 = cross(c, d, b)
    val d3 = cross(a, b, c); val d4 = cross(a, b, d)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else onSegment(a, c, d) || onSegment(b, c, d) ||
      onSegment(c, a, b) || onSegment(d, a, b)
  }

  private def ringEdges(r: IndexedSeq[Pt]): Iterator[(Pt, Pt)] =
    r.iterator.zip(r.iterator.drop(1))

  private def lineEdges(l: Line): Iterator[(Pt, Pt)] =
    l.pts.iterator.zip(l.pts.iterator.drop(1))

  /** 1 = interior, 0 = boundary, -1 = exterior (ray casting). */
  def locate(p: Pt, poly: Poly): Int = {
    val r = poly.ring
    if (ringEdges(r).exists { case (a, b) => onSegment(p, a, b) }) return 0
    var inside = false
    ringEdges(r).foreach { case (a, b) =>
      if ((a.y > p.y) != (b.y > p.y)) {
        val xInt = a.x + (p.y - a.y) * (b.x - a.x) / (b.y - a.y)
        if (p.x < xInt) inside = !inside
      }
    }
    if (inside) 1 else -1
  }

  // ------------------------------------------------------------------
  // ST_ predicate dispatch
  // ------------------------------------------------------------------

  def intersects(g1: Geom, g2: Geom): Boolean = (g1, g2) match {
    case (a: Pt, b: Pt) => a == b
    case (p: Pt, l: Line) => lineEdges(l).exists { case (a, b) => onSegment(p, a, b) }
    case (l: Line, p: Pt) => intersects(p, l)
    case (p: Pt, poly: Poly) => locate(p, poly) >= 0
    case (poly: Poly, p: Pt) => locate(p, poly) >= 0
    case (l1: Line, l2: Line) =>
      lineEdges(l1).exists { case (a, b) =>
        lineEdges(l2).exists { case (c, d) => segIntersect(a, b, c, d) } }
    case (l: Line, poly: Poly) =>
      l.pts.exists(p => locate(p, poly) >= 0) ||
        lineEdges(l).exists { case (a, b) =>
          ringEdges(poly.ring).exists { case (c, d) => segIntersect(a, b, c, d) } }
    case (poly: Poly, l: Line) => intersects(l, poly)
    case (p1: Poly, p2: Poly) =>
      p1.ring.exists(p => locate(p, p2) >= 0) ||
        p2.ring.exists(p => locate(p, p1) >= 0) ||
        ringEdges(p1.ring).exists { case (a, b) =>
          ringEdges(p2.ring).exists { case (c, d) => segIntersect(a, b, c, d) } }
  }

  def geomEquals(g1: Geom, g2: Geom): Boolean = (g1, g2) match {
    case (a: Pt, b: Pt) => a == b
    case (a: Line, b: Line) => a.pts == b.pts || a.pts == b.pts.reverse
    case (a: Poly, b: Poly) =>
      // same ring up to rotation/direction
      val r1 = a.ring.dropRight(1); val r2 = b.ring.dropRight(1)
      r1.length == r2.length && (r1.indices.exists(k =>
        r1.drop(k) ++ r1.take(k) == r2) || r1.indices.exists(k =>
        (r1.drop(k) ++ r1.take(k)).reverse == r2))
    case _ => false
  }

  /** covers: every point of g2 is in g1 (boundary included). */
  def covers(g1: Geom, g2: Geom): Boolean = (g1, g2) match {
    case (a: Pt, b: Pt) => a == b
    case (poly: Poly, p: Pt) => locate(p, poly) >= 0
    case (poly: Poly, l: Line) => l.pts.forall(p => locate(p, poly) >= 0)
    case (p1: Poly, p2: Poly) =>
      p2.ring.forall(p => locate(p, p1) >= 0)
    case (l: Line, p: Pt) => intersects(p, l)
    case _ => false
  }

  /** contains: covers, and g2 is not confined to g1's boundary. For a
    * covered non-degenerate polygon the interiors always intersect, so
    * poly⊇poly reduces to covers; for lines the vertex and edge-midpoint
    * samples detect a chord that only touches the boundary at its ends. */
  def contains(g1: Geom, g2: Geom): Boolean = (g1, g2) match {
    case (poly: Poly, p: Pt) => locate(p, poly) == 1
    case (poly: Poly, l: Line) =>
      covers(poly, l) && (l.pts.exists(p => locate(p, poly) == 1) ||
        lineEdges(l).exists { case (a, b) =>
          locate(Pt((a.x + b.x) / 2, (a.y + b.y) / 2), poly) == 1 })
    case (p1: Poly, p2: Poly) => covers(p1, p2)
    case (a, b) => covers(a, b) && geomEquals(a, b)
  }

  /** containsproperly: g2 entirely in g1's interior. */
  def containsProperly(g1: Geom, g2: Geom): Boolean = (g1, g2) match {
    case (poly: Poly, p: Pt) => locate(p, poly) == 1
    case (poly: Poly, l: Line) => l.pts.forall(p => locate(p, poly) == 1)
    case (p1: Poly, p2: Poly) => p2.ring.forall(p => locate(p, p1) == 1)
    case _ => false
  }

  /** touches: boundaries meet, interiors do not. */
  def touches(g1: Geom, g2: Geom): Boolean = (g1, g2) match {
    case (p: Pt, poly: Poly) => locate(p, poly) == 0
    case (poly: Poly, p: Pt) => locate(p, poly) == 0
    case (p: Pt, l: Line) => p == l.pts.head || p == l.pts.last
    case (l: Line, p: Pt) => touches(p, l)
    case _ => intersects(g1, g2) && !contains(g1, g2) && !contains(g2, g1) &&
      !crossesInterior(g1, g2)
  }

  private def crossesInterior(g1: Geom, g2: Geom): Boolean = (g1, g2) match {
    case (poly: Poly, l: Line) => l.pts.exists(p => locate(p, poly) == 1)
    case (l: Line, poly: Poly) => l.pts.exists(p => locate(p, poly) == 1)
    case (p1: Poly, p2: Poly) =>
      p2.ring.exists(p => locate(p, p1) == 1) ||
        p1.ring.exists(p => locate(p, p2) == 1)
    case _ => false
  }

  // ------------------------------------------------------------------
  // Column-level API (UDFs; geometry is niche enough that codegen'd
  // expressions buy nothing here)
  // ------------------------------------------------------------------

  private def binPred(f: (Geom, Geom) => Boolean) =
    udf((a: String, b: String) =>
      (parse(a), parse(b)) match {
        case (Some(x), Some(y)) => Some(f(x, y))
        case _ => None
      })

  val stGeomFromText = udf((s: String) => parse(s).map(asText))
  val stAsText = udf((s: String) => parse(s).map(asText))
  val stMakePoint = udf((x: Double, y: Double) => asText(Pt(x, y)))
  val stIntersects = binPred(intersects)
  val stEquals = binPred(geomEquals)
  val stTouches = binPred(touches)
  val stCovers = binPred(covers)
  val stContains = binPred(contains)
  val stContainsProperly = binPred(containsProperly)

  def st_makepoint(x: Column, y: Column): Column = stMakePoint(x, y)
  def st_contains(a: Column, b: Column): Column = stContains(a, b)
  def st_covers(a: Column, b: Column): Column = stCovers(a, b)
  def st_intersects(a: Column, b: Column): Column = stIntersects(a, b)
  def st_touches(a: Column, b: Column): Column = stTouches(a, b)
  def st_equals(a: Column, b: Column): Column = stEquals(a, b)
}
