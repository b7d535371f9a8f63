package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geometry
import graft.functions.Geometry._

class GeometrySpec extends AnyFunSuite {

  private val square = parse("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))").get
  private val tri = parse("POLYGON ((2 2, 6 2, 4 6, 2 2))").get

  test("WKT round-trips and normalizes") {
    assert(asText(parse("POINT (3 4)").get) == "POINT (3 4)")
    assert(asText(parse("point(3.5 -4)").get) == "POINT (3.5 -4)")
    assert(asText(parse("LINESTRING (0 0, 1 1, 2 0)").get) ==
      "LINESTRING (0 0, 1 1, 2 0)")
    // unclosed ring gets closed
    assert(asText(parse("POLYGON ((0 0, 4 0, 4 4, 0 4))").get) ==
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(parse("GARBAGE (1 2)").isEmpty)
  }

  test("point-in-polygon: interior, boundary, exterior; concave ring") {
    assert(locate(Pt(5, 5), square.asInstanceOf[Poly]) == 1)
    assert(locate(Pt(0, 5), square.asInstanceOf[Poly]) == 0)
    assert(locate(Pt(11, 5), square.asInstanceOf[Poly]) == -1)
    val concave = parse(
      "POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))").get.asInstanceOf[Poly]
    assert(locate(Pt(5, 8), concave) == -1) // inside the notch
    assert(locate(Pt(5, 2), concave) == 1)
  }

  test("contains vs covers vs touches boundary semantics") {
    val onEdge = Pt(10, 4)
    assert(!contains(square, onEdge))
    assert(covers(square, onEdge))
    assert(touches(onEdge, square))
    assert(contains(square, Pt(1, 1)))
    assert(containsProperly(square, tri))
    assert(contains(square, square) && !containsProperly(square, square))
  }

  test("intersects across type combinations") {
    val l = parse("LINESTRING (-5 5, 15 5)").get
    assert(intersects(l, square))
    assert(intersects(square, tri))
    assert(!intersects(parse("POINT (20 20)").get, square))
    assert(intersects(parse("LINESTRING (0 0, 2 2)").get,
      parse("LINESTRING (0 2, 2 0)").get))
    assert(!intersects(parse("LINESTRING (0 0, 1 0)").get,
      parse("LINESTRING (0 1, 1 1)").get))
  }

  test("equals is rotation/direction tolerant for rings") {
    val r1 = parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))").get
    val r2 = parse("POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))").get
    val r3 = parse("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))").get
    assert(geomEquals(r1, r2) && geomEquals(r1, r3))
    assert(!geomEquals(r1, tri))
  }
}
