package graft.geo

/**
 * GML geometry helpers mirroring the reference's semantics:
 *  - pos "x y [z]" -> representative RD point (reference: utils.py:196-198)
 *  - first vertex of a posList polygon -> representative RD point
 *    (reference: bag_parser.py:137-143)
 *  - GML posList rings -> GeoJSON-style nested [[ [lon,lat], ... ], ...] string,
 *    dropping the z coordinate for 3D (Pand) geometries
 *    (reference: utils.py:172-193, bag_parser.py:57-59)
 *
 * All functions are pure Scala over strings/arrays — usable as Spark UDFs.
 */
object Geometry {

  /** "x y [z]" -> (rd_x, rd_y). Returns null for blank/malformed input. */
  def posToRd(pos: String): Option[(Double, Double)] = {
    if (pos == null) return None
    val parts = pos.trim.split("\\s+")
    if (parts.length < 2) return None
    try {
      val x = parts(0).toDouble
      val y = parts(1).toDouble
      // "NaN"/"Infinity" parse without exception but are malformed input:
      // they would otherwise flow through the polynomial into NaN lat/lon
      // that the `latitude IS NULL` integrity checks can't see
      if (java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y)) Some((x, y))
      else None
    } catch { case _: NumberFormatException => None }
  }

  /**
   * First vertex of the first linear ring -> (rd_x, rd_y).
   * The reference extracts the text between '[' and the 2nd space
   * (bag_parser.py:137-143); semantically that is "first two numbers
   * of the first ring", which is what we implement.
   */
  def firstVertex(rings: Seq[String]): Option[(Double, Double)] =
    rings.headOption.flatMap(r => posToRd(stripBrackets(r)))

  @inline private def stripBrackets(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && (s.charAt(a) == '[' || s.charAt(a).isWhitespace)) a += 1
    while (b > a && (s.charAt(b - 1) == ']' || s.charAt(b - 1).isWhitespace)) b -= 1
    s.substring(a, b)
  }

  /**
   * GML posList rings ("x y x y ..." or "x y z x y z ..." when is3d) ->
   * GeoJSON-ish nested-array string `[[[lon,lat],...],...]` in WGS84.
   * Empty input -> "" (the reference's parse_geometries=False marker stays '').
   */
  def ringsToWgs84GeoJson(rings: Seq[String], is3d: Boolean): String = {
    if (rings == null || rings.isEmpty) return ""
    val stride = if (is3d) 3 else 2
    val sb = new java.lang.StringBuilder(256)
    sb.append('[')
    var ri = 0
    rings.foreach { ring =>
      if (ri > 0) sb.append(", ")
      sb.append('[')
      val parts = stripBrackets(ring).split("\\s+")
      val nVertices = parts.length / stride
      var v = 0
      var emitted = 0
      while (v < nVertices) {
        // Defensive per-vertex parse (ADVICE r1): one malformed posList token
        // must not fail the whole Spark stage — skip the vertex instead
        // (posToRd is equally lenient).
        val x = parseDouble(parts(v * stride))
        val y = parseDouble(parts(v * stride + 1))
        if (!x.isNaN && !y.isNaN) {
          if (emitted > 0) sb.append(", ")
          val (lat, lon) = Rijksdriehoek.rdToWgs84(x, y)
          sb.append('[').append(fmt(lon)).append(", ").append(fmt(lat)).append(']')
          emitted += 1
        }
        v += 1
      }
      sb.append(']')
      ri += 1
    }
    sb.append(']')
    sb.toString
  }

  // Shortest-roundtrip double formatting (Scala's Double.toString), but with
  // integral doubles rendered like JSON numbers ("5.0" not "5").
  @inline private def fmt(d: Double): String = java.lang.Double.toString(d)

  @inline private def parseDouble(s: String): Double =
    try s.toDouble catch { case _: NumberFormatException => Double.NaN }
}
