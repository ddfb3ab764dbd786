package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Spark Column bindings for the geo kernel.
 *
 * The geometry-string parsers are deterministic scalar UDFs
 * (asNondeterministic is NOT set), so Catalyst can still prune columns,
 * push independent filters, and reorder around them. The RD->WGS84
 * polynomial itself runs through native codegen'd expressions
 * ([[graft.functions.GeoExpressions]]) — no boxed struct per row.
 */
object GeoFunctions {

  /** "x y [z]" -> struct(rd_x, rd_y). Null/blank-safe. */
  private val posToRdUdf = udf { (pos: String) => Geometry.posToRd(pos) }

  /** first vertex of posList rings -> struct(rd_x, rd_y). */
  private val firstVertexUdf = udf { (rings: Seq[String]) =>
    if (rings == null) None else Geometry.firstVertex(rings)
  }

  /** posList rings -> GeoJSON-ish WGS84 string ('' for empty). */
  private val ringsToGeoJsonUdf = udf { (rings: Seq[String], is3d: Boolean) =>
    if (rings == null) "" else Geometry.ringsToWgs84GeoJson(rings, is3d)
  }

  /** (rd_x, rd_y) -> struct(latitude, longitude). Null inputs yield null
    * fields (the UDF form this replaces yielded a null struct — every
    * consumer reads `.latitude`/`.longitude`, identical either way). */
  def rdToWgs84(x: Column, y: Column): Column =
    graft.functions.GeoExpressions.rdToWgs84Struct(x, y)

  def posToRd(pos: Column): Column =
    posToRdUdf(pos).cast("struct<rd_x:double,rd_y:double>")

  def firstVertex(rings: Column): Column =
    firstVertexUdf(rings).cast("struct<rd_x:double,rd_y:double>")

  def ringsToWgs84GeoJson(rings: Column, is3d: Column): Column =
    ringsToGeoJsonUdf(rings, is3d)
}
