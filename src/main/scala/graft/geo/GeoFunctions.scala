package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Spark Column bindings for the geo kernel.
 *
 * These are deterministic scalar UDFs (asNondeterministic is NOT set), so
 * Catalyst can still prune columns, push independent filters, and reorder
 * around them. The polynomial is ~25 fused multiply-adds on two doubles —
 * UDF call overhead is acceptable at ~10M rows (SURVEY.md §7.2); revisit as
 * a codegen'd Expression only if the bench demands it.
 */
object GeoFunctions {

  /** (rd_x, rd_y) -> struct(latitude, longitude). Null-safe. */
  private val rdToWgs84Udf = udf { (x: java.lang.Double, y: java.lang.Double) =>
    if (x == null || y == null) None
    else {
      val (lat, lon) = Rijksdriehoek.rdToWgs84(x, y)
      Some((lat, lon))
    }
  }

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

  def rdToWgs84(x: Column, y: Column): Column =
    rdToWgs84Udf(x, y).cast("struct<latitude:double,longitude:double>")

  def posToRd(pos: Column): Column =
    posToRdUdf(pos).cast("struct<rd_x:double,rd_y:double>")

  def firstVertex(rings: Column): Column =
    firstVertexUdf(rings).cast("struct<rd_x:double,rd_y:double>")

  def ringsToWgs84GeoJson(rings: Column, is3d: Column): Column =
    ringsToGeoJsonUdf(rings, is3d)
}
