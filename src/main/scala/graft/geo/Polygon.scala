package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** In-row polygon measures over CLOSED integer vertex arrays (first
  * vertex repeated last) — the zonal-geometry census primitives: exact
  * shoelace area and the centroid numerators, all in 64-bit integer
  * arithmetic (the only floats are the caller's final divisions).
  *
  * Everything is a higher-order `aggregate` over the ring — map-only,
  * no explode, no shuffle: a billion polygons cost one projection.
  * Works on any winding; CCW rings give positive area2.
  */
object Polygon {

  /** 2x the signed shoelace area: sum of x_i*y_{i+1} - x_{i+1}*y_i over
    * the closed ring. Exact in BIGINT for coordinates up to ~2^31. */
  def area2(xs: Column, ys: Column): Column =
    aggregate(sequence(lit(1), size(xs) - 1), lit(0L),
      (acc, i) => acc
        + element_at(xs, i) * element_at(ys, i + 1)
        - element_at(xs, i + 1) * element_at(ys, i))

  /** Centroid numerator along `a`: sum of (a_i + a_{i+1}) * cross_i;
    * centroid_a = numerator / (3 * area2) — the caller divides once. */
  def centroidNum(a: Column, xs: Column, ys: Column): Column =
    aggregate(sequence(lit(1), size(xs) - 1), lit(0L),
      (acc, i) => acc
        + (element_at(a, i) + element_at(a, i + 1))
        * (element_at(xs, i) * element_at(ys, i + 1)
          - element_at(xs, i + 1) * element_at(ys, i)))

  /** Sum of squared edge lengths of the closed ring — the exact-integer
    * perimeter proxy (no sqrt, no float). */
  def edgeLen2Sum(xs: Column, ys: Column): Column =
    aggregate(sequence(lit(1), size(xs) - 1), lit(0L),
      (acc, i) => {
        val dx = element_at(xs, i + 1) - element_at(xs, i)
        val dy = element_at(ys, i + 1) - element_at(ys, i)
        acc + dx * dx + dy * dy
      })
}
