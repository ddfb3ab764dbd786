package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Grid-bucketed spatial self-join: all point pairs within distance `r`,
 * found WITHOUT a cartesian product — the planar analogue of the LSH
 * band trick (d04) and the pigeonhole bands (m04): bucket points into
 * r-sized grid cells, and any pair within r is guaranteed to sit in
 * the SAME or ADJACENT cells, so candidates are an equi-join on cell
 * keys and the exact distance check runs on candidates only. Cost is
 * sum-over-cells of |cell| x |neighborhood|, bounded by point density
 * — never |P|^2. The shape behind proximity dedup of addresses
 * (duplicate listings at the same RD coordinates), store-catchment
 * overlap, and sensor co-location.
 *
 * Pair uniqueness by construction (no dedup pass): the LEFT side
 * explodes each point into its 9-cell neighborhood, the RIGHT side
 * keeps the point's own cell, so pair (A, B) surfaces exactly once per
 * direction; the `id_a < id_b` filter keeps one direction. Integer
 * arithmetic throughout — dist2 = dx^2 + dy^2 is exact, no floats
 * cross the result.
 */
object SpatialJoin {

  /** Pairs (id_a, id_b, dist2) with dist2 <= r*r, id_a < id_b.
    * `points` needs (id, x, y) as BIGINT-compatible columns; x and y
    * must be non-negative (grid cells use floor division). */
  def withinDistance(points: DataFrame, id: String, x: String, y: String,
                     r: Long): DataFrame = {
    require(r >= 1, s"radius must be >= 1, got $r")
    val p = points.select(col(id).cast("long").as("__id"),
      col(x).cast("long").as("__x"), col(y).cast("long").as("__y"))
    val withCell = p
      .withColumn("__cx", expr(s"__x div $r"))
      .withColumn("__cy", expr(s"__y div $r"))
    val right = withCell.select(
      col("__id").as("id_b"), col("__x").as("__xb"), col("__y").as("__yb"),
      col("__cx").as("__ncx"), col("__cy").as("__ncy"))
    val neighborhood = withCell.select(
      col("__id").as("id_a"), col("__x").as("__xa"), col("__y").as("__ya"),
      explode(expr(
        "transform(sequence(0, 8), i -> struct(__cx + i div 3 - 1 as cx, __cy + i % 3 - 1 as cy))"))
        .as("__nc"))
      .select(col("id_a"), col("__xa"), col("__ya"),
        col("__nc.cx").as("__ncx"), col("__nc.cy").as("__ncy"))
    neighborhood.join(right, Seq("__ncx", "__ncy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__dx", col("__xa") - col("__xb"))
      .withColumn("__dy", col("__ya") - col("__yb"))
      .withColumn("dist2", col("__dx") * col("__dx") + col("__dy") * col("__dy"))
      .filter(col("dist2") <= r * r)
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
