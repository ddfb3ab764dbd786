package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Newman modularity census of a node partition — the "is this
  * clustering real" number for every community assignment the engine
  * produces (label propagation, connected components, domain grouping):
  * Q = sum_c [ L_c/m - (d_c/2m)^2 ], the intra-community edge fraction
  * minus what a degree-preserving random rewire would put there.
  * Q near 0 = the partition explains nothing; Q >> 0 = real structure.
  *
  * Everything rides the directed-both-ways edge representation the
  * graph family already uses (each undirected edge as two rows), so the
  * census needs no halving anywhere: m2 = 2m is the row count,
  * intra2_c = 2*L_c is the intra-row count, deg_sum_c is an exact
  * degree fold. The only float is the final per-community contribution
  * intra2/m2 - (deg_sum/m2)^2, rounded to 6 — the x26 discipline.
  *
  * Scale shape: one degree fold + one intra filter-fold over the edge
  * list (both map-side-combinable hash aggregates), a |C|-row join, and
  * the 1-row m2 frame attached by broadcast — no driver collect, no
  * cartesian, nothing bigger than |C| after the folds.
  */
object Modularity {

  /** Per-community modularity contributions over `und`, a DISTINCT
    * directed-both-ways edge frame (src, dst). `communityOf` maps a
    * node id column to its community id. n_nodes counts nodes with at
    * least one edge (isolated nodes hold no mass in Q).
    */
  def census(und: DataFrame, communityOf: Column => Column): DataFrame = {
    val m2f = und.agg(count(lit(1)).as("m2"))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val dc = deg.groupBy(communityOf(col("id")).as("community"))
      .agg(sum("d").as("deg_sum"), count(lit(1)).as("n_nodes"))
    val ic = und.filter(communityOf(col("src")) === communityOf(col("dst")))
      .groupBy(communityOf(col("src")).as("community"))
      .agg(count(lit(1)).as("intra2"))
    val r = col("deg_sum").cast("double") / col("m2")
    dc.join(ic, Seq("community"), "left")
      .withColumn("intra2", coalesce(col("intra2"), lit(0L)))
      .crossJoin(broadcast(m2f))
      .withColumn("q_contrib",
        round(col("intra2").cast("double") / col("m2") - r * r, 6))
      .select("community", "n_nodes", "intra2", "deg_sum", "m2", "q_contrib")
  }
}
