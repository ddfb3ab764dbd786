package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-source BFS hop distances — the graph-proximity signal of corpus
 * curation (distance from a trusted seed set as a quality prior: link
 * distance from curated domains is the classic web-spam feature), and the
 * third member of the graph family next to PageRank and the component
 * closure.
 *
 * Scale shape: round h equi-joins the (h-1)-FRONTIER — not the full
 * known set — against the edge list on the 8-byte src id, anti-joins the
 * discoveries against the known set, and unions the disjoint remainder
 * in. Per round that is one src equi-join + one node anti-join, the
 * PageRank round shape with a SHRINKING variant side: the edge list is
 * loop-invariant (serve it from the stored bucketed layout via
 * [[bfsIndexed]] and it never shuffles), and the frontier empties when
 * the reachable set saturates, so the loop exits early on diameter <
 * maxHops instead of scheduling dead rounds. Distances are exact hop
 * counts — integers, so reruns and engines agree bit-for-bit (the x16
 * integer-rank discipline for free).
 *
 * Each round's frontier is cut to a stored block with an eager
 * localCheckpoint (the components-loop discipline: a self-growing plan
 * would double per round), and the action that materializes it doubles
 * as the early-exit probe. The known set is the LAZY union of the stored
 * hop blocks — anti-joins read them all, but no round rewrites rows
 * discovered earlier, so total write volume is O(V), not O(V * hops).
 *
 * Output: (node, dist) for every node within maxHops of a seed; seeds
 * report dist 0 whether or not they have edges. Unreached nodes are
 * absent (policy — a "dist = null" totalization is one outer join away).
 */
object Bfs {

  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // one stored block per hop; the known set is their LAZY union, so no
    // round rewrites previously-discovered rows (an O(V)-per-hop write at
    // scale) — per round only the new frontier materializes
    val frontiers = scala.collection.mutable.ArrayBuffer(
      seeds.select(col("node").cast("long").as("node")).distinct()
        .select(col("node"), lit(0L).as("dist"))
        .localCheckpoint(true))
    var h = 1
    var exhausted = frontiers.last.isEmpty
    while (h <= maxHops && !exhausted) {
      val frontier = frontiers.last
      val known = frontiers.map(_.select("node")).reduce(_ union _)
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(known, Seq("node"), "left_anti")
        .select(col("node"), lit(h.toLong).as("dist"))
        .localCheckpoint(true)
      frontiers += next
      exhausted = next.isEmpty
      h += 1
    }
    // hop blocks are pairwise disjoint by the anti-join: plain union,
    // no min-aggregate needed
    frontiers.reduce(_ union _)
  }

  /** BFS served from a [[PageRank.buildEdgeLayout]] layout: the
    * loop-invariant edge side reads the src-bucketed store, so each
    * round shuffles only the frontier. */
  def bfsIndexed(spark: org.apache.spark.sql.SparkSession, name: String,
                 seeds: DataFrame, maxHops: Int): DataFrame =
    bfsDistances(graft.relational.Bucketing.read(spark, s"${name}_edges"),
      seeds, maxHops)
}
