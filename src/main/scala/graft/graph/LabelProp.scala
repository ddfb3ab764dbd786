package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Synchronous label-propagation community detection (Raghavan, Albert &
 * Kumara 2007) — the near-linear community finder of the graph family:
 * PageRank/TrustRank score nodes, the components closure finds CONNECTED
 * clusters, but spam farms and mirror networks live INSIDE well-connected
 * components; LPA's majority-vote dynamics carve those into densely
 * intra-linked communities without a modularity optimization pass.
 *
 * Deterministic variant (the async coin-flip original is run-dependent):
 * every node starts labeled with its own id; each SYNCHRONOUS round
 * relabels every node with the most frequent label among its in-neighbors
 * from the PREVIOUS round, ties to the smallest label, isolated nodes
 * keeping their label. Fixed `iters` rounds — the x16 fixed-iteration
 * discipline, so reruns and engines agree exactly; labels are node ids
 * (integers) end to end, nothing floating anywhere.
 *
 * Scale shape per round: one edge equi-join on src (the loop-invariant
 * edge side — serve it from a [[PageRank.buildEdgeLayout]] bucketed store
 * and it never shuffles), one partial-aggregated (node, label) vote
 * count, and the vote argmax through the native `arg_max`
 * ObjectHashAggregate on the (cnt, -label) composite — one winner row
 * per node crosses the shuffle, never a per-node sort. The label frame
 * is O(V) and each round's plan is cut at a localCheckpoint (the
 * components-loop discipline).
 */
object LabelProp {

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // the edge list is loop-invariant and its upstream derivation (JSON
    // extraction, explode, distinct) would otherwise re-run every round:
    // cut it to stored blocks once (the x40 loop-invariant lesson), and
    // the count that sizes the loop's shuffles (graft.LoopConf) reads the
    // stored blocks for free
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val edgeRows = e.count()
    graft.LoopConf.scoped(edges.sparkSession, edgeRows) {
      var labels = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .withColumn("label", col("node"))
        .localCheckpoint(true)
      for (_ <- 1 to iters) {
        val votes = e.join(labels.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        // (cnt, -label) is unique per node (one vote row per label), so the
        // arg_max determinism contract holds; max == (cnt DESC, label ASC)
        val winners = votes.groupBy("node")
          .agg(graft.functions.VectorAggregates.argMax(
            struct(col("cnt"), -col("label")), col("label")).as("new_label"))
        labels = labels.join(winners, Seq("node"), "left")
          .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
          .localCheckpoint(true)
      }
      labels
    }
  }
}
