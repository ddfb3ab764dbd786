package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Strongly connected components of a DIRECTED graph — the web-graph
 * bowtie decomposition (Broder et al. 2000): on a crawl's link graph the
 * giant SCC is the navigable core, IN/OUT tendrils are link farms and
 * dead archives, and per-SCC structure feeds the same quality priors
 * TrustRank consumes. Undirected components (the d07 closure) cannot see
 * this — mutual reachability is a strictly finer equivalence.
 *
 * Algorithm: iterative forward-min coloring + per-root backward reach
 * (the distributed FW-BW-min family, Stergiou-style). Per outer round:
 *
 *  1. COLOR: propagate `color(v) = min(color(u) over ancestors u, v)`
 *     along forward edges to fixpoint. A node with `color(v) = v` is a
 *     ROOT. Exactness: for any root r, SCC(r) is entirely inside r's
 *     color region — an SCC member v with v < r would itself be an
 *     ancestor of r and force color(r) <= v < r; and every ancestor of
 *     an SCC member is an ancestor of r, so no smaller color can leak
 *     in. Any v -> * -> r path from inside the region also stays inside
 *     (each intermediate w has r ->* w ->* r, so w is IN SCC(r)).
 *  2. PEEL: within each color region, backward-reach its root (reached
 *     seeds = the roots; a node joins when an out-neighbor of the SAME
 *     color is reached). The reached set of region r is EXACTLY SCC(r)
 *     by the argument above. ALL roots peel simultaneously — one round
 *     removes one SCC per color region, so rounds = the longest chain
 *     of SCCs hidden behind a smaller-labeled ancestor (O(log n)
 *     expected on random labelings).
 *
 * Scale shape per iteration: one edge equi-join + partial-aggregated
 * min (coloring), one edge equi-join + (node, color) semi-join
 * (reach) — both O(E) with map-side combine; the node frames are O(V)
 * and every round's lineage is cut at a localCheckpoint (the
 * components-loop discipline). Convergence tests are node-frame counts
 * (driver-side scalars, the d07 contract). Emits (node, scc_id =
 * minimum member id, scc_size).
 */
object Scc {

  def stronglyConnected(edges: DataFrame, maxOuterRounds: Int = 25,
                        maxFixpointRounds: Int = 200): DataFrame = {
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    var rem = e0.localCheckpoint(true)
    var nodes = rem.select(col("src").as("node"))
      .union(rem.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var done: DataFrame = null
    var outer = 0
    var remaining = nodes.count()
    while (remaining > 0 && outer < maxOuterRounds) {
      // 1. forward-min coloring to fixpoint
      var colors = nodes.withColumn("color", col("node")).localCheckpoint(true)
      var changed = 1L
      var it = 0
      while (changed > 0 && it < maxFixpointRounds) {
        val prop = rem
          .join(colors.select(col("node").as("src"), col("color").as("c")), "src")
          .groupBy(col("dst").as("node")).agg(min(col("c")).as("pc"))
        val next = colors.join(prop, Seq("node"), "left")
          .select(col("node"),
            least(col("color"), coalesce(col("pc"), col("color"))).as("color"),
            (coalesce(col("pc"), col("color")) < col("color")).as("__chg"))
          .localCheckpoint(true)
        changed = next.filter(col("__chg")).count()
        colors = next.drop("__chg")
        it += 1
      }
      require(changed == 0,
        s"SCC coloring did not converge in $maxFixpointRounds rounds")

      // 2. backward reach from every root, within its color region
      var reached = colors
        .withColumn("r", col("node") === col("color")).localCheckpoint(true)
      changed = 1L
      it = 0
      while (changed > 0 && it < maxFixpointRounds) {
        val hit = rem
          .join(reached.select(col("node").as("dst"), col("color").as("dc"),
            col("r").as("dr")), "dst")
          .filter(col("dr"))
          .select(col("src").as("node"), col("dc").as("color"))
          .distinct()
        val next = reached
          .join(hit.withColumn("__hit", lit(true)), Seq("node", "color"), "left")
          .select(col("node"), col("color"),
            (col("r") || coalesce(col("__hit"), lit(false))).as("r"),
            (!col("r") && coalesce(col("__hit"), lit(false))).as("__chg"))
          .localCheckpoint(true)
        changed = next.filter(col("__chg")).count()
        reached = next.drop("__chg")
        it += 1
      }
      require(changed == 0,
        s"SCC backward reach did not converge in $maxFixpointRounds rounds")

      val members = reached.filter(col("r"))
        .select(col("node"), col("color").as("scc_id")).localCheckpoint(true)
      done = (if (done == null) members else done.union(members))
        .localCheckpoint(true)
      nodes = nodes.join(members.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      rem = rem
        .join(members.select(col("node").as("src")), Seq("src"), "left_anti")
        .join(members.select(col("node").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst").localCheckpoint(true)
      remaining = nodes.count()
      outer += 1
    }
    require(remaining == 0,
      s"SCC peeling exceeded $maxOuterRounds outer rounds")
    val sizes = done.groupBy("scc_id").agg(count(lit(1)).as("scc_size"))
    done.join(sizes, "scc_id").select("node", "scc_id", "scc_size")
  }
}
