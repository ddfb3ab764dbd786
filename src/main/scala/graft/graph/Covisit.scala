package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Co-visitation similarity graph + triangle counting — the two-step
 * graph-structure signal of corpus curation: first project a bipartite
 * incidence (user x page, crawl x domain, doc x shingle...) onto a
 * similarity graph over one side, then read local clustering structure
 * (triangle participation) off it. Dense triangle neighborhoods are the
 * classic link-farm / mirror-cluster detector; the same two ops are the
 * backbone of item-item collaborative filtering.
 *
 * Scale shape, pair generation ([[jaccardEdges]]): candidate pairs are
 * generated KEYED ON THE SHARED ENTITY (one equi self-join on `u`), so
 * cost is sum over users of C(fanout, 2) — bounded by real-world per-user
 * activity, never |pages|^2 (the DIMSUM/item-item-CF discipline). The
 * per-page set sizes ride in as a broadcast aggregate (one row per page —
 * the small side by construction), and the Jaccard threshold is evaluated
 * as an INTEGER cross-multiplication (`den * inter >= num * union`): no
 * float enters the edge decision, so engines and reruns agree exactly.
 *
 * Scale shape, triangles ([[triangleCounts]]): edges are ORIENTED from
 * the lower (degree, id) endpoint to the higher — the classic
 * arboricity-bounded enumeration (Chiba–Nishizeki; Suri & Vassilvitskii's
 * MR formulation): every triangle then has exactly ONE node with two
 * out-edges, so wedges (two out-edges of one node, deduped by id order)
 * enumerate each triangle once, and max out-degree is O(sqrt(|E|))
 * regardless of raw hub degrees — a hub's edges all point IN (its
 * neighbors have lower degree), so the hub that would explode the naive
 * wedge join generates no wedges at all; the quadratic hot key vanishes
 * by construction instead of needing a salt.
 * Both the wedge join and the closure check are equi-joins (on the
 * 8-byte src id and the canonical (a, b) pair); nothing in either op is
 * a cartesian or a window sort.
 */
object Covisit {

  /** Session-tracked MEMORY_AND_DISK materialization (the Dedup
    * discipline): eager, and released by the Verify/Bench harness after
    * each query so storage never accumulates across a run. */
  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    graft.SessionResources.trackPersisted(p)
  }

  /**
   * Project a distinct bipartite incidence `(u, p)` onto the `p` side:
   * edges `(p1, p2, inter, uni)` with `p1 < p2` for every pair whose
   * exact Jaccard overlap `inter / uni >= tauNum / tauDen`.
   *
   * `maxFanout` is the hub guard — the d03 postings-cap discipline
   * applied to the shared-entity key: a user touching f pages generates
   * C(f, 2) pair rows, so one 10^6-page crawler bot would emit 5*10^11
   * rows into the pair join. With `maxFanout > 0`, CANDIDATE generation
   * sees only a deterministic md5-ranked sample of each over-cap user's
   * pages, and surviving candidates are then scored EXACTLY against the
   * full incidence (a candidate-bounded semi-join recount — same split
   * as d03: the cap prunes candidates, never the score). The one
   * semantic edge mirrors d03's: a pair co-visited ONLY by capped-out
   * hub slots loses its candidate (reachable through any other shared
   * user). `maxFanout = 0` (default, and the registered query's form)
   * is exact end to end.
   */
  /** r13 A/B variant of [[jaccardEdges]] pair generation: instead of the
    * equi self-join on `u` (two sorted sides + SortMergeJoin + the full
    * C(fanout,2) pair-row stream into the partial agg), group each user's
    * page set into ONE row (sort_array(collect_list)) and emit its ordered
    * pairs in-row. Same C(f,2) arithmetic cost and the same exchange count
    * (one by u, one by (p1,p2)) — what it deletes is the SMJ's two sorts
    * and the join machinery. Pair multiset is identical by construction:
    * `up` is distinct, so each user's pages are unique and the emitted
    * (min, max) pairs don't depend on collect order once sorted. */
  private[graft] def jaccardEdgesEmit(incidence: DataFrame, tauNum: Long,
                                      tauDen: Long): DataFrame = {
    require(tauNum >= 0 && tauDen > 0, "threshold must be a non-negative rational")
    val up = materialized(
      incidence.select(col("u"), col("p").cast("long").as("p")).distinct())
    val pairs = up.groupBy("u")
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x, y))))")).as("pr"))
      .select(col("pr.x").as("p1"), col("pr.y").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("inter"))
    val sizes = up.groupBy(col("p")).agg(count(lit(1)).as("c"))
    pairs
      .join(broadcast(sizes.select(col("p").as("p1"), col("c").as("c1"))), Seq("p1"))
      .join(broadcast(sizes.select(col("p").as("p2"), col("c").as("c2"))), Seq("p2"))
      .withColumn("uni", col("c1") + col("c2") - col("inter"))
      .filter(lit(tauDen) * col("inter") >= lit(tauNum) * col("uni"))
      .select("p1", "p2", "inter", "uni")
  }

  def jaccardEdges(incidence: DataFrame, tauNum: Long, tauDen: Long,
                   maxFanout: Int = 0): DataFrame = {
    require(tauNum >= 0 && tauDen > 0, "threshold must be a non-negative rational")
    // the deduped incidence feeds THREE subtrees (both pair-join sides +
    // the size aggregate): materialize it once — ReuseExchange covers the
    // twin join sides, but the size branch would otherwise re-derive from
    // a second source scan (the d03 shingle-table lesson)
    val up = materialized(
      incidence.select(col("u"), col("p").cast("long").as("p")).distinct())
    val genSide =
      if (maxFanout <= 0) up
      else up
        .groupBy(col("u"))
        .agg(graft.functions.VectorAggregates.topK(
          -conv(substring(md5(concat(col("u"), lit(":"), col("p"))), 1, 8), 16, 10)
            .cast("double"),
          col("p"), maxFanout).as("top"))
        .select(col("u"), explode(col("top")).as("t"))
        .select(col("u"), col("t.id").as("p"))
    val pairs0 = genSide.select(col("u"), col("p").as("p1"))
      .join(genSide.select(col("u"), col("p").as("p2")), Seq("u"))
      .filter(col("p1") < col("p2"))
    val pairs =
      if (maxFanout <= 0)
        pairs0.groupBy("p1", "p2").agg(count(lit(1)).as("inter"))
      else {
        // exact recount over the FULL incidence, candidate-bounded: each
        // candidate fans out to p1's true user set, then a semi-join
        // keeps the users also on p2 — |cand| x |p1| rows, never C(f,2)
        val cand = pairs0.select("p1", "p2").distinct()
        cand.join(up.select(col("p").as("p1"), col("u")), Seq("p1"))
          .join(up.select(col("p").as("p2"), col("u")), Seq("p2", "u"), "left_semi")
          .groupBy("p1", "p2").agg(count(lit(1)).as("inter"))
      }
    val sizes = up.groupBy(col("p")).agg(count(lit(1)).as("c"))
    pairs
      .join(broadcast(sizes.select(col("p").as("p1"), col("c").as("c1"))), Seq("p1"))
      .join(broadcast(sizes.select(col("p").as("p2"), col("c").as("c2"))), Seq("p2"))
      .withColumn("uni", col("c1") + col("c2") - col("inter"))
      .filter(lit(tauDen) * col("inter") >= lit(tauNum) * col("uni"))
      .select("p1", "p2", "inter", "uni")
  }

  /**
   * k-core decomposition by iterative peeling (Seidman 1983; the
   * Batagelj–Zaveršnik peel expressed as a dataflow fixpoint): repeatedly
   * drop nodes with degree < k until none remain — the surviving maximal
   * subgraph where EVERY node keeps >= k neighbors. The dense-core signal
   * of corpus curation: link farms and mirror clusters live in high
   * cores, and "in the k-core" is a robustness statement no raw degree
   * threshold gives (a hub wired to leaves has high degree and no core).
   *
   * Scale shape: each round is one partial-aggregated degree count plus
   * two LEFT SEMI equi-joins (edges whose BOTH endpoints survive) — no
   * window, no cartesian; the edge set shrinks monotonically, each
   * round's state is cut to a stored block (eager localCheckpoint, the
   * BFS loop discipline), and the convergence probe doubles as the
   * materializing action. Rounds are bounded by the peel depth (small in
   * practice — single digits even on web graphs at fixed k).
   *
   * Input: canonical `(p1, p2)` edges with `p1 < p2`. Output:
   * `(node, core_deg)` for k-core members, `core_deg` the within-core
   * degree (>= k by construction).
   */
  /** `peelsPerRound`: peel passes fused into each materialized round —
    * the peel is confluent (removing sub-k nodes in any grouping reaches
    * the same fixpoint), so fusing k passes between lineage cuts halves+
    * the barrier count (the r12 probe measured these loops
    * scheduling-bound at bench scale; on a cluster each barrier is a
    * full synchronization round trip) at the cost of at most one wasted
    * in-plan pass after convergence. */
  def kCore(edges: DataFrame, k: Int, peelsPerRound: Int = 1): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(peelsPerRound >= 1, "peelsPerRound must be >= 1")
    var e = edges.select(col("p1").cast("long").as("a"), col("p2").cast("long").as("b"))
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("d"))
      .select(col("d.src").as("src"), col("d.dst").as("dst"))
      .localCheckpoint(true)
    var n = e.count()
    var converged = n == 0L
    // the peel is a many-round loop over monotonically shrinking state:
    // size its shuffles once from the edge count (graft.LoopConf)
    graft.LoopConf.scoped(edges.sparkSession, n) {
      while (!converged) {
        var cur = e
        for (_ <- 1 to peelsPerRound) {
          val keep = cur.groupBy("src").agg(count(lit(1)).as("d"))
            .filter(col("d") >= k).select(col("src").as("node"))
          cur = cur
            .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
            .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        }
        // r13: lazy — the convergence count materializes the blocks
        val e2 = cur.localCheckpoint(false)
        val n2 = e2.count()
        converged = n2 == n || n2 == 0L
        e = e2
        n = n2
      }
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /**
   * k-TRUSS decomposition (Cohen 2008) — the edge-level sibling of
   * [[kCore]] and the stronger dense-subgraph signal: an edge survives
   * iff it participates in >= k-2 triangles among surviving edges,
   * iterated to fixpoint. A k-core can be a sparse star-of-stars; a
   * k-truss demands every EDGE be triangle-reinforced, which is the
   * mutual-corroboration structure of real communities and the tell of
   * ring-wired link farms. Per round: one triangle enumeration over the
   * SHRINKING canonical edge set (the degree-ordered orientation of
   * [[triangleCounts]] — hubs generate zero wedges, both stages
   * equi-joins), one per-edge support count with map-side partials, one
   * filter; monotone edge removal guarantees termination,
   * localCheckpoint cuts each round's lineage, and the convergence
   * count doubles as the materializing action. Output: surviving edges
   * (p1 < p2) with their within-truss support.
   */
  def kTruss(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3 (support threshold k-2 >= 1)")
    var e = edges.select(col("p1").cast("long").as("a"), col("p2").cast("long").as("b"))
      .distinct().localCheckpoint(true)
    var n = e.count()
    var converged = n == 0L
    // NOT LoopConf-scoped (unlike kCore/SCC/BFS): each round's triangle
    // enumeration is real compute (the wedge join), which wants AQE's
    // dynamic post-shuffle sizing — an edge-count-derived constant
    // under-parallelizes the wedge stage (r12 probe: scoping cost +0.8 s)
    //
    // r13: each round CHECKPOINTS its support frame, and the terminal
    // round's support IS the final answer — convergence via n2 == n means
    // every edge of e passed `support >= k-2`, so `sup` (computed over
    // exactly that e) is complete for the survivors. The r12 form ended
    // with `e.join(edgeSupport(e), ...)`, paying one full extra triangle
    // enumeration after the fixpoint (~1/(rounds+1) of the query).
    // The loop's e is already a localCheckpoint, so edgeSupport skips its
    // persist+count round trip (materializeInput = false).
    var sup: DataFrame = null
    while (!converged) {
      // r13: lazy — e2's count materializes BOTH checkpoints in one job
      sup = edgeSupport(e, materializeInput = false).localCheckpoint(false)
      val e2 = e.join(sup.filter(col("support") >= k - 2), Seq("a", "b"), "left_semi")
        .localCheckpoint(false)
      val n2 = e2.count()
      converged = n2 == n || n2 == 0L
      e = e2
      n = n2
    }
    if (sup == null) // empty input graph: no support was ever computed
      e.select(col("a").as("p1"), col("b").as("p2"), lit(0L).as("support"))
    else
      e.join(sup, Seq("a", "b"), "left")
        .select(col("a").as("p1"), col("b").as("p2"),
          coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Per-edge triangle support over a canonical (a < b) edge list:
    * every triangle credits its three edges once. Same oriented wedge
    * enumeration as [[triangleCounts]], exploded per edge.
    * `materializeInput = false` skips the persist+count when the caller's
    * frame is already materialized (a loop checkpoint): the three subtree
    * reads (degrees, orientation, closure) then re-scan stored blocks
    * instead of paying a per-round cache write + count job. */
  private def edgeSupport(e0: DataFrame,
                          materializeInput: Boolean = true): DataFrame = {
    val e =
      if (materializeInput) materialized(e0.select(col("a"), col("b")))
      else e0.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"))
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), Seq("src"))
      .filter(col("x") < col("y"))
    val tris = wedges.join(e.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
      .select(col("src").as("n1"), col("x").as("n2"), col("y").as("n3"))
    tris.select(explode(array(
        struct(least(col("n1"), col("n2")).as("a"), greatest(col("n1"), col("n2")).as("b")),
        struct(least(col("n1"), col("n3")).as("a"), greatest(col("n1"), col("n3")).as("b")),
        struct(col("n2").as("a"), col("n3").as("b")))).as("t"))
      .select(col("t.a").as("a"), col("t.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
  }

  /**
   * Per-node triangle participation counts over a canonical undirected
   * edge list `(p1, p2)` with `p1 < p2`. Output: `(node, tri_cnt)` for
   * every node in at least one triangle; each triangle contributes 1 to
   * each of its three corners.
   */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // the edge frame feeds degree counting, orientation, AND the closure
    // check — materialize it so an expensive upstream edge derivation
    // (x22's similarity pipeline) runs once, not three times
    val e = materialized(
      edges.select(col("p1").cast("long").as("a"), col("p2").cast("long").as("b")))
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient lower (degree, id) -> higher; a < b canonically, so the
    // id tie-break folds into "<=" on the degrees
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"))
    // wedges: two out-edges of one src, deduped by id order on the tips;
    // the closure check joins the canonical edge list (x < y matches a < b)
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), Seq("src"))
      .filter(col("x") < col("y"))
    val tris = wedges.join(e.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
      .select(col("src").as("n1"), col("x").as("n2"), col("y").as("n3"))
    tris.select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
  }
}
