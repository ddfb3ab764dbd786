package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank: hand-computed star-graph golden + determinism. */
class GraphSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graph-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edgesDf(e: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    e.toDF("src", "dst")
  }

  test("pageRankFixed: star-graph golden after one integer round") {
    // undirected star 1 - {2, 3}: deg(1)=2, deg(2)=deg(3)=1. With S=10^12:
    //   r1(center) = 0.15S + 85*(S + S) div 100          = 1_850_000_000_000
    //   r1(leaf)   = 0.15S + 85*(S div 2) div 100        =   575_000_000_000
    // and total mass stays 3S exactly (no dangling, integer divs exact here).
    val e = edgesDf(Seq(1L -> 2L, 1L -> 3L, 2L -> 1L, 3L -> 1L))
    val r = PageRank.pageRankFixed(e, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === 1850000000000L)
    assert(r(2L) === 575000000000L)
    assert(r(3L) === 575000000000L)
    assert(r.values.sum === 3000000000000L)
  }

  test("pageRankFixed: ranks are identical across reruns and asymmetry ranks the hub first") {
    // ASYMMETRIC graph (a symmetric one makes every rank equal and any
    // mass-conserving bug passes): undirected star 1 - {2, 3, 4} plus a
    // tail 4 - 5. Node 1 is the hub; node 5 is the most peripheral.
    val e = edgesDf(Seq(
      1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L,
      1L -> 4L, 4L -> 1L, 4L -> 5L, 5L -> 4L))
    val a = PageRank.pageRankFixed(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.pageRankFixed(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a === b, "integer PageRank must be bit-identical across reruns")
    // strict ordering: hub above every leaf, bridge (4) above the tail (5),
    // and the symmetric leaves 2/3 exactly equal
    assert(a(1L) > a(4L), s"hub must outrank the bridge: $a")
    assert(a(4L) > a(5L), s"bridge must outrank the tail: $a")
    assert(a(1L) > a(2L) && a(2L) === a(3L), s"leaves symmetric, below hub: $a")
  }
}
