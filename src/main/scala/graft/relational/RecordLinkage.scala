package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked record linkage (entity resolution across two tables with NO
 * shared key — the Fellegi-Sunter shape): candidate pairs are generated
 * ONLY inside blocks (equi-joins on derived blocking keys), then scored
 * and resolved downstream. The whole point at 100 TB is what this
 * operator never does: no cartesian, no all-pairs — cost is
 * sum-over-blocks |L_b| x |R_b|, bounded by the block-size cap.
 *
 * Multi-pass blocking: each pass is a (leftKeyExpr, rightKeyExpr) pair;
 * a record pair is a candidate if ANY pass co-blocks it. Passes are
 * chosen with DIFFERENT failure modes (e.g. a brand+size bucket pass
 * survives name typos, a name-prefix pass survives size drift), so the
 * union's recall beats any single key — the standard answer to "dirty
 * data breaks my blocking key".
 *
 * Hub guard: a block larger than `maxBlockSize` on EITHER side is
 * dropped for that pass (the d03 df-cap discipline) — oversized blocks
 * are low-information ("red |15" matches everything red) and quadratic;
 * real links they carry are recovered by the other passes. The over-cap
 * key set is aggregation-sized and broadcast, so the guard itself never
 * shuffles the corpus.
 */
object RecordLinkage {

  /** Distinct candidate (leftId, rightId) pairs across all passes.
    * Null blocking keys never co-block (equi-join semantics) — a record
    * with an unparseable key simply sits out that pass. */
  def candidates(left: DataFrame, leftId: String,
                 right: DataFrame, rightId: String,
                 passes: Seq[(Column, Column)],
                 maxBlockSize: Int = 1000): DataFrame = {
    require(passes.nonEmpty, "need at least one blocking pass")
    val perPass = passes.map { case (lk, rk) =>
      val l = left.select(col(leftId), lk.as("__bk")).filter(col("__bk").isNotNull)
      val r = right.select(col(rightId), rk.as("__bk")).filter(col("__bk").isNotNull)
      def overCap(side: DataFrame) = side.groupBy("__bk")
        .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBlockSize)
        .select("__bk")
      val big = overCap(l).unionByName(overCap(r)).distinct()
      l.join(broadcast(big), Seq("__bk"), "left_anti")
        .join(r.join(broadcast(big), Seq("__bk"), "left_anti"), Seq("__bk"))
        .select(col(leftId), col(rightId))
    }
    perPass.reduce(_ unionByName _).distinct()
  }

  /** Survivorship (golden-record merge) — the step AFTER linkage: once
    * records are clustered under an entity id, elect ONE value per
    * field under per-field policies (the MDM playbook):
    *
    *   - `longestCols`: longest NON-NULL value wins, ties to the
    *     lexicographically smallest — completeness proxy for names
    *     (a null version never out-elects a non-null candidate; an
    *     all-null field yields NULL).
    *   - `lastNonNullCols`: the most recent NON-NULL value by `ts`
    *     wins — freshness without letting a null clobber data.
    *   - `majorityCols`: most frequent NON-NULL value wins, ties to the
    *     smallest — consensus for categorical fields.
    *
    * Every election is a deterministic arg-min/arg-max over a struct
    * ordering (value-at-rank, tie-order-independent — the k02/u02
    * discipline): one hash aggregate per entity for the in-row
    * policies plus one (entity, value) fold per majority column, all
    * map-side-combinable; majority results join back entity-keyed.
    * Never a window over the record space, never a sort. */
  def survivorship(records: DataFrame, entity: String, ts: String,
                   longestCols: Seq[String], lastNonNullCols: Seq[String],
                   majorityCols: Seq[String]): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("n_versions"), max(col(ts)).as("ts_latest")) ++
      longestCols.map(c =>
        min(when(col(c).isNotNull,
            struct((-length(col(c))).as("nl"), col(c).as("v"))))
          .getField("v").as(s"${c}_golden")) ++
      lastNonNullCols.map(c =>
        max(when(col(c).isNotNull,
            struct(col(ts).as("t"), col(c).as("v"))))
          .getField("v").as(s"${c}_golden"))
    val base = records.groupBy(col(entity))
      .agg(aggs.head, aggs.tail: _*)
    majorityCols.foldLeft(base) { (acc, c) =>
      val vote = records.filter(col(c).isNotNull)
        .groupBy(col(entity), col(c))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col(entity))
        .agg(min(struct((-col("__n")).as("nn"), col(c).as("v")))
          .getField("v").as(s"${c}_golden"))
      acc.join(vote, Seq(entity), "left")
    }
  }
}
