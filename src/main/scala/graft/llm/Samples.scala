package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable per-stratum uniform samples — the bottom-k-by-hash sketch
 * (the KMV / "k minimum values" construction): every record gets a
 * uniform priority from a keyed hash of its id, and a stratum's sample
 * is its k smallest priorities. Two properties make this THE sample a
 * 100 TB pipeline maintains instead of re-drawing:
 *
 *  - CONSISTENT: the sample is a pure function of the id SET — not of
 *    arrival order, partitioning, or executor count. Re-runs, shuffles
 *    and backfills reproduce it bit-for-bit.
 *  - MERGEABLE: bottomK(A ∪ B) == merge(bottomK(A), bottomK(B)) — the
 *    union-stability that lets a daily batch's k-row-per-stratum sample
 *    fold into the stored sample WITHOUT rescanning the corpus
 *    (append == rebuild, the v11-index discipline applied to
 *    sampling). Priorities ride the sample rows, so merging never
 *    re-hashes.
 *
 * Both stages run on the bounded-heap TopK aggregate (map-side k-row
 * partials, |strata| x k rows ever shuffled — never a window sort over
 * the corpus).
 */
object Samples {

  /** Uniform 32-bit priority from a keyed md5 of the id — deterministic
    * across engines (the DuckDB oracle recomputes it verbatim). */
  def priority(id: Column): Column =
    conv(substring(md5(concat(lit("smp:"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** The k smallest-priority records per stratum:
    * (strat, rnk 1..k, id, pri); ties broken by id ascending (the TopK
    * aggregate's total order). */
  def bottomK(df: DataFrame, strat: String, id: String, k: Int): DataFrame =
    heap(df.select(col(strat), col(id), priority(col(id)).as("pri")),
      strat, id, k)

  /** Fold two bottom-k samples (schema = [[bottomK]] output) into the
    * bottom-k of their union — priorities are reused from the sample
    * rows, never re-hashed. SET semantics: the union dedups by id, so
    * overlapping batches (redelivery, an id present in both the stored
    * sample and the new batch) count once and self-merge is idempotent
    * — without the dedup a record seen twice would occupy two of the k
    * slots and silently shrink the effective sample. The dedup is
    * sample-sized, never corpus-sized. */
  def merge(a: DataFrame, b: DataFrame, strat: String, id: String,
            k: Int): DataFrame =
    heap(a.select(col(strat), col(id), col("pri"))
      .unionByName(b.select(col(strat), col(id), col("pri")))
      .dropDuplicates(strat, id), strat, id, k)

  private def heap(rows: DataFrame, strat: String, id: String,
                   k: Int): DataFrame =
    rows.groupBy(col(strat))
      .agg(graft.functions.VectorAggregates
        .topK((-col("pri")).cast("double"), col(id), k).as("top"))
      .select(col(strat), posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col(strat), (col("rnk0") + 1).cast("long").as("rnk"),
        col("t.id").as(id), (-col("t.ord")).cast("long").as("pri"))
}
