package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * CDC MERGE — apply a change batch (upserts + deletes) to a versioned
 * table, producing the next snapshot. The write-side twin of
 * [[Versioned.changes]]: s22 READS a change feed between two versions,
 * this APPLIES one. Same contract as Delta's `MERGE INTO` with
 * WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT
 * collapsed into the Debezium-style per-row `__op` column — the shape a
 * change batch actually arrives in from a CDC source.
 *
 * Batch contract: the target's key columns + its payload columns +
 * `__op` in ('upsert', 'delete'). Matched upsert = update (batch payload
 * wins), unmatched upsert = insert, matched delete drops the row,
 * unmatched delete is the CDC no-op (the row is already gone — a
 * redelivered tombstone must not fail the job). Any other `__op` value
 * fails the job IN-PLAN via `raise_error` — a malformed batch can never
 * half-apply. Batch keys must be unique (one directive per key per
 * batch); duplicate keys would multiply target rows through the join,
 * so the caller dedups first (k02's last-wins arg_max is the tool).
 *
 * Plan shape: ONE full-outer equi-join on the key — no window, no
 * driver loop, no second pass. The target side is snapshot parquet
 * scanned once; the batch side is day-sized. At 100 TB the target
 * stores bucketed on the key ([[Bucketing]]) making the join
 * exchange-free on the corpus side, and a partition-overwrite layout
 * (s15) confines the rewrite to touched partitions; under the immutable
 * snapshot contract here, the full rewrite IS the semantics.
 */
object Merge {

  /** Apply `batch` to the latest snapshot under `dir`; commit the result
    * as the next version. Returns (new version, merged frame as read
    * back from the committed snapshot — the self-scan proof). */
  def applyChanges(spark: SparkSession, dir: String, batch: DataFrame,
                   keys: Seq[String]): (Long, DataFrame) = {
    val target = Versioned.read(spark, dir)
    val merged = merge(target, batch, keys)
    val v = Versioned.write(merged, dir)
    (v, Versioned.read(spark, dir, Some(v)))
  }

  /** The pure merge (no table write) — target x batch -> merged frame.
    * Split out so the semantics are testable without a warehouse. */
  def merge(target: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = target.columns.filterNot(keys.contains).toSeq
    require(payload.nonEmpty, "merge target needs at least one payload column")
    require(batch.columns.contains("__op"),
      "batch needs an __op column ('upsert' | 'delete')")
    val missing = (keys ++ payload).filterNot(batch.columns.contains)
    require(missing.isEmpty, s"batch is missing target columns: $missing")

    val t = target.select(
      keys.map(col) :+ struct(payload.map(col): _*).as("__t"): _*)
    val b = batch.select(
      keys.map(col) ++ Seq(
        struct(payload.map(col): _*).as("__b"),
        when(col("__op").isin("upsert", "delete"), col("__op"))
          .otherwise(raise_error(concat(
            lit("merge: bad __op "), col("__op")))).as("__op")): _*)

    val row = t.join(b, keys, "full_outer")
      // target-only rows carry (NULL __op); matched/unmatched deletes drop
      // (unmatched delete has NULL __t AND no survivor branch — the no-op).
      .filter(col("__op").isNull || col("__op") === "upsert")
      .withColumn("__r",
        when(col("__op") === "upsert", col("__b")).otherwise(col("__t")))
    row.select(keys.map(col) ++
      payload.map(p => col(s"__r.$p").as(p)): _*)
  }
}
