package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate maintenance (IVM for distributive aggregates) —
 * the pattern behind every always-fresh dashboard over an append-only
 * log: a stored (key -> count, sum) table is MAINTAINED by folding each
 * day's delta in, never recomputed from the log. Recomputing a corpus
 * aggregate at 100 TB costs a full scan per refresh; folding a delta
 * costs the delta plus the touched slice of the aggregate table.
 *
 * Mechanics (the upsertBatch discipline applied to aggregate state):
 *  1. the batch pre-aggregates to its own (key, cnt, sum) partials —
 *     batch-sized, map-side combined;
 *  2. rows hash-slot by `pmod(hash(key), nParts)`; the batch's touched
 *     slot set is collected (bounded by nParts, a plan constant);
 *  3. ONLY touched slots of the stored table are read back, merged by
 *     key (counts and sums ADD — the distributive-aggregate law), and
 *     rewritten via dynamic partition overwrite — untouched slots keep
 *     their physical files.
 *
 * Count and sum compose exactly (64-bit integers here, so replays are
 * detectable by idempotence tests rather than silently absorbed — an
 * at-least-once feed needs the upsert sink's keyed dedup in front).
 * Avg/min/max derive from (cnt, sum) / ride along the same way; truly
 * holistic aggregates (exact distinct) need the bitmap sidecar (a24's
 * `bitmap_agg` merges by OR under the identical fold).
 */
object IncrementalAgg {

  /** Fold one delta batch of (key: string, value: long) rows into the
    * stored aggregate at `tableDir`. */
  def applyDelta(batch: DataFrame, tableDir: String, nParts: Int = 16): Unit = {
    val spark = batch.sparkSession
    val partial = batch
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum"))
      .withColumn("__p", pmod(hash(col("key")), lit(nParts)))
      .localCheckpoint(true)
    val touched = partial.select("__p").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by nParts
    val existing =
      if (!new java.io.File(tableDir).exists()) None
      else Some(spark.read.parquet(tableDir)
        .filter(col("__p").isin(touched: _*))
        .select(col("key"), col("cnt"), col("sum"), col("__p")))
    val merged = existing.fold(partial)(_.unionByName(partial))
      .groupBy(col("key"), col("__p"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum")).as("sum"))
      .select(col("key"), col("cnt"), col("sum"), col("__p"))
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__p").parquet(tableDir)
  }

  /** The maintained aggregate, key-addressable. */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir).select("key", "cnt", "sum")
}
