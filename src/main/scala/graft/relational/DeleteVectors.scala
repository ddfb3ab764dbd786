package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read positional deletes (the Iceberg/Delta deletion-vector
  * shape): deleting rows from a 100 TB base table must not rewrite the
  * base — a delete writes only the POSITIONS of the deleted rows
  * (O(|deleted|) bytes), and the reader subtracts them with one
  * anti-join at scan time. Compaction (rewriting base minus deletes)
  * becomes a lazy maintenance choice instead of a per-delete tax —
  * the s14 compactor's natural counterpart.
  *
  * The base table carries an explicit `_pos` position column assigned
  * deterministically at write time (the manifest row-ordinal in a real
  * table format). Delete batches APPEND — parquet append is the only
  * write mode used, so concurrent delete writers never rewrite each
  * other — and re-deleting an already-deleted position is a no-op
  * (the reader applies the DISTINCT position set: idempotent replays,
  * the st18 re-delivery story for deletes).
  *
  * Scale shape: the delete-vector side is |deleted|-sized; the join
  * strategy is deliberately left to Catalyst/AQE — broadcast anti-join
  * for the common small-DV case, shuffle anti-join when a mass delete
  * makes the DV too big to ship (forcing broadcast here would OOM
  * exactly when deletes are largest).
  */
object DeleteVectors {

  /** Append one delete batch: the positions (one `_pos` column) of the
    * rows to delete. O(|batch|) bytes written; base untouched. */
  def appendDeletes(positions: DataFrame, dvDir: String): Unit =
    positions.select(col("_pos").cast("long").as("_pos"))
      .write.mode("append").parquet(dvDir)

  /** Read the base minus every appended delete vector — one LEFT ANTI
    * join on `_pos` against the DISTINCT union of all delete batches.
    * A missing or empty dvDir (no deletes yet) reads the base verbatim.
    * Existence goes through the Hadoop FileSystem API, so the check is
    * correct on HDFS/S3/ABFS — the filesystems a 100 TB table actually
    * lives on — not just file:// (a java.io.File probe is always false
    * there, which would silently resurrect every deleted row). */
  def read(spark: SparkSession, baseDir: String, dvDir: String): DataFrame = {
    val base = spark.read.parquet(baseDir)
    val path = new org.apache.hadoop.fs.Path(dvDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasDeletes = fs.exists(path) &&
      fs.listStatus(path).exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    if (!hasDeletes) base
    else {
      val dv = spark.read.parquet(dvDir).select("_pos").distinct()
      base.join(dv, Seq("_pos"), "left_anti")
    }
  }
}
