package graft.relational

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned table with TIME TRAVEL — the lakehouse snapshot contract
 * (Delta/Iceberg's core promise) on plain parquet: every write lands in
 * a fresh immutable `v=N` directory and publication is ONE atomic
 * rename of a pointer file, so
 *  - readers of any pinned version are never disturbed by later writes
 *    (reproducibility: a training run pins the corpus version it saw);
 *  - "latest" flips atomically — a reader sees version N or N+1 in
 *    full, never a mix;
 *  - rollback is re-pointing, not rewriting.
 *
 * Layout: `<dir>/v=N/` parquet snapshots, `<dir>/_latest` a one-line
 * pointer. The pointer write goes through `_latest.tmp` + rename (the
 * same-filesystem atomicity the WAP publish relies on). Old versions
 * are retained until an explicit `expire(keepLast)` call (below) drops
 * them — retention policy is deployment-specific, so expiry is invoked
 * by the pipeline, never implicit. At 100 TB snapshots share no files,
 * which is the cost of plain parquet vs a manifest format — the
 * INTERFACE (pin, flip, rollback, expire, change feed) is what
 * pipelines program against.
 */
object Versioned {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, or None for an empty table. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir, "_latest")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Highest snapshot directory present — the version high-water mark.
    * Distinct from [[latestVersion]]: a rollback re-points `_latest`
    * below the high-water mark, and the NEXT write must still mint a
    * fresh version number, never collide with a retained snapshot. */
  private def highWater(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) None
    else f.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .maxOption
  }

  /** Commit `df` as the next version; returns the version number. */
  def write(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val v = highWater(spark, dir).fold(1L)(_ + 1L)
    df.write.mode("errorifexists").parquet(s"$dir/v=$v")
    val tmp = new Path(dir, "_latest.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, "_latest")
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"pointer flip failed for $dir")
    v
  }

  /** Read a pinned version (or latest when None). */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, dir))
      .getOrElse(throw new IllegalStateException(s"no committed version in $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Audit-gated commit — WAP fused into the versioned layout (one data
    * write, not Publish-then-recopy): the snapshot lands in `<dir>/v=N`
    * (invisible: `_latest` still points at N-1), the audits evaluate over
    * the FILES ACTUALLY WRITTEN ([[Publish.auditStaged]] — the same
    * written-files discipline as `writeAuditPublish`, one aggregation
    * job), and only a full pass flips the pointer. A failed audit deletes
    * the staged snapshot and leaves `_latest` — and every pinned reader —
    * untouched, so a bad batch can never replace a good table.
    * Returns the per-audit report plus the committed version (None when
    * the gate refused). */
  def commitAudited(df: DataFrame, dir: String,
                    audits: Seq[(String, org.apache.spark.sql.Column)]): (Publish.Report, Option[Long]) = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val v = highWater(spark, dir).fold(1L)(_ + 1L)
    val snap = new Path(s"$dir/v=$v")
    df.write.mode("errorifexists").parquet(snap.toString)
    val results = Publish.auditStaged(spark.read.parquet(snap.toString), audits)
    if (results.forall(_._2)) {
      val tmp = new Path(dir, "_latest.tmp")
      val out = f.create(tmp, true)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val dst = new Path(dir, "_latest")
      if (f.exists(dst)) f.delete(dst, false)
      require(f.rename(tmp, dst), s"pointer flip failed for $dir")
      (Publish.Report(results, published = true), Some(v))
    } else {
      f.delete(snap, true)
      (Publish.Report(results, published = false), None)
    }
  }

  /** Change-data-feed read between two committed snapshots — the
    * Delta CDF / Iceberg changelog contract on the versioned layout:
    * the row-level diff a downstream incremental consumer applies
    * instead of re-reading the whole table ("what changed between the
    * corpus version I trained on and today's"). Rows are keyed by
    * `keyCols`; non-key columns are fingerprinted (md5 of the
    * field-ordered JSON struct) and the classification is
    * `insert` (key only in `toV`) / `delete` (only in `fromV`) /
    * `update` (both, payload differs) — unchanged rows are NOT emitted
    * (a change feed carries changes). Output: key columns,
    * `change_type`, and the full pre/post payload structs (`__pre` is
    * null for inserts, `__post` for deletes).
    *
    * Shape: two snapshot scans + ONE co-partitioned full-outer
    * equi-join on the key — the same plan at any table size; the
    * payload fingerprints (16 bytes) ride the join, never the row twice. */
  def changes(spark: SparkSession, dir: String, fromV: Long, toV: Long,
              keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val pre = read(spark, dir, Some(fromV))
    val post = read(spark, dir, Some(toV))
    val nonKey = pre.columns.filterNot(keyCols.contains).toSeq
    require(post.columns.filterNot(keyCols.contains).toSeq == nonKey,
      s"schema drift between v=$fromV and v=$toV is not diffable row-wise")
    def side(df: DataFrame, fp: String, payload: String) =
      df.select((keyCols.map(col) :+
        md5(to_json(struct(nonKey.map(col): _*))).as(fp) :+
        struct(nonKey.map(col): _*).as(payload)): _*)
    side(pre, "__fpa", "__pre")
      .join(side(post, "__fpb", "__post"), keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__fpa").isNull, lit("insert"))
          .when(col("__fpb").isNull, lit("delete"))
          .when(col("__fpa") =!= col("__fpb"), lit("update")))
      .filter(col("change_type").isNotNull)
      .select((keyCols.map(col) :+ col("change_type") :+
        col("__pre") :+ col("__post")): _*)
  }

  /** All committed snapshot versions present on disk, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .toSeq.sorted
  }

  /** Snapshot EXPIRY — the retention half of the time-travel contract
    * (Delta VACUUM / Iceberg expire_snapshots on plain parquet): delete
    * all but the newest `keep` snapshots, with two refusals that keep
    * expiry from ever breaking readers: the `_latest` pointer target is
    * ALWAYS retained (even when older than the horizon — a rolled-back
    * table keeps serving), and `keep` must be >= 1. Pinned readers of
    * an EXPIRED version lose it by definition — that is the documented
    * trade a retention policy makes; pin + retention window are chosen
    * together. Returns the versions actually deleted. */
  def expire(spark: SparkSession, dir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val f = fs(spark, dir)
    val all = versions(spark, dir)
    val retained = all.takeRight(keep).toSet ++ latestVersion(spark, dir)
    val doomed = all.filterNot(retained)
    doomed.foreach(v => f.delete(new Path(s"$dir/v=$v"), true))
    doomed
  }

  /** Roll back: re-point `_latest` at an existing earlier version. */
  def rollback(spark: SparkSession, dir: String, version: Long): Unit = {
    val f = fs(spark, dir)
    require(f.exists(new Path(dir, s"v=$version")), s"no such version $version")
    val tmp = new Path(dir, "_latest.tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, "_latest")
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"pointer flip failed for $dir")
  }
}
