package graft.relational

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Write-Audit-Publish (WAP) — the data-quality gate of production table
 * publication (the pattern Iceberg branches / Delta constraints encode;
 * Netflix's original WAP workflow): a writer NEVER exposes rows to
 * readers until declared audits pass on WHAT WAS ACTUALLY WRITTEN.
 *
 *  1. WRITE the frame to `<dest>__staging` (invisible to readers);
 *  2. AUDIT the staged files by reading them back — auditing the input
 *     frame instead would miss write-path corruption, the same
 *     written-files discipline as the s12 shard manifest. All audits
 *     evaluate in ONE aggregation job over the staged scan;
 *  3. PUBLISH by filesystem rename — previous version parked at
 *     `<dest>__prev` until the swap lands, so a crash leaves either the
 *     old or the new version addressable, never a half-published mix.
 *     A failed audit deletes staging and leaves dest byte-identical.
 *
 * Audits are named boolean AGGREGATE columns (`count(when(x.isNull,1))
 * === 0`, `count(*) === lit(expected)`, min/max range checks) — the
 * declarative form keeps the audit pass one job regardless of how many
 * audits ride along. Returns the per-audit report; `published` tells the
 * caller whether the swap happened.
 */
object Publish {

  final case class Report(audits: Seq[(String, Boolean)], published: Boolean)

  /** Evaluate named boolean aggregate audits over a staged scan in ONE
    * aggregation job (a null audit value — e.g. min() over zero rows —
    * counts as FAILED, never silently true). Shared by [[writeAuditPublish]]
    * and the versioned-snapshot commit ([[Versioned.commitAudited]]). */
  def auditStaged(staged: DataFrame, audits: Seq[(String, Column)]): Seq[(String, Boolean)] = {
    require(audits.nonEmpty, "WAP without audits is just a write — declare at least one")
    val row = staged.agg(
      audits.head._2.as("a0"),
      audits.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"a${i + 1}") }: _*).head()
    audits.zipWithIndex.map { case ((name, _), i) =>
      name -> (!row.isNullAt(i) && row.getBoolean(i))
    }
  }

  def writeAuditPublish(df: DataFrame, dest: String,
                        audits: Seq[(String, Column)]): Report = {
    require(audits.nonEmpty, "WAP without audits is just a write — declare at least one")
    val spark = df.sparkSession
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dest + "__staging")
    val prev = new Path(dest + "__prev")
    if (fs.exists(staging)) fs.delete(staging, true)
    df.write.mode("errorifexists").parquet(staging.toString)

    val results = auditStaged(spark.read.parquet(staging.toString), audits)

    if (results.forall(_._2)) {
      if (fs.exists(prev)) fs.delete(prev, true)
      val hadPrev = fs.exists(destPath)
      if (hadPrev) require(fs.rename(destPath, prev), s"park failed: $destPath")
      require(fs.rename(staging, destPath), s"publish rename failed: $destPath")
      if (hadPrev) fs.delete(prev, true)
      Report(results, published = true)
    } else {
      fs.delete(staging, true)
      Report(results, published = false)
    }
  }
}
