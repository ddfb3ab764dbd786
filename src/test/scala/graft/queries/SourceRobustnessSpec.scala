package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Source-robustness behaviors a 100 TB ingest depends on: a single rotted
 * file (truncated block, bad checksum) must be skippable WITHOUT failing
 * the whole scan, and the skip must be a deliberate opt-in — by default
 * corruption is an error, never silent data loss.
 */
class SourceRobustnessSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("source-robustness-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpusDir(): (String, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(2).write.mode("overwrite").parquet(dir)
    // rot one of the part files: keep the parquet magic so it is picked up
    // as a data file, then truncate the body mid-page
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    java.nio.file.Files.write(part.toPath, bytes.take(bytes.length / 3))
    (dir, docs.count())
  }

  test("a truncated part file fails the scan by default, is skipped on opt-in") {
    val (dir, total) = corpusDir()
    // explicit schema throughout: truncation destroys the FOOTER, so
    // schema inference would die before ignoreCorruptFiles can apply —
    // the same no-inference discipline the s-family queries follow
    val schema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    // default: corruption is an ERROR (no silent loss)
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    val failed =
      try { spark.read.schema(schema).parquet(dir).count(); false }
      catch { case _: Throwable => true }
    assert(failed, "corrupt file must fail the scan when not opted in")
    // opt-in: the scan completes on the surviving file(s) only
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val survived = spark.read.schema(schema).parquet(dir).count()
      assert(survived > 0 && survived < total,
        s"expected partial recovery, got $survived of $total")
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
  }
}
