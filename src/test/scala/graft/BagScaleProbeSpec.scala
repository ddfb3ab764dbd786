package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * End-to-end proof of the synthetic-extract generator + probe harness at
 * miniature scale (n=3000): the generated zip-of-zips must stage, parse,
 * curate, and VALIDATE with zero errors, and the deterministic
 * cardinalities must land exactly — the same assertions the 1M-address
 * probe run makes, so a green test here means the big run can only fail
 * on wall-clock, not correctness.
 */
class BagScaleProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    work = java.nio.file.Files.createTempDirectory("bag_scale_probe_spec")
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("BagScaleProbeSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (work != null)
      org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
  }

  test("synthetic extract imports, curates, and validates with zero errors") {
    val n = 3000
    val r = BagScaleProbe.run(spark, work.toString, n)
    assert(r.errors === 0, "validation must be clean")
    // deterministic strata: 50 orphans deleted by U3, dups collapsed by
    // K2, expired/future/wrong-status filtered by F1/F2; the small-n shape
    // has no planted golden row (woonplaats universe < 51)
    assert(r.adressen === n.toLong)
    assert(r.secImport > 0.0 && r.addressesPerSec > 0.0)

    // spot-check the mess actually exercised its operators
    val a = spark.read.parquet(s"$work/warehouse/adressen")
    import org.apache.spark.sql.functions._
    val lig = a.filter(col("object_type") === "ligplaats").count()
    val sta = a.filter(col("object_type") === "standplaats").count()
    assert(lig === (n / 300).toLong && sta === (n / 300).toLong)
    // K2 winners carry the later voorkomen's postcode
    val dupWinners = a.filter(col("postcode") === "9999ZZ").count()
    assert(dupWinners === (n / 500).toLong)
    // J6: every 25th address has no own vbo but is backfilled from its
    // successor hoofdadres — pand and coordinates present
    val backfilled = a.filter(col("hoofd_nummer_id").isNotNull)
    assert(backfilled.count() === (n / 25).toLong)
    assert(backfilled.filter(col("pand_id").isNull || col("latitude").isNull).count() === 0L)
    // U1: dummy bouwjaar 9999 nulled
    assert(a.filter(col("bouwjaar") > 2040).count() === 0L)
  }
}
