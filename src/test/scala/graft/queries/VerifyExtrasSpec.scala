package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The extras report ([[graft.VerifyExtras]]) is the executable evidence for
 * the no-oracle queries, so it must itself be trustworthy: this suite
 * runs it against a real dump at sf0.001 (all checks green) and then against
 * a deliberately corrupted dump (the check must go red) — a checker that
 * cannot fail is no evidence at all.
 */
@graft.SlowTest
class VerifyExtrasSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("verify-extras-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val extras = Seq("d05_simhash", "t04_fingerprint", "v03_ann_lsh",
    "v05_ann_ivf", "v12_indexed_ivf", "v13_pq_ann", "v14_indexed_pq",
    "v15_ivfpq", "v16_indexed_ivfpq",
    "d16_semantic_dedup", "x25_kcore", "x30_ktruss",
    "a08_approx_distinct", "a16_approx_percentiles")

  private def dump(outDir: String): Unit =
    extras.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sf)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.SessionResources.release(spark)
    }

  test("every extras check passes on a genuine dump at sf0.001") {
    val out = java.nio.file.Files.createTempDirectory("extras-ok").toString
    dump(out)
    val checks = graft.VerifyExtras.run(spark, sf, out)
    assert(checks.map(_.query).sorted === extras.sorted)
    checks.foreach(c => assert(c.pass, s"${c.query}: ${c.detail}"))
  }

  test("a corrupted simhash dump and a shuffled ANN dump both go red") {
    val out = java.nio.file.Files.createTempDirectory("extras-bad").toString
    dump(out)
    // corrupt d05: flip one bit of every fingerprint
    val d05 = spark.read.parquet(s"$out/d05_simhash")
      .withColumn("simhash", col("simhash").bitwiseXOR(lit(1L)))
    d05.write.mode("overwrite").parquet(s"$out/__tmp_d05")
    spark.read.parquet(s"$out/__tmp_d05").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/d05_simhash")
    // corrupt v03: point every query at neighbor set {0..4} (wrong for most)
    val v03 = spark.read.parquet(s"$out/v03_ann_lsh")
      .withColumn("neighbor_id", col("rnk") - 1)
    v03.write.mode("overwrite").parquet(s"$out/__tmp_v03")
    spark.read.parquet(s"$out/__tmp_v03").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/v03_ann_lsh")
    val byQuery = graft.VerifyExtras.run(spark, sf, out).map(c => c.query -> c).toMap
    assert(!byQuery("d05_simhash").pass, "corrupted simhash dump must fail")
    assert(!byQuery("v03_ann_lsh").pass, "shuffled ANN dump must fail")
    assert(byQuery("t04_fingerprint").pass && byQuery("a08_approx_distinct").pass,
      "untouched dumps must stay green")
  }
}
