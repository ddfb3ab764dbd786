package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * 1x-vs-10x scale probe for the round-12 extension-wave operators
 * (a47/a48/t48/t49/st25/v26/x45/m12) — the same empirical protocol as
 * [[graft.ScaleProbe]]: synthesize the 10x corpus with deterministic
 * rotation (ScaleProbe.synth10x for documents/embeddings/events, plus a
 * key-shifted 10x customer replica here — the md5 fixture plants
 * recompute per key, so the 10x table is distribution-faithful, not ten
 * duplicate blocks), then time each registered query at both scales with
 * noop writes and the Bench hygiene rule (tracked state released inside
 * the timed window).
 *
 * Run: sbt "runMain graft.tools.ExtWaveProbe"  -> committed as
 * EXTWAVE_10X.md with the analysis.
 */
object ExtWaveProbe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_extwave_wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val big = "/tmp/sf1_synth"

    graft.ScaleProbe.synth10x(spark, sf, big)
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    (0 until 10).map(k =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/customer.parquet")
    println(s"[probe] cust10 = ${spark.read.parquet(s"$big/customer.parquet").count()}")

    val targets = Seq("a47_bcubed", "a48_krippendorff", "t48_sft_assembly",
      "t49_quality_tradeoff", "st25_sft_gate", "v26_pca_power",
      "x45_coreset", "m12_av_align")
    Seq(sf -> "1x", big -> "10x").foreach { case (dir, tag) =>
      targets.foreach { name =>
        graft.ScaleProbe.time(s"$tag $name") {
          graft.queries.Queries.all.toMap.apply(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
