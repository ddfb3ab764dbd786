package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Empirical scale probe: replicates sf0.1 documents/embeddings 10x with
 * deterministic word/element rotation (so shingle and embedding
 * distributions stay realistic instead of forming artificial duplicate
 * clusters), then times the near-dup and ANN paths at 1x vs 10x.
 *
 * Run: sbt "runMain graft.ScaleProbe"
 *
 * Measured on local[32] (2026-08-12, post skew-guard hardening): 10x data
 * costs 1.3-3.4x wall — d01 0.9->0.5s, d03 3.1->10.6s, d04 1.8->4.3s,
 * v03 3.4->4.4s, v05 1.5->2.9s — candidate generation stays
 * equi-join-bound with no quadratic blowup, the executable form of the
 * 100x-scale claim.
 */
object ScaleProbe {
  def time[T](label: String)(f: => T)(implicit spark: SparkSession): T = {
    val t0 = System.nanoTime()
    val r = f
    // same hygiene rule as Bench: tracked state a query allocated is charged
    // to that query and never pollutes the next measurement
    SessionResources.release(spark)
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val big = "/tmp/sf1_synth"

    // 10x documents: copy k rotates each doc's words by 17*k positions, so
    // shingle sets across copies are (mostly) disjoint — realistic unique-
    // shingle distribution instead of artificial 10-copy dup clusters.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rot = (0 until 10).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("__w", split(col("text"), " "))
        .withColumn("text",
          concat_ws(" ", concat(slice(col("__w"), lit(17 * k + 1), lit(100000)),
            slice(col("__w"), 1, 17 * k))))
        .drop("__w")
    }.reduce(_ unionByName _)
    rot.write.mode("overwrite").parquet(s"$big/documents.parquet")

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val embRot = (0 until 10).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        .withColumn("embedding",
          concat(slice(col("embedding"), lit(3 * k + 1), lit(100000)),
            slice(col("embedding"), 1, 3 * k)).cast("array<float>"))
    }.reduce(_ unionByName _)
    embRot.write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    println(s"[probe] docs10 = ${spark.read.parquet(s"$big/documents.parquet").count()}, " +
      s"emb10 = ${spark.read.parquet(s"$big/embeddings.parquet").count()}")

    def bench(dir: String, tag: String): Unit = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      time(s"$tag d01 exact groups") {
        graft.llm.Dedup.exactGroups(d).write.format("noop").mode("overwrite").save() }
      time(s"$tag d03 ngram jaccard") {
        graft.llm.Dedup.ngramJaccardPairs(d, 5, 0.2).write.format("noop").mode("overwrite").save() }
      time(s"$tag d04 minhash lsh") {
        graft.llm.Dedup.minhashLshPairs(d, 5, 32, 16, 0.7).write.format("noop").mode("overwrite").save() }
      time(s"$tag d07 components") {
        graft.llm.Dedup.dedupComponents(
            graft.llm.Dedup.ngramJaccardPairs(d, 5, 0.2).select("id_a", "id_b"))
          .write.format("noop").mode("overwrite").save() }
      time(s"$tag t09 tfidf") {
        graft.llm.TextOps.tfidfTopTerms(d, 3).write.format("noop").mode("overwrite").save() }
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 32)
      time(s"$tag v03 ann lsh") {
        graft.llm.Similarity.annLsh(e, q, 5).write.format("noop").mode("overwrite").save() }
      time(s"$tag v05 ann ivf") {
        graft.llm.Similarity.annIvf(e, q, 5).write.format("noop").mode("overwrite").save() }
    }
    bench(sf, " 1x")
    bench(big, "10x")
    spark.stop()
  }
}
