package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Same-sitting A/B micro-bench for operator variants (r8 verdict ask #3:
 * alternating interleaved runs cancel the box's ±30-50% ambient drift that
 * poisoned cross-round comparisons). Usage:
 *   runMain graft.tools.AbBench pii [sfDir] [reps]
 * Prints one line per variant: median + min of `reps` alternating
 * noop-write runs (noop materializes every output column — same forcing
 * discipline as Bench.scala).
 */
object AbBench {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("pii")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timeOne(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      force(mk())
      (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, () => DataFrame)] = what match {
      case "pii" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        Seq(
          "kernel" -> (() => graft.llm.TextOps.piiRedact(docs)),
          "spec3pass" -> (() => graft.llm.TextOps.piiRedactSpec(docs)))
      case other => sys.error(s"unknown A/B target: $other")
    }

    // warm-up once per variant (JIT + codegen + page cache), then reps
    // ALTERNATING runs so ambient drift hits both variants equally
    variants.foreach { case (_, mk) => force(mk()) }
    val samples = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, mk) <- variants)
      samples(name) :+= timeOne(mk)
    for ((name, _) <- variants) {
      val s = samples(name).sorted
      println(f"[ab] $what/$name%-12s median=${s(s.size / 2)}%.3f s  " +
        f"min=${s.head}%.3f s  n=$reps  all=${s.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
