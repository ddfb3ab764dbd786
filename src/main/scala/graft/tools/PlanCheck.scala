package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan audit: prints the executed plan for the named queries.
  * Run: sbt "runMain graft.tools.PlanCheck <sfDir> <query> [query ...]" */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, args(0))
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    }
  }
}
