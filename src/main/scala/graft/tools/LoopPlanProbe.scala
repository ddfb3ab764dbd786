package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: what does ONE fixpoint hop's plan look like after a
  * localCheckpoint — is the checkpointed partitioning reused? */
object LoopPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e0 = (0L until 10000L).map(i => (i, (i + 1) % 10000L)).toDF("src", "dst")
    val rem = e0.repartition(col("src")).localCheckpoint(true)
    println("== rem queryExecution outputPartitioning ==")
    println(rem.queryExecution.executedPlan.outputPartitioning)
    val colors = rem.select(col("src").as("node")).distinct()
      .withColumn("color", col("node"))
      .groupBy("node").agg(min("color").as("color"))
      .localCheckpoint(true)
    println("== colors outputPartitioning ==")
    println(colors.queryExecution.executedPlan.outputPartitioning)
    val hop = colors.unionByName(
        rem.join(colors.select(col("node").as("src"), col("color")), "src")
          .select(col("dst").as("node"), col("color")))
      .groupBy("node").agg(min("color").as("color"))
    hop.explain("formatted")
    spark.stop()
  }
}
