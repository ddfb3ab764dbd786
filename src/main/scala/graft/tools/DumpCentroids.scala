package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug dump of the deterministic IVF quantizer (temporary). */
object DumpCentroids {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.queries.Queries.embeddings(spark, args(0))
    val cents = graft.llm.Similarity.ivfCentroids(emb)
    val json = cents.zipWithIndex.map { case (c, i) =>
      s"[$i,[${c.mkString(",")}]]"
    }.mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), json)
    println(s"wrote ${args(1)} k=${cents.length}")
    spark.stop()
  }
}
