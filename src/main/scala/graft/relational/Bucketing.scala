package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table storage: pre-shuffle big tables ONCE at write time so
 * every later equi-join/aggregation on the bucket key runs shuffle-free.
 *
 * This is the Spark-native replacement for the reference's post-load
 * indices (database_sqlite.py:274-289): where SQLite builds a B-tree per
 * join key, a Spark warehouse buckets the fact tables by that key. A join
 * of two tables bucketed by the same key into the same bucket count shows
 * NO Exchange in the plan — at 100 TB that deletes the dominant cost of
 * the nightly adressen rebuild (vbo/lig/sta all join nummers on
 * nummer_id repeatedly).
 */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwrites).
    *
    * The frame is repartitioned by the bucket key FIRST (same murmur3
    * hash-partitioning bucketBy uses), so each write task holds exactly
    * one bucket and emits one file — without it Spark writes up to one
    * file per (task, bucket): thousands of upstream tasks x the bucket
    * count is a small-file explosion at scale. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.repartition(buckets, df.col(key)).write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
