package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Municipalities CSV source [S4] + provinces distinct [A4]
 * (reference: bag/gemeente_parser.py:16-43).
 *
 * Positional header validation (columns 0/2/3/5 must be
 * Gemeentecode/Gemeentenaam/Provinciecode/Provincienaam), then projection to
 * gemeenten(id, naam, provincie_id) and provincies(id, naam) with the
 * reference's order-preserving first-seen dedup replaced by a plain distinct
 * (provincie id->naam is functional, so the result set is identical).
 */
object Gemeenten {

  final case class Tables(gemeenten: DataFrame, provincies: DataFrame)

  def read(spark: SparkSession, csvPath: String): Tables = {
    val df = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(csvPath)

    val cols = df.columns
    require(cols.length >= 6 &&
      cols(0) == "Gemeentecode" && cols(2) == "Gemeentenaam" &&
      cols(3) == "Provinciecode" && cols(5) == "Provincienaam",
      s"Invalid gemeenten header: ${cols.mkString(",")}")

    val gemeenten = df.select(
      col("Gemeentecode").cast("long").as("id"),
      col("Gemeentenaam").as("naam"),
      col("Provinciecode").cast("long").as("provincie_id"))

    val provincies = df.select(
      col("Provinciecode").cast("long").as("id"),
      col("Provincienaam").as("naam")).distinct()

    Tables(gemeenten, provincies)
  }
}
