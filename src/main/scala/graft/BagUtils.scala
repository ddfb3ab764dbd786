package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Small parity utilities completing the reference's helper surface:
 *  - P13 `bag_date_to_date` (reference: utils.py:162-166) — declared but
 *    unused by the reference's main flow; provided for API completeness.
 *  - U4 batch lon/lat patch (reference: database_sqlite.py:61-64) — the
 *    UPDATE-by-id helper as a join + coalesce.
 */
object BagUtils {

  /** P13: BAG datetime string ("YYYY-MM-DDTHH:MM:SS...", >= 16 chars) ->
    * timestamp; shorter strings -> date-at-midnight; blank/malformed ->
    * null. try_to_timestamp, not to_timestamp: under Spark 4's default ANSI
    * mode the strict form THROWS on one malformed token and kills the
    * stage — same failure mode the geometry parser guards against. */
  def bagDateToTimestamp(c: Column): Column =
    when(length(c) >= 16,
      try_to_timestamp(substring(c, 1, 19), lit("yyyy-MM-dd'T'HH:mm:ss")))
      .otherwise(when(length(c) >= 10,
        try_to_timestamp(substring(c, 1, 10), lit("yyyy-MM-dd"))))

  /**
   * U4: patch latitude/longitude by id from a patch table
   * (id, latitude, longitude). Rows without a patch keep their values.
   * The patch side is broadcast — no shuffle of the base table.
   */
  def patchLatLon(base: DataFrame, patches: DataFrame): DataFrame = {
    val p = broadcast(patches.select(col("id").as("__pid"),
      col("latitude").as("__plat"), col("longitude").as("__plon")))
    base.join(p, base("id") === p("__pid"), "left")
      .withColumn("latitude", coalesce(col("__plat"), col("latitude")))
      .withColumn("longitude", coalesce(col("__plon"), col("longitude")))
      .drop("__pid", "__plat", "__plon")
  }
}
