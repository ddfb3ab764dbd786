package graft.export

import graft.curate.Adressen.BagTables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Export queries over the curated `adressen` table
 * (reference: exporter/exporter.py:47-142). Five pipelines:
 *   - full CSV (J8, 15 columns, 4 chained dimension joins)
 *   - postcode CSV (J9)
 *   - pc4 / pc5 / pc6 stats (A1 + J10): GROUP BY postcode prefix with
 *     AVG lat/lon and COUNT.
 *
 * All dimension sides (openbare_ruimten, gemeenten, woonplaatsen, provincies)
 * are broadcast — adressen, the only big table, never shuffles for exports;
 * the stats queries shuffle only the (tiny) partial-aggregate rows thanks to
 * map-side combine.
 *
 * SQLite quirks deliberately translated, not copied (SURVEY.md §7.3):
 *   - SUBSTR(postcode, 0, 5) is 4 chars in SQLite -> substring(postcode, 1, 4)
 *   - bare non-aggregated w.naam under GROUP BY -> explicit first(naam)
 */
object Exports {

  /** J8: the full 15-column denormalized export (exporter.py:47-75). */
  def fullExport(adressen: DataFrame, t: BagTables, openbareRuimtenNamed: DataFrame): DataFrame = {
    val a = adressen.alias("a")
    val o = openbareRuimtenNamed.alias("o")
    val g = t.gemeenten.alias("g")
    val w = t.woonplaatsen.alias("w")
    val p = t.provincies.alias("p")
    a.join(broadcast(o), col("a.openbare_ruimte_id") === col("o.id"), "left")
      .join(broadcast(g), col("a.gemeente_id") === col("g.id"), "left")
      .join(broadcast(w), col("a.woonplaats_id") === col("w.id"), "left")
      .join(broadcast(p), col("g.provincie_id") === col("p.id"), "left")
      .select(
        col("o.naam").as("straat"),
        col("a.huisnummer"),
        concat(col("a.huisletter"), col("a.toevoeging")).as("toevoeging"),
        col("a.postcode"),
        col("g.naam").as("gemeente"),
        col("w.naam").as("woonplaats"),
        col("p.naam").as("provincie"),
        col("a.bouwjaar"),
        col("a.rd_x"), col("a.rd_y"), col("a.latitude"), col("a.longitude"),
        col("a.oppervlakte").as("vloeroppervlakte"),
        col("a.gebruiksdoel"),
        col("a.hoofd_nummer_id").as("hoofdadres_nummer_id"))
  }

  /** J9: the default postcode export (exporter.py:77-91). */
  def postcodeExport(adressen: DataFrame, t: BagTables, openbareRuimtenNamed: DataFrame): DataFrame = {
    val a = adressen.alias("a")
    a.join(broadcast(openbareRuimtenNamed.alias("o")),
        col("a.openbare_ruimte_id") === col("o.id"), "left")
      .join(broadcast(t.woonplaatsen.alias("w")),
        col("a.woonplaats_id") === col("w.id"), "left")
      .select(
        col("o.naam").as("straat"),
        col("a.huisnummer"),
        concat(col("a.huisletter"), col("a.toevoeging")).as("toevoeging"),
        col("a.postcode"),
        col("w.naam").as("woonplaats"))
  }

  /** A1+J10: postcode-prefix stats; prefixLen 4, 5 or 6 (exporter.py:93-142). */
  def postcodeStats(adressen: DataFrame, woonplaatsen: DataFrame, prefixLen: Int): DataFrame = {
    val a = adressen.alias("a")
    a.filter(col("a.postcode") =!= "")
      .join(broadcast(woonplaatsen.alias("w")),
        col("a.woonplaats_id") === col("w.id"), "left")
      .groupBy(substring(col("a.postcode"), 1, prefixLen).as(s"postcode$prefixLen"))
      .agg(
        avg(col("a.latitude")).as("center_lat"),
        avg(col("a.longitude")).as("center_lon"),
        count(lit(1)).as("aantal_adressen"),
        // SQLite lets a bare w.naam through GROUP BY and picks an arbitrary
        // one; we make the choice explicit and deterministic.
        min(col("w.naam")).as("woonplaats"))
  }

  /** K3: CSV sink with header, UTF-8 (exporter.py:15-45). Cluster-safe
    * parallel write by default; pass singleFile=true to mirror the
    * reference's single-file artifact (a one-task write — local use only). */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }
}
