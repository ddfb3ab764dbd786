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
    * parallel write by default (a directory of parts); pass singleFile=true
    * to produce the reference's artifact exactly: a PLAIN CSV FILE at
    * `path` (the one part is written to a scratch dir and promoted via
    * FileSystem.rename, so no _SUCCESS marker or directory remains).
    * One write task — local use only. */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    if (!singleFile) {
      df.write.mode("overwrite").option("header", "true").csv(path)
    } else {
      import org.apache.hadoop.fs.Path
      val tmp = path + ".__spark_staging__"
      df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      val fs = new Path(tmp)
        .getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      val part = fs.globStatus(new Path(tmp, "part-*.csv")) match {
        case Array(one) => one.getPath
        case other => throw new IllegalStateException(
          s"expected exactly one part file in $tmp, found ${other.length}")
      }
      val dest = new Path(path)
      fs.delete(dest, true)
      if (!fs.rename(part, dest))
        throw new java.io.IOException(s"rename $part -> $dest failed")
      fs.delete(new Path(tmp), true)
    }
  }
}
