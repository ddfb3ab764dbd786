package graft

import java.nio.file.Files

import graft.curate.Adressen
import graft.export.Exports
import graft.ingest.BagXml
import org.apache.spark.sql.SparkSession

/**
 * Demo driver: the full BAG flow through the public API on the synthetic
 * fixture — staging -> import -> SQL-by-name -> export -> validation, with
 * the O3 progress listener and O4 logger attached.
 *
 * Run: sbt "Test/runMain graft.DemoBag"
 */
object DemoBag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("demo-bag")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("demo_bag")
    val (xmlDirs, csv) = BagFixtures.write(root)
    val cfg = Config(asOfDate = BagFixtures.asOf)

    Log.info("staging fixture written to " + root)
    val progress = Progress.attach(spark, "bag-import")

    val raw = Pipeline.rawTables(spark, xmlDirs, csv, cfg)
    val adressen = Adressen.curated(raw, cfg)

    Pipeline.registerViews(raw, Some(adressen))
    Log.info("K4 SQL-by-name over registered views:")
    spark.sql(
      """SELECT a.postcode, a.huisnummer, w.naam AS woonplaats, a.object_type
        |FROM adressen a LEFT JOIN woonplaatsen w ON a.woonplaats_id = w.id
        |ORDER BY a.postcode, a.huisnummer""".stripMargin).show(20, truncate = false)

    Log.info("woonplaats geometry per nesting variant (vlak/multivlak/bare):")
    spark.sql("SELECT id, naam, substring(geometry, 1, 40) AS geom_head FROM woonplaatsen ORDER BY id")
      .show(truncate = false)

    val outCsv = root.resolve("postcode_csv").toString
    Exports.writeCsv(
      Exports.postcodeExport(adressen, raw,
        Adressen.withStraatNaam(raw.openbareRuimten, cfg.useShortStreetNames)),
      outCsv)
    val parts = new java.io.File(outCsv).listFiles().map(_.getName).sorted
    Log.info(s"postcode export (cluster-safe default) -> ${parts.mkString(", ")}")

    val checks = Validate.run(adressen, raw, Validate.Thresholds(
      minAdressen = 9, minAdressenMetPand = 3, minLigplaatsen = 1,
      minStandplaatsen = 1, minOpenbareRuimten = 4, minWoonplaatsen = 3,
      minGemeenten = 3, exactProvincies = 2))
    checks.foreach(c => if (c.isError) Log.error(c.name) else Log.info("check ok: " + c.name))
    Log.info(s"validation errors: ${Validate.errorCount(checks)}")
    Log.info(progress.report())
    Progress.detach()

    // probe: a malformed posList vertex must not fail the stage (defensive
    // per-vertex parsing) — read a hand-broken pand file through the same
    // public reader.
    val badDir = root.resolve("BADPND")
    Files.createDirectories(badDir)
    val bad =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<sl:standBestand xmlns:Objecten="www.kadaster.nl/schemas/lvbag/imbag/objecten/v20200601" xmlns:Historie="www.kadaster.nl/schemas/lvbag/imbag/historie/v20200601" xmlns:gml="http://www.opengis.net/gml/3.2" xmlns:sl="http://www.kadaster.nl/schemas/standlevering-generiek/1.0.0">
        |<sl:stand><Objecten:Pand>
        |<Objecten:identificatie>9999100000000001</Objecten:identificatie>
        |<Objecten:geometrie><gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>155000 463000 0 OOPS 463010 0 155010 463010 0 155000 463000 0</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></Objecten:geometrie>
        |<Objecten:oorspronkelijkBouwjaar>1999</Objecten:oorspronkelijkBouwjaar>
        |<Objecten:status>Pand in gebruik</Objecten:status>
        |<Objecten:voorkomen><Historie:Voorkomen><Historie:beginGeldigheid>2010-01-01</Historie:beginGeldigheid></Historie:Voorkomen></Objecten:voorkomen>
        |</Objecten:Pand></sl:stand>
        |</sl:standBestand>""".stripMargin
    Files.write(badDir.resolve("bad.xml"), bad.getBytes("UTF-8"))
    val badPand = BagXml.read(spark, badDir.toString, BagXml.pand, cfg).collect()
    Log.info(s"malformed-posList pand parsed without stage failure: " +
      s"id=${badPand.head.getAs[String]("id")} geometry=${badPand.head.getAs[String]("geometry")}")

    spark.stop()
  }
}
