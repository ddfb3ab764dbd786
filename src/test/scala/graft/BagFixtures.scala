package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/**
 * Hand-built tiny BAG fixture (FIXTURES.md §A): synthetic LVBAG-shaped XML +
 * gemeenten.csv written to a temp dir, exercising:
 *  - temporal-validity + status filtering (active / expired / future / wrong status)
 *  - missing-tag defaults (huisletter/toevoeging/postcode '')
 *  - repeated tags (gebruiksdoel, PandRef, heeftAlsNevenadres, interior rings)
 *  - parent-qualified disambiguation (hoofd vs neven NummeraanduidingRef,
 *    woonplaats vs gemeente identificatie)
 *  - duplicate-id last-wins dedup
 *  - multi-pand repair, ligplaats/standplaats overrides, woonplaats override,
 *    nevenadres backfill, dummy bouwjaar/oppervlakte
 */
object BagFixtures {

  val asOf = "2024-06-30"

  private val nsDecl =
    """xmlns:Objecten="www.kadaster.nl/schemas/lvbag/imbag/objecten/v20200601"
      |xmlns:Objecten-ref="www.kadaster.nl/schemas/lvbag/imbag/objecten-ref/v20200601"
      |xmlns:Historie="www.kadaster.nl/schemas/lvbag/imbag/historie/v20200601"
      |xmlns:nen5825="www.kadaster.nl/schemas/lvbag/imbag/nen5825/v20200601"
      |xmlns:gml="http://www.opengis.net/gml/3.2"
      |xmlns:gwr="www.kadaster.nl/schemas/lvbag/gem-wpl-rel/gwr-producten-lvc/v20200601"
      |xmlns:bagtypes="www.kadaster.nl/schemas/lvbag/gem-wpl-rel/bag-types/v20200601"
      |xmlns:sl="http://www.kadaster.nl/schemas/standlevering-generiek/1.0.0"""".stripMargin.replace("\n", " ")

  private def doc(objects: String*): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<sl:standBestand $nsDecl>
       |${objects.map(o => s"<sl:stand>$o</sl:stand>").mkString("\n")}
       |</sl:standBestand>""".stripMargin

  private def voorkomen(begin: String, eind: String = ""): String = {
    val e = if (eind.nonEmpty) s"<Historie:eindGeldigheid>$eind</Historie:eindGeldigheid>" else ""
    s"""<Objecten:voorkomen><Historie:Voorkomen>
       |<Historie:beginGeldigheid>$begin</Historie:beginGeldigheid>$e
       |<Historie:tijdstipRegistratie>${begin}T00:00:00</Historie:tijdstipRegistratie>
       |</Historie:Voorkomen></Objecten:voorkomen>""".stripMargin
  }

  private def polygon(posList: String, interior: Seq[String] = Nil): String =
    s"""<Objecten:geometrie><gml:Polygon srsName="urn:ogc:def:crs:EPSG::28992">
       |<gml:exterior><gml:LinearRing><gml:posList>$posList</gml:posList></gml:LinearRing></gml:exterior>
       |${interior.map(i => s"<gml:interior><gml:LinearRing><gml:posList>$i</gml:posList></gml:LinearRing></gml:interior>").mkString}
       |</gml:Polygon></Objecten:geometrie>""".stripMargin

  private def gmlPolygon(posList: String): String =
    s"""<gml:Polygon srsName="urn:ogc:def:crs:EPSG::28992">
       |<gml:exterior><gml:LinearRing><gml:posList>$posList</gml:posList></gml:LinearRing></gml:exterior>
       |</gml:Polygon>""".stripMargin

  /** Real LVBAG woonplaats geometry nests polygons three ways (ADVICE r1):
    * bare gml:Polygon, Objecten:vlak, or Objecten:multivlak/MultiSurface. */
  private def woonplaats(id: String, naam: String, status: String,
      begin: String, eind: String = "", wrap: String = "bare"): String = {
    val ring = "155000 463000 155100 463000 155100 463100 155000 463000"
    val geom = wrap match {
      case "vlak" =>
        s"<Objecten:geometrie><Objecten:vlak>${gmlPolygon(ring)}</Objecten:vlak></Objecten:geometrie>"
      case "multivlak" =>
        s"""<Objecten:geometrie><Objecten:multivlak><gml:MultiSurface srsName="urn:ogc:def:crs:EPSG::28992">
           |<gml:surfaceMember>${gmlPolygon(ring)}</gml:surfaceMember>
           |<gml:surfaceMember>${gmlPolygon("156000 464000 156100 464000 156100 464100 156000 464000")}</gml:surfaceMember>
           |</gml:MultiSurface></Objecten:multivlak></Objecten:geometrie>""".stripMargin
      case _ => polygon(ring)
    }
    s"""<Objecten:Woonplaats>
       |<Objecten:identificatie domein="NL.IMBAG.Woonplaats">$id</Objecten:identificatie>
       |<Objecten:naam>$naam</Objecten:naam>
       |$geom
       |<Objecten:status>$status</Objecten:status>
       |${voorkomen(begin, eind)}
       |</Objecten:Woonplaats>""".stripMargin
  }

  private def gwrRel(wplId: String, gemId: String): String =
    s"""<gwr:GemeenteWoonplaatsRelatie>
       |<gwr:tijdvakgeldigheid><bagtypes:begindatumTijdvakGeldigheid>2010-01-01</bagtypes:begindatumTijdvakGeldigheid></gwr:tijdvakgeldigheid>
       |<gwr:gerelateerdeWoonplaats><gwr:identificatie>$wplId</gwr:identificatie></gwr:gerelateerdeWoonplaats>
       |<gwr:gerelateerdeGemeente><gwr:identificatie>$gemId</gwr:identificatie></gwr:gerelateerdeGemeente>
       |<gwr:status>definitief</gwr:status>
       |</gwr:GemeenteWoonplaatsRelatie>""".stripMargin

  private def openbareRuimte(id: String, naam: String, wplId: String,
      verkort: String = ""): String = {
    val v = if (verkort.nonEmpty) s"<nen5825:verkorteNaam>$verkort</nen5825:verkorteNaam>" else ""
    s"""<Objecten:OpenbareRuimte>
       |<Objecten:identificatie>$id</Objecten:identificatie>
       |<Objecten:naam>$naam</Objecten:naam>$v
       |<Objecten:type>Weg</Objecten:type>
       |<Objecten:status>Naamgeving uitgegeven</Objecten:status>
       |<Objecten:ligtIn><Objecten-ref:WoonplaatsRef>$wplId</Objecten-ref:WoonplaatsRef></Objecten:ligtIn>
       |${voorkomen("2010-01-01")}
       |</Objecten:OpenbareRuimte>""".stripMargin
  }

  private def nummer(id: String, opr: String, huisnummer: Int, postcode: String = "",
      huisletter: String = "", toevoeging: String = "", wplRef: String = "",
      begin: String = "2010-01-01", eind: String = "",
      status: String = "Naamgeving uitgegeven"): String = {
    val pc = if (postcode.nonEmpty) s"<Objecten:postcode>$postcode</Objecten:postcode>" else ""
    val hl = if (huisletter.nonEmpty) s"<Objecten:huisletter>$huisletter</Objecten:huisletter>" else ""
    val tv = if (toevoeging.nonEmpty) s"<Objecten:huisnummertoevoeging>$toevoeging</Objecten:huisnummertoevoeging>" else ""
    val wr = if (wplRef.nonEmpty) s"<Objecten:ligtIn><Objecten-ref:WoonplaatsRef>$wplRef</Objecten-ref:WoonplaatsRef></Objecten:ligtIn>" else ""
    s"""<Objecten:Nummeraanduiding>
       |<Objecten:identificatie>$id</Objecten:identificatie>
       |<Objecten:huisnummer>$huisnummer</Objecten:huisnummer>$hl$tv$pc
       |<Objecten:status>$status</Objecten:status>
       |<Objecten:ligtAan><Objecten-ref:OpenbareRuimteRef>$opr</Objecten-ref:OpenbareRuimteRef></Objecten:ligtAan>$wr
       |${voorkomen(begin, eind)}
       |</Objecten:Nummeraanduiding>""".stripMargin
  }

  private def pand(id: String, bouwjaar: Int, posList3d: String): String =
    s"""<Objecten:Pand>
       |<Objecten:identificatie>$id</Objecten:identificatie>
       |${polygon(posList3d)}
       |<Objecten:oorspronkelijkBouwjaar>$bouwjaar</Objecten:oorspronkelijkBouwjaar>
       |<Objecten:status>Pand in gebruik</Objecten:status>
       |${voorkomen("2010-01-01")}
       |</Objecten:Pand>""".stripMargin

  private def vbo(id: String, hoofd: String, panden: Seq[String],
      gebruiksdoelen: Seq[String], oppervlakte: Double, pos: String,
      neven: Seq[String] = Nil): String =
    s"""<Objecten:Verblijfsobject>
       |<Objecten:heeftAlsHoofdadres><Objecten-ref:NummeraanduidingRef domein="NL.IMBAG.Nummeraanduiding">$hoofd</Objecten-ref:NummeraanduidingRef></Objecten:heeftAlsHoofdadres>
       |${neven.map(n => s"<Objecten:heeftAlsNevenadres><Objecten-ref:NummeraanduidingRef>$n</Objecten-ref:NummeraanduidingRef></Objecten:heeftAlsNevenadres>").mkString}
       |<Objecten:identificatie>$id</Objecten:identificatie>
       |<Objecten:geometrie><Objecten:punt><gml:Point srsName="urn:ogc:def:crs:EPSG::28992"><gml:pos>$pos</gml:pos></gml:Point></Objecten:punt></Objecten:geometrie>
       |${gebruiksdoelen.map(g => s"<Objecten:gebruiksdoel>$g</Objecten:gebruiksdoel>").mkString}
       |<Objecten:oppervlakte>${oppervlakte.toInt}</Objecten:oppervlakte>
       |<Objecten:status>Verblijfsobject in gebruik</Objecten:status>
       |<Objecten:maaktDeelUitVan>${panden.map(p => s"<Objecten-ref:PandRef>$p</Objecten-ref:PandRef>").mkString}</Objecten:maaktDeelUitVan>
       |${voorkomen("2012-01-01")}
       |</Objecten:Verblijfsobject>""".stripMargin

  private def plaats(kind: String, id: String, hoofd: String, posList: String): String =
    s"""<Objecten:$kind>
       |<Objecten:heeftAlsHoofdadres><Objecten-ref:NummeraanduidingRef>$hoofd</Objecten-ref:NummeraanduidingRef></Objecten:heeftAlsHoofdadres>
       |<Objecten:identificatie>$id</Objecten:identificatie>
       |${polygon(posList)}
       |<Objecten:status>Plaats aangewezen</Objecten:status>
       |${voorkomen("2011-01-01")}
       |</Objecten:$kind>""".stripMargin

  // ---- id constants used by the assertions ----
  val num1 = "0363200000000001"   // full happy path, huisletter A, toevoeging 2
  val num2 = "0363200000000002"   // multi-pand vbo, dummy oppervlakte 999999
  val num3 = "0363200000000003"   // 1181BN-1, woonplaats override to 1050, dummy pand/opp
  val num4 = "0363200000000004"   // duplicate id, last (2015) wins
  val num6 = "0900200000000006"   // Sneek address, no vbo, empty postcode
  val num7 = "0362200000000007"   // Amstelveen address (gemeente 362 coverage)
  val num9 = "0363200000000009"   // nevenadres of vbo1
  val num20 = "0363200000000020"  // ligplaats
  val num21 = "0363200000000021"  // standplaats
  val pnd1 = "0363100000000001"; val pnd2 = "0363100000000002"
  val pnd3 = "0363100000000003"; val pnd4 = "0363100000000004"

  /** Writes the staging layout; returns (xmlDirs by zip code, gemeenten.csv path). */
  def write(root: Path): (Map[String, String], String) = {
    def put(code: String, fileToContent: (String, String)*): (String, String) = {
      val dir = root.resolve(code)
      Files.createDirectories(dir)
      fileToContent.foreach { case (f, c) =>
        Files.write(dir.resolve(f), c.getBytes(StandardCharsets.UTF_8))
      }
      code -> dir.toString
    }

    val wpl = put("9999WPL", "wpl-1.xml" -> doc(
      woonplaats("1050", "Amstelveen", "Woonplaats aangewezen", "2010-01-01", wrap = "vlak"),
      woonplaats("3594", "Amsterdam", "Woonplaats aangewezen", "2010-01-01", wrap = "multivlak"),
      woonplaats("9000", "Sneek", "Woonplaats aangewezen", "2010-01-01"),
      woonplaats("9998", "Spookstad", "Woonplaats ingetrokken", "2010-01-01"),   // F2: wrong status
      woonplaats("9997", "Verlopen", "Woonplaats aangewezen", "2000-01-01", "2005-01-01"), // F1: expired
      woonplaats("9996", "Toekomst", "Woonplaats aangewezen", "2031-01-01")))    // F1: future

    val gwr = put("GEM-WPL-RELATIE", "gwr-1.xml" -> doc(
      gwrRel("1050", "362"), gwrRel("3594", "363"), gwrRel("9000", "1900")))

    val opr = put("9999OPR", "opr-1.xml" -> doc(
      openbareRuimte("0363300000000001", "Kalverstraat", "3594"),
      openbareRuimte("0363300000000002", "Eerste Jacob van Campenstraat", "3594", verkort = "1e J.v.Campenstr"),
      openbareRuimte("0900300000000003", "Grootzand", "9000"),
      openbareRuimte("0362300000000004", "Laan Nieuwer-Amstel", "1050")))

    val num = put("9999NUM", "num-1.xml" -> doc(
      nummer(num1, "0363300000000001", 68, postcode = "2514GL", huisletter = "A", toevoeging = "2"),
      nummer(num2, "0363300000000002", 5, postcode = "1017XX"),
      nummer(num3, "0363300000000001", 1, postcode = "1181BN", wplRef = "1050"),
      nummer(num4, "0363300000000001", 7, postcode = "1111AA", begin = "2010-01-01"),
      nummer(num4, "0363300000000001", 7, postcode = "2222BB", begin = "2015-01-01"), // K2 winner
      nummer("0363200000000005", "0363300000000001", 9, postcode = "3333CC", eind = "2020-01-01"), // expired
      nummer(num6, "0900300000000003", 12),
      nummer(num7, "0362300000000004", 3, postcode = "1182GH"),
      nummer(num9, "0363300000000001", 70, postcode = "2514GL"),
      nummer(num20, "0363300000000001", 80, postcode = "1011AA"),
      nummer(num21, "0363300000000001", 81, postcode = "1011AB")))

    val pnd = put("9999PND", "pnd-1.xml" -> doc(
      pand(pnd1, 1920, "155000 463000 0 155010 463000 0 155010 463010 0 155000 463000 0"),
      pand(pnd2, 1800, "155020 463020 0 155030 463020 0 155030 463030 0 155020 463020 0"),
      pand(pnd3, 9999, "155040 463040 0 155050 463040 0 155050 463050 0 155040 463040 0"),
      pand(pnd4, 1960, "155060 463060 0 155070 463060 0 155070 463070 0 155060 463060 0")))

    val vboDoc = put("9999VBO", "vbo-1.xml" -> doc(
      vbo("0363010000000001", num1, Seq(pnd1), Seq("woonfunctie", "winkelfunctie"), 120,
        "155005 463005 0.0", neven = Seq(num9)),
      vbo("0363010000000002", num2, Seq(pnd2, pnd4), Seq("woonfunctie"), 999999, "155025 463025 0.0"),
      vbo("0363010000000003", num3, Seq(pnd3), Seq("woonfunctie"), 1, "155045 463045 0.0")))

    val lig = put("9999LIG", "lig-1.xml" -> doc(
      plaats("Ligplaats", "0363020000000001", num20,
        "155200 463200 155210 463200 155210 463210 155200 463200")))

    val sta = put("9999STA", "sta-1.xml" -> doc(
      plaats("Standplaats", "0363030000000001", num21,
        "155300 463300 155310 463300 155310 463310 155300 463300")))

    val csv = root.resolve("gemeenten.csv")
    Files.write(csv,
      ("Gemeentecode,GemeentecodeGM,Gemeentenaam,Provinciecode,ProvinciecodePV,Provincienaam\n" +
        "0362,GM0362,Amstelveen,27,PV27,Noord-Holland\n" +
        "0363,GM0363,Amsterdam,27,PV27,Noord-Holland\n" +
        "1900,GM1900,Súdwest-Fryslân,21,PV21,Fryslân\n").getBytes(StandardCharsets.UTF_8))

    (Map(wpl, gwr, opr, num, pnd, vboDoc, lig, sta), csv.toString)
  }
}
