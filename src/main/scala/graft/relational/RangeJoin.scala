package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join — match each point to every interval
 * that contains it. Spark's optimizer turns a bare
 * `p.t BETWEEN iv.start AND iv.end` predicate into a nested-loop/cartesian
 * plan (no equi-key), which is quadratic at scale.
 *
 * Scale formulation: quantize time into fixed-width bins. Each interval
 * explodes into the bins it covers (`sequence(start div w, end div w)`),
 * each point maps to exactly ONE bin (`t div w`), and the match becomes a
 * plain equi-join on the bin id followed by the exact containment filter.
 * Because a point owns a single bin, no dedup is needed — every
 * (interval, point) pair is produced at most once.
 *
 * Cost: |intervals| * (span/w + 1) exploded rows + one shuffle of both
 * sides on the bin id. Choose `binWidth` near the typical interval span so
 * intervals explode into O(1) bins; a hot bin (many co-located points) is
 * an ordinary equi-join skew, addressable with [[Skew]] salting.
 */
object RangeJoin {

  /**
   * @param intervals (id..., start, end) — inclusive bounds, numeric (e.g.
   *                  epoch nanos); column names must not collide with points
   * @param points    (id..., time) — same numeric domain
   * @param binWidth  bin quantum in the time columns' unit
   */
  def rangeJoin(intervals: DataFrame, points: DataFrame, start: String,
                end: String, time: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // `div` is integral long division — float division would lose exactness
    // above 2^53 (epoch-nanos territory) and mis-bin boundary points
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$start div $binWidth"), expr(s"$end div $binWidth"))))
    val pt = points.withColumn("__bin", expr(s"$time div $binWidth"))
    iv.join(pt, "__bin")
      .filter(col(time) >= col(start) && col(time) <= col(end))
      .drop("__bin")
  }

  /**
   * Interval-OVERLAP join — pairs (a, b) with `a.start <= b.end AND
   * b.start <= a.end` (inclusive bounds): the session-overlap /
   * validity-intersection sibling of [[rangeJoin]]'s point-in-interval.
   * A bare two-inequality predicate is a cartesian at scale; here both
   * sides explode to their covered bins and equi-join on
   * (`keys`..., bin). Unlike the point case, an overlapping pair can
   * share MANY bins — the dedup that would normally need its own
   * pair-keyed exchange is eliminated by BIN OWNERSHIP instead: every
   * overlapping pair's intersection starts at `greatest(a.start,
   * b.start)`, which lies in exactly one bin, and the post-join filter
   * keeps the pair only in that bin. Exactly-once by construction, no
   * distinct, no second shuffle.
   *
   * Cost: each side explodes to span/w + 1 rows; one shuffle of both
   * sides on (keys, bin). Same binWidth guidance as [[rangeJoin]];
   * `keys` (e.g. the user id of per-user sessions) both shrinks bins
   * and makes the join key selective.
   *
   * Column names must be disjoint across the two frames apart from
   * `keys`.
   */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String],
                          startL: String, endL: String,
                          startR: String, endR: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin",
      explode(sequence(expr(s"$startL div $binWidth"), expr(s"$endL div $binWidth"))))
    val r = right.withColumn("__bin",
      explode(sequence(expr(s"$startR div $binWidth"), expr(s"$endR div $binWidth"))))
    l.join(r, keys :+ "__bin")
      .filter(col(startL) <= col(endR) && col(startR) <= col(endL))
      // ownership: keep the pair only in the bin where its intersection
      // starts — greatest(startL, startR) div binWidth
      .filter(col("__bin") === expr(s"greatest($startL, $startR) div $binWidth"))
      .drop("__bin")
  }
}
