package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — point-in-interval matching, the second
  * classic operator Spark's planner lacks a fast path for: a plain
  * `l.ts BETWEEN r.start AND r.end` condition plans as a
  * broadcast-nested-loop or cartesian product, O(|L|·|R|) comparisons.
  *
  * Scale path (the standard bin-bucketing rewrite): pick a bin width,
  * explode every interval into the bins it covers, map every point to
  * its single bin, EQUI-join on (key…, bin), then post-filter the
  * exact containment. Cost: one hash-shuffle of |L| + |R|·(avg
  * interval length / binWidth) rows — the planner gets a shuffled
  * hash join it can also broadcast. Each (point, interval) pair meets
  * in exactly ONE bin (the point's), so no dedup pass is needed.
  *
  * Pick `binWidthMicros` near the typical interval length: too small
  * multiplies the exploded interval rows, too large widens the
  * post-filter's false-candidate set (row count per bin), never
  * correctness.
  */
object RangeJoin {

  /** Join `points` (timestamp `pointCol`) to `intervals`
    * ([`startCol`, `endCol`] inclusive, timestamps) sharing `keyCols`,
    * keeping point rows with every interval that contains them
    * (inner-join multiplicity).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      binWidthMicros: Long = 3600L * 1000000L): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    val p = points.withColumn("__bin",
      floor(unix_micros(col(pointCol)) / binWidthMicros))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binWidthMicros),
        floor(unix_micros(col(endCol)) / binWidthMicros))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap variant: pairs of rows whose [start, end]
    * intervals intersect. A pair can share several bins, so overlaps
    * are attributed to the FIRST shared bin (a standard trick:
    * keep the match only in bin max(floor(startA), floor(startB)) —
    * each overlapping pair survives exactly once, no distinct pass).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String],
                      startCols: (String, String), endCols: (String, String),
                      binWidthMicros: Long = 3600L * 1000000L): DataFrame = {
    val (sa, sb) = startCols
    val (ea, eb) = endCols
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        floor(unix_micros(col(s)) / binWidthMicros),
        floor(unix_micros(col(e)) / binWidthMicros))))
    val first: Column = greatest(
      floor(unix_micros(col(sa)) / binWidthMicros),
      floor(unix_micros(col(sb)) / binWidthMicros))
    binned(left, sa, ea).join(binned(right, sb, eb), keyCols :+ "__bin")
      .filter(col(sa) <= col(eb) && col(sb) <= col(ea))
      .filter(col("__bin") === first)
      .drop("__bin")
  }
}
