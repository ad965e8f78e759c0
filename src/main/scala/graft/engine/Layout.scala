package graft.engine

import org.apache.spark.sql.{Column, DataFrame}

/** Physical-layout control for scan pruning.
  *
  * Parquet keeps min/max statistics per row group; a filtered scan
  * skips row groups (and with file-level stats, whole files) whose
  * range cannot match. That only pays off if the data is LAID OUT so
  * ranges are narrow — which is a write-time decision:
  * `repartitionByRange` clusters rows by the pruning columns into
  * disjoint file ranges, `sortWithinPartitions` narrows row-group
  * ranges inside each file. At 100 TB this is the difference between
  * "filter on ship date reads 3 files" and "reads all 30,000".
  *
  * (Single-column range layout; a Z-order curve generalizes this to
  * multi-column pruning — the single-column form covers the dominant
  * time-partitioned access pattern.)
  */
object Layout {

  /** Write `df` range-clustered and sorted on `cols` into
    * `numFiles` files with pairwise-disjoint value ranges
    * (LayoutSpec asserts the disjointness from the written files).
    */
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
                       cols: Column*): Unit =
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
}
