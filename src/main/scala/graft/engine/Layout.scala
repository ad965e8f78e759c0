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

  /** Multi-column layout: cluster by the Z-order (Morton) value of the
    * given numeric columns, so every file's min/max is narrow in EVERY
    * listed column — filters on any of them prune files/row-groups,
    * where a plain range sort only prunes on its leading column.
    *
    * Each column is min/max-normalized to `bits` bits before
    * interleaving — WITHOUT normalization a wide column's high bits
    * dominate the curve and the narrow columns get no clustering at
    * all (the standard z-order pitfall). The min/max aggregate is one
    * small driver round-trip per write, same category as the
    * reference's max(key) collect.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    bits: Int, cols: Column*): Unit =
    zOrderedDf(df, numFiles, bits, cols: _*)
      .write.mode("overwrite").parquet(path)

  /** The z-order clustering PLAN without the sink: `df` range-
    * partitioned and sorted on the interleaved z-value of `cols`
    * (dropped again before return). Shared by [[writeZOrdered]] and
    * [[VersionedTable.compactZOrdered]] so the normalization
    * arithmetic lives once.
    */
  def zOrderedDf(df: DataFrame, numFiles: Int,
                 bits: Int, cols: Column*): DataFrame = {
    import org.apache.spark.sql.functions._
    val stats = df.agg(
      cols.flatMap(c => Seq(min(c).cast("long"), max(c).cast("long"))).head,
      cols.flatMap(c => Seq(min(c).cast("long"), max(c).cast("long"))).tail: _*
    ).head()
    val scale = (1L << bits) - 1
    val normalized = cols.zipWithIndex.map { case (c, i) =>
      // all-null column → no stats; every value normalizes to 0 (nulls
      // are bucket 0 in the z-value anyway)
      val lo = if (stats.isNullAt(2 * i)) 0L else stats.getLong(2 * i)
      val hi = if (stats.isNullAt(2 * i + 1)) lo else stats.getLong(2 * i + 1)
      // (x−lo)·scale overflows int64 once the column range exceeds
      // Long.Max/scale (an epoch-nano span of a few decades already
      // does at bits=16 — ANSI mode would throw, legacy mode would
      // wrap every value into bucket 0), and hi−lo itself can overflow
      // for mixed-sign ranges. The stats are driver-known, so pick the
      // arithmetic per column: fast long ops when they provably can't
      // overflow (the common case — decimal costs ~2× per row),
      // decimal(38,0) otherwise (20-digit range × 5-digit scale fits
      // exactly). Integral `div` keeps the quotient exact either way,
      // where a double division would lose low bits past 2^53.
      val range = (BigInt(hi) - BigInt(lo)).max(BigInt(1))
      if (range <= BigInt(Long.MaxValue / scale))
        call_function("div",
          (c.cast("long") - lit(lo)) * lit(scale), lit(range.toLong))
      else {
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        call_function("div",
          (c.cast("long").cast(dec38) -
            lit(java.math.BigDecimal.valueOf(lo)).cast(dec38)) * lit(scale),
          lit(new java.math.BigDecimal(range.bigInteger)))
      }
    }.map(_.cast("long"))
    val z = graft.functions.NativeExpressions.zorder(bits, normalized: _*)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  // ── File-level data skipping ────────────────────────────────────────

  private def statsPath(tablePath: String): String = tablePath + "__stats"

  /** Build + persist the per-file min/max manifest over `cols` — the
    * lakehouse data-skipping index (Delta's stats / Iceberg's
    * manifests, re-expressed as a tiny parquet side table). ONE
    * distributed aggregation groups by `input_file_name()`; the
    * manifest has one row per data file, so its size is O(files) and
    * reading it is a driver-scale operation no matter how big the
    * table is. Rebuild after every rewrite (the write paths above are
    * full overwrites, so staleness is all-or-nothing — a stale
    * manifest names files that no longer exist and fails loudly, never
    * silently wrong).
    *
    * The manifest stores file NAMES, not absolute paths, and readers
    * resolve them against the table path they were handed. Absolute
    * `input_file_name()` URIs freeze the BUILD location into the
    * artifact — a table built in a staging directory and renamed into
    * place (the build-then-publish pattern every atomic writer uses,
    * including [[Scratch.ensureAt]]) would carry a manifest full of
    * paths that no longer exist.
    */
  def writeFileStats(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String, cols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(tablePath)
      .groupBy(regexp_replace(input_file_name(), "^.*/", "").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath(tablePath))
  }

  /** Interval read through the manifest: open ONLY the files whose
    * [min, max] intersects [lo, hi], then apply the exact filter to
    * the survivors. A skipped file provably contains no matching row
    * (its range misses the interval; all-null files have null stats
    * and are skipped — BETWEEN excludes nulls anyway), so the result
    * is EXACTLY the full-scan filter. At 100 TB this turns "filter on
    * ship date" from 30,000 file opens into the 3 the layout
    * (writeRangeSorted / writeZOrdered) confined the range to.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession,
                 tablePath: String, colName: String,
                 lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(statsPath(tablePath))
    // file list = driver metadata, same category as the planner's own
    // file listing; one row per file by construction. Names resolve
    // against the CURRENT table path (see writeFileStats: the
    // manifest is location-independent by design).
    val files = stats
      .filter(col(s"max_$colName") >= lit(lo) &&
        col(s"min_$colName") <= lit(hi))
      .select(col("file")).collect()
      .map(r => s"$tablePath/${r.getString(0)}")
    val pred = col(colName).between(lit(lo), lit(hi))
    if (files.isEmpty)
      // full-table relation ONLY here (schema for the empty result):
      // building it unconditionally would pay the full O(files)
      // listing the manifest exists to avoid
      spark.read.parquet(tablePath).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).filter(pred)
  }

  /** Read the table THROUGH its manifest: exactly the files the
    * manifest lists (the visibility contract [[deleteMatching]]
    * relies on — data files not in the manifest are invisible,
    * whatever else sits in the directory).
    */
  def manifestRead(spark: org.apache.spark.sql.SparkSession,
                   tablePath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val files = spark.read.parquet(statsPath(tablePath))
      .select(col("file")).collect()
      .map(r => s"$tablePath/${r.getString(0)}")
    require(files.nonEmpty, s"empty manifest at ${statsPath(tablePath)}")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Targeted DELETE through the manifest — the GDPR/retention
    * rewrite at lakehouse scale: only the files whose [min, max]
    * intersects the doomed interval are rewritten; every other file
    * is untouched bytes (at 100 TB with a range-clustered layout
    * that is 3 files out of 30,000, not a table rewrite). Returns
    * (rewritten, untouched) file counts.
    *
    * Protocol (manifest = the visibility pointer):
    *  1. survivors of the dirty files are written to a staging
    *     sibling, then MOVED into the table dir under fresh names —
    *     invisible to manifest readers until step 2;
    *  2. the manifest is atomically replaced: untouched files keep
    *     their existing rows (their stats cannot have changed), new
    *     files get freshly aggregated rows — an incremental update,
    *     not a full-table re-scan;
    *  3. the dirty files are deleted — now-unlisted garbage either
    *     way, invisible to [[manifestRead]]/[[prunedRead]] consumers.
    * A crash before 2 leaves the table and manifest exactly as they
    * were (staging/unlisted files are inert); a crash between 2 and 3
    * leaves unlisted garbage a later [[deleteMatching]] or cleanup
    * sweep removes. Plain `spark.read.parquet(dir)` readers do NOT
    * get this isolation (they would see unlisted files) — a table
    * maintained this way is read through its manifest, period.
    */
  def deleteMatching(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String, colName: String,
                     lo: Any, hi: Any): (Long, Long) = {
    import org.apache.spark.sql.functions._
    rewriteMatching(spark, tablePath, colName, lo, hi,
      _.filter(!col(colName).between(lit(lo), lit(hi))))
  }

  /** Copy-on-write UPDATE through the manifest — [[deleteMatching]]'s
    * file-pruned protocol with an arbitrary rewrite of the dirty
    * files' content (the caller's `rewrite` sees exactly those files'
    * rows and returns their replacement; rows outside the interval
    * pass through it too, so a row-level update writes
    * `when(matching, new).otherwise(old)`). Untouched files stay
    * untouched bytes; same crash/visibility contract.
    */
  def updateMatching(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String, colName: String,
                     lo: Any, hi: Any)
                    (rewrite: DataFrame => DataFrame): (Long, Long) =
    rewriteMatching(spark, tablePath, colName, lo, hi, rewrite)

  private def rewriteMatching(spark: org.apache.spark.sql.SparkSession,
                              tablePath: String, colName: String,
                              lo: Any, hi: Any,
                              rewrite: DataFrame => DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val hadoopPath = new org.apache.hadoop.fs.Path(tablePath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = spark.read.parquet(statsPath(tablePath))
    val dirtyPred = col(s"max_$colName") >= lit(lo) &&
      col(s"min_$colName") <= lit(hi)
    val dirty = stats.filter(dirtyPred)
      .select(col("file")).collect().map(_.getString(0))
    val untouched = stats.filter(!dirtyPred)
    val nUntouched = untouched.count()
    if (dirty.isEmpty) return (0L, nUntouched)

    // 1. rewritten content of the dirty files → staging, then move in
    //    under fresh names
    val staging = new org.apache.hadoop.fs.Path(
      tablePath + "__rewrite_" + java.util.UUID.randomUUID().toString.take(8))
    rewrite(
      spark.read.parquet(dirty.map(n => s"$tablePath/$n").toIndexedSeq: _*))
      .write.parquet(staging.toString)
    val moved = fs.listStatus(staging)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val name = s"rw-${java.util.UUID.randomUUID().toString.take(8)}-" +
          st.getPath.getName
        if (!fs.rename(st.getPath, new org.apache.hadoop.fs.Path(
          hadoopPath, name)))
          throw new java.io.IOException(
            s"deleteMatching: could not move ${st.getPath} into $tablePath")
        name
      }
    fs.delete(staging, true)

    // 2. incremental manifest swap (stats of NEW files only; untouched
    //    rows carried over verbatim)
    val cols = stats.columns.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
    val newRows =
      if (moved.isEmpty) untouched
      else {
        val aggs = cols.toSeq.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        untouched.unionByName(
          spark.read.parquet(moved.map(n => s"$tablePath/$n").toIndexedSeq: _*)
            .groupBy(regexp_replace(input_file_name(), "^.*/", "").as("file"))
            .agg(aggs.head, aggs.tail: _*))
      }
    val statsDir = new org.apache.hadoop.fs.Path(statsPath(tablePath))
    val statsStaging = new org.apache.hadoop.fs.Path(
      statsPath(tablePath) + "._new")
    newRows.coalesce(1).write.mode("overwrite").parquet(statsStaging.toString)
    fs.delete(statsDir, true)
    if (!fs.rename(statsStaging, statsDir))
      throw new java.io.IOException(
        s"deleteMatching: could not publish manifest at $statsDir")

    // 3. dirty files are unlisted garbage now
    dirty.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/$n"), false))
    (dirty.length.toLong, nUntouched)
  }

  /** Delete AGED data files the manifest does not list — the cleanup
    * sweep for [[deleteMatching]]/[[updateMatching]] crash leftovers
    * (a crash after the manifest swap leaves the replaced files
    * unlisted; a crash before it leaves the moved-in survivors
    * unlisted — both invisible to manifest readers, both garbage).
    * Only files older than `olderThanMs` go: a FRESH unlisted file
    * may be a concurrent rewrite's staging mid-publish (same age
    * heuristic as [[VersionedTable.vacuum]]'s staging sweep). Returns
    * the deleted names.
    */
  def vacuumUnlisted(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String,
                     olderThanMs: Long = 3600000L): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed = spark.read.parquet(statsPath(tablePath))
      .select(org.apache.spark.sql.functions.col("file"))
      .collect().map(_.getString(0)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    fs.listStatus(dir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.endsWith(".parquet") && !listed(n) &&
          st.getModificationTime < cutoff
      }
      .map { st => fs.delete(st.getPath, false); st.getPath.getName }
  }

  /** How many files [[prunedRead]] would open for the interval —
    * the observability hook LayoutExtensionsSpec pins pruning with.
    */
  def filesForInterval(spark: org.apache.spark.sql.SparkSession,
                       tablePath: String, colName: String,
                       lo: Any, hi: Any): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(statsPath(tablePath))
    val total = stats.count()
    val kept = stats.filter(col(s"max_$colName") >= lit(lo) &&
      col(s"min_$colName") <= lit(hi)).count()
    (kept, total)
  }
}
