package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension maintenance — history-preserving merge, the
  * companion to [[ScdType1]]'s overwrite-in-place semantics.
  *
  * The reference keeps only Type-1 dimensions (`3(1)_Gold_dim_model.py`
  * overwrites changed attributes); a production warehouse tracking
  * attribute history needs the Type-2 shape: a changed attribute CLOSES
  * the current version (stamping `effective_to`) and OPENS a new one,
  * so every fact can join to the dimension's state as-of its own
  * timestamp.
  *
  * Version columns are caller-visible contract, not internals:
  * `effective_from: Long` (batch version that opened the row),
  * `effective_to: Long` (batch version that closed it; null = open),
  * `is_current: Boolean` (exactly one open row per key).
  *
  * Semantics per (key) against an updates SNAPSHOT batch:
  *  - closed history rows pass through untouched;
  *  - current row + matching update with equal tracked attrs → pass
  *    through (idempotent re-delivery of a snapshot is a no-op);
  *  - current row + matching update with any attr changed (null-safe
  *    comparison) → closed copy (`effective_to = batch`) PLUS a new
  *    open row (`effective_from = batch`);
  *  - update key absent from the dimension → new open row;
  *  - current key absent from the snapshot → pass through (a missing
  *    key is "no news", not a delete — deletes are an explicit CDC
  *    operation, [[Upsert.applyChanges]]).
  *
  * Execution shape (100 TB): ONE equi-join of the current slice
  * against the batch on the natural key decides every case — history
  * rows never enter the join (they are filtered before it and unioned
  * back), so the shuffle carries one row per live key, not the whole
  * history. The batch side broadcasts when small (daily dim deltas
  * usually are; Catalyst/AQE decides from stats). No window functions,
  * no driver round-trips.
  */
object ScdType2 {

  /** Initial load: every row opens at `batch` with open-ended
    * validity.
    */
  def initial(snapshot: DataFrame, batch: Long = 0L): DataFrame =
    snapshot
      .withColumn("effective_from", lit(batch))
      .withColumn("effective_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

  /** Merge one snapshot batch into a Type-2 dimension produced by
    * [[initial]] or a previous [[merge]].
    *
    * @param dim     current dimension content (key ++ attrs ++ the
    *                three version columns)
    * @param updates snapshot batch (key ++ attrs)
    * @param key     natural-key columns
    * @param attrs   tracked attribute columns
    * @param batch   version stamp for rows closed/opened by this merge
    */
  def merge(dim: DataFrame, updates: DataFrame, key: Seq[String],
            attrs: Seq[String], batch: Long): DataFrame = {
    val versionCols = Seq("effective_from", "effective_to", "is_current")
    val outCols = (key ++ attrs ++ versionCols).map(col)
    require((key ++ attrs ++ versionCols).forall(dim.columns.contains),
      s"dim must carry ${key ++ attrs ++ versionCols}, has ${dim.columns.toSeq}")
    require((key ++ attrs).forall(updates.columns.contains),
      s"updates must carry ${key ++ attrs}, has ${updates.columns.toSeq}")

    val hist = dim.filter(!col("is_current"))
    val cur = dim.filter(col("is_current"))
    // the updates snapshot keyed once; u_ prefixes keep the join output
    // unambiguous without lineage-qualified access
    val u = updates.select((key ++ attrs).map(c => col(c).as(s"__u_$c")): _*)
    val joined = cur.join(
      u, key.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _), "full_outer")

    val matched = key.map(c => col(c).isNotNull).reduce(_ && _) &&
      key.map(c => col(s"__u_$c").isNotNull).reduce(_ && _)
    val changed: Column = attrs
      .map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    // current rows that survive as-is: unmatched, or matched-unchanged
    val carried = joined.filter(!matched || !changed).filter(col("is_current"))
      .select(outCols: _*)
    // matched-changed: the closed copy of the old version
    val closed = joined.filter(matched && changed)
      .select((key ++ attrs).map(col) :+ col("effective_from"): _*)
      .withColumn("effective_to", lit(batch))
      .withColumn("is_current", lit(false))
      .select(outCols: _*)
    // opened rows: matched-changed (new attrs) plus brand-new keys
    val opened = joined
      .filter((matched && changed) ||
        key.map(c => col(c).isNull).reduce(_ && _))
      .select((key ++ attrs).map(c => col(s"__u_$c").as(c)): _*)
      .withColumn("effective_from", lit(batch))
      .withColumn("effective_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
      .select(outCols: _*)

    hist.select(outCols: _*)
      .unionByName(carried).unionByName(closed).unionByName(opened)
  }
}
