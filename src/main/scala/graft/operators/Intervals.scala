package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed [start, end] spans — the time-range
  * counterpart of the token-span machinery in `Dedup.duplicateSpans`.
  * A training pipeline meets this shape constantly: merging user
  * activity spans into sessions-with-duration, collapsing redaction
  * spans before cutting text, computing covered-airtime per device.
  *
  * Beyond-reference (the reference pipeline has no interval logic);
  * built as the classic islands-and-gaps window composition:
  *
  *   1. per key, sort spans by (start, end, tiebreak);
  *   2. a span OPENS a new island iff its start exceeds the running
  *      max end of every earlier span (strictly: touching spans
  *      [1,5],[5,9] merge — closed-interval semantics);
  *   3. island id = running count of opens; one aggregation folds each
  *      island to (min start, max end, n).
  *
  * Scale shape: ONE shuffle on the key, one in-partition sort shared
  * by both windows, one partial-aggregated groupBy — linear in spans,
  * no self-join (the naive overlap-join is quadratic per key and was
  * never on the table). Island segmentation is insensitive to the
  * order of start-ties: a tied span's start can never exceed the
  * earlier twin's end, so neither order opens an island between them
  * — which is what lets the DuckDB oracle replay the same windows
  * without pinning a total order.
  */
object Intervals {

  /** Merge overlapping-or-touching [start, end] spans per key.
    * `startCol`/`endCol` must be orderable integers (micros
    * recommended); output is one row per merged island:
    * (key, island_start, island_end, n_spans).
    */
  def coalesceSpans(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__open",
        when(col(startCol) > coalesce(prevMaxEnd, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__open")).over(
        ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_spans"))
      .drop("__island")
  }

  /** Total covered length per key after merging — Σ (end - start) of
    * the islands. With closed-span micros this is exact coverage with
    * overlaps counted once.
    */
  def coverage(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame =
    coalesceSpans(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(sum(col("island_end") - col("island_start")).as("covered"),
        count(lit(1)).as("n_islands"),
        sum(col("n_spans")).as("n_spans"))
}
