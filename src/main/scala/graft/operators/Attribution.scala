package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution: divide each conversion's credit across
  * the touch events that preceded it.
  *
  * Model (position-based / "U-shaped", the standard 40/20/40): every
  * touch belongs to the NEXT conversion of the same user (a
  * conversion closes its attribution window; touches after the last
  * conversion earn nothing). Credit per conversion is 1,000,000
  * micros, divided:
  *   - 1 touch  → 1,000,000
  *   - 2 touches → 500,000 each
  *   - k ≥ 3    → first 400,000, last 400,000, each middle
  *     200,000 div (k−2), with the integer remainder added to the
  *     LAST touch — all-integer arithmetic, so the division is exact
  *     and deterministic (Σ credits ≡ 1,000,000 per converted
  *     window; AttributionSpec pins the conservation law).
  *
  * Execution shape: ONE shuffle on user (the running conversion
  * count + per-window rank share the same window spec), then an
  * equi-join of touches against converted window ids on
  * (user, window) — co-partitioned by the shuffle that's already
  * there, no broadcast needed, no self-join on time ranges. Linear
  * in events at any scale; per-user history depth only affects the
  * per-partition sort the window already pays.
  */
object Attribution {

  /** Per-touch credit rows: the input's columns plus `conv_id` (the
    * converting event), `pos`, `k`, and `credit_micros`.
    *
    * @param isConversion predicate marking conversion events; all
    *                     other rows are touches
    */
  def positionBased(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, isConversion: Column): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    // window index = conversions strictly before this row; a touch
    // with index i belongs to conversion #i, and conversion #i is the
    // row where the inclusive running count first reaches i+1
    val marked = events
      .withColumn("__ic", when(isConversion, 1L).otherwise(0L))
      .withColumn("__win",
        sum(col("__ic")).over(w) - col("__ic"))
    val touches = marked.filter(col("__ic") === 0).drop("__ic")
    val convs = marked.filter(col("__ic") === 1)
      .select(col(userCol).as("__cu"), col("__win").as("__cw"),
        col(idCol).as("conv_id"))
    val joined = touches.join(convs,
      col(userCol) === col("__cu") && col("__win") === col("__cw"))
      .drop("__cu", "__cw")
    val pw = Window.partitionBy(col(userCol), col("__win"))
    val credit =
      when(col("k") === 1, lit(1000000L))
        .when(col("k") === 2, lit(500000L))
        .when(col("pos") === 1, lit(400000L))
        .when(col("pos") === col("k"),
          lit(400000L) + lit(200000L) -
            (col("k") - 2) * expr("200000L div (k - 2)"))
        .otherwise(expr("200000L div (k - 2)"))
    joined
      .withColumn("k", count(lit(1)).over(pw))
      .withColumn("pos", row_number().over(
        pw.orderBy(col(tsCol), col(idCol))).cast("long"))
      .withColumn("credit_micros", credit)
      .drop("__win")
  }
}
