package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the time-series alignment operator
  * Spark's DataFrame API lacks (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`): for every left row, attach the single right row with
  * the LATEST `right.ts <= left.ts` for the same key; left rows with
  * no prior right row keep null payload (ASOF LEFT JOIN semantics).
  *
  * Composition — built-ins express the exact semantics (custom-plan
  * preference (a)): tag and union both sides, ONE hash-shuffle + sort
  * on (key; ts, side), then carry the most recent right payload
  * forward with `last(_, ignoreNulls = true)` over
  * rows-unbounded-preceding..current, and keep the left rows. Right
  * rows sort BEFORE left rows at equal ts (side 0 < 1), which is what
  * makes the match inclusive.
  *
  * Scale: this is the plan a native as-of operator would pick — the
  * |L|+|R| sort-shuffle on the key is the inherent cost, and the
  * running window state is one row. (The engine's top-k paths avoid
  * windows because a bounded aggregator can carry k rows per key
  * through the shuffle instead of sorting all scores; here every left
  * row needs its positional predecessor, so the sort IS the
  * semantics, not avoidable work.)
  *
  * Requirements: left/right payload column names must be disjoint,
  * and right must have at most one row per (key, ts) — otherwise
  * "the" latest prior row is ambiguous (DuckDB's ASOF has the same
  * caveat).
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == tsCol)
    val overlap = leftPayload.toSet.intersect(rightPayload.toSet)
    require(overlap.isEmpty,
      s"asofJoin: payload columns must be disjoint, both sides have: $overlap")

    // the right payload travels as ONE struct so the carry-forward is
    // all-or-nothing per right row: per-COLUMN last(ignoreNulls) would
    // backfill a null field from an OLDER right row, stitching together
    // a row that never existed (a null purchase_value must stay null
    // when its purchase_id matches)
    val rStruct = struct(rightPayload.map(col).toIndexedSeq: _*)
    val rNull = lit(null).cast(
      org.apache.spark.sql.types.StructType(rightPayload.map(c =>
        org.apache.spark.sql.types.StructField(c, right.schema(c).dataType,
          nullable = true)).toIndexedSeq))
    // a null-timestamp right row would sort NULLS FIRST and be carried
    // forward as a phantom "earliest" match for every left row —
    // DuckDB ASOF / pandas merge_asof exclude null times, so do we.
    // (Null-ts LEFT rows keep left-join semantics: they sort before
    // every real right row, match nothing, and emit null payload.)
    val rightClean = right.filter(col(tsCol).isNotNull)
    val lTagged = left.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        leftPayload.map(col) :+ rNull.as("__r")).toIndexedSeq: _*)
    val rTagged = rightClean.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r")).toIndexedSeq: _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.union(rTagged)
      .select((Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftPayload.map(col) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__r")).toIndexedSeq: _*)
      .filter(col("__side") === 1)
      .select((Seq(col(keyCol), col(tsCol)) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"__r.$c").as(c))).toIndexedSeq: _*)
  }
}
