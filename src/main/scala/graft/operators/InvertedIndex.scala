package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Positional inverted-index build — the search-index artifact of a
  * document corpus: one row per (token, document) carrying the exact
  * occurrence count and the sorted 1-based position list.
  *
  * Execution shape: tokenize + posexplode happen scan-side (one pass,
  * codegen'd), then ONE shuffle keyed on (token, doc) aggregates the
  * position lists. Per-group state is bounded by the document's own
  * length — positions of one token in one doc — never by corpus size,
  * so the aggregation is skew-safe up to the longest document. The
  * positions ship as a CSV string: posting lists are a storage
  * artifact (string/binary-encoded in every real index format), and a
  * scalar column keeps the result verifiable by the driver's
  * lexsort-based compare (array-typed gate columns crash it —
  * NOTES lesson).
  *
  * At 100 TB the output would be written hive-partitioned by a token
  * hash prefix so point lookups prune partitions — the same layout
  * contract the IVF index uses ([[Ivf.ensureIndex]]).
  */
object InvertedIndex {

  /** (token, idCol, n_occ, positions_csv) per distinct (token, doc). */
  def postings(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "token")))
      .select(col(idCol), col("token"),
        (col("__pos") + 1).cast("int").as("__pos1"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("n_occ"),
        array_join(sort_array(collect_list(col("__pos1"))), ",")
          .as("positions_csv"))
}
