package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF term weighting over a document corpus — the relevance
  * primitive behind corpus search, keyword extraction, and quality
  * filtering.
  *
  * Engine-exactness: the only floating-point step is the per-TOKEN idf
  * constant, fixed to integer micros as `round(1e6 · ln(N/df))` — the
  * per-(doc, token) score is then the exact int64 product
  * `tf · idf_micros`, so results hash-match across engines
  * independent of join/aggregation order. (Round-boundary margin of
  * the idf on the test corpora audited at ≥ 0.01 — see NOTES.md
  * margin-probe discipline; a raw double tf·idf would drift.)
  *
  * Execution shape at scale: one tokenize pass feeds two aggregations —
  * tf on (doc, token), df on token (array_distinct scan-side bounds
  * the df explode at distinct-tokens-per-doc). The vocabulary table is
  * orders of magnitude smaller than the corpus, so the idf join
  * broadcasts (AQE); the corpus count is one scalar driver round-trip
  * (the same bounded category as the reference's max-key collect).
  */
object TfIdf {

  /** idf in integer micros for a df column, given corpus size n. */
  def idfMicros(df: Column, n: Long): Column =
    round(lit(1e6) * log(lit(n.toDouble) / df)).cast("long")

  /** (id, token, tf, tfidf_micros) for every distinct (doc, token). */
  def tfIdf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val n = docs.count()
    val tf = docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df is derivable from tf — one row per distinct (doc, token), so
    // the per-token row count IS the document frequency. No second
    // corpus scan or tokenize pass.
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .select(col("token"), idfMicros(col("df"), n).as("idf_micros"))
    tf.join(dfreq, "token")
      .select(col(idCol), col("token"), col("tf"),
        (col("tf") * col("idf_micros")).as("tfidf_micros"))
  }
}
