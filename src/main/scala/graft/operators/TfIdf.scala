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
    val tf = termFrequencies(docs, textCol, idCol)
    // df is derivable from tf — one row per distinct (doc, token), so
    // the per-token row count IS the document frequency. No second
    // corpus scan or tokenize pass.
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .select(col("token"), idfMicros(col("df"), n).as("idf_micros"))
    tf.join(dfreq, "token")
      .select(col(idCol), col("token"), col("tf"),
        (col("tf") * col("idf_micros")).as("tfidf_micros"))
  }

  /** One tokenize pass → exact term frequencies per (doc, token). */
  private def termFrequencies(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Okapi BM25 relevance weights (k1 = 1.2, b = 0.75) for every
    * distinct (doc, token), in integer micros.
    *
    * Engine-exactness: with avgdl = T/N (T total tokens, N corpus
    * docs), the BM25 ratio clears its denominators to
    * {{{
    *   score = idf · 22·tf·T / (10·tf·T + 3·T + 9·dl·N)
    * }}}
    * — every term an exact int64 — and the half-up rounding of
    * num/den is itself integer arithmetic, `(2·num + den) div (2·den)`
    * (all operands positive, so both engines' floor division agrees).
    * Unlike tf·idf there is NO floating-point step beyond the already
    * margin-audited idf micros, so scores hash-match across engines
    * regardless of join or summation order. int64 headroom: num =
    * idf_micros·22·tf·T stays below 2^63 for T·tf·idf ≲ 4·10^17 —
    * far past the test corpora; at corpus sizes beyond that, divide T
    * out in floating point and margin-probe instead.
    *
    * Execution shape at scale: the single tokenize+tf aggregation
    * feeds everything — dl is Σtf per doc and df is the per-token row
    * count, so no second corpus scan. T and N are two bounded driver
    * scalars (same category as the reference's max-key collect); the
    * per-token idf table broadcasts (AQE), and the dl join shuffles on
    * the doc id that tf is already grouped by.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val n = docs.count()
    val tf = termFrequencies(docs, textCol, idCol)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val totalTokens = dl.agg(sum(col("dl"))).head().getLong(0)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .select(col("token"), idfMicros(col("df"), n).as("idf_micros"))
    tf.join(dl, idCol).join(dfreq, "token")
      .select(col(idCol), col("token"), col("tf"),
        (col("idf_micros") * lit(22L) * col("tf") * lit(totalTokens))
          .as("__num"),
        (lit(10L) * col("tf") * lit(totalTokens) + lit(3L * totalTokens) +
          lit(9L * n) * col("dl")).as("__den"))
      .select(col(idCol), col("token"), col("tf"),
        expr("(2 * __num + __den) div (2 * __den)").as("bm25_micros"))
  }
}
