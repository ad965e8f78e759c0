package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-LM quality scoring — the "perplexity filter" stage of a
  * pretraining pipeline (CCNet-style: train a small LM on the corpus,
  * score every document, drop the tails), realized as a bigram model
  * whose training AND scoring are two aggregation passes over the same
  * tables:
  *
  *  1. train: bigram counts c(w1,w2) and prefix counts c(w1) — plain
  *     partial+final aggregations; the shuffle carries (w1, w2,
  *     partial count), never documents.
  *  2. score: per-bigram surprisal s = round(1e6·ln(c(w1)/c(w1,w2)))
  *     in exact integer micros (the [[TfIdf]] trick: one rounding site
  *     per bigram TYPE, then pure int64 sums — cross-engine
  *     hash-stable), joined back to the per-document bigram
  *     occurrences and summed.
  *
  * A document's total surprisal divided by its bigram count is its
  * average negative log-likelihood under the corpus bigram MLE — low =
  * fluent/common phrasing, high = rare or garbled. Documents with
  * fewer than two tokens have no bigrams and no score (absent from the
  * output, matching the SQL oracle's inner joins).
  *
  * At 100 TB the model tables are corpus-vocabulary-sized (bigram
  * types, not occurrences) and live as DataFrames end-to-end — exactly
  * how a distributed n-gram LM build shards; nothing collects to the
  * driver.
  */
object LangModel {

  /** (id, w1, w2, tf): per-document bigram occurrence counts. The
    * token array is materialized once per row; the bigram explode is
    * scan-side row multiplication (no shuffle until the groupBy).
    */
  def bigramOccurrences(df: DataFrame, textCol: String,
                        idCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__t")) - 1), i =>
          struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2")))).as("b"))
      .groupBy(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("tf"))

  /** (id, n_bigrams, surprisal_micros) per document with ≥ 2 tokens.
    * surprisal_micros = Σ_occurrences round(1e6·ln(c(w1)/c(w1,w2))) —
    * exact int64 once each bigram type's micros value is fixed.
    *
    * The occurrence table feeds three consumers (bigram counts, prefix
    * counts via those, and the final scoring join) whose differing
    * pushed filters make their plan subtrees non-identical — exchange
    * reuse can NOT merge them, and an unmaterialized plan re-scans and
    * re-explodes the corpus once per consumer (verified in the
    * physical plan). So the occurrence table is materialized ONCE
    * through scratch parquet, exactly the on-disk count-table artifact
    * a production n-gram LM build writes; every downstream pass reads
    * that, not the corpus. The scored result is itself materialized so
    * the intermediate can be dropped eagerly (the [[Dedup.nearDupPairs]]
    * hygiene pattern — no scratch or cache residue outlives the call).
    */
  def bigramSurprisal(df: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    val (occ, occScratch) = Materialize.viaScratchWithPath(
      bigramOccurrences(df, textCol, idCol), "graft-lm-occ")
    val c12 = occ.groupBy(col("w1"), col("w2"))
      .agg(sum(col("tf")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val s = c12.join(c1, "w1")
      .select(col("w1"), col("w2"),
        round(lit(1000000.0) *
          log(col("c1").cast("double") / col("c12").cast("double")))
          .cast("long").as("s"))
    val scored = occ.join(s, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("s")).as("surprisal_micros"))
    val out = Materialize.viaScratch(scored, "graft-lm-score")
    occScratch.drop()
    out
  }
}
