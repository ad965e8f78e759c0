package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25) with a vector ranking (ANN cosine) is how production search
  * actually serves, and reciprocal-rank fusion is the standard
  * score-free way to do it: each list contributes `1/(k0 + rank)` per
  * document, so agreement across lists dominates any single list's
  * scores and no score calibration between BM25-space and
  * cosine-space is needed.
  *
  * Determinism contract (the repo-wide oracle discipline): each
  * contribution rounds to integer MICROS once per (list, rank) —
  * `round(1e6 / (k0 + rank))` — and everything downstream is int64
  * sums, so the fused scores hash-match across engines and
  * partitionings. Ties break by document id.
  *
  * Scale shape: one union of (q, doc, contrib) triples (each list is
  * already top-k-per-query sized, i.e. tiny relative to the corpus),
  * one groupBy (q, doc), and a per-query window over ≤ lists×k rows —
  * never anything corpus-sized.
  */
object Fusion {

  /** Fuse ranked lists sharing (qCol, dCol, rankCol) columns, rank 1 =
    * best. Output: (q, doc, rrf_micros, n_lists) plus `fused_rank`
    * (per-query position) when `topN > 0`, keeping only ranks ≤ topN.
    */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60, topN: Int = 0,
          qCol: String = "q_id", dCol: String = "n_id",
          rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(k0 > 0, s"k0 must be positive: $k0")
    val contribs = rankings.map(df => df.select(col(qCol), col(dCol),
      round(lit(1000000.0) / (lit(k0) + col(rankCol)))
        .cast("long").as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(qCol), col(dCol))
      .agg(sum(col("__c")).as("rrf_micros"),
        count(lit(1)).as("n_lists"))
    if (topN <= 0) fused
    else {
      import org.apache.spark.sql.expressions.Window
      fused
        .withColumn("fused_rank",
          row_number().over(Window.partitionBy(col(qCol))
            .orderBy(col("rrf_micros").desc, col(dCol))).cast("int"))
        .filter(col("fused_rank") <= topN)
    }
  }
}
