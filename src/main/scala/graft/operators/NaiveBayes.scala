package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial naive-Bayes text classifier — training is PURE COUNTING
  * (two grouped aggregates), inference is one join + one grouped sum,
  * so both sides scale as ordinary shuffles and the whole model is
  * engine-exact: every weight is `round(1e6·ln(p))` and every document
  * score is an exact int64 sum of those micros, which is what lets the
  * DuckDB oracle replay train AND inference bit-for-bit (the fastText-
  * class quality/language classifier stage of a curation pipeline,
  * with add-one smoothing).
  *
  * Scale shape at 100 TB: the token explode is map-side; (label, token)
  * counts are one shuffle with map-side combine; the weights relation
  * is vocabulary-sized (MBs), so inference broadcasts it and stays a
  * map-side join + one (doc, label) aggregation. No driver loop, no
  * iteration — NB is the classifier you can train in a single pass at
  * corpus scale, which is why curation pipelines reach for it first.
  */
object NaiveBayes {

  /** Train from (docId, tokens array, label) rows. Returns
    * `(weights, labelStats)`:
    *  - weights: (label, token, c_tl, w_micros) — add-one-smoothed
    *    log-likelihood `round(1e6·ln((c_tl+1)/(c_l+V)))` per observed
    *    (label, token);
    *  - labelStats: (label, c_l, v, w0_micros, prior_micros) —
    *    `w0_micros` the smoothed floor for tokens unseen under the
    *    label, `prior_micros` the log doc-frequency prior.
    */
  def train(docs: DataFrame, tokensCol: Column,
            labelCol: Column): (DataFrame, DataFrame) = {
    val base = docs.select(labelCol.as("label"), tokensCol.as("__ta"))
    // EVERYTHING derives from two materialized count tables — one
    // (label, token) aggregate (vocabulary-sized) and one per-label
    // doc count. Without the materialization each downstream consumer
    // re-executed its whole lineage: the composed train→score plan
    // scanned the corpus 10× with zero exchange reuse (the round-4
    // q_t_surprisal lesson — consumers push different projections, so
    // canonical equality never fires). Now: train = 2 corpus scans,
    // score = 1.
    val ctl = Materialize.viaScratch(
      base.select(col("label"), explode(col("__ta")).as("token"))
        .groupBy(col("label"), col("token"))
        .agg(count(lit(1)).as("c_tl")),
      "graft_nb_ctl")
    val nl = Materialize.viaScratch(
      base.groupBy(col("label")).agg(count(lit(1)).as("n_l")),
      "graft_nb_nl")
    val vocab = ctl.agg(countDistinct(col("token")).as("v"))
    val cl = ctl.groupBy(col("label")).agg(sum(col("c_tl")).as("c_l"))
    val nDocs = nl.agg(sum(col("n_l")).as("nn"))
    val labelStats = cl
      .join(broadcast(nl), "label")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nDocs))
      .select(col("label"), col("c_l"), col("v"),
        round(log(lit(1.0) / (col("c_l") + col("v")).cast("double"))
          * 1000000).cast("long").as("w0_micros"),
        round(log(col("n_l").cast("double") / col("nn")) * 1000000)
          .cast("long").as("prior_micros"))
    val weights = ctl
      .join(broadcast(labelStats.select(col("label"), col("c_l"), col("v"))),
        "label")
      .select(col("label"), col("token"), col("c_tl"),
        round(log((col("c_tl") + 1).cast("double")
          / (col("c_l") + col("v")).cast("double")) * 1000000)
          .cast("long").as("w_micros"))
    (weights, labelStats)
  }

  /** Score (docId, tokens array) rows against a trained model:
    * per document, `argmax over labels of prior + Σ token weights`
    * (unseen tokens take the label's smoothed floor; empty-token
    * documents produce no row — they carry no evidence). Ties break
    * by label ascending, so the argmax is total. Output:
    * (docIdCol, pred_label, score_micros).
    */
  def score(docs: DataFrame, docIdCol: String, tokensCol: Column,
            weights: DataFrame, labelStats: DataFrame): DataFrame = {
    val docTok = docs.select(col(docIdCol), explode(tokensCol).as("token"))
    val w = Window.partitionBy(col(docIdCol))
      .orderBy(col("score_micros").desc, col("label"))
    docTok
      .crossJoin(broadcast(labelStats.select(col("label"),
        col("w0_micros"), col("prior_micros"))))
      .join(broadcast(weights.select(col("label"), col("token"),
        col("w_micros"))), Seq("label", "token"), "left")
      .select(col(docIdCol), col("label"), col("prior_micros"),
        coalesce(col("w_micros"), col("w0_micros")).as("w"))
      .groupBy(col(docIdCol), col("label"), col("prior_micros"))
      .agg(sum(col("w")).as("like_micros"))
      .select(col(docIdCol), col("label"),
        (col("prior_micros") + col("like_micros")).as("score_micros"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(docIdCol), col("label").as("pred_label"),
        col("score_micros"))
  }
}
