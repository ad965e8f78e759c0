package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Importance-resampling data selection (the DSIR recipe: fit cheap
  * bag-of-features models on a small TARGET domain and on the RAW
  * corpus, weight every raw document by its target/raw log-likelihood
  * ratio, keep the top of the distribution — selecting raw data that
  * "looks like" the target without a trained classifier).
  *
  * Model and score, concretely (unigram features):
  * {{{
  *   log w(x) = Σ_tokens n_w(x) · s_w
  *   s_w = ln( (c_t(w)+1) / (N_t+V) ) − ln( (c_r(w)+1) / (N_r+V) )
  * }}}
  * with c the per-corpus token counts, N the token totals, V the
  * union vocabulary (add-one smoothing over it, so target-unseen
  * tokens score negative instead of −∞). Each token TYPE's `s_w`
  * rounds to integer micros exactly once ([[LangModel]]'s
  * determinism trick); per-document scores are then pure int64
  * dot products — bit-stable across engines and partitionings.
  *
  * Scale shape: the models are VOCABULARY-sized aggregate tables,
  * never driver-side; the corpus shuffles only (id, token, n)
  * triples; the three scalars (N_t, N_r, V) ride along as
  * broadcast one-row joins. [[hashedWeights]] is the production
  * variant for unbounded vocabularies: features hash into a FIXED
  * number of buckets, so the model's size — and the broadcast that
  * ships the score table — is a constant regardless of corpus size
  * (collisions merge rare features; DsirSpec pins that a
  * collision-free bucketing reproduces the exact unhashed scores).
  */
object Dsir {

  /** (id, w, n): per-document token occurrence counts. */
  def tokenOccurrences(df: DataFrame, textCol: String,
                       idCol: String): DataFrame =
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("n"))

  /** Per-token log-ratio scores in integer micros, smoothed over the
    * union vocabulary. Defined for every RAW-corpus token (a raw
    * document can only contain those).
    */
  def tokenScores(rawOcc: DataFrame, targetOcc: DataFrame): DataFrame = {
    val cr = rawOcc.groupBy(col("w")).agg(sum(col("n")).as("cr"))
    val ct = targetOcc.groupBy(col("w")).agg(sum(col("n")).as("ct"))
    val v = cr.select(col("w")).unionByName(ct.select(col("w")))
      .distinct().agg(count(lit(1)).as("v"))
    val nt = targetOcc.agg(coalesce(sum(col("n")), lit(0L)).as("nt"))
    val nr = rawOcc.agg(coalesce(sum(col("n")), lit(0L)).as("nr"))
    cr.join(ct, Seq("w"), "left")
      .crossJoin(broadcast(v)).crossJoin(broadcast(nt))
      .crossJoin(broadcast(nr))
      .select(col("w"),
        round(lit(1000000.0) * (
          log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("nt") + col("v")).cast("double")) -
            log((col("cr") + 1).cast("double") /
              (col("nr") + col("v")).cast("double"))))
          .cast("long").as("s"))
  }

  /** (id, n_tokens, logw_micros) for every raw document with at least
    * one token: the importance weight as an exact integer-micros dot
    * product. Higher = more target-like.
    *
    * The raw occurrence table feeds both the count model and the
    * scoring join — materialized once through scratch so the corpus
    * tokenizes exactly once (the [[LangModel.bigramSurprisal]]
    * hygiene; the artifact is dropped before return).
    */
  def importanceWeights(rawDocs: DataFrame, targetDocs: DataFrame,
                        textCol: String, idCol: String): DataFrame = {
    val (occR, scratch) = Materialize.viaScratchWithPath(
      tokenOccurrences(rawDocs, textCol, idCol), "graft-dsir-occ")
    val occT = tokenOccurrences(targetDocs, textCol, idCol)
    val s = tokenScores(occR.select(col("w"), col("n")), occT)
    val out = Materialize.viaScratch(
      occR.join(s, "w")
        .groupBy(col(idCol))
        .agg(sum(col("n")).as("n_tokens"),
          sum(col("n") * col("s")).as("logw_micros")),
      "graft-dsir-score")
    scratch.drop()
    out
  }

  /** The fixed-size-model variant: features hash into `buckets`
    * buckets before counting, so model size is independent of
    * vocabulary — the shape that survives a 100 TB corpus with an
    * open-ended vocabulary (the score table stays broadcastable at
    * any scale). Same smoothing arithmetic over the OCCUPIED-bucket
    * "vocabulary".
    */
  def hashedWeights(rawDocs: DataFrame, targetDocs: DataFrame,
                    textCol: String, idCol: String,
                    buckets: Int = 1 << 16): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def occ(df: DataFrame) =
      df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
        .select(col(idCol), pmod(xxhash64(col("t")), lit(buckets.toLong))
          .as("w"))
        .groupBy(col(idCol), col("w"))
        .agg(count(lit(1)).as("n"))
    val (occR, scratch) = Materialize.viaScratchWithPath(
      occ(rawDocs), "graft-dsir-hocc")
    val s = tokenScores(occR.select(col("w"), col("n")), occ(targetDocs))
    val out = Materialize.viaScratch(
      occR.join(s, "w")
        .groupBy(col(idCol))
        .agg(sum(col("n")).as("n_tokens"),
          sum(col("n") * col("s")).as("logw_micros")),
      "graft-dsir-hscore")
    scratch.drop()
    out
  }

  /** Keep the documents whose weight clears the `q`-quantile of the
    * weight distribution — the "resample the top" step made
    * deterministic (exact percentile threshold, ties kept). The
    * quantile is computed over the weights TABLE (corpus-sized, two
    * int columns), not the corpus.
    */
  def selectAboveQuantile(weights: DataFrame, q: Double,
                          idCol: String): DataFrame = {
    require(q >= 0 && q < 1, s"quantile must be in [0, 1): $q")
    val thr = weights.agg(
      expr(s"percentile_cont($q) WITHIN GROUP (ORDER BY logw_micros)")
        .cast("double").as("thr"))
    weights.crossJoin(broadcast(thr))
      .filter(col("logw_micros").cast("double") >= col("thr"))
      .select(col(idCol), col("n_tokens"), col("logw_micros"))
  }
}
