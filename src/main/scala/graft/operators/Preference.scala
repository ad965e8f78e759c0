package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise preference-data QA — the assembly/cleaning stage of an
  * RLHF/DPO data pipeline. Raw human (or judge-model) annotations
  * arrive as (prompt, response A, response B, prefer-A?) votes with
  * arbitrary pair orientation, duplicate submissions, and genuine
  * disagreement; training wants ONE resolved row per (prompt, pair)
  * with an honest record of how contested it was. Three stages, each
  * a plain relational step so the whole pipeline is oracle-checkable:
  *
  *  1. [[normalized]] — canonical pair orientation: (lo, hi) by id
  *     with the vote flipped when the pair was presented swapped, so
  *     (p, x, y, preferA=true) and (p, y, x, preferA=false) are the
  *     SAME vote and aggregate together.
  *  2. [[perRater]] — per-rater hygiene: a rater's identical
  *     re-submissions on a pair collapse to one vote; a rater who
  *     voted BOTH ways on the same pair self-cancels (both rows drop —
  *     a contradiction carries no signal, and keeping either side
  *     would let a noisy rater double-dip).
  *  3. [[resolve]] — majority vote per (prompt, lo, hi): vote counts
  *     both ways, the winner ('lo' / 'hi', NULL on a tie), a
  *     `conflict` flag (any dissent), and `margin_micros` =
  *     |n_lo − n_hi|·1e6 div n_votes — the exact-integer confidence a
  *     downstream filter thresholds on (DPO pipelines commonly keep
  *     only margin ≥ ⅓ or unanimous pairs).
  *
  * Scale shape: stage 1 is a projection; stages 2–3 are single
  * groupBy aggregations keyed by (rater, prompt, pair) then (prompt,
  * pair) — two shuffles of the annotation table total, no windows, no
  * self-joins. Annotation tables are small next to pretraining
  * corpora, but the same shape holds if judge-model votes reach
  * billions of rows.
  */
object Preference {

  /** Canonical orientation: emits (promptCol, carryCols…, lo, hi,
    * prefer_lo) with lo < hi by id and the vote flipped when a > b.
    * Self-pairs (a = b) are malformed annotations and drop. Null
    * response ids drop (they cannot form a pair), and so does a NULL
    * vote (an abstention carries no signal — and letting it through
    * would make [[resolve]] count the row in n_votes while tallying
    * it as a 'hi' vote, a silent bias). `carryCols` (e.g. the rater
    * id) pass through untouched.
    */
  def normalized(df: DataFrame, promptCol: String, aCol: String,
                 bCol: String, preferACol: String,
                 carryCols: String*): DataFrame =
    df.filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(preferACol).isNotNull && col(aCol) =!= col(bCol))
      .select(col(promptCol) +: carryCols.map(col) :+
        least(col(aCol), col(bCol)).as("lo") :+
        greatest(col(aCol), col(bCol)).as("hi") :+
        when(col(aCol) < col(bCol), col(preferACol))
          .otherwise(!col(preferACol)).as("prefer_lo"): _*)

  /** Per-rater hygiene over [[normalized]] output + a rater column:
    * identical duplicates collapse; a rater's contradictory votes on
    * one pair cancel (drop). Output: one row per (rater, prompt, lo,
    * hi) that survived, carrying its single `prefer_lo`.
    */
  def perRater(normalized: DataFrame, promptCol: String,
               raterCol: String): DataFrame =
    normalized
      .groupBy(col(raterCol), col(promptCol), col("lo"), col("hi"))
      .agg(max(col("prefer_lo")).as("__any"),
        min(col("prefer_lo")).as("__all"))
      // max == min ⟺ every vote this rater cast on the pair agrees
      .filter(col("__any") === col("__all"))
      .select(col(raterCol), col(promptCol), col("lo"), col("hi"),
        col("__any").as("prefer_lo"))

  /** Majority resolution per (prompt, lo, hi) over one-vote-per-rater
    * rows: `winner` = 'lo' / 'hi' / NULL (tie), `conflict` = any
    * dissent, `margin_micros` = |n_lo − n_hi|·1e6 div n_votes.
    */
  def resolve(votes: DataFrame, promptCol: String): DataFrame =
    votes.groupBy(col(promptCol), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_votes"),
        sum(when(col("prefer_lo"), 1L).otherwise(0L)).as("n_lo"))
      .select(col(promptCol), col("lo"), col("hi"),
        col("n_votes"), col("n_lo"),
        (col("n_votes") - col("n_lo")).as("n_hi"),
        when(col("n_lo") * 2 > col("n_votes"), lit("lo"))
          .when(col("n_lo") * 2 < col("n_votes"), lit("hi"))
          .otherwise(lit(null).cast("string")).as("winner"),
        (col("n_lo") =!= 0L && col("n_lo") =!= col("n_votes"))
          .as("conflict"),
        expr("(abs(n_lo * 2 - n_votes) * 1000000L) div n_votes")
          .as("margin_micros"))

  /** Best-of-n (rejection-sampling) assembly — the RFT/RLHF sibling
    * of [[resolve]]: per prompt, from n candidate responses with
    * reward scores, keep the argmax (reward desc, response-id asc —
    * a total order, so the pick is engine-reproducible when rewards
    * are exact integers) PLUS the audit columns a curation ledger
    * wants: candidate count and the reward spread. Prompts whose BEST
    * candidate scores below `minReward` drop entirely (the rejection
    * half: if even the best is bad, no training example is minted).
    *
    * ONE struct-min aggregation (the LPA argmax discipline — never a
    * window over the candidate table); n_candidates and spread ride
    * the same pass. The struct negates the REWARD (not the response
    * id), so min(struct) orders reward desc then response-id asc for
    * ANY orderable response-id type — string ids work; the reward
    * must be integral (it is cast to long).
    */
  def bestOfN(df: DataFrame, promptCol: String, respCol: String,
              rewardCol: String, minReward: Long = Long.MinValue): DataFrame =
    df.groupBy(col(promptCol))
      .agg(min(struct((-col(rewardCol).cast("long")).as("nr"),
          col(respCol).as("resp"))).as("__best"),
        count(lit(1)).as("n_candidates"),
        min(col(rewardCol).cast("long")).as("min_reward"))
      .select(col(promptCol),
        col("__best.resp").as("best_resp"),
        (-col("__best.nr")).as("best_reward"),
        col("n_candidates"), col("min_reward"))
      .filter(col("best_reward") >= minReward)

  /** The full pipeline: raw annotations → canonical orientation →
    * per-rater hygiene → majority resolution.
    */
  def resolveAnnotations(df: DataFrame, promptCol: String, aCol: String,
                         bCol: String, preferACol: String,
                         raterCol: String): DataFrame =
    resolve(
      perRater(
        normalized(df, promptCol, aCol, bCol, preferACol, raterCol),
        promptCol, raterCol),
      promptCol)

  /** Per-rater quality meter — the annotator audit that decides who
    * keeps labeling: each surviving vote scored against the
    * LEAVE-ONE-OUT consensus of its pair (own vote excluded — with
    * the 2–5 votes real pairs carry, self-inclusive agreement mostly
    * measures the rater's own weight in the majority, not their
    * alignment with everyone else). A vote counts as `decided` only
    * when the OTHER raters hold a strict majority; `agree_micros` =
    * agreements·1e6 div decided, NULL for a rater none of whose pairs
    * had an independent consensus (no evidence ≠ perfect score).
    *
    * Exact integers end to end: the leave-one-out recount is plain
    * subtraction of the rater's own indicator from the pair tallies,
    * so the whole meter replays in SQL. Shape: the resolver's two
    * aggregations plus ONE broadcast-join of pair tallies back onto
    * votes and one final groupBy(rater).
    */
  def raterQuality(df: DataFrame, promptCol: String, aCol: String,
                   bCol: String, preferACol: String,
                   raterCol: String): DataFrame = {
    val votes = perRater(
      normalized(df, promptCol, aCol, bCol, preferACol, raterCol),
      promptCol, raterCol)
    val tallies = resolve(votes, promptCol)
      .select(col(promptCol), col("lo"), col("hi"),
        col("n_lo").as("__t_lo"), col("n_hi").as("__t_hi"))
    votes.join(tallies, Seq(promptCol, "lo", "hi"))
      .select(col(raterCol),
        (col("__t_lo") - when(col("prefer_lo"), 1L).otherwise(0L))
          .as("__r_lo"),
        (col("__t_hi") - when(col("prefer_lo"), 0L).otherwise(1L))
          .as("__r_hi"),
        col("prefer_lo"))
      .select(col(raterCol),
        (col("__r_lo") =!= col("__r_hi")).as("__decided"),
        (when(col("prefer_lo"), col("__r_lo") > col("__r_hi"))
          .otherwise(col("__r_hi") > col("__r_lo"))).as("__agree"))
      .groupBy(col(raterCol))
      .agg(count(lit(1)).as("n_votes"),
        sum(when(col("__decided"), 1L).otherwise(0L)).as("n_decided"),
        sum(when(col("__decided") && col("__agree"), 1L).otherwise(0L))
          .as("n_agree"))
      .select(col(raterCol), col("n_votes"), col("n_decided"),
        col("n_agree"),
        when(col("n_decided") === 0, lit(null).cast("long"))
          .otherwise(expr("(n_agree * 1000000L) div n_decided"))
          .as("agree_micros"))
  }
}
