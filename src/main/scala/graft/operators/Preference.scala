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
    * the same pass. The struct REVERSES the reward (not the response
    * id), so min(struct) orders reward desc then response-id asc for
    * ANY orderable response-id type — string ids work; the reward
    * must be integral (it is cast to long). The reversal is bitwise
    * NOT (~r = −r−1), a total order-reversing bijection on int64:
    * arithmetic negation would overflow at Long.MinValue and silently
    * corrupt the argmax, whereas ~ is overflow-free on the whole
    * domain (round-14 ADVICE), and a second ~ recovers the reward
    * exactly.
    */
  def bestOfN(df: DataFrame, promptCol: String, respCol: String,
              rewardCol: String, minReward: Long = Long.MinValue): DataFrame =
    df.groupBy(col(promptCol))
      .agg(min(struct(bitwise_not(col(rewardCol).cast("long")).as("nr"),
          col(respCol).as("resp"))).as("__best"),
        count(lit(1)).as("n_candidates"),
        min(col(rewardCol).cast("long")).as("min_reward"))
      .select(col(promptCol),
        col("__best.resp").as("best_resp"),
        bitwise_not(col("__best.nr")).as("best_reward"),
        col("n_candidates"), col("min_reward"))
      .filter(col("best_reward") >= minReward)

  /** Bradley-Terry preference strengths over [[resolve]] output — the
    * strength-of-preference meter majority voting cannot give: the
    * majority yields the mode per pair, BT fits one latent strength
    * per (prompt, response) such that P(i beats j) = s_i/(s_i+s_j)
    * across ALL of a prompt's pairs jointly, which is what a
    * DPO-style filter thresholds on (margin between chosen and
    * rejected strengths, transitively consistent across the pair
    * graph).
    *
    * Fixed-round minorization (MM) updates (Hunter, "MM algorithms
    * for generalized Bradley-Terry models", Ann. Statist. 2004):
    *   s'_i = W_i / Σ_{pairs (i,j)} n_ij / (s_i + s_j)
    * regularized by one virtual win AND one virtual comparison-pair
    * against a fixed-strength ghost (the standard connectivity prior:
    * zero-win items get a small positive strength instead of 0/0, and
    * the ghost anchors BT's arbitrary scale). Exactness discipline:
    * strengths live in integer micros, each pair term is ONE
    * truncating division (n_ij·1e12 div (s_i+s_j)), the update is one
    * more — everything replays in SQL with the rounds unrolled (the
    * HITS/LogReg treatment); int64 headroom requires W_i < 9.2e6
    * votes per item, far above any annotation reality.
    *
    * Scale shape per round: two broadcast-size joins of strengths
    * onto pairs + one groupBy — all keyed (prompt, resp); rounds are
    * materialized through scratch parquet (superseded rounds dropped
    * eagerly), so the plan never re-derives the vote pipeline
    * 3^rounds times.
    */
  def bradleyTerry(resolved: DataFrame, promptCol: String,
                   rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"1..8 MM rounds, got $rounds")
    val (pairs, pairsScratch) = Materialize.viaScratchWithPath(
      resolved.select(col(promptCol), col("lo"), col("hi"),
        col("n_votes"), col("n_lo"),
        (col("n_votes") - col("n_lo")).as("n_hi")),
      "graft-bt-pairs")
    val (items, itemsScratch) = Materialize.viaScratchWithPath(
      pairs.select(col(promptCol), col("lo").as("resp"),
          col("n_lo").as("__w"), col("n_votes").as("__n"))
        .union(pairs.select(col(promptCol), col("hi").as("resp"),
          col("n_hi").as("__w"), col("n_votes").as("__n")))
        .groupBy(col(promptCol), col("resp"))
        .agg(sum(col("__w")).as("n_wins"),
          sum(col("__n")).as("n_comparisons")),
      "graft-bt-items")
    try {
      var s = items.select(col(promptCol), col("resp"),
        lit(1000000L).as("__s"))
      var prev: Option[Materialize.Scratch] = None
      for (_ <- 1 to rounds) {
        val t = pairs
          .join(s.select(col(promptCol), col("resp").as("lo"),
            col("__s").as("__sl")), Seq(promptCol, "lo"))
          .join(s.select(col(promptCol), col("resp").as("hi"),
            col("__s").as("__sh")), Seq(promptCol, "hi"))
          .withColumn("__term",
            expr("(n_votes * 1000000000000L) div (__sl + __sh)"))
        val d = t.select(col(promptCol), col("lo").as("resp"), col("__term"))
          .union(t.select(col(promptCol), col("hi").as("resp"),
            col("__term")))
          .groupBy(col(promptCol), col("resp"))
          .agg(sum(col("__term")).as("__d"))
        val (next, scratch) = Materialize.viaScratchWithPath(
          items.join(d, Seq(promptCol, "resp"))
            .join(s, Seq(promptCol, "resp"))
            // ghost term rides the same denominator; greatest(·,1)
            // keeps the division total if every term truncates to 0
            .select(col(promptCol), col("resp"),
              expr("((n_wins + 1L) * 1000000000000L) div " +
                "greatest(__d + (2000000000000L div (__s + 1000000L)), 1L)")
                .as("__s")),
          "graft-bt-round")
        prev.foreach(_.drop())
        prev = Some(scratch)
        s = next
      }
      val out = Materialize.viaScratch(
        items.join(s, Seq(promptCol, "resp"))
          .select(col(promptCol), col("resp"),
            col("__s").as("strength_micros"),
            col("n_wins"), col("n_comparisons")),
        "graft-bt-out")
      prev.foreach(_.drop())
      out
    } finally {
      pairsScratch.drop()
      itemsScratch.drop()
    }
  }

  /** DPO-pair minting over [[bradleyTerry]] strengths — the stage
    * that turns a fitted preference model into training rows: per
    * prompt, `chosen` = strongest response, `rejected` = weakest,
    * kept only when the prompt holds ≥ 2 responses and the strength
    * margin clears `minMarginMicros` (a pair whose ends the fit
    * cannot separate teaches nothing — the standard DPO curation
    * filter, now thresholded on the TRANSITIVE strength rather than
    * a single pair's raw vote margin).
    *
    * Tie-breaks form a total order on BOTH ends — chosen breaks to
    * the smaller response id, rejected to the LARGER — so an
    * all-equal prompt still yields two distinct responses (margin 0,
    * dropped by any positive threshold) and the pick is
    * engine-reproducible for any orderable id type. ONE aggregation:
    * min and max of the same (−strength, resp) struct.
    */
  def dpoPairs(strengths: DataFrame, promptCol: String,
               minMarginMicros: Long = 0L): DataFrame =
    strengths.groupBy(col(promptCol))
      .agg(min(struct((-col("strength_micros")).as("ns"),
          col("resp").as("resp"))).as("__c"),
        max(struct((-col("strength_micros")).as("ns"),
          col("resp").as("resp"))).as("__r"),
        count(lit(1)).as("n_responses"))
      .filter(col("n_responses") >= 2)
      .select(col(promptCol),
        col("__c.resp").as("chosen_resp"),
        col("__r.resp").as("rejected_resp"),
        (-col("__c.ns")).as("chosen_strength"),
        (-col("__r.ns")).as("rejected_strength"),
        (col("__r.ns") - col("__c.ns")).as("margin_micros"),
        col("n_responses"))
      .filter(col("margin_micros") >= minMarginMicros)

  /** ALL-pairs DPO minting — [[dpoPairs]] widened to production
    * curation (round-14 VERDICT #5): per prompt, EVERY (chosen,
    * rejected) pair whose strength margin clears `minMarginMicros`,
    * not just strongest-vs-weakest — a 6-response prompt with three
    * well-separated tiers teaches more than one extreme pair.
    * Equal-strength pairs mint ONCE with deterministic orientation
    * (smaller response id = chosen, the [[dpoPairs]] tie-break), so
    * the pair set is engine-reproducible and never double-counts a
    * tie.
    *
    * `maxPairsPerPrompt` is the maxBucketSize discipline applied to
    * the n² pair space: keep the `maxPairsPerPrompt` WIDEST margins
    * (ties broken on (chosen, rejected) ids — a total order), and
    * account for the rest rather than dropping them silently —
    * `n_pairs_total` carries each prompt's full qualifying count, so
    * dropped = n_pairs_total − min(n_pairs_total, cap) is exact for
    * every prompt in the output.
    *
    * Scale shape: one self-join keyed on the prompt (response count
    * per prompt is bounded by the candidate-set contract, so the
    * join fan-out is n² of a SMALL n, never corpus²) + one window
    * per prompt over those ≤ n² pair rows. All integer micros; the
    * whole stage replays in SQL over the unrolled BT chain.
    */
  def dpoPairsAll(strengths: DataFrame, promptCol: String,
                  minMarginMicros: Long = 0L,
                  maxPairsPerPrompt: Int = 16): DataFrame = {
    require(maxPairsPerPrompt >= 1,
      s"maxPairsPerPrompt must be >= 1, got $maxPairsPerPrompt")
    val s = strengths.select(col(promptCol), col("resp"),
      col("strength_micros"))
    val chosen = s.select(col(promptCol),
      col("resp").as("chosen_resp"),
      col("strength_micros").as("chosen_strength"))
    val rejected = s.select(col(promptCol),
      col("resp").as("rejected_resp"),
      col("strength_micros").as("rejected_strength"))
    val pairs = chosen.join(rejected, Seq(promptCol))
      .filter(col("chosen_strength") > col("rejected_strength") ||
        (col("chosen_strength") === col("rejected_strength") &&
          col("chosen_resp") < col("rejected_resp")))
      .withColumn("margin_micros",
        col("chosen_strength") - col("rejected_strength"))
      .filter(col("margin_micros") >= minMarginMicros)
    val byMargin = org.apache.spark.sql.expressions.Window
      .partitionBy(col(promptCol))
      .orderBy(col("margin_micros").desc, col("chosen_resp").asc,
        col("rejected_resp").asc)
    val perPrompt = org.apache.spark.sql.expressions.Window
      .partitionBy(col(promptCol))
    pairs
      .withColumn("pair_rank", row_number().over(byMargin))
      .withColumn("n_pairs_total", count(lit(1)).over(perPrompt))
      .filter(col("pair_rank") <= maxPairsPerPrompt)
  }

  /** Group-relative advantage — the GRPO-family credit signal over
    * sampled completions: per prompt, each response's reward minus
    * the group mean. Mean-only centering (no σ division), which is
    * both the exactness-preserving choice — a std needs a sqrt, and
    * sqrt output cannot ride the integer-micros discipline — and the
    * documented-better one (the Dr. GRPO correction: dividing by the
    * group σ biases updates toward low-variance prompts).
    *
    * Exact integers two ways: `adv_num` = r_i·n − Σr is the centered
    * advantage scaled by n with NO division at all (the
    * precision-critical consumer multiplies through); `adv_micros`
    * is the per-sample mean-centered value in micros, computed with
    * a SIGN-SPLIT truncating division (sign·(|num|·1e6 div n)) so it
    * replays identically on engines whose integer division floors
    * instead of truncating — negative advantages are half the
    * output, the one place the repo's positive-numerator div
    * discipline doesn't cover. int64 headroom: |r|·n·1e6 < 2⁶³ ⟹
    * |reward| · groupSize < 9.2e12 — far above any sampling reality.
    *
    * ONE groupBy + one broadcast-size join back onto the samples,
    * keyed on the prompt — no window over the sample table.
    */
  def groupAdvantage(df: DataFrame, promptCol: String, respCol: String,
                     rewardCol: String): DataFrame = {
    val stats = df.groupBy(col(promptCol))
      .agg(sum(col(rewardCol).cast("long")).as("__sum"),
        count(lit(1)).as("n_samples"))
    df.select(col(promptCol), col(respCol),
        col(rewardCol).cast("long").as("reward"))
      .join(stats, Seq(promptCol))
      .withColumn("adv_num",
        col("reward") * col("n_samples") - col("__sum"))
      .select(col(promptCol), col(respCol), col("reward"),
        col("n_samples"), col("adv_num"),
        (signum(col("adv_num")).cast("long") *
          expr("(abs(adv_num) * 1000000L) div n_samples"))
          .as("adv_micros"))
  }

  /** Pass-rate curriculum filter — the RLVR sampling hygiene stage:
    * per prompt, the fraction of sampled completions whose reward
    * clears `passReward`; prompts whose rate falls outside
    * [`loMicros`, `hiMicros`] DROP — an all-fail prompt gives the
    * policy no reward gradient to climb, an all-pass prompt nothing
    * left to learn, and both burn sampling budget (the standard
    * too-hard/too-easy curriculum window). Survivor rows keep their
    * per-sample columns and carry the group's `n_samples`, `n_pass`,
    * `pass_rate_micros` for the curation ledger; the DROPPED mass is
    * recoverable exactly as the complement (the accounting
    * discipline — nothing vanishes silently).
    *
    * Exact integers: rate = n_pass·1e6 div n (truncating on a
    * non-negative numerator), bounds compared in micros. ONE groupBy
    * + one join keyed on the prompt.
    */
  def passRateFilter(df: DataFrame, promptCol: String, respCol: String,
                     rewardCol: String, passReward: Long,
                     loMicros: Long = 1L,
                     hiMicros: Long = 999999L): DataFrame = {
    require(loMicros >= 0 && hiMicros <= 1000000L && loMicros <= hiMicros,
      s"pass-rate window is micros in [0, 1e6], got [$loMicros, $hiMicros]")
    val stats = df.groupBy(col(promptCol))
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col(rewardCol).cast("long") >= passReward, 1L)
          .otherwise(0L)).as("n_pass"))
      .withColumn("pass_rate_micros",
        expr("(n_pass * 1000000L) div n_samples"))
      .filter(col("pass_rate_micros").between(loMicros, hiMicros))
    df.select(col(promptCol), col(respCol),
        col(rewardCol).cast("long").as("reward"))
      .join(stats, Seq(promptCol))
  }

  /** Reward-model calibration bins — the QA meter that decides
    * whether a reward model's scores can be TRUSTED as probabilities
    * (a best-of-n or DPO-margin pipeline silently assumes they can):
    * predictions in micros bucket into `nBins` equal-width bins; per
    * bin, the mean prediction vs the empirical positive rate, and
    * the |gap| whose n-weighted sum is the expected calibration
    * error. The per-bin relation is the output (the reliability
    * diagram's rows) — ECE is one aggregation away and the bins
    * carry the evidence a threshold decision needs.
    *
    * Exact integers: bin = min(pred·nBins div 1e6, nBins−1) (the
    * right edge closes the last bin), mean and empirical rates are
    * single truncating divisions on non-negative numerators, the gap
    * is an integer |difference of micros|. One groupBy; bins with no
    * predictions are genuinely absent (a reliability diagram has no
    * evidence there, and inventing zero rows would read as measured
    * perfect calibration).
    */
  def calibrationBins(df: DataFrame, predCol: String,
                      outcomeCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"2..1000 bins, got $nBins")
    df.select(col(predCol).cast("long").as("__p"),
        col(outcomeCol).cast("boolean").as("__o"))
      .withColumn("bin",
        least(expr(s"(__p * ${nBins}L) div 1000000L"),
          lit(nBins - 1L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__o"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__p")).as("__sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("__sp div n").as("mean_pred_micros"),
        expr("(n_pos * 1000000L) div n").as("emp_micros"),
        abs(expr("__sp div n") - expr("(n_pos * 1000000L) div n"))
          .as("gap_micros"))
  }

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
