package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** Entity resolution (record linkage): find records that refer to the
  * same real-world entity despite spelling noise — the identity-keying
  * step a training-data pipeline runs over author names, site titles,
  * and product strings before per-entity quota/dedup rules can apply.
  *
  * The reference pipeline has no fuzzy matching (its SCD merges join on
  * exact keys; see `/root/reference/2_Silver_Notebook.py:61` for the
  * exact-key model this generalizes), so this is a beyond-reference
  * operator, built Spark-first:
  *
  *   - **Blocking, not all-pairs.** Comparing every record to every
  *     other is O(n²) — at 10⁹ records that is 10¹⁸ pairs and no
  *     cluster saves you. `candidatePairs` generates pairs only within
  *     blocks (records agreeing on a cheap key: a name prefix, a
  *     phonetic code, a length bucket). Each blocking pass is ONE
  *     hash-shuffle self-join on the block key; multiple passes union
  *     and de-duplicate, so recall compounds across passes while cost
  *     stays Σ block²-within-pass. At 100 TB the lever is block
  *     granularity: narrower keys → smaller blocks → fewer pairs; a
  *     hot block (everyone named "smith") is the skew case, handled
  *     by capping or salting upstream, never by widening the window.
  *   - **Scoring on the pair stream.** Levenshtein (Spark built-in,
  *     codegen'd) for edit-bounded typos; [[NativeExpressions.jaroWinkler]]
  *     for prefix-weighted name similarity. Both are per-pair scalar
  *     kernels — no shuffle beyond the block join itself.
  *   - Resolution to clusters (connected components over the match
  *     edges) reuses the bounded-diameter CC machinery the dedup
  *     family already ships (`Dedup`-side `q_d_resolve` path).
  */
object EntityResolution {

  /** Blocked candidate-pair generation.
    *
    * For each blocker expression, self-joins `records` on the block
    * key and keeps ordered pairs (`id_a < id_b`); passes are unioned
    * and de-duplicated on the pair id, so a pair found by two passes
    * appears once. Payload columns ride along as `<col>_a` /
    * `<col>_b`.
    *
    * A null/empty block key drops the record from that pass (null
    * never equi-joins), which is the desired semantics: an un-keyable
    * record generates no candidates rather than a cross-join.
    */
  def candidatePairs(
      records: DataFrame,
      idCol: String,
      payloadCols: Seq[String],
      blockers: Seq[Column]): DataFrame = {
    require(blockers.nonEmpty, "at least one blocking pass")
    val passes = blockers.map { blk =>
      val keyed = records.select(
        (blk.as("__blk") +: col(idCol) +: payloadCols.map(col)): _*)
      val left = keyed.select(col("__blk") +: col(idCol).as(s"${idCol}_a") +:
        payloadCols.map(c => col(c).as(s"${c}_a")): _*)
      val right = keyed.select(col("__blk") +: col(idCol).as(s"${idCol}_b") +:
        payloadCols.map(c => col(c).as(s"${c}_b")): _*)
      left.join(right, Seq("__blk"))
        .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
        .drop("__blk")
    }
    // one pass: the join can't emit duplicate (a,b) — skip the extra
    // shuffle entirely. Multi-pass: dedup on the pair id only.
    if (passes.size == 1) passes.head
    else passes.reduce(_ unionByName _)
      .dropDuplicates(s"${idCol}_a", s"${idCol}_b")
  }

  /** Set-similarity candidate generation via character trigrams — the
    * SECOND blocking mechanism, for corpora where no typo-stable
    * prefix exists (the prefix blocker's blind spot: an edit in the
    * first characters). Records sharing at least `minCommon` distinct
    * trigrams of the key string become candidates.
    *
    * Mechanism: distinct trigrams explode (short keys fall back to
    * the whole string, like the shingle kernel), document-frequency
    * stop-grams drop (`maxDf` — a gram half the corpus shares carries
    * no identity signal and its posting self-join is the skew bomb:
    * pair volume is Σ_g df(g)², so the cap is the complexity knob
    * exactly like the LSH generators' maxBucketSize), then ONE
    * equi-join on the gram and a count-≥-threshold fold per pair.
    *
    * The key string should be discriminative (name alone rarely is —
    * compose name|city|zip): pair volume follows the gram-key
    * cardinality, not the operator.
    *
    * SCALE CONTRACT (round-10, measured): this is the EXACT arm, and
    * exact set-similarity self-join is Θ(n²/G) in candidate volume
    * once the distinct-gram space G saturates — per-gram df grows
    * ∝ n by pigeonhole, and with an absolute `minCommon` threshold
    * the TRUE result set itself grows quadratically (random pairs
    * reach a fixed overlap at a ~constant rate; sampled on the
    * ScaleGate synth: 259k pairs at 150k records → 33.4M at 10×).
    * No prefix/positional filter changes that asymptotic — it is a
    * property of the relation being computed. Use this arm when the
    * corpus (or a blocked partition of it) is bounded; at web scale
    * route through MinHash-LSH banding
    * ([[graft.operators.Dedup]], sub-quadratic with the documented
    * ρ-exponent recall bound) or key-equality blocking
    * ([[candidatePairs]], linear in records at constant block size).
    */
  /** Per-record kept-gram arrays as dense LONG RANKS in the global
    * (df, gram) total order — ascending array ⇒ rarest-first, so the
    * PPJoin prefix is a plain slice, the posting join keys on a long
    * instead of a string, and exact verification is an
    * allocation-free sorted merge count
    * ([[NativeExpressions.sortedIntersectCount]]) instead of a
    * per-pair hash-set `array_intersect` (round-16; the rank
    * substitution is a bijection on kept grams, so every count,
    * size and threshold downstream is unchanged). The rank table is
    * built with a distributed sort + zipWithIndex — deterministic,
    * no single-partition window. Materialized through scratch: the
    * pair self-join would otherwise recompute the whole subtree once
    * per side, and the verify-side array reattachment reads it a
    * third time.
    */
  private def rankedGrams(records: DataFrame, idCol: String,
      keyCol: String, maxDf: Long,
      scratchPrefix: String): (DataFrame, Materialize.Scratch) = {
    val spark = records.sparkSession
    val base = records
      .select(col(idCol).as("__id"), col(keyCol).as("__k"))
      .select(col("__id"), array_distinct(expr(
        "transform(sequence(1, greatest(length(__k) - 2, 1))," +
          " i -> substring(__k, i, 3))")).as("__gs"))
    val exploded = base.select(col("__id"), explode(col("__gs")).as("__g"))
    // document frequency per gram; grams past the stop-gram cap drop
    // entirely — from the postings AND the intersection (the naive
    // oracle's semantics)
    val dfTab = exploded.groupBy(col("__g"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
    val rankTab = {
      import spark.implicits._
      spark.createDataset(
        dfTab.orderBy(col("__df"), col("__g"))
          .select(col("__g")).rdd.zipWithIndex()
          .map { case (r, i) => (r.getString(0), i) })
        .toDF("__g", "__rk")
    }
    Materialize.viaScratchWithPath(
      exploded.join(rankTab, "__g")
        .groupBy(col("__id"))
        .agg(sort_array(collect_list(col("__rk"))).as("__ga")),
      scratchPrefix)
  }

  def trigramPairs(
      records: DataFrame,
      idCol: String,
      keyCol: String,
      minCommon: Int,
      maxDf: Long = Long.MaxValue): DataFrame = {
    require(minCommon >= 1, "minCommon must be >= 1")
    val (rankedAll, orderedScratch) =
      rankedGrams(records, idCol, keyCol, maxDf, "graft-er-grams")
    // fewer than minCommon kept grams can never reach the threshold
    val ordered = rankedAll.filter(size(col("__ga")) >= minCommon)
    // PPJoin prefix filter: if |A∩B| ≥ t, the (|A|−t+1) rarest grams
    // of A and the (|B|−t+1) rarest of B must share one — joining
    // prefixes only is EXACT, and prunes precisely the frequent grams
    // whose Σ df² makes the naive posting join density-quadratic
    // (measured at sf0.1: 12.2 s naive vs 2.4 s here; the verify step
    // below re-checks candidates with the full intersection)
    val pre = ordered.withColumn("__g", explode(
        slice(col("__ga"), lit(1), size(col("__ga")) - lit(minCommon - 1))))
      .select(col("__g"), col("__id"))
    // candidate pair ids only — the gram arrays do NOT ride the pair
    // join/dedup shuffles; they reattach after the pair set is small
    val cands = pre.select(col("__g"), col("__id").as(s"${idCol}_a"))
      .join(pre.select(col("__g"), col("__id").as(s"${idCol}_b")),
        Seq("__g"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      // a pair can collide on several prefix grams — verify once
      .select(col(s"${idCol}_a"), col(s"${idCol}_b")).distinct()
    // exact verification: full kept-gram intersection size
    val out = cands
      .join(ordered.select(col("__id").as(s"${idCol}_a"),
        col("__ga").as("__ka")), s"${idCol}_a")
      .join(ordered.select(col("__id").as(s"${idCol}_b"),
        col("__ga").as("__kb")), s"${idCol}_b")
      .withColumn("n_common", NativeExpressions.sortedIntersectCount(
        col("__ka"), col("__kb")))
      .filter(col("n_common") >= minCommon)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"), col("n_common"))
    // pin the result before dropping the scratch the plan reads from
    val pinned = Materialize.viaScratch(out, "graft-er-pairs")
    orderedScratch.drop()
    pinned
  }

  /** Edit-distance match: keep pairs with levenshtein ≤ `maxEdits`.
    * Expects `<a>`/`<b>` string columns on the pair stream.
    *
    * Uses the BOUNDED kernel (banded O(k·min) DP with early exit)
    * rather than the full O(n·m) form — on a pair stream most pairs
    * are non-matches and take the bail-out. The bounded form returns
    * -1 past the threshold, hence the `>= 0` guard (the same rewrite
    * [[graft.plans.GraftRules.BoundedLevenshtein]] applies to SQL
    * predicates); for surviving pairs the value IS the exact distance.
    */
  def levenshteinMatches(
      pairs: DataFrame, a: String, b: String, maxEdits: Int): DataFrame =
    pairs
      .withColumn("lev", levenshtein(col(a), col(b), maxEdits))
      .filter(col("lev") >= 0 && col("lev") <= maxEdits)

  /** Jaro–Winkler match in rounded integer micros: keep pairs with
    * jw ≥ `minMicros`. Micros (not raw doubles) so downstream
    * grouping/joining on the score is exact.
    */
  def jaroWinklerMatches(
      pairs: DataFrame, a: String, b: String, minMicros: Long): DataFrame =
    pairs
      .withColumn("jw_micros",
        round(NativeExpressions.jaroWinkler(col(a), col(b)) * 1000000)
          .cast("long"))
      .filter(col("jw_micros") >= minMicros)

  /** Jaccard-threshold set-similarity self-join over character
    * trigrams — the published PPJoin/All-Pairs form, where the
    * overlap requirement SCALES with record size instead of
    * [[trigramPairs]]' absolute `minCommon`:
    *
    *   J(A,B) ≥ θ  ⇒  |A∩B| ≥ ⌈θ·max(|A|,|B|)⌉, so the rarest
    *   |X| − ⌈θ·|X|⌉ + 1 grams of each side must intersect (prefix
    *   filter under a global rarest-first total order), and
    *   θ·|A| ≤ |B| ≤ |A|/θ (length filter, applied IN the posting
    *   join before any pair materializes).
    *
    * Both filters are EXACT — the verify step recomputes the true
    * Jaccard over the kept-gram sets, so the oracle stays the naive
    * all-pairs formulation. With a proportional threshold the TRUE
    * result is driven by genuinely-similar pairs (near-identical
    * strings), not by the corpus-wide floor an absolute threshold
    * converges to — the semantic fix for the Θ(n²) output measured
    * on [[trigramPairs]] (NOTES round-10). Candidate volume still
    * follows Σ_prefix df² (the data's property, not the
    * algorithm's); the prefix here is the rarest ≈(1−θ)·|A|+1 grams
    * — at θ=0.7 that is 3–4 grams instead of |A|−minCommon+1 ≈ 11.
    *
    * Returns `(idCol_a, idCol_b, jac_micros)` with
    * jac_micros = ⌊10⁶·|∩|/|∪|⌋ — integer-exact, oracle-replayable.
    */
  def trigramPairsJaccard(
      records: DataFrame,
      idCol: String,
      keyCol: String,
      thetaMicros: Long,
      maxDf: Long = Long.MaxValue): DataFrame = {
    require(thetaMicros > 0 && thetaMicros <= 1000000L,
      s"thetaMicros in (0, 1e6], got $thetaMicros")
    val (ordered, orderedScratch) =
      rankedGrams(records, idCol, keyCol, maxDf, "graft-er-jgrams")
    // prefix length |X| − ⌈θ|X|⌉ + 1; sizes AND 1-based prefix
    // positions ride the postings so the length filter applies inside
    // the equi-join and the positional filter right after it
    // prefix length via the INTEGER ceiling (x·θ + 10⁶−1) div 10⁶ —
    // same exact-integer discipline as the containment arm
    val pre = ordered
      .withColumn("__sz", size(col("__ga")).cast("long"))
      .select(col("__id"), col("__sz"),
        posexplode(slice(col("__ga"), lit(1),
          greatest(size(col("__ga")) -
            expr(s"cast((__sz * ${thetaMicros}L + 999999L)" +
              " div 1000000L as int)") +
            lit(1), lit(0)))))
      .select(col("col").as("__g"), col("__id"), col("__sz"),
        (col("pos") + 1).cast("long").as("__p"))
    // PPJoin+ positional filter (round-10 VERDICT #4), exact, applied
    // PER JOINED ROW — inside the map side of the posting join,
    // before the dedup shuffle ever carries the row:
    // both gram arrays are sorted by the SAME global (df, gram) order,
    // so for any pair the shared prefix gram with the minimum
    // position in A is also minimal in B and is the pair's FIRST
    // common gram overall — every other common gram sits after it on
    // both sides, hence |A∩B| ≤ 1 + min(|A|−pa, |B|−pb) at that row.
    // J ≥ θ requires |A∩B| ≥ ⌈θ(|A|+|B|)/(1+θ)⌉ (the exact
    // Jaccard↔overlap equivalence, tighter than θ·max). The per-row
    // form is equivalent to filtering on the pair's min positions:
    // the first-common-gram row has the pair's MAXIMAL bound, so
    // "some row survives" ⟺ "the g_first bound passes" — qualifying
    // pairs always keep their g_first row (it lies in both prefixes:
    // were every common gram past A's prefix, at most ⌈θ|A|⌉−1 would
    // fit the suffix, below the ⌈θ|A|⌉ the threshold demands), and a
    // pair whose every row fails is provably below θ. Measured at
    // sf0.1/θ=0.7: 66% of prefix+length survivors pruned before the
    // verify join pays the array join + intersection.
    val cands = pre.select(col("__g"), col("__id").as(s"${idCol}_a"),
        col("__sz").as("__sa"), col("__p").as("__pa"))
      .join(pre.select(col("__g"), col("__id").as(s"${idCol}_b"),
        col("__sz").as("__sb"), col("__p").as("__pb")), Seq("__g"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b") &&
        col("__sb") * 1000000L >= col("__sa") * thetaMicros &&
        col("__sa") * 1000000L >= col("__sb") * thetaMicros &&
        (lit(1L) + least(col("__sa") - col("__pa"),
          col("__sb") - col("__pb"))) * (1000000L + thetaMicros) >=
          (col("__sa") + col("__sb")) * thetaMicros)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b")).distinct()
    val out = cands
      .join(ordered.select(col("__id").as(s"${idCol}_a"),
        col("__ga").as("__ka")), s"${idCol}_a")
      .join(ordered.select(col("__id").as(s"${idCol}_b"),
        col("__ga").as("__kb")), s"${idCol}_b")
      .withColumn("__n", NativeExpressions.sortedIntersectCount(
        col("__ka"), col("__kb")))
      .withColumn("__u", size(col("__ka")) + size(col("__kb")) - col("__n"))
      .filter(col("__n") * 1000000L >= col("__u") * thetaMicros)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"),
        expr("(__n * 1000000L) div __u").as("jac_micros"))
    val pinned = Materialize.viaScratch(out, "graft-er-jpairs")
    orderedScratch.drop()
    pinned
  }

  /** DIRECTED trigram-set CONTAINMENT at threshold θ —
    * [[trigramPairsJaccard]]'s asymmetric sibling, the relation quote
    * detection and subset-record matching actually need: Jaccard
    * punishes size mismatch (a short name fully inside a long one
    * can sit far below any usable θ), while containment
    * c(A→B) = |A∩B|/|A| reads 1.0 there. Output one row per ORDERED
    * pair (a, b), a ≠ b, with cont_micros = ⌊10⁶·|A∩B|/|A|⌋ ≥ θ —
    * both directions can appear, each judged by its own left side.
    *
    * Exact prefix filtering, asymmetrized: the overlap requirement
    * ⌈θ|A|⌉ depends on A alone, so only A's posting prefix shrinks
    * (|A| − ⌈θ|A|⌉ + 1 grams in the global (df, gram) order) while B
    * indexes ALL its grams — any common gram can be the witness on
    * the containing side, so a B-prefix would break recall. The
    * PPJoin positional bound survives asymmetrization: both arrays
    * share the global sort, so at the pair's first common gram
    * |A∩B| ≤ 1 + min(|A|−pa, |B|−pb), checked against ⌈θ|A|⌉, and
    * the size filter is |B| ≥ θ|A| (the intersection can never
    * exceed |B|). Verification is the exact set intersection —
    * filters are invisible in the result, which is what the
    * all-pairs oracle checks. `maxDf` is the stop-gram skew knob,
    * and at corpus scale it must be ABSOLUTE: df <= C bounds the
    * posting join's candidates at C * surviving-postings = O(corpus)
    * regardless of the data, while a corpus-relative cap (the
    * Jaccard sibling's n/10) admits grams whose df grows with n and
    * stays quadratic on a saturating gram space (measured round-16
    * on the entity synth: n/10 rode 19.5x at 10x data; df <= 64 is
    * the gated configuration, `q_e_containment_capped`). The
    * cap-free default remains the exhaustive-verification form the
    * naive oracle replays.
    */
  def trigramPairsContainment(
      records: DataFrame,
      idCol: String,
      keyCol: String,
      thetaMicros: Long,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val (out, orderedScratch) = trigramPairsContainmentPlan(
      records, idCol, keyCol, thetaMicros, maxDf)
    val pinned = Materialize.viaScratch(out, "graft-er-cpairs")
    orderedScratch.drop()
    pinned
  }

  /** The UNPINNED containment plan plus the gram scratch it reads —
    * split out so plan evidence (`plans/r16/`) can explain the real
    * operator pipeline rather than the pinned scratch scan the public
    * form returns. Callers own the scratch's lifetime.
    */
  private[graft] def trigramPairsContainmentPlan(
      records: DataFrame,
      idCol: String,
      keyCol: String,
      thetaMicros: Long,
      maxDf: Long = Long.MaxValue): (DataFrame, Materialize.Scratch) = {
    require(thetaMicros > 0 && thetaMicros <= 1000000L,
      s"thetaMicros in (0, 1e6], got $thetaMicros")
    val (ordered, orderedScratch) =
      rankedGrams(records, idCol, keyCol, maxDf, "graft-er-cgrams")
    val posting = ordered
      .withColumn("__sz", size(col("__ga")).cast("long"))
      .select(col("__id"), col("__sz"),
        posexplode(col("__ga")))
      .select(col("col").as("__g"), col("__id"), col("__sz"),
        (col("pos") + 1).cast("long").as("__p"))
    // A-side: keep only the prefix rows (position within
    // |A| − ⌈θ|A|⌉ + 1); B-side: the full postings. ⌈θ|A|⌉ is the
    // INTEGER ceiling (x·θ + 10⁶−1) div 10⁶ — the repo's exact-
    // integer-micros discipline (round-15 ADVICE): no float step,
    // exact at any size int64 holds
    val preA = posting.filter(
      col("__p") <= col("__sz") -
        expr(s"(__sz * ${thetaMicros}L + 999999L) div 1000000L") + 1L)
    val cands = preA.select(col("__g"), col("__id").as(s"${idCol}_a"),
        col("__sz").as("__sa"), col("__p").as("__pa"))
      .join(posting.select(col("__g"), col("__id").as(s"${idCol}_b"),
        col("__sz").as("__sb"), col("__p").as("__pb")), Seq("__g"))
      .filter(col(s"${idCol}_a") =!= col(s"${idCol}_b") &&
        col("__sb") * 1000000L >= col("__sa") * thetaMicros &&
        (lit(1L) + least(col("__sa") - col("__pa"),
          col("__sb") - col("__pb"))) * 1000000L >=
          col("__sa") * thetaMicros)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b")).distinct()
    val out = cands
      .join(ordered.select(col("__id").as(s"${idCol}_a"),
        col("__ga").as("__ka")), s"${idCol}_a")
      .join(ordered.select(col("__id").as(s"${idCol}_b"),
        col("__ga").as("__kb")), s"${idCol}_b")
      .withColumn("__n", NativeExpressions.sortedIntersectCount(
        col("__ka"), col("__kb")))
      .withColumn("__sa", size(col("__ka")).cast("long"))
      .filter(col("__n") * 1000000L >= col("__sa") * thetaMicros)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"),
        expr("(__n * 1000000L) div __sa").as("cont_micros"))
    (out, orderedScratch)
  }

  final case class DfCapStats(grams: Long, droppedGrams: Long,
                              droppedPostings: Long, emptiedRecords: Long)

  /** Dropped-gram accounting for the trigram posting family's `maxDf`
    * stop-gram cap — the [[Dedup.winnowCandidateStats]] treatment
    * (round-16): how many distinct grams and postings sit above the
    * cap, and how many records lose their ENTIRE gram set — those
    * vanish from the capped relation outright (no left side to
    * judge), the loudest effect a capped production run must surface
    * before it is read as full coverage. Gram derivation matches
    * [[trigramPairsContainment]]/[[trigramPairsJaccard]] exactly
    * (per-record distinct 3-grams of `keyCol`).
    */
  def trigramDfStats(records: DataFrame, idCol: String, keyCol: String,
                     maxDf: Long): DfCapStats = {
    // the exploded posting table materializes ONCE (the operator's
    // own viaScratch discipline): the gram-level census and the
    // record-level emptied count both read it, and an unmaterialized
    // table would recompute the explode + df join per action
    val (withDf, scratch) = Materialize.viaScratchWithPath(
      {
        val exploded = records
          .select(col(idCol).as("__id"), col(keyCol).as("__k"))
          .select(col("__id"), explode(array_distinct(expr(
            "transform(sequence(1, greatest(length(__k) - 2, 1))," +
              " i -> substring(__k, i, 3))"))).as("__g"))
        exploded.join(
          exploded.groupBy(col("__g")).agg(count(lit(1)).as("__df")),
          "__g")
      },
      "graft-er-dfstats")
    try {
      val r = withDf.agg(
        countDistinct(col("__g")).as("grams"),
        countDistinct(when(col("__df") > maxDf, col("__g")))
          .as("dropped_grams"),
        sum(when(col("__df") > maxDf, 1L).otherwise(0L))
          .as("dropped_postings")).collect()(0)
      val emptied = withDf.groupBy(col("__id"))
        .agg(max(when(col("__df") <= maxDf, 1L).otherwise(0L))
          .as("__keep"))
        .filter(col("__keep") === 0L).count()
      def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
      DfCapStats(l(0), l(1), l(2), emptied)
    } finally scratch.drop()
  }

  /** Fellegi–Sunter field weights in micros from the field's m- and
    * u-probabilities (P(agree | match) and P(agree | non-match)):
    * (log₂(m/u), log₂((1−m)/(1−u))), each rounded to integer micros.
    * Weight derivation happens ONCE on the driver; the per-pair score
    * is then pure integer arithmetic — exact, engine-independent, and
    * free of per-row floating point.
    */
  def fsWeightsMicros(m: Double, u: Double): (Long, Long) = {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1, got m=$m u=$u")
    def log2micros(x: Double): Long =
      math.round(math.log(x) / math.log(2.0) * 1e6)
    (log2micros(m / u), log2micros((1 - m) / (1 - u)))
  }

  /** Fellegi–Sunter record-linkage scoring over candidate pairs: each
    * field contributes its agreement weight when `agree` holds, its
    * (negative) disagreement weight otherwise; the pair's score is the
    * sum, and thresholds classify `match` / `possible` (the clerical-
    * review band) / `non-match`. Fields are (agreement predicate,
    * agreeWeightMicros, disagreeWeightMicros) — derive the weights
    * from trained m/u probabilities with [[fsWeightsMicros]], or pass
    * hand-tuned values. A pure projection over the blocked pair list:
    * no shuffle beyond what produced the candidates, codegen'd
    * end-to-end, linear in pairs at any corpus size.
    */
  def fellegiSunter(pairs: DataFrame,
                    fields: Seq[(Column, Long, Long)],
                    upperMicros: Long,
                    lowerMicros: Long): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    require(upperMicros >= lowerMicros, "upper threshold below lower")
    val score = fields.map { case (agree, aw, dw) =>
      when(agree, lit(aw)).otherwise(lit(dw))
    }.reduce(_ + _)
    pairs
      .withColumn("fs_micros", score)
      .withColumn("fs_class",
        when(col("fs_micros") >= upperMicros, lit("match"))
          .when(col("fs_micros") > lowerMicros, lit("possible"))
          .otherwise(lit("non-match")))
  }
}
