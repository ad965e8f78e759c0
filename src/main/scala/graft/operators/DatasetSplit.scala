package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test assignment for training-data curation.
  *
  * The split keys on a CONTENT hash (first md5 byte of the text), not
  * on a random number or a row id:
  *  - reproducible across runs, engines, and repartitions (no seed
  *    state, no row ordering dependence);
  *  - the assignment moves with the text, so an exact duplicate that
  *    survives into the corpus twice lands in the SAME split — no
  *    train/test leakage through the split boundary (near-dups are
  *    the dedup operators' job);
  *  - pure codegen'd expressions (md5 + substring + conv), zero
  *    shuffle: the split is a projection the scan pipeline absorbs.
  *
  * Granularity is 1/256 (one hash byte): split fractions are
  * expressed in bucket counts so the boundary is exact and
  * engine-independent, not a float comparison.
  */
object DatasetSplit {

  /** Stable bucket in [0, 256): the first byte of md5(content). */
  def bucket256(content: Column): Column =
    conv(substring(md5(content), 1, 2), 16, 10).cast("int")

  /** Difficulty/quantile BAND assignment by approximate cuts — the
    * 100 TB arm of the curriculum gate's exact ntile
    * (q_t_curriculum): ntile needs a global sort-rank through one
    * partition, impossible at corpus scale, while approx_percentile
    * is a MERGEABLE one-pass sketch (Greenwald-Khanna), so the n−1
    * cut points cost one aggregation over the corpus and come back
    * as bounded driver metadata (like the ANN probe lists). Band
    * assignment is then a scan-side literal comparison — no global
    * sort, no single-partition window, no second shuffle.
    *
    * `band` is 1-based and ASCENDS with `valueCol` (mirror a
    * descending curriculum by negating the value). Documented
    * divergence from ntile: equal values land in ONE band (value
    * semantics) where ntile splits ties by rank, and the sketch's
    * cut positions are within its accuracy guarantee of the exact
    * ones — the spec bounds the total per-row disagreement on the
    * curriculum gate corpus. NULL values band NULL (missing ≠
    * easiest).
    */
  def quantileBands(df: DataFrame, valueCol: Column, n: Int,
                    accuracy: Int = 10000,
                    bandCol: String = "band"): DataFrame = {
    require(n >= 2, s"need at least 2 bands, got $n")
    val probs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val row = df.select(
      percentile_approx(valueCol, probs, lit(accuracy)).as("c")).head()
    if (row.isNullAt(0))        // empty input: nothing to band
      return df.withColumn(bandCol,
        when(valueCol.isNotNull, lit(1)).otherwise(lit(null)))
    val cuts = row.getSeq[Any](0)
    val band = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(valueCol > lit(c), 1).otherwise(0)
    }
    df.withColumn(bandCol,
      when(valueCol.isNotNull, band).otherwise(lit(null)))
  }

  /** Stable bucket in [0, 65536): the first two md5 bytes — the
    * finer-grained sibling of [[bucket256]] for stages whose keep
    * rates need better than 1/256 resolution (temperature mixing).
    */
  def bucket65536(content: Column): Column =
    conv(substring(md5(content), 1, 4), 16, 10).cast("int")

  /** Temperature-scaled mixture keep-rates — the multilingual-/
    * multi-source-sampling step of a pretraining mix (sampling
    * probability ∝ p_g^(1/T), the standard temperature form).
    *
    * Relation to [[rebalanceTemperature]] (the exact-iroot form): that
    * path is exact integer arithmetic for RATIONAL α = num/den at
    * 1/256 rate resolution; this one takes any REAL T ≥ 1 (one
    * driver-side pow rounding, returned so the identical literals can
    * be interpolated into an oracle — the PCA weight-literal pattern)
    * at 1/65536 resolution. The finer buckets are the point: at a
    * 1000:1 group ratio and high T the correct keep rate for the big
    * group is ~1/1000, which rounds to ZERO of 256 buckets (the group
    * empties) but to ~65 of 65536.
    *
    * Group g keeps `rate_g/65536` of its rows with
    *
    *   rate_g = round(65536·(n_g/n_min)^((1−T)/T))
    *
    * so at T = 1 every group keeps everything (rate 65536), and as
    * T → ∞ keep ∝ 1/n_g (groups equalize). T ≥ 1 only: temperatures
    * below 1 would require UPsampling the large groups, which a
    * filter cannot express (that is [[Packing]]-with-repetition
    * territory). Rates are computed ONCE on the driver from the
    * group-count table (bounded — groups are languages/sources, not
    * rows) and returned so callers can interpolate the identical
    * literals into an oracle (the PCA weight-literal pattern): the
    * pow() rounding happens at ONE site, never re-derived per engine.
    * Null groups carry no rate and are dropped by [[temperatureMix]].
    */
  def temperatureMixRates(df: org.apache.spark.sql.DataFrame,
                          groupCol: String,
                          temperature: Double): Seq[(String, Int)] = {
    require(temperature >= 1.0,
      s"temperature $temperature < 1 would need upsampling, not a filter")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.nonEmpty, "no non-null groups to mix")
    val nMin = counts.map(_._2).min
    counts.map { case (g, n) =>
      val keep = math.pow(n.toDouble / nMin,
        (1.0 - temperature) / temperature)
      g -> math.min(65536L, math.max(0L,
        math.round(65536.0 * keep))).toInt
    }.toSeq.sortBy(_._1)
  }

  /** Temperature-scaled EPOCH factors — the UPSAMPLING twin of
    * [[temperatureMixRates]], closing its documented T-form gap
    * ("temperatures below 1 would require UPsampling … repetition
    * territory"): instead of filtering the large groups down to the
    * smallest, repeat the small groups up to the LARGEST —
    *
    *   factor_g = round(65536·(n_g/n_max)^((1−T)/T))  (≥ 65536)
    *
    * so at T = 1 every group trains exactly 1.0 epoch (identity) and
    * as T → ∞ factor → n_max/n_g (groups equalize by repetition —
    * the multilingual temperature-sampling deployment where rare
    * languages are epoch-repeated rather than common ones
    * discarded). Same contract as the mix rates: ONE driver-side pow
    * rounding over the bounded group-count table, literals returned
    * for oracle interpolation; feed the result to
    * [[repeatFractional]]. Clamped to Int.MaxValue (a 32767:1 group
    * ratio at T → ∞ saturates the 65536ths representation — a
    * corpus that skewed needs curation, not 32k epochs).
    */
  def temperatureEpochFactors(df: DataFrame, groupCol: String,
                              temperature: Double): Seq[(String, Int)] = {
    require(temperature >= 1.0,
      s"temperature $temperature < 1 inverts the form; use " +
        "temperatureMixRates for the downsampling direction")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.nonEmpty, "no non-null groups to mix")
    val nMax = counts.map(_._2).max
    counts.map { case (g, n) =>
      val f = math.pow(n.toDouble / nMax,
        (1.0 - temperature) / temperature)
      g -> math.min(Int.MaxValue.toLong,
        math.max(65536L, math.round(65536.0 * f))).toInt
    }.toSeq.sortBy(_._1)
  }

  /** Apply [[temperatureMixRates]]: keep a row iff its salted content
    * bucket falls under its group's rate. Map-only (the rates ride
    * the plan as a map literal); rows whose group has no rate (null,
    * or unseen relative to the `rates` the caller computed) drop.
    */
  def temperatureMix(df: org.apache.spark.sql.DataFrame,
                     groupCol: String, contentCol: Column,
                     rates: Seq[(String, Int)],
                     salt: String = "tmix"): org.apache.spark.sql.DataFrame = {
    val rateOf = element_at(
      typedlit(rates.toMap), col(groupCol).cast("string"))
    df.filter(
      bucket65536(concat(lit(salt + ":"), contentCol)) < rateOf)
  }

  /** [[bucket256]] under a salt prefix — an INDEPENDENT hash family
    * per salt. Any stage that samples by content hash (mixing,
    * subsampling) must use a different salt than the split: with the
    * same key, "keep rate/256" and "bucket < trainBuckets" are the
    * same event, so a mixing pass at rate ≤ trainBuckets would empty
    * val/test entirely (found by the q_pipe_curate2 composition gate).
    */
  def bucket256Salted(content: Column, salt: String): Column =
    bucket256(concat(lit(salt + ":"), content))

  /** Deterministic sampling predicate: keeps ≈ keepBuckets/256 of the
    * rows, keyed on the same content hash as the split — so a sample
    * is stable across runs AND consistent with the split boundaries
    * (a sampled subset of train stays inside train for
    * keepBuckets ≤ trainBuckets).
    */
  def hashSample(content: Column, keepBuckets: Int): Column = {
    require(keepBuckets >= 0 && keepBuckets <= 256,
      "keepBuckets must be in [0, 256]")
    bucket256(content) < keepBuckets
  }

  /** 'train' / 'val' / 'test' label from the content bucket.
    * Defaults 205/25/26 buckets ≈ 80.1% / 9.8% / 10.2%.
    */
  def splitLabel(content: Column, trainBuckets: Int = 205,
                 valBuckets: Int = 25): Column = {
    require(trainBuckets >= 0 && valBuckets >= 0 &&
      trainBuckets + valBuckets <= 256,
      "bucket counts must fit in [0, 256]")
    val b = bucket256(content)
    when(b < trainBuckets, lit("train"))
      .when(b < trainBuckets + valBuckets, lit("val"))
      .otherwise(lit("test"))
  }

  /** STRATIFIED split — exact per-stratum fractions where the plain
    * hash split only converges in expectation: a 300-row language
    * under [[splitLabel]] can easily land 74/13/13 when the recipe
    * says 80/10/10, and low-resource strata are exactly where the
    * drift hurts evaluation. Per stratum, the DISTINCT content hashes are
    * ranked in deterministic (hash) order and cut at the exact
    * integer thresholds rank·10⁶ ≤ n_distinct·frac — so fractions
    * are exact over distinct contents, and every copy of a duplicated
    * text WITHIN a stratum shares its hash-rank and therefore its
    * side (an exact-over-ROWS cut would have to straddle duplicate
    * groups at the boundary).
    *
    * LEAK SCOPE — within-stratum only (round-15 ADVICE): the rank is
    * computed PER STRATUM, so the same content appearing under two
    * strata can be cut to train in one and test in the other —
    * exact per-stratum fractions and a global hash cut are mutually
    * exclusive (a global cut cannot hit every stratum's integer
    * thresholds). [[splitLabel]]'s global-hash guarantee is the one
    * to use when contents repeat ACROSS strata; otherwise dedup
    * first (or verify strata partition the distinct contents, which
    * per-language corpora usually do) before relying on this split
    * for leak-free evaluation.
    *
    * Scale shape: ONE distinct over (stratum, hash), one window over
    * that DEDUPLICATED table (never a sort of the corpus — a stratum
    * can be half the corpus, its distinct-hash table is what must fit
    * the sort budget), one null-safe hash-equi join back. Engine-
    * reproducible and SQL-replayable (md5 hex + dense ranks + integer
    * cross-multiplication).
    */
  def stratifiedSplitLabel(df: DataFrame, strataCol: String,
                           contentCol: String,
                           trainMicros: Long = 800000L,
                           valMicros: Long = 100000L): DataFrame = {
    require(trainMicros >= 0 && valMicros >= 0 &&
      trainMicros + valMicros <= 1000000L,
      s"fractions are micros with train+val <= 1e6: $trainMicros+$valMicros")
    import org.apache.spark.sql.expressions.Window
    val hashed = df.withColumn("__h",
      md5(coalesce(col(contentCol).cast("string"), lit(""))))
    val wRank = Window.partitionBy(col(strataCol)).orderBy(col("__h"))
    val wStr = Window.partitionBy(col(strataCol))
    val ranked = hashed.select(col(strataCol), col("__h")).distinct()
      .withColumn("__r", row_number().over(wRank))
      .withColumn("__nd", count(lit(1)).over(wStr))
      .select(col(strataCol).as("__s"), col("__h").as("__hh"),
        when(col("__r") * 1000000L <= col("__nd") * trainMicros,
          lit("train"))
          .when(col("__r") * 1000000L <=
            col("__nd") * (trainMicros + valMicros), lit("val"))
          .otherwise(lit("test")).as("split"))
    hashed.join(ranked,
        col(strataCol) <=> col("__s") && col("__h") === col("__hh"))
      .drop("__h", "__s", "__hh")
  }

  /** Deterministic weighted corpus mixing: keep a row with per-group
    * probability rate/256, keyed on a SALTED content hash — the "30%
    * web, 45% books, re-weight the rest" step of assembling a
    * pretraining mixture, with the same reproducibility contract as
    * the split (stable across runs, engines, repartitions; duplicates
    * land together) but statistically independent of the split
    * assignment (see [[bucket256Salted]] — an unsalted mixing pass
    * correlates with the split boundary and starves val/test). A
    * projection + filter the scan absorbs: no shuffle, no seed state.
    */
  def weightedSampleFilter(content: Column, group: Column,
                           rates: Map[String, Int],
                           defaultRate: Int,
                           salt: String = "mix"): Column = {
    require((defaultRate +: rates.values.toSeq)
      .forall(r => r >= 0 && r <= 256),
      "rates are bucket counts in [0, 256]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (g, r)) =>
      when(group === g, lit(r)).otherwise(acc)
    }
    bucket256Salted(content, salt) < rate
  }

  /** Deterministic FRACTIONAL REPETITION — the upsampling side of a
    * pretraining mixture ("2.3 epochs of wiki, 1.5 of books, 1 of
    * the rest"), which [[weightedSampleFilter]] cannot express (a
    * keep-filter only goes DOWN). Per-group epoch factors are given
    * in 65536ths: every row repeats ⌊f⌋ times, plus once more when
    * its salted 16-bit content bucket falls under the fractional
    * part — so a group's row (and token) budget scales by exactly
    * f/65536 in expectation with the same reproducibility contract
    * as the split/mix stages (stable across runs, engines,
    * repartitions; identical texts land in the same epoch count; the
    * `rep` salt keeps the extra-copy choice independent of split and
    * mix buckets). Factors < 65536 degrade gracefully to pure
    * downsampling (⌊f⌋ = 0 rows drop unless the fraction keeps
    * them), so one operator covers the whole mixing axis. Output =
    * input columns + `copy` (1-based epoch index) — a scan-side
    * row multiplication (projection + explode, no shuffle, no seed
    * state); training-order shuffling stays a separate stage.
    */
  def repeatFractional(df: DataFrame, content: Column, group: Column,
                       factors64k: Map[String, Int], default64k: Int,
                       salt: String = "rep",
                       copyCol: String = "copy"): DataFrame = {
    require((default64k +: factors64k.values.toSeq).forall(_ >= 0),
      "epoch factors are 65536ths and must be non-negative")
    val f = factors64k.foldLeft(lit(default64k)) { case (acc, (g, r)) =>
      when(group === g, lit(r)).otherwise(acc)
    }
    val copies = floor(f.cast("long") / lit(65536L)).cast("int") +
      when(bucket65536(concat(lit(salt + ":"), content)) < f % 65536, 1)
        .otherwise(0)
    // sequence(1, 0) COUNTS DOWN — zero-copy rows must drop before
    // the explode, not explode into a descending range
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(1), col("__copies"))))
      .drop("__copies")
  }

  /** Per-group sampling rates that REBALANCE the corpus toward integer
    * target weights: after filtering with these rates, each group's
    * kept count is ≈ proportional to its weight, scaled so the
    * SCARCEST group (relative to its weight) is kept whole — the
    * "assemble the pretraining mixture to 60/40" step, driven by the
    * actual counts instead of hand-tuned rates.
    *
    * All arithmetic is integer (2²⁰-scaled ratios, 256-bucket rates),
    * so an oracle engine replaying the same formula gets bit-identical
    * rates — no floating normalization anywhere:
    * `c = min_g ⌊N_g·2²⁰ / w_g⌋`, `rate_g = ⌊256·w_g·c / (N_g·2²⁰)⌋`
    * (≤ 256 by construction; the binding group rounds to ~256).
    */
  def rebalanceRates(counts: Map[String, Long],
                     weights: Map[String, Int]): Map[String, Int] = {
    require(weights.values.forall(_ > 0), "target weights must be positive")
    val present = weights.filter { case (g, _) => counts.getOrElse(g, 0L) > 0 }
    if (present.isEmpty) Map.empty
    else {
      val c = present.map { case (g, w) =>
        (BigInt(counts(g)) * 1048576) / w }.min
      present.map { case (g, w) =>
        g -> (((BigInt(256) * w * c) / (BigInt(counts(g)) * 1048576))
          .toInt min 256)
      }
    }
  }

  /** Filter `df` down to a target group mixture: one bounded count per
    * group (a driver round-trip of |groups| rows — the same category
    * as a broadcast-size estimate), [[rebalanceRates]], then the
    * deterministic content-hash filter. Groups without a target weight
    * are dropped; a weighted group with zero rows simply contributes
    * nothing (the remaining groups rebalance among themselves).
    */
  def rebalanceToTarget(df: org.apache.spark.sql.DataFrame,
                        contentCol: String, groupCol: String,
                        weights: Map[String, Int],
                        salt: String = "mix"): org.apache.spark.sql.DataFrame = {
    val counts = df
      .filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = rebalanceRates(counts, weights)
    if (rates.isEmpty) df.filter(lit(false))
    else df.filter(col(groupCol).isin(rates.keys.toSeq: _*))
      .filter(weightedSampleFilter(col(contentCol), col(groupCol), rates,
        defaultRate = 0, salt))
  }

  /** Temperature-scaled group weights: w_g = ⌊count_g^(num/den)⌋ (≥ 1),
    * computed as an EXACT integer root (binary search on BigInt, no
    * floating pow — `pow` is not correctly rounded and two engines'
    * libm may disagree on the last bit; an integer root cannot). The
    * multilingual-training standard (α-sampling, α ∈ (0,1]): α < 1
    * compresses group-size disparities so low-resource groups are
    * upsampled relative to their share — α = 1/2 is the common
    * square-root temperature.
    */
  def temperatureWeights(counts: Map[String, Long], alphaNum: Int = 1,
                         alphaDen: Int = 2): Map[String, Int] = {
    require(alphaNum >= 1 && alphaDen >= alphaNum,
      s"temperature must be a rational α = num/den in (0, 1], " +
        s"got $alphaNum/$alphaDen")
    counts.collect { case (g, c) if c > 0 =>
      val w = iroot(BigInt(c).pow(alphaNum), alphaDen)
      require(w.isValidInt, s"weight overflow for group $g (count $c)")
      g -> math.max(1, w.toInt)
    }
  }

  /** Rebalance the corpus to a temperature-scaled mixture: per-group
    * counts (one bounded aggregate, |groups| driver rows) →
    * [[temperatureWeights]] → the same integer [[rebalanceRates]] /
    * content-hash filter as [[rebalanceToTarget]] — so the whole
    * pipeline stays deterministic and engine-replayable. Every
    * observed group participates (temperature defines the target FROM
    * the data; there is no external weight list to restrict to).
    */
  def rebalanceTemperature(df: org.apache.spark.sql.DataFrame,
                           contentCol: String, groupCol: String,
                           alphaNum: Int = 1, alphaDen: Int = 2,
                           salt: String = "mix")
      : org.apache.spark.sql.DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = rebalanceRates(counts,
      temperatureWeights(counts, alphaNum, alphaDen))
    if (rates.isEmpty) df.filter(lit(false))
    else df.filter(col(groupCol).isin(rates.keys.toSeq: _*))
      .filter(weightedSampleFilter(col(contentCol), col(groupCol), rates,
        defaultRate = 0, salt))
  }

  /** Duffield–Lund–Thorup priority sampling: a k-item
    * weight-proportional sample WITHOUT replacement, deterministic and
    * engine-replayable (Priority sampling, Duffield/Lund/Thorup 2007 —
    * item i gets priority q_i = w_i / u_i for u_i ~ U(0,1]; the k
    * largest priorities form the sample, and the scheme's inclusion
    * probabilities are ∝ w_i for w_i well below the threshold).
    *
    * Determinism contract (same as the split/mixing family): u_i comes
    * from a CONTENT hash, not an RNG — the first 8 md5 hex digits of
    * `seed:id` give h ∈ [1, 2³²] and q_i = ⌊w_i·2³² / h⌋ in EXACT int64
    * arithmetic (w ≤ 2²¹ keeps the product < 2⁵³; enforced). Ties are
    * broken by id, so (q desc, id asc) is a total order and the top-k
    * is one fixed set across runs, engines, and repartitions.
    *
    * Execution shape (100 TB): hash + priority are codegen'd
    * projections the scan absorbs; the top-k is Spark's
    * TakeOrderedAndProject — per-partition bounded heaps, only k rows
    * ever cross the wire. No global sort, no shuffle of the corpus.
    * The standard "select a token-budget subset, favoring long/heavy
    * documents" curation step.
    */
  def prioritySample(df: org.apache.spark.sql.DataFrame, idCol: String,
                     weightCol: String, k: Int, seed: String)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"sample size k must be positive, got $k")
    val h = conv(substring(md5(concat(lit(seed + ":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long") + lit(1L)
    val w = when(col(weightCol) >= 1 && col(weightCol) <= 2097152,
      col(weightCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("prioritySample: weight out of [1, 2^21]: "),
        col(weightCol).cast("string"))))
    df.withColumn("__h", h).withColumn("__w", w)
      .withColumn("priority", expr("(__w * 4294967296L) div __h"))
      .select(col(idCol), col("__w").as("weight"), col("priority"))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
  }

  /** Largest r with r^n ≤ x (x ≥ 0, n ≥ 1) — exact integer root. */
  private[graft] def iroot(x: BigInt, n: Int): BigInt = {
    require(x >= 0 && n >= 1)
    if (x < 2 || n == 1) return x
    var lo = BigInt(1)
    var hi = BigInt(1) << (x.bitLength / n + 1)
    while (lo < hi) { // invariant: lo^n ≤ x < (hi+1)^n
      val mid = (lo + hi + 1) / 2
      if (mid.pow(n) <= x) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Deterministic global shuffle into `nShards` training shards —
    * the "shuffle the corpus before writing epoch shards" step every
    * training pipeline runs, without a seed-stateful RNG or a global
    * sort.
    *
    * Each row gets `(shard, pos)`: shard from the first md5 byte of
    * `seed:id` (same portable hex arithmetic as [[bucket256]], an
    * independent family per seed), position from a row_number over the
    * full md5 hex WITHIN the shard (id as tiebreak — md5 collisions
    * aside, a total order). Reading shards in pos order replays one
    * fixed permutation of the corpus; changing the seed gives an
    * unrelated permutation, so multi-epoch training shuffles by
    * bumping the seed, never by re-materializing data.
    *
    * Execution shape (100 TB): shard assignment is a pure projection;
    * the ONLY shuffle is the per-shard window's hash partition on
    * `shard` — there is no global ordering anywhere (positions within
    * different shards are independent). nShards should be ≳ the
    * cluster's write parallelism; per-shard position is a sort of
    * corpus/nShards rows, the same cost as the shard write itself.
    */
  /** Leakage-safe split: assign train/val/test by the NEAR-DUP
    * FAMILY, not the document. [[splitLabel]] already keeps exact
    * duplicates together (same text ⇒ same hash); near-duplicates
    * hash differently, so a content split scatters a duplicate family
    * across train AND test — the classic contamination path
    * train/test dedup exists to close. Here every document inherits
    * its connected component over the near-dup pair list
    * ([[Dedup.connectedComponents]]'s min-label, so the key is the
    * family's smallest member id — deterministic, not
    * partition-dependent), and the split hashes the COMPONENT id:
    * whole families move between splits as a unit. Documents in no
    * pair are their own singleton family (left join + coalesce), so
    * the operator never drops or re-keys clean documents.
    *
    * Cost shape at 100 TB: CC over the pair list (pairs ≪ corpus
    * after LSH), one broadcast-or-shuffle left join of the labels
    * back onto the corpus, then the same zero-shuffle hash
    * projection as [[splitLabel]].
    */
  def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame,
                       idCol: String,
                       pairs: org.apache.spark.sql.DataFrame,
                       trainBuckets: Int = 205,
                       valBuckets: Int = 25): org.apache.spark.sql.DataFrame = {
    val cc = Dedup.connectedComponents(pairs)
    docs.join(cc.withColumnRenamed("id", "__cc_id"),
        docs(idCol) === col("__cc_id"), "left")
      .withColumn("component", coalesce(col("component"), docs(idCol)))
      .drop("__cc_id")
      .withColumn("split", splitLabel(col("component").cast("string"),
        trainBuckets, valBuckets))
  }

  def deterministicShuffle(df: org.apache.spark.sql.DataFrame,
                           idCol: String, seed: String,
                           nShards: Int): org.apache.spark.sql.DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1, 256] (one md5 byte), got $nShards")
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__shufkey", key)
      .withColumn("shard",
        (conv(substring(col("__shufkey"), 1, 2), 16, 10).cast("int")
          % nShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__shufkey"), col(idCol))).cast("long"))
      .drop("__shufkey")
  }
}
