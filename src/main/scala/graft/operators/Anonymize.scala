package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity assessment over quasi-identifier columns — the privacy
  * gate a training corpus passes before release: any combination of
  * quasi-identifiers (zip + age + segment…) shared by fewer than k
  * records can single someone out, so such rows must generalize to a
  * coarser key or be suppressed.
  *
  * Model: a GENERALIZATION LADDER — an ordered list of key levels,
  * finest first (e.g. exact bucket → wide bucket → segment only). Each
  * row is assigned the first level whose key-group reaches k, counting
  * over ALL rows at that level (not just rows that failed finer
  * levels — this keeps the contract order-free and lets any engine
  * replay it as plain window counts); rows no level saves get -1
  * (suppress).
  *
  * Scale shape: one window count per level = one shuffle per level on
  * that level's key — no self-joins, no iteration. Level keys are
  * usually nested (coarser = prefix of finer), in which case a single
  * repartition by the coarsest key would co-locate all levels; Spark
  * already collapses compatible window partitionings where it can.
  */
object Anonymize {

  /** Adds `anon_level`: the index (0-based) of the first level in
    * `levels` whose key-group holds ≥ k rows; -1 if none (suppress).
    */
  def kAnonymityLevels(
      df: DataFrame, levels: Seq[Seq[Column]], k: Long): DataFrame = {
    require(levels.nonEmpty, "at least one generalization level")
    var out = df
    for ((cols, i) <- levels.zipWithIndex) {
      val w = Window.partitionBy(cols: _*)
      out = out.withColumn(s"__kan$i", count(lit(1)).over(w))
    }
    val lvl = levels.indices.foldRight(lit(-1)) { (i, els) =>
      when(col(s"__kan$i") >= k, lit(i)).otherwise(els)
    }
    out.withColumn("anon_level", lvl)
      .drop(levels.indices.map(i => s"__kan$i"): _*)
  }

  /** Keep only rows whose finest satisfied level is at most
    * `maxLevel` (suppressing the rest), dropping the helper column —
    * the release filter.
    */
  def kAnonymize(
      df: DataFrame, levels: Seq[Seq[Column]], k: Long,
      maxLevel: Int): DataFrame =
    kAnonymityLevels(df, levels, k)
      .filter(col("anon_level") >= 0 && col("anon_level") <= maxLevel)
      .drop("anon_level")

  /** Distinct l-diversity audit — k-anonymity's necessary complement:
    * a group of ≥ k records that all share one SENSITIVE value still
    * discloses it for everyone in the group (the homogeneity attack),
    * so a releasable group must also hold at least `l` distinct
    * sensitive values. Per quasi-identifier group: row count, distinct
    * sensitive count, and the verdict. NULL sensitive values are
    * missing data, not a disclosed value — they never count toward
    * diversity (a group of only-NULLs reads 0 distinct and fails).
    *
    * Scale shape: ONE groupBy on the quasi key with a count-distinct —
    * the same single shuffle the k-anonymity window pays per level.
    */
  def lDiversityGroups(df: DataFrame, quasi: Seq[Column],
                       sensitive: Column, l: Long): DataFrame = {
    require(quasi.nonEmpty, "at least one quasi-identifier column")
    require(l >= 1, s"l must be positive, got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** ENTROPY l-diversity — the skew-aware form: distinct-l passes a
    * group where one sensitive value holds 99% of the rows (an
    * attacker's posterior is nearly certain anyway); the entropy form
    * requires H(sensitive | group) ≥ ln(l), so probability mass must
    * actually spread. Exactness discipline: the per-VALUE term
    * round(1e6·(n_v/n)·ln(n/n_v)) rounds ONCE per value (the
    * DSIR/vocabDrift construction — no float summation order reaches
    * the artifact), the group entropy is the exact integer sum, and
    * the verdict compares against the integer threshold
    * round(1e6·ln l). NULL sensitive values are missing data and drop
    * before counting (a group of only-NULLs has no rows here).
    *
    * Shape: two groupBys + one join on the quasi key — the
    * value-count table is the only addition over the distinct form.
    * Quasi columns by NAME (the join needs stable keys). Joins on the
    * quasi key are NULL-SAFE (`<=>`) so a group whose quasi value is
    * NULL is audited like any other — groupBy keeps null groups, and a
    * null-unsafe join would silently drop them from the audit (the one
    * kind of row a privacy audit must never lose).
    */
  def entropyLDiversityGroups(df: DataFrame, quasi: Seq[String],
                              sensitive: Column, l: Long): DataFrame = {
    require(quasi.nonEmpty, "at least one quasi-identifier column")
    require(l >= 1, s"l must be positive, got $l")
    val base = df.filter(sensitive.isNotNull)
      .select(quasi.map(col) :+ sensitive.as("__v"): _*)
    val nv = base.groupBy((quasi :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__nv"))
    val tot = nv.groupBy(quasi.map(col): _*)
      .agg(sum(col("__nv")).as("n_rows"),
        count(lit(1)).as("n_sensitive"))
    def nullSafeOn(left: DataFrame, la: String, right: DataFrame,
                   ra: String): Column =
      quasi.map(q => col(s"$la.$q") <=> col(s"$ra.$q")).reduce(_ && _)
    val terms = nv.alias("__l")
      .join(tot.alias("__r"), nullSafeOn(nv, "__l", tot, "__r"))
      .select(quasi.map(q => col(s"__l.$q")) :+
        round(lit(1000000.0) *
          (col("__nv").cast("double") / col("n_rows").cast("double")) *
          log(col("n_rows").cast("double") / col("__nv").cast("double")))
          .cast("long").as("__t"): _*)
    val thresholdMicros = math.round(1000000.0 * math.log(l.toDouble))
    val ent = terms.groupBy(quasi.map(col): _*)
      .agg(sum(col("__t")).as("entropy_micros"))
    ent.alias("__l")
      .join(tot.alias("__r"), nullSafeOn(ent, "__l", tot, "__r"))
      .select(quasi.map(q => col(s"__l.$q").as(q)) :+ col("n_rows") :+
        col("n_sensitive") :+ col("entropy_micros") :+
        (col("entropy_micros") >= thresholdMicros).as("diverse"): _*)
  }

  /** t-CLOSENESS audit — the distribution-aware complement of
    * l-diversity: a group can hold l distinct sensitive values and
    * still leak (the skewness attack — a group that is 75% "cancer"
    * in a 5%-cancer corpus discloses plenty), so a releasable group's
    * sensitive DISTRIBUTION must sit within Earth-Mover's Distance t
    * of the corpus-wide one. Over an ORDERED domain with m values,
    * EMD(p, q) = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (p_j − q_j)| (Li, Li &
    * Venkatasubramanian, ICDE 2007, §5.2 — the ordered-distance
    * form).
    *
    * Exactness discipline: the prefix terms are INTEGER count
    * cross-products — P_i = Σ_{j≤i} (n_gj·N − N_j·n_g) — so
    * EMD = Σ|P_i| / ((m−1)·n_g·N) exactly, no float summation, no
    * rounding boundary, no margin probe. `emd_micros` is the single
    * truncating division at the end; the verdict compares
    * cross-multiplied int64 (Σ|P_i|·1e6 ≤ t·(m−1)·n_g·N), exact like
    * the Fleiss-κ scalars. A LOUD envelope guard refuses corpora
    * where (m−1)·N²·1e6 could overflow int64 (N ≈ 10⁶ at m=10) —
    * beyond it, route to a micros-rounded-probabilities arm rather
    * than silently wrapping.
    *
    * NULL sensitive values are missing data and drop (the
    * entropy-form rule); NULL quasi values form an audited group
    * (null-safe joins — the one kind of row a privacy audit must
    * never lose). Scale shape: two groupBys + one broadcast of the
    * m-row domain table + ONE window per group over the groups×m
    * grid — m is small by the ordered-domain contract, so the grid
    * is |groups|·m rows, never |rows|.
    */
  def tClosenessGroups(df: DataFrame, quasi: Seq[String],
                       sensitive: Column, tMicros: Long): DataFrame = {
    require(quasi.nonEmpty, "at least one quasi-identifier column")
    require(tMicros >= 0 && tMicros <= 1000000L,
      s"t is a micros fraction in [0, 1e6], got $tMicros")
    val base = df.filter(sensitive.isNotNull)
      .select(quasi.map(col) :+ sensitive.as("__v"): _*)
    // corpus distribution over the ordered domain (m rows, broadcast)
    val vals = base.groupBy(col("__v")).agg(count(lit(1)).as("__cv"))
    // N and m: bounded driver metadata (one tiny agg over the m-row
    // table), like the probe lists — they become plan literals
    val scalars = vals.agg(sum(col("__cv")), count(lit(1))).head()
    val gtot = base.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    if (scalars.isNullAt(0))          // empty corpus: nothing to audit
      return gtot.select(quasi.map(col) :+ col("n_rows") :+
        lit(0L).as("emd_micros") :+ lit(true).as("close"): _*)
    val (nTotal, m) = (scalars.getLong(0), scalars.getLong(1))
    if (m <= 1)                       // one-value domain: EMD ≡ 0
      return gtot.select(quasi.map(col) :+ col("n_rows") :+
        lit(0L).as("emd_micros") :+ lit(true).as("close"): _*)
    require((m - 1).toDouble * nTotal.toDouble * nTotal.toDouble * 1e6
      < Long.MaxValue.toDouble * 0.99,
      s"t-closeness exact-integer envelope exceeded: (m-1)·N²·1e6 with " +
        s"m=$m, N=$nTotal would overflow int64 — use a coarser domain " +
        "or a micros-rounded-probabilities variant at this scale")
    val indexed = vals.withColumn("__i",
      row_number().over(Window.orderBy(col("__v"))))
    val gv = base.groupBy((quasi :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__ng"))
    // full grid: every group × every ordered value — absent cells are
    // genuine zero counts and MUST contribute −N_j·n_g to the prefix
    val grid = gtot.alias("__g").crossJoin(broadcast(indexed.alias("__d")))
    val cond = quasi.map(q => col(s"__g.$q") <=> col(s"__gv.$q"))
      .reduce(_ && _) && (col("__d.__v") === col("__gv.__v"))
    val joined = grid.join(gv.alias("__gv"), cond, "left")
      .select(quasi.map(q => col(s"__g.$q")) :+ col("n_rows") :+
        col("__i") :+ col("__cv") :+
        coalesce(col("__gv.__ng"), lit(0L)).as("__ng"): _*)
    val wp = Window.partitionBy(quasi.map(col): _*).orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val emd = joined
      .withColumn("__p",
        sum(col("__ng") * nTotal - col("__cv") * col("n_rows")).over(wp))
      .filter(col("__i") < m)         // the i = m prefix is identically 0
      .groupBy(quasi.map(col) :+ col("n_rows"): _*)
      .agg(sum(abs(col("__p"))).as("__emd_num"))
    emd.select(quasi.map(col) :+ col("n_rows") :+
      expr(s"(__emd_num * 1000000L) div ((${m - 1}L) * n_rows * ${nTotal}L)")
        .as("emd_micros") :+
      (col("__emd_num") * 1000000L <=
        lit(tMicros * (m - 1) * nTotal) * col("n_rows")).as("close"): _*)
  }

  /** CATEGORICAL t-closeness — [[tClosenessGroups]]'s sibling for
    * non-ordinal sensitive attributes (diagnosis codes, segments,
    * categories), per the original Li/Li/Venkatasubramanian paper's
    * equal-distance ground metric: with every value pair at distance
    * 1, EMD degenerates to total-variation distance,
    * TVD = ½·Σ_v |p_g(v) − p(v)| — no ordered-domain prefix sums, no
    * (m−1) factor, strictly cheaper (one grid aggregation, no
    * window).
    *
    * Same exactness discipline as the ordered form: each cell term is
    * the integer cross-product |n_gv·N − N_v·n_g| (absent cells are
    * genuine zeros contributing N_v·n_g), `tvd_micros` is ONE
    * truncating division, and the verdict compares cross-multiplied
    * int64 (Σ·1e6 ≤ t·2·n_g·N). Σ ≤ 2·n_g·N ≤ 2N², so the LOUD
    * envelope guard is 2·N²·1e6 < 2⁶³ (N ≈ 2.1·10⁶) — no m in it,
    * so a wide categorical domain costs grid rows, never headroom.
    * A one-value domain reads TVD ≡ 0 with no special case (the
    * lone cell's cross-product is identically zero).
    *
    * NULL handling and scale shape mirror the ordered form: NULL
    * sensitive drops, NULL quasi audits as a group; two groupBys +
    * one broadcast domain table + a |groups|·m grid aggregation.
    */
  def tClosenessGroupsCat(df: DataFrame, quasi: Seq[String],
                          sensitive: Column, tMicros: Long): DataFrame = {
    require(quasi.nonEmpty, "at least one quasi-identifier column")
    require(tMicros >= 0 && tMicros <= 1000000L,
      s"t is a micros fraction in [0, 1e6], got $tMicros")
    val base = df.filter(sensitive.isNotNull)
      .select(quasi.map(col) :+ sensitive.as("__v"): _*)
    val vals = base.groupBy(col("__v")).agg(count(lit(1)).as("__cv"))
    val scalars = vals.agg(sum(col("__cv"))).head()
    val gtot = base.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    if (scalars.isNullAt(0))          // empty corpus: nothing to audit
      return gtot.select(quasi.map(col) :+ col("n_rows") :+
        lit(0L).as("tvd_micros") :+ lit(true).as("close"): _*)
    val nTotal = scalars.getLong(0)
    require(2.0 * nTotal.toDouble * nTotal.toDouble * 1e6
      < Long.MaxValue.toDouble * 0.99,
      s"categorical t-closeness exact-integer envelope exceeded: " +
        s"2·N²·1e6 with N=$nTotal would overflow int64 — audit a " +
        "partition of the corpus or use a micros-rounded variant")
    val gv = base.groupBy((quasi :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__ng"))
    val grid = gtot.alias("__g").crossJoin(broadcast(vals.alias("__d")))
    val cond = quasi.map(q => col(s"__g.$q") <=> col(s"__gv.$q"))
      .reduce(_ && _) && (col("__d.__v") === col("__gv.__v"))
    val tvd = grid.join(gv.alias("__gv"), cond, "left")
      .select(quasi.map(q => col(s"__g.$q")) :+ col("n_rows") :+
        col("__cv") :+
        coalesce(col("__gv.__ng"), lit(0L)).as("__ng"): _*)
      .groupBy(quasi.map(col) :+ col("n_rows"): _*)
      .agg(sum(abs(col("__ng") * nTotal - col("__cv") * col("n_rows")))
        .as("__num"))
    tvd.select(quasi.map(col) :+ col("n_rows") :+
      expr(s"(__num * 1000000L) div (2L * n_rows * ${nTotal}L)")
        .as("tvd_micros") :+
      (col("__num") * 1000000L <=
        lit(tMicros * 2L * nTotal) * col("n_rows")).as("close"): _*)
  }

  /** The t-closeness release filter — [[lDiversify]]'s sibling over
    * [[tClosenessGroups]]: keep rows whose quasi group's sensitive
    * distribution sits within t of the corpus. The audit + ONE
    * null-safe semi join on the quasi key. Privacy-conservative on
    * the audit's blind spot: a group with no non-null sensitive
    * values never appears in the audit, so its rows are NOT released
    * (unauditable ≠ close).
    */
  def tCloseRelease(df: DataFrame, quasi: Seq[String],
                    sensitive: Column, tMicros: Long): DataFrame = {
    val ok = tClosenessGroups(df, quasi, sensitive, tMicros)
      .filter(col("close"))
      .select(quasi.zipWithIndex.map { case (q, i) =>
        col(q).as(s"__q$i") }: _*)
    val cond = quasi.zipWithIndex
      .map { case (q, i) => df(q) <=> ok(s"__q$i") }
      .reduce(_ && _)
    df.join(ok, cond, "left_semi")
  }

  /** The release filter: keep rows whose quasi-identifier group is
    * l-diverse — one groupBy + one semi join on the (null-safe) quasi
    * key. Quasi columns may be arbitrary expressions, so the group
    * table carries aliased keys and the join matches positionally;
    * null quasi values form a group like groupBy does (`<=>`).
    */
  def lDiversify(df: DataFrame, quasi: Seq[Column],
                 sensitive: Column, l: Long): DataFrame = {
    val ok = df
      .groupBy(quasi.zipWithIndex.map { case (c, i) => c.as(s"__q$i") }: _*)
      .agg(countDistinct(sensitive).as("__ns"))
      .filter(col("__ns") >= l)
      .select(quasi.indices.map(i => col(s"__q$i")): _*)
    val cond = quasi.zipWithIndex
      .map { case (c, i) => c <=> ok(s"__q$i") }
      .reduce(_ && _)
    df.join(ok, cond, "left_semi")
  }
}
