package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Delta constraints /
  * DLT-expectations role): named boolean rules evaluated over a
  * dataset in ONE aggregation pass — never a scan per rule.
  *
  * `check` computes, per rule, how many rows violate it (null counts
  * as a violation: an expectation must PROVE itself true), plus the
  * total row count; the wide single-row aggregate is unpivoted to a
  * (rule, violations, rows) table so callers can threshold, alert, or
  * gate a pipeline stage on it. `enforce` is the fail-fast form.
  *
  * Scale shape: one partial+final aggregate over the scan — cost is
  * one pass regardless of rule count; nothing is collected but the
  * per-rule counters.
  */
object DataQuality {

  final case class Rule(name: String, cond: Column)

  def rule(name: String, sqlCond: String): Rule = Rule(name, expr(sqlCond))

  /** `(rule, violations, rows)` — one row per rule, one scan total. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.length == rules.length,
      "rule names must be unique")
    // names are interpolated into a selectExpr — identifier-safe
    // charset only, so a quote/backtick can neither break parsing nor
    // inject expressions
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_.-]+"),
      s"rule name must match [A-Za-z0-9_.-]+: '${r.name}'"))
    val counters = rules.map(r =>
      sum(when(coalesce(r.cond, lit(false)), 0L).otherwise(1L))
        .as(s"__v_${r.name}")) :+ count(lit(1)).as("__rows")
    val wide = df.agg(counters.head, counters.tail.toIndexedSeq: _*)
    // unpivot via stack: deterministic rule order, no second scan
    val stackArgs = rules.map(r =>
      s"'${r.name}', coalesce(`__v_${r.name}`, 0L)").mkString(", ")
    wide.selectExpr(
        s"stack(${rules.length}, $stackArgs) AS (rule, violations)",
        "__rows AS n_rows")
  }

  /** One-pass column profiler: per column — row count, null count,
    * EXACT distinct count, min and max (computed in the column's native
    * type, then rendered as strings so the output schema is uniform).
    * The dataset-card / "what landed in this table" primitive every
    * ingest step wants before curation decisions.
    *
    * Execution shape (100 TB): ONE Aggregate over the scan. The
    * null/min/max counters partial-aggregate map-side; the exact
    * distinct counts make Catalyst plan an Expand (one stream per
    * distinct aggregate) — the standard multi-count-distinct plan,
    * shuffling only (column-tag, value) pairs, never the full rows.
    * The wide single-row result is unpivoted with stack(): no second
    * scan, nothing collected. Callers who can tolerate ±2% should
    * profile with approx_count_distinct instead (`approxDistinct`
    * flag) — that collapses the Expand and the whole profile becomes
    * one map-side pass.
    *
    * min/max of FLOATING columns render engine-specifically — profile
    * integral/string/date columns when the output must be
    * engine-replayable (the gate does).
    */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"column name must match [A-Za-z0-9_]+: '$c'"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __rows - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n_null, n_distinct, min_str, max_str)",
      "__rows AS n_rows")
  }

  /** Functional-dependency audit: for each determinant→dependent
    * claim (e.g. "zip → city", "order_id → customer"), report the
    * determinant values that map to MORE than one dependent value —
    * the violations a MERGE/CDC pipeline silently manufactures when
    * an upstream key stops being a key. Per claim: the number of
    * violating determinant values, the rows they cover, and the
    * worst determinant's fan-out.
    *
    * One aggregation per claim (groupBy determinant, countDistinct
    * dependent — partial-aggregated, never a self-join), then a
    * bounded per-claim rollup; claims union into one small report.
    * NULL determinants are excluded (SQL keys are non-null by
    * definition); NULL dependents count as a distinct value via the
    * null-flag trick, because key→NULL-sometimes IS a violation
    * worth seeing.
    */
  def fdCheck(df: DataFrame, claims: Seq[(String, String)]): DataFrame = {
    require(claims.nonEmpty, "need at least one determinant->dependent claim")
    claims.map { case (det, dep) =>
      df.filter(col(det).isNotNull)
        .groupBy(col(det))
        .agg((countDistinct(col(dep)) +
          max(when(col(dep).isNull, 1L).otherwise(0L))).as("__nv"),
          count(lit(1)).as("__rows"))
        .filter(col("__nv") > 1)
        .agg(count(lit(1)).as("n_violating_keys"),
          coalesce(sum(col("__rows")), lit(0L)).as("n_rows_covered"),
          coalesce(max(col("__nv")), lit(0L)).as("max_fanout"))
        .select(lit(s"$det->$dep").as("claim"),
          col("n_violating_keys"), col("n_rows_covered"),
          col("max_fanout"))
    }.reduce(_ unionByName _)
  }

  /** Cohen's κ between two nominal label columns — inter-annotator
    * agreement, the label-quality meter of any labeling pipeline
    * (human vs heuristic, two models, annotation rounds). Exact
    * integer throughout:
    *
    *   κ = (p_o − p_e)/(1 − p_e)
    *     = (agree·N − S) / (N² − S),  S = Σ_label n₁(l)·n₂(l)
    *
    * with N/agree/S exact int64 counts (bounded: N² < 2⁶³ up to
    * N = 3 037 000 499 ≈ 3e9 rows — past it the plan raises instead
    * of serving a silently-wrapped κ; label-agreement inputs are
    * samples, so the bound is operationally unreachable and a loud
    * stop is the right failure mode), so the ONLY rounding is the
    * final micros site — both
    * engines divide the identical doubles. Rows with a NULL on either
    * side are excluded (un-annotated, not disagreement). κ is NULL
    * when p_e = 1 (both annotators constant and identical — agreement
    * is vacuous and the denominator is 0). Output one row:
    * `(n, agree, s_prod, kappa_micros)` — the raw counts ride along
    * so a caller (or the oracle) can audit the rational.
    */
  def cohenKappaMicros(df: DataFrame, col1: Column,
                       col2: Column): DataFrame = {
    val base = df.select(col1.cast("string").as("a"),
        col2.cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val n1 = base.groupBy(col("a").as("l")).agg(count(lit(1)).as("n1"))
    val n2 = base.groupBy(col("b").as("l")).agg(count(lit(1)).as("n2"))
    val s = n1.join(n2, "l")
      .agg(coalesce(sum(col("n1") * col("n2")), lit(0L)).as("s_prod"))
    val tot = base.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("a") === col("b"), 1L).otherwise(0L)),
        lit(0L)).as("agree"))
    // n² must stay exact in int64: floor(√(2⁶³−1)) = 3 037 000 499.
    // The guard is data-derived and in-plan (evaluated on the single
    // aggregated row), so an oversized input fails loudly instead of
    // returning a wrapped kappa_micros — the LogReg/KN loud-envelope
    // convention (round-12 ADVICE).
    val maxN = 3037000499L
    // both sides are 1-row aggregates — the sanctioned cross join
    tot.crossJoin(s)
      .select(col("n"), col("agree"), col("s_prod"),
        when(col("n") > maxN,
          raise_error(format_string(
            "cohenKappaMicros: n = %s exceeds the int64 exactness " +
              "envelope (n^2 < 2^63 requires n <= 3037000499)",
            col("n"))).cast("long"))
          .when(col("n") * col("n") === col("s_prod"),
          lit(null).cast("long"))
          .otherwise(round(lit(1000000.0) *
            ((col("agree") * col("n") - col("s_prod")).cast("double") /
              (col("n") * col("n") - col("s_prod")).cast("double")))
            .cast("long"))
          .as("kappa_micros"))
  }

  /** Multi-rater agreement — Fleiss' κ in its varying-raters
    * (pairwise-agreement) form, [[cohenKappaMicros]]'s n-rater
    * sibling: the chance-corrected probability that two RANDOM raters
    * of the same item agree. Items are whatever `itemCols` identify,
    * categories whatever `catCol` holds; items with fewer than two
    * assignments carry no pair and drop from BOTH the observed and
    * the expected side (the standard varying-n generalization):
    *
    *   P_o = Σᵢ Σ_c n_ic(n_ic−1) / Σᵢ nᵢ(nᵢ−1)
    *   P_e = Σ_c L_c² / D²   (L_c = Σᵢ n_ic over kept items, D = Σ L_c)
    *   κ   = (P_o − P_e)/(1 − P_e)
    *       = (A·D² − B·E) / (B·(D² − E))   with E = Σ L_c²
    *
    * Exactness: A, B, D, E are exact int64 aggregates; the κ ratio is
    * the int64 numerator/denominator double-divided then rounded —
    * the cohenKappaMicros convention, which the SQL oracle replays
    * bit for bit. The int64 envelope is A·D² ≤ D⁴ < 2⁶³ ⇒ D ≤ 55 108
    * total assignments, guarded loudly IN-PLAN (the LogReg/KN
    * convention). That bound is the honest production contract too:
    * agreement meters run per annotation project or per stratum —
    * strata beyond ~55k assignments should κ per stratum (this
    * operator grouped by the stratum) rather than collapse millions
    * of votes into one scalar.
    *
    * NULL κ when the denominator vanishes (every kept assignment in
    * one category — chance agreement is 1 and κ is undefined).
    * Output one row: (n_items, n_assign, po_micros, pe_micros,
    * kappa_micros).
    */
  def fleissKappaMicros(df: DataFrame, itemCols: Seq[String],
                        catCol: String): DataFrame = {
    require(itemCols.nonEmpty, "need at least one item column")
    val base = df
      .select(itemCols.map(col) :+
        col(catCol).cast("string").as("__c"): _*)
      .filter(col("__c").isNotNull)
    val nic = base.groupBy(itemCols.map(col) :+ col("__c"): _*)
      .agg(count(lit(1)).as("n_ic"))
    val item = nic.groupBy(itemCols.map(col): _*)
      .agg(sum(col("n_ic")).as("n_i"),
        sum(col("n_ic") * (col("n_ic") - 1)).as("a_i"))
      .filter(col("n_i") >= 2)
    val keptNic = nic.join(item.select(itemCols.map(col): _*),
      itemCols, "left_semi")
    val lc = keptNic.groupBy(col("__c")).agg(sum(col("n_ic")).as("l_c"))
    val ab = item.agg(coalesce(sum(col("a_i")), lit(0L)).as("a"),
      coalesce(sum(col("n_i") * (col("n_i") - 1)), lit(0L)).as("b"),
      count(lit(1)).as("n_items"))
    val de = lc.agg(coalesce(sum(col("l_c")), lit(0L)).as("d"),
      coalesce(sum(col("l_c") * col("l_c")), lit(0L)).as("e"))
    val maxD = 55108L // floor(2^63 ^ 0.25): A·D² ≤ D⁴ must stay exact
    ab.crossJoin(de)
      .select(col("n_items"), col("d").as("n_assign"),
        when(col("b") === 0, lit(null).cast("long"))
          .otherwise(round(lit(1000000.0) *
            (col("a").cast("double") / col("b").cast("double")))
            .cast("long")).as("po_micros"),
        when(col("d") === 0, lit(null).cast("long"))
          .otherwise(round(lit(1000000.0) *
            (col("e").cast("double") /
              (col("d") * col("d")).cast("double")))
            .cast("long")).as("pe_micros"),
        when(col("d") > maxD,
          raise_error(format_string(
            "fleissKappaMicros: %s assignments exceed the int64 " +
              "exactness envelope (D^4 < 2^63 requires D <= 55108); " +
              "compute kappa per stratum instead",
            col("d"))).cast("long"))
          .when(col("b") * (col("d") * col("d") - col("e")) === 0,
            lit(null).cast("long"))
          .otherwise(round(lit(1000000.0) *
            ((col("a") * col("d") * col("d") - col("b") * col("e"))
              .cast("double") /
             (col("b") * (col("d") * col("d") - col("e")))
              .cast("double"))).cast("long"))
          .as("kappa_micros"))
  }

  /** Token-distribution drift between two corpus snapshots — the
    * ingestion-monitoring meter a training-data pipeline runs on
    * every batch ("did the crawl's language/domain mix move under
    * us?"). Per token TYPE of the union vocabulary, the add-1
    * smoothed KL contribution of the current snapshot against the
    * reference:
    *
    *   p_ref(w) = (c_ref(w)+1)/(N_ref+V),  p_cur likewise,
    *   kl_micros(w) = round(1e6 · p_cur(w) · ln(p_cur(w)/p_ref(w)))
    *
    * Σ kl_micros over the output IS the (micros-quantized) smoothed
    * KL(cur ‖ ref); emitting per-type rows makes the meter an
    * explainer too — the top positive movers are the newly
    * over-represented tokens. Determinism discipline: rounding
    * happens PER TYPE (the DSIR construction) so no float summation
    * order ever reaches the artifact; totals are exact integer sums
    * downstream. Execution shape: two token-count aggregations (the
    * only corpus-sized shuffles), a full-outer join on the TYPE
    * table, one 3-long driver round-trip for (N_ref, N_cur, V) —
    * bounded like every model-artifact collect here.
    */
  def vocabDriftMicros(ref: DataFrame, cur: DataFrame,
                       textCol: String): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.select(explode(graft.functions.TextFunctions.tokens(
          coalesce(col(textCol), lit("")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val joined = counts(ref).select(col("token"), col("n").as("n_ref"))
      .join(counts(cur).select(col("token"), col("n").as("n_cur")),
        Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val t = joined.agg(
      coalesce(sum(col("n_ref")), lit(0L)),
      coalesce(sum(col("n_cur")), lit(0L)),
      count(lit(1))).head()
    val (nr, nc, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    // empty union vocab (both corpora empty): no rows, no division
    if (v == 0L) return joined.select(col("token"), col("n_ref"),
      col("n_cur"), lit(0L).as("kl_micros")).limit(0)
    val pRef = (col("n_ref") + 1L).cast("double") / lit((nr + v).toDouble)
    val pCur = (col("n_cur") + 1L).cast("double") / lit((nc + v).toDouble)
    joined.select(col("token"), col("n_ref"), col("n_cur"),
      round(lit(1000000.0) * pCur * log(pCur / pRef)).cast("long")
        .as("kl_micros"))
  }

  /** Throw if any rule has violations (the CHECK-constraint form). */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val bad = check(df, rules)
      .filter(col("violations") > 0)
      .collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r =>
        s"${r.getString(0)}: ${r.getLong(1)} violations").mkString("; ")
      throw new IllegalStateException(s"data-quality check failed — $detail")
    }
  }
}
