package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style document quality rules (Rae et al. 2021, appendix A —
  * the public heuristic battery most large text pipelines run before
  * any model-based filtering; C4/FineWeb use close variants).
  *
  * Every rule is computed in EXACT integer arithmetic over the
  * canonical tokenization ([[TextFunctions.tokens]]: trim → lower →
  * whitespace split), so thresholds compare as integer cross-products
  * (`10 * bullets <= 9 * lines`, never a float ratio) and the report
  * is bit-identical across engines — the same micro-unit discipline as
  * `qualityScoreMicros`.
  *
  * Rules (doc passes when ALL hold):
  *  - `r_wordcount`: 50 ≤ word count ≤ 100,000
  *  - `r_meanlen`:  mean token length in [3, 10]  (3n ≤ Σlen ≤ 10n)
  *  - `r_symbol`:   (hash + ellipsis) / words ≤ 0.1
  *  - `r_bullet`:   ≤ 90% of lines start with a bullet (-, *, •)
  *  - `r_ellipsis`: ≤ 30% of lines end with … or ...
  *  - `r_alpha`:    ≥ 80% of tokens contain an alphabetic character
  *  - `r_stop`:     ≥ 2 distinct common English stop words present
  *  - `r_dupline`:  ≤ 30% of non-blank lines are repeats of an
  *                  earlier line in the SAME document
  *
  * Execution shape: one projection — every metric is a higher-order
  * aggregate over the staged token/line arrays (bound once each, the
  * HOF-CSE lesson), no explode, no shuffle, no UDFs; a 100 TB corpus
  * pays exactly one scan and the filter composes with pushdown. The
  * within-doc duplicate-line rule uses `array_distinct`, not a
  * corpus-wide shuffle — cross-doc boilerplate is [[Dedup
  * .dropRepeatedLines]]'s job.
  */
object QualityRules {

  private val stopWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule report: `(idCol, n_words, n_lines, r_* flags,
    * pass)`. Null text fails every rule (`pass = false`, zero counts) —
    * a row that cannot be inspected must not slip through a filter.
    */
  def gopherReport(df: DataFrame, textCol: String,
                   idCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = TextFunctions.tokens(t)
    val lines0 = filter(transform(split(t, "\n"), l => trim(l)),
      l => length(l) > 0)

    df.withColumn("__toks", toks)
      .withColumn("__lines", lines0)
      .withColumn("n_words", size(col("__toks")).cast("long"))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("__sumlen", aggregate(col("__toks"), lit(0L),
        (acc, x) => acc + length(x)))
      .withColumn("__symbols",
        (length(t) - length(regexp_replace(t, "#", ""))) +
          // '…' counts once; '...' counts once per 3 removed chars
          (length(t) - length(regexp_replace(t, "…", ""))) +
          ((length(regexp_replace(t, "…", "")) -
            length(regexp_replace(regexp_replace(t, "…", ""), raw"\.\.\.", "")))
            / 3).cast("int"))
      .withColumn("__bullets", intCount(col("__lines"),
        l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .withColumn("__ellipses", intCount(col("__lines"),
        l => l.endsWith("...") || l.endsWith("…")))
      .withColumn("__alpha", intCount(col("__toks"), x => x.rlike("[a-z]")))
      .withColumn("__stops",
        size(array_intersect(typedlit(stopWords), col("__toks"))))
      .withColumn("__ndistinct", size(array_distinct(col("__lines"))).cast("long"))
      .select(
        col(idCol), col("n_words"), col("n_lines"),
        (col("n_words") >= 50L && col("n_words") <= 100000L)
          .as("r_wordcount"),
        (col("n_words") > 0L && col("__sumlen") >= col("n_words") * 3L &&
          col("__sumlen") <= col("n_words") * 10L).as("r_meanlen"),
        (col("n_words") > 0L &&
          col("__symbols") * 10L <= col("n_words")).as("r_symbol"),
        (col("n_lines") === 0L ||
          col("__bullets") * 10L <= col("n_lines") * 9L).as("r_bullet"),
        (col("n_lines") === 0L ||
          col("__ellipses") * 10L <= col("n_lines") * 3L).as("r_ellipsis"),
        (col("n_words") > 0L &&
          col("__alpha") * 10L >= col("n_words") * 8L).as("r_alpha"),
        (col("__stops") >= 2).as("r_stop"),
        (col("n_lines") === 0L ||
          (col("n_lines") - col("__ndistinct")) * 10L <= col("n_lines") * 3L)
          .as("r_dupline"))
      .withColumn("pass",
        col("r_wordcount") && col("r_meanlen") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop") && col("r_dupline"))
  }

  /** The rule columns [[gopherReport]] emits, in report order. */
  val allRules: Seq[String] = Seq("r_wordcount", "r_meanlen", "r_symbol",
    "r_bullet", "r_ellipsis", "r_alpha", "r_stop", "r_dupline")

  /** The corpus filtered to documents passing the selected rules —
    * the composable form. Real pipelines tune the rule subset to the
    * corpus (e.g. r_stop assumes English running text and would zero
    * out a code or non-English corpus); the default is the full
    * battery.
    */
  def gopherFilter(df: DataFrame, textCol: String, idCol: String,
                   rules: Seq[String] = allRules): DataFrame = {
    require(rules.nonEmpty && rules.forall(allRules.contains),
      s"rules must be a nonempty subset of $allRules, got $rules")
    df.join(gopherReport(df, textCol, idCol)
      .filter(rules.map(col).reduce(_ && _)).select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  private def intCount(arr: Column, p: Column => Column): Column =
    size(filter(arr, p)).cast("long")
}
