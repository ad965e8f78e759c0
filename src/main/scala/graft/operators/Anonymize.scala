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
}
