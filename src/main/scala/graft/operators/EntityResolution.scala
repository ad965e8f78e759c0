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

  /** Edit-distance match: keep pairs with levenshtein ≤ `maxEdits`.
    * Expects `<a>`/`<b>` string columns on the pair stream.
    */
  def levenshteinMatches(
      pairs: DataFrame, a: String, b: String, maxEdits: Int): DataFrame =
    pairs
      .withColumn("lev", levenshtein(col(a), col(b)))
      .filter(col("lev") <= maxEdits)

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
}
