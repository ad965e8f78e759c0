package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** EXACT heavy hitters over an unbounded token stream in two bounded
  * passes — the "which tokens appear ≥ N times in 100 TB" question
  * answered without ever building the full vocabulary histogram.
  *
  * Pass 1 runs a Misra–Gries summary (k counters) independently in
  * every partition and unions the survivors. The guarantee that makes
  * the union a valid candidate set: a token with global count
  * C > N/k must exceed the per-partition threshold N_p/k in at least
  * one partition (its best partition has C_p/N_p ≥ C/N — a max is at
  * least the weighted mean), so it survives there. Candidates are at
  * most k per partition regardless of vocabulary size — bounded
  * memory, bounded shuffle.
  *
  * Pass 2 recounts ONLY the candidates exactly (semi-join on the
  * candidate list — small, so AQE broadcasts it) and keeps counts ≥
  * `minCount`. MG's approximation error dies here: the output is the
  * exact set {token : count ≥ minCount} with exact counts, fully
  * engine-independent (the driver gate holds it to a DuckDB
  * GROUP BY/HAVING oracle), PROVIDED the completeness precondition
  * k > N/minCount holds — otherwise a qualifying token could be
  * decremented away in every partition. `validate = true` checks the
  * precondition with one extra token-count aggregate (a cheap scan);
  * at production scale callers size k from a known corpus bound
  * instead and skip the scan.
  *
  * Contrast with [[Sketch]]: CMS answers point estimates with bounded
  * OVERcount and needs a probe list; Misra–Gries + recount finds the
  * qualifying set itself, exactly. The two-pass shape (bounded sketch
  * → exact verification on the survivors) is the same
  * candidates-then-verify pattern the dedup pipeline uses.
  */
object HeavyHitters {

  /** Misra–Gries with k counters: every token whose frequency in `it`
    * exceeds |it|/k survives (superset; counts are lower bounds and are
    * NOT emitted — pass 2 recounts exactly). O(k) space; the decrement
    * step is amortized O(1) per input token (each rebuild removes at
    * least as many count units as insertions since the last one).
    */
  private[graft] def misraGries(it: Iterator[String],
                                k: Int): Iterator[String] = {
    var m = mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val t = it.next()
      m.get(t) match {
        case Some(c) => m.update(t, c + 1L)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // classic MG step: decrement every counter, drop zeros
          val nm = mutable.HashMap.empty[String, Long]
          m.foreach { case (key, c) => if (c > 1L) nm.update(key, c - 1L) }
          m = nm
      }
    }
    m.keysIterator
  }

  /** All tokens of `textCol` occurring at least `minCount` times, with
    * exact counts. Output: (token, n), n ≥ minCount.
    *
    * @param k        Misra–Gries counters per partition; completeness
    *                 requires k > totalTokens / minCount.
    * @param validate when true, spend one aggregate scan asserting the
    *                 completeness precondition instead of trusting the
    *                 caller's sizing.
    */
  def tokenHeavyHitters(df: DataFrame, textCol: String, minCount: Long,
                        k: Int = 4096, validate: Boolean = false): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(TextFunctions.tokens(col(textCol)))
      .as("token"))
    if (validate) {
      // greatest(…, 0) guards null-text rows: size() of a null array is
      // -1 (legacy) or null (ANSI) — either would deflate the total and
      // let an undersized k pass the completeness check
      val n = df.agg(coalesce(sum(greatest(
        size(TextFunctions.tokens(col(textCol))), lit(0))),
        lit(0L)).as("n")).head().getLong(0)
      require(k.toLong > n / minCount,
        s"k=$k cannot guarantee completeness for minCount=$minCount over " +
          s"$n tokens — need k > ${n / minCount}")
    }
    val cands = toks.as[String]
      .mapPartitions(it => misraGries(it, k))
      .toDF("token")
      .distinct()
    toks.join(cands, Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
