package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.VersionedTable

/** Incrementally-maintained keyed aggregate (materialized-view
  * maintenance for the distributive aggregates: sum / count / min /
  * max).
  *
  * The 100 TB accounting: a nightly "rebuild the rollup" pass re-scans
  * the whole corpus; incremental maintenance aggregates ONLY the new
  * batch (delta-sized shuffle), then merges with the existing
  * aggregate table — whose size is the KEY cardinality, not the data —
  * by a union + re-aggregation on mergeable state (sum-of-sums,
  * sum-of-counts, min-of-mins, max-of-maxs). History is never re-read.
  * Commits land through [[graft.engine.VersionedTable]], so a refresh
  * is atomic, readers keep their snapshot, and a crashed refresh
  * changes nothing.
  *
  * Only distributive aggregates are offered BY DESIGN: avg/stddev
  * must be derived from (sum, count) / (sum, sum², count) columns by
  * the reader; holistic aggregates (exact quantiles, distinct counts)
  * do not merge and belong to the sketch operators
  * ([[Sketch]], approx_percentile).
  */
object IncrementalAgg {

  /** One maintained column: `func(expr) AS alias` where `func` ∈
    * sum | count | min | max. `count` counts rows where `expr` is
    * non-null (SQL COUNT(expr)); use a literal for COUNT(*).
    */
  final case class AggSpec(func: String, expr: String, alias: String) {
    require(Set("sum", "count", "min", "max")(func),
      s"unsupported (non-distributive) aggregate: $func")
  }

  /** Aggregate one batch into delta state. */
  def aggregate(batch: DataFrame, keys: Seq[String],
                specs: Seq[AggSpec]): DataFrame = {
    require(keys.nonEmpty && specs.nonEmpty,
      "need at least one key and one aggregate")
    val aggs = specs.map {
      case AggSpec("sum", e, a)   => sum(expr(e)).as(a)
      case AggSpec("count", e, a) => count(expr(e)).as(a)
      case AggSpec("min", e, a)   => min(expr(e)).as(a)
      case AggSpec("max", e, a)   => max(expr(e)).as(a)
      case s => throw new IllegalArgumentException(s.toString)
    }
    batch.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Merge two aggregate states (same schema) — the distributive
    * re-combination: counts become sums of partial counts.
    */
  def merge(current: DataFrame, delta: DataFrame, keys: Seq[String],
            specs: Seq[AggSpec]): DataFrame = {
    val reAggs = specs.map {
      case AggSpec("sum", _, a)   => sum(col(a)).as(a)
      case AggSpec("count", _, a) => sum(col(a)).as(a)
      case AggSpec("min", _, a)   => min(col(a)).as(a)
      case AggSpec("max", _, a)   => max(col(a)).as(a)
      case s => throw new IllegalArgumentException(s.toString)
    }
    current.unionByName(delta)
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(reAggs.head, reAggs.tail.toIndexedSeq: _*)
  }

  /** Fold one new batch into the maintained table (creates it on
    * first use); returns the committed version. The refresh is
    * NOT idempotent under replay — feed it through
    * [[graft.engine.VersionedTable.commitBatch]]-style dedup (or
    * exactly-once upstream) when batches can repeat.
    *
    * Concurrency: the read-modify-write commits through
    * [[VersionedTable.overwriteIf]] — if another refresh lands between
    * our read and our commit, the commit ABORTS (instead of silently
    * dropping the interleaved delta) and the merge re-runs against the
    * new base. Tables maintained this way must not also receive plain
    * `overwrite` commits.
    */
  def update(table: VersionedTable, batch: DataFrame, keys: Seq[String],
             specs: Seq[AggSpec], maxRetries: Int = 5): Long = {
    val delta = aggregate(batch, keys, specs)
    var attempt = 0
    while (attempt < maxRetries) {
      val base = table.latestVersion
      val next = base match {
        case Some(v) => merge(table.readVersion(v), delta, keys, specs)
        case None    => delta
      }
      table.overwriteIf(next, base) match {
        case Some(v) => return v
        case None    => attempt += 1 // conflicting refresh — re-read, retry
      }
    }
    throw new IllegalStateException(
      s"incremental refresh lost $maxRetries consecutive commit races")
  }
}
