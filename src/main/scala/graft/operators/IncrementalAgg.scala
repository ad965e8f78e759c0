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

  // ── Retractable maintenance (CDC / update / delete traffic) ─────────

  /** Internal state columns of a RETRACTABLE materialized view:
    * `__mv_rows` (live row count per group — a group retracted to zero
    * rows is dropped, matching the full recompute that emits no row
    * for an empty group) and `__nn_<alias>` per sum spec (live
    * non-null count — a sum whose every input was retracted must read
    * NULL, not 0; weighted addition alone cannot tell those apart).
    */
  val RowsCol = "__mv_rows"
  private def nnCol(alias: String) = s"__nn_$alias"

  /** Aggregate a full snapshot into retractable-MV state (the
    * initialization / rebuild path).
    */
  def aggregateState(snapshot: DataFrame, keys: Seq[String],
                     specs: Seq[AggSpec]): DataFrame = {
    require(keys.nonEmpty && specs.nonEmpty,
      "need at least one key and one aggregate")
    val aggs = specs.flatMap {
      case AggSpec("sum", e, a) =>
        Seq(sum(expr(e)).as(a), count(expr(e)).as(nnCol(a)))
      case AggSpec("count", e, a) => Seq(count(expr(e)).as(a))
      case s => throw new IllegalArgumentException(
        s"non-retractable aggregate '${s.func}' — maintain it through " +
          "updateDirtyGroups (min/max need the source to re-derive " +
          "a group after a retraction)")
    } :+ count(lit(1)).as(RowsCol)
    snapshot.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** The per-batch delta of a weighted change stream
    * ([[graft.engine.Upsert.retractStream]]): every maintained column
    * folds to a weighted sum — delta-sized shuffle, the base table is
    * never read.
    */
  def retractDelta(changes: DataFrame, keys: Seq[String],
                   specs: Seq[AggSpec],
                   weightCol: String = "weight"): DataFrame = {
    val w = col(weightCol).cast("long")
    val nn = (e: String) =>
      sum(when(expr(e).isNotNull, w).otherwise(0L))
    val aggs = specs.flatMap {
      case AggSpec("sum", e, a) =>
        Seq(sum(expr(e) * col(weightCol)).as(a), nn(e).as(nnCol(a)))
      case AggSpec("count", e, a) => Seq(nn(e).as(a))
      case s => throw new IllegalArgumentException(
        s"non-retractable aggregate '${s.func}' in the retract path")
    } :+ sum(w).as(RowsCol)
    changes.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Merge retractable state with a delta: weighted addition on every
    * column, then drop groups retracted to zero rows.
    */
  def mergeRetract(current: DataFrame, delta: DataFrame, keys: Seq[String],
                   specs: Seq[AggSpec]): DataFrame = {
    val reAggs = specs.flatMap {
      case AggSpec("sum", _, a)   => Seq(sum(col(a)).as(a),
        sum(col(nnCol(a))).as(nnCol(a)))
      case AggSpec("count", _, a) => Seq(sum(col(a)).as(a))
      case s => throw new IllegalArgumentException(s.toString)
    } :+ sum(col(RowsCol)).as(RowsCol)
    current.unionByName(delta)
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(reAggs.head, reAggs.tail.toIndexedSeq: _*)
      .filter(col(RowsCol) > 0)
  }

  /** Project the public view out of retractable state: sums with zero
    * live non-null inputs surface as NULL (exactly what a full
    * recompute returns), internal columns dropped.
    */
  def readView(state: DataFrame, keys: Seq[String],
               specs: Seq[AggSpec]): DataFrame =
    state.select((keys.map(col) ++ specs.map {
      case AggSpec("sum", _, a) =>
        when(col(nnCol(a)) > 0, col(a)).as(a)
      case AggSpec(_, _, a) => col(a)
    }).toIndexedSeq: _*)

  /** Create the retractable MV from a full snapshot (version 0 of the
    * maintenance lifecycle).
    */
  def initialize(table: VersionedTable, snapshot: DataFrame,
                 keys: Seq[String], specs: Seq[AggSpec]): Long =
    table.overwrite(aggregateState(snapshot, keys, specs))

  /** Fold one weighted change batch into an [[initialize]]d MV —
    * inserts, updates, AND deletes, no source re-read. Same
    * optimistic-concurrency loop as [[update]].
    */
  def updateFromChanges(table: VersionedTable, changes: DataFrame,
                        keys: Seq[String], specs: Seq[AggSpec],
                        weightCol: String = "weight",
                        maxRetries: Int = 5): Long = {
    val delta = retractDelta(changes, keys, specs, weightCol)
    var attempt = 0
    while (attempt < maxRetries) {
      val base = table.latestVersion
      require(base.nonEmpty,
        "updateFromChanges needs an initialize()d MV (the change " +
          "stream alone cannot seed state it never saw)")
      val next = mergeRetract(table.readVersion(base.get), delta, keys, specs)
      table.overwriteIf(next, base) match {
        case Some(v) => return v
        case None    => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"incremental refresh lost $maxRetries consecutive commit races")
  }

  /** The `foreachBatch` body for a STREAMED retract feed: fold one
    * weighted micro-batch into the MV, exactly once. State commits as
    * a `cdc`-mode snapshot keyed by the stream's epoch — the claim
    * ledger makes the at-least-once foreachBatch contract
    * exactly-once (a replayed batch skips before the merge plan ever
    * executes), every applied batch is a time-travel point of the
    * VIEW's history, and an orphan-claim replay re-merges from the
    * newest state BELOW the epoch (the same base the crashed attempt
    * used). Returns false when the batch was already committed.
    */
  def applyMvBatch(table: VersionedTable, batchId: Long,
                   changes: DataFrame, keys: Seq[String],
                   specs: Seq[AggSpec],
                   weightCol: String = "weight"): Boolean = {
    val delta = retractDelta(changes, keys, specs, weightCol)
    val base = table.versions.filter(_ < batchId).lastOption
      .map(table.readVersion)
    val next = base match {
      case Some(cur) => mergeRetract(cur, delta, keys, specs)
      case None      => delta.filter(col(RowsCol) > 0) // first epoch
    }
    table.commitBatchAs("cdc", batchId, next)
  }

  /** Drive a parquet-directory retract feed through a real streaming
    * query into the MV (drains available input, then returns — call
    * again after new feed files land and the checkpoint resumes from
    * the next epoch). Read the current view with
    * `readView(table.read(), keys, specs)`.
    */
  def maintainStream(spark: org.apache.spark.sql.SparkSession,
                     feedDir: String, mvPath: String, checkpoint: String,
                     keys: Seq[String], specs: Seq[AggSpec],
                     weightCol: String = "weight"): Unit = {
    val schema = spark.read.parquet(feedDir).schema
    val table = new VersionedTable(spark, mvPath)
    val q = spark.readStream.schema(schema).parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyMvBatch(table, id, batch, keys, specs, weightCol); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Maintenance for the NON-retractable aggregates (min/max — any
    * [[AggSpec]] mix, actually): re-derive exactly the groups the
    * change stream touched from the `after` snapshot, keep every
    * untouched group's row as is. The recompute scan is filtered to
    * dirty keys — with a key-clustered layout ([[graft.engine.Layout]])
    * that is a pruned read, not a full pass; the MV itself still never
    * fully rebuilds. Dirty groups with no surviving source rows
    * disappear, matching the full recompute.
    */
  def updateDirtyGroups(table: VersionedTable, after: DataFrame,
                        changes: DataFrame, keys: Seq[String],
                        specs: Seq[AggSpec], maxRetries: Int = 5): Long = {
    val dirty = changes.select(keys.map(col).toIndexedSeq: _*).distinct()
    val recomputed = aggregate(
      after.join(dirty, keys.toIndexedSeq, "left_semi"), keys, specs)
    var attempt = 0
    while (attempt < maxRetries) {
      val base = table.latestVersion
      val next = base match {
        case Some(v) =>
          table.readVersion(v).join(dirty, keys.toIndexedSeq, "left_anti")
            .unionByName(recomputed)
        case None => recomputed
      }
      table.overwriteIf(next, base) match {
        case Some(v) => return v
        case None    => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"incremental refresh lost $maxRetries consecutive commit races")
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
