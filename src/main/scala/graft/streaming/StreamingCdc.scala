package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Upsert, VersionedTable}

/** Streaming CDC apply: a changefeed (rows tagged insert/update/delete
  * by an op column) streamed through `foreachBatch` into a
  * [[graft.engine.VersionedTable]], exactly once.
  *
  * Each micro-batch commits the FULL merged snapshot as generation
  * `batchId` via the claim-file ledger, which is what makes the
  * at-least-once `foreachBatch` contract exactly-once end to end:
  *
  *  - replay of a committed batch: `commitBatch` skips before the
  *    merge plan is ever EXECUTED (the DataFrame is lazy), so the
  *    double-apply-against-the-new-base hazard cannot happen;
  *  - crash between claim and commit rename: the replay recomputes the
  *    merge from the latest generation BELOW the batch id — the same
  *    base the crashed attempt used — and completes the orphan claim;
  *  - the merged snapshot is keyed by the stream's own epoch number,
  *    so a checkpoint reset replays into already-taken claims as
  *    no-ops instead of corrupting state.
  *
  * Reads: `table.read()` (latest snapshot); every applied batch is a
  * time-travel point (`readVersion(batchId)` = state after that
  * batch). The table is marked `cdc`-mode — [[VersionedTable]] refuses
  * the maintenance ops whose generation numbering would collide with
  * future batch ids (see `modeMarker`).
  *
  * Scale shape: the merge itself is [[graft.engine.Upsert.applyChanges]]'s
  * plan — the changefeed is the small broadcastable side, the target
  * is never shuffled — but the commit rewrites the whole snapshot, so
  * this is the DIMENSION-grade CDC sink (the reference's SCD targets).
  * A 100 TB partitioned fact would swap the snapshot commit for a
  * partition-pruned rewrite ([[graft.engine.Upsert.mergePartitioned]])
  * keyed by the same claim ledger; the exactly-once protocol is
  * unchanged.
  */
object StreamingCdc {

  /** Keep only the latest change per key — the CDC-log compaction step
    * for feeds carrying a monotonically increasing sequence column
    * (LSN / commit timestamp). Determinism: rows compare by
    * (sequence, every other column) lexicographically, so even a
    * duplicated sequence number cannot make two runs disagree.
    */
  def latestPerKey(changes: DataFrame, keys: Seq[String],
                   seqCol: String): DataFrame = {
    val others = changes.columns.filterNot(keys.contains).toSeq
    val ordered = seqCol +: others.filterNot(_ == seqCol)
    changes.groupBy(keys.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__latest"))
      .select(keys.map(col) ++ others.map(o => col(s"__latest.$o").as(o)): _*)
  }

  /** The merged snapshot: `base` (None = table does not exist yet)
    * with `changes` applied — delete-tagged keys removed, everything
    * else upserted. The plan itself is [[Upsert.applyChangesPlan]]
    * (uniqueKeyTarget = true: CDC targets are keyed snapshots), so the
    * batch and streaming paths can never drift apart semantically.
    * Pure and lazy; nothing executes until the commit materializes it.
    */
  private def merged(base: Option[DataFrame], changes: DataFrame,
                     keys: Seq[String], opCol: String,
                     deleteOp: String): DataFrame =
    Upsert.applyChangesPlan(base, changes, keys, opCol, deleteOp,
      uniqueKeyTarget = true)

  /** The `foreachBatch` body: apply one changefeed micro-batch to the
    * table, exactly once. Returns false when the batch was already
    * committed (post-checkpoint replay) — in that case the merge plan
    * is never executed. `seqCol` enables within-batch log compaction
    * ([[latestPerKey]]); without it the feed must carry at most one
    * non-delete row per key per batch (like a MERGE source).
    */
  def applyCdcBatch(table: VersionedTable, batchId: Long,
                    changes: DataFrame, keys: Seq[String],
                    opCol: String = "op", deleteOp: String = "D",
                    seqCol: Option[String] = None): Boolean = {
    require(keys.nonEmpty, "applyCdcBatch requires at least one key column")
    val feed = seqCol.map(latestPerKey(changes, keys, _)).getOrElse(changes)
    // base = the newest state BELOW this epoch: on orphan-claim replay
    // this is exactly the base the crashed attempt merged from
    val base = table.versions.filter(_ < batchId).lastOption
      .map(table.readVersion)
    table.commitBatchAs("cdc", batchId, merged(base, feed, keys, opCol, deleteOp))
  }

  /** Drive a parquet-directory changefeed through a real streaming
    * query into the table (drains available input, then returns — the
    * incremental-restart harness: call again after new feed files land
    * and the checkpoint resumes from the next epoch).
    */
  def applyChangesStream(spark: SparkSession, feedDir: String,
                         tablePath: String, checkpoint: String,
                         keys: Seq[String], opCol: String = "op",
                         deleteOp: String = "D",
                         seqCol: Option[String] = None): Unit = {
    val schema = spark.read.parquet(feedDir).schema
    val table = new VersionedTable(spark, tablePath)
    val q = spark.readStream.schema(schema).parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyCdcBatch(table, id, batch, keys, opCol, deleteOp, seqCol); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
