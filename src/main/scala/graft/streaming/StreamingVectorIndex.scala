package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Ivf

/** Vector-index CDC ingestion — the write path of a vector database,
  * composed from the two index-maintenance primitives: upserts arrive
  * as full rows (id, vector, attribute columns…) in epoch files; each
  * micro-batch applies DELETE-THEN-APPEND against the persisted IVF
  * index ([[Ivf.deleteFromIndex]] removes the ids' old versions from
  * their touched posting lists, [[Ivf.appendToIndex]] routes the new
  * vectors through the existing centroids), so a search immediately
  * after the stream drains sees exactly the latest version of every
  * vector — never both, never neither.
  *
  * `foreachBatch`, not a row transform: index maintenance is a
  * transactional side effect on an external artifact, the same shape
  * as [[StreamingCdc]]'s snapshot generations. The per-batch changed-id
  * set becomes the delete predicate (bounded by the epoch contract —
  * an ingest feed's epoch is a changed-rows file, not a corpus; a feed
  * that re-ships the world should rebuild via `ensureIndex` instead).
  * Within a batch, duplicate ids collapse deterministically
  * (lexicographic max of the vector struct) — a well-formed feed
  * carries one row per id per epoch, and replaying an epoch is then
  * idempotent: the delete removes what the replayed append wrote.
  *
  * Drift contract unchanged: appends move the `_ROWS`/`_ROWS_BASE`
  * meters exactly like batch maintenance, so `needsRebuild` still
  * decides when the centroids have outlived the distribution.
  */
object StreamingVectorIndex {

  /** Drain everything unprocessed in `feedDir` into the IVF index at
    * `indexPath` (which must exist — build the initial corpus with
    * `ensureIndex` first). With `opCol` set, the feed is a full CDC
    * changelog: rows whose op is `"D"` delete their id without a
    * re-append (tombstones); every other row upserts. An id carrying
    * BOTH a D and an upsert in one epoch resolves to the upsert (the
    * epoch contract is one op per id; delete-then-append applies the
    * surviving row either way).
    */
  def upsertStream(spark: SparkSession, feedDir: String,
                   indexPath: String, checkpoint: String,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   opCol: Option[String] = None): Unit =
    upsertStreamImpl(spark, feedDir, checkpoint, idCol, opCol,
      deleteFn = p => { Ivf.deleteFromIndex(spark, indexPath, p); () },
      appendFn = d => Ivf.appendToIndex(d, indexPath, idCol, vecCol))

  /** The graph twin: same epoch contract against an HNSW index —
    * deletes rebuild touched shards canonically, appends route
    * through the existing centroids.
    */
  def upsertStreamHnsw(spark: SparkSession, feedDir: String,
                       indexPath: String, checkpoint: String,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       opCol: Option[String] = None): Unit =
    upsertStreamImpl(spark, feedDir, checkpoint, idCol, opCol,
      deleteFn = p => {
        graft.operators.Hnsw.deleteFromIndex(spark, indexPath, p); ()
      },
      appendFn = d =>
        graft.operators.Hnsw.appendToIndex(d, indexPath, idCol, vecCol))

  private def upsertStreamImpl(spark: SparkSession, feedDir: String,
                   checkpoint: String, idCol: String,
                   opCol: Option[String],
                   deleteFn: org.apache.spark.sql.Column => Unit,
                   appendFn: DataFrame => Unit): Unit = {
    val schema = spark.read.parquet(feedDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val upserts = opCol.fold(batch)(oc =>
          batch.filter(!(col(oc) <=> lit("D"))).drop(oc))
        val others = upserts.columns.filterNot(_ == idCol).toIndexedSeq
        val latest = upserts.groupBy(col(idCol))
          .agg(max(struct(others.map(col): _*)).as("__u"))
          .select(col(idCol) +: others.map(c => col(s"__u.$c").as(c)): _*)
        // delete-then-append touches every id in the batch regardless
        // of op (a tombstoned id deletes and is not re-appended; an
        // upserted id deletes its old version first) — so the delete
        // predicate is ONE distinct collect over the whole batch, not
        // separate upsert/tombstone lists reconciled with an O(n²)
        // filterNot (round-14 ADVICE). The collect stays bounded by
        // the epoch contract (a changed-rows file, not a corpus); a
        // feed that re-ships the world rebuilds via ensureIndex.
        val touched = batch.select(col(idCol)).distinct()
          .collect().map(_.get(0)).toIndexedSeq
        if (touched.nonEmpty) {
          deleteFn(col(idCol).isin(touched: _*))
          if (!latest.isEmpty) appendFn(latest)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }
}
