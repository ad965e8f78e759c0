package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for pretraining-data preparation: documents are
  * conceptually concatenated into one token stream per content-hash
  * bucket (in deterministic (bucket, id) order) and sliced into fixed
  * `seqTokens` context windows. This operator computes each document's
  * START OFFSET in its bucket's stream and the window ("sequence")
  * index that offset lands in — the bookkeeping a packed-pretraining
  * writer needs to emit attention-mask boundaries, without ever
  * materializing the concatenation.
  *
  * Execution shape: ONE window sum, partitioned by the bucket — 256
  * independent per-bucket sorts, never a global `orderBy` (a global
  * running offset would serialize the whole corpus through one
  * partition; per-bucket streams are independently consumable by
  * downstream loaders, which is how production packing shards). At
  * 100 TB the per-bucket doc list is what must fit an executor's sort
  * budget — the content hash spreads documents uniformly, so each
  * bucket holds ≈ corpus/256; repartition the corpus by bucket first
  * if the default layout co-locates few buckets per task.
  *
  * Determinism contract matches [[DatasetSplit]]: the bucket keys on
  * the content hash and the intra-bucket order on the id column, so
  * offsets are stable across runs, engines, and repartitions.
  */
object Packing {

  /** (id, bucket, n_tokens, start_offset, seq_id) per document:
    * `start_offset` = tokens preceding this doc in its bucket's
    * stream, `seq_id` = start_offset div seqTokens.
    */
  def packOffsets(df: DataFrame, textCol: String, idCol: String,
                  seqTokens: Int): DataFrame =
    packOffsetsWeighted(
      df.select(col(idCol),
        DatasetSplit.bucket256(col(textCol)).as("bucket"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      idCol, "n_tokens", seqTokens)

  /** The same packing bookkeeping over PRECOMPUTED per-document
    * weights — for packers that count REAL tokenizer pieces (or bytes,
    * or image patches) instead of whitespace tokens. Input must carry
    * `(idCol, bucket, weightCol)`; use [[DatasetSplit.bucket256]] on
    * whatever content column defines co-packing. Output preserves the
    * weight column's name.
    */
  def packOffsetsWeighted(df: DataFrame, idCol: String, weightCol: String,
                          seqTokens: Int): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col("bucket"),
        col(weightCol).cast("long").as(weightCol))
      .withColumn("start_offset",
        sum(col(weightCol)).over(w) - col(weightCol))
      .withColumn("seq_id", expr(s"start_offset div $seqTokens"))
  }

  /** SEMANTIC packing (the in-context-pretraining ordering, Shi et al.
    * 2023 "In-Context Pretraining"): instead of hash buckets +
    * id order, each document streams with its semantic CLUSTER and,
    * within the cluster, in centrality order — so a context window
    * holds RELATED documents (the signal ICP trains on) rather than a
    * hash-random mix. Input must carry `(idCol, cluster, orderCol,
    * weightCol)` — produce the first two with
    * [[SimilaritySearch.centroidAffinityMicros]] and join the weight
    * from the corpus; `orderCol` descends (most-central documents
    * anchor the stream head), ties broken by id, so the order is total
    * and engine-reproducible when `orderCol` is exact-integer.
    *
    * Same execution contract as [[packOffsetsWeighted]]: ONE window
    * sum partitioned by cluster — k independent per-cluster sorts,
    * never a global order. At 100 TB cluster granularity is the knob:
    * k must be large enough that a cluster's documents fit an
    * executor's sort budget (the centroid count plays the role the
    * 256 hash buckets play in the exact packer). A greedy
    * traveling-salesman doc order would be sequential by nature; the
    * cluster+centrality sort is the distributed-stable approximation
    * production ICP pipelines use.
    */
  def packOffsetsSemantic(df: DataFrame, idCol: String, orderCol: String,
                          weightCol: String, seqTokens: Int): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col(orderCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col("cluster"),
        col(orderCol).cast("long").as(orderCol),
        col(weightCol).cast("long").as(weightCol))
      .withColumn("start_offset",
        sum(col(weightCol)).over(w) - col(weightCol))
      .withColumn("seq_id", expr(s"start_offset div $seqTokens"))
  }
}
