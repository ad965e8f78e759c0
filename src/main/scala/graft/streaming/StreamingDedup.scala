package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate candidate detection: the MinHash+LSH
  * pipeline as an INCREMENTAL operator — each arriving document is
  * checked against everything already seen, emitting candidate pairs
  * as they appear instead of re-running batch dedup over the corpus.
  *
  * Shape: signatures and (band, bucket) keys are computed scan-side
  * with the SAME native kernel and seed as the batch path (a stream
  * and a batch run of one corpus agree pair-for-pair), then
  * `flatMapGroupsWithState` keyed on (band, bucket) holds each
  * bucket's members — id + signature, never text — as state. A new
  * doc emits one candidate per existing member and joins the state.
  *
  * State at scale: bounded per bucket by `maxBucketSize`. A bucket
  * that REACHES the cap is poisoned — its member list is cleared (the
  * state shrinks to a flag) and it emits nothing further. This is the
  * closest streaming analogue of the batch path's retroactive
  * bucket drop: pairs emitted before the cap was hit cannot be
  * retracted in append mode, so on a corpus with an over-cap bucket
  * the stream's output is the first-arrivals subset of pairs where
  * batch emits none (on corpora where no bucket exceeds the cap the
  * two agree pair-for-pair — StreamingSpec pins both behaviors).
  * Total state is signatures-only: ~8·numHashes bytes per doc per
  * band. A production deployment would TTL buckets with a timeout to
  * bound the horizon; candidates surface with the per-band
  * duplication the batch path removes with `distinct()` — downstream
  * exact verification dedups as a side effect.
  */
object StreamingDedup {

  final case class Banded(band: Int, bucket: Long, doc_id: Long,
                          sig: Seq[Long])
  final case class Member(doc_id: Long, sig: Seq[Long])
  final case class BucketState(members: List[Member], poisoned: Boolean)
  final case class CandPair(id_a: Long, id_b: Long, jaccard_est: Double)

  /** Scan-side projection shared by stream and batch: (band, bucket,
    * doc_id, sig) — works on a streaming OR batch DataFrame.
    */
  def bandedSignatures(docs: DataFrame, textCol: String, idCol: String,
                       k: Int = 3, numHashes: Int = 32,
                       bands: Int = 8): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes)")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.NativeExpressions
          .minhashSignature(col(textCol), k, numHashes).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(Dedup.lshBuckets(col("sig"), bands, numHashes / bands))
          .as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("doc_id"), col("sig"))
  }

  /** The nightly-ingest dedup as ONE streaming job: each micro-batch
    * of documents signs itself, commits to the persisted signature
    * index as generation = the stream epoch
    * ([[graft.operators.Dedup.incrementalNearDups]] — the claim
    * ledger makes replays no-ops on the index), and writes its
    * VERIFIED pairs under `outDir/epoch=<id>` with overwrite — so a
    * replayed epoch rewrites identical output instead of duplicating
    * it, and the whole job is exactly-once end to end. Every pair
    * surfaces exactly once (in the epoch of its latest member); the
    * union over epochs equals a full recompute (the DedupSpec
    * incremental identity). Drains available input and returns the
    * union; restart on the same checkpoint to continue the epoch
    * sequence when new feed files land.
    *
    * Ledger maintenance: every `compactEveryEpochs` epochs the
    * signature index folds via
    * [[graft.operators.Dedup.compactSignatureIndex]], so the
    * generation ledger stays bounded (≤ compactEveryEpochs + 1 live
    * generations between folds) instead of growing one generation per
    * epoch forever. The fold horizon is `epoch − 1` — the newest epoch
    * the CHECKPOINT has already committed — never the in-flight epoch:
    * a crash between the fold and the checkpoint commit replays the
    * current epoch, whose incremental reads (own generation as "new",
    * `readThrough(epoch−1)` as "old") then see byte-identical content
    * because the fold squashed strictly below its own generation.
    * Folding the in-flight epoch instead would make its replay read
    * the whole squashed corpus as "new" and re-emit every historical
    * pair. Set `compactEveryEpochs = 0` to disable.
    */
  def incrementalDedupStream(spark: SparkSession, feedDir: String,
                             indexPath: String, outDir: String,
                             checkpoint: String,
                             textCol: String = "text",
                             idCol: String = "doc_id",
                             threshold: Double = 1.0,
                             maxFilesPerTrigger: Int = 1,
                             compactEveryEpochs: Int = 8,
                             compactTargetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val schema = spark.read.parquet(feedDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Dedup.incrementalNearDups(batch, textCol, idCol, indexPath, id,
            threshold)
          .write.mode("overwrite").parquet(s"$outDir/epoch=$id")
        if (compactEveryEpochs > 0 && id > 0 && id % compactEveryEpochs == 0)
          Dedup.compactSignatureIndex(spark, indexPath, upTo = id - 1,
            targetFileBytes = compactTargetFileBytes)
        ()
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir).drop("epoch")
  }

  /** Candidate pairs, incrementally: every new doc vs the bucket's
    * existing members. Deterministic: within a micro-batch, docs enter
    * a bucket in id order, and a pair is always (smaller, larger) id.
    */
  def candidateStream(banded: Dataset[Banded], maxBucketSize: Int = 1000)
                     (implicit spark: SparkSession): Dataset[CandPair] = {
    import spark.implicits._
    banded
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          var st = state.getOption.getOrElse(BucketState(Nil, poisoned = false))
          val out = scala.collection.mutable.ListBuffer.empty[CandPair]
          it.toSeq.sortBy(_.doc_id).foreach { d =>
            if (!st.poisoned && !st.members.exists(_.doc_id == d.doc_id)) {
              // the (maxBucketSize+1)-th member is what makes the bucket
              // over-cap in batch terms (batch keeps buckets of size
              // <= maxBucketSize) — that arrival poisons
              if (st.members.size >= maxBucketSize) {
                // cap reached: poison the bucket — emit nothing more
                // and drop the member list (state shrinks to a flag)
                st = BucketState(Nil, poisoned = true)
              } else {
                st.members.foreach { m =>
                  val matching = m.sig.iterator.zip(d.sig.iterator)
                    .count { case (a, b) => a == b }
                  out += CandPair(math.min(m.doc_id, d.doc_id),
                    math.max(m.doc_id, d.doc_id),
                    matching.toDouble / d.sig.length)
                }
                st = st.copy(members = Member(d.doc_id, d.sig) :: st.members)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
