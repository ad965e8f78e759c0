package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

import graft.functions.{NativeExpressions, TextFunctions}
import graft.operators.DatasetSplit

/** The curation chain as a structured stream — continuous ingestion
  * for the pipeline `q_pipe_curate2` runs in batch: clean →
  * quality-filter → exact-dedup-across-the-stream → lang + split
  * assignment. At 100 TB the corpus doesn't arrive as one batch; it
  * lands as files on a feed directory, and curation has to keep up
  * WITHOUT re-running over everything seen so far. Everything per-row
  * (clean, profile, split) runs scan-side with the same kernels as the
  * batch chain; the one genuinely cross-document stage — exact dedup —
  * is the only stateful operator.
  *
  * Dedup state and determinism: `flatMapGroupsWithState` keyed on
  * md5(cleaned text). State per key is a single boolean ("this content
  * has been emitted"), so total state is one flag per distinct
  * document — the streaming analogue of the batch `GROUP BY text`,
  * at ~48 bytes per distinct content hash instead of the text itself.
  * Within a micro-batch the winner is the MIN doc_id of the group
  * (deterministic regardless of partition arrival order — a plain
  * streaming `dropDuplicates` keeps an arbitrary first and would not
  * oracle); across micro-batches the earliest batch wins because later
  * groups find the flag set. Append mode: a kept document is emitted
  * exactly once and never retracted.
  *
  * Run-to-run protocol: AvailableNow over a parquet feed dir, state in
  * the checkpoint — so successive invocations with the same checkpoint
  * resume the dedup horizon incrementally (the q_cdc_stream /
  * q_d_stream_inc epoch-generation pattern: write files, run, write
  * more files, run again).
  *
  * Bounding the dedup horizon: a CONTINUOUS deployment should TTL the
  * seen-flags (GroupStateTimeout.ProcessingTimeTimeout + setTimeout +
  * remove on hasTimedOut) so state stops growing with every distinct
  * document ever seen. That knob deliberately does NOT exist on this
  * epoch-run API: measured on Spark 4.1, an AvailableNow query never
  * self-terminates once a processing-time timeout is registered — the
  * engine keeps scheduling timeout-service micro-batches (observed 50+
  * empty batches on a one-row feed), and even processAllAvailable
  * blocks on them. Timeout-based state GC is a continuous-query
  * feature; an epoch harness that needs a horizon should bound the
  * CHECKPOINT lifetime instead (start a fresh checkpoint per horizon
  * window — state resets wholesale, which is also the replayable
  * contract).
  */
object StreamingCurate {

  final case class CurDoc(key: String, doc_id: Long, lang: String,
                          split: String)

  /** Run the curation stream over everything currently unprocessed in
    * `feedDir`, appending kept documents to `outDir`; returns the
    * accumulated curated table. Quality threshold is in micros over
    * the CLEANED text, matching the batch chain.
    */
  def curateStream(spark: SparkSession, feedDir: String, outDir: String,
                   checkpoint: String,
                   qualityMinMicros: Long = 400000L): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(feedDir).schema
    val curated = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .select(col("doc_id"),
        TextFunctions.cleanBoilerplate(coalesce(col("text"), lit("")))
          .as("text"))
      .select(col("doc_id"), col("text"),
        NativeExpressions.textProfile(col("text")).as("__p"))
      .filter(col("__p.quality_micros") >= qualityMinMicros)
      .select(md5(col("text")).as("key"), col("doc_id"),
        col("__p.lang_pred").as("lang"),
        DatasetSplit.splitLabel(col("text")).as("split"))
      .as[CurDoc]
    val winners = curated
      .groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, (Long, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val w = rows.minBy(_.doc_id)
            Iterator((w.doc_id, w.lang, w.split))
          }
      }
      .toDF("doc_id", "lang", "split")
    val q = winners.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
