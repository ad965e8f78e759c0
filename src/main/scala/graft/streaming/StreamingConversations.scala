package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

import graft.functions.TextFunctions

/** SFT conversation-thread assembly as a structured stream — the
  * continuous-ingest arm of [[graft.operators.Conversations.assemble]].
  * Message logs arrive in epochs (a chat backend flushes files); a
  * thread's verdict is REVISION-PRONE by nature — the turn that closes
  * a gap, breaks alternation, or duplicates a slot can land batches
  * after the thread first appeared — so the output is a thread-QA
  * CHANGELOG in append mode: one row per (thread, update) with a
  * per-thread monotone `upd` counter; latest row = current verdict.
  * Downstream consumers take max(upd) per thread (the CDC-consumer
  * read, [[StreamingPreference.latest]]'s shape), and the latest rows
  * are BIT-IDENTICAL to the batch assembler over the whole feed —
  * which is what the gate's oracle checks.
  *
  * State per thread is its absorbed message MULTISET, stored as
  * per-tuple multiplicities merged by MAX per epoch: a replayed epoch
  * re-delivers every tuple at the same within-epoch count, so the max
  * absorbs it idempotently (the changelog row re-emits but
  * latest-wins consumers are unaffected), while a genuinely
  * duplicated identical message INSIDE one epoch arrives at count ≥ 2
  * and trips `duplicate_turn` exactly like the batch assembler
  * (round-14 ADVICE: full-tuple SET dedup conflated the two and the
  * stream could report ok where batch reported duplicate_turn). The
  * one residual divergence is inherent, not implementational: an
  * identical tuple arriving once in each of two DIFFERENT epochs is
  * indistinguishable from a replay of the first (at-least-once
  * delivery carries no epoch identity), so the stream counts it once
  * where batch counts twice. Per-group memory is bounded by thread
  * length exactly like the batch operator's collect_list. All text
  * semantics (token count, the
  * Spark-trim emptiness test, the parity-expected role mismatch) are
  * computed SCAN-SIDE with the very same Column expressions the batch
  * path uses, so the stateful handler only counts — there is no
  * second implementation of tokenization to drift.
  *
  * Horizon: threads are unbounded-lived, so state is bounded by
  * CHECKPOINT ROTATION (start a fresh checkpoint per retention
  * window), NOT by processing-time timeouts — the measured negative
  * result in NOTES: a timeout fires relative to the batch after the
  * watermark moves, which under AvailableNow's final no-data
  * micro-batch closes threads an epoch too early.
  */
object StreamingConversations {

  final case class Msg(conv_id: Long, turn: Option[Long],
                       role: Option[String], text: String, n_tok: Long,
                       null_field: Boolean, mismatch: Boolean,
                       empty: Boolean)
  /** One distinct absorbed tuple with its multiplicity — the max of
    * its within-epoch counts across absorbed epochs (see the replay
    * contract in the object doc).
    */
  final case class MsgCount(msg: Msg, n: Int)
  final case class ThreadState(upd: Int, entries: Seq[MsgCount])
  final case class ThreadQa(conv_id: Long, upd: Int, n_msgs: Long,
                            n_turns: Long, max_turn: Option[Long],
                            n_tokens: Long, status: String,
                            transcript: Option[String])

  /** Drain everything unprocessed in `feedDir` (messages with columns
    * convCol/turnCol/roleCol/textCol), appending thread-QA changelog
    * rows to `outDir`; returns the accumulated changelog.
    */
  def assembleStream(spark: SparkSession, feedDir: String,
                     outDir: String, checkpoint: String,
                     convCol: String = "conv_id",
                     turnCol: String = "turn",
                     roleCol: String = "role",
                     textCol: String = "text",
                     firstRole: String = "user",
                     secondRole: String = "assistant"): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(feedDir).schema
    val expected = when(col(turnCol) % 2 === 0, lit(firstRole))
      .otherwise(lit(secondRole))
    val msgs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .select(col(convCol).cast("long").as("conv_id"),
        col(turnCol).cast("long").as("turn"),
        col(roleCol).as("role"),
        coalesce(col(textCol), lit("")).as("text"),
        TextFunctions.tokenCount(coalesce(col(textCol), lit("")))
          .cast("long").as("n_tok"),
        (col(turnCol).isNull || col(roleCol).isNull).as("null_field"),
        when(col(roleCol) =!= expected, lit(true)).otherwise(lit(false))
          .as("mismatch"),
        when(length(trim(coalesce(col(textCol), lit("")))) === 0,
          lit(true)).otherwise(lit(false)).as("empty"))
      .as[Msg]
    val changelog = msgs
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ThreadState, ThreadQa](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (conv, rows, state) =>
          val st = state.getOption.getOrElse(ThreadState(0, Vector.empty))
          // multiplicity max-merge (one epoch file per batch under
          // maxFilesPerTrigger=1): replay re-delivers the same
          // per-epoch counts → no-op; a within-epoch duplicate
          // arrives at count ≥ 2 → absorbed at full multiplicity
          val batchCounts = rows.toVector.groupBy(identity)
            .map { case (m, v) => (m, v.size) }
          val known = st.entries.map(_.msg).toSet
          val entries = st.entries.map(e =>
            e.copy(n = math.max(e.n, batchCounts.getOrElse(e.msg, 0)))) ++
            batchCounts.collect {
              case (m, n) if !known(m) => MsgCount(m, n)
            }.toVector.sortBy(e =>
              (e.msg.turn.getOrElse(Long.MaxValue), e.msg.text))
          val acc = entries.flatMap(e => Vector.fill(e.n)(e.msg))
          val next = ThreadState(st.upd + 1, entries)
          state.update(next)
          // the batch QA, recomputed over the absorbed set — counting
          // only; every text-semantic flag arrived from the scan
          val nulls = acc.count(_.null_field)
          val turns = acc.flatMap(_.turn)
          val nTurns = turns.distinct.size.toLong
          val maxTurn = if (turns.isEmpty) None else Some(turns.max)
          val status =
            if (nulls > 0) "null_field"
            else if (acc.size.toLong != nTurns) "duplicate_turn"
            else if (!maxTurn.contains(nTurns - 1)) "turn_gap"
            else if (acc.exists(_.mismatch)) "role_break"
            else if (acc.exists(_.empty)) "empty_message"
            else "ok"
          val transcript =
            if (status == "ok")
              Some(acc.sortBy(_.turn.get)
                .map(m => s"${m.role.get}: ${m.text}").mkString("\n"))
            else None
          Iterator(ThreadQa(conv, next.upd, acc.size.toLong, nTurns,
            maxTurn, acc.map(_.n_tok).sum, status, transcript))
      }
      .toDF()
    val q = changelog.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Latest-wins view of the changelog: the current verdict per
    * thread (max upd) — exactly the batch assembler's row set over
    * the accumulated feed. One struct-max aggregation.
    */
  def latest(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("conv_id"))
      .agg(max(struct(col("upd"), col("n_msgs"), col("n_turns"),
        col("max_turn"), col("n_tokens"), col("status"),
        col("transcript"))).as("__c"))
      .select(col("conv_id"), col("__c.n_msgs").as("n_msgs"),
        col("__c.n_turns").as("n_turns"),
        col("__c.max_turn").as("max_turn"),
        col("__c.n_tokens").as("n_tokens"),
        col("__c.status").as("status"),
        col("__c.transcript").as("transcript"))
}
