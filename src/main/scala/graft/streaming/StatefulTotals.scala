package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key running totals on the `transformWithState` API — Spark 4's
  * arbitrary-stateful-processing v2 (typed state variables on a
  * RocksDB store, optional per-state TTL), the successor to
  * `mapGroupsWithState` that [[EventStream.sessionize]] uses. One
  * operator on the new API keeps the engine current with where
  * Structured Streaming state management is going: state declared as
  * named variables with their own encoders and TTLs instead of one
  * opaque case-class blob, timers as first-class citizens, and a
  * store that spills to disk instead of living on the executor heap.
  *
  * Scale notes: state is one (count, cents) pair per user key,
  * RocksDB-backed — memory-bounded no matter the key cardinality;
  * `TTLConfig` retires idle users' state without a manual timeout
  * dance (the `mapGroupsWithState` equivalent is hand-rolled timeout
  * plumbing). Emission is one row per key per micro-batch (update
  * mode): downstream consumers see the latest lifetime totals.
  */
object StatefulTotals {

  final case class UserEvent(user_id: Long, cents: Long)
  final case class UserTotals(user_id: Long, n_events: Long,
                              total_cents: Long)

  /** The stateful processor: fold this batch's events for the key into
    * the persisted (n, cents) pair, emit the updated totals.
    */
  final class TotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.product[(Long, Long)], ttl)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { e => n += 1; cents += e.cents }
      state.update((n, cents))
      Iterator.single(UserTotals(key, n, cents))
    }
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val PartitionsKey = "spark.sql.shuffle.partitions"

  /** Drive a staged events directory through the processor into a
    * parquet output dir via foreachBatch (Trigger.AvailableNow: the
    * query processes what exists, then terminates itself — restart on
    * the same checkpoint to prove state survival; a memory sink
    * cannot recover from a checkpoint, which is exactly what the
    * restart contract needs to demonstrate). transformWithState
    * REQUIRES the RocksDB store, so the provider conf is set for the
    * query and restored after — a once-per-call mutation, not the
    * per-read churn the round-7 regression taught us to avoid. State
    * partitions are bounded to `statePartitions` at FIRST start (the
    * checkpoint pins them thereafter): every state partition is a
    * RocksDB instance whose per-batch snapshot upload is real I/O, so
    * "one store per core" is the wrong default for a small keyed
    * stream — size to state volume, not CPUs, and this harness's
    * state is one pair per user.
    *
    * TimeMode is pinned to None here: with ProcessingTime the TTL
    * machinery schedules no-data cleanup batches that a
    * drain-and-return harness would race against (observed: an
    * unbounded no-data batch loop); lifetime totals need no timers.
    * Returns the output dir's content (each micro-batch appended its
    * emitted totals).
    */
  def userTotalsStream(spark: SparkSession, stagedDir: String,
                       outDir: String, checkpoint: String,
                       statePartitions: Int = 4): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(stagedDir).schema
    val prevProvider = spark.conf.getOption(ProviderKey)
    val prevParts = spark.conf.getOption(PartitionsKey)
    spark.conf.set(ProviderKey, RocksDb)
    spark.conf.set(PartitionsKey, statePartitions.toString)
    try {
      val events = spark.readStream.schema(schema).parquet(stagedDir)
        .select(col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[UserEvent]
      val q = events.groupByKey(_.user_id)
        .transformWithState(new TotalsProcessor(TTLConfig.NONE),
          TimeMode.None(), OutputMode.Update())
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[UserTotals], batchId: Long) =>
            batch.toDF().withColumn("__batch", lit(batchId))
              .write.mode("append").parquet(outDir); ()
        }
        .start()
      q.awaitTermination()
      // AvailableNow is allowed to split the staged files across
      // MULTIPLE micro-batches; a user spanning batches then has one
      // emitted row per batch in the append-mode output. The lifetime
      // totals are the LAST batch's row per user — select it by the
      // batch id carried through the sink (lexicographic struct max:
      // __batch leads, so the latest batch wins; totals are cumulative,
      // so that row dominates the earlier ones).
      spark.read.parquet(outDir)
        .groupBy(col("user_id"))
        .agg(max(struct(col("__batch"), col("n_events"),
          col("total_cents"))).as("s"))
        .select(col("user_id"), col("s.n_events").as("n_events"),
          col("s.total_cents").as("total_cents"))
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
      prevParts match {
        case Some(v) => spark.conf.set(PartitionsKey, v)
        case None    => spark.conf.unset(PartitionsKey)
      }
    }
  }
}
