package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface of the engine.
  *
  * The reference's "incremental" story is parameterized batch re-runs
  * (SURVEY §2.9); this module is the streaming upgrade path: the same
  * transforms expressed over `readStream`, plus the stateful operators
  * a training-data/event pipeline needs (windowed aggregation with
  * watermark, in-stream dedup, session assembly with custom state).
  *
  * Every transform here is defined on a plain DataFrame, so the SAME
  * code runs in batch (for the DuckDB oracle) and under
  * `spark.readStream` (watermarks are no-ops in batch) — one logical
  * plan, two execution modes. That equivalence is asserted in
  * StreamingSpec by driving the parquet testdata through a memory-sink
  * streaming query.
  */
object EventStream {

  /** Load an events table, normalizing `ts` to session-zone TIMESTAMP
    * whatever flavor the parquet writer chose. Upstream timestamp
    * encodings are not stable — the same generator has produced
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS, isAdjustedToUTC=false) in
    * successive runs — so the loader accepts ALL of:
    *
    *  - TIMESTAMP(NANOS): Spark refuses it by default
    *    (PARQUET_TYPE_ILLEGAL); we retry under the legacy
    *    `nanosAsLong` read path and floor the Long to µs, exactly
    *    like DuckDB's ns→µs cast;
    *  - TIMESTAMP_NTZ (µs, no UTC flag): cast to TimestampType —
    *    value-preserving under the session's UTC zone, and the type
    *    watermarks/`unix_micros` require;
    *  - TIMESTAMP (LTZ): passed through.
    *
    * The session conf is only touched on the nanos retry path, and
    * then SET ONCE and left set (it is scoped to nanos-typed columns,
    * which Spark would otherwise refuse outright). The previous
    * set/unset-per-read churn invalidated the session's cached plans
    * on every events read — measured as a 3× regression on an
    * unrelated window query in round 7.
    */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    val normalized = normalizeEventTime(_: DataFrame, "ts")
    try normalized(spark.read.parquet(path))
    catch {
      case e: Throwable if isIllegalNanos(e) =>
        // sticky: set once, never unset — repeat nanos reads must not
        // keep invalidating cached plans
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        normalized(spark.read.parquet(path))
    }
  }

  /** True iff `e` (or a cause) is Spark refusing a TIMESTAMP(NANOS)
    * parquet column — the one case where a legacy-flag retry helps.
    */
  private def isIllegalNanos(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists {
      t =>
        val m = Option(t.getMessage).getOrElse("")
        m.contains("PARQUET_TYPE_ILLEGAL") ||
          (m.contains("illegal") && m.toLowerCase.contains("nanos")) ||
          m.contains("TimestampType(NANOS")
    }

  /** Normalize an event-time column to TimestampType (session zone):
    * Long = legacy nanos read → floor to µs (plain `div` truncates
    * toward zero, which differs on pre-1970 nanos; (ts − pmod(ts,
    * 1000)) is a multiple of 1000, so the div is exact and the result
    * is the floor for either sign); TIMESTAMP_NTZ → cast (UTC session
    * makes it value-preserving); TIMESTAMP → unchanged. Public so any
    * ad-hoc event reader can apply the same contract.
    */
  def normalizeEventTime(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(
          expr(s"($tsCol - pmod($tsCol, 1000)) div 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
  }

  /** Tumbling-window aggregate with a watermark for late data.
    * Output: (window_start, event_type, n_events, total_value).
    * State at scale: one row per (window × type) partition; watermark
    * bounds state size by evicting windows older than the delay.
    */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Trending top-k: the `k` most frequent event types per time
    * window, ties broken by name (total order → deterministic, both
    * engines pick the same winners). The rank runs over the
    * per-window ROLLUP (windows × types — bounded, tiny), never the
    * raw events; streaming-wise this is [[windowedAgg]]'s append-mode
    * output ranked per closed window (foreachBatch or a downstream
    * batch pass — windowed counts are the stateful part, the rank is
    * stateless per window).
    */
  def trendingTopK(events: DataFrame, k: Int,
                   windowLen: String = "1 hour",
                   watermarkDelay: String = "10 minutes"): DataFrame =
    rankWindows(windowedTypeCounts(events, windowLen, watermarkDelay), k)

  /** The STREAMABLE half of [[trendingTopK]]: per-(window, type)
    * counts with a watermark (append-mode emits each window once it
    * closes). Rank is a window function — unsupported on a streaming
    * Dataset — so a stream applies [[rankWindows]] downstream
    * (foreachBatch, or batch over the emitted rows; closed windows are
    * complete, so ranking them later is exact).
    */
  def windowedTypeCounts(events: DataFrame,
                         windowLen: String = "1 hour",
                         watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Stateless per-window rank ≤ k over the BOUNDED counts rollup. */
  def rankWindows(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    counts
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** In-stream exact dedup on event_id within the watermark horizon —
    * `dropDuplicates` keyed on the id plus the event-time column keeps
    * state bounded (Spark evicts ids older than the watermark).
    */
  def dedupStream(events: DataFrame,
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user session summary via custom state (mapGroupsWithState):
    * counts + value sum + span, closed after `gapMs` of inactivity.
    */
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)
  final case class SessionState(n: Long, total: Double,
                                first: Long, last: Long)
  final case class SessionOut(user_id: Long, n_events: Long,
                              total_value: Double, span_ms: Long,
                              closed: Boolean)

  /** Shared per-group state transition for both sessionize variants:
    * fold the batch's events into the running session, emit the
    * (still-open) summary, and let the caller arm its flavor of
    * timeout on the updated state.
    */
  private def sessionStep(uid: Long, it: Iterator[Event],
                          state: GroupState[SessionState],
                          armTimeout: SessionState => Unit): SessionOut =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      SessionOut(uid, s.n, s.total, s.last - s.first, closed = true)
    } else {
      val evs = it.toSeq
      val prev = state.getOption.getOrElse(
        SessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
      val ts = evs.map(_.ts.getTime)
      val next = SessionState(
        prev.n + evs.size,
        prev.total + evs.map(_.value).sum,
        math.min(prev.first, if (ts.isEmpty) prev.first else ts.min),
        math.max(prev.last, if (ts.isEmpty) prev.last else ts.max))
      state.update(next)
      armTimeout(next)
      SessionOut(uid, next.n, next.total,
        next.last - next.first, closed = false)
    }

  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          sessionStep(uid, it, state,
            _ => state.setTimeoutDuration(gapMs))
      }
  }

  /** Event-time variant of [[sessionize]]: a session closes when the
    * WATERMARK — not wall-clock — passes last-event-time + gap, so a
    * replay of the same events produces the same closed sessions no
    * matter how fast the stream is reprocessed. This is the
    * replayable-correct production form; the processing-time variant
    * stays for feeds without meaningful event time. In batch
    * execution timeouts never fire (all data arrives at once), so the
    * same code yields the open-session summary the oracle checks.
    */
  def sessionizeEventTime(events: Dataset[Event],
                          gapMs: Long = 30 * 60 * 1000L,
                          watermarkDelay: String = "10 minutes")
                         (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          sessionStep(uid, it, state,
            // a LATE event (mapGroupsWithState does not drop rows behind
            // the watermark) can put last+gap before the current
            // watermark, which setTimeoutTimestamp rejects and the whole
            // query dies — clamp to just past the watermark so the
            // stale session closes on the next batch instead. Batch
            // execution exposes no watermark handle (throws) → no clamp
            // needed there, timeouts never fire.
            next => {
              val wm =
                try state.getCurrentWatermarkMs()
                catch { case _: UnsupportedOperationException => Long.MinValue
                        case _: IllegalStateException => Long.MinValue }
              state.setTimeoutTimestamp(math.max(next.last + gapMs, wm + 1))
            })
      }
  }

  /** The reference's incremental-batch story, streamified (SURVEY §2.9
    * stretch): a file stream whose every micro-batch MERGEs into a
    * parquet target via the engine's Upsert — `foreachBatch` gives the
    * same last-writer-wins semantics as the batch pipeline, continuous.
    * Returns after draining available input (test/bootstrap harness;
    * production would leave the query running).
    */
  def incrementalUpsertStream(spark: SparkSession, srcDir: String,
                              targetPath: String, keys: Seq[String],
                              checkpoint: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.engine.Upsert.merge(batch.sparkSession, targetPath,
          batch, keys)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Stream-stream interval join (click→purchase attribution): every
    * purchase matched to the same user's clicks in the preceding
    * `maxLag`. Batch and streaming share this plan; under streaming,
    * the watermarks on BOTH sides plus the time-range predicate bound
    * the join state — clicks older than (watermark − maxLag) are
    * evicted, so state is O(events in the lag window), never the
    * stream history. Inner-join matches emit as soon as both rows
    * arrive (no watermark hold-back), which is what makes the
    * batch ≡ stream comparison exact (StreamingSpec).
    */
  def clickAttribution(events: DataFrame, maxLag: String = "30 minutes",
                       watermarkDelay: String = "10 minutes"): DataFrame =
    attributionJoin(events, maxLag, watermarkDelay, "inner")
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"), col("value"))

  /** ONE copy of the attribution join (sides, watermarks, condition)
    * for both the inner and outer variants — they must never drift.
    */
  private def attributionJoin(events: DataFrame, maxLag: String,
                              watermarkDelay: String,
                              joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $maxLag"),
      joinType)
  }

  /** LEFT OUTER variant of [[clickAttribution]]: every click appears —
    * converted ones with their purchases, unconverted ones with null
    * purchase columns. Under streaming this is the interesting case:
    * an inner join can emit on arrival, but "this click never
    * converted" is only decidable once the watermark passes
    * click_ts + maxLag — the null-extended rows emit on state
    * EVICTION, which is why outer stream-stream joins REQUIRE the
    * watermark + time-bound the API enforces. Batch runs the same
    * plan eagerly (watermarks are no-ops), so the DuckDB oracle is a
    * plain left interval join.
    */
  def clickAttributionOuter(events: DataFrame,
                            maxLag: String = "30 minutes",
                            watermarkDelay: String = "10 minutes")
      : DataFrame =
    attributionJoin(events, maxLag, watermarkDelay, "left_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("value"))

  /** Streaming append with EXACTLY-ONCE delivery into a versioned
    * table: each micro-batch commits as generation `batchId` through
    * [[graft.engine.VersionedTable.commitBatch]], whose claim-file
    * ledger makes foreachBatch's at-least-once replay contract
    * idempotent (VersionedTableSpec pins replay + crash-completion).
    * Returns after draining available input (test/bootstrap harness).
    */
  def appendStreamVersioned(spark: SparkSession, srcDir: String,
                            tablePath: String, checkpoint: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val tbl = new graft.engine.VersionedTable(spark, tablePath)
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        tbl.commitBatch(id, batch); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Drive a batch parquet directory through a real streaming query
    * into a memory sink (synchronous; test/verification harness).
    */
  def runToMemory(spark: SparkSession, dir: String, queryName: String,
                  transform: DataFrame => DataFrame,
                  outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    // same event-time contract as loadEvents: a staged input written
    // before normalization (or by a foreign writer) must not poison
    // the watermark with an NTZ/Long ts
    val stream =
      if (schema.fieldNames.contains("ts")) normalizeEventTime(raw, "ts")
      else raw
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
