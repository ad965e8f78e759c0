package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** The streaming contract: the same transform yields identical results
  * in batch and under a real Structured Streaming query (memory sink),
  * and the stateful operators behave.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001/events.parquet"

  test("windowedAgg: batch and streaming runs agree row-for-row") {
    val batch = EventStream.windowedAgg(EventStream.loadEvents(spark, dir))
      .collect().map(_.toSeq).toSet

    // stream the same rows (staged into a directory — the streaming
    // file source requires one) through a complete-mode memory sink
    val staged = tmpDir("stream") + "/events"
    EventStream.loadEvents(spark, dir).write.parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)
    val q = EventStream.windowedAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName("win_agg").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_agg").collect().map(_.toSeq).toSet

    assert(batch.nonEmpty && streamed == batch)
  }

  test("trendingTopK: streamed windowed counts + downstream rank equals " +
    "the batch path exactly") {
    val events = EventStream.loadEvents(spark, dir)
    val batch = EventStream.trendingTopK(events, k = 2,
      windowLen = "6 hours").collect().map(_.toSeq).toSet

    val staged = tmpDir("stream") + "/trend"
    events.write.parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)
    // the streamable half runs as a REAL streaming query; the rank is
    // the documented downstream batch pass over the emitted windows
    val q = EventStream.windowedTypeCounts(stream, windowLen = "6 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("trend_counts").start()
    q.processAllAvailable(); q.stop()
    val streamed = EventStream.rankWindows(spark.table("trend_counts"), 2)
      .collect().map(_.toSeq).toSet

    assert(batch.nonEmpty && streamed == batch)
  }

  test("clickAttribution: a real stream-stream join matches the batch " +
    "interval join pair-for-pair") {
    val batch = EventStream.clickAttribution(
      EventStream.loadEvents(spark, dir)).collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "attribution produced no pairs at sf0.001")
    val staged = tmpDir("stream") + "/attr"
    EventStream.loadEvents(spark, dir).write.parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)
    val q = EventStream.clickAttribution(stream).writeStream
      .outputMode("append").format("memory").queryName("attr").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attr").collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("clickAttributionOuter: streamed outer join emits unmatched " +
    "clicks on watermark eviction and matches batch") {
    val batch = EventStream.clickAttributionOuter(
      EventStream.loadEvents(spark, dir)).collect().map(_.toSeq).toSet
    val unmatched = batch.count(_.apply(3) == null)
    assert(unmatched > 0, "need unconverted clicks for the outer case")
    val staged = tmpDir("stream") + "/attr-outer"
    EventStream.loadEvents(spark, dir).write.parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)
    val q = EventStream.clickAttributionOuter(stream).writeStream
      .outputMode("append").format("memory").queryName("attr_outer")
      .start()
    q.processAllAvailable(); q.processAllAvailable(); q.stop()
    val streamed = spark.table("attr_outer").collect().map(_.toSeq).toSet
    // the stream never "ends": an unmatched click whose eviction bound
    // (click_ts + lag) is past the FINAL GLOBAL watermark legitimately
    // stays pending. The global watermark is the MIN over both
    // withWatermark nodes' own max event times minus the delay — not
    // the overall max ts (the last click can never out-wait itself).
    // Outside that tail window the outer join must agree with batch
    // EXACTLY; inner matches always emit.
    assert(streamed.subsetOf(batch), "stream emitted a non-batch row")
    val ev = spark.read.parquet(staged)
    def sideMax(t: String) = ev.filter(col("event_type") === t)
      .agg(max(col("ts"))).head.getTimestamp(0).toInstant
    val wmFinal = Seq(sideMax("click"), sideMax("purchase")).min
      .minusSeconds(10 * 60)
    val horizon = wmFinal.minusSeconds(31 * 60) // lag 30m + 1m slack
    val mustEmit = batch.filter { r =>
      r(3) != null || // matched: emits on arrival
        r(2).asInstanceOf[java.sql.Timestamp].toInstant.isBefore(horizon)
    }
    val missing = mustEmit -- streamed
    assert(missing.isEmpty,
      s"rows missing despite evictable horizon: ${missing.take(3)}")
    assert(streamed.count(_.apply(3) == null) >= unmatched - 5,
      "almost all unmatched clicks should have evicted")
  }

  test("dedupStream drops duplicate event ids (streaming, two files)") {
    val staged = tmpDir("stream") + "/dup"
    val ev = EventStream.loadEvents(spark, dir).limit(100)
    ev.write.parquet(staged)               // file 1
    ev.write.mode("append").parquet(staged) // file 2: same 100 ids again
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)
    val q = EventStream.dedupStream(stream).writeStream
      .outputMode("append").format("memory").queryName("dedup_ev").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_ev").count() == 100)
  }

  test("incrementalUpsertStream: micro-batches MERGE into the target") {
    val base = tmpDir("stream-upsert")
    val src = base + "/src"
    val target = base + "/target"
    val ev = EventStream.loadEvents(spark, dir).limit(50)
      .select("event_id", "user_id", "value")
    ev.write.parquet(src)
    EventStream.incrementalUpsertStream(spark, src, target,
      Seq("event_id"), base + "/cp1")
    assert(spark.read.parquet(target).count() == 50)

    // second wave: 25 overlapping ids with doubled value + checkpointed
    // stream only processes the new file
    ev.limit(25).withColumn("value", col("value") * 2)
      .write.mode("append").parquet(src)
    EventStream.incrementalUpsertStream(spark, src, target,
      Seq("event_id"), base + "/cp1")
    val got = spark.read.parquet(target)
    assert(got.count() == 50) // upsert, not append
    assert(got.select(countDistinct("event_id")).head.getLong(0) == 50)
  }

  test("sessionizeEventTime: batch and stream agree on every session's content") {
    implicit val s = spark
    val ev = EventStream.loadEvents(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[EventStream.Event]
    val batch = EventStream.sessionizeEventTime(ev).collect()
      .map(o => o.user_id -> (o.n_events, o.span_ms)).toMap

    val staged = tmpDir("stream") + "/sess-et"
    ev.toDF().write.parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)
      .as[EventStream.Event]
    val q = EventStream.sessionizeEventTime(stream).writeStream
      .outputMode("update").format("memory").queryName("sess_et_b").start()
    q.processAllAvailable(); q.stop()
    val streamedRows = spark.table("sess_et_b")
      .as[EventStream.SessionOut].collect()

    // closed-ness differs by design: the stream's final no-data batch
    // fires event-time timeouts for sessions the watermark passed,
    // which one all-at-once batch cannot express. The session CONTENT
    // (event count, span) must agree exactly, and every closed row must
    // carry its user's full rollup.
    val finalPerUser = streamedRows.groupBy(_.user_id)
      .map { case (u, rs) =>
        u -> (rs.map(_.n_events).max, rs.map(_.span_ms).max) }
    assert(batch.nonEmpty && finalPerUser == batch)
    streamedRows.filter(_.closed).foreach { o =>
      assert((o.n_events, o.span_ms) == batch(o.user_id),
        s"closed session for user ${o.user_id} lost events: $o")
    }
  }

  test("sessionizeEventTime: watermark past gap closes the session " +
    "(event-time, not wall-clock)") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, tsMs: Long, uid: Long) = EventStream.Event(
      id, new java.sql.Timestamp(tsMs), uid, "click", 1.0)
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeEventTime(input.toDS(),
        gapMs = 60000, watermarkDelay = "0 seconds")
      .writeStream.outputMode("update").format("memory")
      .queryName("sess_et_close").start()
    // batch 1: user 1's session spans [1s, 31s]
    input.addData(ev(1, 1000, 1), ev(2, 31000, 1))
    q.processAllAvailable()
    // batch 2 advances the watermark to 200s (> 31s + 60s gap) …
    input.addData(ev(3, 200000, 2))
    q.processAllAvailable()
    // … and the timeout fires in the batch AFTER the watermark moved
    input.addData(ev(4, 300000, 2))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_et_close")
      .as[EventStream.SessionOut].collect()
    val closed = out.filter(o => o.user_id == 1 && o.closed)
    assert(closed.length == 1, s"expected one closed session, got: ${out.toSeq}")
    assert(closed.head.n_events == 2 && closed.head.span_ms == 30000)
    assert(!out.exists(o => o.user_id == 2 && o.closed)) // still open
  }

  test("StreamingDedup: cross-batch candidates equal the batch LSH pair set") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
      .as[(Long, String)].collect()
    val copies = docs.map { case (id, t) =>
      (id + 1000000L, t + " planted near duplicate") }

    // ground truth: the batch LSH candidate generator on the full corpus
    val full = (docs ++ copies).toSeq.toDF("doc_id", "text")
    val batchPairs = graft.operators.Dedup
      .minhashCandidates(full, "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // stream: originals in batch 1, perturbed copies in batch 2 — the
    // near-dup of a batch-1 doc must be caught when it arrives later
    val input = MemoryStream[(Long, String)]
    val banded = StreamingDedup.bandedSignatures(
      input.toDS().toDF("doc_id", "text"), "text", "doc_id")
      .as[StreamingDedup.Banded]
    val q = StreamingDedup.candidateStream(banded).writeStream
      .outputMode("append").format("memory").queryName("sdedup").start()
    input.addData(docs.toSeq: _*)
    q.processAllAvailable()
    input.addData(copies.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sdedup")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    assert(batchPairs.nonEmpty && streamed == batchPairs)
    // cross-batch detection: every planted (original, copy) pair found
    docs.foreach { case (id, _) =>
      assert(streamed.contains((id, id + 1000000L)), s"missed planted dup $id")
    }
  }

  test("StreamingDedup: over-cap bucket poisons — no pair storm after the cap") {
    implicit val s = spark
    import graft.streaming.StreamingDedup
    // 30 identical docs, cap 10: batch drops the bucket retroactively
    // (0 pairs); the stream emits pairs only among the first 10
    // arrivals, then the poisoned bucket emits nothing more
    val docs = (1L to 30L)
      .map(i => (i, "identical text shared by every row here"))
    val banded = StreamingDedup.bandedSignatures(
      docs.toDF("doc_id", "text"), "text", "doc_id")
      .as[StreamingDedup.Banded]
    val pairs = StreamingDedup.candidateStream(banded, maxBucketSize = 10)(s)
      .select("id_a", "id_b").distinct().as[(Long, Long)].collect()
    // only ids 1..10 may appear; the other 20 arrivals emit nothing
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a <= 10 && b <= 10 },
      s"pairs past the cap: ${pairs.filterNot { case (a, b) => a <= 10 && b <= 10 }.toSeq}")
    assert(pairs.length == 45) // C(10,2) — capped, not 435 = C(30,2)
  }

  test("sessionize (batch mode): per-user rollup matches groupBy") {
    implicit val s = spark
    val ev = EventStream.loadEvents(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[EventStream.Event]
    val sessions = EventStream.sessionize(ev).collect()
      .map(o => o.user_id -> o).toMap
    val expected = ev.toDF().groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("v")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sessions.keySet == expected.keySet)
    expected.foreach { case (uid, (n, v)) =>
      assert(sessions(uid).n_events == n)
      assert(math.abs(sessions(uid).total_value - v) < 1e-6)
      assert(sessions(uid).span_ms >= 0)
    }
  }

  test("incrementalDedupStream: union over epochs equals a full " +
    "recompute, and a checkpoint restart continues the epoch sequence") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val base = tmpDir("dsi")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.union(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    def run() = StreamingDedup.incrementalDedupStream(spark,
      s"$base/feed", s"$base/idx", s"$base/out", s"$base/ckpt",
      threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    // two files land, the job drains them (epochs 0, 1)
    planted.filter(pmod(xxhash64(col("doc_id")), lit(3)) === 0)
      .coalesce(1).write.mode("append").parquet(s"$base/feed")
    planted.filter(pmod(xxhash64(col("doc_id")), lit(3)) === 1)
      .coalesce(1).write.mode("append").parquet(s"$base/feed")
    val afterTwo = run()
    // a third file lands; the RESTART resumes from epoch 2 and the
    // union must now equal the full batch recompute
    planted.filter(pmod(xxhash64(col("doc_id")), lit(3)) === 2)
      .coalesce(1).write.mode("append").parquet(s"$base/feed")
    val afterThree = run()
    assert(afterTwo.subsetOf(afterThree),
      "a restart must never lose previously reported pairs")
    val full = Dedup.nearDupPairs(planted, "text", "doc_id",
        threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(afterThree == full,
      s"stream-only=${afterThree -- full}, full-only=${full -- afterThree}")
    assert(full.nonEmpty, "vacuous equivalence")
  }

  test("incrementalDedupStream: the signature-index ledger stays " +
    "BOUNDED under periodic compaction across 20+ epochs, and the " +
    "pair union still equals a full recompute after a restart") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val base = tmpDir("dsi-compact")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.union(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    // 21 one-file epochs (maxFilesPerTrigger=1), compaction every 4:
    // without compaction the ledger would end at 21+ generations; with
    // it the live set is ≤ compactEvery+2 right after a fold-plus-
    // growth cycle (fold at epoch k squashes ≤ k−1 into one)
    val nEpochs = 21
    (0 until nEpochs).foreach { i =>
      planted.filter(pmod(xxhash64(col("doc_id")), lit(nEpochs)) === i)
        .coalesce(1).write.mode("append").parquet(s"$base/feed")
    }
    def run() = StreamingDedup.incrementalDedupStream(spark,
      s"$base/feed", s"$base/idx", s"$base/out", s"$base/ckpt",
      threshold = 0.5, compactEveryEpochs = 4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    run()
    val vt = new graft.engine.VersionedTable(spark, s"$base/idx/sigs")
    val gens = vt.versions
    assert(gens.length <= 6,
      s"ledger not bounded: ${gens.length} generations ($gens)")
    // restart: a late file lands; epoch 21 continues the sequence and
    // its old side reads THROUGH the compacted generations
    val extra = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    extra.coalesce(1).write.mode("append").parquet(s"$base/feed")
    val afterRestart = run()
    val full = Dedup.nearDupPairs(planted.union(extra), "text", "doc_id",
        threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(afterRestart == full,
      s"stream-only=${afterRestart -- full}, full-only=${full -- afterRestart}")
    assert(full.nonEmpty, "vacuous equivalence")
  }

  test("transformWithState totals: one batch equals groupBy; RocksDB " +
    "state survives a checkpoint restart") {
    import graft.streaming.StatefulTotals
    val base = tmpDir("tws")
    val staged = s"$base/events"
    val ckpt = s"$base/ckpt"
    val ev = EventStream.loadEvents(spark, dir)
      .select(col("user_id"), col("value")).limit(500)
    ev.coalesce(1).write.mode("append").parquet(staged)
    def expected(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("c"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val run1 = StatefulTotals.userTotalsStream(spark, staged,
      s"$base/out1", ckpt)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(run1 == expected(spark.read.parquet(staged)
      .select(col("user_id"), col("value"))),
      "single-batch totals must equal the full aggregate")

    // a second file lands; the query RESTARTS on the same checkpoint —
    // emitted totals for re-seen users must include batch-1 state
    // (proves the RocksDB store persisted across the restart)
    val ev2 = EventStream.loadEvents(spark, dir)
      .select(col("user_id"), col("value"))
      .limit(800).exceptAll(ev) // disjoint-ish slice, overlapping users
    ev2.coalesce(1).write.mode("append").parquet(staged)
    val run2 = StatefulTotals.userTotalsStream(spark, staged,
      s"$base/out2", ckpt)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(run2.nonEmpty, "second batch must emit updated users")
    val full = expected(spark.read.parquet(staged)
      .select(col("user_id"), col("value")))
    run2.foreach { case (uid, got) =>
      assert(got == full(uid),
        s"user $uid: restart lost state (got $got, want ${full(uid)})")
    }
  }

  test("transition stream: epoch-split run with a mid-feed restart " +
    "equals the batch lag-window counts") {
    import graft.streaming.TransitionStream
    val base = tmpDir("trans")
    val staged = s"$base/feed"
    val ev = EventStream.loadEvents(spark, dir).limit(2000)
    TransitionStream.stageEpochs(spark, ev, staged, epochs = 3)
    // batch reference over exactly the staged rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val want = spark.read.parquet(staged)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type"))
      .count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    // run 1 drains the full 3-epoch feed
    val got = TransitionStream.transitionsStream(
        spark, staged, s"$base/out", s"$base/ckpt")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == want, "stream counts must equal the batch lag window")

    // a 4th, LATER epoch lands; restart on the same checkpoint — the
    // per-user last-event state must bridge the restart (an edge per
    // user spans the old feed's tail and the new epoch's head)
    val mx = spark.read.parquet(staged).agg(max(col("us"))).head.getLong(0)
    spark.read.parquet(staged).filter(col("us") >
        mx - 3600L * 1000000L) // the last hour replays, shifted forward
      .withColumn("us", col("us") + 7L * 24 * 3600 * 1000000L)
      .withColumn("event_id", col("event_id") + 10000000L)
      .coalesce(1).write.mode("append").parquet(staged)
    val got2 = TransitionStream.transitionsStream(
        spark, staged, s"$base/out", s"$base/ckpt")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want2 = spark.read.parquet(staged)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type"))
      .count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got2 == want2,
      "restarted stream must bridge epochs with persisted last-event state")
    assert(want2.values.sum > want.values.sum,
      "the appended epoch must have added transitions")
  }

  test("transition stream sink is exactly-once under batch replay: " +
    "the batch-directory claim ledger absorbs a full checkpoint reset") {
    import graft.streaming.TransitionStream
    val base = tmpDir("transreplay")
    val staged = s"$base/feed"
    TransitionStream.stageEpochs(spark,
      EventStream.loadEvents(spark, dir).limit(1000), staged, epochs = 3)
    val out = s"$base/out"
    val run1 = TransitionStream.transitionsStream(
        spark, staged, out, s"$base/ckpt")
      .as[(String, String, Long)].collect().toSet
    // checkpoint wiped, sink kept: foreachBatch replays batches 0..2
    // from scratch — at-least-once delivery's worst case. The plain
    // `append` sink this replaced would double every count; the
    // batch=<id> claim directories make the replay write NOTHING.
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/ckpt"), true)
    val run2 = TransitionStream.transitionsStream(
        spark, staged, out, s"$base/ckpt2")
      .as[(String, String, Long)].collect().toSet
    assert(run2 == run1,
      "replayed batches must hit the claim ledger, not double-count")
    // and the ledger really is per-batch directories, no loose files
    val top = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filterNot(_.getPath.getName.startsWith("_"))
      .filterNot(_.getPath.getName.startsWith("."))
    assert(top.nonEmpty && top.forall(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch=")),
      s"sink layout must be batch=<id> claim dirs, got " +
        top.map(_.getPath.getName).mkString(","))
  }

  test("StreamingCurate: min-id wins inside a batch, seen-flag drops " +
    "across batches and across separate runs (checkpoint resume)") {
    import spark.implicits._
    val root = tmpDir("stream") + "/curate"
    val feed = s"$root/feed"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    // quality-passing content (long enough, stopwords, clean)
    val textA = "the quick brown fox jumps over the lazy dog and then " +
      "the fox runs far away into the quiet green woods for a while"
    val textB = textA + " but the second story ends in the small town"
    // batch 0: textA arrives THREE times in ONE micro-batch with ids
    // 30, 10, 20 — the winner must be min(10), not an arbitrary first
    Seq((30L, textA), (10L, textA), (20L, textA))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(feed)
    val r1 = graft.streaming.StreamingCurate
      .curateStream(spark, feed, out, ckpt)
      .select("doc_id").as[Long].collect().sorted
    assert(r1.toSeq == Seq(10L), s"intra-batch winner must be min id: ${r1.toSeq}")
    // batch 1 (separate run, same checkpoint): textA again (id 5 —
    // LOWER than the emitted winner, still dropped: append mode never
    // retracts) + textB first-seen
    Seq((5L, textA), (40L, textB))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(feed)
    val r2 = graft.streaming.StreamingCurate
      .curateStream(spark, feed, out, ckpt)
      .select("doc_id").as[Long].collect().sorted
    assert(r2.toSeq == Seq(10L, 40L),
      s"cross-run state must drop the re-arrival and keep the new doc: ${r2.toSeq}")
  }
}
