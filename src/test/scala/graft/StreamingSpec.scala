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
}
