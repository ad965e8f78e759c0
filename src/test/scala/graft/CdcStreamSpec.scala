package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{Upsert, VersionedTable}
import graft.streaming.StreamingCdc

/** Streaming CDC end-to-end: exactly-once upsert-with-deletes through
  * foreachBatch + the claim-file ledger, equivalence to the batch
  * applyChanges path, replay idempotence (the kill-and-rerun contract),
  * and the table-mode guards that keep maintenance ops from corrupting
  * a CDC/append table.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def feed(rows: (Int, String, String)*): DataFrame =
    rows.toDF("k", "v", "op")

  private def state(t: VersionedTable): Set[(Int, String)] =
    t.read().select(col("k"), col("v")).as[(Int, String)].collect().toSet

  test("applyCdcBatch: insert/update/delete sequence lands; replay of a " +
    "committed batch is a no-op even though the base has moved") {
    val t = new VersionedTable(spark, tmpDir("graft-cdc") + "/t")
    val b0 = feed((1, "a", "I"), (2, "b", "I"), (3, "c", "I"))
    val b1 = feed((2, "b2", "U"), (3, "x", "D"), (4, "d", "I"))
    assert(StreamingCdc.applyCdcBatch(t, 0L, b0, Seq("k")))
    assert(state(t) == Set((1, "a"), (2, "b"), (3, "c")))
    assert(StreamingCdc.applyCdcBatch(t, 1L, b1, Seq("k")))
    assert(state(t) == Set((1, "a"), (2, "b2"), (4, "d")))
    // replaying batch 0 against the MOVED base must not re-apply it —
    // the double-apply would resurrect deleted key 3 and stale 2→"b"
    assert(!StreamingCdc.applyCdcBatch(t, 0L, b0, Seq("k")),
      "replay committed")
    assert(state(t) == Set((1, "a"), (2, "b2"), (4, "d")),
      "replay mutated state")
    // every applied batch is a time-travel point
    assert(t.readVersion(0L).select(col("k"), col("v")).as[(Int, String)]
      .collect().toSet == Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("crash between claim and commit: the rerun completes the batch " +
    "from the same base (kill-and-rerun leaves identical state)") {
    val dir = tmpDir("graft-cdc-crash") + "/t"
    val t = new VersionedTable(spark, dir)
    StreamingCdc.applyCdcBatch(t, 0L, feed((1, "a", "I"), (2, "b", "I")),
      Seq("k"))
    // simulate the crash window: claim 1 exists, its data never landed
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(s"$dir/_claims/000001"), false).close()
    assert(t.latestVersion.contains(0L), "orphan claim must stay invisible")
    // the rerun (streaming replay) completes the orphan with real data
    val b1 = feed((2, "b2", "U"), (1, "x", "D"))
    assert(StreamingCdc.applyCdcBatch(t, 1L, b1, Seq("k")),
      "rerun must complete the orphan claim")
    assert(state(t) == Set((2, "b2")))
    // and a SECOND rerun of the same batch is a pure no-op
    assert(!StreamingCdc.applyCdcBatch(t, 1L, b1, Seq("k")))
    assert(state(t) == Set((2, "b2")))
  }

  test("latestPerKey compacts a sequenced feed to the newest change " +
    "per key") {
    val changes = Seq(
      (1, "a1", "I", 10L), (1, "a2", "U", 20L), (1, "a3", "U", 15L),
      (2, "b1", "I", 1L), (2, "b1", "D", 2L))
      .toDF("k", "v", "op", "seq")
    val got = StreamingCdc.latestPerKey(changes, Seq("k"), "seq")
      .select(col("k"), col("v"), col("op"), col("seq"))
      .as[(Int, String, String, Long)].collect().toSet
    assert(got == Set((1, "a2", "U", 20L), (2, "b1", "D", 2L)))
  }

  test("streamed changefeed ends in the same state as sequential batch " +
    "applyChanges, across a checkpoint restart") {
    val base = tmpDir("graft-cdc-stream")
    val feedDir = s"$base/feed"
    val tablePath = s"$base/table"
    val checkpoint = s"$base/ckpt"
    val batchTarget = s"$base/batch_target"

    val b0 = feed((1, "a", "I"), (2, "b", "I"), (3, "c", "I"), (4, "d", "I"))
    val b1 = feed((2, "b2", "U"), (3, "x", "D"), (5, "e", "I"))
    val b2 = feed((5, "e2", "U"), (1, "x", "D"))

    // run 1: only the first file exists
    b0.coalesce(1).write.mode("append").parquet(feedDir)
    StreamingCdc.applyChangesStream(spark, feedDir, tablePath, checkpoint,
      Seq("k"))
    // runs 2-3: a new file lands, the stream RESTARTS on the same
    // checkpoint and resumes from the next epoch
    b1.coalesce(1).write.mode("append").parquet(feedDir)
    StreamingCdc.applyChangesStream(spark, feedDir, tablePath, checkpoint,
      Seq("k"))
    b2.coalesce(1).write.mode("append").parquet(feedDir)
    StreamingCdc.applyChangesStream(spark, feedDir, tablePath, checkpoint,
      Seq("k"))

    for (b <- Seq(b0, b1, b2))
      Upsert.applyChanges(spark, batchTarget, b, Seq("k"),
        uniqueKeyTarget = true)

    val streamed = state(new VersionedTable(spark, tablePath))
    val batch = spark.read.parquet(batchTarget)
      .as[(Int, String)].collect().toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed == Set((2, "b2"), (4, "d"), (5, "e2")))
  }

  test("vacuumed cdc epochs stay committed: a checkpoint-reset replay " +
    "of a retired batch is a no-op, never a rebuilt wrong snapshot") {
    val t = new VersionedTable(spark, tmpDir("graft-cdc-vac") + "/t")
    StreamingCdc.applyCdcBatch(t, 0L, feed((1, "a", "I"), (2, "b", "I")),
      Seq("k"))
    StreamingCdc.applyCdcBatch(t, 1L, feed((2, "b2", "U")), Seq("k"))
    StreamingCdc.applyCdcBatch(t, 2L, feed((1, "x", "D")), Seq("k"))
    assert(t.vacuum(keepLast = 1) == Seq(0L, 1L))
    assert(t.vacuumedWatermark.contains(1L))
    // checkpoint reset: batches 0 and 1 replay from scratch — the
    // claim ledger for them is gone, only the watermark stands between
    // the replay and a rebuilt WRONG snapshot 0 (= just batch 0's
    // inserts, with batch 1's update then stacked on top of it)
    assert(!StreamingCdc.applyCdcBatch(t, 0L,
      feed((1, "a", "I"), (2, "b", "I")), Seq("k")), "retired batch re-applied")
    assert(!StreamingCdc.applyCdcBatch(t, 1L, feed((2, "b2", "U")),
      Seq("k")))
    assert(state(t) == Set((2, "b2")), "replay after vacuum mutated state")
    // the live epoch replays as the usual ledger no-op
    assert(!StreamingCdc.applyCdcBatch(t, 2L, feed((1, "x", "D")), Seq("k")))
    // and NEW epochs continue past the watermark
    assert(StreamingCdc.applyCdcBatch(t, 3L, feed((3, "c", "I")), Seq("k")))
    assert(state(t) == Set((2, "b2"), (3, "c")))
  }

  test("mode guards: cdc tables refuse readAll/compact/overwrite, " +
    "append tables refuse vacuum/compact, and vacuum retains cdc " +
    "snapshots correctly") {
    val cdc = new VersionedTable(spark, tmpDir("graft-cdc-mode") + "/t")
    StreamingCdc.applyCdcBatch(cdc, 0L, feed((1, "a", "I")), Seq("k"))
    StreamingCdc.applyCdcBatch(cdc, 1L, feed((2, "b", "I")), Seq("k"))
    assert(cdc.modeMarker.contains("cdc"))
    intercept[IllegalArgumentException](cdc.readAll())
    intercept[IllegalArgumentException](cdc.compact())
    intercept[IllegalArgumentException](cdc.overwrite(feed((9, "z", "I"))))
    // snapshot retention IS legal on a cdc table
    assert(cdc.vacuum(keepLast = 1) == Seq(0L))
    assert(state(cdc) == Set((1, "a"), (2, "b")))

    val app = new VersionedTable(spark, tmpDir("graft-app-mode") + "/t")
    app.commitBatch(0L, Seq(1).toDF("k"))
    assert(app.modeMarker.contains("append"))
    intercept[IllegalArgumentException](app.vacuum())
    intercept[IllegalArgumentException](app.compact())
    assert(app.readAll().count() == 1) // readAll stays legal

    val ow = new VersionedTable(spark, tmpDir("graft-ow-mode") + "/t")
    ow.overwrite(Seq(1).toDF("k"))
    assert(ow.modeMarker.contains("overwrite"))
    intercept[IllegalArgumentException](ow.commitBatch(1L, Seq(2).toDF("k")))
    intercept[IllegalArgumentException](ow.readAll())
  }
}
