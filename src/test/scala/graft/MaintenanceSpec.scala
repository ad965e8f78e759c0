package graft

import org.apache.spark.sql.functions._
import graft.engine.VersionedTable
import graft.operators.{DataQuality, IncrementalAgg}
import graft.operators.IncrementalAgg.AggSpec

/** Incremental aggregate maintenance + data-quality expectations. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val specs = Seq(
    AggSpec("count", "1", "n"),
    AggSpec("sum", "v", "sv"),
    AggSpec("min", "v", "mn"),
    AggSpec("max", "v", "mx"))

  test("incremental fold over arbitrary batch boundaries equals the " +
    "one-shot aggregate") {
    val data = (1 to 300).map(i => (s"k${i % 7}", i.toLong))
    val df = data.toDF("k", "v")
    val oneShot = IncrementalAgg.aggregate(df, Seq("k"), specs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val tbl = new VersionedTable(spark, tmpDir("inc") + "/t")
    // three uneven batches, one of which introduces brand-new keys
    Seq(df.filter(col("v") <= 100), df.filter(col("v").between(101, 110)),
      df.filter(col("v") > 110)).foreach(b =>
      IncrementalAgg.update(tbl, b, Seq("k"), specs))
    val inc = tbl.read().collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(inc == oneShot)
    // three refreshes = three atomic versions (each rollback-able)
    assert(tbl.versions.length == 3)
  }

  test("retractable MV: deletes, value updates, key-moving updates, " +
    "group drops, and the all-null-sum edge all match a full recompute") {
    import graft.engine.Upsert
    val rSpecs = Seq(AggSpec("count", "1", "n"), AggSpec("sum", "v", "sv"))
    val before = Seq(
      ("g1", 1L, Some(10L)), ("g1", 2L, Some(20L)), ("g2", 3L, Some(30L)),
      ("g3", 4L, Some(40L)), ("g4", 5L, None), ("g4", 6L, Some(60L))
    ).map { case (g, id, v) => (g, id, v.map(Long.box).orNull) }
      .toDF("g", "id", "v")
    val after = Seq(
      ("g1", 1L, Some(11L)),  // value update
      ("g2", 2L, Some(20L)),  // key-moving update g1 -> g2
      ("g2", 3L, Some(30L)),  // untouched
      // g3 dropped entirely (delete of its only row)
      ("g4", 5L, None),       // g4's only NON-NULL value deleted:
      // sum must read NULL, not 0 — the __nn counter edge
      ("g5", 7L, Some(70L))   // brand-new group
    ).map { case (g, id, v) => (g, id, v.map(Long.box).orNull) }
      .toDF("g", "id", "v")
    val tbl = new VersionedTable(spark, tmpDir("mv-retract") + "/t")
    IncrementalAgg.initialize(tbl, before, Seq("g"), rSpecs)
    IncrementalAgg.updateFromChanges(tbl,
      Upsert.retractStream(before, after, Seq("id")), Seq("g"), rSpecs)
    val got = IncrementalAgg.readView(tbl.read(), Seq("g"), rSpecs)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    val want = after.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(got == want, s"got=$got want=$want")
    assert(!got.contains("g3"), "fully-deleted group must vanish")
    assert(got("g4") == ((1L, None)), "all-null sum must read NULL")
    // the retract path must refuse non-retractable specs loudly
    intercept[IllegalArgumentException](
      IncrementalAgg.retractDelta(
        Upsert.retractStream(before, after, Seq("id")),
        Seq("g"), Seq(AggSpec("min", "v", "m"))))
  }

  test("updateDirtyGroups re-derives exactly the touched groups and " +
    "matches a full recompute (min/max under deletes)") {
    import graft.engine.Upsert
    val before = Seq(("g1", 1L, 10L), ("g1", 2L, 20L), ("g2", 3L, 30L),
      ("g3", 4L, 40L)).toDF("g", "id", "v")
    // delete the max of g1 (min/max must re-derive, not keep 20),
    // drop g3 entirely, leave g2 untouched
    val after = Seq(("g1", 1L, 10L), ("g2", 3L, 30L)).toDF("g", "id", "v")
    val tbl = new VersionedTable(spark, tmpDir("mv-dirty") + "/t")
    IncrementalAgg.update(tbl, before, Seq("g"), specs)
    IncrementalAgg.updateDirtyGroups(tbl, after,
      Upsert.retractStream(before, after, Seq("id")), Seq("g"), specs)
    val got = tbl.read().collect().map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = IncrementalAgg.aggregate(after, Seq("g"), specs)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"got=$got want=$want")
    assert(!got.contains("g3"))
  }

  test("streamed MV maintenance equals batch maintenance across a " +
    "checkpoint restart, and a replayed epoch is a no-op") {
    import graft.engine.Upsert
    val rSpecs = Seq(AggSpec("count", "1", "n"), AggSpec("sum", "v", "sv"))
    val base = tmpDir("mv-stream")
    val feedDir = s"$base/feed"
    val mvPath = s"$base/mv"
    val checkpoint = s"$base/ckpt"
    val s0 = Seq(("g1", 1L, 10L), ("g1", 2L, 20L), ("g2", 3L, 30L))
      .toDF("g", "id", "v")
    val s1 = Seq(("g1", 1L, 11L), ("g2", 3L, 30L), ("g3", 4L, 40L))
      .toDF("g", "id", "v")
    val s2 = Seq(("g2", 3L, 30L), ("g3", 4L, 41L)).toDF("g", "id", "v")
    val empty = s0.filter(lit(false))
    // three retract batches land as three stream epochs, with a
    // restart between each (the checkpoint resumes the epoch sequence)
    for ((b, a) <- Seq((empty, s0), (s0, s1), (s1, s2))) {
      Upsert.retractStream(b, a, Seq("id"))
        .coalesce(1).write.mode("append").parquet(feedDir)
      IncrementalAgg.maintainStream(spark, feedDir, mvPath, checkpoint,
        Seq("g"), rSpecs)
    }
    val tbl = new VersionedTable(spark, mvPath)
    def view = IncrementalAgg.readView(tbl.read(), Seq("g"), rSpecs)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val want = s2.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(view == want, s"got=$view want=$want")
    // replay of a committed epoch: claim ledger skips, state unchanged
    val versionsBefore = tbl.versions
    assert(!IncrementalAgg.applyMvBatch(tbl, versionsBefore.last,
      Upsert.retractStream(s1, s2, Seq("id")), Seq("g"), rSpecs))
    assert(tbl.versions == versionsBefore)
    assert(view == want)
    // every epoch is a time-travel point of the view's history
    assert(IncrementalAgg.readView(tbl.readVersion(versionsBefore.head),
      Seq("g"), rSpecs).collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap ==
      s0.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        .toMap)
  }

  test("retractStream: I/U/D weights reconstruct the after snapshot " +
    "when applied to before") {
    import graft.engine.Upsert
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "s", "v")
    val after = Seq((1L, "a", 10L), (2L, "B", 21L), (4L, "d", 40L))
      .toDF("id", "s", "v")
    val rs = Upsert.retractStream(before, after, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    // unchanged row 1 produces NO traffic; update = retract+insert
    assert(rs == Set(
      (2L, "b", 20L, -1), (2L, "B", 21L, 1),
      (3L, "c", 30L, -1), (4L, "d", 40L, 1)))
  }

  test("empty batch is a no-op on values (still a committed version)") {
    val tbl = new VersionedTable(spark, tmpDir("inc") + "/t")
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    IncrementalAgg.update(tbl, df, Seq("k"), specs)
    IncrementalAgg.update(tbl, df.filter(col("v") < 0), Seq("k"), specs)
    val got = tbl.read().orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 1L), ("b", 1L, 2L)))
  }

  test("non-distributive aggregates are rejected at construction") {
    intercept[IllegalArgumentException](AggSpec("avg", "v", "a"))
  }

  test("concurrent refresh: the losing commit retries against the new " +
    "base — no delta is lost") {
    val tbl = new VersionedTable(spark, tmpDir("inc") + "/t")
    IncrementalAgg.update(tbl, Seq(("a", 1L)).toDF("k", "v"),
      Seq("k"), specs)
    // simulate an interleaved refresh: another writer claims the next
    // version while "our" update would be mid-merge — our update must
    // observe it and fold on top, not overwrite it
    val other = new VersionedTable(spark, tbl.basePath)
    IncrementalAgg.update(other, Seq(("a", 10L)).toDF("k", "v"),
      Seq("k"), specs)
    IncrementalAgg.update(tbl, Seq(("a", 100L)).toDF("k", "v"),
      Seq("k"), specs)
    val row = tbl.read().collect().head
    // all three deltas present: n=3, sum=111
    assert(row.getLong(1) == 3L && row.getLong(2) == 111L,
      s"lost update: $row")
  }

  test("rule names with quotes are rejected, not interpolated") {
    val df = Seq((1, 2)).toDF("id", "v")
    intercept[IllegalArgumentException](
      DataQuality.check(df, Seq(DataQuality.rule("bad'name", "v > 0"))))
  }

  test("data-quality check counts violations per rule in one result; " +
    "null conditions count as violations") {
    val df = Seq((1, Some(5)), (2, Some(-1)), (3, None))
      .toDF("id", "v")
    val got = DataQuality.check(df, Seq(
      DataQuality.rule("v_pos", "v > 0"),
      DataQuality.rule("id_pos", "id > 0")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // v > 0: row 2 false, row 3 NULL → both violations
    assert(got("v_pos") == ((2L, 3L)))
    assert(got("id_pos") == ((0L, 3L)))
  }

  test("enforce: passes on clean rules, throws naming the dirty one") {
    val df = Seq((1, 5), (2, 7)).toDF("id", "v")
    DataQuality.enforce(df, Seq(DataQuality.rule("v_pos", "v > 0")))
    val e = intercept[IllegalStateException](
      DataQuality.enforce(df, Seq(DataQuality.rule("v_big", "v > 6"))))
    assert(e.getMessage.contains("v_big"))
  }

  test("profile: exact per-column nulls/distinct/min/max from one pass; " +
    "native-type ordering (not string ordering) for numeric min/max") {
    val df = Seq(
      (Some(100L), Some("b")), (Some(2L), Some("a")),
      (Some(2L), None), (None, Some("a")))
      .toDF("k", "s")
    val got = DataQuality.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getLong(5)))).toMap
    // numeric min/max: 2 < 100 numerically ("100" < "2" as strings —
    // the profiler must aggregate BEFORE the string render)
    assert(got("k") == ((1L, 2L, "2", "100", 4L)), s"k: ${got("k")}")
    assert(got("s") == ((1L, 2L, "a", "b", 4L)), s"s: ${got("s")}")
  }

  test("profile: rejects non-identifier column names; approxDistinct " +
    "still reports exact null/min/max") {
    val df = Seq((1, 2)).toDF("id", "v")
    intercept[IllegalArgumentException](
      DataQuality.profile(df, Seq("id; drop")))
    val r = DataQuality.profile(df, Seq("id"), approxDistinct = true)
      .collect().head
    assert(r.getLong(1) == 0L && r.getString(3) == "1" &&
      r.getString(4) == "1" && r.getLong(5) == 1L)
  }
}
