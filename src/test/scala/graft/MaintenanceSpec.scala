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
}
