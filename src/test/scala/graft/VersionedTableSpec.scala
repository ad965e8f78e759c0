package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.engine.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def fs(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("commit / snapshot read / time travel") {
    val t = new VersionedTable(spark, tmpDir("vt") + "/t")
    assert(!t.exists)
    val v0 = t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val v1 = t.overwrite(Seq((3, "c")).toDF("k", "v"))
    assert(v1 > v0)
    assert(t.latestVersion.contains(v1))
    assert(t.read().as[(Int, String)].collect().toSet == Set((3, "c")))
    // time travel: v0 unchanged after the overwrite
    assert(t.readVersion(v0).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    assert(t.versions == Seq(v0, v1))
  }

  test("a resolved snapshot survives a concurrent overwrite (isolation)") {
    val t = new VersionedTable(spark, tmpDir("vt") + "/t")
    t.overwrite(spark.range(100).toDF("id"))
    val snapshot = t.read() // resolves the gen dir NOW
    t.overwrite(spark.range(5).toDF("id"))
    // the old reader still sees its full version — no mid-swap window
    assert(snapshot.count() == 100)
    assert(t.read().count() == 5)
  }

  test("orphan claim (crash between claim and rename) is skipped by " +
    "readers and stepped over by writers") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    val v0 = t.overwrite(Seq(1).toDF("k"))
    // simulate a writer that claimed v0+1 then died before the rename
    val f = fs(dir)
    f.create(new Path(dir, f"_claims/${v0 + 1}%06d"), false).close()
    assert(t.latestVersion.contains(v0), "orphan claim must be invisible")
    // next commit steps over the orphan
    val v2 = t.overwrite(Seq(2).toDF("k"))
    assert(v2 == v0 + 2)
    assert(t.read().as[Int].collect().toSeq == Seq(2))
  }

  test("claim collision: pre-taken number forces the next one (no lost " +
    "update)") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    val v0 = t.overwrite(Seq(1).toDF("k"))
    val contender = new VersionedTable(spark, dir)
    val v1 = contender.overwrite(Seq(2).toDF("k"))
    val v2 = t.overwrite(Seq(3).toDF("k"))
    assert(Seq(v0, v1, v2) == Seq(v0, v0 + 1, v0 + 2))
    assert(t.versions.size == 3, "every commit kept — nothing lost")
  }

  test("vacuum keeps the newest N, drops older gens and claims") {
    val t = new VersionedTable(spark, tmpDir("vt") + "/t")
    val vs = (1 to 4).map(i => t.overwrite(Seq(i).toDF("k")))
    val dropped = t.vacuum(keepLast = 2)
    assert(dropped == vs.take(2))
    assert(t.versions == vs.drop(2))
    assert(t.read().as[Int].head() == 4)
    intercept[IllegalArgumentException](t.readVersion(vs.head))
  }

  test("compact: fewer files, identical content, old version intact") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    val v0 = t.overwrite(spark.range(1000).toDF("id").repartition(16))
    val files0 = fs(dir).listStatus(new Path(dir, f"_gen/$v0%06d"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(files0 == 16)
    val v1 = t.compact(targetFileBytes = 1L << 30)
    val files1 = fs(dir).listStatus(new Path(dir, f"_gen/$v1%06d"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(files1 == 1, s"expected 1 compacted file, got $files1")
    assert(t.read().as[Long].collect().sorted.toSeq == (0L until 1000L))
    // compaction is a new generation — time travel to pre-compaction works
    assert(t.readVersion(v0).count() == 1000)
  }
}
