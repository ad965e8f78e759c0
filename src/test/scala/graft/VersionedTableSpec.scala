package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.engine.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def fs(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("needsCompaction: meter counts small files, trigger fires past " +
    "the cap, compact resets the meter") {
    val t = new VersionedTable(spark, tmpDir("vt") + "/t")
    assert(t.smallFileCount() == 0 && !t.needsCompaction(),
      "empty table must not demand maintenance")
    // 16 tiny files (every file is "small" at any sane threshold)
    t.overwrite(spark.range(0, 1600).toDF("k").repartition(16))
    assert(t.smallFileCount() == 16)
    assert(t.needsCompaction(maxSmallFiles = 8))
    assert(!t.needsCompaction(maxSmallFiles = 16),
      "cap is exclusive: 16 small files is within maxSmallFiles = 16")
    val before = t.read().as[Long].collect().toSet
    t.compact()
    assert(t.smallFileCount() <= 1, "compacted generation resets the meter")
    assert(!t.needsCompaction(maxSmallFiles = 8))
    assert(t.read().as[Long].collect().toSet == before,
      "maintenance must not change the data")
  }

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

  test("commitBatch under real thread contention: 100+ racing commits, " +
    "every batch claimed exactly once, reader sees no torn generation") {
    // round-10 VERDICT #8: the ownership-token protocol is proven
    // under a deterministic two-racer seam (RobustnessSpec); this is
    // the brute-force arm — 4 real threads × 26 batch ids, each
    // thread visiting the ids in a different order so every id sees
    // multi-writer contention at an uncontrolled interleaving.
    val t = new VersionedTable(spark, tmpDir("vt") + "/race")
    val threads = 4
    val batches = 26
    val wins = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Int)]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = (0 until threads).map { th =>
      new Thread(() => {
        try {
          start.await()
          // thread th visits ids rotated by its index — different
          // orders keep several writers on the SAME id at once
          (0 until batches).foreach { i =>
            val id = ((i * 7 + th * (batches / threads)) % batches).toLong
            val df = Seq((id, th)).toDF("batch", "writer")
            if (t.commitBatch(id, df)) wins.add((id, th)): Unit
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      })
    }
    pool.foreach(_.start()); start.countDown(); pool.foreach(_.join())
    assert(failures.isEmpty, s"racing commit threw: ${failures.peek()}")
    import scala.jdk.CollectionConverters._
    val byBatch = wins.asScala.groupBy(_._1)
    assert(byBatch.keySet == (0L until batches).toSet,
      s"every batch must be committed by someone: ${byBatch.keySet}")
    assert(byBatch.values.forall(_.size == 1),
      s"a batch reported two winners: ${byBatch.filter(_._2.size > 1)}")
    // the reader's view: one row per batch, and each row's writer is
    // EXACTLY the thread whose commit returned true — a torn
    // generation (loser data nested in a winner's dir) would surface
    // extra rows here
    val got = t.readAll().as[(Long, Int)].collect().toSet
    assert(got == wins.asScala.toSet,
      s"reader view != winner ledger:\n got=$got\n wins=${wins.asScala}")
  }

  test("commitBatch: replay of a committed batch is a no-op (exactly " +
    "once)") {
    val t = new VersionedTable(spark, tmpDir("vt") + "/t")
    assert(t.commitBatch(0L, Seq(1, 2).toDF("k")))
    assert(t.commitBatch(1L, Seq(3).toDF("k")))
    // foreachBatch replay after recovery re-offers batch 1
    assert(!t.commitBatch(1L, Seq(3).toDF("k")), "replay must not commit")
    assert(t.readAll().as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("commitBatch: an orphan claim (crash mid-commit) is COMPLETED by " +
    "the replay, not skipped") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    t.commitBatch(0L, Seq(1).toDF("k"))
    // crash simulation: batch 1 claimed but its data never landed
    fs(dir).create(new Path(dir, "_claims/000001"), false).close()
    assert(t.versions == Seq(0L), "orphan batch must be invisible")
    assert(t.commitBatch(1L, Seq(2).toDF("k")), "replay must complete it")
    assert(t.readAll().as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("appendStreamVersioned: stream-committed table equals the source " +
    "(exactly-once end to end)") {
    val src = tmpDir("vt-src")
    spark.range(50).toDF("id").repartition(4)
      .write.mode("overwrite").parquet(src)
    val tablePath = tmpDir("vt") + "/t"
    graft.streaming.EventStream.appendStreamVersioned(spark, src,
      tablePath, tmpDir("vt-ckpt"))
    val t = new VersionedTable(spark, tablePath)
    assert(t.readAll().as[Long].collect().sorted.toSeq == (0L until 50L))
  }

  test("vacuum with no committed version is a no-op (in-flight first " +
    "commit's claim survives); fresh staging survives, aged staging " +
    "is reaped") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    val f = fs(dir)
    // an in-flight writer: claim 0 exists, data not yet renamed in
    f.mkdirs(new Path(dir, "_claims"))
    f.create(new Path(dir, "_claims/000000"), false).close()
    f.mkdirs(new Path(dir, "_staging/live-writer"))
    assert(t.vacuum() == Seq.empty)
    assert(f.exists(new Path(dir, "_claims/000000")),
      "vacuum deleted an in-flight claim")
    assert(f.exists(new Path(dir, "_staging/live-writer")),
      "vacuum deleted fresh staging")
    // once something is committed, only AGED staging is reaped
    f.delete(new Path(dir, "_claims/000000"), false)
    t.overwrite(Seq(1).toDF("k"))
    t.vacuum(stagingOlderThanMs = 0L) // everything is "aged"
    assert(!f.exists(new Path(dir, "_staging/live-writer")))
  }

  test("overwriteIf: stale base aborts with None instead of committing " +
    "a lost update") {
    val t = new VersionedTable(spark, tmpDir("vt") + "/t")
    val v0 = t.overwrite(Seq(1).toDF("k"))
    val base = t.latestVersion
    val interleaved = t.overwrite(Seq(2).toDF("k")) // someone else lands
    assert(t.overwriteIf(Seq(3).toDF("k"), base).isEmpty,
      "stale RMW commit must abort")
    assert(t.latestVersion.contains(interleaved))
    // with the CURRENT base it commits
    assert(t.overwriteIf(Seq(3).toDF("k"), t.latestVersion)
      .contains(interleaved + 1))
    assert(Seq(v0).nonEmpty)
  }

  test("overwriteIf adopts an orphan claim (crashed RMW writer) instead " +
    "of wedging every future refresh") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    val v0 = t.overwrite(Seq(1).toDF("k"))
    // a refresh crashed between claim and rename: claim v0+1, no data
    fs(dir).create(new Path(dir, f"_claims/${v0 + 1}%06d"), false).close()
    val got = t.overwriteIf(Seq(2).toDF("k"), Some(v0))
    assert(got.contains(v0 + 1), s"orphan claim not adopted: $got")
    assert(t.read().as[Int].collect().toSeq == Seq(2))
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

  test("compactZOrdered: identical content, new generation, and each " +
    "file covers a NARROW slice of both cluster columns") {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val dir = tmpDir("vt") + "/tz"
    val t = new VersionedTable(spark, dir)
    // two correlated keys scattered across 16 files
    val rows = spark.range(4000)
      .select((col("id") % 977).as("a"), (col("id") % 997).as("b"))
      .repartition(16)
    val v0 = t.overwrite(rows)
    val v1 = t.compactZOrdered(Seq(col("a"), col("b")),
      targetFileBytes = 8L * 1024, bits = 12)
    assert(v1 == v0 + 1)
    // content-invisible
    assert(t.read().as[(Long, Long)].collect().sorted.toSeq ==
      rows.as[(Long, Long)].collect().sorted.toSeq)
    // layout: multiple files, and the AVERAGE per-file span of each
    // cluster column is a small fraction of the global range
    val perFile = t.read()
      .groupBy(input_file_name().as("f"))
      .agg(min(col("a")).as("alo"), max(col("a")).as("ahi"),
        min(col("b")).as("blo"), max(col("b")).as("bhi"))
      .collect()
    assert(perFile.length > 2, s"expected several files, got ${perFile.length}")
    val avgSpanA = perFile.map(r => r.getLong(2) - r.getLong(1)).sum
      .toDouble / perFile.length
    val avgSpanB = perFile.map(r => r.getLong(4) - r.getLong(3)).sum
      .toDouble / perFile.length
    assert(avgSpanA < 977 * 0.7, s"a not clustered: avg span $avgSpanA")
    assert(avgSpanB < 997 * 0.7, s"b not clustered: avg span $avgSpanB")
  }

  test("compactAppend: squash preserves the union, shrinks the ledger, " +
    "retires folded batch ids, and later appends continue") {
    val dir = tmpDir("vt-sq") + "/t"
    val t = new VersionedTable(spark, dir)
    (0 to 3).foreach(i => assert(t.commitBatch(i.toLong,
      Seq((i, s"row$i")).toDF("k", "v"))))
    val before = t.readAll().as[(Int, String)].collect().toSet
    val filesBefore = fs(dir).listStatus(new Path(dir, "_gen")).length
    assert(t.compactAppend(3L) == 3L)
    assert(t.versions == Seq(3L), s"only the squash survives: ${t.versions}")
    assert(t.readAll().as[(Int, String)].collect().toSet == before)
    assert(fs(dir).listStatus(new Path(dir, "_gen")).length < filesBefore)
    // folded batches are retired: a checkpoint-reset replay is a no-op
    assert(!t.commitBatch(1L, Seq((99, "ghost")).toDF("k", "v")))
    assert(t.readAll().as[(Int, String)].collect().toSet == before)
    // the stream continues above the squash
    assert(t.commitBatch(4L, Seq((4, "row4")).toDF("k", "v")))
    assert(t.readAll().count() == 5)
    // readThrough at/above the squash still answers; below fails loudly
    assert(t.readThrough(3L).count() == 4)
    intercept[IllegalArgumentException](t.readThrough(1L))
  }

  test("compactAppend with a keep filter drops retired rows from the " +
    "squash") {
    val t = new VersionedTable(spark, tmpDir("vt-sqk") + "/t")
    (0 to 2).foreach(i => t.commitBatch(i.toLong,
      Seq((i, s"row$i")).toDF("k", "v")))
    t.compactAppend(2L, keep = Some(df => df.filter(col("k") =!= 1)))
    assert(t.readAll().as[(Int, String)].collect().toSet ==
      Set((0, "row0"), (2, "row2")))
  }

  test("recoverCompaction completes every crash state of a squash") {
    import org.apache.hadoop.fs.Path
    // S2: crashed between the two renames — .new built, live gen moved
    // aside to .old, squash not yet published
    val d2 = tmpDir("vt-rc2") + "/t"
    val t2 = new VersionedTable(spark, d2)
    (0 to 2).foreach(i => t2.commitBatch(i.toLong, Seq(i).toDF("k")))
    val f2 = fs(d2)
    val gen2 = new Path(d2, "_gen/000002")
    t2.readThrough(2L).coalesce(1).write.parquet(d2 + "/_gen/000002.new")
    assert(f2.rename(gen2, new Path(d2, "_gen/000002.old")))
    t2.recoverCompaction()
    assert(t2.versions == Seq(2L), s"S2 recovery: ${t2.versions}")
    assert(t2.readAll().as[Int].collect().toSet == Set(0, 1, 2))
    assert(!f2.exists(new Path(d2, "_gen/000002.old")))
    assert(!t2.commitBatch(0L, Seq(99).toDF("k")), "folded batch retired")

    // S3: crashed after publish, before cleanup — squash live, .old and
    // the folded generations still on disk. The watermark hasn't
    // advanced yet, so versions would double-count without recovery.
    val d3 = tmpDir("vt-rc3") + "/t"
    val t3 = new VersionedTable(spark, d3)
    (0 to 2).foreach(i => t3.commitBatch(i.toLong, Seq(i).toDF("k")))
    val f3 = fs(d3)
    val gen3 = new Path(d3, "_gen/000002")
    t3.readThrough(2L).coalesce(1).write.parquet(d3 + "/_gen/000002.tmp")
    assert(f3.rename(gen3, new Path(d3, "_gen/000002.old")))
    assert(f3.rename(new Path(d3, "_gen/000002.tmp"), gen3))
    t3.recoverCompaction()
    assert(t3.versions == Seq(2L), s"S3 recovery: ${t3.versions}")
    assert(t3.readAll().as[Int].collect().toSet == Set(0, 1, 2))
    assert(!f3.exists(new Path(d3, "_gen/000000")), "folded gens dropped")

    // S1: crashed right after building .new — nothing moved; the squash
    // is rebuildable and must simply be discarded
    val d1 = tmpDir("vt-rc1") + "/t"
    val t1 = new VersionedTable(spark, d1)
    (0 to 1).foreach(i => t1.commitBatch(i.toLong, Seq(i).toDF("k")))
    t1.readThrough(1L).coalesce(1).write.parquet(d1 + "/_gen/000001.new")
    t1.recoverCompaction()
    assert(!fs(d1).exists(new Path(d1, "_gen/000001.new")))
    assert(t1.versions == Seq(0L, 1L), "S1 recovery must not retire anything")
    assert(t1.readAll().as[Int].collect().toSet == Set(0, 1))
  }

  test("restore: metadata-only redirect — content, history, latest all " +
    "correct; no data copy") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    val v0 = t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val v1 = t.overwrite(Seq((9, "bad")).toDF("k", "v"))
    val v2 = t.restore(v0)
    assert(v2 > v1)
    assert(t.latestVersion.contains(v2))
    // latest content IS v0's content
    assert(t.read().as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    // the bad version stays readable for forensics
    assert(t.readVersion(v1).as[(Int, String)].collect().toSet ==
      Set((9, "bad")))
    // metadata-only: the restored generation is a FILE, and resolves
    // to v0's data directory
    val gen2 = new Path(dir, f"_gen/$v2%06d")
    assert(!fs(dir).getFileStatus(gen2).isDirectory)
    assert(t.resolveVersion(v2) == v0)
    // restore of a restore resolves — never a redirect chain
    val v3 = t.overwrite(Seq((0, "x")).toDF("k", "v"))
    val v4 = t.restore(v2)
    assert(t.resolveVersion(v4) == v0 && v4 > v3)
    assert(t.read().as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    // a further overwrite moves latest forward normally
    val v5 = t.overwrite(Seq((7, "z")).toDF("k", "v"))
    assert(t.read().as[(Int, String)].collect().toSet == Set((7, "z")))
    assert(t.versions == Seq(v0, v1, v2, v3, v4, v5))
  }

  test("vacuum protects a kept restore's target, then retires it once " +
    "the redirect itself is gone") {
    val dir = tmpDir("vt") + "/t"
    val t = new VersionedTable(spark, dir)
    val v0 = t.overwrite(Seq(10).toDF("k"))
    val v1 = t.overwrite(Seq(11).toDF("k"))
    val v2 = t.overwrite(Seq(12).toDF("k"))
    val v3 = t.restore(v0)
    // keep only the restore: v0 must survive (its data backs v3);
    // v1 and v2 retire
    val dropped = t.vacuum(keepLast = 1)
    assert(dropped.toSet == Set(v1, v2))
    assert(t.read().as[Int].head() == 10)
    assert(t.versions == Seq(v0, v3))
    // compaction through a redirect latest works and materializes
    val v4 = t.compact()
    assert(t.read().as[Int].head() == 10)
    // now nothing points at v0 or the redirect — both retire
    val dropped2 = t.vacuum(keepLast = 1)
    assert(dropped2.toSet == Set(v0, v3))
    assert(t.versions == Seq(v4))
    assert(t.read().as[Int].head() == 10)
  }

  test("restore refuses uncommitted versions and non-overwrite modes") {
    val t = new VersionedTable(spark, tmpDir("vt") + "/t")
    t.overwrite(Seq(1).toDF("k"))
    intercept[IllegalArgumentException](t.restore(99L))
    val ap = new VersionedTable(spark, tmpDir("vt") + "/ap")
    ap.commitBatch(0L, Seq(1).toDF("k"))
    intercept[IllegalArgumentException](ap.restore(0L))
  }
}
