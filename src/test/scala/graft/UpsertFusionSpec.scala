package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Ivf}

/** Round-16 optimization pin: the fused upsert (one maintenance pass)
  * must produce the IDENTICAL index state as the sequential
  * delete-then-append it replaced in the streaming CDC path — on both
  * engines, on both delete forms (isin predicate / distributed id
  * relation), including the tombstone-only and brand-new-ids edges.
  */
class UpsertFusionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  // a CDC epoch: updates (negated vectors for %7 ids), inserts (+5000
  // ids), and tombstones (%11 ids, delete-only — in the delete set but
  // not in the delta)
  private lazy val updates = emb.filter(col("vec_id") % 7 === 0)
    .select(col("vec_id"),
      transform(col("embedding"), x => (-x).cast("float")).as("embedding"),
      col("label"))
  private lazy val inserts = emb.filter(col("vec_id") % 13 === 1)
    .select((col("vec_id") + 5000L).as("vec_id"),
      reverse(col("embedding")).as("embedding"), col("label"))
  private lazy val delta = updates.unionByName(inserts)
  private lazy val tombstoneIds = emb.filter(col("vec_id") % 11 === 0)
    .select(col("vec_id"))
  private lazy val touched =
    delta.select(col("vec_id")).unionByName(tombstoneIds).distinct()
  private lazy val touchedSeq = touched.as[Long].collect().toIndexedSeq

  private def ivfState(path: String) =
    spark.read.parquet(s"$path/corpus").collect().map(_.toSeq).toSet

  private def hnswState(path: String) =
    spark.read.parquet(s"$path/graph").collect().map(_.toSeq).toSet

  test("IVF: fused upsert == sequential delete-then-append (both " +
    "delete forms), same rows, same _ROWS meter") {
    val m = Ivf.train(emb, k = 4, iters = 2)
    val (pSeq, pFusedA, pFusedB) =
      (tmpDir("uf-ivf-seq"), tmpDir("uf-ivf-fa"), tmpDir("uf-ivf-fb"))
    Seq(pSeq, pFusedA, pFusedB).foreach(Ivf.writeIndex(emb, m, _))
    val nSeq =
      Ivf.deleteFromIndex(spark, pSeq, col("vec_id").isin(touchedSeq: _*))
    Ivf.appendToIndex(delta, pSeq)
    val nA = Ivf.upsertToIndex(spark, pFusedA,
      col("vec_id").isin(touchedSeq: _*), delta)
    val nB = Ivf.upsertIdsToIndex(spark, pFusedB, touched, delta)
    assert(nA == nSeq && nB == nSeq, "deleted-row counts diverged")
    assert(ivfState(pFusedA) == ivfState(pSeq), "isin-form state diverged")
    assert(ivfState(pFusedB) == ivfState(pSeq), "ids-form state diverged")
    assert(Ivf.indexRowCount(spark, pFusedA) ==
      Ivf.indexRowCount(spark, pSeq))
    assert(Ivf.indexRowCount(spark, pFusedB) ==
      Ivf.indexRowCount(spark, pSeq))
  }

  test("IVF: fused upsert edges — tombstone-only epoch equals plain " +
    "delete; brand-new-ids epoch equals plain append") {
    val m = Ivf.train(emb, k = 4, iters = 2)
    val (pDel, pUps) = (tmpDir("uf-ivf-d"), tmpDir("uf-ivf-du"))
    Seq(pDel, pUps).foreach(Ivf.writeIndex(emb, m, _))
    val empty = delta.limit(0)
    Ivf.deleteFromIndex(spark, pDel, col("vec_id").isin(touchedSeq: _*))
    Ivf.upsertToIndex(spark, pUps, col("vec_id").isin(touchedSeq: _*),
      empty)
    assert(ivfState(pUps) == ivfState(pDel), "tombstone-only diverged")
    val (pApp, pAu) = (tmpDir("uf-ivf-a"), tmpDir("uf-ivf-au"))
    Seq(pApp, pAu).foreach(Ivf.writeIndex(emb, m, _))
    Ivf.appendToIndex(inserts, pApp)
    // the fused form still names the delta's ids as touched — none
    // exist in the index, so the delete half must be a no-op
    val n = Ivf.upsertIdsToIndex(spark, pAu,
      inserts.select(col("vec_id")), inserts)
    assert(n == 0L, "new ids must delete nothing")
    assert(ivfState(pAu) == ivfState(pApp), "brand-new-ids diverged")
  }

  test("HNSW (attr-carrying): fused upsert == sequential " +
    "delete-then-append (both delete forms), graph rows identical") {
    val src = "/root/testdata/sf0.001/embeddings.parquet"
    val (pSeq, pFusedA, pFusedB) =
      (tmpDir("uf-h-seq"), tmpDir("uf-h-fa"), tmpDir("uf-h-fb"))
    Seq(pSeq, pFusedA, pFusedB).foreach(p =>
      Hnsw.ensureIndex(emb, src, p, shards = 4, m = 8, efC = 32,
        attrCols = Seq("label")))
    val nSeq =
      Hnsw.deleteFromIndex(spark, pSeq, col("vec_id").isin(touchedSeq: _*))
    Hnsw.appendToIndex(delta, pSeq)
    val nA = Hnsw.upsertToIndex(spark, pFusedA,
      col("vec_id").isin(touchedSeq: _*), delta)
    val nB = Hnsw.upsertIdsToIndex(spark, pFusedB, touched, delta)
    assert(nA == nSeq && nB == nSeq, "deleted-row counts diverged")
    assert(hnswState(pFusedA) == hnswState(pSeq), "isin-form diverged")
    assert(hnswState(pFusedB) == hnswState(pSeq), "ids-form diverged")
    assert(Ivf.readCountFile(spark, s"$pFusedA/_ROWS") ==
      Ivf.readCountFile(spark, s"$pSeq/_ROWS"))
  }

  test("HNSW: untouched shards keep byte-identical files through a " +
    "fused upsert (swap never lists them)") {
    val src = "/root/testdata/sf0.001/embeddings.parquet"
    val p = tmpDir("uf-h-untouched")
    Hnsw.ensureIndex(emb, src, p, shards = 4, m = 8, efC = 32)
    // ids of exactly one shard: everything else must stay untouched
    val oneShard = spark.read.parquet(s"$p/graph")
      .filter(col("cluster") === 0).select(col("vec_id"))
    val before = fileStamps(s"$p/graph")
    Hnsw.upsertIdsToIndex(spark, p, oneShard, oneShard.limit(0)
      .join(emb, Seq("vec_id")).select(emb.columns.map(col): _*))
    val after = fileStamps(s"$p/graph")
    val untouchedBefore = before.filterNot(_._1.contains("cluster=0"))
    val untouchedAfter = after.filterNot(_._1.contains("cluster=0"))
    assert(untouchedBefore == untouchedAfter,
      "untouched shard files changed (path/len/mtime)")
    assert(!after.keys.exists(_.contains("cluster=0")),
      "an all-deleted shard must drop its dir entirely")
  }

  private def fileStamps(dir: String): Map[String, (Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        out(f.getPath.toString) = (f.getLen, f.getModificationTime)
    }
    out.toMap
  }
}
