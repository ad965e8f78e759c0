package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant coverage for every SparkEntry query on sf0.001.
  * Value-level correctness is the driver's DuckDB oracle (and
  * tools/check_oracle.py locally); here we pin row counts, schemas,
  * and the invariants of the non-oracle queries.
  */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("all queries run on sf0.001 and return the expected row counts, " +
    "and none leaves persisted blocks behind (cache hygiene)") {
    // baseline: tolerate blocks another suite of the shared session may
    // have legitimately pinned before this test ran
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val counts = SparkEntry.queries.map { case (name, fn) =>
      val c = fn(spark, dir).count()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- baseline
      assert(leaked.isEmpty,
        s"$name left ${leaked.size} persisted RDD(s) in the session " +
          "(operators must unpersist their intermediates — VERDICT r3 §wrong-1)")
      name -> c
    }
    assert(counts("q_p9_schema_only") == 0)
    counts.removed("q_p9_schema_only").foreach { case (n, c) =>
      assert(c > 0, s"$n returned no rows")
    }
    // joins preserve the left side 1:1 (dims keyed on distinct keys)
    assert(counts("q_j2_star_join") == counts("q_p4_div"))
    // null-split partitions the source exactly
    assert(counts("q_p7_scd_old") + counts("q_p8_scd_new") ==
      counts("q_s1_scan_project"))
  }

  test("q_f2_mid: surrogate keys unique and >= base (F2 invariants)") {
    val keys = SparkEntry.queries("q_f2_mid")(spark, dir)
      .select("surrogate_key").collect().map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    assert(keys.forall(_ >= 1L))
  }

  test("q_pipe_funnel: stage counts are monotone non-increasing and " +
    "bounded by the corpus") {
    val r = SparkEntry.queries("q_pipe_funnel")(spark, dir).head
    val (all, q, l, n) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(all >= q && q >= l && l >= n && n >= 0,
      s"funnel must only narrow: $all >= $q >= $l >= $n")
    assert(all == spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("q_d_cluster_hist counts isolated singleton clusters — corpus " +
    "size ≡ 1 (mod 10) leaves the tail chain-start in no pair") {
    // 11 docs: ids 0..10. Pairs chain 0..9; doc 10 appears in NO pair
    // (10 % 10 == 0 and doc 11 doesn't exist) — before the
    // isolated-node union, connectedComponents dropped it and the
    // histogram disagreed with the closed-form oracle at such sizes.
    val d = tmpDir("clusterhist")
    spark.range(11).select(col("id").as("doc_id"))
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q_d_cluster_hist")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 1L -> 1L),
      s"want one 10-chain and one singleton, got $got")
  }

  test("q_j3_upsert is idempotent across repeated execution") {
    val once = SparkEntry.queries("q_j3_upsert")(spark, dir)
      .agg(count(lit(1)), round(sum("p_retailprice"), 2)).head
    val twice = SparkEntry.queries("q_j3_upsert")(spark, dir)
      .agg(count(lit(1)), round(sum("p_retailprice"), 2)).head
    assert(once == twice)
  }

  test("binaryFile blob round trip preserves multi-byte UTF-8 content " +
    "(the gate corpus is ASCII; the lake's assets are not)") {
    // same write-then-read shape as q_s32_binary_ingest, on content
    // the synthetic corpus cannot exercise: CJK, emoji, combining marks
    val texts = Seq(0L -> "héllo wörld", 1L -> "数据湖摄取", 2L -> "🚀 é")
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_bing_spec_${graft.engine.Scratch.runToken}"
    val p = new org.apache.hadoop.fs.Path(scratch)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.mkdirs(p)
    texts.foreach { case (id, s) =>
      val out = fs.create(new org.apache.hadoop.fs.Path(p, f"doc_$id%08d.txt"), true)
      try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val got = spark.read.format("binaryFile").load(scratch)
      .select(
        regexp_extract(col("path"), raw"doc_(\d+)\.txt$$", 1)
          .cast("long").as("doc_id"),
        col("length"), md5(col("content")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val want = texts.map { case (id, s) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val m = java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
      (id, b.length.toLong, m)
    }
    assert(got.toSeq == want,
      s"binary round trip corrupted multi-byte content: $got vs $want")
  }
}
