package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.engine.{SkewJoin, Upsert}

class ScaleFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: identical result to plain join under heavy skew") {
    // 10k rows, 90% on one key — the classic hot-key shape
    val big = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id"))
        .as("k"), col("id").as("v"))
    val small = Seq((1L, "hot"), (20L, "a"), (30L, "b"), (31L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), saltBuckets = 8)
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin: left join keeps unmatched big-side rows exactly once") {
    val big = spark.range(100).select(col("id").as("k"), col("id").as("v"))
    val small = Seq((1L, "x")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, small, Seq("k"), 4, "left")
    assert(out.count() == 100)
    assert(out.filter(col("name").isNotNull).count() == 1)
  }

  test("adaptiveSaltedJoin ≡ plain join under skew, no hot keys, " +
    "all hot keys, nulls, and left semantics") {
    val big = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L))
        .otherwise(when(col("id") % 20 === 0, lit(null))
          .otherwise(col("id"))).as("k"),
        col("id").as("v"))
    val small = Seq((1L, "hot"), (20L, "a"), (30L, "b"), (31L, "c"))
      .toDF("k", "name")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] =
      df.select(coalesce(col("k"), lit(-1L)).as("k"), col("v"),
          coalesce(col("name"), lit("-")).as("name"))
        .as[(Long, Long, String)].collect().sorted.toSeq
    for (jt <- Seq("inner", "left")) {
      val plain = canon(big.join(small, Seq("k"), jt))
      // threshold isolates the 1L hot key
      assert(canon(SkewJoin.adaptiveSaltedJoin(
        big, small, "k", hotThreshold = 1000, saltBuckets = 8,
        joinType = jt)) == plain, s"skewed/$jt")
      // threshold above every count: no hot keys -> plain path
      assert(canon(SkewJoin.adaptiveSaltedJoin(
        big, small, "k", hotThreshold = 100000, joinType = jt))
        == plain, s"cold/$jt")
      // threshold of 1: every key is hot -> fully salted path
      assert(canon(SkewJoin.adaptiveSaltedJoin(
        big, small, "k", hotThreshold = 1, joinType = jt))
        == plain, s"allhot/$jt")
    }
    // the bounded hot-key collect refuses pathological thresholds
    val e = intercept[IllegalArgumentException] {
      SkewJoin.adaptiveSaltedJoin(big, small, "k", hotThreshold = 1,
        maxHotKeys = 3)
    }
    assert(e.getMessage.contains("repartition"))
    // unsupported join types are rejected up front, DATA-INDEPENDENTLY:
    // both the no-hot-keys early-return path and the hot path must
    // throw the same way (a right/full outer through the hot/cold
    // decomposition would duplicate unmatched small rows)
    for (thresh <- Seq(100000L, 1000L)) {
      val e2 = intercept[IllegalArgumentException] {
        SkewJoin.adaptiveSaltedJoin(big, small, "k",
          hotThreshold = thresh, joinType = "right")
      }
      assert(e2.getMessage.contains("left-preserving"),
        s"threshold $thresh must reject right join before running")
    }
  }

  test("mergePartitioned: rewrites only touched partitions, merges keys") {
    val path = tmpDir("pmerge") + "/t"
    val initial = Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0), (4L, "2024-01-03", 40.0))
      .toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, initial, Seq("k"), "dt")

    // record the untouched partition's file set
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(part: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/dt=$part"))
        .map(st => st.getPath.getName -> st.getModificationTime).toSet
    val before0103 = files("2024-01-03")

    // increment touches only 2024-01-01 (update k=2, insert k=9)
    val inc = Seq((2L, "2024-01-01", 99.0), (9L, "2024-01-01", 9.0))
      .toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, inc, Seq("k"), "dt")

    val got = spark.read.parquet(path)
      .select("k", "dt", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 99.0),
      (3L, "2024-01-02", 30.0), (4L, "2024-01-03", 40.0),
      (9L, "2024-01-01", 9.0)))
    // untouched partition files identical (not rewritten)
    assert(files("2024-01-03") == before0103)
    // scratch dirs (tmp write + stage-aside backup) fully cleaned up
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__delta_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__backup")))
  }

  test("mergePartitioned: a crashed commit's backup is restored on the next run") {
    val path = tmpDir("pmerge-crash") + "/t"
    val initial = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, initial, Seq("k"), "dt")
    // simulate a crash between phase 1 and phase 2: the 2024-01-01
    // partition was staged into the backup dir and the target lost it
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + "__backup")
    fs.mkdirs(backup)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(path + "/dt=2024-01-01"),
      new org.apache.hadoop.fs.Path(backup, "dt=2024-01-01")))
    // next merge (touching a DIFFERENT partition) must first recover it
    val inc = Seq((3L, "2024-01-03", 30.0)).toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, inc, Seq("k"), "dt")
    val got = spark.read.parquet(path)
      .select("k", "dt", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0),
      (3L, "2024-01-03", 30.0)))
    assert(!fs.exists(backup))

    // crash again, but the next increment touches the SAME partition:
    // recovery must run BEFORE the target read snapshots its file list,
    // or the restored partition's old rows are invisible to the merge
    fs.mkdirs(backup)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(path + "/dt=2024-01-01"),
      new org.apache.hadoop.fs.Path(backup, "dt=2024-01-01")))
    val inc2 = Seq((9L, "2024-01-01", 90.0)).toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, inc2, Seq("k"), "dt")
    val got2 = spark.read.parquet(path)
      .select("k", "dt", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0),
      (3L, "2024-01-03", 30.0), (9L, "2024-01-01", 90.0)))
  }

  test("merge: a replace that crashed between its renames is healed, " +
    "not treated as a new table") {
    val path = tmpDir("replace-crash") + "/t"
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").write.parquet(path)
    // simulate atomicReplace dying after dst→old, before tmp→dst
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
    // without recovery this merge would write the source AS the table
    Upsert.merge(spark, path, Seq((3L, 3.0)).toDF("k", "v"), Seq("k"))
    val got = spark.read.parquet(path).as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("mergePartitioned: null partition values don't drop existing rows") {
    val path = tmpDir("pmerge-null") + "/t"
    // target: two rows in the null partition, one in a real partition
    val initial = Seq(
      (1L, Option.empty[String], 10.0), (2L, None, 20.0),
      (3L, Some("2024-01-01"), 30.0)).toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, initial, Seq("k"), "dt")
    // increment touches ONLY the null partition: update k=2, insert k=9.
    // isin(parts) can't match null — without the explicit isNull arm,
    // k=1 would vanish when the null-partition dir is swapped.
    val inc = Seq((2L, Option.empty[String], 99.0), (9L, None, 9.0))
      .toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, inc, Seq("k"), "dt")
    val got = spark.read.parquet(path)
      .select("k", "dt", "v").as[(Long, Option[String], Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, None, 10.0), (2L, None, 99.0),
      (3L, Some("2024-01-01"), 30.0), (9L, None, 9.0)))
  }

  test("runtime bloom filter prunes the big side of a selective shuffle join") {
    // when the dim side is too big to broadcast but carries a selective
    // filter, Catalyst injects a bloom filter built from the dim keys
    // into the fact scan — at 100 TB this drops most fact rows BEFORE
    // the shuffle instead of after the join. Pin that the engine's
    // session shape actually triggers the injection.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_partkey", "l_quantity")
      val dim = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_size") === 1) // selective: bloom creation side
        .select("p_partkey", "p_name")
      val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      // and it computes the same rows as the un-filtered plan
      assert(joined.count() ==
        fact.join(dim.hint("broadcast"), fact("l_partkey") === dim("p_partkey")).count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("mergePartitioned aligns source columns case-insensitively, null-fills gaps") {
    val path = tmpDir("pmerge") + "/align"
    val initial = Seq((1L, "2024-01-01", 10.0, "a"), (2L, "2024-01-02", 20.0, "b"))
      .toDF("k", "dt", "v", "note")
    Upsert.mergePartitioned(spark, path, initial, Seq("k"), "dt")
    // source drifts: different case, `note` column missing entirely
    val inc = Seq((2L, "2024-01-02", 99.0)).toDF("K", "DT", "V")
    Upsert.mergePartitioned(spark, path, inc, Seq("k"), "dt")
    val got = spark.read.parquet(path)
      .select(col("k"), col("dt").cast("string"), col("v"), col("note"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        Option(r.getString(3)))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "2024-01-01", 10.0, Some("a")),
      (2L, "2024-01-02", 99.0, None)))
  }

  test("mergePartitioned: target scan is partition-pruned by the increment") {
    val path = tmpDir("pmerge") + "/scan"
    val initial = (1L to 100L).map(i => (i, s"2024-01-${i % 5 + 1}", i * 1.0))
      .toDF("k", "dt", "v")
    Upsert.mergePartitioned(spark, path, initial, Seq("k"), "dt")
    val inc = Seq((1L, "2024-01-2", 0.0)).toDF("k", "dt", "v")
    // reproduce the pruned read the merge performs and check the plan
    val target = spark.read.parquet(path)
    val p = target.filter(col("dt").isin("2024-01-2"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters: [isnotnull(dt"), s"no pruning:\n$p")
    Upsert.mergePartitioned(spark, path, inc, Seq("k"), "dt")
    assert(spark.read.parquet(path).count() == 100)
  }
}
