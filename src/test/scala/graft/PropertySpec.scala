package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.{DimSpec, ScdType1, TableCatalog, Upsert}

/** Property-based invariants (SURVEY §5.2): upsert idempotence and
  * conservation, SCD1 key uniqueness/stability — driven by ScalaCheck
  * generators sampled over fixed seeds (no scalatest-plus bridge in
  * the offline cache, so sampling is explicit).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(30),
      Seed(42L + i)))

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOf(for {
      k <- Gen.choose(0L, 30L)
      name <- Gen.alphaStr.map(_.take(8))
      v <- Gen.choose(-1e6, 1e6)
    } yield (k, name, v))

  test("upsert: idempotent, conserves key set, source wins (5 random cases)") {
    val cases = samples(Gen.zip(rowsGen, rowsGen, Gen.choose(1, 8)), 5)
    cases.foreach { case (tgt, src, parts) =>
      val path = tmpDir("prop") + "/t"
      val tgtDf = tgt.toDF("k", "name", "v")
        .dropDuplicates("k").repartition(parts)
      val srcDf = src.toDF("k", "name", "v")
        .dropDuplicates("k").repartition(parts)
      tgtDf.write.parquet(path)
      Upsert.merge(spark, path, srcDf, Seq("k"))
      val once = spark.read.parquet(path)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      Upsert.merge(spark, path, srcDf, Seq("k"))
      val twice = spark.read.parquet(path)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(once == twice, s"not idempotent for tgt=$tgt src=$src")
      val tgtK = tgtDf.select("k").as[Long].collect().toSet
      val srcK = srcDf.select("k").as[Long].collect().toSet
      assert(once.map(_._1).toSet == tgtK.union(srcK), "key set not conserved")
      val srcRows = srcDf.as[(Long, String, Double)].collect()
        .map(r => r._1 -> r).toMap
      once.filter(r => srcK.contains(r._1)).foreach { r =>
        assert(r == srcRows(r._1), "source did not win")
      }
    }
  }

  test("scd1: surrogate keys unique and stable across random increments (5 cases)") {
    val entityGen = Gen.nonEmptyListOf(for {
      id <- Gen.choose(0, 40)
      attr <- Gen.oneOf("red", "green", "blue")
    } yield (s"E$id", attr))
    val cases = samples(Gen.zip(entityGen, entityGen, Gen.choose(1, 6)), 5)
    cases.foreach { case (init, inc, parts) =>
      val catalog = TableCatalog(spark, tmpDir("prop-scd"))
      val scd = new ScdType1(spark, catalog)
      val spec = DimSpec("gold.d", Seq("eid"), Seq.empty, "d_key")
      val silver0 = init.toDF("eid", "attr")
        .dropDuplicates("eid").repartition(parts)
      val d0 = scd.build(spec, silver0, incremental = false).collect()
      val keys0 = d0.map(r => r.getAs[String]("eid") -> r.getAs[Long]("d_key"))
      assert(keys0.map(_._2).distinct.length == keys0.length, "dup keys")
      val silver1 = inc.toDF("eid", "attr")
        .dropDuplicates("eid").repartition(parts)
      val d1 = scd.build(spec, silver1, incremental = true).collect()
      val keys1 = d1.map(r => r.getAs[String]("eid") -> r.getAs[Long]("d_key")).toMap
      assert(keys1.values.toSeq.distinct.length == keys1.size, "dup keys after inc")
      keys0.foreach { case (e, k) => assert(keys1(e) == k, s"key moved for $e") }
      assert(keys1.keySet ==
        silver0.select("eid").as[String].collect().toSet ++
          silver1.select("eid").as[String].collect().toSet,
        "entity set wrong after increment")
    }
  }

  test("positional union conserves rows (bag semantics, 10 random cases)") {
    samples(Gen.zip(rowsGen, rowsGen), 10).foreach { case (a, b) =>
      val da = a.toDF("k", "name", "v")
      val db = b.toDF("k", "name", "v")
      assert(da.union(db).count() == a.size + b.size)
    }
  }

  private val docGen: Gen[List[(Long, String)]] =
    Gen.listOf(for {
      id <- Gen.choose(0L, 60L)
      words <- Gen.nonEmptyListOf(
        Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
    } yield (id, words.mkString(" "))).map(
      _.groupBy(_._1).map(_._2.head).toList) // unique ids

  test("decontaminate: monotone (bigger benchmark never keeps more) and " +
    "self-decontamination empties overlap (5 random cases)") {
    import org.apache.spark.sql.functions.col
    val cases = samples(Gen.zip(docGen, docGen, docGen), 5)
    cases.foreach { case (corpus, bench1, bench2) =>
      val c = corpus.toDF("doc_id", "text")
      val b1 = bench1.toDF("doc_id", "text")
      val b12 = b1.union(bench2.toDF("doc_id", "text"))
      def kept(b: org.apache.spark.sql.DataFrame): Set[Long] =
        graft.operators.Dedup.decontaminate(c, b, "text", "doc_id")
          .select("doc_id").as[Long].collect().toSet
      // growing the benchmark can only shrink the surviving corpus
      assert(kept(b12).subsetOf(kept(b1)), s"corpus=$corpus")
      // every corpus doc shares its own shingles → self-decontamination
      // keeps nothing (corpus nonempty ⇒ all contaminated)
      if (corpus.nonEmpty) assert(kept(c).isEmpty)
      // kept docs are disjoint from contaminated ids by construction
      val bad = graft.operators.Dedup
        .contaminatedIds(c, b1, "text", "doc_id")
        .as[Long].collect().toSet
      assert(kept(b1).intersect(bad).isEmpty)
      assert(kept(b1).union(bad) == corpus.map(_._1).toSet)
    }
  }

  test("weightedSampleFilter: kept set grows monotonically with the rate " +
    "(5 random corpora)") {
    import org.apache.spark.sql.functions.{col, lit}
    samples(docGen, 5).foreach { corpus =>
      val c = corpus.toDF("doc_id", "text")
      def kept(rate: Int): Set[Long] =
        c.filter(graft.operators.DatasetSplit.weightedSampleFilter(
            col("text"), lit("g"), Map.empty, rate))
          .select("doc_id").as[Long].collect().toSet
      val chain = Seq(0, 32, 128, 200, 256).map(kept)
      chain.sliding(2).foreach { case Seq(lo, hi) =>
        assert(lo.subsetOf(hi), s"rate monotonicity broke for $corpus")
      }
      assert(chain.head.isEmpty && chain.last == corpus.map(_._1).toSet)
    }
  }

  test("iroot is the exact integer root for random bases and exponents; " +
    "temperatureWeights compresses disparities monotonically") {
    import graft.operators.DatasetSplit
    samples(Gen.zip(Gen.choose(0L, 1L << 50), Gen.choose(1, 5)), 40)
      .foreach { case (x, n) =>
        val r = DatasetSplit.iroot(BigInt(x), n)
        assert(r.pow(n) <= BigInt(x), s"iroot($x,$n)=$r overshoots")
        assert((r + 1).pow(n) > BigInt(x), s"iroot($x,$n)=$r undershoots")
      }
    val counts = Map("big" -> 1000000L, "small" -> 100L)
    val w = DatasetSplit.temperatureWeights(counts) // α = 1/2
    assert(w("big") == 1000 && w("small") == 10,
      "sqrt temperature: 10000:1 becomes 100:1")
    val w34 = DatasetSplit.temperatureWeights(counts, 3, 4)
    assert(w34("big").toDouble / w34("small") > 100.0 &&
      w34("big").toDouble / w34("small") < 10000.0,
      "α=3/4 sits between sqrt and identity")
    // zero-count groups vanish; a 1-count group still gets weight 1
    assert(DatasetSplit.temperatureWeights(Map("z" -> 0L, "one" -> 1L)) ==
      Map("one" -> 1))
  }

  test("recallAtK: exact integer hit counts, duplicate-safe approx input") {
    import org.apache.spark.sql.functions.col
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("q_id", "n_id")
    // approx contains a duplicate row and an extra non-exact neighbor
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 99L), (2L, 20L), (2L, 21L))
      .toDF("q_id", "n_id")
    val got = graft.operators.SimilaritySearch.recallAtK(exact, approx)
      .select(col("q_id"), col("n_exact"), col("n_hit"))
      .as[(Long, Long, Long)].collect()
      .map { case (q, e, h) => q -> (e, h) }.toMap
    assert(got(1L) == (3L, 1L), "one of three exact neighbors recovered")
    assert(got(2L) == (2L, 2L), "perfect recall for query 2")
  }

  test("deterministicShuffle: (shard, pos) is a dense per-shard numbering, " +
    "stable under repartition, and seed changes the permutation") {
    import org.apache.spark.sql.functions.col
    samples(docGen, 3).filter(_.nonEmpty).foreach { corpus =>
      val c = corpus.toDF("doc_id", "text").dropDuplicates("doc_id")
      def run(seed: String, parts: Int): Map[Long, (Int, Long)] =
        graft.operators.DatasetSplit
          .deterministicShuffle(c.repartition(parts), "doc_id", seed, 4)
          .select(col("doc_id"), col("shard"), col("pos"))
          .as[(Long, Int, Long)].collect()
          .map { case (id, s, p) => id -> (s, p) }.toMap
      val a = run("ep0", 1)
      assert(a == run("ep0", 5), "partitioning must not change the shuffle")
      // dense per-shard numbering: positions in each shard are 1..n_shard
      a.values.groupBy(_._1).foreach { case (sh, rows) =>
        val ps = rows.map(_._2).toSeq.sorted
        assert(ps == (1L to ps.size).toSeq, s"shard $sh positions not dense")
      }
      assert(a.values.map(_._1).forall(s => s >= 0 && s < 4))
      if (corpus.size >= 16) {
        val b = run("ep1", 1)
        assert(a != b, "a new seed must give a different permutation")
      }
    }
  }

  test("packOffsets: total stream length equals the token sum regardless " +
    "of seqTokens; seq_id consistent (5 random corpora)") {
    import org.apache.spark.sql.functions.col
    samples(Gen.zip(docGen, Gen.oneOf(8, 64, 1024)), 5).foreach {
      case (corpus, budget) =>
        if (corpus.nonEmpty) {
          val c = corpus.toDF("doc_id", "text")
          val packed = graft.operators.Packing
            .packOffsets(c, "text", "doc_id", budget).collect()
          val byBucket = packed.groupBy(_.getInt(1))
          byBucket.foreach { case (_, rows) =>
            val streamLen = rows.map(_.getLong(2)).sum
            val maxEnd = rows.map(r => r.getLong(3) + r.getLong(2)).max
            assert(streamLen == maxEnd, "offsets don't tile the stream")
          }
          packed.foreach { r =>
            assert(r.getLong(4) == r.getLong(3) / budget, "seq_id mismatch")
          }
        }
    }
  }

  test("bloom: zero false negatives over random key sets at random fpp " +
    "(8 cases)") {
    val keysGen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    samples(Gen.zip(keysGen, Gen.oneOf(0.3, 0.05, 0.01)), 8).foreach {
      case (keys, fpp) =>
        val sketch = graft.operators.Bloom.build(keys.toDF("k"), "k",
          keys.size.toLong, fpp)
        keys.foreach(k => assert(sketch.mightContain(k),
          s"false negative for $k at fpp=$fpp"))
    }
  }

  test("incremental agg: any random partition of the rows into batches " +
    "equals the one-shot aggregate (5 cases)") {
    import graft.operators.IncrementalAgg
    import graft.operators.IncrementalAgg.AggSpec
    val specs = Seq(AggSpec("count", "1", "n"), AggSpec("sum", "v", "sv"),
      AggSpec("min", "v", "mn"), AggSpec("max", "v", "mx"))
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(-100L, 100L))),
      Gen.choose(1, 4))
    samples(gen, 5).foreach { case (rows, nBatches) =>
      val df = rows.map { case (k, v) => (s"k$k", v) }.toDF("k", "v")
      val oneShot = IncrementalAgg.aggregate(df, Seq("k"), specs)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val tbl = new graft.engine.VersionedTable(spark, tmpDir("prop") + "/t")
      // batch boundaries by row-index mod nBatches — arbitrary split
      (0 until nBatches).foreach { b =>
        val batch = rows.zipWithIndex
          .filter(_._2 % nBatches == b).map(_._1)
          .map { case (k, v) => (s"k$k", v) }
        if (batch.nonEmpty)
          IncrementalAgg.update(tbl, batch.toDF("k", "v"), Seq("k"), specs)
      }
      val inc = tbl.read().collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(inc == oneShot, s"split into $nBatches batches diverged")
    }
  }

  test("data quality: 0 <= violations <= n_rows for random rules over " +
    "random data (5 cases)") {
    import graft.operators.DataQuality
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(-50, 50),
        Gen.option(Gen.choose(-50, 50)))),
      Gen.choose(-50, 50))
    samples(gen, 5).foreach { case (rows, threshold) =>
      val df = rows.toDF("id", "v")
      val got = DataQuality.check(df, Seq(
        DataQuality.rule("above", s"v > $threshold"),
        DataQuality.rule("id_nonnull", "id IS NOT NULL"))).collect()
      got.foreach { r =>
        val (viol, n) = (r.getLong(1), r.getLong(2))
        assert(viol >= 0 && viol <= n && n == rows.size)
      }
      // the two complementary rules on v partition the rows exactly:
      // (v > t violations) = nulls + not-greater
      val nullsOrLe = rows.count(r => r._2.isEmpty || r._2.exists(_ <= threshold))
      assert(got.find(_.getString(0) == "above").get.getLong(1) == nullsOrLe)
    }
  }

  test("rebalanceRates: binding group kept whole, others scaled to the " +
    "target ratio, unweighted groups absent — exact integer arithmetic") {
    import graft.operators.DatasetSplit
    val rates = DatasetSplit.rebalanceRates(
      Map("en" -> 1000L, "und" -> 200L, "de" -> 500L),
      Map("en" -> 60, "und" -> 40))
    // und is the scarce group (200/40 < 1000/60): kept whole at 256;
    // en scales to 60:40 against it → 256·300/1000 = 76.8 → 76
    assert(rates == Map("en" -> 76, "und" -> 256), s"got $rates")
    // kept ≈ 1000·76/256 : 200·256/256 = 297 : 200 ≈ the 60:40 target
    // a weighted group with zero rows drops out; survivors rebalance.
    // The double floor costs the binding group one bucket when its
    // weight doesn't divide N·2²⁰ (255/256 ≈ kept whole):
    val r2 = DatasetSplit.rebalanceRates(Map("en" -> 1000L),
      Map("en" -> 60, "und" -> 40))
    assert(r2 == Map("en" -> 255), s"got $r2")
    assert(DatasetSplit.rebalanceRates(Map.empty, Map("en" -> 60)).isEmpty)
  }

  test("changeFeed ∘ applyChanges is the identity: replaying the diff of " +
    "two random snapshots onto the first yields the second (5 cases)") {
    val gen = Gen.zip(rowsGen, rowsGen)
    samples(gen, 5).foreach { case (beforeRows, afterRows) =>
      val before = beforeRows.toDF("k", "name", "v").dropDuplicates("k")
      val after = afterRows.toDF("k", "name", "v").dropDuplicates("k")
      val feed = Upsert.changeFeed(before, after, Seq("k"))
      // no change row for unchanged keys (CDC's whole point)
      val unchanged = before.as("b").join(after.as("a"), Seq("k"))
        .filter(org.apache.spark.sql.functions.col("b.name") ===
          org.apache.spark.sql.functions.col("a.name") &&
          org.apache.spark.sql.functions.col("b.v") ===
            org.apache.spark.sql.functions.col("a.v"))
        .select("k").as[Long].collect().toSet
      val feedKeys = feed.select("k").as[Long].collect().toSet
      assert(feedKeys.intersect(unchanged).isEmpty,
        "unchanged keys must produce no change traffic")
      // the round trip
      val path = tmpDir("prop") + "/cdcdiff"
      before.write.parquet(path)
      Upsert.applyChanges(spark, path, feed, Seq("k"),
        uniqueKeyTarget = true)
      val replayed = spark.read.parquet(path)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      val expected = after
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(replayed == expected, "changeFeed round trip diverged")
    }
  }

  test("cdc applyChanges: applying a feed twice equals applying it once " +
    "(idempotence, 5 cases)") {
    val gen = Gen.zip(rowsGen, rowsGen, Gen.listOf(Gen.choose(0L, 30L)))
    samples(gen, 5).foreach { case (tgt, ups, dels) =>
      val path = tmpDir("prop") + "/cdc"
      tgt.toDF("k", "name", "v").dropDuplicates("k").write.parquet(path)
      val changes = ups.toDF("k", "name", "v").dropDuplicates("k")
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .unionByName(dels.toDF("k")
          .withColumn("name", org.apache.spark.sql.functions.lit("x"))
          .withColumn("v", org.apache.spark.sql.functions.lit(0.0))
          .withColumn("op", org.apache.spark.sql.functions.lit("D")))
      Upsert.applyChanges(spark, path, changes, Seq("k"),
        uniqueKeyTarget = true)
      val once = spark.read.parquet(path)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      Upsert.applyChanges(spark, path, changes, Seq("k"),
        uniqueKeyTarget = true)
      val twice = spark.read.parquet(path)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(once == twice, "applyChanges not idempotent")
    }
  }

  test("unigram segment laws: exact cover, optimality vs the all-chars " +
    "path, score additivity (40 random vocab/word cases)") {
    import graft.operators.UnigramLm
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c'))
      .map(_.take(12).mkString)
    val vocabGen: Gen[Map[String, Long]] = for {
      extra <- Gen.listOf(Gen.zip(
        Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(4).mkString),
        Gen.choose(-9000000L, -100000L)))
      ca <- Gen.choose(-9000000L, -100000L)
      cb <- Gen.choose(-9000000L, -100000L)
      cc <- Gen.choose(-9000000L, -100000L)
    } yield (extra.toMap ++ Map("a" -> ca, "b" -> cb, "c" -> cc))
    val cases = samples(Gen.zip(wordGen, vocabGen), 40)
    cases.foreach { case (w, vocab) =>
      val path = UnigramLm.segment(w, vocab, maxPieceLen = 4)
      // exact cover: concatenation rebuilds the word
      assert(path.mkString == w, s"cover broken: $path vs $w")
      // every piece is known (single-char coverage is in the vocab)
      assert(path.forall(vocab.contains), s"unknown piece in $path")
      // optimality floor: the DP's score is >= the all-chars path
      val sc = path.map(vocab).sum
      val allChars = w.map(c => vocab(c.toString)).sum
      assert(sc >= allChars,
        s"DP beat by the trivial path: $sc < $allChars for '$w'")
    }
  }

  test("KMV merge algebra: commutative, associative, idempotent, and " +
    "order/duplication-invariant (30 random stream splits)") {
    import graft.operators.Sketch.Kmv
    def sk(xs: Seq[Long], k: Int = 32): Kmv = {
      val m = Kmv.empty(k); xs.foreach(h => m.add(math.abs(h) % (1L << 48)))
      m
    }
    def contents(m: Kmv): Seq[Long] = m.arr.take(m.n).toSeq
    val streamGen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue + 1, Long.MaxValue))
    val cases = samples(Gen.zip(streamGen, streamGen), 30)
    cases.foreach { case (xs, ys) =>
      val ab = contents(sk(xs).merge(sk(ys)))
      val ba = contents(sk(ys).merge(sk(xs)))
      assert(ab == ba, "merge not commutative")
      // merge == single-stream fold (order/duplication invariance)
      val whole = contents(sk(xs ++ ys ++ xs.reverse))
      assert(ab == whole, "merge != concatenated stream with duplicates")
      // idempotent: folding a sketch into itself changes nothing
      assert(contents(sk(xs).merge(sk(xs))) == contents(sk(xs)),
        "merge not idempotent")
      // associativity via a 3-way split
      val (h, t) = xs.splitAt(xs.length / 2)
      val left = contents(sk(h).merge(sk(t)).merge(sk(ys)))
      val right = contents(sk(h).merge(sk(t ++ ys)))
      assert(left == right, "merge not associative")
    }
  }
}
